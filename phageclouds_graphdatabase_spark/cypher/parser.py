"""Tokenizer + recursive-descent parser for the Cypher subset.

Grammar (keywords case-insensitive, as the reference mixes `AS`/`as` and
`IN`/`in` freely — /root/reference/phageclouds_gdb.py:65-72):

    query       := clause+ ;?
    clause      := (OPTIONAL)? MATCH pattern (',' pattern)* (WHERE expr)?
                 | WITH (DISTINCT)? item (',' item)* (WHERE expr)?
                 | RETURN (DISTINCT)? item (',' item)*
    item        := expr (AS ident)?
    pattern     := node ( edge node )*
    node        := '(' ident? (':' ident)? props? ')'
    edge        := '-' '[' ident? (':' ident)? props? ']' '->'    (out)
                 | '<-' '[' ... ']' '-'                           (in)
                 | '-' '[' ... ']' '-'                            (both)
    props       := '{' ident ':' (literal | param) (',' ...)* '}'

    expr        := or ; or := and (OR and)* ; and := not (AND not)*
    not         := NOT not | cmp
    cmp         := add ( ( '='|'<>'|'<='|'>='|'<'|'>' ) add
                       | CONTAINS add | STARTS WITH add | ENDS WITH add
                       | IN add | IS (NOT)? NULL )?
    add         := mul ( ('+'|'-') mul )*
    mul         := unary ( ('*'|'/') unary )*
    unary       := '-' unary | primary
    primary     := literal | param | list | listcomp | func '(' args ')'
                 | ident '.' ident | ident | '(' expr ')' | pattern-predicate
    listcomp    := '[' ident IN expr (WHERE expr)? ('|' expr)? ']'

The one ambiguity — '(' starting either a parenthesized expression or an
existential pattern predicate like (a)-[:infects]->(:Host {genus:"X"}) — is
resolved by backtracking: try the pattern first, fall back to the expression.
"""

from __future__ import annotations

import re

from phageclouds_graphdatabase_spark.cypher import ast_nodes as A


class CypherSyntaxError(ValueError):
    pass


_KEYWORDS = {
    "match", "optional", "where", "with", "return", "as", "and", "or", "not",
    "in", "contains", "starts", "ends", "distinct", "is", "null", "true",
    "false", "order", "by", "asc", "ascending", "desc", "descending",
    "skip", "limit", "unwind", "case", "when", "then", "else", "end",
    "create", "merge", "set", "delete", "detach", "on", "union", "remove",
    "foreach", "xor",
}

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<number>\d+\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?)
  | (?P<string>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ident>[^\W\d][\w]*|`[^`]+`)
  | (?P<param>\$[A-Za-z_][A-Za-z0-9_]*)
  | (?P<sym><>|<=|>=|<-|->|=~|[()\[\]{}:,;.\-+*/=<>|%^])
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[tuple[str, str, int, str]]:
    """-> [(kind, value, pos, raw)]; kind in {number,string,ident,kw,param,
    sym}. `raw` keeps the original spelling: keywords are matched lowercase
    but may also serve as names/aliases (the reference aliases a column
    `End`, phageclouds_gdb_host.py:64)."""
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise CypherSyntaxError(f"unexpected character {text[pos]!r} at {pos}")
        kind = m.lastgroup
        val = raw = m.group()
        if kind != "ws":
            if kind == "ident":
                if val.startswith("`"):
                    val = raw = val[1:-1]
                elif val.lower() in _KEYWORDS:
                    kind, val = "kw", val.lower()
            out.append((kind, val, pos, raw))
        pos = m.end()
    out.append(("eof", "", len(text), ""))
    return out


def _unquote(s: str) -> str:
    body = s[1:-1]
    return re.sub(r"\\(.)", r"\1", body)


class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.toks = tokenize(text)
        self.i = 0

    # -- token helpers ------------------------------------------------------

    def peek(self, k: int = 0) -> tuple[str, str, int, str]:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def at(self, kind: str, val: str | None = None, k: int = 0) -> bool:
        tk, tv, _, _ = self.peek(k)
        return tk == kind and (val is None or tv == val)

    def take(self, kind: str, val: str | None = None) -> str:
        tk, tv, pos, _ = self.peek()
        if tk != kind or (val is not None and tv != val):
            want = val or kind
            raise CypherSyntaxError(
                f"expected {want!r} at position {pos}, found {tv!r}"
            )
        self.i += 1
        return tv

    def accept(self, kind: str, val: str | None = None) -> bool:
        if self.at(kind, val):
            self.i += 1
            return True
        return False

    # -- entry --------------------------------------------------------------

    def query(self) -> A.Query:
        parts = [self._single_query()]
        alls: list[bool] = []
        while self.accept("kw", "union"):
            is_all = False
            if self.at("ident") and self.peek()[1].lower() == "all":
                self.take("ident")
                is_all = True
            alls.append(is_all)
            parts.append(self._single_query())
        self.accept("sym", ";")
        if not self.at("eof"):
            _, tv, pos, _ = self.peek()
            raise CypherSyntaxError(f"trailing input at position {pos}: {tv!r}")
        if len(parts) == 1:
            return parts[0]
        if len(set(alls)) > 1:
            raise CypherSyntaxError(
                "cannot mix UNION and UNION ALL in one statement"
            )
        return A.UnionQuery(tuple(parts), alls[0])

    def _single_query(self) -> A.Query:
        clauses: list = []
        while True:
            if self.accept("kw", "optional"):
                if self.at("ident") and self.peek()[1].lower() == "call":
                    self.take("ident")
                    self.take("sym", "{")
                    inner = self._single_query()
                    self.take("sym", "}")
                    clauses.append(A.CallSub(inner, optional=True))
                else:
                    self.take("kw", "match")
                    clauses.append(self._match(optional=True))
            elif self.accept("kw", "match"):
                clauses.append(self._match(optional=False))
            elif self.accept("kw", "with"):
                clauses.append(self._with())
            elif self.accept("kw", "unwind"):
                e = self.expr()
                self.take("kw", "as")
                clauses.append(A.UnwindClause(e, self._name()))
            elif self.at("ident") and self.peek()[1].lower() == "load":
                clauses.append(self._load_csv())
            elif self.at("ident") and self.peek()[1].lower() == "call":
                self.take("ident")
                if self.at("sym", "{"):
                    self.take("sym", "{")
                    inner = self._single_query()
                    self.take("sym", "}")
                    # `IN [CONCURRENT] TRANSACTIONS [OF n ROWS]` — accepted
                    # and ignored: Spark writes are atomic per action, so
                    # batched intermediate commits have no observable effect
                    # on a successful run (documented deviation: Neo4j keeps
                    # completed batches on failure; this engine keeps none)
                    if self.at("kw", "in"):
                        self.take("kw", "in")
                        w = self._name().lower()
                        if w == "concurrent":
                            w = self._name().lower()
                        if w != "transactions":
                            raise CypherSyntaxError(
                                "expected TRANSACTIONS after CALL { } IN"
                            )
                        if self.at("ident") and self.peek()[1].lower() == "of":
                            self.take("ident")
                            self.take("number")
                            if self._name().lower() != "rows":
                                raise CypherSyntaxError(
                                    "expected ROWS after OF <n>"
                                )
                    clauses.append(A.CallSub(inner))
                else:
                    clauses.append(self._call_proc())
            elif self.accept("kw", "create"):
                clauses.append(self._create())
            elif self.accept("kw", "merge"):
                clauses.append(self._merge())
            elif self.accept("kw", "set"):
                clauses.append(A.SetClause(self._set_items()))
            elif self.accept("kw", "remove"):
                clauses.append(self._remove())
            elif self.accept("kw", "foreach"):
                clauses.append(self._foreach())
            elif self.at("kw", "detach") or self.at("kw", "delete"):
                clauses.append(self._delete())
            elif self.accept("kw", "return"):
                clauses.append(self._return())
                break
            elif clauses and (
                self.at("eof") or self.at("sym", ";") or self.at("kw", "union")
            ):
                # write queries may end without RETURN
                break
            else:
                tk, tv, pos, _ = self.peek()
                raise CypherSyntaxError(
                    f"expected a clause keyword at position {pos}, found {tv!r}"
                )
        return A.Query(tuple(clauses))

    # -- clauses ------------------------------------------------------------

    def _match(self, optional: bool) -> A.MatchClause:
        pats = [self._pattern()]
        while self.accept("sym", ","):
            pats.append(self._pattern())
        where = self.expr() if self.accept("kw", "where") else None
        return A.MatchClause(tuple(pats), where, optional)

    def _with(self) -> A.WithClause:
        distinct = self.accept("kw", "distinct")
        items = [self._item()]
        while self.accept("sym", ","):
            items.append(self._item())
        order_by, skip, limit = self._order_skip_limit()
        where = self.expr() if self.accept("kw", "where") else None
        return A.WithClause(tuple(items), distinct, where, order_by, skip, limit)

    def _order_skip_limit(self) -> tuple:
        order_by: list = []
        if self.accept("kw", "order"):
            self.take("kw", "by")
            while True:
                e = self.expr()
                desc = False
                if self.accept("kw", "desc") or self.accept("kw", "descending"):
                    desc = True
                elif self.accept("kw", "asc") or self.accept("kw", "ascending"):
                    pass
                order_by.append((e, desc))
                if not self.accept("sym", ","):
                    break
        skip = None
        if self.accept("kw", "skip"):
            skip = int(self.take("number"))
        limit = None
        if self.accept("kw", "limit"):
            limit = int(self.take("number"))
        return tuple(order_by), skip, limit

    def _create(self) -> A.CreateClause:
        pats = [self._pattern()]
        while self.accept("sym", ","):
            pats.append(self._pattern())
        return A.CreateClause(tuple(pats))

    def _merge(self) -> A.MergeClause:
        pat = self._pattern()
        on_create: tuple = ()
        on_match: tuple = ()
        while self.accept("kw", "on"):
            if self.accept("kw", "create"):
                self.take("kw", "set")
                on_create = self._set_items()
            elif self.accept("kw", "match"):
                self.take("kw", "set")
                on_match = self._set_items()
            else:
                _, tv, pos, _ = self.peek()
                raise CypherSyntaxError(
                    f"expected CREATE or MATCH after ON at position {pos}, "
                    f"found {tv!r}"
                )
        return A.MergeClause(pat, on_create, on_match)

    def _set_items(self) -> tuple:
        items = []
        while True:
            var = self._name()
            if self.at("sym", ":"):
                self.take("sym", ":")
                items.append((A.SetLabel(var, self._name()), None))
            elif self.accept("sym", "."):
                prop = self._name()
                self.take("sym", "=")
                items.append((A.Prop(var, prop), self.expr()))
            else:
                # SET n += {...} (merge) / SET n = {...} (replace)
                if self.accept("sym", "+"):
                    mode = "merge"
                else:
                    mode = "replace"
                self.take("sym", "=")
                payload: object
                if self.at("sym", "{"):
                    payload = self._props()
                elif self.at("param"):
                    payload = A.Param(self.take("param")[1:])
                else:
                    _, tv, pos, _ = self.peek()
                    raise CypherSyntaxError(
                        f"SET {var} {'+=' if mode == 'merge' else '='} "
                        f"needs a map literal or $param at position {pos}, "
                        f"found {tv!r}"
                    )
                items.append((A.MapSet(var, mode), payload))
            if not self.accept("sym", ","):
                break
        return tuple(items)

    def _foreach(self) -> A.ForeachClause:
        self.take("sym", "(")
        var = self._name()
        self.take("kw", "in")
        e = self.expr()
        self.take("sym", "|")
        body: list = []
        while True:
            if self.accept("kw", "set"):
                body.append(A.SetClause(self._set_items()))
            elif self.accept("kw", "remove"):
                body.append(self._remove())
            elif self.accept("kw", "create"):
                body.append(self._create())
            elif self.accept("kw", "merge"):
                body.append(self._merge())
            elif self.accept("kw", "foreach"):
                body.append(self._foreach())
            elif self.at("kw", "detach") or self.at("kw", "delete"):
                body.append(self._delete())
            else:
                break
        if not body:
            _, tv, pos, _ = self.peek()
            raise CypherSyntaxError(
                f"FOREACH body needs at least one update clause at position "
                f"{pos}, found {tv!r}"
            )
        self.take("sym", ")")
        return A.ForeachClause(var, e, tuple(body))

    def _remove(self) -> A.RemoveClause:
        props: list = []
        labels: list = []
        while True:
            var = self._name()
            if self.accept("sym", ":"):
                labels.append((var, self._name()))
            else:
                self.take("sym", ".")
                props.append(A.Prop(var, self._name()))
            if not self.accept("sym", ","):
                break
        return A.RemoveClause(tuple(props), tuple(labels))

    def _delete(self) -> A.DeleteClause:
        detach = self.accept("kw", "detach")
        self.take("kw", "delete")
        names = [self._name()]
        while self.accept("sym", ","):
            names.append(self._name())
        return A.DeleteClause(tuple(names), detach)

    def _return(self) -> A.ReturnClause:
        distinct = self.accept("kw", "distinct")
        items = [self._item()]
        while self.accept("sym", ","):
            items.append(self._item())
        order_by, skip, limit = self._order_skip_limit()
        return A.ReturnClause(tuple(items), distinct, order_by, skip, limit)

    def _item(self) -> A.Item:
        if self.at("sym", "*"):
            self.take("sym", "*")
            return A.Item(A.Star(), None, "*")
        start = self.peek()[2]
        e = self.expr()
        end = self.peek()[2]
        text = self.text[start:end].strip()
        alias = None
        if self.accept("kw", "as"):
            alias = self._name()
        return A.Item(e, alias, text)

    def _name(self) -> str:
        # aliases may collide with keywords (`AS End` in the reference);
        # accept both, preserving the original spelling
        tk, tv, pos, raw = self.peek()
        if tk in ("ident", "kw"):
            self.i += 1
            return raw
        raise CypherSyntaxError(f"expected a name at position {pos}, found {tv!r}")

    # -- patterns -----------------------------------------------------------

    _SHORTEST = {"shortestpath": "one", "allshortestpaths": "all"}

    def _pattern(self) -> A.PathPat:
        path_var = None
        if self.at("ident") and self.at("sym", "=", 1):
            # named path: `p = (a)-[...]->(b)`
            path_var = self._name()
            self.take("sym", "=")
        shortest = None
        if self.at("ident"):  # shortestPath((a)-[...]-(b)) / allShortestPaths
            fname = self._name()
            shortest = self._SHORTEST.get(fname.lower())
            if shortest is None:
                raise CypherSyntaxError(
                    f"unexpected identifier {fname!r} in pattern (expected "
                    "shortestPath or allShortestPaths)"
                )
            self.take("sym", "(")
        nodes = [self._node_pat()]
        edges = []
        while (
            self.at("sym", "-")
            or self.at("sym", "<-")
            or (self.at("sym", "(") and self.at("sym", "(", 1))
        ):
            if self.at("sym", "(") and self.at("sym", "(", 1):
                # GQL QPP group form: (a)(()-[:T]->()){m,n}(b)
                edges.append(self._qpp_group())
            else:
                edges.append(self._edge_pat())
            nodes.append(self._node_pat())
        if shortest is not None:
            self.take("sym", ")")
            if len(edges) != 1:
                raise CypherSyntaxError(
                    "shortestPath takes a single (a)-[...]-(b) hop pattern"
                )
        return A.PathPat(tuple(nodes), tuple(edges), path_var, shortest)

    def _qpp_group(self) -> A.EdgePat:
        """GQL quantified path-pattern GROUP form — ``(()-[:T]->()){m,n}``,
        ``(...)+`` — lowered onto the same var-length machinery as the
        short form ``-[:T]->{m,n}`` (distinct-pairs semantics, documented
        deviation). Restrictions (each rejected with its reason): a single
        relationship per group; anonymous, unconstrained inner nodes (Neo4j
        list-binds inner variables per iteration — unsupported); no nested
        quantifiers; ``*`` rejected because zero-hop iterations are not
        expressible in the iterative expansion (use ``{1,n}`` or ``+``)."""
        self.take("sym", "(")
        nodes = [self._node_pat()]
        edges = []
        while self.at("sym", "-") or self.at("sym", "<-"):
            edges.append(self._edge_pat())
            nodes.append(self._node_pat())
        self.take("sym", ")")
        if self.accept("sym", "+"):
            lo, hi = 1, 8
        elif self.at("sym", "*"):
            raise CypherSyntaxError(
                "zero-hop group quantifier * is not supported; use + or {1,n}"
            )
        elif self.at("sym", "{"):
            self.take("sym", "{")
            lo = int(self.take("number"))
            hi = lo
            if self.accept("sym", ","):
                hi = int(self.take("number")) if self.at("number") else 8
            self.take("sym", "}")
        else:
            raise CypherSyntaxError(
                "quantified group needs a {m[,n]} or + quantifier"
            )
        if len(edges) != 1:
            raise CypherSyntaxError(
                "quantified groups support a single relationship pattern"
            )
        for np in nodes:
            if np.var is not None or np.label is not None or np.props:
                raise CypherSyntaxError(
                    "nodes inside a quantified group must be anonymous "
                    "bare () — inner variables would be list-bound per "
                    "iteration (unsupported); labels are implied by the "
                    "relationship type"
                )
        e = edges[0]
        if e.var is not None:
            raise CypherSyntaxError(
                "relationship variables inside a quantified group are not "
                "supported"
            )
        if e.var_length is not None:
            raise CypherSyntaxError("nested quantifiers are not supported")
        return A.EdgePat(None, e.reltype, e.props, e.direction, (lo, hi))

    def _node_pat(self) -> A.NodePat:
        self.take("sym", "(")
        var = self._name() if self.at("ident") else None
        label = None
        if self.accept("sym", ":"):
            label = self._name()
        props = self._props() if self.at("sym", "{") else ()
        self.take("sym", ")")
        return A.NodePat(var, label, props)

    def _edge_pat(self) -> A.EdgePat:
        if self.accept("sym", "<-"):
            incoming = True
        else:
            self.take("sym", "-")
            incoming = False
        self.take("sym", "[")
        var = self._name() if self.at("ident") else None
        reltype = None
        if self.accept("sym", ":"):
            reltype = self._name()
        var_length = None
        if self.accept("sym", "*"):
            lo = hi = None
            if self.at("number"):
                lo = int(self.take("number"))
            if self.accept("sym", "."):
                self.take("sym", ".")
                if self.at("number"):
                    hi = int(self.take("number"))
            elif lo is not None:
                hi = lo  # [*n] = exactly n hops
            var_length = (lo if lo is not None else 1,
                          hi if hi is not None else 8)
        props = self._props() if self.at("sym", "{") else ()
        self.take("sym", "]")
        if incoming:
            self.take("sym", "-")
            direction = "in"
        elif self.accept("sym", "->"):
            direction = "out"
        else:
            self.take("sym", "-")
            direction = "both"
        # GQL quantifiers (Neo4j 5 QPP short form): -[:T]->{m,n} / {n} / +
        # map onto the same var-length machinery as [:T*m..n]
        if var_length is None:
            if self.at("sym", "{") and self.at("number", k=1):
                self.take("sym", "{")
                lo = int(self.take("number"))
                hi = lo
                if self.accept("sym", ","):
                    hi = int(self.take("number")) if self.at("number") else 8
                self.take("sym", "}")
                var_length = (lo, hi)
            elif self.at("sym", "+"):
                self.take("sym", "+")
                var_length = (1, 8)  # same unbounded cap as [*]
        return A.EdgePat(var, reltype, props, direction, var_length)

    def _props(self) -> tuple:
        self.take("sym", "{")
        out = []
        while True:
            name = self._name()
            self.take("sym", ":")
            out.append((name, self._prop_value()))
            if not self.accept("sym", ","):
                break
        self.take("sym", "}")
        return tuple(out)

    def _prop_value(self) -> A.Expr:
        # full expressions allowed (write patterns bind props to frame
        # variables, e.g. MERGE (n:L {accession: r.acc})); read patterns
        # that need a scalar enforce literal/param at compile time
        return self.expr()

    def _literal(self) -> A.Literal:
        tk, tv, pos, _ = self.peek()
        if tk == "string":
            self.i += 1
            return A.Literal(_unquote(tv))
        if tk == "number":
            self.i += 1
            return A.Literal(self._num(tv))
        if tk == "sym" and tv == "-" and self.at("number", k=1):
            self.i += 2
            return A.Literal(-self._num(self.toks[self.i - 1][1]))
        if tk == "kw" and tv in ("true", "false"):
            self.i += 1
            return A.Literal(tv == "true")
        if tk == "kw" and tv == "null":
            self.i += 1
            return A.Literal(None)
        raise CypherSyntaxError(f"expected a literal at position {pos}, found {tv!r}")

    @staticmethod
    def _num(s: str):
        return float(s) if ("." in s or "e" in s or "E" in s) else int(s)

    # -- expressions --------------------------------------------------------

    def expr(self) -> A.Expr:
        return self._or()

    def _or(self) -> A.Expr:
        e = self._xor()
        while self.accept("kw", "or"):
            e = A.Or(e, self._xor())
        return e

    def _xor(self) -> A.Expr:
        # Neo4j precedence: OR < XOR < AND
        e = self._and()
        while self.accept("kw", "xor"):
            e = A.Xor(e, self._and())
        return e

    def _and(self) -> A.Expr:
        e = self._not()
        while self.accept("kw", "and"):
            e = A.And(e, self._not())
        return e

    def _not(self) -> A.Expr:
        if self.accept("kw", "not"):
            return A.Not(self._not())
        return self._cmp()

    def _cmp(self) -> A.Expr:
        e = self._add()
        # label predicate `n:Label` (only on a bare variable)
        if isinstance(e, A.Var) and self.at("sym", ":"):
            self.take("sym", ":")
            return A.LabelPred(e.name, self._name())
        tk, tv, _, _ = self.peek()
        if tk == "sym" and tv == "=~":
            self.i += 1
            return A.Regex(e, self._add())
        if tk == "sym" and tv in ("=", "<>", "<=", ">=", "<", ">"):
            self.i += 1
            return A.Cmp(tv, e, self._add())
        if tk == "kw" and tv == "contains":
            self.i += 1
            return A.StringPred("CONTAINS", e, self._add())
        if tk == "kw" and tv == "starts":
            self.i += 1
            self.take("kw", "with")
            return A.StringPred("STARTS WITH", e, self._add())
        if tk == "kw" and tv == "ends":
            self.i += 1
            self.take("kw", "with")
            return A.StringPred("ENDS WITH", e, self._add())
        if tk == "kw" and tv == "in":
            self.i += 1
            return A.InList(e, self._add())
        if tk == "kw" and tv == "is":
            self.i += 1
            negated = self.accept("kw", "not")
            self.take("kw", "null")
            return A.IsNull(e, negated)
        return e

    def _add(self) -> A.Expr:
        e = self._mul()
        while True:
            if self.at("sym", "+"):
                self.i += 1
                e = A.Arith("+", e, self._mul())
            elif self.at("sym", "-"):
                self.i += 1
                e = A.Arith("-", e, self._mul())
            else:
                return e

    def _mul(self) -> A.Expr:
        e = self._unary()
        while True:
            if self.at("sym", "*"):
                self.i += 1
                e = A.Arith("*", e, self._unary())
            elif self.at("sym", "/"):
                self.i += 1
                e = A.Arith("/", e, self._unary())
            elif self.at("sym", "%"):
                self.i += 1
                e = A.Arith("%", e, self._unary())
            else:
                return e

    def _unary(self) -> A.Expr:
        if self.accept("sym", "-"):
            inner = self._unary()
            if isinstance(inner, A.Literal) and isinstance(inner.value, (int, float)):
                return A.Literal(-inner.value)
            return A.Arith("-", A.Literal(0), inner)
        e = self._postfix(self._primary())
        if self.at("sym", "^"):
            # exponent binds tighter than unary minus and is right-assoc
            # (Neo4j: -2^2 = -(2^2), 2^3^2 = 2^(3^2))
            self.i += 1
            return A.Arith("^", e, self._unary())
        return e

    def _postfix(self, e: A.Expr) -> A.Expr:
        """Postfix chains: list[i], list[lo..hi], [..n], [n..], and
        expr.field (temporal accessors like date(x).year, nested struct
        fields). A doubled dot is never field access (slice range dots)."""
        while True:
            if self.at("sym", "["):
                self.take("sym", "[")
                lo = None
                if not self.at("sym", "."):
                    lo = self.expr()
                if self.accept("sym", "."):
                    self.take("sym", ".")
                    hi = None if self.at("sym", "]") else self.expr()
                    e = A.Slice(e, lo, hi)
                else:
                    if lo is None:
                        raise CypherSyntaxError("empty subscript []")
                    e = A.Subscript(e, lo)
                self.take("sym", "]")
            elif self.at("sym", "(") and isinstance(e, (A.Prop, A.FieldAc)):
                # two-part dotted call (point.distance(...)): _primary folded
                # the qualifier into a Prop before the '(' was visible
                parts = []
                base = e
                while isinstance(base, A.FieldAc):
                    parts.append(base.name)
                    base = base.base
                if isinstance(base, A.Prop):
                    parts.extend([base.name, base.var])
                    e = self._func(".".join(reversed(parts)).lower())
                    continue  # keep folding postfix ([i], .field, ...)
                return e
            elif self.at("sym", ".") and not self.at("sym", ".", 1):
                self.take("sym", ".")
                name = self._name()
                if self.at("sym", "("):
                    # dotted function call (apoc.coll.sort(...)): fold the
                    # FieldAc chain back into the qualified name
                    parts = [name]
                    base = e
                    while isinstance(base, A.FieldAc):
                        parts.append(base.name)
                        base = base.base
                    if isinstance(base, A.Prop):
                        parts.extend([base.name, base.var])
                        base = None
                    elif isinstance(base, A.Var):
                        parts.append(base.name)
                        base = None
                    if base is None:
                        e = self._func(".".join(reversed(parts)).lower())
                        continue  # keep folding postfix
                e = A.FieldAc(e, name)
            else:
                return e

    def _primary(self) -> A.Expr:
        tk, tv, pos, _ = self.peek()
        if tk == "string" or tk == "number" or (tk == "kw" and tv in ("true", "false", "null")):
            return self._literal()
        if tk == "param":
            self.i += 1
            return A.Param(tv[1:])
        if tk == "sym" and tv == "[":
            return self._bracket()
        if tk == "sym" and tv == "(":
            # pattern predicate vs parenthesized expression: backtrack
            mark = self.i
            try:
                pat = self._pattern()
                if not pat.edges:
                    raise CypherSyntaxError("bare parenthesized variable")
                return A.PatternPred(pat)
            except CypherSyntaxError:
                self.i = mark
            self.take("sym", "(")
            e = self.expr()
            self.take("sym", ")")
            return e
        if tk == "kw" and tv == "case":
            return self._case()
        if tk == "sym" and tv == "{":
            return A.MapLit(self._props())
        if tk == "ident":
            name = self.take("ident")
            # `.` is property access UNLESS doubled (`xs[i..]` range dots)
            if self.at("sym", ".") and not self.at("sym", ".", 1):
                self.take("sym", ".")
                return A.Prop(name, self._name())
            if name.lower() in ("exists", "count", "collect") and self.at("sym", "{"):
                return self._block_subquery(name.lower())
            if self.at("sym", "{"):
                return self._map_projection(name)
            if self.at("sym", "("):
                if name.lower() == "reduce":
                    return self._reduce()
                if name.lower() in ("all", "any", "none", "single"):
                    return self._quantifier(name.lower())
                return self._func(name)
            return A.Var(name)
        raise CypherSyntaxError(
            f"expected an expression at position {pos}, found {tv!r}"
        )

    def _load_csv(self) -> A.LoadCsv:
        """``LOAD CSV [WITH HEADERS] FROM expr AS var [FIELDTERMINATOR e]``."""
        self.take("ident")  # load
        if self._name().lower() != "csv":
            raise CypherSyntaxError("expected CSV after LOAD")
        headers = False
        if self.at("kw", "with"):
            self.take("kw", "with")
            if self._name().lower() != "headers":
                raise CypherSyntaxError("expected HEADERS after WITH")
            headers = True
        if self._name().lower() != "from":
            raise CypherSyntaxError("expected FROM in LOAD CSV")
        url = self.expr()
        self.take("kw", "as")
        var = self._name()
        sep = None
        if self.at("ident") and self.peek()[1].lower() == "fieldterminator":
            self.take("ident")
            sep = self.expr()
        return A.LoadCsv(url, var, headers, sep)

    def _call_proc(self) -> A.CallProc:
        """``CALL db.labels() [YIELD col [AS alias], ...]`` /
        ``CALL gds.pageRank.stream('sharesDNA', {maxIterations: 2})`` —
        dotted procedure name, optional literal arguments, optional YIELD
        projection."""
        parts = [self._name()]
        while self.accept("sym", "."):
            parts.append(self._name())
        self.take("sym", "(")
        args: list = []
        if not self.at("sym", ")"):
            while True:
                args.append(self.expr())
                if not self.accept("sym", ","):
                    break
        self.take("sym", ")")
        yields: list = []
        where = None
        if self.at("ident") and self.peek()[1].lower() == "yield":
            self.take("ident")
            while True:
                yname = self._name()
                alias = self._name() if self.accept("kw", "as") else None
                yields.append((yname, alias))
                if not self.accept("sym", ","):
                    break
            # Neo4j allows a WHERE directly on the yielded columns
            if self.accept("kw", "where"):
                where = self.expr()
        return A.CallProc(".".join(parts), tuple(yields), tuple(args), where)

    def _map_projection(self, var: str) -> A.MapProj:
        """``n {.prop, .*, key: expr, other_var}`` — Neo4j map projection."""
        self.take("sym", "{")
        items = []
        if not self.at("sym", "}"):
            while True:
                if self.accept("sym", "."):
                    if self.accept("sym", "*"):
                        items.append(("all",))
                    else:
                        items.append(("prop", self._name()))
                else:
                    name = self._name()
                    if self.accept("sym", ":"):
                        items.append(("kv", name, self.expr()))
                    else:
                        items.append(("var", name))
                if not self.accept("sym", ","):
                    break
        self.take("sym", "}")
        return A.MapProj(var, tuple(items))

    def _block_subquery(self, kind: str):
        """Neo4j 5 block subqueries: ``EXISTS { [MATCH] pattern [WHERE e] }``,
        ``COUNT { ... }``, and ``COLLECT { ... RETURN expr }`` (whose
        semantics are exactly a pattern comprehension — it parses into the
        same AST node). One pattern chain; the optional inner WHERE scopes
        to the block."""
        self.take("sym", "{")
        self.accept("kw", "match")
        pat = self._pattern()
        where = None
        if self.accept("kw", "where"):
            where = self.expr()
        proj = None
        if kind == "collect":
            self.take("kw", "return")
            proj = self.expr()
        self.take("sym", "}")
        if kind == "collect":
            return A.PatternComp(pat, where, proj)
        return (
            A.ExistsSub(pat, where) if kind == "exists"
            else A.CountSub(pat, where)
        )

    def _reduce(self) -> A.Reduce:
        """reduce(acc = init, x IN list | expr) — Neo4j's left fold."""
        self.take("sym", "(")
        acc = self.take("ident")
        self.take("sym", "=")
        init = self.expr()
        self.take("sym", ",")
        var = self.take("ident")
        self.take("kw", "in")
        source = self.expr()
        self.take("sym", "|")
        body = self.expr()
        self.take("sym", ")")
        return A.Reduce(acc, init, var, source, body)

    def _quantifier(self, kind: str) -> A.Quantifier:
        """all/any/none/single(x IN list WHERE pred)."""
        self.take("sym", "(")
        var = self.take("ident")
        self.take("kw", "in")
        source = self.expr()
        self.take("kw", "where")
        pred = self.expr()
        self.take("sym", ")")
        return A.Quantifier(kind, var, source, pred)

    def _func(self, name: str) -> A.Func:
        self.take("sym", "(")
        if self.accept("sym", "*"):
            self.take("sym", ")")
            return A.Func(name.lower(), (), star=True)
        distinct = self.accept("kw", "distinct")
        args: list = []
        if not self.at("sym", ")"):
            args.append(self.expr())
            while self.accept("sym", ","):
                args.append(self.expr())
        self.take("sym", ")")
        return A.Func(name.lower(), tuple(args), distinct=distinct)

    def _case(self) -> A.CaseExpr:
        self.take("kw", "case")
        operand = None if self.at("kw", "when") else self.expr()
        whens = []
        while self.accept("kw", "when"):
            w = self.expr()
            self.take("kw", "then")
            whens.append((w, self.expr()))
        if not whens:
            raise CypherSyntaxError("CASE needs at least one WHEN")
        default = self.expr() if self.accept("kw", "else") else None
        self.take("kw", "end")
        return A.CaseExpr(operand, tuple(whens), default)

    def _bracket(self) -> A.Expr:
        """A list literal [1, 2], a comprehension
        [x IN lst WHERE pred | proj] (/root/reference/phageclouds_gdb_family.py:94),
        or a pattern comprehension [(a)-[:T]->(b) WHERE pred | proj]."""
        self.take("sym", "[")
        if self.at("sym", "("):
            # Pattern comprehension — disambiguated from a parenthesized
            # list element by backtracking: the body must parse as a path
            # pattern with >= 1 relationship AND carry the mandatory
            # `| projection` (openCypher requires both).
            mark = self.i
            try:
                pat = self._pattern()
                if not pat.edges:
                    raise CypherSyntaxError(
                        "pattern comprehensions need a relationship"
                    )
                where = self.expr() if self.accept("kw", "where") else None
                self.take("sym", "|")
                proj = self.expr()
                self.take("sym", "]")
                return A.PatternComp(pat, where, proj)
            except CypherSyntaxError:
                self.i = mark  # a parenthesized expression after all
        if self.at("ident") and self.at("kw", "in", k=1):
            var = self.take("ident")
            self.take("kw", "in")
            source = self.expr()
            where = self.expr() if self.accept("kw", "where") else None
            proj = None
            if self.accept("sym", "|"):
                proj = self.expr()
            self.take("sym", "]")
            return A.ListComp(var, source, where, proj)
        items: list = []
        if not self.at("sym", "]"):
            items.append(self.expr())
            while self.accept("sym", ","):
                items.append(self.expr())
        self.take("sym", "]")
        return A.ListLit(tuple(items))


def parse(text: str) -> A.Query:
    """Parse a Cypher query string into the AST."""
    return _Parser(text).query()


def parse_expression(text: str) -> A.Expr:
    """Parse a standalone Cypher expression — the
    ``gds.graph.filter('g', 'from', '*', 'r.distance <= 0.15')``
    predicate strings (round 8). The whole string must be one
    expression; trailing tokens are a syntax error."""
    p = _Parser(text)
    e = p.expr()
    tk, tv, pos, _ = p.peek()
    if tk != "eof":
        raise CypherSyntaxError(
            f"unexpected trailing input at position {pos}: {tv!r}"
        )
    return e
