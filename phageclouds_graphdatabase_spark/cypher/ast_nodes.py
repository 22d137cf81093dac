"""AST for the Cypher subset the reference emits (SURVEY.md §2-§3).

Every construct here appears in at least one of the nine query templates in
/root/reference/phageclouds_gdb.py:56-73, phageclouds_gdb_family.py:94-99 or
phageclouds_gdb_host.py:57-65 — plus the natural generalizations (undirected
edges, <- direction, DISTINCT, parameters) the compiler supports for the
correct-semantics variants the engine offers behind flags.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# --- expressions -----------------------------------------------------------


class Expr:
    __slots__ = ()


@dataclass(frozen=True)
class Literal(Expr):
    value: object  # str | int | float | bool | None


@dataclass(frozen=True)
class ListLit(Expr):
    items: tuple


@dataclass(frozen=True)
class Param(Expr):
    name: str


@dataclass(frozen=True)
class Var(Expr):
    """A bare identifier: a pattern variable or (after WITH) a projected
    column."""

    name: str


@dataclass(frozen=True)
class Prop(Expr):
    var: str
    name: str


@dataclass(frozen=True)
class Not(Expr):
    expr: Expr


@dataclass(frozen=True)
class And(Expr):
    left: Expr
    right: Expr


@dataclass(frozen=True)
class Or(Expr):
    left: Expr
    right: Expr


@dataclass(frozen=True)
class Cmp(Expr):
    op: str  # '=', '<>', '<', '<=', '>', '>='
    left: Expr
    right: Expr


@dataclass(frozen=True)
class StringPred(Expr):
    op: str  # 'CONTAINS', 'STARTS WITH', 'ENDS WITH'
    left: Expr
    right: Expr


@dataclass(frozen=True)
class InList(Expr):
    item: Expr
    source: Expr  # ListLit, Param, or an array-typed expression


@dataclass(frozen=True)
class IsNull(Expr):
    expr: Expr
    negated: bool


@dataclass(frozen=True)
class Arith(Expr):
    op: str  # '+', '-', '*', '/'
    left: Expr
    right: Expr


@dataclass(frozen=True)
class ListComp(Expr):
    """[x IN source WHERE pred | proj] — proj/pred each optional."""

    var: str
    source: Expr
    where: Expr | None
    proj: Expr | None


@dataclass(frozen=True)
class Quantifier(Expr):
    """all/any/none/single(x IN source WHERE pred) — list predicates."""

    kind: str  # 'all' | 'any' | 'none' | 'single'
    var: str
    source: Expr
    where: Expr


@dataclass(frozen=True)
class Reduce(Expr):
    """reduce(acc = init, x IN source | expr) — left fold over a list."""

    acc: str
    init: Expr
    var: str
    source: Expr
    expr: Expr


@dataclass(frozen=True)
class Func(Expr):
    name: str  # lowercase
    args: tuple
    distinct: bool = False
    star: bool = False  # count(*)


@dataclass(frozen=True)
class CaseExpr(Expr):
    """CASE [operand] WHEN v THEN r ... [ELSE d] END — simple form compares
    the operand to each WHEN value; generic form (no operand) takes boolean
    WHEN conditions. The reference's V1 color derivation is this shape."""

    operand: Expr | None
    whens: tuple  # ((when_expr, then_expr), ...)
    default: Expr | None


@dataclass(frozen=True)
class PatternPred(Expr):
    """Existential pattern predicate, e.g.
    WHERE (a)-[:infects]->(:Host {genus:"X"})
    (/root/reference/phageclouds_gdb_host.py:57)."""

    pattern: "PathPat"


@dataclass(frozen=True)
class ExistsSub(Expr):
    """Neo4j 5 block form: ``EXISTS { [MATCH] <pattern> [WHERE <expr>] }``
    — the modern spelling of the existential predicate, with an inner
    WHERE the inline form can't express."""

    pattern: "PathPat"
    where: "Expr | None"


@dataclass(frozen=True)
class CountSub(Expr):
    """Neo4j 5 ``COUNT { [MATCH] <pattern> [WHERE <expr>] }`` — correlated
    per-row match count (the idiomatic degree expression)."""

    pattern: "PathPat"
    where: "Expr | None"


@dataclass(frozen=True)
class PatternComp(Expr):
    """Pattern comprehension ``[(a)-[:T]->(b) WHERE pred | proj]`` — the
    Neo4j idiom for collecting a correlated neighborhood inline without a
    second MATCH. The pattern must start at a bound variable and contain at
    least one relationship; inner variables scope only to ``pred``/``proj``.
    Deviation (documented): Neo4j yields elements in match order, which is
    nondeterministic — this engine sorts elements ascending so results are
    reproducible and oracle-checkable."""

    pattern: "PathPat"
    where: "Expr | None"
    proj: Expr


# --- patterns --------------------------------------------------------------


@dataclass(frozen=True)
class NodePat:
    var: str | None
    label: str | None
    props: tuple = ()  # ((name, Literal|Param), ...)


@dataclass(frozen=True)
class EdgePat:
    var: str | None
    reltype: str | None
    props: tuple = ()
    direction: str = "out"  # 'out' (->), 'in' (<-), 'both' (undirected)
    var_length: tuple | None = None  # (min_hops, max_hops) for [:T*1..3]


@dataclass(frozen=True)
class PathPat:
    nodes: tuple  # (NodePat, ...), len == len(edges) + 1
    edges: tuple  # (EdgePat, ...)
    path_var: str | None = None  # p in `MATCH p = (a)-[...]->(b)`
    shortest: str | None = None  # 'one' (shortestPath) | 'all' (allShortestPaths)


# --- clauses ---------------------------------------------------------------


@dataclass(frozen=True)
class Subscript(Expr):
    """``list[i]`` — 0-based element access (negative = from the end, as
    Neo4j); out-of-range yields NULL. Also ``map['key']``/``entity['prop']``
    when the index is a string literal."""

    source: Expr
    index: Expr


@dataclass(frozen=True)
class Slice(Expr):
    """``list[lo..hi]`` — half-open 0-based slice; either bound may be
    omitted (``[..n]``, ``[n..]``). Negative bounds count from the end."""

    source: Expr
    lo: "Expr | None"
    hi: "Expr | None"


@dataclass(frozen=True)
class LoadCsv:
    """``LOAD CSV [WITH HEADERS] FROM <url> AS row [FIELDTERMINATOR s]`` —
    Neo4j's ingest clause. With headers, ``row`` binds a struct of STRING
    columns (row.col, then toInteger()/toFloat() casts — the Neo4j idiom);
    without, a list accessed as row[i]."""

    url: Expr
    var: str
    headers: bool
    sep: "Expr | None"


@dataclass(frozen=True)
class CallProc:
    """``CALL db.labels() [YIELD col [AS alias], ...]`` — an
    introspection procedure (db.*, answered from the GraphCatalog at
    compile time) or a graph-algorithm stream procedure
    (``CALL gds.pageRank.stream('sharesDNA', {maxIterations: 2})``,
    compiled to the corresponding operators/graph.py plan)."""

    name: str
    yields: tuple  # ((yield_name, alias_or_None), ...)
    args: tuple = ()  # (Expr, ...) — literal/param arguments
    where: object = None  # Expr | None — ``YIELD ... WHERE pred`` filter


@dataclass(frozen=True)
class SetLabel:
    """``SET n:Label`` — add the matched nodes to Label's table (shared
    columns carried, the rest NULL; idempotent by key)."""

    var: str
    label: str


@dataclass(frozen=True)
class LabelPred(Expr):
    """``n:Label`` in expression position — true iff the bound variable's
    label is Label (single-label catalog: a compile-time constant)."""

    var: str
    label: str


@dataclass(frozen=True)
class Xor(Expr):
    """``a XOR b`` — three-valued boolean exclusive-or (NULL-propagating,
    as Neo4j)."""

    left: Expr
    right: Expr


@dataclass(frozen=True)
class MapLit(Expr):
    """``{key: expr, ...}`` map literal — compiles to a named struct (the
    Spark-native heterogeneous map)."""

    items: tuple  # ((key, Expr), ...)


@dataclass(frozen=True)
class MapProj(Expr):
    """``n {.prop, .*, key: expr, var}`` — Neo4j map projection over a
    bound entity/map variable. Items are tagged tuples:
    ("prop", name) | ("all",) | ("kv", key, Expr) | ("var", name)."""

    var: str
    items: tuple


@dataclass(frozen=True)
class FieldAc(Expr):
    """``expr.name`` on a non-variable base — temporal accessors
    (``date(x).year``) when the base is a date/timestamp, struct/map field
    access otherwise."""

    base: Expr
    name: str


@dataclass(frozen=True)
class Regex(Expr):
    """``s =~ pattern`` — Neo4j regex match; the WHOLE string must match
    (Java String.matches semantics, not a substring search)."""

    left: Expr
    pattern: Expr


@dataclass(frozen=True)
class Star(Expr):
    """``RETURN *`` / ``WITH *`` — carry every bound variable through the
    projection (expanded at compile time from the frame's bindings, in
    binding order, before any explicitly-listed items)."""


@dataclass(frozen=True)
class Item:
    expr: Expr
    alias: str | None
    text: str  # source text (Cypher's default output column name)


@dataclass(frozen=True)
class MatchClause:
    patterns: tuple  # (PathPat, ...)
    where: Expr | None
    optional: bool


@dataclass(frozen=True)
class WithClause:
    items: tuple  # (Item, ...)
    distinct: bool = False
    where: Expr | None = None
    order_by: tuple = ()  # ((Expr, descending), ...)
    skip: int | None = None
    limit: int | None = None


@dataclass(frozen=True)
class UnwindClause:
    """UNWIND expr AS x — one row per list element (NULL/empty drop the
    row, matching Neo4j)."""

    expr: Expr
    alias: str


@dataclass(frozen=True)
class CallSub:
    """``CALL { WITH <vars> ... RETURN ... }`` — Neo4j scoped subquery,
    executed per outer row (the per-row top-k / per-row aggregate idiom).
    The first inner clause must be the importing WITH. ``optional=True``
    is Neo4j 5.24's OPTIONAL CALL: outer rows with an empty subquery
    result keep their row with NULL outputs."""

    query: "Query"
    optional: bool = False


@dataclass(frozen=True)
class ReturnClause:
    items: tuple
    distinct: bool = False
    order_by: tuple = ()  # ((Expr, descending: bool), ...)
    skip: int | None = None
    limit: int | None = None


# --- write clauses ---------------------------------------------------------
#
# The reference never writes (its three scripts are read-only Neo4j clients),
# so these are extension surface: the standard Cypher ingestion/maintenance
# clauses, compiled to copy-on-write DataFrame plans over the GraphCatalog
# (CypherEngine.apply) instead of transactional store mutations.


@dataclass(frozen=True)
class CreateClause:
    patterns: tuple  # (PathPat, ...)


@dataclass(frozen=True)
class MergeClause:
    """MERGE pattern [ON CREATE SET ...] [ON MATCH SET ...].

    set items are ((Prop, Expr), ...) — property assignments applied on the
    branch that fired for each source row."""

    pattern: "PathPat"
    on_create: tuple = ()
    on_match: tuple = ()


@dataclass(frozen=True)
class SetClause:
    items: tuple  # ((Prop | MapSet, payload), ...)


@dataclass(frozen=True)
class MapSet:
    """``SET n += {...}`` (merge: listed keys updated, rest untouched) or
    ``SET n = {...}`` (replace: listed keys updated, every OTHER non-key
    property nulled — Neo4j's whole-property-map overwrite). The payload
    in the SetClause item is either a ((name, Expr), ...) literal map or an
    :class:`Param` whose bound value is a dict."""

    var: str
    mode: str  # 'merge' | 'replace'


@dataclass(frozen=True)
class RemoveClause:
    """REMOVE n.prop / REMOVE n:Label — Neo4j's SET counterpart.

    Property removal is exactly ``SET n.prop = NULL`` (Neo4j stores no
    NULLs, so removed and NULL are indistinguishable — same here, where the
    declared StructType keeps the column and the value becomes NULL). Label
    removal maps to this engine's one-table-per-label catalog as removal of
    the matched rows from that label's node table, with incident edges
    KEPT (unlike DELETE): the entity merely stops matching ``:Label``."""

    props: tuple = ()  # (Prop, ...)
    labels: tuple = ()  # ((var, label), ...)


@dataclass(frozen=True)
class DeleteClause:
    names: tuple  # bound variable names
    detach: bool = False


@dataclass(frozen=True)
class ForeachClause:
    """FOREACH (var IN expr | update-clauses) — Neo4j's per-element update
    block. Compiled as a scoped UNWIND: the body's writes apply against the
    frame unwound by ``var`` (one driving row per list element), then the
    outer frame is restored unchanged (FOREACH never alters the record
    stream's cardinality; an empty/NULL list makes the body a no-op)."""

    var: str
    expr: Expr
    body: tuple  # write clauses (Create/Merge/Set/Remove/Delete/Foreach)


@dataclass(frozen=True)
class Query:
    clauses: tuple = field(default_factory=tuple)  # Match/With, then Return last


@dataclass(frozen=True)
class UnionQuery:
    """query UNION [ALL] query ... — Neo4j forbids mixing UNION and
    UNION ALL in one statement, so one flag covers every joint."""

    queries: tuple  # (Query, ...), len >= 2
    all: bool = False
