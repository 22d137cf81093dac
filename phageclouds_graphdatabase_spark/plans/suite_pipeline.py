"""Second wave of LLM-data-pipeline operators (SURVEY.md §2 [ext] rows):
as-of join (J7), MinHash-LSH banded candidate generation, BPE-style
regex pre-tokenization, and LSH-bucketed embedding-cosine near-dup --
each with a DuckDB oracle twin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from phageclouds_graphdatabase_spark.plans import _suite_helpers as h
from phageclouds_graphdatabase_spark.plans import suite_extensions as ext
from phageclouds_graphdatabase_spark.plans._suite_helpers import SuiteEntry, epoch_us, t


# --------------------------------------------------------------------------
# As-of join (J7): for each click, the user's most recent purchase at or
# before it. The scalable Spark shape is union + carry-forward window (one
# shuffle on user_id, no range join, no row explosion) -- the classic
# point-in-time-correct join of feature-store pipelines.
# --------------------------------------------------------------------------

def asof_prev_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").filter(F.col("event_type").isin("click", "purchase"))
    u = e.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("isp"),
    )
    # At equal ts a purchase sorts before a click (isp desc) => "at or
    # before" is inclusive; equal-ts purchases tie-break on event_id with
    # the LAST (max id) winning -- pinned identically in the oracle.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("isp").desc(), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "prev_purchase_id",
        F.last(F.when(F.col("isp") == 1, F.col("event_id")), ignorenulls=True).over(w),
    ).withColumn(
        "prev_purchase_ts",
        F.last(F.when(F.col("isp") == 1, F.col("ts")), ignorenulls=True).over(w),
    )
    return carried.filter(F.col("isp") == 0).select(
        F.col("event_id").alias("click_id"),
        "user_id",
        "ts",
        "prev_purchase_id",
        "prev_purchase_ts",
    )


ASOF_SQL = """
WITH u AS (
    SELECT user_id, ts, event_id,
           CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS isp
    FROM events WHERE event_type IN ('click', 'purchase')
), c AS (
    SELECT user_id, ts, event_id, isp,
           last_value(CASE WHEN isp = 1 THEN event_id END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, isp DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_purchase_id,
           last_value(CASE WHEN isp = 1 THEN ts END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, isp DESC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_purchase_ts
    FROM u
)
SELECT event_id AS click_id, user_id, ts, prev_purchase_id, prev_purchase_ts
FROM c WHERE isp = 0
"""


# --------------------------------------------------------------------------
# MinHash-LSH banded candidates (W5): signatures -> bands -> bucket join.
# This is the step that makes near-dup detection sub-quadratic at 100 TB:
# only documents agreeing on a whole band become candidate pairs.
# --------------------------------------------------------------------------

_N_BANDS = 2  # 4 minhashes, 2 rows per band


def minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    sigs = ext.minhash_signatures(spark, sf_dir)
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(
                    F.lit(0).alias("band"),
                    F.md5(F.concat("mh_0", "mh_1")).alias("bh"),
                ),
                F.struct(
                    F.lit(1).alias("band"),
                    F.md5(F.concat("mh_2", "mh_3")).alias("bh"),
                ),
            )
        ).alias("b"),
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    # Both join sides re-run the whole shingle->minhash pipeline without this
    # (2 full Scan+posexplode chains in the physical plan, 0 ReusedExchange);
    # the cached band table is just (doc_id, band, 32-hex) -- tiny.
    bands = bands.cache()
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


MINHASH_LSH_SQL = f"""
WITH sigs AS ({ext.MINHASH_SQL}),
bands AS (
    SELECT doc_id, 0 AS band, md5(mh_0 || mh_1) AS bh FROM sigs
    UNION ALL
    SELECT doc_id, 1 AS band, md5(mh_2 || mh_3) AS bh FROM sigs
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b
  ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
"""


# --------------------------------------------------------------------------
# BPE-style pre-tokenization (W5 text analysis): the \\w+|[^\\w\\s] regex is
# the standard BPE pre-tokenizer split (words vs punctuation runs).
# --------------------------------------------------------------------------

def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(r"\w+|[^\w\s]"), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.size(F.filter(toks, lambda x: ~x.rlike(r"^\w"))).cast("long").alias("n_punct_tokens"),
    )


TEXT_BPE_SQL = r"""
WITH tk AS (
    SELECT doc_id, regexp_extract_all(text, '\w+|[^\w\s]') AS toks FROM documents
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_bpe_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       CAST(len(list_filter(toks, x -> NOT regexp_matches(x, '^\w'))) AS BIGINT) AS n_punct_tokens
FROM tk
"""


# --------------------------------------------------------------------------
# Embedding-cosine near-dup via LSH buckets (W5): candidate pairs only
# within a bucket (sub-quadratic), exact quantized cosine inside. The
# brute-force twin is knn_cosine_bruteforce; this is the 100 TB path.
# --------------------------------------------------------------------------

_COS_THRESHOLD = 0.25


def embedding_neardup_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Catalyst plans each subplan instance independently (no common-subplan
    # reuse across join positions): qv appears 4x and buckets 2x below, so
    # cache both -- vectors/buckets are node-cardinality, tiny next to the
    # candidate pairs, and the same call at 100 TB pins the quantized
    # vector table in executor storage memory. Measured 1.71 s -> 0.49 s
    # at sf0.1.
    buckets = ext.ann_lsh_buckets(spark, sf_dir).cache()
    qv = ext._quantized(spark, sf_dir).cache()
    norms = qv.select(
        "vec_id",
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x * x).alias("n2"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = a.join(
        b,
        (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"))
    qa = qv.select(F.col("vec_id").alias("vec_a"), F.col("q").alias("qa"))
    qb = qv.select(F.col("vec_id").alias("vec_b"), F.col("q").alias("qb"))
    na = norms.select(F.col("vec_id").alias("vec_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("vec_id").alias("vec_b"), F.col("n2").alias("nb2"))
    scored = (
        cand.join(qa, "vec_a")
        .join(qb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.aggregate(
                F.zip_with("qa", "qb", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot"),
        )
        .join(na, "vec_a")
        .join(nb, "vec_b")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
        )
    )
    return scored.filter(F.col("cosine") >= _COS_THRESHOLD).select(
        "vec_a", "vec_b", "cosine"
    )


EMBED_NEARDUP_SQL = f"""
WITH buckets AS ({ext.ANN_LSH_SQL}),
{ext._QUANT_ELEMS_SQL.lstrip()},
cand AS (
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
    FROM buckets a JOIN buckets b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
),
dots AS (
    SELECT c.vec_a, c.vec_b, CAST(SUM(ea.qe * eb.qe) AS BIGINT) AS dot
    FROM cand c
    JOIN elems ea ON ea.vec_id = c.vec_a
    JOIN elems eb ON eb.vec_id = c.vec_b AND eb.d = ea.d
    GROUP BY c.vec_a, c.vec_b
)
SELECT vec_a, vec_b,
       CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
FROM dots
JOIN norms na ON na.vec_id = vec_a
JOIN norms nb ON nb.vec_id = vec_b
WHERE CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) >= {_COS_THRESHOLD}
"""


# --------------------------------------------------------------------------
# Collect-to-list aggregation (A1) + list dedup/union (A2) + distinct value
# set (A5): the engine form of Cypher's collect()/list comprehension
# (/root/reference/phageclouds_gdb_family.py:94, _host.py:57-59), on the
# testdata so the oracle can check it. Arrays are sorted so both engines
# agree on element order.
# --------------------------------------------------------------------------

def collect_order_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        h.arr_str(F.sort_array(F.collect_list("o_orderkey"))).alias(
            "order_keys"
        ),
        h.arr_str(F.sort_array(F.collect_set("o_orderpriority"))).alias(
            "priorities"
        ),
        F.count(F.lit(1)).alias("n_orders"),
    )


COLLECT_LISTS_SQL = """
SELECT o_custkey,
       array_to_string(list_sort(list(o_orderkey)), '->') AS order_keys,
       array_to_string(list_sort(list_distinct(list(o_orderpriority))), '->')
           AS priorities,
       COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey
"""


# --------------------------------------------------------------------------
# Presentation derivations (V3 palette assignment, V5 rank/attr extraction,
# V6 title formatting) -- the engine form of the family pipeline's
# color/title logic (/root/reference/phageclouds_gdb_family.py:47-66,109),
# exercised on the nation dim so the oracle can check it.
# --------------------------------------------------------------------------

_TAB20 = (
    "#1f77b4", "#aec7e8", "#ff7f0e", "#ffbb78", "#2ca02c",
    "#98df8a", "#d62728", "#ff9896", "#9467bd", "#c5b0d5",
    "#8c564b", "#c49c94", "#e377c2", "#f7b6d2", "#7f7f7f",
    "#c7c7c7", "#bcbd22", "#dbdb8d", "#17becf", "#9edae5",
)


def presentation_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    w = Window.orderBy("n_name")
    palette = F.array(*[F.lit(h) for h in _TAB20])
    idx = F.row_number().over(w) - 1
    joined = (
        n.join(per_nation, n["n_nationkey"] == per_nation["c_nationkey"], "left_outer")
        .withColumn("n_cust", F.coalesce("n_cust", F.lit(0)))
        .withColumn("palette_idx", idx.cast("long"))
    )
    return joined.select(
        "n_name",
        "palette_idx",
        F.element_at(palette, (F.col("palette_idx") % len(_TAB20) + 1).cast("int")).alias("hex"),
        F.concat(
            F.lit("Nation: "),
            F.col("n_name"),
            F.lit("<br>Customers: "),
            F.regexp_replace(F.format_number(F.col("n_cust"), 0), ",", "_"),
        ).alias("title"),
        F.col("n_cust").cast("long").alias("n_cust"),
    )


_TAB20_SQL_ARRAY = "[" + ", ".join(f"'{h}'" for h in _TAB20) + "]"

PRESENTATION_SQL = f"""
WITH per_nation AS (
    SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
), j AS (
    SELECT n.n_name,
           CAST(row_number() OVER (ORDER BY n.n_name) - 1 AS BIGINT) AS palette_idx,
           COALESCE(p.n_cust, 0) AS n_cust
    FROM nation n LEFT JOIN per_nation p ON n.n_nationkey = p.c_nationkey
)
SELECT n_name, palette_idx,
       ({_TAB20_SQL_ARRAY})[CAST(palette_idx % 20 AS INTEGER) + 1] AS hex,
       'Nation: ' || n_name || '<br>Customers: ' ||
         replace(format('{{:,}}', n_cust), ',', '_') AS title,
       CAST(n_cust AS BIGINT) AS n_cust
FROM j
"""


# --------------------------------------------------------------------------
# Real Structured Streaming in the driver contract (W3): the readStream
# tumbling-window plan executed with Trigger.AvailableNow; its complete-mode
# output must equal the batch aggregation, which is the oracle.
# --------------------------------------------------------------------------

def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from phageclouds_graphdatabase_spark.streaming import events as stream

    s = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.tumbling_counts(s), output_mode="complete"
    )
    return spark.createDataFrame(
        rows, "window_start timestamp, event_type string, n_events long"
    )


STREAM_TUMBLING_SQL = """
SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start, event_type,
       COUNT(*) AS n_events
FROM events GROUP BY 1, 2
"""


def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows under REAL Structured Streaming (readStream +
    watermark + F.session_window, Trigger.AvailableNow) — the stateful
    merging-window operator, not its batch twin (events_session_window
    covers that). Complete-mode output equals the batch session
    computation, which is the oracle."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    s = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.session_counts(s), output_mode="complete"
    )
    return spark.createDataFrame(
        rows, "user_id long, session_start timestamp, n_events long"
    )


STREAM_SESSION_SQL = """
WITH x AS (
    SELECT user_id, ts,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
                THEN 1 ELSE 0 END AS new_s
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
y AS (
    SELECT user_id, ts,
           SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM x
)
SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events
FROM y GROUP BY user_id, sid
"""


def stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The applyInPandasWithState custom stateful operator, driven through
    the driver contract: per-user running totals over the event stream. The
    source is one parquet file -> one micro-batch, so the update-mode output
    IS the final state, which the batch aggregation oracle checks."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    s = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.running_user_totals(s), output_mode="update"
    )
    final: dict = {}
    for r in rows:  # last row per user wins (single batch -> one row each)
        final[r.user_id] = (r.n_events, r.sum_value_cents)
    return spark.createDataFrame(
        [(k, n, s_) for k, (n, s_) in final.items()],
        "user_id long, n_events long, sum_value_cents long",
    )


STREAM_USER_TOTALS_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY user_id
"""


def stream_user_totals_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark 4 ``transformWithStateInPandas`` StatefulProcessor (W3+W4),
    in the driver contract since round 2: its Python worker speaks protobuf
    to the JVM state server, which vendor/protomini supplies when the real
    protobuf distribution is absent. Requires the RocksDB state store
    provider; same batch-aggregation oracle as the applyInPandasWithState
    twin — two stateful APIs, one oracle."""
    from phageclouds_graphdatabase_spark.streaming import events as stream
    from phageclouds_graphdatabase_spark.vendor import ensure_protobuf_on_workers

    # Post-JVM-safe: also routes protomini to the JVM-spawned workers via
    # sc.environment["PYTHONPATH"] when the session launched before this
    # package was imported (the external-harness ordering).
    if not ensure_protobuf_on_workers(spark):  # pragma: no cover
        raise RuntimeError("no protobuf runtime available")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        s = stream.read_events_stream(spark, sf_dir)
        rows = stream.run_available_now(
            stream.running_user_totals_tws(s), output_mode="update"
        )
    finally:
        if old:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", old
            )
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    final: dict = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.sum_value_cents)
    return spark.createDataFrame(
        [(k, n, s_) for k, (n, s_) in final.items()],
        "user_id long, n_events long, sum_value_cents long",
    )


def _run_tws(spark: SparkSession, sf_dir: str, builder) -> list:
    """Shared RocksDB-provider harness for the transformWithState entries:
    protobuf routed to workers post-JVM, provider conf restored after."""
    from phageclouds_graphdatabase_spark.streaming import events as stream
    from phageclouds_graphdatabase_spark.vendor import ensure_protobuf_on_workers

    if not ensure_protobuf_on_workers(spark):  # pragma: no cover
        raise RuntimeError("no protobuf runtime available")
    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        s = stream.read_events_stream(spark, sf_dir)
        return stream.run_available_now(builder(s), output_mode="update")
    finally:
        if old:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)
        else:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


STREAM_TYPE_COUNTS_SQL = """
SELECT user_id, event_type, COUNT(*) AS n
FROM events GROUP BY user_id, event_type
"""


def stream_type_counts_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapState StatefulProcessor (W3+W4): per-user per-event-type running
    counts through the state server's map protocol; the last update-mode
    row per (user, type) equals the batch GROUP BY — the oracle."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    rows = _run_tws(spark, sf_dir, stream.running_type_counts_tws)
    final: dict = {}
    for r in rows:
        final[(r.user_id, r.event_type)] = r.n
    return spark.createDataFrame(
        [(u, t, n) for (u, t), n in final.items()],
        "user_id long, event_type string, n long",
    )


def stream_event_log_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ListState StatefulProcessor (W3+W4): per-user append-only cents log,
    totals recomputed each batch by iterating the persisted list (proves
    AppendList + iterator paging); same oracle as the ValueState twin."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    rows = _run_tws(spark, sf_dir, stream.user_event_log_tws)
    final: dict = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.sum_value_cents)
    return spark.createDataFrame(
        [(k, n, s_) for k, (n, s_) in final.items()],
        "user_id long, n_events long, sum_value_cents long",
    )


_IVF_PROBE_CELLS = [(1, (1, 2)), (2, (2, 3)), (3, (3, 4))]


def ivf_partitioned_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index at rest (operators/ann.py): the corpus written
    partitionBy(cell), the probe a partition-PRUNED scan + in-place scoring
    — the measured fix for the join-probe's candidate shuffle (SCALE.md
    "ANN rehearsal": 86 s join-probe vs pruned-scan shape). Cell rule here
    is vec_id % 8 so the oracle can replicate the layout; the pruning
    physics is identical however cells are assigned. Integer-quantized
    dot products keep the cosine bit-identical cross-engine."""
    import tempfile

    from phageclouds_graphdatabase_spark.operators import ann

    qv = ext._quantized(spark, sf_dir)
    assigned = qv.select(
        "vec_id",
        F.pmod("vec_id", F.lit(8)).cast("int").alias("cell"),
        F.col("q").cast("array<double>").alias("vec"),
    )
    path = tempfile.mkdtemp(prefix="ivf_probe_") + "/index"
    ann.write_ivf_index(assigned, path)
    queries = [
        (int(r.vec_id), [float(x) for x in r.q])
        for r in qv.filter(F.col("vec_id").isin([q for q, _ in _IVF_PROBE_CELLS]))
        .collect()
    ]
    query_cells = [(q, list(cs)) for q, cs in _IVF_PROBE_CELLS]
    got = ann.probe_topk(spark, path, query_cells, queries, k=5)
    return got.select(
        F.col("qid").alias("query_id"),
        F.col("vec_id").alias("neighbor_id"),
        F.col("sim").alias("cosine"),
    )


IVF_PROBE_SQL = "WITH " + ext._QUANT_ELEMS_SQL + """
, probe(qid, cell) AS (VALUES (1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4))
, dots AS (
    SELECT p.qid AS query_id, b.vec_id AS neighbor_id,
           CAST(SUM(a.qe * b.qe) AS BIGINT) AS dot
    FROM probe p
    JOIN elems a ON a.vec_id = p.qid
    JOIN elems b ON b.d = a.d AND b.vec_id % 8 = p.cell
    GROUP BY p.qid, b.vec_id
)
, scored AS (
    SELECT query_id, neighbor_id,
           CAST(dot AS DOUBLE) /
           (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM dots
    JOIN norms na ON na.vec_id = query_id
    JOIN norms nb ON nb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored) z
WHERE rnk <= 5
"""


def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static join driven through the driver contract: the event
    stream enriched with the (static) customer dim, aggregated per
    (segment, type). Complete-mode output equals the batch join+agg, which
    is the oracle."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    s = stream.read_events_stream(spark, sf_dir)
    cust = t(spark, sf_dir, "customer")
    rows = stream.run_available_now(
        stream.stream_static_segment_counts(s, cust), output_mode="complete"
    )
    return spark.createDataFrame(
        rows, "c_mktsegment string, event_type string, n_events long"
    )


STREAM_STATIC_SQL = """
SELECT c_mktsegment, event_type, COUNT(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1, 2
"""


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (purchases x preceding clicks) through
    the driver contract; append-mode inner join over the availableNow
    backfill emits exactly the batch join's rows, which is the oracle."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    p = stream.read_events_stream(spark, sf_dir)
    c = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.purchase_click_pairs(p, c), output_mode="append"
    )
    return spark.createDataFrame(
        rows, "purchase_id long, click_id long, user_id long"
    )


STREAM_STREAM_SQL = """
SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts BETWEEN p.ts - INTERVAL '10 minutes' AND p.ts
"""


def vis_html_golden_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource (Spark 4 DataSource API): every reference
    vis.js HTML network scanned as one nodes table, one file per partition.
    Value-oracled since round 2: DuckDB re-extracts the same vis.DataSet
    JSON via read_text + regexp_extract + JSON unnest, so the custom
    source's full row values hash-check (was rows-only in round 1)."""
    from phageclouds_graphdatabase_spark.sources import vis_datasource

    vis_datasource.register(spark)
    ref = "/root/reference"
    if not os.path.isdir(ref):
        return spark.createDataFrame([], vis_datasource.NODES_SCHEMA)
    return (
        spark.read.format("vis_html")
        .option("kind", "nodes")
        .load(ref)
        .orderBy("_file", "id")
    )


VIS_HTML_SCAN_SQL = r"""
WITH files AS (
    SELECT regexp_replace(filename, '.*/', '') AS _file, content
    FROM read_text('/root/reference/*.html')
),
raw AS (
    SELECT _file,
           regexp_extract(
               content, '(?s)nodes = new vis\.DataSet\((\[.*?\])\);', 1
           ) AS njson
    FROM files
),
n AS (
    SELECT _file, unnest(CAST(njson AS JSON[])) AS j FROM raw
)
SELECT CAST(j->>'id' AS VARCHAR) AS id,
       j->'color'->>'background' AS color_background,
       j->'color'->>'border' AS color_border,
       CAST(j->>'size' AS INTEGER) AS size,
       j->>'title' AS title,
       _file
FROM n
"""


def skew_safe_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase (salted) aggregation from operators/skew.py in the driver
    contract: result-identical to a plain groupBy-count, but the reduce side
    of a dominant key splits across salts first (SCALE.md skew policy)."""
    from phageclouds_graphdatabase_spark.operators.skew import two_phase_count

    return two_phase_count(t(spark, sf_dir, "events"), "event_type", n_salts=8)


SKEW_COUNTS_SQL = """
SELECT event_type, COUNT(*) AS count FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Motif matching (J1 multi-way joins, GraphFrames-style): wedge counting
# (a)-[]->(b)<-[]-(c) on the induced subgraph. (The derived graph is
# bipartite part->supplier, so triangles are structurally absent; the wedge
# is its natural 3-node motif.) At 100 TB the a.src < c.src predicate halves
# the join output and the per-dst groupBy is combiner-reduced.
# --------------------------------------------------------------------------

def graph_wedge_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    induced = ext.graph_induced_edges(spark, sf_dir)
    e1, e2 = induced.alias("e1"), induced.alias("e2")
    return (
        e1.join(
            e2,
            (F.col("e1.dst") == F.col("e2.dst")) & (F.col("e1.src") < F.col("e2.src")),
        )
        .groupBy(F.col("e1.dst").alias("center"))
        .agg(F.count(F.lit(1)).alias("n_wedges"))
    )


GRAPH_WEDGES_SQL = (
    ext._GRAPH_CTE
    + """
SELECT e1.dst AS center, COUNT(*) AS n_wedges
FROM induced e1 JOIN induced e2
  ON e1.dst = e2.dst AND e1.src < e2.src
GROUP BY e1.dst
"""
)


def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (the GraphFrames `triangleCount` surface) on
    the supplier co-supply graph: S_i -- S_j iff both supply some part
    (unipartite, so triangles exist, unlike the bipartite derived graph).

    Scale design: edges are ORIENTED from the endpoint with the smaller
    (degree, id) to the larger before the wedge self-join, so each triangle
    is enumerated exactly once and the join fan-out per node is bounded by
    out-degree under the degree total order (O(edges^1.5) work overall, the
    arboricity bound) instead of the unoriented max-degree^2 blow-up on hub
    nodes. The oracle counts the same triangles via the id-canonical
    3-join; per-corner counts are orientation-invariant."""
    li = t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("p"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
    ).distinct()
    e = (
        ps.alias("x")
        .join(ps.alias("y"), "p")
        .filter(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .distinct()
    )
    # delegates to the shared operator (round 5): same degree orientation
    # and once-per-triangle enumeration, now with the k-truss family's
    # gated sort-free closing join (operators/graph.py triangle_counts)
    from phageclouds_graphdatabase_spark.operators import graph as G

    return G.triangle_counts(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


def graph_node_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neighborhood node similarity (the Neo4j GDS ``nodeSimilarity``
    surface, the natural companion to the reference's distance-threshold
    clouds): Jaccard of S-neighbor sets between part nodes of the derived
    bipartite graph, top-10 most-similar per node (the GDS topK default)
    with a deterministic (jaccard desc, id) tie-break.

    Scale design: intersections come from a partial-agg'd co-neighbor
    self-join keyed on the shared neighbor -- the only shuffle of edge
    cardinality; degree tables are node-cardinality and broadcast. Hub
    neighbors fan out quadratically, which is the same skew the dedup
    family already handles -- at 100 TB the production fix is the
    frequency-cap + exact-verify pattern of
    operators/dedup.py:jaccard_pairs_capped. Jaccard = inter/(da+db-inter)
    from exact ints, so the doubles are correctly-rounded identically in
    both engines."""
    # delegates to the shared operator (round 5, the GDS nodeSimilarity
    # surface — operators/graph.py node_similarity_topk)
    from phageclouds_graphdatabase_spark.operators import graph as G

    return G.node_similarity_topk(
        h.graph_edges(spark, sf_dir, threshold=h.GRAPH_THRESHOLD), k=10
    )


GRAPH_NODE_SIM_SQL = f"""
WITH e AS (
    SELECT DISTINCT src, dst FROM ({h.GRAPH_EDGES_SQL}) _e WHERE distance <= {h.GRAPH_THRESHOLD}
),
inter AS (
    SELECT x.src AS a, y.src AS b, COUNT(*) AS inter
    FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
    GROUP BY x.src, y.src
),
deg AS (SELECT src AS n, COUNT(*) AS d FROM e GROUP BY src),
scored AS (
    SELECT a, b, CAST(inter AS BIGINT) AS inter,
           CAST(da.d + db.d - inter AS BIGINT) AS union_sz,
           CAST(inter AS DOUBLE) / (da.d + db.d - inter) AS jaccard
    FROM inter JOIN deg da ON da.n = a JOIN deg db ON db.n = b
),
sym AS (
    SELECT a, b, inter, union_sz, jaccard FROM scored
    UNION ALL
    SELECT b AS a, a AS b, inter, union_sz, jaccard FROM scored
)
SELECT a, b, inter, union_sz, jaccard, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY a
                                   ORDER BY jaccard DESC, b) AS rnk
      FROM sym) z
WHERE rnk <= 10
"""


def graph_node_similarity_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodeSimilarity with similarityMetric OVERLAP (round 6 — the
    stock-GDS metric knob): score = inter / min(da, db), the containment
    coefficient (a small node fully inside a big neighborhood scores
    1.0 where Jaccard dilutes it). Same candidate machinery; only the
    scoring tail changes (operators/graph.py _nodesim_rank)."""
    from phageclouds_graphdatabase_spark.operators import graph as G

    return G.node_similarity_topk(
        h.graph_edges(spark, sf_dir, threshold=h.GRAPH_THRESHOLD),
        k=10,
        metric="overlap",
    )


def _nodesim_metric_sql(metric_expr: str, metric: str) -> str:
    """GRAPH_NODE_SIM_SQL with the scoring expression swapped — one
    template, three metrics, so the oracles cannot drift from each
    other (the shared-constant lesson)."""
    return f"""
WITH e AS (
    SELECT DISTINCT src, dst FROM ({h.GRAPH_EDGES_SQL}) _e WHERE distance <= {h.GRAPH_THRESHOLD}
),
inter AS (
    SELECT x.src AS a, y.src AS b, COUNT(*) AS inter
    FROM e x JOIN e y ON x.dst = y.dst AND x.src < y.src
    GROUP BY x.src, y.src
),
deg AS (SELECT src AS n, COUNT(*) AS d FROM e GROUP BY src),
scored AS (
    SELECT a, b, CAST(inter AS BIGINT) AS inter,
           CAST(da.d + db.d - inter AS BIGINT) AS union_sz,
           {metric_expr} AS {metric}
    FROM inter JOIN deg da ON da.n = a JOIN deg db ON db.n = b
),
sym AS (
    SELECT a, b, inter, union_sz, {metric} FROM scored
    UNION ALL
    SELECT b AS a, a AS b, inter, union_sz, {metric} FROM scored
)
SELECT a, b, inter, union_sz, {metric}, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY a
                                   ORDER BY {metric} DESC, b) AS rnk
      FROM sym) z
WHERE rnk <= 10
"""


GRAPH_NODE_SIM_OVERLAP_SQL = _nodesim_metric_sql(
    "CAST(inter AS DOUBLE) / LEAST(da.d, db.d)", "overlap"
)

GRAPH_NODE_SIM_COSINE_SQL = _nodesim_metric_sql(
    "CAST(inter AS DOUBLE) / sqrt(CAST(da.d * db.d AS DOUBLE))", "cosine"
)


def graph_node_similarity_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-capped node similarity (round 5): the 100-TB form of
    graph_node_similarity — candidates from the hub-pruned co-neighbor
    index (bounding any reducer at cap²), values from exact full-set
    verification (operators/graph.py node_similarity_topk_capped; the
    jaccard_pairs_capped pattern).

    Round 6 (VERDICT r5 "What's wrong" #2): the entry now SELF-GATES via
    ``freq_cap="auto"`` — the operator reads the shared-neighbor df
    histogram (one groupBy(df).count(), the sample_roots trick) and only
    pays the cap+verify two-pass when max_df > 4 × median_df; on this
    dense small-domain demo graph (no skew at all) it delegates to the
    uncapped single pass, identical output at ~half the cost. The cap,
    when it engages, is 4 × median_df computed from the POST-cutoff
    edge set (ADVICE r5 plan/oracle divergence fix; the round-5
    (9·max_df) div 10 form is measured toothless under heavy-tailed
    dfs — SCALE.md round-6 found-and-fixed). The oracle replicates
    gate + cap + verify in integer-exact SQL — a never-hot cap
    (cap = max_df) reduces to the single pass because verification is
    exact, so ONE SQL covers both branches."""
    from phageclouds_graphdatabase_spark.operators import graph as G

    return G.node_similarity_topk_capped(
        h.graph_edges(spark, sf_dir, threshold=h.GRAPH_THRESHOLD),
        k=10,
        freq_cap="auto",
        upper_degree_cutoff=10_000,
        # graph_edges is a groupBy build — one row per (src, dst) by
        # construction, so the operator's distinct pass is skippable
        assume_distinct=True,
    )


GRAPH_NODE_SIM_CAPPED_SQL = f"""
WITH e0 AS (
    SELECT DISTINCT src, dst FROM ({h.GRAPH_EDGES_SQL}) _e WHERE distance <= {h.GRAPH_THRESHOLD}
),
keepers AS (SELECT src FROM e0 GROUP BY src HAVING COUNT(*) <= 10000),
e AS (SELECT src, dst FROM e0 WHERE src IN (SELECT src FROM keepers)),
dfs AS (SELECT COUNT(*) AS df FROM e GROUP BY dst),
stats AS (
    SELECT MAX(df) AS mx,
           (SELECT df
            FROM (SELECT df, ROW_NUMBER() OVER (ORDER BY df) AS rn FROM dfs) q
            WHERE rn = (SELECT (COUNT(*) + 1) // 2 FROM dfs)) AS med
    FROM dfs
),
hot AS (
    SELECT dst FROM e GROUP BY dst
    HAVING COUNT(*) > (SELECT CASE WHEN mx > 4 * med
                                   THEN 4 * med
                                   ELSE mx END
                       FROM stats)
),
idx AS (SELECT src, dst FROM e WHERE dst NOT IN (SELECT dst FROM hot)),
cand AS (
    SELECT DISTINCT x.src AS a, y.src AS b
    FROM idx x JOIN idx y ON x.dst = y.dst AND x.src < y.src
),
inter AS (
    SELECT c.a, c.b, COUNT(*) AS inter
    FROM cand c
    JOIN e ea ON ea.src = c.a
    JOIN e eb ON eb.src = c.b AND eb.dst = ea.dst
    GROUP BY c.a, c.b
),
deg AS (SELECT src AS n, COUNT(*) AS d FROM e GROUP BY src),
scored AS (
    SELECT a, b, CAST(inter AS BIGINT) AS inter,
           CAST(da.d + db.d - inter AS BIGINT) AS union_sz,
           CAST(inter AS DOUBLE) / (da.d + db.d - inter) AS jaccard
    FROM inter JOIN deg da ON da.n = a JOIN deg db ON db.n = b
),
sym AS (
    SELECT a, b, inter, union_sz, jaccard FROM scored
    UNION ALL
    SELECT b AS a, a AS b, inter, union_sz, jaccard FROM scored
)
SELECT a, b, inter, union_sz, jaccard, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY a
                                   ORDER BY jaccard DESC, b) AS rnk
      FROM sym) z
WHERE rnk <= 10
"""


def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node local clustering coefficient (Neo4j GDS
    ``localClusteringCoefficient``): lcc = 2*triangles / (deg*(deg-1)) on
    the supplier co-supply graph, 0 for degree < 2. Reuses the
    degree-oriented triangle counts (same O(edges^1.5) enumeration) and a
    node-cardinality degree table; both divisions are exact-int inputs so
    the doubles match the oracle bit-for-bit."""
    li = t(spark, sf_dir, "lineitem")
    ps = li.select(
        F.col("l_partkey").alias("p"),
        F.concat(F.lit("S"), F.col("l_suppkey")).alias("s"),
    ).distinct()
    e = (
        ps.alias("x")
        .join(ps.alias("y"), "p")
        .filter(F.col("x.s") < F.col("y.s"))
        .select(F.col("x.s").alias("a"), F.col("y.s").alias("b"))
        .distinct()
    )
    # delegates to the shared operator (round 5 —
    # operators/graph.py local_clustering_coefficient)
    from phageclouds_graphdatabase_spark.operators import graph as G

    return G.local_clustering_coefficient(
        e.select(F.col("a").alias("src"), F.col("b").alias("dst"))
    )


GRAPH_LCC_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, 'S' || l_suppkey AS s FROM lineitem),
e AS (
    SELECT DISTINCT x.s AS a, y.s AS b
    FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s
),
deg AS (
    SELECT id, CAST(COUNT(*) AS BIGINT) AS degree
    FROM (SELECT a AS id FROM e UNION ALL SELECT b FROM e)
    GROUP BY id
),
tri AS (
    SELECT e1.a AS c1, e1.b AS c2, e2.b AS c3
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
tcnt AS (
    SELECT n AS id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM (SELECT c1 AS n FROM tri UNION ALL SELECT c2 FROM tri UNION ALL SELECT c3 FROM tri)
    GROUP BY n
)
SELECT deg.id, deg.degree,
       CAST(COALESCE(tcnt.n_triangles, 0) AS BIGINT) AS n_triangles,
       CASE WHEN deg.degree >= 2
            THEN 2.0 * COALESCE(tcnt.n_triangles, 0) / (deg.degree * (deg.degree - 1))
            ELSE 0.0 END AS lcc
FROM deg LEFT JOIN tcnt ON tcnt.id = deg.id
"""


GRAPH_TRIANGLES_SQL = """
WITH ps AS (SELECT DISTINCT l_partkey AS p, 'S' || l_suppkey AS s FROM lineitem),
e AS (
    SELECT DISTINCT x.s AS a, y.s AS b
    FROM ps x JOIN ps y ON x.p = y.p AND x.s < y.s
),
tri AS (
    SELECT e1.a AS c1, e1.b AS c2, e2.b AS c3
    FROM e e1
    JOIN e e2 ON e2.a = e1.b
    JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT n AS id, CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM (
    SELECT c1 AS n FROM tri
    UNION ALL SELECT c2 FROM tri
    UNION ALL SELECT c3 FROM tri
)
GROUP BY n
"""


def graph_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-truss peeling (operators/graph.py k_truss) on the same-brand
    adjacent-size part graph — a sparse clustered graph where truss
    peeling actually cascades (the co-supplier graph is complete at small
    SF, so every edge trivially survives). Exactly TWO peel rounds, the
    deterministic form the unrolled oracle mirrors round-for-round (at
    sf0.01 two rounds IS the fixpoint: 4,718 -> 4,123 -> 4,095 edges).

    Scale: the brand equi-join keys the edge build (size band is a
    residual predicate — at 100 TB the build becomes a (brand,
    size-bucket) equi-join exactly like the binned range join of
    operators/rangejoin.py); each peel's triangle enumeration is the
    degree-oriented O(m^1.5) join shared with graph_triangle_counts."""
    from phageclouds_graphdatabase_spark.operators import graph as graph_ops

    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    x, y = p.alias("x"), p.alias("y")
    e = x.join(
        y,
        (F.col("x.p_brand") == F.col("y.p_brand"))
        & (F.abs(F.col("x.p_size") - F.col("y.p_size")) <= 1)
        & (F.col("x.p_partkey") < F.col("y.p_partkey")),
    ).select(
        F.col("x.p_partkey").alias("src"), F.col("y.p_partkey").alias("dst")
    )
    out = graph_ops.k_truss(e, k=4, rounds=2)
    return out.select(
        F.col("a").cast("long").alias("a"),
        F.col("b").cast("long").alias("b"),
        F.col("support").cast("long").alias("support"),
    )


GRAPH_KTRUSS_SQL = """
WITH e0 AS (
    SELECT x.p_partkey AS a, y.p_partkey AS b
    FROM part x JOIN part y
      ON x.p_brand = y.p_brand AND abs(x.p_size - y.p_size) <= 1
     AND x.p_partkey < y.p_partkey
),
tri0 AS (
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM e0 e1 JOIN e0 e2 ON e2.a = e1.b
    JOIN e0 e3 ON e3.a = e1.a AND e3.b = e2.b
),
sup0 AS (
    SELECT ed.a, ed.b, COALESCE(t.s, 0) AS s FROM e0 ed LEFT JOIN (
        SELECT a, b, COUNT(*) AS s FROM (
            SELECT a, b FROM tri0
            UNION ALL SELECT a, c FROM tri0
            UNION ALL SELECT b, c FROM tri0
        ) GROUP BY a, b
    ) t ON ed.a = t.a AND ed.b = t.b
),
e1x AS (SELECT a, b FROM sup0 WHERE s >= 2),
tri1 AS (
    SELECT e1.a AS a, e1.b AS b, e2.b AS c
    FROM e1x e1 JOIN e1x e2 ON e2.a = e1.b
    JOIN e1x e3 ON e3.a = e1.a AND e3.b = e2.b
),
sup1 AS (
    SELECT ed.a, ed.b, COALESCE(t.s, 0) AS s FROM e1x ed LEFT JOIN (
        SELECT a, b, COUNT(*) AS s FROM (
            SELECT a, b FROM tri1
            UNION ALL SELECT a, c FROM tri1
            UNION ALL SELECT b, c FROM tri1
        ) GROUP BY a, b
    ) t ON ed.a = t.a AND ed.b = t.b
)
SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(s AS BIGINT) AS support
FROM sup1 WHERE s >= 2
"""


# --------------------------------------------------------------------------
# GROUPING SETS (A6 completion beyond rollup/cube): independent grouping
# dimensions in one pass.
# --------------------------------------------------------------------------

def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority"], ["o_orderstatus"]],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(F.count(F.lit(1)).alias("n_orders"))


GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


# --------------------------------------------------------------------------
# Approximate aggregations (A6): HLL++ distinct + quantile sketch. The
# sketch algorithms differ between engines, so the approx VALUES can't be
# oracle-hashed -- instead the Spark side verifies its own sketches against
# the exact answers it also computes (tolerance-verdict booleans + the exact
# values), and the oracle emits the same exact values with TRUE constants.
# A hash match therefore proves BOTH the exact aggregates and that the
# sketches met their error bounds (HLL++ rsd 0.05 -> 3-sigma 0.15 bound;
# percentile_approx accuracy 10000 -> rank-fraction error <= 0.005).
# --------------------------------------------------------------------------

def approx_stats_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    approx = li.agg(
        F.approx_count_distinct("l_orderkey").alias("a_orders"),
        F.approx_count_distinct("l_partkey").alias("a_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias(
            "qs"
        ),
    )
    exact = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    j = approx.crossJoin(exact)
    # rank(v) = #rows with price <= v; sketch guarantees |rank/n - q| small
    ranks = li.crossJoin(F.broadcast(j)).agg(
        *[
            F.sum(
                (F.col("l_extendedprice") <= F.col("qs")[i]).cast("long")
            ).alias(f"rank_q{i}")
            for i in range(3)
        ]
    )
    out = j.crossJoin(F.broadcast(ranks))
    rel = lambda a, e: F.abs(a.cast("double") / e - 1.0)  # noqa: E731
    qok = [
        (
            F.abs(
                F.col(f"rank_q{i}").cast("double") / F.col("n_rows")
                - F.lit(q)
            )
            <= F.lit(0.005)
        ).alias(f"q{int(q * 100)}_ok")
        for i, q in enumerate((0.5, 0.9, 0.99))
    ]
    return out.select(
        (rel(F.col("a_orders"), F.col("exact_orders")) <= 0.15).alias(
            "orders_ok"
        ),
        (rel(F.col("a_parts"), F.col("exact_parts")) <= 0.15).alias(
            "parts_ok"
        ),
        *qok,
        F.col("exact_orders"),
        F.col("exact_parts"),
        F.col("n_rows"),
    )


APPROX_STATS_SQL = """
SELECT TRUE AS orders_ok, TRUE AS parts_ok,
       TRUE AS q50_ok, TRUE AS q90_ok, TRUE AS q99_ok,
       CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
"""


# --------------------------------------------------------------------------
# Python UDTF (W4, Spark 3.5+/4 surface) driven through the spark.sql front
# door (S2) as a LATERAL correlated table function: explode each event's
# props JSON into (key, value) rows.
# --------------------------------------------------------------------------

def udtf_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json

    from pyspark.sql.functions import udtf

    @udtf(returnType="prop_key string, prop_value string")
    class ExplodeProps:
        def eval(self, props: str):
            for k, v in json.loads(props).items():
                yield k, str(v)

    spark.udtf.register("explode_props", ExplodeProps)
    t(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    return spark.sql(
        """
        SELECT e.event_id, f.prop_key, f.prop_value
        FROM events_v e, LATERAL explode_props(e.props) f
        """
    )


UDTF_PROPS_SQL = """
SELECT e.event_id, k.key AS prop_key,
       CAST(json_extract(e.props, '$.' || k.key) AS VARCHAR) AS prop_value
FROM events e, LATERAL (SELECT unnest(json_keys(e.props)) AS key) k
"""


def udtf_table_arg_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with a TABLE() argument (Spark 4): top-2 orders per
    customer. PARTITION BY routes each customer's rows to one UDTF
    instance, which accumulates in eval() and emits from terminate() --
    the SQL-native form of a custom per-group table function. (The
    DataFrame twin is a rank window; this exercises the TABLE() surface.)"""
    import math

    from pyspark.sql.functions import udtf

    @udtf(returnType="o_custkey bigint, o_orderkey bigint, o_totalprice_cents bigint")
    class TopOrders:
        def __init__(self):
            self._rows: list = []

        def eval(self, row):
            self._rows.append(
                (row["o_custkey"], row["o_orderkey"], row["o_totalprice"])
            )

        def terminate(self):
            self._rows.sort(key=lambda r: (-r[2], r[1]))
            for ck, ok, tp in self._rows[:2]:
                yield ck, ok, int(math.floor(tp * 100.0 + 0.5))

    spark.udtf.register("top_orders", TopOrders)
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        "SELECT * FROM top_orders(TABLE(orders_v) PARTITION BY o_custkey)"
    )


UDTF_TABLE_ARG_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_totalprice_cents
FROM (
    SELECT o_custkey, o_orderkey, o_totalprice,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
           ) AS rn
    FROM orders
) WHERE rn <= 2
"""


# --------------------------------------------------------------------------
# Rolling-hash document fingerprint (W5): Karp-Rabin polynomial hash over
# the character stream, computed as a sequential fold -- F.aggregate keeps
# it one JVM expression per document (no explode, no shuffle).
# --------------------------------------------------------------------------

_RH_BASE = 31
_RH_MOD = 2_147_483_647  # 2^31 - 1; acc*31 + 127 stays well inside int64


def rolling_hash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    chars = F.filter(F.split(F.col("text"), ""), lambda c: c != F.lit(""))
    rh = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * _RH_BASE + F.ascii(c)) % _RH_MOD,
    )
    return d.select("doc_id", rh.alias("rolling_hash"))


ROLLING_HASH_SQL = f"""
SELECT doc_id,
       list_reduce(
           list_prepend(CAST(0 AS BIGINT),
               list_transform(list_filter(split(text, ''), c -> c <> ''),
                              c -> CAST(ascii(c) AS BIGINT))),
           (acc, c) -> (acc * {_RH_BASE} + c) % {_RH_MOD}
       ) AS rolling_hash
FROM documents
"""


# --------------------------------------------------------------------------
# IVF-style ANN (W5 scale path, the clustering alternative to sign-LSH):
# deterministic training-free centroids (the first _IVF_K vectors), each
# vector assigned to its argmax-dot centroid, then exact top-3 cosine
# search within the query's own cell (nprobe=1). At 100 TB the cell id is
# the partition key and centroids are broadcast.
# --------------------------------------------------------------------------

_IVF_K = 8


def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # qv feeds the centroid table, the assignment cross-join, and the
    # within-cell search; cache the quantized vectors once (see
    # embedding_neardup_cosine on Catalyst's lack of subplan reuse).
    qv = ext._quantized(spark, sf_dir).cache()
    cents = qv.filter(F.col("vec_id") < _IVF_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("cq")
    )
    dots = (
        qv.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "q",
            "cid",
            F.aggregate(
                F.zip_with("q", "cq", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("cdot"),
        )
    )
    wa = Window.partitionBy("vec_id").orderBy(F.col("cdot").desc(), F.col("cid"))
    assigned = (
        dots.withColumn("rn", F.row_number().over(wa))
        .filter(F.col("rn") == 1)
        .select("vec_id", "q", F.col("cid").alias("cell"))
    )
    norms = qv.select(
        "vec_id",
        F.aggregate("q", F.lit(0).cast("long"), lambda acc, x: acc + x * x).alias("n2"),
    )
    a = assigned.filter(F.col("vec_id") < 10).alias("a")
    b = assigned.alias("b")
    pairs = (
        a.join(b, (F.col("a.cell") == F.col("b.cell")) & (F.col("a.vec_id") != F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("query_id"),
            F.col("b.vec_id").alias("neighbor_id"),
            F.aggregate(
                F.zip_with(F.col("a.q"), F.col("b.q"), lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("dot"),
        )
    )
    na = norms.select(F.col("vec_id").alias("query_id"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("vec_id").alias("neighbor_id"), F.col("n2").alias("nb2"))
    scored = (
        pairs.join(F.broadcast(na), "query_id")
        .join(nb, "neighbor_id")
        .withColumn(
            "cosine",
            F.col("dot").cast("double")
            / (F.sqrt(F.col("na2").cast("double")) * F.sqrt(F.col("nb2").cast("double"))),
        )
    )
    wr = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("query_id", "neighbor_id", "cosine", "rnk")
    )


IVF_ANN_SQL = "WITH " + ext._QUANT_ELEMS_SQL + f"""
, cdots AS (
    SELECT v.vec_id, c.vec_id AS cid, CAST(SUM(v.qe * c.qe) AS BIGINT) AS cdot
    FROM elems v JOIN elems c ON c.d = v.d AND c.vec_id < {_IVF_K}
    GROUP BY v.vec_id, c.vec_id
),
assigned AS (
    SELECT vec_id, cid AS cell
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cdot DESC, cid) AS rn
          FROM cdots) z
    WHERE rn = 1
),
pairs AS (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           CAST(SUM(ea.qe * eb.qe) AS BIGINT) AS dot
    FROM assigned a
    JOIN assigned b ON a.cell = b.cell AND b.vec_id <> a.vec_id
    JOIN elems ea ON ea.vec_id = a.vec_id
    JOIN elems eb ON eb.vec_id = b.vec_id AND eb.d = ea.d
    WHERE a.vec_id < 10
    GROUP BY a.vec_id, b.vec_id
),
scored AS (
    SELECT query_id, neighbor_id,
           CAST(dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cosine
    FROM pairs
    JOIN norms na ON na.vec_id = query_id
    JOIN norms nb ON nb.vec_id = neighbor_id
)
SELECT query_id, neighbor_id, cosine, CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM scored) z
WHERE rnk <= 3
"""


# --------------------------------------------------------------------------
# K-means training for the IVF coarse quantizer (W5): two unrolled Lloyd
# iterations, fully declarative -- centroids stay DataFrames (no driver
# collect, no Python loop), every join against them is a broadcast, and the
# element-wise centroid update is a posexplode -> (cluster, dim) partial
# aggregation (map-side combine applies, so the shuffle carries K * dim
# rows per partition regardless of corpus size). Integer-exact cross-engine:
# quantized vectors, integer squared-L2, floor-division centroid updates,
# (distance, cid) lexicographic tie-breaks.
# --------------------------------------------------------------------------

_KMEANS_K = 8


_SEMDEDUP_K = 8
_SEMDEDUP_THR = 0.30


def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup over embeddings: cluster with a
    coarse quantizer (max-dot assignment to the seed centroids, ties to
    the smaller id — IVF's convention), then prune WITHIN each cluster:
    a vector is dropped when a smaller-id cluster-mate sits above the
    cosine threshold. Pairwise work is cluster-bounded, never all-pairs —
    the property that makes semantic dedup feasible at 100 TB (the
    greedy smaller-id-wins rule, rather than chained absorption into
    already-pruned members, is the documented deterministic variant).
    Integer-exact cross-engine: quantized vectors, integer dots, one
    identically-written IEEE division for the cosine."""
    qv = ext._quantized(spark, sf_dir).cache()
    cent = qv.filter(F.col("vec_id") < _SEMDEDUP_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )
    dots = qv.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        F.aggregate(
            F.zip_with("q", "c", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("cdot"),
    )
    assigned = (
        dots.groupBy("vec_id")
        .agg(F.min(F.struct((-F.col("cdot")).alias("nd"), F.col("cid"))).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cell"))
    )
    norms = qv.select(
        "vec_id",
        F.aggregate(
            F.zip_with("q", "q", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("n2"),
    )
    aq = assigned.join(qv, "vec_id")
    a = aq.select(
        F.col("cell"), F.col("vec_id").alias("i"), F.col("q").alias("qi")
    )
    b = aq.select(
        F.col("cell").alias("cell_b"),
        F.col("vec_id").alias("j"),
        F.col("q").alias("qj"),
    )
    pairs = a.join(
        b, (F.col("cell") == F.col("cell_b")) & (F.col("i") < F.col("j"))
    ).select(
        "i",
        "j",
        F.aggregate(
            F.zip_with("qi", "qj", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("dot"),
    )
    ni = norms.select(F.col("vec_id").alias("i"), F.col("n2").alias("ni"))
    nj = norms.select(F.col("vec_id").alias("j"), F.col("n2").alias("nj"))
    pruned = (
        pairs.join(F.broadcast(ni), "i")
        .join(F.broadcast(nj), "j")
        .filter(
            F.col("dot").cast("double")
            / (F.sqrt(F.col("ni").cast("double")) * F.sqrt(F.col("nj").cast("double")))
            >= F.lit(_SEMDEDUP_THR)
        )
        .select(F.col("j").alias("vec_id"))
        .distinct()
        .withColumn("pruned", F.lit(True))
    )
    return (
        assigned.join(pruned, "vec_id", "left_outer")
        .select(
            "vec_id",
            "cell",
            F.coalesce(~F.col("pruned"), F.lit(True)).alias("kept"),
        )
    )


SEMDEDUP_SQL = "WITH " + ext._QUANT_ELEMS_SQL + f"""
, cdots AS (
    SELECT v.vec_id, c.vec_id AS cid, CAST(SUM(v.qe * c.qe) AS BIGINT) AS cdot
    FROM elems v JOIN elems c ON c.d = v.d AND c.vec_id < {_SEMDEDUP_K}
    GROUP BY v.vec_id, c.vec_id
),
assigned AS (
    SELECT vec_id, cid AS cell
    FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
                                       ORDER BY cdot DESC, cid) AS rn
          FROM cdots) z
    WHERE rn = 1
),
pairs AS (
    SELECT a.vec_id AS i, b.vec_id AS j,
           CAST(SUM(ea.qe * eb.qe) AS BIGINT) AS dot
    FROM assigned a
    JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
    JOIN elems ea ON ea.vec_id = a.vec_id
    JOIN elems eb ON eb.vec_id = b.vec_id AND eb.d = ea.d
    GROUP BY 1, 2
),
pruned AS (
    SELECT DISTINCT j AS vec_id
    FROM pairs
    JOIN norms na ON na.vec_id = i
    JOIN norms nb ON nb.vec_id = j
    WHERE CAST(dot AS DOUBLE) /
          (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE)))
          >= {_SEMDEDUP_THR}
)
SELECT a.vec_id, a.cell, (p.vec_id IS NULL) AS kept
FROM assigned a LEFT JOIN pruned p ON p.vec_id = a.vec_id
"""


def kmeans_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    # qv feeds the seed table, both assignment joins, and the update;
    # cache once (Catalyst re-derives repeated subplans otherwise).
    qv = ext._quantized(spark, sf_dir).cache()
    cent0 = qv.filter(F.col("vec_id") < _KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("q").alias("c")
    )

    def assign(cent: DataFrame) -> DataFrame:
        pairs = qv.crossJoin(F.broadcast(cent)).select(
            "vec_id",
            "cid",
            F.aggregate(
                F.zip_with("q", "c", lambda x, y: (x - y) * (x - y)),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("d2"),
        )
        # min(struct) = lexicographic (d2, cid): nearest centroid, ties to
        # the smaller id -- same rule the oracle's ROW_NUMBER applies
        best = pairs.groupBy("vec_id").agg(F.min(F.struct("d2", "cid")).alias("m"))
        return best.select(
            "vec_id", F.col("m.cid").alias("cid"), F.col("m.d2").alias("d2")
        )

    def update(assigned: DataFrame) -> DataFrame:
        elems = assigned.join(qv, "vec_id").select(
            "cid", F.posexplode("q").alias("dim", "val")
        )
        per_dim = (
            elems.groupBy("cid", "dim")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cid",
                "dim",
                F.floor(F.col("s").cast("double") / F.col("n")).cast("long").alias("cv"),
            )
        )
        return per_dim.groupBy("cid").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("dim", "cv"))), lambda x: x["cv"]
            ).alias("c")
        )

    a2 = assign(update(assign(cent0)))
    return a2.select(
        "vec_id", F.col("cid").cast("long").alias("cluster"), F.col("d2").alias("dist2")
    )


KMEANS_SQL = f"""
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
               x -> CAST(FLOOR(CAST(x AS DOUBLE) * 10000.0 + 0.5) AS BIGINT)) AS q
    FROM embeddings
),
c0 AS (SELECT vec_id AS cid, q AS c FROM q WHERE vec_id < {_KMEANS_K}),
p1 AS (
    SELECT q.vec_id, c0.cid,
           CAST(list_sum(list_transform(range(1, len(q.q) + 1),
                i -> (q.q[i] - c0.c[i]) * (q.q[i] - c0.c[i]))) AS BIGINT) AS d2
    FROM q, c0
),
a1 AS (
    SELECT vec_id, cid FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
        FROM p1) z
    WHERE rn = 1
),
e AS (
    SELECT a1.cid, unnest(range(0, len(q.q))) AS dim, unnest(q.q) AS val
    FROM a1 JOIN q USING (vec_id)
),
m AS (
    SELECT cid, dim,
           CAST(FLOOR(CAST(SUM(val) AS DOUBLE) / COUNT(*)) AS BIGINT) AS cv
    FROM e GROUP BY cid, dim
),
c1 AS (SELECT cid, list(cv ORDER BY dim) AS c FROM m GROUP BY cid),
p2 AS (
    SELECT q.vec_id, c1.cid,
           CAST(list_sum(list_transform(range(1, len(q.q) + 1),
                i -> (q.q[i] - c1.c[i]) * (q.q[i] - c1.c[i]))) AS BIGINT) AS d2
    FROM q, c1
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster, d2 AS dist2
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, cid) AS rn
      FROM p2) z
WHERE rn = 1
"""


ENTRIES: dict[str, SuiteEntry] = {
    "semdedup_prune": SuiteEntry(semdedup_prune, SEMDEDUP_SQL, ("W5",)),
    "kmeans_ivf_train": SuiteEntry(kmeans_ivf_train, KMEANS_SQL, ("W5",)),
    "graph_wedge_counts": SuiteEntry(graph_wedge_counts, GRAPH_WEDGES_SQL, ("J1", "A6")),
    "graph_triangle_counts": SuiteEntry(
        graph_triangle_counts, GRAPH_TRIANGLES_SQL, ("J1", "W6")
    ),
    "graph_ktruss": SuiteEntry(
        graph_ktruss, GRAPH_KTRUSS_SQL, ("J1", "W6")
    ),
    "graph_node_similarity": SuiteEntry(
        graph_node_similarity, GRAPH_NODE_SIM_SQL, ("J1", "W6", "W5")
    ),
    "graph_node_similarity_overlap": SuiteEntry(
        graph_node_similarity_overlap, GRAPH_NODE_SIM_OVERLAP_SQL,
        ("J1", "W6", "W5"),
    ),
    "graph_node_similarity_capped": SuiteEntry(
        graph_node_similarity_capped, GRAPH_NODE_SIM_CAPPED_SQL,
        ("J1", "W6", "W5")
    ),
    "graph_clustering_coefficient": SuiteEntry(
        graph_clustering_coefficient, GRAPH_LCC_SQL, ("J1", "W6")
    ),
    "udtf_explode_props": SuiteEntry(udtf_explode_props, UDTF_PROPS_SQL, ("W4", "V8")),
    "udtf_table_arg_topk": SuiteEntry(udtf_table_arg_topk, UDTF_TABLE_ARG_SQL, ("W4", "V8")),
    "rolling_hash_fingerprint": SuiteEntry(rolling_hash_fingerprint, ROLLING_HASH_SQL, ("W5",)),
    "ivf_ann_topk": SuiteEntry(ivf_ann_topk, IVF_ANN_SQL, ("W5",)),
    "grouping_sets_orders": SuiteEntry(grouping_sets_orders, GROUPING_SETS_SQL, ("A6",)),
    "approx_stats_lineitem": SuiteEntry(
        approx_stats_lineitem, APPROX_STATS_SQL, ("A6",)
    ),
    "asof_prev_purchase": SuiteEntry(asof_prev_purchase, ASOF_SQL, ("J7", "W2")),
    "minhash_lsh_candidates": SuiteEntry(minhash_lsh_candidates, MINHASH_LSH_SQL, ("W5", "J7")),
    "text_bpe_token_count": SuiteEntry(text_bpe_token_count, TEXT_BPE_SQL, ("W5", "V8")),
    "embedding_neardup_cosine": SuiteEntry(embedding_neardup_cosine, EMBED_NEARDUP_SQL, ("W5",)),
    "collect_order_lists": SuiteEntry(collect_order_lists, COLLECT_LISTS_SQL, ("A1", "A2", "A5")),
    "presentation_columns": SuiteEntry(
        presentation_columns, PRESENTATION_SQL, ("V3", "V5", "V6", "J6")
    ),
    "stream_tumbling_counts": SuiteEntry(stream_tumbling_counts, STREAM_TUMBLING_SQL, ("W3",)),
    "stream_user_totals": SuiteEntry(stream_user_totals, STREAM_USER_TOTALS_SQL, ("W3", "W4")),
    "stream_session_counts": SuiteEntry(
        stream_session_counts, STREAM_SESSION_SQL, ("W3",)
    ),
    "stream_user_totals_tws": SuiteEntry(
        stream_user_totals_tws, STREAM_USER_TOTALS_SQL, ("W3", "W4")
    ),
    "stream_type_counts_tws": SuiteEntry(
        stream_type_counts_tws, STREAM_TYPE_COUNTS_SQL, ("W3", "W4")
    ),
    "stream_event_log_tws": SuiteEntry(
        stream_event_log_tws, STREAM_USER_TOTALS_SQL, ("W3", "W4")
    ),
    "ivf_partitioned_probe": SuiteEntry(
        ivf_partitioned_probe, IVF_PROBE_SQL, ("W5", "S7")
    ),
    "stream_static_join": SuiteEntry(stream_static_join, STREAM_STATIC_SQL, ("W3", "J1")),
    "stream_stream_join": SuiteEntry(stream_stream_join, STREAM_STREAM_SQL, ("W3", "J1")),
    "vis_html_golden_scan": SuiteEntry(
        vis_html_golden_scan, VIS_HTML_SCAN_SQL, ("S6",)
    ),
    "skew_safe_event_counts": SuiteEntry(skew_safe_event_counts, SKEW_COUNTS_SQL, ("A6",)),
}


# --------------------------------------------------------------------------
# PII redaction (W5): the corpus-scrubbing stage every training pipeline
# runs before release. The synthetic testdata contains no PII, so each doc
# is augmented with deterministic doc_id-derived email/phone/IP strings
# first — the redaction machinery (count + replace, all JVM regex) is what
# the oracle checks, on text where the patterns actually fire.
# --------------------------------------------------------------------------

_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
_PII_IP = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"


def pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"), F.lit(".7"),
    )
    # phone is written as 555-XXXX -> make it match the NNN-NNN-NNNN shape
    aug = F.regexp_replace(aug, F.lit("555-([0-9]{4})"), F.lit("555-123-$1"))
    redacted = F.regexp_replace(aug, F.lit(_PII_EMAIL), F.lit("[EMAIL]"))
    redacted = F.regexp_replace(redacted, F.lit(_PII_PHONE), F.lit("[PHONE]"))
    redacted = F.regexp_replace(redacted, F.lit(_PII_IP), F.lit("[IP]"))
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(_PII_EMAIL)).cast("long").alias("n_email"),
        F.regexp_count(aug, F.lit(_PII_PHONE)).cast("long").alias("n_phone"),
        F.regexp_count(
            F.regexp_replace(
                F.regexp_replace(aug, F.lit(_PII_EMAIL), F.lit("[EMAIL]")),
                F.lit(_PII_PHONE), F.lit("[PHONE]"),
            ),
            F.lit(_PII_IP),
        ).cast("long").alias("n_ip"),
        F.md5(redacted).alias("redacted_md5"),
    )


PII_REDACT_SQL = f"""
WITH aug0 AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com or 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS a
    FROM documents
),
aug AS (
    SELECT doc_id,
           regexp_replace(a, '555-([0-9]{{4}})', '555-123-\\1') AS a
    FROM aug0
),
red AS (
    SELECT doc_id, a,
           regexp_replace(
               regexp_replace(a, '{_PII_EMAIL}', '[EMAIL]', 'g'),
               '{_PII_PHONE}', '[PHONE]', 'g') AS r2
    FROM aug
)
SELECT doc_id,
       CAST(len(regexp_extract_all(a, '{_PII_EMAIL}')) AS BIGINT) AS n_email,
       CAST(len(regexp_extract_all(a, '{_PII_PHONE}')) AS BIGINT) AS n_phone,
       CAST(len(regexp_extract_all(r2, '{_PII_IP}')) AS BIGINT) AS n_ip,
       md5(regexp_replace(r2, '{_PII_IP}', '[IP]', 'g')) AS redacted_md5
FROM red
"""


# --------------------------------------------------------------------------
# Cross-document repeated n-gram spans (W5): the substring-level dedup
# signal (the suffix-array "repeated span" family, approximated with fixed
# 8-token windows + hash counts — same shape Lee et al.'s dedup pipeline
# materializes at scale). A window is "shared" when it appears in >= 2
# distinct docs; per-doc shared-window counts drive span removal decisions.
# --------------------------------------------------------------------------

_SPAN_W = 8


def repeated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    # materialize the token array in its own projection FIRST: referencing
    # the split+filter expression from inside the transform() lambda makes
    # codegen re-tokenize the document once per window (measured 4x slower
    # at sf0.1)
    # the small testdata parquet arrives as ONE input partition: spread the
    # tokenize+window stage across the cluster first (at real scale the
    # source has many splits and this repartition is a cheap no-op guard)
    tk = d.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", h.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    n_wins = F.greatest(F.size(toks) - F.lit(_SPAN_W - 1), F.lit(0))
    idx = F.when(
        F.size(toks) >= _SPAN_W,
        F.sequence(F.lit(1), F.size(toks) - F.lit(_SPAN_W - 1)),
    ).otherwise(F.array().cast("array<int>"))
    # group on the raw window string: a hash would only be an internal
    # grouping key (Spark hashes shuffle keys internally anyway)
    wins = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, _SPAN_W)))
    docs = tk.select(
        "doc_id", n_wins.cast("long").alias("n_windows"), wins.alias("w")
    ).cache()  # consumed twice: the explode AND the final n_windows join
    exploded = docs.select("doc_id", F.explode("w").alias("wh"))
    shared_hashes = (
        exploded.groupBy("wh")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("wh")
    )
    per_doc = (
        exploded.join(shared_hashes, "wh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        docs.select("doc_id", "n_windows")
        .join(per_doc, "doc_id", "left_outer")
        .select(
            "doc_id",
            "n_windows",
            F.coalesce(F.col("n_shared"), F.lit(0)).cast("long").alias("n_shared"),
        )
    )


REPEATED_NGRAM_SQL = f"""
WITH tk AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
    FROM documents
),
wins AS (
    SELECT doc_id,
           unnest(list_transform(
               range(1, CASE WHEN len(toks) >= {_SPAN_W}
                             THEN len(toks) - {_SPAN_W - 2} ELSE 1 END),
               i -> array_to_string(list_slice(toks, i, i + {_SPAN_W - 1}), ' ')
           )) AS wh
    FROM tk
),
shared AS (
    SELECT wh FROM wins GROUP BY wh HAVING COUNT(DISTINCT doc_id) >= 2
),
per_doc AS (
    SELECT w.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM wins w JOIN shared s ON w.wh = s.wh
    GROUP BY w.doc_id
)
SELECT t.doc_id,
       CAST(greatest(len(t.toks) - {_SPAN_W - 1}, 0) AS BIGINT) AS n_windows,
       COALESCE(p.n_shared, 0) AS n_shared
FROM tk t LEFT JOIN per_doc p ON t.doc_id = p.doc_id
"""


ENTRIES.update({
    "pii_redact_stats": SuiteEntry(pii_redact_stats, PII_REDACT_SQL, ("W5", "V8")),
    "repeated_ngram_spans": SuiteEntry(
        repeated_ngram_spans, REPEATED_NGRAM_SQL, ("W5", "A6", "J7")
    ),
})


# --------------------------------------------------------------------------
# Bloom-filter membership (W5 sketch family, alongside Count-Min and KMV):
# the "have we ingested this before?" primitive for incremental corpus
# builds. The filter is EXACTLY verifiable cross-engine: k polynomial
# char-fold hashes (engine-independent integer arithmetic, same family as
# rolling_hash_fingerprint), words OR-aggregated with bit_or, probes check
# all k bits. False positives are part of the deterministic output — the
# oracle reproduces the same filter bit-for-bit, so the same probes
# false-positive in both engines.
# --------------------------------------------------------------------------

_BLOOM_BITS = 65_536  # m = 2^16 bits = 1041 63-bit words (bit 63 avoided: DuckDB raises on signed 1<<63)
_BLOOM_BASES = (31, 37, 41, 43)  # k = 4 hash functions


def _bloom_pos(col, base: int):
    """Polynomial fold of the md5 hex of `col` at the given base, mod m.
    Hashing the fixed-length md5 hex (not the raw text) keeps the fold
    cheap and uniformly mixed."""
    chars = F.split(F.md5(col), "")
    folded = F.aggregate(
        F.slice(chars, 1, 32),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * base + F.ascii(c)) % _RH_MOD,
    )
    return folded % _BLOOM_BITS


def _bloom_pos_sql(expr: str, base: int) -> str:
    return f"""(list_reduce(
        list_prepend(CAST(0 AS BIGINT),
            list_transform(list_slice(split(md5({expr}), ''), 1, 32),
                           c -> CAST(ascii(c) AS BIGINT))),
        (acc, c) -> (acc * {base} + c) % {_RH_MOD}
    ) % {_BLOOM_BITS})"""


def bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    build = d.filter(F.col("source").isin("src0", "src1")).select("text")
    probe = d.filter(~F.col("source").isin("src0", "src1"))

    pos_cols = [_bloom_pos(F.col("text"), b) for b in _BLOOM_BASES]
    bits = build.select(F.explode(F.array(*pos_cols)).alias("p"))
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))")
    words = bits.select(
        (F.col("p") / 63).cast("long").alias("w"), mask.alias("m")
    ).groupBy("w").agg(F.bit_or("m").alias("word"))

    probe_bits = probe.select(
        "doc_id", F.md5("text").alias("h"),
        F.explode(F.array(*pos_cols)).alias("p"),
    ).select(
        "doc_id", "h",
        (F.col("p") / 63).cast("long").alias("w"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 63 AS INT))").alias("m"),
    )
    hits = probe_bits.join(F.broadcast(words), "w", "left_outer").select(
        "doc_id", "h",
        (F.col("word").isNotNull()
         & (F.col("word").bitwiseAND(F.col("m")) != 0)).alias("bit_set"),
    )
    bloom = hits.groupBy("doc_id", "h").agg(F.bool_and("bit_set").alias("bloom_hit"))

    exact = build.select(F.md5("text").alias("h")).distinct().withColumn(
        "exact_hit", F.lit(True)
    )
    return bloom.join(exact, "h", "left_outer").select(
        "doc_id",
        "bloom_hit",
        F.coalesce(F.col("exact_hit"), F.lit(False)).alias("exact_hit"),
    )


_BLOOM_POS_ARRAY = ", ".join(_bloom_pos_sql("text", b) for b in _BLOOM_BASES)

BLOOM_MEMBERSHIP_SQL = f"""
WITH build AS (
    SELECT text FROM documents WHERE source IN ('src0', 'src1')
),
probe AS (
    SELECT doc_id, text FROM documents WHERE source NOT IN ('src0', 'src1')
),
bbits AS (
    SELECT unnest([{_BLOOM_POS_ARRAY}]) AS p FROM build
),
words AS (
    SELECT CAST(p // 63 AS BIGINT) AS w,
           bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS word
    FROM bbits GROUP BY 1
),
pbits AS (
    SELECT doc_id, md5(text) AS h, unnest([{_BLOOM_POS_ARRAY}]) AS p FROM probe
),
hits AS (
    SELECT p.doc_id, p.h,
           (w.word IS NOT NULL AND
            (w.word & (CAST(1 AS BIGINT) << CAST(p.p % 63 AS INTEGER))) <> 0)
           AS bit_set
    FROM pbits p LEFT JOIN words w ON CAST(p.p // 63 AS BIGINT) = w.w
),
bloom AS (
    SELECT doc_id, h, bool_and(bit_set) AS bloom_hit FROM hits GROUP BY 1, 2
),
exact AS (SELECT DISTINCT md5(text) AS h, TRUE AS exact_hit FROM build)
SELECT b.doc_id, b.bloom_hit, COALESCE(e.exact_hit, FALSE) AS exact_hit
FROM bloom b LEFT JOIN exact e ON b.h = e.h
"""


ENTRIES.update({
    "bloom_membership": SuiteEntry(bloom_membership, BLOOM_MEMBERSHIP_SQL, ("W5", "A6")),
})


def stream_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join: matched purchase-click pairs
    plus watermark-gated null rows. A purchase's null row flushes only when
    the stream's watermark proves no click can still match; with a 10-minute
    watermark delay and a 10-minute join interval the cutoff is
    max(click ts) - 20 minutes — reproduced exactly by the oracle (verified
    row-for-row at sf0.001/sf0.01)."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    p = stream.read_events_stream(spark, sf_dir)
    c = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.purchase_click_pairs_left(p, c), output_mode="append"
    )
    return spark.createDataFrame(
        rows, "purchase_id long, click_id long, user_id long"
    )


STREAM_STREAM_LEFT_SQL = """
WITH m AS (SELECT max(ts) AS mx FROM events WHERE event_type = 'click'),
j AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         p.user_id, p.ts AS p_ts
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id
   AND c.ts BETWEEN p.ts - INTERVAL '10 minutes' AND p.ts
)
SELECT purchase_id, click_id, user_id FROM j, m
WHERE click_id IS NOT NULL OR p_ts < mx - INTERVAL '20 minutes'
"""


def stream_stream_full_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream FULL OUTER interval join: matched purchase-click pairs
    plus watermark-gated null rows on both sides. Null emission is gated by
    the GLOBAL watermark (min over both inputs, each max(side ts) - 10 min),
    with the 10-minute join interval on top: cutoff =
    min(max purchase ts, max click ts) - 20 minutes for both sides'
    outer rows — reproduced exactly by the oracle."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    p = stream.read_events_stream(spark, sf_dir)
    c = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.purchase_click_pairs_full(p, c), output_mode="append"
    )
    return spark.createDataFrame(
        rows, "purchase_id long, click_id long, user_id long"
    )


STREAM_STREAM_FULL_SQL = """
WITH wm AS (
  SELECT LEAST(
           (SELECT max(ts) FROM events WHERE event_type = 'purchase'),
           (SELECT max(ts) FROM events WHERE event_type = 'click')
         ) - INTERVAL '20 minutes' AS cut
),
j AS (
  SELECT p.event_id AS purchase_id, c.event_id AS click_id,
         COALESCE(p.user_id, c.user_id) AS user_id, p.ts AS p_ts, c.ts AS c_ts
  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
  FULL JOIN (SELECT * FROM events WHERE event_type = 'click') c
    ON p.user_id = c.user_id
   AND c.ts BETWEEN p.ts - INTERVAL '10 minutes' AND p.ts
)
SELECT purchase_id, click_id, user_id FROM j, wm
WHERE (purchase_id IS NOT NULL AND click_id IS NOT NULL)
   OR (click_id IS NULL AND p_ts < wm.cut)
   OR (purchase_id IS NULL AND c_ts < wm.cut)
"""


ENTRIES.update({
    "stream_stream_left_join": SuiteEntry(
        stream_stream_left_join, STREAM_STREAM_LEFT_SQL, ("W3", "J4")
    ),
})

def stream_stream_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT SEMI interval join: purchases with >=1 preceding
    click, emitted once each — the final set equals the batch semi-join
    (no watermark cutoff in the result, unlike the outer variants)."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    p = stream.read_events_stream(spark, sf_dir)
    c = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.purchase_click_pairs_semi(p, c), output_mode="append"
    )
    return spark.createDataFrame(rows, "purchase_id long, user_id long")


STREAM_STREAM_SEMI_SQL = """
SELECT DISTINCT p.event_id AS purchase_id, p.user_id
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL '10 minutes' AND p.ts
"""


def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark over the event stream: exactly one
    row per event_id survives; projecting the key makes the result
    deterministic (which duplicate's payload survives is arrival-order
    dependent, the key set is not)."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    s = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.stream_dedup_within_watermark(s).select("event_id"),
        output_mode="append",
    )
    return spark.createDataFrame(rows, "event_id long")


STREAM_DEDUP_WW_SQL = "SELECT DISTINCT event_id FROM events"


ENTRIES.update({
    "stream_stream_full_join": SuiteEntry(
        stream_stream_full_join, STREAM_STREAM_FULL_SQL, ("W3", "J7")
    ),
})

def stream_join_then_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED stateful operators in one streaming query (Spark 4,
    SPARK-42376): stream-stream interval join -> tumbling-window count, the
    funnel-rate shape that previously needed two queries and an
    intermediate sink. Append mode emits exactly the windows finalized by
    the terminal watermark — min(max purchase ts, max click ts) - 10 min —
    which the oracle reproduces with a LEAST() cutoff."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    p = stream.read_events_stream(spark, sf_dir)
    c = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.purchase_click_window_counts(p, c), output_mode="append"
    )
    return spark.createDataFrame(
        rows, "window_start timestamp, user_id long, n_pairs long"
    )


STREAM_JOIN_WINDOW_SQL = """
WITH pairs AS (
    SELECT p.user_id, p.ts AS p_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id
     AND c.ts BETWEEN p.ts - INTERVAL '10 minutes' AND p.ts
), wm AS (
    SELECT LEAST(
        (SELECT MAX(ts) FROM events WHERE event_type = 'purchase'),
        (SELECT MAX(ts) FROM events WHERE event_type = 'click')
    ) - INTERVAL '10 minutes' AS w
)
SELECT ws AS window_start, user_id, n_pairs FROM (
    SELECT time_bucket(INTERVAL '10 minutes', p_ts) AS ws, user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs, ANY_VALUE(wm.w) AS ww
    FROM pairs, wm GROUP BY 1, 2
    HAVING ws + INTERVAL '10 minutes' <= ANY_VALUE(wm.w)
) z
"""


def stream_session_flush_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVENT-time timer StatefulProcessor (W3+W4) — the last cell of the
    TWS API matrix (ValueState/ListState/MapState/processing-time timers
    are already in the contract). Per-user totals arm a timer at
    max(event ts) + 5 min; the watermark (delay 0), not the wall clock,
    fires it. With the whole table in one availableNow batch, the
    state-cleanup batch fires exactly the timers the final watermark
    (global max ts) passed — so the flushed set is users whose last event
    precedes the corpus max by >= 5 minutes, with their full totals.
    Boundary pinned by probe: timer == watermark FIRES (<=)."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    rows = _run_tws(spark, sf_dir, stream.session_flush_event_timer_tws)
    return spark.createDataFrame(
        rows, "user_id long, n_events long, sum_value_cents long"
    )


STREAM_SESSION_FLUSH_TWS_SQL = """
WITH u AS (
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_value_cents,
           MAX(ts) AS mx
    FROM events GROUP BY user_id
)
SELECT user_id, n_events, sum_value_cents
FROM u WHERE mx + INTERVAL '5 minutes' <= (SELECT MAX(ts) FROM events)
"""


ENTRIES.update({
    "stream_stream_semi_join": SuiteEntry(
        stream_stream_semi_join, STREAM_STREAM_SEMI_SQL, ("W3", "J7", "P8")
    ),
    "stream_dedup_within_watermark": SuiteEntry(
        stream_dedup_within_watermark, STREAM_DEDUP_WW_SQL, ("W3", "A4")
    ),
    "stream_join_then_window": SuiteEntry(
        stream_join_then_window, STREAM_JOIN_WINDOW_SQL, ("W3", "J1", "A6")
    ),
    "stream_session_flush_tws": SuiteEntry(
        stream_session_flush_tws, STREAM_SESSION_FLUSH_TWS_SQL, ("W3", "W4")
    ),
})


# --------------------------------------------------------------------------
# Histogram quantile sketch (W5/A6): deterministic approximate quantiles.
# t-digest/GK sketches are merge-order-dependent; a fixed 128-bin equi-width
# histogram is the mergeable quantile sketch whose estimate is EXACTLY
# reproducible cross-engine (bin assignment + interpolation are plain IEEE
# arithmetic written identically on both sides). At cluster scale the bin
# counts partial-aggregate map-side like any groupBy count.
# --------------------------------------------------------------------------

_HQ_BINS = 128
_HQ_QS = (0.5, 0.95, 0.99)


def histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (F.col("mx") - F.col("mn")) / F.lit(float(_HQ_BINS))
    binned = (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_type", "mn", "mx", "n",
            F.least(
                F.floor((F.col("value") - F.col("mn")) / w).cast("int"),
                F.lit(_HQ_BINS - 1),
            ).alias("bin"),
        )
        .groupBy("event_type", "mn", "mx", "n", "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cum = binned.withColumn(
        "cum",
        F.sum("cnt").over(
            Window.partitionBy("event_type").orderBy("bin")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    qs = spark.createDataFrame([(q,) for q in _HQ_QS], "q double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cum") >= F.ceil(F.col("q") * F.col("n")))
        .groupBy("event_type", "q", "mn", "mx")
        .agg(F.min("bin").alias("qbin"))
    )
    est = F.col("mn") + (F.col("qbin") + F.lit(1)).cast("double") * (
        (F.col("mx") - F.col("mn")) / F.lit(float(_HQ_BINS))
    )
    return hit.select("event_type", "q", est.alias("est"))


HISTOGRAM_QUANTILES_SQL = f"""
WITH stats AS (
    SELECT event_type, min(value) AS mn, max(value) AS mx,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
),
binned AS (
    SELECT e.event_type, s.mn, s.mx, s.n,
           least(CAST(floor((e.value - s.mn) / ((s.mx - s.mn) / {float(_HQ_BINS)})) AS INTEGER),
                 {_HQ_BINS - 1}) AS bin,
           CAST(count(*) AS BIGINT) AS cnt
    FROM events e JOIN stats s ON e.event_type = s.event_type
    GROUP BY 1, 2, 3, 4, 5
),
cum AS (
    SELECT *, SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS cum
    FROM binned
),
qs AS (SELECT unnest([{", ".join(str(q) for q in _HQ_QS)}]) AS q),
hit AS (
    SELECT event_type, q, mn, mx, min(bin) AS qbin
    FROM cum, qs
    WHERE cum >= ceil(q * n)
    GROUP BY 1, 2, 3, 4
)
SELECT event_type, q,
       mn + CAST(qbin + 1 AS DOUBLE) * ((mx - mn) / {float(_HQ_BINS)}) AS est
FROM hit
"""


ENTRIES.update({
    "histogram_quantiles": SuiteEntry(
        histogram_quantiles, HISTOGRAM_QUANTILES_SQL, ("W5", "A6", "W2")
    ),
})


# --------------------------------------------------------------------------
# Edit-distance near-dup (W5): character-level fuzzy pairs, the third text
# dedup modality next to token-shingle Jaccard and embedding cosine.
# Standard blocked shape: cheap equality block (first 8 chars) prunes the
# candidate space, exact levenshtein (built into both engines) confirms.
# At 100 TB the block key is the shuffle key; block-size skew is the risk
# (AQE skew-join), and a too-weak block trades recall for cost exactly like
# LSH band count does.
# --------------------------------------------------------------------------

_LEV_BLOCK = 8
_LEV_PREFIX = 32
_LEV_MAX = 5


def neardup_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        F.substring("text", 1, _LEV_BLOCK).alias("blk"),
        F.substring("text", 1, _LEV_PREFIX).alias("pfx"),
    )
    a, b = d.alias("a"), d.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.levenshtein(F.col("a.pfx"), F.col("b.pfx")).cast("long").alias("dist"),
        )
        .filter(F.col("dist") <= _LEV_MAX)
    )


NEARDUP_LEV_SQL = f"""
WITH p AS (
    SELECT doc_id, substr(text, 1, {_LEV_BLOCK}) AS blk,
           substr(text, 1, {_LEV_PREFIX}) AS pfx
    FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS dist
FROM p a JOIN p b ON a.blk = b.blk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {_LEV_MAX}
"""


ENTRIES.update({
    "neardup_levenshtein": SuiteEntry(
        neardup_levenshtein, NEARDUP_LEV_SQL, ("W5", "J7")
    ),
})


# --------------------------------------------------------------------------
# Hashed-n-gram importance weights (W5): data-selection scoring in the DSIR
# family (Xie et al. 2023, "Data Selection for Language Models via
# Importance Resampling") — hashed unigram features, target-vs-raw bucket
# ratios, per-doc importance scores for resampling toward a target
# distribution. Deviation for exact cross-engine verification: bucket
# ratios enter linearly (integer-scaled exact division) instead of
# log-ratios — transcendental log differs in final ulps across libms, which
# would make the oracle flaky. Ranking behavior is preserved for the
# dominant single-bucket-ratio ordering; the linear form is documented.
# --------------------------------------------------------------------------

_DSIR_BUCKETS = 4096
_DSIR_SCALE = 1_000_000


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    tk = d.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select(
        "doc_id", "lang", "source", h.tokens(F.col("text")).alias("toks")
    )
    tok = tk.select(
        "doc_id", "lang", "source", F.explode("toks").alias("token")
    )
    bucket = (
        F.aggregate(
            F.filter(F.split(F.col("token"), ""), lambda c: c != F.lit("")),
            F.lit(0).cast("long"),
            lambda acc, c: (acc * _RH_BASE + F.ascii(c)) % _RH_MOD,
        ) % _DSIR_BUCKETS
    ).alias("b")
    tb = tok.select("doc_id", "lang", "source", bucket).cache()

    raw = tb.groupBy("b").agg(F.count(F.lit(1)).alias("cnt_r"))
    tgt = (
        tb.filter((F.col("lang") == "en") & (F.col("source") == "src0"))
        .groupBy("b").agg(F.count(F.lit(1)).alias("cnt_t"))
    )
    ratio = (
        raw.join(tgt, "b", "left_outer")
        .select(
            "b",
            F.floor(
                F.coalesce(F.col("cnt_t"), F.lit(0)) * F.lit(_DSIR_SCALE)
                / F.col("cnt_r")
            ).cast("long").alias("ratio"),
        )
    )
    return (
        tb.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("ratio").alias("score"),
        )
    )


DSIR_SQL = f"""
WITH tok AS (
    SELECT doc_id, lang, source,
           unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              t -> t <> '')) AS token
    FROM documents
),
tb AS (
    SELECT doc_id, lang, source,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                   list_transform(list_filter(split(token, ''), c -> c <> ''),
                                  c -> CAST(ascii(c) AS BIGINT))),
               (acc, c) -> (acc * {_RH_BASE} + c) % {_RH_MOD}
           ) % {_DSIR_BUCKETS} AS b
    FROM tok
),
raw AS (SELECT b, CAST(count(*) AS BIGINT) AS cnt_r FROM tb GROUP BY b),
tgt AS (
    SELECT b, CAST(count(*) AS BIGINT) AS cnt_t FROM tb
    WHERE lang = 'en' AND source = 'src0' GROUP BY b
),
ratio AS (
    SELECT r.b,
           CAST(floor(COALESCE(t.cnt_t, 0) * {_DSIR_SCALE} * 1.0 / r.cnt_r)
                AS BIGINT) AS ratio
    FROM raw r LEFT JOIN tgt t ON r.b = t.b
)
SELECT tb.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(ratio) AS BIGINT) AS score
FROM tb JOIN ratio ON tb.b = ratio.b
GROUP BY tb.doc_id
"""


ENTRIES.update({
    "dsir_importance_weights": SuiteEntry(
        dsir_importance_weights, DSIR_SQL, ("W5", "A6", "J6")
    ),
})


# --------------------------------------------------------------------------
# Corpus profile (W5/A6): the dataset-card primitive — per-column null
# counts, exact distincts, and length ranges in one pass, long-format so
# new columns append rows, not schema changes. At 100 TB: one wide
# aggregation (map-side partials) + a tiny unpivot; exact distincts are the
# cost center — swap in approx_count_distinct/KMV (kmv_distinct_estimate)
# when exactness isn't required.
# --------------------------------------------------------------------------


def corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    cols = ["text", "lang", "source"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.length(c)).cast("long").alias(f"{c}__min_len"),
            F.max(F.length(c)).cast("long").alias(f"{c}__max_len"),
        ]
    wide = d.agg(*aggs)
    parts = []
    for c in cols:
        parts.append(wide.select(
            F.lit(c).alias("column"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col(f"{c}__nulls").alias("n_nulls"),
            F.col(f"{c}__distinct").alias("n_distinct"),
            F.col(f"{c}__min_len").alias("min_len"),
            F.col(f"{c}__max_len").alias("max_len"),
        ))
    out = parts[0]
    for pdf in parts[1:]:
        out = out.unionByName(pdf)
    return out


CORPUS_PROFILE_SQL = """
WITH w AS (
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS text__nulls,
           CAST(count(DISTINCT text) AS BIGINT) AS text__distinct,
           CAST(min(length(text)) AS BIGINT) AS text__min_len,
           CAST(max(length(text)) AS BIGINT) AS text__max_len,
           CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS lang__nulls,
           CAST(count(DISTINCT lang) AS BIGINT) AS lang__distinct,
           CAST(min(length(lang)) AS BIGINT) AS lang__min_len,
           CAST(max(length(lang)) AS BIGINT) AS lang__max_len,
           CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS source__nulls,
           CAST(count(DISTINCT source) AS BIGINT) AS source__distinct,
           CAST(min(length(source)) AS BIGINT) AS source__min_len,
           CAST(max(length(source)) AS BIGINT) AS source__max_len
    FROM documents
)
SELECT 'text' AS "column", n_rows, text__nulls AS n_nulls,
       text__distinct AS n_distinct, text__min_len AS min_len,
       text__max_len AS max_len FROM w
UNION ALL
SELECT 'lang', n_rows, lang__nulls, lang__distinct, lang__min_len,
       lang__max_len FROM w
UNION ALL
SELECT 'source', n_rows, source__nulls, source__distinct, source__min_len,
       source__max_len FROM w
"""


ENTRIES.update({
    "corpus_profile": SuiteEntry(corpus_profile, CORPUS_PROFILE_SQL, ("W5", "A6")),
})


def events_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 lag/lead: per-user inter-event gap in seconds (lag) and the next
    event's type (lead) — the sessionization precursor (gap > threshold =>
    session boundary). Deterministic ordering: (ts, event_id) is unique."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w)
    return e.select(
        "event_id",
        "user_id",
        # microsecond-exact: unix_timestamp truncates sub-second parts and
        # DuckDB's epoch() returns a fractional double -- off-by-one seconds.
        # epoch_us is session-timezone-independent (the driver's session tz
        # is not ours; a cast-shift would even break across DST boundaries)
        (epoch_us(F.col("ts")) - epoch_us(prev_ts))
        .cast("long")
        .alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


EVENTS_LAG_LEAD_SQL = """
SELECT event_id, user_id,
       CAST(epoch_us(ts) - epoch_us(lag(ts) OVER w) AS BIGINT) AS gap_us,
       lead(event_type) OVER w AS next_type
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


ENTRIES.update({
    "events_lag_lead_delta": SuiteEntry(
        events_lag_lead_delta, EVENTS_LAG_LEAD_SQL, ("W2", "V8")
    ),
})


def stream_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming VARIANT decode (round 3): parse_json + typed variant_get
    inside a watermarked windowed aggregation under real Structured
    Streaming (Trigger.AvailableNow, complete mode). Oracle = the same
    window math in SQL over the batch table with JSON path extraction."""
    from phageclouds_graphdatabase_spark.streaming import events as stream

    s = stream.read_events_stream(spark, sf_dir)
    rows = stream.run_available_now(
        stream.variant_type_stats(s), output_mode="complete"
    )
    return spark.createDataFrame(
        rows,
        "window_start timestamp, event_type string, n long, sum_k long, max_k long",
    )


STREAM_VARIANT_SQL = """
SELECT time_bucket(INTERVAL '30 minutes', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k
FROM events GROUP BY 1, 2
"""


ENTRIES.update({
    "stream_variant_stats": SuiteEntry(
        stream_variant_stats, STREAM_VARIANT_SQL, ("W3", "W4")
    ),
})
