"""Third wave of LLM-training-data-pipeline operators (SURVEY.md §2 W5
north-star row): the dataset-construction steps that sit between a cleaned
corpus and a training run -- deterministic split, sequence packing, global
shuffle order, stratified sampling, source-mixture budgeting, and benchmark
contamination -- each with a DuckDB oracle twin.

Cross-engine determinism leans on one primitive: ``md5(CAST(doc_id AS
string))`` produces identical lowercase hex in Spark and DuckDB
(plans/_suite_helpers.py module docstring), so hash-ordered ranks, hash
thresholds, and hash buckets agree bit-for-bit. No RNG anywhere: every
"random" choice is a pure function of the row key, which is also what a
100 TB pipeline wants (re-runs and backfills land identically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from phageclouds_graphdatabase_spark.plans import suite_extensions as ext
from phageclouds_graphdatabase_spark.plans._suite_helpers import SuiteEntry, t, tokens

_TOKENS_SQL = (
    r"CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'), "
    r"x -> x <> '')) AS BIGINT)"
)


def _doc_hash() -> F.Column:
    """The shared determinism primitive: md5 of the decimal doc_id."""
    return F.md5(F.col("doc_id").cast("string"))


# --------------------------------------------------------------------------
# Deterministic train/val/test split: the first hex nibble of md5(doc_id)
# partitions U(0,1) into 16 equal slices -> 12/2/2 = 75% / 12.5% / 12.5%.
# Pure per-row map: no shuffle, no state, survives any re-partitioning, and
# a re-run (or a late-arriving shard) lands every doc in the same split --
# the property that matters when the corpus is 100 TB and splits must be
# stable across incremental rebuilds.
# --------------------------------------------------------------------------

def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    h = F.substring(_doc_hash(), 1, 1)
    split = (
        F.when(h < "c", F.lit("train"))
        .when(h < "e", F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return d.select("doc_id", "lang", h.alias("bucket_hex"), split.alias("split"))


SPLIT_SQL = """
SELECT doc_id, lang,
       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket_hex,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c' THEN 'train'
            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


# --------------------------------------------------------------------------
# Sequence packing (concat-then-chunk): documents are concatenated in
# doc_id order and cut into fixed-capacity context windows; each doc gets
# (chunk_id, chunk_offset) = divmod(exclusive-prefix-token-sum, capacity).
#
# Scale design: a single global window would funnel 100 TB through ONE
# task, so the prefix sum is two-phase -- a per-bucket window (doc_id range
# buckets, embarrassingly parallel) plus a bucket-offset table that is one
# row per bucket (tiny, broadcast). The oracle computes the same numbers
# with the naive global window; results are identical by associativity of
# integer addition.
# --------------------------------------------------------------------------

_PACK_CAPACITY = 512
_PACK_BUCKET = 100  # doc_ids per prefix-sum bucket


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .withColumn("bucket", F.floor(F.col("doc_id") / _PACK_BUCKET))
    )
    wloc = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = d.withColumn("local_cum", F.sum("n_tokens").over(wloc))
    totals = d.groupBy("bucket").agg(F.sum("n_tokens").alias("btot"))
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "boff", F.coalesce(F.sum("btot").over(woff), F.lit(0))
    ).select("bucket", "boff")
    start = F.col("local_cum") + F.col("boff") - F.col("n_tokens")
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(start / _PACK_CAPACITY).cast("long").alias("chunk_id"),
            (start % _PACK_CAPACITY).cast("long").alias("chunk_offset"),
        )
    )


PACK_SQL = f"""
WITH tok AS (
    SELECT doc_id, {_TOKENS_SQL} AS n_tokens FROM documents
), c AS (
    SELECT doc_id, n_tokens,
           CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             - n_tokens AS start
    FROM tok
)
SELECT doc_id, n_tokens,
       CAST(FLOOR(start / {_PACK_CAPACITY}) AS BIGINT) AS chunk_id,
       CAST(start % {_PACK_CAPACITY} AS BIGINT) AS chunk_offset
FROM c
"""


# --------------------------------------------------------------------------
# Deterministic global shuffle order (training-epoch ordering): position =
# rank of (md5(doc_id), doc_id). Same two-phase shape as packing, keyed by
# the hash's first nibble (16 buckets whose lexicographic order IS the
# global hash order, because the nibble is a prefix of the sort key) --
# per-bucket ranks run in parallel, bucket offsets are a 16-row table.
# --------------------------------------------------------------------------

def shuffle_order_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", _doc_hash().alias("h"))
    d = d.withColumn("bucket", F.substring("h", 1, 1))
    wloc = Window.partitionBy("bucket").orderBy("h", "doc_id")
    local = d.withColumn("local_rn", F.row_number().over(wloc).cast("long"))
    counts = d.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    woff = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.withColumn(
        "boff", F.coalesce(F.sum("n").over(woff), F.lit(0))
    ).select("bucket", "boff")
    return (
        local.join(F.broadcast(offsets), "bucket")
        .select("doc_id", (F.col("boff") + F.col("local_rn")).cast("long").alias("position"))
    )


SHUFFLE_ORDER_SQL = """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
            AS BIGINT) AS position
FROM documents
"""


# --------------------------------------------------------------------------
# Stratified sample: k docs per language, chosen by hash rank (uniform
# within stratum, deterministic across runs). The window partitions by the
# stratum key, so work distributes across executors by language; no stratum
# ever funnels through a single global sort.
# --------------------------------------------------------------------------

_STRAT_K = 20


def stratified_sample_bylang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "lang", _doc_hash().alias("h"))
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        d.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= _STRAT_K)
        .select("doc_id", "lang", F.col("rn").alias("sample_rank"))
    )


STRATIFIED_SQL = f"""
SELECT doc_id, lang, CAST(rn AS BIGINT) AS sample_rank
FROM (
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
    FROM documents
)
WHERE rn <= {_STRAT_K}
"""


# --------------------------------------------------------------------------
# Source-mixture budgeting: each source contributes documents, in hash
# order, until its token budget is exhausted (the "data mixture" step that
# turns per-domain weights into a concrete doc selection). Running sum per
# source -> keep while cum <= budget. Partitioned window = parallel across
# sources; at 100 TB the budget comparison happens map-side after one
# shuffle on the source key.
# --------------------------------------------------------------------------

_MIX_BUDGET = 400  # tokens per source


def source_mixture_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        _doc_hash().alias("h"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .filter(F.col("cum_tokens") <= _MIX_BUDGET)
        .select("doc_id", "source", "n_tokens", "cum_tokens")
    )


MIXTURE_SQL = f"""
WITH tok AS (
    SELECT doc_id, source, {_TOKENS_SQL} AS n_tokens,
           md5(CAST(doc_id AS VARCHAR)) AS h
    FROM documents
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM (
    SELECT doc_id, source, n_tokens,
           SUM(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
    FROM tok
)
WHERE cum_tokens <= {_MIX_BUDGET}
"""


# --------------------------------------------------------------------------
# Benchmark contamination: fraction of each corpus document's distinct word
# 3-grams that appear in a "benchmark" set (here: doc_id < 25 stands in for
# the eval suite). The benchmark shingle set is small by construction, so
# it broadcasts -- the corpus side never shuffles; a left join keeps
# zero-overlap docs. Reuses the shared shingle pipeline
# (plans/suite_extensions.py _shingled).
# --------------------------------------------------------------------------

_BENCH_MAX_DOC = 25


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    sh = ext._shingled(spark, sf_dir).distinct()
    bench = (
        sh.filter(F.col("doc_id") < _BENCH_MAX_DOC)
        .select("shingle")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    corpus = sh.filter(F.col("doc_id") >= _BENCH_MAX_DOC)
    return (
        corpus.join(F.broadcast(bench), "shingle", "left_outer")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("long").alias("n_contaminated"),
        )
        .withColumn(
            "contamination",
            F.col("n_contaminated").cast("double") / F.col("n_shingles").cast("double"),
        )
    )


CONTAMINATION_SQL = (
    "WITH "
    + ext._SHINGLE_CTE
    + f""",
dsh AS (SELECT DISTINCT doc_id, shingle FROM shingles),
bench AS (SELECT DISTINCT shingle FROM dsh WHERE doc_id < {_BENCH_MAX_DOC})
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated,
       CAST(SUM(CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS contamination
FROM dsh d LEFT JOIN bench b ON d.shingle = b.shingle
WHERE d.doc_id >= {_BENCH_MAX_DOC}
GROUP BY d.doc_id
"""
)


# --------------------------------------------------------------------------
# Exact cross-engine Pearson correlation (corpus QA: do the cheap byte
# counts track real token counts per language?). Built-in corr() sums
# doubles in partition order -- not reproducible across engines or even
# across runs -- so this computes the five integer sufficient statistics
# exactly (n_chars and n_tokens are both integers) and applies one IEEE
# double formula written identically on both sides. The integer sums hold
# to ~1e9 rows/group at these magnitudes; past that, scale the inputs down
# (same trick as cents()) before summing.
# --------------------------------------------------------------------------

def corr_chars_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "lang",
        F.col("n_chars").alias("x"),
        F.size(tokens(F.col("text"))).cast("long").alias("y"),
    )
    s = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return s.select(
        "lang",
        F.col("n").cast("long").alias("n_docs"),
        (num / (F.sqrt(dx) * F.sqrt(dy))).alias("corr_chars_tokens"),
    )


CORR_SQL = f"""
WITH d AS (
    SELECT lang, n_chars AS x, {_TOKENS_SQL} AS y FROM documents
), s AS (
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
           CAST(SUM(x * y) AS BIGINT) AS sxy,
           CAST(SUM(x * x) AS BIGINT) AS sxx,
           CAST(SUM(y * y) AS BIGINT) AS syy
    FROM d GROUP BY lang
)
SELECT lang, n AS n_docs,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
            * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_chars_tokens
FROM s
"""


# --------------------------------------------------------------------------
# Time-range rolling aggregate (W2 RANGE frame): per-user spend over the
# trailing 10 minutes at every event. Spark's rangeBetween needs a numeric
# order key, so the frame runs over epoch seconds -- which also makes the
# frame arithmetic engine-agnostic (no interval-type semantics to align).
# Integer cents keep the sums exact. Partitioned by user -> parallel.
# --------------------------------------------------------------------------

def events_rolling_10min(spark: SparkSession, sf_dir: str) -> DataFrame:
    from phageclouds_graphdatabase_spark.plans._suite_helpers import cents

    e = t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("epoch"),
        cents(F.col("value")).alias("v_cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch")
        .rangeBetween(-600, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum("v_cents").over(w).alias("spend_10min_cents"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_events_10min"),
    )


ROLLING_10MIN_SQL = """
WITH e AS (
    SELECT event_id, user_id, epoch(ts)::BIGINT AS ep,
           CAST(FLOOR(value * 100.0 + 0.5) AS BIGINT) AS v_cents
    FROM events
)
SELECT event_id, user_id,
       CAST(SUM(v_cents) OVER (PARTITION BY user_id ORDER BY ep
            RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS spend_10min_cents,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ep
            RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_events_10min
FROM e
"""


# --------------------------------------------------------------------------
# Exact grouped median (A6): engines disagree on percentile interpolation
# modes, so the median is computed from ranks -- the mean of the middle one
# (odd n) or two (even n) order-statistics, in integer cents with one final
# IEEE division by 2. Deterministic in both engines by construction.
# --------------------------------------------------------------------------

def median_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from phageclouds_graphdatabase_spark.plans._suite_helpers import cents

    o = t(spark, sf_dir, "orders").select(
        "o_orderpriority", cents(F.col("o_totalprice")).alias("p_cents")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("p_cents", F.lit(1))
    ranked = o.select(
        "o_orderpriority",
        "p_cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("o_orderpriority")).alias("n"),
    )
    mid = ranked.filter(
        (F.col("rn") == F.floor((F.col("n") + 1) / 2))
        | (F.col("rn") == F.floor(F.col("n") / 2) + 1)
    )
    return mid.groupBy("o_orderpriority").agg(
        (F.sum("p_cents") / F.count(F.lit(1))).alias("median_cents"),
        F.max("n").cast("long").alias("n_orders"),
    )


MEDIAN_SQL = """
WITH c AS (
    SELECT o_orderpriority,
           CAST(FLOOR(o_totalprice * 100.0 + 0.5) AS BIGINT) AS p_cents
    FROM orders
), ranked AS (
    SELECT o_orderpriority, p_cents,
           row_number() OVER (PARTITION BY o_orderpriority ORDER BY p_cents) AS rn,
           COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
    FROM c
)
SELECT o_orderpriority,
       CAST(SUM(p_cents) AS DOUBLE) / COUNT(*) AS median_cents,
       CAST(MAX(n) AS BIGINT) AS n_orders
FROM ranked
WHERE rn = CAST(FLOOR((n + 1) / 2.0) AS BIGINT)
   OR rn = CAST(FLOOR(n / 2.0) AS BIGINT) + 1
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# Real-codec proof through the driver contract (W4): each document's first
# 48 bytes render into a 4x4 RGB PPM payload (Arrow-batched), the REAL
# pure-numpy decoder (operators/multimodal.py) decodes it back, and the
# oracle -- which never sees an image -- computes the expected channel
# means directly from the text's character codes. A value match proves the
# decode + stats path bit-for-bit, not just its schema. (Corpus is ASCII,
# so character positions == byte positions in both engines.)
# --------------------------------------------------------------------------

def image_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:48].ljust(48, b" ")
                payloads.append(
                    mm.encode_ppm(np.frombuffer(raw, np.uint8).reshape(4, 4, 3))
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.image_stats(media)


def png_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract proof as ``image_stats_real`` but through the REAL PNG
    codec: each document's first 48 bytes become a 4x4 RGB PNG (stdlib zlib
    deflate, per-row scanline filter cycling 0-4 by doc_id so every
    unfilter path runs), then the pure-numpy PNG decoder recovers the
    pixels and computes channel means. The oracle never sees an image --
    a value match proves compress -> filter -> unfilter -> decode exactly."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")[:48].ljust(48, b" ")
                arr = np.frombuffer(raw, np.uint8).reshape(4, 4, 3)
                payloads.append(mm.encode_png(arr, filter_type=int(doc_id) % 5))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.image_stats(media)


def wav_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec through the driver contract: each document's first
    64 bytes become 32 mono int16 PCM samples in a RIFF/WAVE payload, the
    pure-numpy WAV decoder recovers them, and ``audio_stats`` emits exact
    integer statistics. The oracle derives the same sum-of-squares and peak
    straight from character codes (ASCII corpus: sample i =
    code[2i] + 256*code[2i+1], always positive since codes < 128)."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:64].ljust(64, b" ")
                samples = np.frombuffer(raw, "<i2")
                payloads.append(mm.encode_wav(samples, rate=8000))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["audio"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.audio_stats(media)


WAV_STATS_SQL = """
WITH ch AS (
    SELECT doc_id,
           list_transform(
               list_filter(split(substr(text || repeat(' ', 64), 1, 64), ''),
                           c -> c <> ''),
               c -> CAST(ascii(c) AS BIGINT)) AS codes
    FROM documents
), s AS (
    SELECT doc_id,
           list_transform(range(0, 32),
                          i -> codes[2*i + 1] + 256 * codes[2*i + 2]) AS v
    FROM ch
)
SELECT doc_id AS media_id,
       8000 AS sample_rate,
       CAST(32 AS BIGINT) AS n_frames,
       1 AS n_channels,
       CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS sum_sq,
       CAST(list_max(v) AS INTEGER) AS peak
FROM s
"""


def avi_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container through the driver contract: each document's
    first 96 bytes become a 2-frame 4x4 RGB uncompressed AVI, the RIFF
    parser + DIB frame decoder sample both frames, and
    ``video_frame_stats`` emits exact integer channel sums. The oracle
    derives the same sums straight from character codes -- a value match
    proves container parse -> frame decode -> sampling bit-for-bit."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:96].ljust(96, b" ")
                frames = [
                    np.frombuffer(raw[48 * f : 48 * (f + 1)], np.uint8).reshape(4, 4, 3)
                    for f in range(2)
                ]
                payloads.append(mm.encode_avi(frames))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["video"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.video_frame_stats(media, n_frames=2)


AVI_FRAMES_SQL = """
WITH ch AS (
    SELECT doc_id,
           list_transform(
               list_filter(split(substr(text || repeat(' ', 96), 1, 96), ''),
                           c -> c <> ''),
               c -> CAST(ascii(c) AS BIGINT)) AS codes
    FROM documents
)
SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
       4 AS width, 4 AS height,
       CAST(list_sum(list_transform(range(0, 16), i -> codes[48*f + 3*i + 1]))
            AS BIGINT) AS sum_r,
       CAST(list_sum(list_transform(range(0, 16), i -> codes[48*f + 3*i + 2]))
            AS BIGINT) AS sum_g,
       CAST(list_sum(list_transform(range(0, 16), i -> codes[48*f + 3*i + 3]))
            AS BIGINT) AS sum_b
FROM ch, (SELECT unnest(range(0, 2)) AS f)
"""


def tiff_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract proof through the REAL TIFF codec (baseline 6.0,
    PackBits RLE): each document's first 48 bytes become a 4x4 RGB image,
    PackBits-encoded into a little-endian TIFF, decoded back via the
    pure-numpy strip reader. A value match proves IFD build -> PackBits
    encode -> strip decode bit-for-bit against an oracle that never sees
    an image."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:48].ljust(48, b" ")
                arr = np.frombuffer(raw, np.uint8).reshape(4, 4, 3)
                payloads.append(mm.encode_tiff(arr, "packbits"))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.image_stats(media)


def gif_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same contract proof as ``png_stats_real`` but through the REAL GIF
    codec: each document's first 48 bytes become a 4x4 RGB image (at most
    16 distinct colors, always palette-encodable), LZW-compressed into a
    GIF89a payload, then decoded back via the pure-Python LZW decoder.
    A value match proves palette build -> LZW encode -> decode -> palette
    lookup bit-for-bit against an oracle that never sees an image."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:48].ljust(48, b" ")
                arr = np.frombuffer(raw, np.uint8).reshape(4, 4, 3)
                payloads.append(mm.encode_gif(arr))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.image_stats(media)


IMAGE_STATS_SQL = """
WITH ch AS (
    SELECT doc_id,
           list_transform(
               list_filter(split(substr(text || repeat(' ', 48), 1, 48), ''),
                           c -> c <> ''),
               c -> CAST(ascii(c) AS BIGINT)) AS codes
    FROM documents
)
SELECT doc_id AS media_id, 4 AS width, 4 AS height,
       CAST(list_sum(list_transform(range(0, 16), i -> codes[i*3 + 1])) AS DOUBLE)
         / 16 AS mean_r,
       CAST(list_sum(list_transform(range(0, 16), i -> codes[i*3 + 2])) AS DOUBLE)
         / 16 AS mean_g,
       CAST(list_sum(list_transform(range(0, 16), i -> codes[i*3 + 3])) AS DOUBLE)
         / 16 AS mean_b
FROM ch
"""


# DuckDB-side hex parse (no native hex->int cast in 1.0): fold the first 8
# md5 nibbles into a BIGINT, matching Spark's conv(substr(h,1,8),16,10).
_HEX8_SQL = (
    "list_reduce(list_transform("
    "list_filter(split(substr({h}, 1, 8), ''), c -> c <> ''), "
    "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b)"
)

_KMV_K = 64


def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) distinct-count sketch with a DETERMINISTIC
    exact oracle: hash each value with md5, keep the k smallest distinct
    hashes per group, estimate |D| as (k-1)/u_k where u_k is the k-th
    minimum normalized to (0,1]. Unlike approx_count_distinct (HLL, engine-
    internal and unverifiable), every step here is a pure function of the
    data, so DuckDB reproduces the estimate bit-for-bit -- the sketch
    contract a 100 TB pipeline can regression-test. Groups smaller than k
    fall back to the exact count (the sketch is exact below k). The top-k
    per group is a window over distinct hashes; the heavy reduction
    (distinct) partial-aggregates map-side."""
    li = (
        t(spark, sf_dir, "lineitem")
        .select(F.col("l_returnflag").alias("grp"), F.col("l_partkey").alias("v"))
        .distinct()
        .cache()  # feeds both the sketch and the exact-count comparison
    )
    h = li.select("grp", F.md5(F.col("v").cast("string")).alias("h"))
    w = Window.partitionBy("grp").orderBy("h")
    topk = h.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _KMV_K)
    kth = topk.groupBy("grp").agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("k_eff")
    )
    u = F.conv(F.substring(F.col("hk"), 1, 8), 16, 10).cast("double") / F.lit(
        4294967296.0
    )
    exact = li.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    est = F.when(
        F.col("k_eff") < _KMV_K, F.col("k_eff").cast("double")
    ).otherwise(F.lit(float(_KMV_K - 1)) / u)
    return (
        kth.join(exact, "grp")
        .select(
            "grp",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("k_eff").cast("long").alias("k_eff"),
            est.alias("kmv_estimate"),
        )
    )


KMV_SQL = f"""
WITH dv AS (
    SELECT DISTINCT l_returnflag AS grp, l_partkey AS v FROM lineitem
),
h AS (SELECT grp, md5(CAST(v AS VARCHAR)) AS h FROM dv),
topk AS (
    SELECT grp, h FROM (
        SELECT grp, h, ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
        FROM h) z
    WHERE rn <= {_KMV_K}
),
kth AS (SELECT grp, MAX(h) AS hk, COUNT(*) AS k_eff FROM topk GROUP BY grp),
exact AS (SELECT grp, COUNT(*) AS n_exact FROM dv GROUP BY grp)
SELECT grp,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(k_eff AS BIGINT) AS k_eff,
       CASE WHEN k_eff < {_KMV_K} THEN CAST(k_eff AS DOUBLE)
            ELSE CAST({_KMV_K - 1} AS DOUBLE)
                 / (CAST({_HEX8_SQL.format(h='hk')} AS DOUBLE) / 4294967296.0)
       END AS kmv_estimate
FROM kth JOIN exact USING (grp)
"""


_CM_ROWS = 4
_CM_WIDTH = 64
_CM_TOPK = 10


def heavy_hitters_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters with a DETERMINISTIC exact oracle: a
    4 x 64 sketch over the corpus token stream (row r buckets a token by
    nibbles of md5('r|' || token)), estimate = min over rows, report the
    top-10 tokens by estimated count alongside the exact count. The
    sketch build is two narrow aggregations (token counts partial-combine
    map-side; cell sums are at most rows x width = 256 values regardless
    of corpus size); like the KMV sketch, every step is a pure function
    of the data, so the one-sided Count-Min error (estimate >= exact) is
    itself regression-testable cross-engine."""
    d = t(spark, sf_dir, "documents").withColumn("w", tokens(F.col("text")))
    tok = d.select(F.explode("w").alias("tok"))
    counts = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).cache()

    # bucket of token in row r: first 8 md5 nibbles of 'r|tok' mod width
    def bucket(r: int) -> F.Column:
        return (
            F.conv(F.substring(F.md5(F.concat(F.lit(f"{r}|"), F.col("tok"))), 1, 8), 16, 10)
            .cast("long")
            % _CM_WIDTH
        )

    est = counts.select(
        "tok", "n", *[bucket(i).alias(f"b{i}") for i in range(_CM_ROWS)]
    )
    for r in range(_CM_ROWS):
        cr = (
            counts.groupBy(bucket(r).alias(f"b{r}"))
            .agg(F.sum("n").alias(f"c{r}"))
        )
        est = est.join(F.broadcast(cr), f"b{r}")
    estimate = F.least(*[F.col(f"c{r}") for r in range(_CM_ROWS)])
    # two-phase top-k: orderBy+limit is a distributed TakeOrdered (per-
    # partition heads merged on the driver), so the global row_number
    # window only ever ranks the k survivors
    top = (
        est.select("tok", F.col("n").alias("n_exact"), estimate.alias("cm_estimate"))
        .orderBy(F.col("cm_estimate").desc(), F.col("tok"))
        .limit(_CM_TOPK)
    )
    w = Window.orderBy(F.col("cm_estimate").desc(), F.col("tok"))
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        "tok", "n_exact", "cm_estimate", "rnk"
    )


_CM_BUCKET_SQL = (
    "({h} % " + str(_CM_WIDTH) + ")"
).format(
    h=_HEX8_SQL.format(h="md5('{r}|' || tok)")
)

HEAVY_HITTERS_SQL = (
    r"""
WITH w AS (
    SELECT unnest(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS tok
    FROM documents
),
counts AS (SELECT tok, COUNT(*) AS n FROM w GROUP BY tok),
"""
    + ",\n".join(
        f"cells{r} AS (SELECT {_CM_BUCKET_SQL.format(r=r)} AS bucket, SUM(n) AS cell"
        f" FROM counts GROUP BY 1)"
        for r in range(_CM_ROWS)
    )
    + """,
est AS (
    SELECT counts.tok, counts.n,
           LEAST("""
    + ", ".join(f"cells{r}.cell" for r in range(_CM_ROWS))
    + """) AS cm_estimate
    FROM counts
"""
    + "\n".join(
        f"    JOIN cells{r} ON cells{r}.bucket = {_CM_BUCKET_SQL.format(r=r)}"
        for r in range(_CM_ROWS)
    )
    + """
)
SELECT tok, CAST(n AS BIGINT) AS n_exact, CAST(cm_estimate AS BIGINT) AS cm_estimate,
       CAST(rnk AS BIGINT) AS rnk
FROM (SELECT *, ROW_NUMBER() OVER (ORDER BY cm_estimate DESC, tok) AS rnk FROM est) z
WHERE rnk <= """
    + str(_CM_TOPK)
)


_WS_K = 5


def weighted_sample_bylang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (top-k by hash/weight priority):
    per language, the k=5 documents with the smallest
    md5(doc_id)/n_chars key -- longer documents get proportionally smaller
    keys, i.e. higher selection odds, the A-ES reservoir idea. The priority
    deliberately avoids ln/pow (libm transcendentals differ across engines
    by ulps); hash-to-uint and one IEEE division are exactly rounded
    everywhere, so the oracle matches bit-for-bit. Pure per-row key + one
    per-group top-k window; re-runs and backfills select identical rows."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.col("n_chars").cast("long").alias("wt")
    )
    key = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        / F.col("wt").cast("double")
    )
    keyed = d.select("doc_id", "lang", key.alias("priority"))
    w = Window.partitionBy("lang").orderBy(F.col("priority").asc(), F.col("doc_id"))
    return (
        keyed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _WS_K)
        .select("lang", "doc_id", F.col("rn").cast("long").alias("samp_rank"))
    )


WEIGHTED_SAMPLE_SQL = f"""
WITH keyed AS (
    SELECT doc_id, lang,
           CAST({_HEX8_SQL.format(h="md5(CAST(doc_id AS VARCHAR))")} AS DOUBLE)
             / CAST(n_chars AS DOUBLE) AS priority
    FROM documents
)
SELECT lang, doc_id, CAST(rn AS BIGINT) AS samp_rank
FROM (SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY priority, doc_id) AS rn
      FROM keyed) z
WHERE rn <= {_WS_K}
"""


def merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warehouse MERGE INTO semantics, declaratively: a current table
    (orders with o_orderkey % 3 != 0 standing in for yesterday's state)
    merged with an updates batch (o_orderkey % 2 == 0, repriced +1 and
    restatused 'U') -- matched rows take the update, unmatched updates
    insert, untouched rows keep. One full-outer join on the merge key is
    the whole plan; at scale the key is also the natural bucketing column,
    making the join exchange-free against a bucketed current table
    (sources/readers.py write_graph_bucketed shows the layout)."""
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice", "o_orderstatus")
    cur = o.filter(F.col("o_orderkey") % 3 != 0).alias("c")
    upd = (
        o.filter(F.col("o_orderkey") % 2 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") + F.lit(1.0)).alias("u_price"),
            F.lit("U").alias("u_status"),
        )
        .alias("u")
    )
    m = cur.join(upd, "o_orderkey", "full_outer")
    action = (
        F.when(F.col("u.u_price").isNotNull() & F.col("c.o_totalprice").isNotNull(), "update")
        .when(F.col("u.u_price").isNotNull(), "insert")
        .otherwise("keep")
    )
    return m.select(
        "o_orderkey",
        F.coalesce(F.col("u.u_price"), F.col("c.o_totalprice")).alias("final_price"),
        F.coalesce(F.col("u.u_status"), F.col("c.o_orderstatus")).alias("final_status"),
        action.alias("action"),
    )


MERGE_UPSERT_SQL = """
WITH cur AS (
    SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0
),
upd AS (
    SELECT o_orderkey, o_totalprice + 1.0 AS u_price, 'U' AS u_status
    FROM orders WHERE o_orderkey % 2 = 0
)
SELECT COALESCE(cur.o_orderkey, upd.o_orderkey) AS o_orderkey,
       COALESCE(u_price, o_totalprice) AS final_price,
       COALESCE(u_status, o_orderstatus) AS final_status,
       CASE WHEN u_price IS NOT NULL AND o_totalprice IS NOT NULL THEN 'update'
            WHEN u_price IS NOT NULL THEN 'insert'
            ELSE 'keep' END AS action
FROM cur FULL OUTER JOIN upd USING (o_orderkey)
"""


_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


def chunk_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token-window chunking with stride overlap -- the standard
    pretraining chunker (context windows of 32 tokens, stride 24, so
    consecutive chunks share 8 tokens; the tail chunk is whatever remains).
    Chunk count is pure integer arithmetic (1 if n <= size else
    1 + ceil((n - size) / stride)), the window is an array slice, and the
    chunk text re-concatenates the slice -- all JVM-side expressions on the
    already-split token array, one explode, no shuffle beyond the scan."""
    size, stride = _CHUNK_SIZE, _CHUNK_STRIDE
    d = (
        t(spark, sf_dir, "documents")
        .withColumn("w", tokens(F.col("text")))
        .withColumn("n", F.size("w"))
    )
    n_chunks = F.when(F.col("n") <= size, F.lit(1).cast("long")).otherwise(
        1
        + F.floor(
            (F.col("n") - size + stride - 1).cast("double") / F.lit(float(stride))
        ).cast("long")
    )
    c = d.select(
        "doc_id",
        "w",
        "n",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    )
    toks = F.slice(F.col("w"), (F.col("chunk_idx") * stride + 1).cast("int"), size)
    return c.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(toks).cast("long").alias("chunk_tokens"),
        F.concat_ws(" ", toks).alias("chunk_text"),
    )


CHUNK_WINDOWS_SQL = rf"""
WITH w AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '') AS w,
           len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS n
    FROM documents
),
c AS (
    SELECT doc_id, w, n,
           unnest(range(0, CASE WHEN n <= {_CHUNK_SIZE} THEN 1
                ELSE 1 + CAST(FLOOR(CAST(n - {_CHUNK_SIZE} + {_CHUNK_STRIDE} - 1
                                         AS DOUBLE) / {_CHUNK_STRIDE}) AS BIGINT)
                END)) AS chunk_idx
    FROM w
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(len(w[chunk_idx * {_CHUNK_STRIDE} + 1 :
                  least(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n)])
            AS BIGINT) AS chunk_tokens,
       array_to_string(w[chunk_idx * {_CHUNK_STRIDE} + 1 :
                         least(chunk_idx * {_CHUNK_STRIDE} + {_CHUNK_SIZE}, n)],
                       ' ') AS chunk_text
FROM c
"""


def flac_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed audio through the driver contract: the same 32 mono
    int16 samples as ``wav_stats_real`` but encoded as FLAC (fixed-
    predictor + Rice coding, operators/flac.py). FLAC is lossless by
    specification, so the identical character-code oracle applies -- a
    value match proves predict -> Rice encode -> decode -> un-predict (and
    both CRCs and the MD5 signature) bit-for-bit. Block size 8 forces a
    multi-frame stream so frame sync/headers are exercised per document."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import flac as FL
    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:64].ljust(64, b" ")
                samples = np.frombuffer(raw, "<i2")
                payloads.append(FL.encode_flac(samples, rate=8000, block_size=8))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["audio"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.audio_stats(media)


def jpeg_lossless_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL JPEG through the driver contract, lossless process (T.81 SOF3):
    each document's first 48 bytes become a 4x4 RGB image, Huffman+predictor
    encoded (the predictor cycles over all seven spec predictors by doc_id)
    and decoded back. Lossless JPEG is bit-exact, so the same oracle as the
    other image codecs proves predict -> Huffman encode -> decode ->
    un-predict bit-for-bit."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import jpeg as J

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = text.encode("utf-8")[:48].ljust(48, b" ")
                arr = np.frombuffer(raw, np.uint8).reshape(4, 4, 3)
                payloads.append(J.encode_jpeg_lossless(arr, 1 + int(doc_id) % 7))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.image_stats(media)


def _blocky16(codes: "np.ndarray") -> "np.ndarray":
    """Four byte values -> 16x16x3 image of flat 8x8 gray blocks. Every
    block is DC-only in the DCT domain, so baseline JPEG at quality 100
    (all-ones quant table) reproduces it bit-exactly -- the provable slice
    of a lossy codec."""
    import numpy as np

    img = np.zeros((16, 16), np.uint8)
    for i, v in enumerate(codes[:4]):
        r, c = divmod(i, 2)
        img[8 * r : 8 * r + 8, 8 * c : 8 * c + 8] = v
    return np.repeat(img[..., None], 3, -1)


def jpeg_baseline_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG (SOF0) through the driver contract: each
    document's first 4 bytes become a 16x16 blockwise-flat grayscale image,
    pushed through the full DCT encode path (level shift, 2-D DCT,
    quantize, zigzag, run-length Huffman) at quality 100 and decoded back.
    DC-only blocks make the lossy pipeline exact, so the oracle computes
    the stats straight from character codes."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import jpeg as J
    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:4].ljust(4, b" ")
                img = _blocky16(np.frombuffer(raw, np.uint8))
                payloads.append(J.encode_jpeg_baseline(img, quality=100))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.image_stats(media)


def jpeg_progressive_stats_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL progressive JPEG (SOF2) through the driver contract: the same
    blockwise-flat 16x16 grayscale as ``jpeg_baseline_stats_real``, but
    encoded with the full progressive scan script -- spectral selection,
    EOB-run batching, and a successive-approximation refinement pass for
    every coefficient. DC-only blocks at quality 100 decode exactly, so
    the same character-code oracle proves the multi-scan machinery."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import jpeg as J
    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:4].ljust(4, b" ")
                img = _blocky16(np.frombuffer(raw, np.uint8))
                payloads.append(J.encode_jpeg_progressive(img, quality=100))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["image"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.image_stats(media)


JPEG_BASELINE_STATS_SQL = """
WITH ch AS (
    SELECT doc_id,
           list_transform(
               list_filter(split(substr(text || repeat(' ', 4), 1, 4), ''),
                           c -> c <> ''),
               c -> CAST(ascii(c) AS BIGINT)) AS codes
    FROM documents
)
SELECT doc_id AS media_id, 16 AS width, 16 AS height,
       CAST(codes[1] + codes[2] + codes[3] + codes[4] AS DOUBLE) / 4 AS mean_r,
       CAST(codes[1] + codes[2] + codes[3] + codes[4] AS DOUBLE) / 4 AS mean_g,
       CAST(codes[1] + codes[2] + codes[3] + codes[4] AS DOUBLE) / 4 AS mean_b
FROM ch
"""


def mjpeg_frames_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL compressed video through the driver contract: each document's
    first 8 bytes become a 2-frame Motion-JPEG AVI (each frame a 16x16
    blockwise-flat baseline JPEG at quality 100), the RIFF parser samples
    both frames, and the JPEG decoder reconstructs them exactly. The oracle
    derives the channel sums straight from character codes -- container
    parse -> MJPEG frame decode -> sampling, bit-for-bit."""
    from typing import Iterator

    import numpy as np
    import pandas as pd

    from phageclouds_graphdatabase_spark.operators import multimodal as mm

    d = t(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8")[:8].ljust(8, b" ")
                codes = np.frombuffer(raw, np.uint8)
                frames = [_blocky16(codes[:4]), _blocky16(codes[4:])]
                payloads.append(mm.encode_avi(frames, codec="mjpg", quality=100))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "kind": ["video"] * len(payloads),
                    "payload": payloads,
                }
            )

    media = d.mapInPandas(build, mm.MEDIA_COLUMNS)
    return mm.video_frame_stats(media, n_frames=2)


MJPEG_FRAMES_SQL = """
WITH ch AS (
    SELECT doc_id,
           list_transform(
               list_filter(split(substr(text || repeat(' ', 8), 1, 8), ''),
                           c -> c <> ''),
               c -> CAST(ascii(c) AS BIGINT)) AS codes
    FROM documents
)
SELECT doc_id AS media_id, CAST(f AS INTEGER) AS frame_idx,
       16 AS width, 16 AS height,
       CAST(64 * (codes[4*f + 1] + codes[4*f + 2] + codes[4*f + 3] + codes[4*f + 4])
            AS BIGINT) AS sum_r,
       CAST(64 * (codes[4*f + 1] + codes[4*f + 2] + codes[4*f + 3] + codes[4*f + 4])
            AS BIGINT) AS sum_g,
       CAST(64 * (codes[4*f + 1] + codes[4*f + 2] + codes[4*f + 3] + codes[4*f + 4])
            AS BIGINT) AS sum_b
FROM ch, (SELECT unnest(range(0, 2)) AS f)
"""


# --------------------------------------------------------------------------
# Incremental dedup (continuous ingestion): a new batch (doc_id >= cutoff
# stands in for "today's crawl") survives only if its content hash is (a)
# absent from the already-ingested corpus -- an anti join on md5(text), the
# 64-hex key being the only thing shuffled -- and (b) the first occurrence
# within the batch itself (min doc_id per hash). At 100 TB the corpus side
# is a bucketed hash index, so the anti join co-locates without a corpus
# re-shuffle.
# --------------------------------------------------------------------------

_INGEST_CUTOFF = 400


def dedup_incremental_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(F.col("text")).alias("h")
    )
    corpus = d.filter(F.col("doc_id") < _INGEST_CUTOFF)
    batch = d.filter(F.col("doc_id") >= _INGEST_CUTOFF)
    first = batch.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    return (
        first.join(corpus.select("h"), "h", "left_anti")
        .select("doc_id", F.col("h").alias("content_md5"))
    )


DEDUP_INCR_SQL = f"""
WITH d AS (SELECT doc_id, md5(text) AS h FROM documents),
first AS (
    SELECT h, MIN(doc_id) AS doc_id FROM d
    WHERE doc_id >= {_INGEST_CUTOFF} GROUP BY h
)
SELECT f.doc_id, f.h AS content_md5
FROM first f
ANTI JOIN (SELECT h FROM d WHERE doc_id < {_INGEST_CUTOFF}) c ON f.h = c.h
"""


# --------------------------------------------------------------------------
# Cross-document exact SPAN dedup (the MassiveText/C4 "remove repeated
# passages corpus-wide" step, complementing intra-doc repeated_ngram_spans
# and whole-doc dedup_exact_docs): chunk every document into consecutive
# 8-token spans, keep only each span's FIRST occurrence across the whole
# corpus (ordered by doc_id, then position), and report per doc how much
# survived plus an md5 over the kept spans (order-preserving) so the oracle
# checks the reconstruction, not just the counts.
#
# Scale shape: tokenize + chunk are per-row maps; the keep-first decision
# is one window over md5(span) — a hash-partitioned shuffle with no
# skew beyond genuinely viral spans (bounded by corpus repetition itself);
# per-doc reassembly is a grouped sort-agg. No collect, no cross join.
# --------------------------------------------------------------------------

def dedup_spans_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_chunks = F.ceil(F.size(toks) / F.lit(8.0)).cast("int")
    chunks = d.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.concat_ws(" ", F.slice(toks, i * 8 + 1, 8)),
            )
        ).alias("idx", "chunk"),
    )
    w = Window.partitionBy(F.md5("chunk")).orderBy("doc_id", "idx")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("idx"), F.col("chunk"))
    )
    return ranked.groupBy("doc_id").agg(
        F.sum((F.col("rn") == 1).cast("long")).alias("kept_chunks"),
        F.sum((F.col("rn") > 1).cast("long")).alias("dropped_chunks"),
        F.md5(
            F.concat_ws(
                "|",
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda x: x["chunk"],
                ),
            )
        ).alias("kept_md5"),
    )


DEDUP_SPANS_SQL = r"""
WITH docs AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(text), '\s+'),
                       x -> x <> '') AS toks
    FROM documents
),
chunks AS (
    SELECT doc_id, CAST(i AS INTEGER) AS idx,
           array_to_string(toks[i * 8 + 1 : i * 8 + 8], ' ') AS chunk
    FROM docs,
         UNNEST(range(CAST(ceil(len(toks) / 8.0) AS BIGINT))) AS t(i)
),
ranked AS (
    SELECT doc_id, idx, chunk,
           ROW_NUMBER() OVER (
               PARTITION BY md5(chunk) ORDER BY doc_id, idx
           ) AS rn
    FROM chunks
)
SELECT doc_id,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS kept_chunks,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS dropped_chunks,
       md5(COALESCE(
           string_agg(CASE WHEN rn = 1 THEN chunk END, '|' ORDER BY idx),
           '')) AS kept_md5
FROM ranked GROUP BY doc_id
"""


ENTRIES: dict[str, SuiteEntry] = {
    "dedup_spans_exact": SuiteEntry(
        dedup_spans_exact, DEDUP_SPANS_SQL, ("W5", "W2")
    ),
    "split_train_val_test": SuiteEntry(split_train_val_test, SPLIT_SQL, ("W5", "P6")),
    "pack_sequences": SuiteEntry(pack_sequences, PACK_SQL, ("W5", "W2")),
    "shuffle_order_global": SuiteEntry(shuffle_order_global, SHUFFLE_ORDER_SQL, ("W5", "W2")),
    "stratified_sample_bylang": SuiteEntry(
        stratified_sample_bylang, STRATIFIED_SQL, ("W5", "W2")
    ),
    "source_mixture_budget": SuiteEntry(source_mixture_budget, MIXTURE_SQL, ("W5", "W2")),
    "contamination_check": SuiteEntry(contamination_check, CONTAMINATION_SQL, ("W5", "J7")),
    "corr_chars_tokens": SuiteEntry(corr_chars_tokens, CORR_SQL, ("A6", "W5")),
    "events_rolling_10min": SuiteEntry(events_rolling_10min, ROLLING_10MIN_SQL, ("W2",)),
    "median_order_value": SuiteEntry(median_order_value, MEDIAN_SQL, ("A6", "W2")),
    "image_stats_real": SuiteEntry(image_stats_real, IMAGE_STATS_SQL, ("W4",)),
    "png_stats_real": SuiteEntry(png_stats_real, IMAGE_STATS_SQL, ("W4",)),
    "wav_stats_real": SuiteEntry(wav_stats_real, WAV_STATS_SQL, ("W4",)),
    "avi_frames_real": SuiteEntry(avi_frames_real, AVI_FRAMES_SQL, ("W4",)),
    "gif_stats_real": SuiteEntry(gif_stats_real, IMAGE_STATS_SQL, ("W4",)),
    "tiff_stats_real": SuiteEntry(tiff_stats_real, IMAGE_STATS_SQL, ("W4",)),
    "jpeg_lossless_stats_real": SuiteEntry(
        jpeg_lossless_stats_real, IMAGE_STATS_SQL, ("W4",)
    ),
    "jpeg_baseline_stats_real": SuiteEntry(
        jpeg_baseline_stats_real, JPEG_BASELINE_STATS_SQL, ("W4",)
    ),
    "jpeg_progressive_stats_real": SuiteEntry(
        jpeg_progressive_stats_real, JPEG_BASELINE_STATS_SQL, ("W4",)
    ),
    "mjpeg_frames_real": SuiteEntry(mjpeg_frames_real, MJPEG_FRAMES_SQL, ("W4",)),
    "chunk_token_windows": SuiteEntry(chunk_token_windows, CHUNK_WINDOWS_SQL, ("W5",)),
    "flac_stats_real": SuiteEntry(flac_stats_real, WAV_STATS_SQL, ("W4",)),
    "merge_upsert_orders": SuiteEntry(merge_upsert_orders, MERGE_UPSERT_SQL, ("A4", "J7")),
    "heavy_hitters_countmin": SuiteEntry(
        heavy_hitters_countmin, HEAVY_HITTERS_SQL, ("A6", "W5")
    ),
    "kmv_distinct_estimate": SuiteEntry(kmv_distinct_estimate, KMV_SQL, ("A6", "W5")),
    "weighted_sample_bylang": SuiteEntry(
        weighted_sample_bylang, WEIGHTED_SAMPLE_SQL, ("W2", "W5")
    ),
    "dedup_incremental_exact": SuiteEntry(
        dedup_incremental_exact, DEDUP_INCR_SQL, ("W5", "A4", "J7")
    ),
}


# --------------------------------------------------------------------------
# WebDataset tar shards (W4/S7): the sharded tar layout LLM training loaders
# stream. The entry proves the FULL cycle -- DataFrame -> deterministic tar
# shards (stdlib tarfile, zeroed metadata, sorted members) -> format(
# "webdataset") scan (one shard per InputPartition) -> per-shard corpus
# fingerprint. The oracle recomputes the same fingerprint straight from the
# parquet view with the same pmod placement, so a single flipped byte
# anywhere in the tar write/read path flips content_fp. At 100 TB the shard
# IS the partition: writing is one shuffle on shard id, reading is
# shuffle-free and embarrassingly parallel across shards.
# --------------------------------------------------------------------------

def webdataset_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from phageclouds_graphdatabase_spark.sources import webdataset as wds

    docs = t(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(),
        "pcgdb_wds_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    payload = docs.select(
        "doc_id",
        F.col("text").alias("txt"),
        F.to_json(F.struct("lang", "source", "n_chars")).alias("json"),
    )
    wds.write_webdataset(payload, out, "doc_id", F.pmod(F.col("doc_id"), F.lit(8)), 8)
    wds.register(spark)
    back = spark.read.format("webdataset").option("exts", "txt,json").load(out)
    meta = F.from_json("json", "lang string, source string, n_chars long")
    per = back.select(
        F.regexp_extract("_shard", r"shard-(\d+)\.tar", 1).cast("int").alias("shard"),
        F.md5(F.col("txt").cast("binary")).alias("h"),
        meta.getField("n_chars").alias("nc"),
        meta.getField("lang").alias("lang"),
    )
    return (
        per.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("sum_chars_meta"),
            F.countDistinct("lang").cast("long").alias("n_langs"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_list("h"))).cast("binary")
            ).alias("content_fp"),
        )
        .orderBy("shard")
    )


WEBDATASET_SQL = """
WITH d AS (
    SELECT CAST(doc_id % 8 AS INTEGER) AS shard, text, lang, n_chars
    FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars_meta,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       md5(array_to_string(list_sort(list(md5(text))), '')) AS content_fp
FROM d GROUP BY shard ORDER BY shard
"""


# --------------------------------------------------------------------------
# Corpus-level Zipf profile (W5): global token frequencies, the first plot
# anyone makes of a new pretraining corpus (and the sanity check that a
# dedup/filter pass didn't nuke the head of the distribution). Top-k via
# orderBy+limit compiles to TakeOrderedAndProject -- per-partition heaps, no
# global sort -- so the same plan holds when the vocabulary is billions of
# types; the row_number ranks only the k survivors.
# --------------------------------------------------------------------------

def zipf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
    )
    top = counts.orderBy(F.desc("n"), F.asc("tok")).limit(50)
    w = Window.orderBy(F.desc("n"), F.asc("tok"))
    return top.select(
        "tok",
        "n",
        F.row_number().over(w).cast("long").alias("rnk"),
        (F.col("n") * F.row_number().over(w)).cast("long").alias("zipf_product"),
    ).orderBy("rnk")


ZIPF_SQL = r"""
WITH tok AS (
    SELECT u.t AS tok
    FROM documents,
         UNNEST(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS u(t)
), c AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tok
), r AS (
    SELECT tok, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rnk
    FROM c
)
SELECT tok, n, rnk, CAST(n * rnk AS BIGINT) AS zipf_product
FROM r WHERE rnk <= 50 ORDER BY rnk
"""


ENTRIES.update(
    {
        "webdataset_roundtrip": SuiteEntry(
            webdataset_roundtrip, WEBDATASET_SQL, ("S7", "W4", "W5")
        ),
        "zipf_token_stats": SuiteEntry(zipf_token_stats, ZIPF_SQL, ("W5", "A6")),
    }
)


# --------------------------------------------------------------------------
# BM25 document ranking (W5): the standard retrieval score, in the
# inverted-index shape -- tokens filtered to the query terms FIRST, so the
# posting join is query-sized, never corpus-sized; dl/df/L are plain
# aggregates. Cross-engine exactness: k1=1.2, b=0.75 cleared to integers
# (num = 22*tf*L*(2N-2df+1), den = (10*L*tf+3*L+9*dl*N)*(2df+1)) so the
# whole score is ONE IEEE division of exactly-representable integers,
# quantized to micro-units per the helpers' FLOOR(x*1e6+0.5) rule. The
# rational Robertson idf (N-df+.5)/(df+.5) stands in for its log (a
# monotone transform -- documented deviation that keeps the oracle
# transcendental-free). BIGINT headroom: num < 2^63 up to ~10^15 corpus
# tokens; past 2^53 the double conversion rounds identically (IEEE
# round-to-nearest) in both engines.
# --------------------------------------------------------------------------

_BM25_TERMS = ("spark", "join", "merge", "window")


def bm25_doc_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("tok")
    )
    dl = toks.groupBy("doc_id").agg(F.count("*").cast("long").alias("dl"))
    scal = docs.agg(F.count("*").cast("long").alias("n_docs")).crossJoin(
        dl.agg(F.sum("dl").cast("long").alias("corpus_len"))
    )
    post = (
        toks.filter(F.col("tok").isin(*_BM25_TERMS))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    dfreq = post.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    j = (
        post.join(dl, "doc_id")
        .join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(scal))
    )
    num = (
        F.lit(22)
        * F.col("tf")
        * F.col("corpus_len")
        * (F.lit(2) * F.col("n_docs") - F.lit(2) * F.col("df") + F.lit(1))
    )
    den = (
        F.lit(10) * F.col("corpus_len") * F.col("tf")
        + F.lit(3) * F.col("corpus_len")
        + F.lit(9) * F.col("dl") * F.col("n_docs")
    ) * (F.lit(2) * F.col("df") + F.lit(1))
    micro = F.floor(
        num.cast("double") / den.cast("double") * F.lit(1000000.0) + F.lit(0.5)
    ).cast("long")
    agg = j.groupBy("doc_id").agg(
        F.sum(micro).cast("long").alias("score_micro"),
        F.count("*").cast("long").alias("n_terms"),
    )
    top = agg.orderBy(F.desc("score_micro"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("score_micro"), F.asc("doc_id"))
    return top.select(
        "doc_id",
        "score_micro",
        "n_terms",
        F.row_number().over(w).cast("long").alias("rnk"),
    ).orderBy("rnk")


BM25_SQL = r"""
WITH toks AS (
    SELECT doc_id, u.t AS tok
    FROM documents,
         UNNEST(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                            x -> x <> '')) AS u(t)
), dl AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
), scal AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_docs,
           (SELECT CAST(SUM(dl) AS BIGINT) FROM dl) AS corpus_len
), post AS (
    SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
    FROM toks WHERE tok IN ('spark', 'join', 'merge', 'window')
    GROUP BY doc_id, tok
), dfreq AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY tok
), scored AS (
    SELECT p.doc_id,
           CAST(FLOOR(
               CAST(22 * p.tf * s.corpus_len
                    * (2 * s.n_docs - 2 * f.df + 1) AS DOUBLE)
               / CAST((10 * s.corpus_len * p.tf + 3 * s.corpus_len
                       + 9 * d.dl * s.n_docs) * (2 * f.df + 1) AS DOUBLE)
               * 1000000.0 + 0.5) AS BIGINT) AS micro
    FROM post p
    JOIN dl d USING (doc_id)
    JOIN dfreq f USING (tok)
    CROSS JOIN scal s
), agg AS (
    SELECT doc_id, CAST(SUM(micro) AS BIGINT) AS score_micro,
           CAST(COUNT(*) AS BIGINT) AS n_terms
    FROM scored GROUP BY doc_id
)
SELECT doc_id, score_micro, n_terms,
       CAST(ROW_NUMBER() OVER (ORDER BY score_micro DESC, doc_id)
            AS BIGINT) AS rnk
FROM agg ORDER BY score_micro DESC, doc_id LIMIT 20
"""


ENTRIES.update(
    {
        "bm25_doc_ranking": SuiteEntry(
            bm25_doc_ranking, BM25_SQL, ("W5", "A6", "W1")
        ),
    }
)


# --------------------------------------------------------------------------
# BPE tokenizer training (W5/V8): learn the first TWO byte-pair merges over
# the corpus -- the inner loop of every modern tokenizer build, in the
# shape that scales: all state is VOCABULARY-sized (distinct words with
# frequencies), never corpus-sized; pair counting is an explode + sum over
# the word table; the argmax merge broadcasts back as two scalar columns.
# Applying a merge is a left fold over each word's symbol array
# (greedy non-overlapping, the reference BPE semantics): Spark
# `aggregate(...)`, DuckDB `list_reduce(...)`, with a CASE lambda written
# identically on both sides. Determinism: merge pick ties break on
# (count DESC, left ASC, right ASC). Output: top-5 pairs of each round.
# --------------------------------------------------------------------------

# greedy merge fold over a space-joined symbol string; `ml`/`mr` are the
# learned merge pair as outer columns. "a a a" under merge (a,a) -> "aa a"
# (non-overlapping), because the merged token's string can never equal the
# bare left symbol.
_BPE_FOLD = (
    "CASE WHEN x = mr AND (acc = ml OR {endswith}(acc, {concat_sp_ml})) "
    "THEN {suffix_cut} ELSE {acc_app} END"
)
_BPE_FOLD_SPARK = _BPE_FOLD.format(
    endswith="endswith",
    concat_sp_ml="concat(' ', ml)",
    suffix_cut="concat(substring(acc, 1, length(acc) - length(ml)), ml, mr)",
    acc_app="concat(acc, ' ', x)",
)
_BPE_FOLD_DUCK = _BPE_FOLD.format(
    endswith="ends_with",
    concat_sp_ml="' ' || ml",
    suffix_cut="substring(acc, 1, length(acc) - length(ml)) || ml || mr",
    acc_app="acc || ' ' || x",
)


def _bpe_pairs(syms_df: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent symbol pairs weighted by word frequency."""
    two = syms_df.filter(F.size("syms") >= 2)
    p = two.select(
        "wf",
        F.explode(
            F.expr(
                "transform(sequence(1, size(syms) - 1),"
                " i -> struct(element_at(syms, i) AS l,"
                "             element_at(syms, i + 1) AS r))"
            )
        ).alias("p"),
    )
    return p.groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r")).agg(
        F.sum("wf").cast("long").alias("cnt")
    )


def bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wf"))
    )
    s0 = wf.select(
        "wf",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )
    p1 = _bpe_pairs(s0).cache()
    m1 = p1.orderBy(F.desc("cnt"), "l", "r").limit(1).select(
        F.col("l").alias("ml"), F.col("r").alias("mr")
    )
    s1 = s0.crossJoin(F.broadcast(m1)).select(
        "wf",
        F.split(
            F.expr(
                "aggregate(slice(syms, 2, size(syms) - 1),"
                f" element_at(syms, 1), (acc, x) -> {_BPE_FOLD_SPARK})"
            ),
            " ",
        ).alias("syms"),
    )
    p2 = _bpe_pairs(s1)

    def _top(p: DataFrame, rnd: int) -> DataFrame:
        w = Window.orderBy(F.desc("cnt"), "l", "r")
        return (
            p.orderBy(F.desc("cnt"), "l", "r")
            .limit(5)
            .select(
                F.lit(rnd).cast("long").alias("rnd"),
                F.row_number().over(w).cast("long").alias("rnk"),
                F.col("l").alias("left_sym"),
                F.col("r").alias("right_sym"),
                "cnt",
            )
        )

    return _top(p1, 1).unionByName(_top(p2, 2)).orderBy("rnd", "rnk")


_BPE_WF_SQL = r"""
    SELECT word, CAST(COUNT(*) AS BIGINT) AS wf
    FROM (
        SELECT u.t AS word
        FROM documents,
             UNNEST(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\s+'),
                                x -> x <> '')) AS u(t)
    ) GROUP BY word
"""

_BPE_PAIRS_SQL = """
    SELECT l, r, CAST(SUM(wf) AS BIGINT) AS cnt
    FROM (
        SELECT wf, list_extract(syms, i) AS l,
               list_extract(syms, i + 1) AS r
        FROM {src}, UNNEST(generate_series(1, len(syms) - 1)) AS u(i)
        WHERE len(syms) >= 2
    ) GROUP BY l, r
"""

BPE_SQL = f"""
WITH wf AS ({_BPE_WF_SQL}),
s0 AS (
    SELECT wf,
           list_transform(generate_series(1, length(word)),
                          i -> substring(word, i, 1)) AS syms
    FROM wf
),
p1 AS ({_BPE_PAIRS_SQL.format(src='s0')}),
m1 AS (SELECT l AS ml, r AS mr FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
s1 AS (
    SELECT wf,
           string_split(list_reduce(syms,
               (acc, x) -> {_BPE_FOLD_DUCK}), ' ') AS syms
    FROM s0 CROSS JOIN m1
),
p2 AS ({_BPE_PAIRS_SQL.format(src='s1')}),
r1 AS (
    SELECT CAST(1 AS BIGINT) AS rnd,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS BIGINT) AS rnk,
           l AS left_sym, r AS right_sym, cnt
    FROM p1
),
r2 AS (
    SELECT CAST(2 AS BIGINT) AS rnd,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, l, r) AS BIGINT) AS rnk,
           l AS left_sym, r AS right_sym, cnt
    FROM p2
)
SELECT * FROM (
    SELECT * FROM r1 WHERE rnk <= 5
    UNION ALL
    SELECT * FROM r2 WHERE rnk <= 5
) ORDER BY rnd, rnk
"""


def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE with the trained merges — the tokenizer's apply side
    (bpe_merge_train is the learn side): train the top merge rule of each
    of two rounds on the corpus, re-encode every word through both rules
    in rank order (the same fold lambda, so training and encoding are one
    code path), and return the top-20 post-merge symbol vocabulary by
    corpus frequency. At 100 TB the rules are a broadcast scalar frame and
    the encode is a per-row fold — embarrassingly parallel, no shuffle
    beyond the final vocabulary aggregation."""
    docs = t(spark, sf_dir, "documents")
    wf = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wf"))
    )
    s0 = wf.select(
        "wf",
        F.expr(
            "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
        ).alias("syms"),
    )

    def _apply_rule(syms_df: DataFrame, rule: DataFrame) -> DataFrame:
        return syms_df.crossJoin(F.broadcast(rule)).select(
            "wf",
            F.split(
                F.expr(
                    "aggregate(slice(syms, 2, size(syms) - 1),"
                    f" element_at(syms, 1), (acc, x) -> {_BPE_FOLD_SPARK})"
                ),
                " ",
            ).alias("syms"),
        )

    def _top_rule(pairs: DataFrame) -> DataFrame:
        return pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).select(
            F.col("l").alias("ml"), F.col("r").alias("mr")
        )

    s1 = _apply_rule(s0, _top_rule(_bpe_pairs(s0))).localCheckpoint()
    s2 = _apply_rule(s1, _top_rule(_bpe_pairs(s1)))
    return (
        s2.select("wf", F.explode("syms").alias("sym"))
        .groupBy("sym")
        .agg(F.sum("wf").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), "sym")
        .limit(20)
    )


BPE_ENCODE_SQL = f"""
WITH wf AS ({_BPE_WF_SQL}),
s0 AS (
    SELECT wf,
           list_transform(generate_series(1, length(word)),
                          i -> substring(word, i, 1)) AS syms
    FROM wf
),
p1 AS ({_BPE_PAIRS_SQL.format(src='s0')}),
m1 AS (SELECT l AS ml, r AS mr FROM p1 ORDER BY cnt DESC, l, r LIMIT 1),
s1 AS (
    SELECT wf,
           string_split(list_reduce(syms,
               (acc, x) -> {_BPE_FOLD_DUCK}), ' ') AS syms
    FROM s0 CROSS JOIN m1
),
p2 AS ({_BPE_PAIRS_SQL.format(src='s1')}),
m2 AS (SELECT l AS ml, r AS mr FROM p2 ORDER BY cnt DESC, l, r LIMIT 1),
s2 AS (
    SELECT wf,
           string_split(list_reduce(syms,
               (acc, x) -> {_BPE_FOLD_DUCK}), ' ') AS syms
    FROM s1 CROSS JOIN m2
)
SELECT sym, CAST(SUM(wf) AS BIGINT) AS freq
FROM (SELECT wf, u.sym FROM s2, UNNEST(syms) AS u(sym))
GROUP BY sym ORDER BY freq DESC, sym LIMIT 20
"""


ENTRIES.update(
    {
        "bpe_merge_train": SuiteEntry(
            bpe_merge_train, BPE_SQL, ("W5", "V8", "A6")
        ),
        "bpe_encode_tokens": SuiteEntry(
            bpe_encode_tokens, BPE_ENCODE_SQL, ("W5", "V8", "A6")
        ),
    }
)


# --------------------------------------------------------------------------
# Streaming WebDataset ingestion (W3/W4/S7): the REAL Structured Streaming
# path over the tar-shard source — readStream from a shard directory, one
# shard per InputPartition per micro-batch, stateful per-shard aggregation,
# Trigger.AvailableNow. Complete-mode output equals the batch computation
# straight off the parquet view, which is the oracle: a wrong offset split,
# dropped shard, or double-read flips a count or the content fingerprint.
# --------------------------------------------------------------------------

def stream_webdataset_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import shutil
    import tempfile

    from phageclouds_graphdatabase_spark.sources import webdataset as wds
    from phageclouds_graphdatabase_spark.streaming.events import (
        run_available_now,
    )

    docs = t(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(),
        "pcgdb_wds_stream_" + hashlib.md5(sf_dir.encode()).hexdigest()[:8],
    )
    if os.path.isdir(out):
        shutil.rmtree(out)
    payload = docs.select(
        "doc_id",
        F.col("text").alias("txt"),
        F.to_json(F.struct("n_chars")).alias("json"),
    )
    wds.write_webdataset(
        payload, out, "doc_id", F.pmod(F.col("doc_id"), F.lit(4)), 4
    )
    wds.register(spark)
    s = (
        spark.readStream.format("webdataset")
        .option("exts", "txt,json")
        .load(out)
    )
    meta = F.from_json("json", "n_chars long")
    agg = (
        s.select(
            F.regexp_extract("_shard", r"shard-(\d+)\.tar", 1)
            .cast("int")
            .alias("shard"),
            F.md5(F.col("txt").cast("binary")).alias("h"),
            meta.getField("n_chars").alias("nc"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nc").cast("long").alias("sum_chars_meta"),
            F.md5(
                F.concat_ws("", F.sort_array(F.collect_list("h"))).cast("binary")
            ).alias("content_fp"),
        )
    )
    rows = run_available_now(agg, output_mode="complete")
    return spark.createDataFrame(
        rows, "shard int, n_docs long, sum_chars_meta long, content_fp string"
    ).orderBy("shard")


STREAM_WEBDATASET_SQL = """
WITH d AS (
    SELECT CAST(doc_id % 4 AS INTEGER) AS shard, text, n_chars
    FROM documents
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars_meta,
       md5(array_to_string(list_sort(list(md5(text))), '')) AS content_fp
FROM d GROUP BY shard ORDER BY shard
"""


ENTRIES.update(
    {
        "stream_webdataset_ingest": SuiteEntry(
            stream_webdataset_ingest, STREAM_WEBDATASET_SQL, ("W3", "W4", "S7")
        ),
    }
)


# --------------------------------------------------------------------------
# Negative-sampling table (W5): the word2vec / NCE unigram^0.75 noise
# distribution over the corpus vocabulary. Vocabulary-sized state; the
# 3/4 power is computed as sqrt(sqrt(cnt^3)) — IEEE sqrt is CORRECTLY
# ROUNDED by spec, so unlike pow()/exp()/ln() it is bit-identical across
# engines; each weight is quantized to integer micro-units BEFORE any
# summation, so the normalizer and cumulative ranks are exact BIGINTs
# (float sums are order-dependent; integer sums are not). Output: top-64
# sampled tokens with exact parts-per-billion probabilities.
# --------------------------------------------------------------------------

def negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = t(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    wq = F.floor(
        F.sqrt(F.sqrt((F.col("cnt") * F.col("cnt") * F.col("cnt")).cast("double")))
        * F.lit(1000000.0)
        + F.lit(0.5)
    ).cast("long")
    weighted = counts.select("tok", "cnt", wq.alias("weight_q"))
    total = weighted.agg(F.sum("weight_q").cast("long").alias("total_q"))
    top = (
        weighted.crossJoin(F.broadcast(total))
        .orderBy(F.desc("weight_q"), F.asc("tok"))
        .limit(64)
    )
    w = Window.orderBy(F.desc("weight_q"), F.asc("tok"))
    return top.select(
        "tok",
        "cnt",
        "weight_q",
        F.row_number().over(w).cast("long").alias("rnk"),
        # multiply in the DOUBLE domain (matching the oracle text): a
        # BIGINT product would overflow int64 at ~1e10 weight units while
        # the IEEE double product rounds identically in both engines
        F.floor(
            F.col("weight_q").cast("double")
            * F.lit(1000000000.0)
            / F.col("total_q").cast("double")
        ).cast("long").alias("p_ppb"),
    ).orderBy("rnk")


NEG_SAMPLING_SQL = r"""
WITH c AS (
    SELECT tok, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
        SELECT u.t AS tok
        FROM documents,
             UNNEST(list_filter(regexp_split_to_array(trim(lower(text)),
                                                      '\s+'),
                                x -> x <> '')) AS u(t)
    ) GROUP BY tok
), wtd AS (
    SELECT tok, cnt,
           CAST(FLOOR(sqrt(sqrt(CAST(cnt * cnt * cnt AS DOUBLE)))
                      * 1000000.0 + 0.5) AS BIGINT) AS weight_q
    FROM c
), tot AS (SELECT CAST(SUM(weight_q) AS BIGINT) AS total_q FROM wtd),
r AS (
    SELECT tok, cnt, weight_q,
           CAST(ROW_NUMBER() OVER (ORDER BY weight_q DESC, tok)
                AS BIGINT) AS rnk,
           CAST(FLOOR(weight_q * 1000000000.0 / total_q) AS BIGINT) AS p_ppb
    FROM wtd CROSS JOIN tot
)
SELECT tok, cnt, weight_q, rnk, p_ppb
FROM r WHERE rnk <= 64 ORDER BY rnk
"""


ENTRIES.update(
    {
        "negative_sampling_table": SuiteEntry(
            negative_sampling_table, NEG_SAMPLING_SQL, ("W5", "A6", "W1")
        ),
    }
)


# --------------------------------------------------------------------------
# Data-quality audit (A6/J7/P1): the dbt-style check suite an ingestion
# pipeline runs before a corpus is trusted — null checks, key uniqueness,
# referential integrity, domain constraints, freshness-ish ranges — as ONE
# lazy plan of named checks UNIONed into a (check, violations) report.
# Each check is a filter+count or anti-join+count: map-side combinable,
# no driver round-trips, and Catalyst shares the common scans.
# --------------------------------------------------------------------------

def dq_audit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem")
    cust = t(spark, sf_dir, "customer")
    docs = t(spark, sf_dir, "documents")

    def check(name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(name).alias("check_name"),
            F.count("*").cast("long").alias("violations"),
        )

    dup_orders = (
        orders.groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 1)
    )
    rep = (
        check("orders_null_custkey", orders.filter(F.col("o_custkey").isNull()))
        .unionByName(check("orders_dup_orderkey", dup_orders))
        .unionByName(
            check(
                "orders_orphan_custkey",
                orders.join(
                    cust.select(F.col("c_custkey").alias("o_custkey")),
                    "o_custkey",
                    "left_anti",
                ),
            )
        )
        .unionByName(
            check(
                "lineitem_orphan_orderkey",
                li.join(
                    orders.select(F.col("o_orderkey").alias("l_orderkey")),
                    "l_orderkey",
                    "left_anti",
                ),
            )
        )
        .unionByName(
            check(
                "lineitem_null_shipdate",
                li.filter(F.col("l_shipdate").isNull()),
            )
        )
        .unionByName(
            check(
                "lineitem_nonpositive_qty",
                li.filter(F.col("l_quantity") <= 0),
            )
        )
        .unionByName(
            check(
                "lineitem_discount_range",
                li.filter(
                    (F.col("l_discount") < 0) | (F.col("l_discount") > 1)
                ),
            )
        )
        .unionByName(
            check(
                "docs_chars_mismatch",
                docs.filter(F.length("text") != F.col("n_chars")),
            )
        )
        .unionByName(
            check("docs_empty_text", docs.filter(F.length(F.trim("text")) == 0))
        )
    )
    return rep.orderBy("check_name")


DQ_AUDIT_SQL = """
SELECT 'orders_null_custkey' AS check_name, CAST(COUNT(*) AS BIGINT) AS violations
FROM orders WHERE o_custkey IS NULL
UNION ALL
SELECT 'orders_dup_orderkey', CAST(COUNT(*) AS BIGINT) FROM (
    SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1
)
UNION ALL
SELECT 'orders_orphan_custkey', CAST(COUNT(*) AS BIGINT)
FROM orders WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
UNION ALL
SELECT 'lineitem_orphan_orderkey', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)
UNION ALL
SELECT 'lineitem_null_shipdate', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_shipdate IS NULL
UNION ALL
SELECT 'lineitem_nonpositive_qty', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_quantity <= 0
UNION ALL
SELECT 'lineitem_discount_range', CAST(COUNT(*) AS BIGINT)
FROM lineitem WHERE l_discount < 0 OR l_discount > 1
UNION ALL
SELECT 'docs_chars_mismatch', CAST(COUNT(*) AS BIGINT)
FROM documents WHERE length(text) <> n_chars
UNION ALL
SELECT 'docs_empty_text', CAST(COUNT(*) AS BIGINT)
FROM documents WHERE length(trim(text)) = 0
ORDER BY check_name
"""


ENTRIES.update(
    {
        "dq_audit_report": SuiteEntry(
            dq_audit_report, DQ_AUDIT_SQL, ("A6", "J7", "P1")
        ),
    }
)


# --------------------------------------------------------------------------
# Hashed linear quality classifier (W5): the fastText-style architecture
# (Joulin et al. 2016) used industrially for corpus quality gating (e.g.
# CCNet / LLaMA's Wikipedia-reference classifier). Features are hashed
# unigrams + bigrams; the document score is a single linear pass. Here the
# per-feature weights are derived deterministically from the feature hash
# (integer, centered on zero) so the entry is self-contained and
# oracle-exact; a production deployment would instead broadcast-join a
# learned weight table keyed by bucket = hash % 2^21 — the PLAN SHAPE is
# identical either way: explode features -> map-side partial sums ->
# one doc_id-keyed reduce. No Python in the loop; scales as one shuffle
# of (doc_id, weight) pairs that combiners collapse to one row per doc.
# --------------------------------------------------------------------------


def quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-shaped quality scoring: integer logit = sum of hash-derived
    weights over lowercased unigram+bigram features; passes = logit > 0.
    Integer end-to-end (the established cross-engine determinism rule)."""
    d = t(spark, sf_dir, "documents").withColumn(
        "w", tokens(F.lower(F.col("text")))
    )
    bi = F.when(
        F.size("w") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("w") - F.lit(1)),
            lambda i: F.concat(
                F.element_at(F.col("w"), i), F.lit(" "),
                F.element_at(F.col("w"), i + F.lit(1)),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = (
        d.filter(F.size("w") >= 1)
        .select("doc_id", F.explode(F.concat(F.col("w"), bi)).alias("f"))
    )
    wgt = F.conv(
        F.substring(F.md5(F.concat(F.lit("qw|"), F.col("f"))), 1, 8), 16, 10
    ).cast("long") - F.lit(2147483648).cast("long")
    scored = feats.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_feats"),
        F.sum(wgt).cast("long").alias("logit"),
    )
    return scored.select(
        "doc_id",
        "n_feats",
        "logit",
        (F.col("logit") > 0).cast("int").alias("passes"),
    )


QUALITY_CLASSIFIER_SQL = r"""
WITH toks AS (
    SELECT doc_id,
           list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                       x -> x <> '') AS w
    FROM documents
), feats AS (
    SELECT doc_id,
           unnest(w || list_transform(range(1, len(w)),
                                      i -> w[i] || ' ' || w[i+1])) AS f
    FROM toks WHERE len(w) >= 1
), scored AS (
    SELECT doc_id, COUNT(*) AS n_feats,
           SUM(""" + _HEX8_SQL.format(h="md5('qw|' || f)") + r""" - 2147483648) AS logit
    FROM feats GROUP BY doc_id
)
SELECT doc_id, CAST(n_feats AS BIGINT) AS n_feats,
       CAST(logit AS BIGINT) AS logit,
       CAST(CASE WHEN logit > 0 THEN 1 ELSE 0 END AS INTEGER) AS passes
FROM scored
"""


ENTRIES.update(
    {
        "quality_classifier_hashed": SuiteEntry(
            quality_classifier_hashed, QUALITY_CLASSIFIER_SQL, ("W5", "V8", "A6")
        ),
    }
)
