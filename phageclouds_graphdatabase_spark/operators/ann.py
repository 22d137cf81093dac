"""IVF index at rest: the embedding corpus partitioned by coarse-quantizer
cell, so an nprobe probe is a PARTITION-PRUNED SCAN instead of a join.

Why this module exists — a measured result, not a guess
(tools/ann_rehearsal.py, SCALE.md "ANN rehearsal"): expressing the IVF
probe as `corpus JOIN probed_cells` shuffles every candidate row WITH its
vector (8M × 32d, 1000 queries: ~250M candidate rows, the probe ran 86 s
against 23 s for brute-force GEMM over the cached corpus). The join is the
wrong physical shape. With the corpus written `partitionBy("cell")`, the
same probe becomes `read.parquet(index).filter(cell IN probed)` — Spark
prunes to the probed directories at PLANNING time (the scan's
PartitionFilters; tests pin this), reads nprobe/k of the bytes, and the
only shuffle left is the final per-query top-k of k·nprobe candidate rows.
That is the 100-TB shape: at a billion vectors per cell-partition set, a
probe touches only the probed partitions' files.

The reference has no vector search (it is a Neo4j bolt client,
/root/reference/phageclouds_gdb.py); this is LLM-pipeline extension
surface (SURVEY.md §2 W5), sharing its design with the bucketed graph
layout (sources/readers.write_graph_bucketed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _repartition_cells(
    df: DataFrame,
    max_files_per_cell: int,
    n_cells: int | None = None,
    max_partitions: int = 32_768,
) -> DataFrame:
    """Co-locate each cell's rows into ≤ ``max_files_per_cell`` shuffle
    partitions before a ``partitionBy("cell")`` write.

    Hashing by cell alone would pin every cell to exactly ONE partition
    (one file per cell forever, and a mega-cell can't split — round-3
    ADVICE); hashing by (cell, salt) with a deterministic per-row salt in
    [0, max_files_per_cell) lets a large cell fan out to up to that many
    files while small cells still collapse to few. The salt is derived
    from vec_id (not rand()) so reruns produce identical layouts. The
    partition count is EXPLICIT (cells × files): a bare column-repartition
    is an AQE-coalescible exchange, and on a small batch AQE merges the
    whole shuffle into one partition — one file per cell again; an
    explicit count is REPARTITION_BY_NUM, which AQE leaves alone. The
    one distinct-count job is once per index build (pass ``n_cells`` to
    skip it when the quantizer size is already known). The count is
    CAPPED at ``max_partitions`` (default 32k): at a realistic large
    nlist (65k cells × 8 files ≈ 500k partitions) an uncapped exchange
    stalls the scheduler (ADVICE r4); past the cap, hash(cell, salt)
    still spreads cells across distinct partitions and partitionBy at
    write time keeps directories per-cell, so only file fan-in per task
    grows, not correctness."""
    if max_files_per_cell <= 1:
        return df.repartition("cell")
    if n_cells is None:
        n_cells = df.select("cell").distinct().count()
    salt = F.pmod(F.xxhash64("vec_id"), F.lit(max_files_per_cell))
    n_parts = min(max(1, n_cells) * max_files_per_cell, max_partitions)
    return df.repartition(n_parts, F.col("cell"), salt)


def write_ivf_index(
    assigned: DataFrame,
    path: str,
    max_files_per_cell: int = 1,
    n_cells: int | None = None,
) -> None:
    """Persist a (vec_id, cell, vec) corpus partitioned by cell.

    Repartition by (cell, salt) first: without it every input partition
    writes a file into every cell directory (files = partitions × cells,
    the classic small-files explosion); with it each cell's rows co-locate
    across at most ``max_files_per_cell`` files. At the 100-TB tier raise
    ``max_files_per_cell`` so single files stay ~128-512 MB."""
    (
        _repartition_cells(assigned, max_files_per_cell, n_cells=n_cells)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def read_ivf_cells(
    spark: SparkSession, path: str, cells: list[int]
) -> DataFrame:
    """Scan ONLY the probed cell partitions. The `isin` filter on the
    partition column resolves at planning time — the non-probed
    directories are never listed into the scan (PartitionFilters in the
    physical plan, 0 PushedFilters needed)."""
    df = spark.read.parquet(path)
    return df.filter(F.col("cell").isin([int(c) for c in cells]))


def probe_topk(
    spark: SparkSession,
    path: str,
    query_cells: list[tuple[int, list[int]]],
    queries: "list[tuple[int, list[float]]]",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k within each query's probed cells, over the
    pruned scan. ``query_cells`` = [(qid, [cell, ...])], ``queries`` =
    [(qid, vec)] — both driver-small (that is what makes them the probe
    side; they broadcast). The heavy side is only ever scanned, never
    shuffled with vectors: the per-query candidate set is scored in place
    and reduced to k rows before the final per-query top-k shuffle."""
    all_cells = sorted({c for _, cs in query_cells for c in cs})
    scan = read_ivf_cells(spark, path, all_cells)

    qc = spark.createDataFrame(
        [(q, c) for q, cs in query_cells for c in cs], "qid long, cell int"
    )
    qv = spark.createDataFrame(queries, "qid long, qvec array<double>")
    probe = qc.join(qv, "qid")

    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    scored = (
        scan.join(F.broadcast(probe), "cell")
        .select(
            "qid",
            "vec_id",
            (dot / (norm(F.col("vec")) * norm(F.col("qvec")))).alias("sim"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


# --------------------------------------------------------------------------
# IVF+PQ: product-quantized codes inside the cell-partitioned index
# --------------------------------------------------------------------------
#
# Measured motivation (tools/ann_rehearsal.py --pq, SCALE.md "Product
# quantization tier"): an exhaustive ADC scan ranks poorly on its own
# (recall@10 0.159 at 2M vectors) but is an excellent SHORTLIST device when
# followed by an exact rescore (0.94 with a 100x shortlist). Composing it
# with the cell-partitioned layout gives the FAISS IVF-PQ shape: the ADC
# pass scans ONLY the probed partitions and reads ONLY the codes column
# (8 bytes/vector vs the full float vector — parquet column pruning), and
# the raw vectors are fetched just for the shortlist rows in the rescore.


def pq_train_np(sample, m_sub: int, n_codes: int, iters: int = 3):
    """Per-subspace Lloyd codebooks (numpy, driver-resident by design:
    M*K*sub floats broadcast into the UDF closures). GEMM-form distances."""
    import numpy as np

    sample = sample / np.linalg.norm(sample, axis=1, keepdims=True)
    books = []
    for s in np.split(sample, m_sub, axis=1):
        c = s[:n_codes].copy()
        s2 = (s ** 2).sum(1, keepdims=True)
        for _ in range(iters):
            d = s2 + (c ** 2).sum(1)[None, :] - 2.0 * (s @ c.T)
            a = d.argmin(1)
            for j in range(n_codes):
                mem = s[a == j]
                if len(mem):
                    c[j] = mem.mean(0)
        books.append(c)
    return np.stack(books)


def _encode_codes(assigned: DataFrame, books) -> DataFrame:
    """(vec_id, cell, vec, codes[M]): nearest per-subspace code for each
    normalized vector — one Arrow-batched pass, GEMM per subspace."""
    import numpy as np
    import pandas as pd

    m_sub, _, sub = books.shape

    def fn(batches):
        for pdf in batches:
            mat = np.stack(pdf["vec"].to_numpy()).astype(np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            codes = np.empty((len(mat), m_sub), dtype=np.int32)
            for m in range(m_sub):
                s = mat[:, m * sub:(m + 1) * sub]
                c = books[m]
                d = (
                    (s ** 2).sum(1, keepdims=True)
                    + (c ** 2).sum(1)[None, :]
                    - 2.0 * (s @ c.T)
                )
                codes[:, m] = d.argmin(1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "cell": pdf["cell"],
                    "vec": pdf["vec"],
                    "codes": list(codes),
                }
            )

    return assigned.mapInPandas(
        fn, "vec_id long, cell int, vec array<float>, codes array<int>"
    )


def write_ivfpq_index(
    assigned: DataFrame,
    path: str,
    books,
    max_files_per_cell: int = 1,
    n_cells: int | None = None,
) -> None:
    """Cell-partitioned index carrying BOTH raw vectors and PQ codes.
    Parquet is columnar, so the ADC probe reading only (vec_id, codes)
    costs ~8 bytes/vector of IO; the vectors in the same files serve the
    rescore without a second dataset."""
    enc = _encode_codes(assigned, books)
    (
        _repartition_cells(enc, max_files_per_cell, n_cells=n_cells)
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(path)
    )


def probe_ivfpq_topk(
    spark: SparkSession,
    path: str,
    query_cells: list,
    queries: list,
    books,
    k: int = 10,
    refine: int = 20,
) -> DataFrame:
    """IVF-PQ probe: partition-pruned ADC scan over the codes column only
    -> per-query shortlist of k*refine -> exact cosine rescore on the raw
    vectors of just those rows -> top-k. Two passes over the probed
    partitions, the first reading 8 bytes/vector, the second pruned to the
    shortlist by a broadcast semi-join."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.window import Window

    m_sub, _, sub = books.shape
    qids = np.array([q for q, _ in queries], dtype=np.int64)
    qmat = np.stack([np.asarray(v, dtype=np.float64) for _, v in queries])
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    # per-query ADC lookup tables (nq x M x K) — KBs, closure-broadcast
    luts = np.stack(
        [
            np.stack(
                [
                    ((qv[m * sub:(m + 1) * sub][None, :] - books[m]) ** 2).sum(-1)
                    for m in range(m_sub)
                ]
            )
            for qv in qmat
        ]
    )
    cell_sets = {int(q): set(map(int, cs)) for q, cs in query_cells}
    all_cells = sorted({c for _, cs in query_cells for c in cs})

    scan = read_ivf_cells(spark, path, all_cells).select(
        "vec_id", "cell", "codes"
    )  # column pruning: the ADC pass never reads `vec`

    def adc(batches):
        ar = np.arange(m_sub)
        for pdf in batches:
            codes = np.stack(pdf["codes"].to_numpy())
            vid = pdf["vec_id"].to_numpy()
            cell = pdf["cell"].to_numpy()
            for qi, qid in enumerate(qids):
                mask = np.isin(cell, list(cell_sets[int(qid)]))
                if not mask.any():
                    continue
                d = luts[qi][ar[None, :], codes[mask]].sum(1)
                yield pd.DataFrame(
                    {"qid": int(qid), "vec_id": vid[mask], "adc": d}
                )

    scored = scan.mapInPandas(adc, "qid long, vec_id long, adc double")
    w = Window.partitionBy("qid").orderBy(F.asc("adc"), F.asc("vec_id"))
    shortlist = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k * refine)
        .select("qid", "vec_id")
    )

    # exact rescore: raw vectors only for shortlist rows (broadcast join)
    vecs = read_ivf_cells(spark, path, all_cells).select("vec_id", "vec")
    qv = spark.createDataFrame(
        [(int(q), [float(x) for x in v]) for q, v in queries],
        "qid long, qvec array<double>",
    )
    cand = vecs.join(F.broadcast(shortlist), "vec_id").join(
        F.broadcast(qv), "qid"
    )
    dot = F.aggregate(
        F.zip_with("vec", "qvec", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    rescored = cand.select(
        "qid",
        "vec_id",
        (dot / (norm(F.col("vec")) * norm(F.col("qvec")))).alias("sim"),
    )
    w2 = Window.partitionBy("qid").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        rescored.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .drop("rk")
    )


def knn_scalar_topk(
    props: DataFrame,
    k: int = 10,
    scale: int = 1_000_000,
    bucket_width: int | None = None,
    target_buckets: int = 4096,
) -> DataFrame:
    """EXACT k-nearest-neighbors over a scalar (1-D) node property — the
    ``gds.knn.stream`` surface for numeric properties (round 7), with
    GDS's scalar similarity 1/(1+|a−b|) integer-scaled to
    ``scale div (1 + |a−b|)``.

    In 1-D, exact KNN needs NO all-pairs join and NO approximation (stock
    GDS's knn samples random comparison rounds): after sorting by
    (value, id), every node's k nearest by |value diff| lie within its
    ±k POSITIONAL window — for any candidate c at positional distance
    > k, each of the ≥ k nodes strictly between (monotone values) has
    |diff| ≤ |diff(c)| and smaller positional distance, so c is beaten
    under the result order. Result order per node: (|diff| ASC,
    positional distance ASC, id2 ASC) — the positional tiebreak is what
    makes the windowed candidate set EXACT under heavy value ties
    (an id-only tiebreak could prefer an id outside the window).

    Scale shape: the global position over (value, id) is the TWO-PHASE
    prefix count (per-bucket local row_number over value-range buckets +
    a broadcast bucket-offset table, the pack_sequences pattern) — no
    single global window task; candidate generation is one
    explode(1..k) + equi-join on the integer position (|V|·k rows, the
    output order), all map-side partitionable. Returns
    (id1, id2, sim_scaled), k rows per node (fewer at the sorted
    extremes when |V| <= k).

    ``bucket_width=None`` (the default) derives the width from the
    observed value range in one bounded 1-row stats job:
    ``max(1, (mx − mn + 1) div target_buckets)``, anchored at mn — so
    the offsets table is ≤ target_buckets + 1 rows BY CONSTRUCTION
    regardless of the value domain (ADVICE r7: a fixed width of 1024
    made the bucket count approach |V| on sparse/wide domains like
    epoch-millis — blowing the F.broadcast — and collapse to ONE bucket,
    i.e. the single global window task this function exists to avoid, on
    narrow domains like value % 97). Residual bound, inherent to any
    value-range bucketing: rows with EQUAL values must share a bucket
    when width = 1, so the largest per-bucket window partition is
    O(max tie multiplicity + width·density) — ties serialize, distinct
    values spread.
    """
    from pyspark.sql.window import Window

    if k < 1:
        # F.sequence(1, 0) DESCENDS to [1, 0]: delta 0 would pair every
        # node with itself — fail fast instead
        raise ValueError("k must be >= 1")
    p = props.select(
        F.col("id").cast("string").alias("id"),
        F.col("value").cast("long").alias("value"),
    )
    anchor = 0
    if bucket_width is None:
        if target_buckets < 1:
            raise ValueError("target_buckets must be >= 1")
        rng = p.agg(F.min("value"), F.max("value")).first()
        mn, mx = rng[0], rng[1]
        if mn is None:  # empty input: any width works
            bucket_width = 1
        else:
            anchor = int(mn)
            bucket_width = max(1, (int(mx) - anchor + 1) // target_buckets)
    p = p.withColumn(
        "bucket",
        F.floor((F.col("value") - F.lit(anchor)) / F.lit(bucket_width)),
    )
    wloc = Window.partitionBy("bucket").orderBy("value", "id")
    local = p.withColumn("lpos", F.row_number().over(wloc).cast("long"))
    woff = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        p.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("bn"))
        .withColumn("boff", F.coalesce(F.sum("bn").over(woff), F.lit(0)))
        .select("bucket", "boff")
    )
    pos = local.join(F.broadcast(offsets), "bucket").select(
        "id", "value", (F.col("lpos") + F.col("boff")).alias("pos")
    )
    pos = pos.localCheckpoint()  # reused on both sides of the self-join
    above = pos.withColumn(
        "delta", F.explode(F.sequence(F.lit(1), F.lit(k)))
    ).withColumn("cpos", F.col("pos") + F.col("delta"))
    # qualified aliases: a bare F.col on the re-used `pos` lineage is
    # ambiguous in the self-join and can silently resolve to the left side
    right = pos.select(
        F.col("id").alias("id2"),
        F.col("value").alias("value2"),
        F.col("pos").alias("pos2"),
    )
    cand_up = above.join(
        right, F.col("cpos") == F.col("pos2")
    ).select(
        F.col("id").alias("id1"), "value", "id2", "value2",
        F.col("delta").alias("posdist"),
    )
    pairs = cand_up.unionByName(
        cand_up.select(
            F.col("id2").alias("id1"),
            F.col("value2").alias("value"),
            F.col("id1").alias("id2"),
            F.col("value").alias("value2"),
            "posdist",
        )
    )
    diff = F.abs(F.col("value") - F.col("value2"))
    wrank = Window.partitionBy("id1").orderBy(
        diff.asc(), F.col("posdist").asc(), F.col("id2").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(wrank))
        .filter(F.col("rn") <= k)
        .select(
            "id1",
            "id2",
            F.expr(f"{scale}L div (1 + abs(value - value2))").alias(
                "sim_scaled"
            ),
        )
    )


# JVM explode-join signature cost is O(|V| x dim x bands x planes) rows
# through a groupBy — fine at oracle scale, the wrong shape past ~1e9
# (measured motivation: 2M x 32d x 128 hyperplanes = 8.2G rows); above
# this the "auto" signature switches to the Arrow GEMM kernel, which
# derives the SAME md5 hyperplanes in numpy (exact int64 matmul -> sign
# bits), so the buckets — and therefore candidates and results — are
# identical.
KNNVEC_SIGNATURE_JVM_MAX_ROWS = 1_000_000_000


def _knnvec_md5_coefs(bands: int, planes: int, ndims: int):
    """The ±1 hyperplane matrix (bands·planes × ndims) from
    md5(h||'-'||d) — byte-identical to the explode-join derivation (and
    the DuckDB oracle's)."""
    import hashlib

    import numpy as np

    n_h = bands * planes
    C = np.empty((n_h, ndims), dtype=np.int64)
    for h in range(n_h):
        for d in range(ndims):
            first = hashlib.md5(f"{h}-{d}".encode()).hexdigest()[0]
            C[h, d] = -1 if first in "89abcdef" else 1
    return C


def _knnvec_signature_kernel(coefs, bands: int, planes: int):
    """mapInPandas signature kernel: one int64 GEMM per Arrow batch,
    sign bits packed per band into a bucket key. The packed-int bucket
    is 1:1 with the JVM path's bit string (bit j of band b = sign of
    hyperplane h = b·planes + j), so the same-bucket equivalence classes
    — and every downstream candidate pair — are identical."""
    import numpy as np
    import pandas as pd

    def fn(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.stack(pdf["vec"].to_numpy()).astype(np.int64)
            S = M @ coefs.T  # exact: int64 entries well under 2^63
            bits = (S >= 0).astype(np.int64)
            out_id, out_band, out_bucket = [], [], []
            ids = pdf["id"].to_numpy()
            for b in range(bands):
                blk = bits[:, b * planes:(b + 1) * planes]
                key = np.zeros(len(pdf), dtype=np.int64)
                for j in range(planes):
                    key |= blk[:, j] << j
                out_id.append(ids)
                out_band.append(np.full(len(pdf), b, dtype=np.int64))
                out_bucket.append(key)
            yield pd.DataFrame(
                {
                    "id": np.concatenate(out_id),
                    "band": np.concatenate(out_band),
                    "bucket": np.concatenate(out_bucket).astype("str"),
                }
            )

    return fn


def knn_vector_topk(
    props: DataFrame,
    k: int = 10,
    planes: int = 4,
    bands: int = 8,
    signature: str = "auto",
) -> DataFrame:
    """APPROXIMATE k-nearest-neighbors over an integer VECTOR property —
    the multi-property ``gds.knn.stream`` surface (round 9, VERDICT r8
    "What's missing" #3): stock GDS's knn is itself approximate
    (sampled comparison rounds), and this is the engine's bucketed
    analog wired behind the same proc.

    Input ``(id, vec array<long>)`` — callers quantize floats to exact
    integer micro-units (the knn_cosine_bruteforce convention) so dot
    products and norms are exact longs and the cosine
    ``dot / sqrt(na · nb)`` is ONE IEEE double division+sqrt of exact
    operands, hash-identical cross-engine ON A FIXED CANDIDATE SET.
    The candidate set IS fixed and oracle-replicable: BANDED sign-LSH —
    ``bands`` independent hash tables of ``planes`` deterministic ±1
    hyperplanes each, derived from ``md5(h||'-'||dim)`` with the global
    plane index h (the ann_lsh_buckets convention — no RNG, both
    engines derive identical planes); candidates = pairs sharing ANY
    band's bucket, deduplicated before exact scoring (the MinHash
    banding shape applied to cosine). So unlike stock's sampled rounds
    the approximation is deterministic and the whole result
    value-oracles exactly; RECALL vs brute force is measured, not
    asserted (recall@5 = 0.69 on the sf0.01 500×64d iid embeddings at
    the 4-plane × 8-band default, equal to the candidate set's own
    coverage because verification is exact — iid vectors are LSH's
    hardest case; more bands raise recall at band× candidate cost,
    more planes cut candidates at recall cost).

    Scale shape: the (band, bucket) key is the ONLY shuffle key of
    candidate generation — reducer work bounded by bucket_size² per
    band; the pair dedup is a high-cardinality groupBy (combiner
    -reduced); the per-pair dot is a JVM zip_with/aggregate over the
    two array columns, no dimension explosion in the pair join.
    Zero-norm vectors are excluded (cosine undefined). Returns
    (id1, id2, similarity double), ≤ k rows per node ordered by
    (similarity desc, id2) — nodes sharing no bucket with anyone are
    absent, the documented recall trade."""
    from pyspark.sql.window import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if planes < 1 or planes > 64:
        raise ValueError("planes must be 1..64")
    if bands < 1 or bands > 64:
        raise ValueError("bands must be 1..64")
    if signature not in ("auto", "jvm", "kernel"):
        raise ValueError(
            f"signature must be 'auto', 'jvm' or 'kernel'; got {signature!r}"
        )
    spark = props.sparkSession
    v = props.select(
        F.col("id").cast("string").alias("id"), F.col("vec")
    ).localCheckpoint()
    ndims = v.agg(F.max(F.size("vec"))).first()[0]
    if ndims is None:
        return v.select(
            F.col("id").alias("id1"),
            F.col("id").alias("id2"),
            F.lit(0.0).alias("similarity"),
        ).limit(0)
    if signature == "auto":
        sig_rows = v.count() * ndims * bands * planes
        signature = (
            "jvm" if sig_rows <= KNNVEC_SIGNATURE_JVM_MAX_ROWS else "kernel"
        )
    if signature == "kernel":
        coefs = _knnvec_md5_coefs(bands, planes, ndims)
        buckets = v.mapInPandas(
            _knnvec_signature_kernel(coefs, bands, planes),
            "id string, band long, bucket string",
        )
    else:
        elems = v.select("id", F.posexplode("vec").alias("d", "qe"))
        hi = ("8", "9", "a", "b", "c", "d", "e", "f")
        pl = (
            spark.range(bands * planes)
            .select(F.col("id").alias("h"))
            .crossJoin(spark.range(ndims).select(F.col("id").alias("d")))
            .select(
                "h",
                "d",
                F.when(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.col("h").cast("string"),
                                F.lit("-"),
                                F.col("d").cast("string"),
                            )
                        ),
                        1,
                        1,
                    ).isin(*hi),
                    -1,
                )
                .otherwise(1)
                .cast("long")
                .alias("coef"),
            )
        )
        sums = (
            elems.join(F.broadcast(pl), "d")
            .groupBy("id", "h")
            .agg(F.sum(F.col("qe") * F.col("coef")).alias("s"))
            .withColumn("bit", F.when(F.col("s") >= 0, "1").otherwise("0"))
            .withColumn("band", F.floor(F.col("h") / F.lit(planes)))
        )
        buckets = sums.groupBy("id", "band").agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("h", "bit"))),
                    lambda x: x["bit"],
                ),
                "",
            ).alias("bucket")
        )
    cand = (
        buckets.select(F.col("id").alias("id1"), "band", "bucket")
        .join(
            buckets.select(F.col("id").alias("id2"), "band", "bucket"),
            ["band", "bucket"],
        )
        .filter(F.col("id1") != F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )
    zero = F.lit(0).cast("long")
    norm = F.aggregate(
        "vec", zero, lambda acc, x: acc + x * x
    ).alias("n2")
    feat = (
        v.select("id", "vec", norm)
        .filter(F.col("n2") > 0)
        .localCheckpoint()
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y),
        zero,
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(
            feat.select(
                F.col("id").alias("id1"),
                F.col("vec").alias("va"),
                F.col("n2").alias("na"),
            ),
            "id1",
        )
        .join(
            feat.select(
                F.col("id").alias("id2"),
                F.col("vec").alias("vb"),
                F.col("n2").alias("nb"),
            ),
            "id2",
        )
        .select(
            "id1",
            "id2",
            (
                dot.cast("double")
                / F.sqrt((F.col("na") * F.col("nb")).cast("double"))
            ).alias("similarity"),
        )
    )
    w = Window.partitionBy("id1").orderBy(
        F.col("similarity").desc(), F.col("id2")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("id1", "id2", "similarity")
    )
