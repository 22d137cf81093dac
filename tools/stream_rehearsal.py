"""Scale rehearsal for the Structured Streaming surface (W3): measures
sustained THROUGHPUT (events/sec) of the production streaming shapes over a
synthetic micro-batched event stream, with a batch-parity check per path —
a stream that is fast but emits the wrong rows is not done.

Stream (fully distributed generation — `spark.range` + hash expressions, no
driver-side data): `n_events` events across `users` users, timestamps
advancing at a constant `events_per_min` arrival rate (so watermark state
is bounded by the interval + late horizon at ANY n — the property the
rehearsal exists to demonstrate: state size must track the WINDOW, not the
stream length). Written as `shards` parquet files and replayed with
maxFilesPerTrigger so the run exercises real micro-batch scheduling, state
store commits, and watermark advancement — not a single mega-batch.

Measured paths (the shapes from streaming/events.py, at rehearsal scale):
- tumbling 10-min window counts (append + watermark)
- dropDuplicatesWithinWatermark (10% planted duplicate event_ids)
- stream-stream interval join (purchases x preceding clicks)
- CHAINED join -> tumbling window (two stateful operators, SPARK-42376)

Each path's emitted rows are checked against the batch equivalent
(restricted to watermark-finalized rows where append semantics hold rows
back) — parity failures abort the rehearsal.

Run: python tools/stream_rehearsal.py --events 10000000
Prints one JSON line; record the row in SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from phageclouds_graphdatabase_spark.session import get_spark  # noqa: E402
from phageclouds_graphdatabase_spark.streaming import events as stream  # noqa: E402


def gen_events(spark, n: int, users: int, events_per_min: int) -> DataFrame:
    """(event_id, ts, user_id, event_type, value, props) — 10% of rows
    repeat an earlier event_id (the planted duplicates for the dedup path);
    type split ~ 60% click / 20% purchase / 20% view."""
    base = F.to_timestamp(F.lit("2024-01-01 00:00:00"))
    # dups repeat an event_id from the last ~5 simulated minutes: within the
    # 10-minute dedup watermark, so dropDuplicatesWithinWatermark's bounded
    # state still guarantees exact dedup (the semantics it is FOR:
    # retries/replays arrive close together, not arbitrarily late)
    recent = max(events_per_min * 5, 1)
    return spark.range(n).select(
        F.when(
            F.pmod(F.xxhash64("id", F.lit("dup")), F.lit(10)) == 0,
            F.greatest(
                F.col("id")
                - 1
                - F.pmod(F.xxhash64("id", F.lit("pick")), F.lit(recent)),
                F.lit(0),
            ),
        )
        .otherwise(F.col("id"))
        .alias("event_id"),
        (base + F.make_interval(secs=F.col("id") * F.lit(60.0 / events_per_min))).alias(
            "ts"
        ),
        F.pmod(F.xxhash64("id", F.lit("u")), F.lit(users)).alias("user_id"),
        F.element_at(
            F.array(F.lit("click"), F.lit("click"), F.lit("click"),
                    F.lit("purchase"), F.lit("view")),
            (F.pmod(F.xxhash64("id", F.lit("t")), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(10000)).cast("double") / 100.0).alias(
            "value"
        ),
        # real JSON payload so the VARIANT path decodes actual structure
        F.concat(
            F.lit('{"k": '),
            F.pmod(F.xxhash64("id", F.lit("k")), F.lit(100)).cast("string"),
            F.lit("}"),
        ).alias("props"),
    )


def _read(spark, src: str, files_per_trigger: int) -> DataFrame:
    return (
        spark.readStream.schema(stream.EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src)
    )


def run_counting(stream_df: DataFrame) -> int:
    """Drain an availableNow query through a foreachBatch counting sink —
    rows are counted executor-side, never collected (the memory sink would
    pull millions of rows into the driver at rehearsal scale)."""
    total = {"n": 0}

    def fb(df: DataFrame, _bid: int) -> None:
        total["n"] += df.count()

    q = (
        stream_df.writeStream.foreachBatch(fb)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    return total["n"]


def _timed(label: str, n: int, fn) -> tuple[float, int]:
    t0 = time.time()
    rows = fn()
    dt = time.time() - t0
    print(
        f"  {label:28s} {dt:8.1f}s  {n / dt / 1e6:6.2f}M ev/s  "
        f"-> {rows} rows",
        flush=True,
    )
    return round(dt, 1), rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=10_000_000)
    ap.add_argument("--users", type=int, default=0, help="0 = events/200")
    ap.add_argument("--events-per-min", type=int, default=0, help="0 = events/1000 (keeps ~1000 min span)")
    ap.add_argument("--shards", type=int, default=40)
    ap.add_argument("--batches", type=int, default=10)
    args = ap.parse_args()
    n = args.events
    users = args.users or max(n // 200, 10)
    epm = args.events_per_min or max(n // 1000, 60)
    spark = get_spark(app_name="stream-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="stream_rehearsal_")
    src = os.path.join(tmp, "events")
    out: dict = {
        "metric": "stream_rehearsal",
        "events": n,
        "users": users,
        "events_per_min": epm,
        "shards": args.shards,
    }
    try:
        t0 = time.time()
        # time-range sharding: file-source batches then replay in event-time
        # order (part-00000 = earliest range), so the watermark advances
        # progressively as it would against a live source
        gen_events(spark, n, users, epm).repartitionByRange(
            args.shards, "ts"
        ).write.parquet(src)
        # FileStreamSource replays files ordered by MODIFICATION TIME, and a
        # bulk write stamps them all identically — which replays shards in
        # arbitrary order, slams the watermark to its final value in an
        # early batch, and drops everything else as late (observed: 69 of
        # 294 windows emitted). Stamp strictly increasing mtimes over the
        # range-sorted part files so replay follows event time, as a live
        # source would.
        parts = sorted(
            f for f in os.listdir(src)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        now = time.time()
        for i, f in enumerate(parts):
            os.utime(os.path.join(src, f), (now + i, now + i))
        out["gen_sec"] = round(time.time() - t0, 1)
        e = spark.read.parquet(src)
        e.cache().count()
        fpt = max(args.shards // args.batches, 1)

        # -- tumbling windows ------------------------------------------------
        dt, rows = _timed(
            "tumbling_windows", n,
            lambda: run_counting(
                stream.tumbling_counts(_read(spark, src, fpt))
            ),
        )
        out["tumbling_sec"], out["tumbling_rows"] = dt, rows
        mx = e.agg(F.max("ts")).collect()[0][0]
        want = (
            e.groupBy(F.window("ts", "10 minutes").alias("win"), "event_type")
            .count()
            .filter(
                F.col("win.end")
                <= F.lit(mx) - F.expr("INTERVAL 10 MINUTES")
            )
            .count()
        )
        assert rows == want, f"tumbling parity: {rows} != {want}"

        # -- VARIANT decode inside a windowed agg -----------------------------
        dt, rows = _timed(
            "variant_window_agg", n,
            lambda: run_counting(
                stream.variant_type_stats(_read(spark, src, fpt))
            ),
        )
        out["variant_sec"], out["variant_rows"] = dt, rows
        want = (
            e.groupBy(F.window("ts", "30 minutes").alias("win"), "event_type")
            .count()
            .filter(
                F.col("win.end")
                <= F.lit(mx) - F.expr("INTERVAL 10 MINUTES")
            )
            .count()
        )
        assert rows == want, f"variant parity: {rows} != {want}"

        # -- watermark dedup -------------------------------------------------
        dt, rows = _timed(
            "dedup_within_watermark", n,
            lambda: run_counting(
                stream.stream_dedup_within_watermark(
                    _read(spark, src, fpt)
                ).select("event_id")
            ),
        )
        out["dedup_sec"], out["dedup_rows"] = dt, rows
        want = e.select("event_id").distinct().count()
        assert rows == want, f"dedup parity: {rows} != {want}"

        # -- stream-stream interval join ------------------------------------
        dt, rows = _timed(
            "stream_stream_join", n,
            lambda: run_counting(
                stream.purchase_click_pairs(
                    _read(spark, src, fpt), _read(spark, src, fpt)
                )
            ),
        )
        out["join_sec"], out["join_rows"] = dt, rows
        p = e.filter(F.col("event_type") == "purchase").alias("p")
        c = e.filter(F.col("event_type") == "click").alias("c")
        want = (
            p.join(
                c,
                (F.col("p.user_id") == F.col("c.user_id"))
                & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 10 MINUTES"))
                & (F.col("c.ts") <= F.col("p.ts")),
            )
        ).count()
        assert rows == want, f"join parity: {rows} != {want}"

        # -- chained join -> window (two stateful operators) -----------------
        dt, rows = _timed(
            "chained_join_window", n,
            lambda: run_counting(
                stream.purchase_click_window_counts(
                    _read(spark, src, fpt), _read(spark, src, fpt)
                )
            ),
        )
        out["chained_sec"], out["chained_rows"] = dt, rows
        import datetime

        wm = min(
            p.agg(F.max("ts")).collect()[0][0],
            c.agg(F.max("ts")).collect()[0][0],
        ) - datetime.timedelta(minutes=10)

        def chained_want(cutoff):
            return (
                p.join(
                    c,
                    (F.col("p.user_id") == F.col("c.user_id"))
                    & (F.col("c.ts") >= F.col("p.ts") - F.expr("INTERVAL 10 MINUTES"))
                    & (F.col("c.ts") <= F.col("p.ts")),
                )
                .groupBy(
                    F.window(F.col("p.ts"), "10 minutes").alias("win"),
                    F.col("p.user_id"),
                )
                .count()
                .filter(
                    F.col("win.start") + F.expr("INTERVAL 10 MINUTES")
                    <= F.lit(cutoff)
                )
                .count()
            )

        # With two chained stateful operators over a MULTI-batch replay, the
        # downstream aggregation observes the watermark one micro-batch late
        # (the join must emit before the agg can finalize; AvailableNow runs
        # finitely many cleanup batches). Emitted rows therefore land
        # between "finalized by the final watermark minus one batch's event
        # span" and "finalized by the final watermark". The EXACT
        # final-watermark semantics for the single-batch case are pinned by
        # the oracle entry stream_join_then_window.
        want_hi = chained_want(wm)
        span_min = (n / epm) / args.batches
        want_lo = chained_want(wm - datetime.timedelta(minutes=span_min))
        assert want_lo <= rows <= want_hi, (
            f"chained parity: {rows} outside [{want_lo}, {want_hi}]"
        )
        out["chained_want_lo"], out["chained_want_hi"] = want_lo, want_hi
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
