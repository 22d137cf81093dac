#!/usr/bin/env python
"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() twin on DuckDB at sf0.01, compare
row-count + schema (column names) + order-insensitive value hash.

Usage: python tools/verify_local.py [--sf-dir DIR] [--only name1,name2] [-v]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import math
import os
import sys
import time
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _norm_cell(v):
    """Normalize a cell to a hash-stable string."""
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision -- we target bit-exact equality
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.strftime("%Y-%m-%d") + " 00:00:00.000000"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None)
    ap.add_argument("-v", "--verbose", action="store_true")
    args = ap.parse_args()

    import __spark_entry__ as se
    from phageclouds_graphdatabase_spark.session import get_spark

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(args.sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = se.queries()
    oracles = se.oracle_sql()
    only = set(args.only.split(",")) if args.only else None

    results = {}
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        status, detail = "PASS", ""
        try:
            sdf = fn(spark, args.sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:  # noqa: BLE001
            status, detail = "SPARK_ERROR", f"{type(ex).__name__}: {ex}"
            s_cols, s_rows = [], []
        if name not in oracles:
            if status == "PASS":
                status, detail = "ROWS_ONLY", f"{len(s_rows)} rows (no oracle)"
            results[name] = (status, detail, time.time() - t0)
            print(f"  {status:<12} {name:<32} {detail}")
            continue
        if status == "PASS":
            try:
                cur = con.execute(oracles[name])
                d_cols = [c[0] for c in cur.description]
                d_rows = cur.fetchall()
            except Exception as ex:  # noqa: BLE001
                status, detail = "ORACLE_ERROR", f"{type(ex).__name__}: {ex}"
                d_cols, d_rows = [], []
        if status == "PASS":
            problems = []
            if sorted(s_cols) != sorted(d_cols):
                problems.append(f"schema: spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
            if len(s_rows) != len(d_rows):
                problems.append(f"rowcount: spark={len(s_rows)} duckdb={len(d_rows)}")
            if not problems:
                sh = value_hash(s_cols, s_rows)
                dh = value_hash(d_cols, d_rows)
                if sh != dh:
                    problems.append("value-hash mismatch")
                    if args.verbose:
                        order_s = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                        order_d = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                        ls = sorted("\x1f".join(_norm_cell(r[i]) for i in order_s) for r in s_rows)
                        ld = sorted("\x1f".join(_norm_cell(r[i]) for i in order_d) for r in d_rows)
                        for a, b in zip(ls, ld):
                            if a != b:
                                problems.append(f"  first diff:\n   spark : {a[:400]}\n   duckdb: {b[:400]}")
                                break
            if problems:
                status, detail = "FAIL", "; ".join(problems)
            else:
                detail = f"{len(s_rows)} rows"
        if status in ("PASS", "ROWS_ONLY"):
            n_pass += 1
        else:
            n_fail += 1
        results[name] = (status, detail, time.time() - t0)
        print(f"  {status:<12} {name:<32} {detail}  [{results[name][2]:.1f}s]")

    print(f"\n{n_pass} pass / {n_fail} fail")
    with open("VERIFY_LOCAL.json", "w") as f:
        json.dump({k: {"status": v[0], "detail": v[1], "sec": round(v[2], 2)} for k, v in results.items()}, f, indent=1)
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
