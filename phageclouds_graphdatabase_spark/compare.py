"""Cross-engine result comparison: the order-insensitive value-hash contract
used by the driver's correctness gate (row-count + schema + value hash; see
BASELINE.md "engine gates"). Shared by tools/verify_local.py and the pytest
suite so local green means driver green."""

from __future__ import annotations

import hashlib
import math
from datetime import date, datetime
from decimal import Decimal


def norm_cell(v) -> str:
    """Normalize a cell to a hash-stable string (bit-exact for floats)."""
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
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def norm_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Rows as sorted, column-name-ordered strings (for diffing failures)."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted("\x1f".join(norm_cell(r[i]) for i in order) for r in rows)


def value_hash(columns: list[str], rows: list[tuple]) -> str:
    h = hashlib.sha256()
    for line in norm_rows(columns, rows):
        h.update(line.encode("utf-8"))
        h.update(b"\n")
    return h.hexdigest()


def compare_results(
    s_cols: list[str],
    s_rows: list[tuple],
    d_cols: list[str],
    d_rows: list[tuple],
    max_diffs: int = 3,
) -> list[str]:
    """Driver-contract comparison; returns a list of problems (empty = match)."""
    problems: list[str] = []
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"schema: spark={sorted(s_cols)} oracle={sorted(d_cols)}")
    if len(s_rows) != len(d_rows):
        problems.append(f"rowcount: spark={len(s_rows)} oracle={len(d_rows)}")
    if problems:
        return problems
    ls, ld = norm_rows(s_cols, s_rows), norm_rows(d_cols, d_rows)
    if ls != ld:
        problems.append("value-hash mismatch")
        shown = 0
        for a, b in zip(ls, ld):
            if a != b:
                problems.append(f"spark : {a[:300]}\noracle: {b[:300]}")
                shown += 1
                if shown >= max_diffs:
                    break
    return problems
