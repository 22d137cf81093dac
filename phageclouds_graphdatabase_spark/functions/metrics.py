"""Zero-cost pipeline observability via Spark's Observation API.

A 100-TB pipeline cannot afford a second pass to learn what it just
processed, and driver-side `.count()` probes add whole jobs. `observe()`
attaches aggregate metrics to the EXISTING action: the expressions ride
the same physical plan (map-side partials, no extra scan, no shuffle
added) and the results surface on the driver after the action completes.
This is the engine's sanctioned way to get row counts / null rates /
value ranges out of a production write without re-reading the data.

The reference has no metrics surface (thin Neo4j client); this is
pipeline extension surface alongside dq_audit_report (which is the
query-shaped, oracle-checkable variant — use that when the metrics ARE
the output; use observe() when they ride a write).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observe_profile(
    df: DataFrame, columns: list[str] | None = None, name: str = "profile"
) -> tuple[DataFrame, Observation]:
    """Attach a standard profile to a DataFrame's next action: total rows,
    and per-column null counts plus min/max (orderable types only).

    Returns ``(df_observed, observation)``; run ONE action on the returned
    frame (e.g. your parquet write), then read ``observation.get`` — a dict
    like ``{"n_rows": ..., "nulls_x": ..., "min_x": ..., "max_x": ...}``.
    The metrics are exact and computed in the same pass as the action."""
    cols = columns if columns is not None else df.columns
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        exprs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(
                f"nulls_{c}"
            )
        )
        dt = dict(df.dtypes)[c]
        if not dt.startswith(("array", "map", "struct", "binary")):
            exprs.append(F.min(c).alias(f"min_{c}"))
            exprs.append(F.max(c).alias(f"max_{c}"))
    obs = Observation(name)
    return df.observe(obs, *exprs), obs


def assert_expectations(
    metrics: dict, expectations: dict[str, tuple]
) -> list[str]:
    """Check observed metrics against (lo, hi) bounds; returns the list of
    violation messages (empty = all good). Bounds of None are open-ended.
    Driver-side and trivially cheap — the expensive part already happened
    inside the observed action."""
    problems = []
    for key, (lo, hi) in expectations.items():
        if key not in metrics:
            problems.append(f"{key}: metric absent")
            continue
        v = metrics[key]
        if lo is not None and v < lo:
            problems.append(f"{key}={v} below {lo}")
        if hi is not None and v > hi:
            problems.append(f"{key}={v} above {hi}")
    return problems
