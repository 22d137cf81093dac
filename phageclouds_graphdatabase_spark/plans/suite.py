"""The full oracle-checked query suite: one entry per implemented operator
row of SURVEY.md §2 (relational + graph + LLM-pipeline extensions).

``__spark_entry__.py`` exposes this to the driver; tests/test_oracle_suite.py
and tools/verify_local.py run the same comparison locally.
"""

from __future__ import annotations

from phageclouds_graphdatabase_spark.plans import (
    suite_cypher,
    suite_extensions,
    suite_pipeline,
    suite_relational,
    suite_training,
)
from phageclouds_graphdatabase_spark.plans._suite_helpers import SuiteEntry

SUITE: dict[str, SuiteEntry] = {
    **suite_relational.ENTRIES,
    **suite_extensions.ENTRIES,
    **suite_pipeline.ENTRIES,
    **suite_training.ENTRIES,
    **suite_cypher.ENTRIES,
}


def survey_coverage() -> dict[str, list[str]]:
    """SURVEY.md §2 row -> queries covering it (judge cross-check aid)."""
    cov: dict[str, list[str]] = {}
    for name, entry in SUITE.items():
        for row in entry.survey_rows:
            cov.setdefault(row, []).append(name)
    return dict(sorted(cov.items()))
