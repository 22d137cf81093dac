"""Regenerate COVERAGE.md's table + footer from plans.suite.survey_coverage().

The prose header (everything above the table) is kept verbatim; the
`| §2 row | covered by |` table and the `Total suite queries:` footer are
rewritten from the live suite, so the file can never drift from the code
(tests/test_oracle_suite.py::test_coverage_md_matches_suite enforces it).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from phageclouds_graphdatabase_spark.plans.suite import (  # noqa: E402
    SUITE,
    survey_coverage,
)

COVERAGE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "COVERAGE.md"
)


def render_table() -> str:
    lines = ["| §2 row | covered by |", "|---|---|"]
    for row, names in survey_coverage().items():
        lines.append(f"| {row} | {', '.join(sorted(names))} |")
    n = len(SUITE)
    n_oracled = sum(1 for e in SUITE.values() if e.oracle is not None)
    lines.append("")
    lines.append(
        f"Total suite queries: {n} ({n_oracled} value-oracled, "
        f"{n - n_oracled} rows-only by declared design)"
    )
    return "\n".join(lines) + "\n"


def main() -> None:
    with open(COVERAGE_PATH) as f:
        text = f.read()
    head = text[: text.index("| §2 row | covered by |")]
    with open(COVERAGE_PATH, "w") as f:
        f.write(head + render_table())
    print(f"wrote {COVERAGE_PATH}: {len(SUITE)} suite queries")


if __name__ == "__main__":
    main()
