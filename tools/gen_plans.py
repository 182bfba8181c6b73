#!/usr/bin/env python
"""Regenerate PLANS.md — the physical-plan audit across the query catalog.

For every registered query, builds the DataFrame at sf0.001 and counts
plan features off `explain("formatted")` output: shuffle boundaries
(Exchange), join strategies, and parquet scans with non-empty
PushedFilters. Run from the repo root:  python tools/gen_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from logistics_data_pipeline_project_spark.queries import REGISTRY  # noqa: E402
from logistics_data_pipeline_project_spark.session import get_spark  # noqa: E402

HEADER = """# PLANS — physical-plan audit of the query catalog

Generated at sf0.001 (plan shape is SF-independent; AQE runtime
re-planning only improves on these static counts — broadcast promotion,
partition coalescing, skew splits). Columns: exchanges = shuffle
boundaries; bhj = broadcast hash joins; smj/shj = sort-merge /
shuffled-hash joins; pushed = parquet scans carrying a non-empty
PushedFilters. The summary the table backs up: dim joins are broadcast
(the rare SortMergeJoins are genuine fact-to-fact joins), selective
scans carry pushdown, and exchange counts match the shuffle budget each
query's docstring claims. tests/test_catalog_plans.py pins the
load-bearing shapes; this file is the full inventory.

| query | exchanges | bhj | smj | shj | pushed |
|---|---|---|---|---|---|
"""


def audit(plan: str) -> tuple[int, int, int, int, int]:
    # simple-mode tree: one line per operator; "Exchange" also counts
    # BroadcastExchange (any cross-partition data movement)
    exchanges = plan.count("Exchange")
    bhj = plan.count("BroadcastHashJoin")
    smj = plan.count("SortMergeJoin")
    shj = plan.count("ShuffledHashJoin")
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    return exchanges, bhj, smj, shj, pushed


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_PLANS_SF_DIR", "/root/testdata/sf0.001")
    spark = get_spark(app_name="ldp-spark-plans")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "simple"
        )
        e, b, s, h, p = audit(plan)
        rows.append(f"| {name} | {e} | {b} | {s} | {h} | {p} |")
        print(rows[-1], file=sys.stderr)
    out = HEADER + "\n".join(rows) + "\n"
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write(out)


if __name__ == "__main__":
    main()
