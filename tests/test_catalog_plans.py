"""Plan-level assertions for the query catalog: the physical plans the
engine promises at 100 TB — dims broadcast, range predicates pushed into
the parquet scan, scans pruned to the referenced columns — must actually
appear, not just be claimed in docstrings."""

from __future__ import annotations

from logistics_data_pipeline_project_spark.queries import REGISTRY


def _explain(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_q02_broadcasts_supplier_dim(spark, sf_dir):
    plan = _explain(REGISTRY["q02_supplier_return_performance"].fn(spark, sf_dir))
    assert "BroadcastHashJoin" in plan, "fact⋈dim must be a broadcast join"
    assert "SortMergeJoin" not in plan


def test_q18_pushes_watermark_into_scan(spark, sf_dir):
    plan = _explain(REGISTRY["q18_incremental_event_load"].fn(spark, sf_dir))
    pushed = [
        line for line in plan.splitlines() if "PushedFilters" in line
    ]
    assert pushed, "expected a parquet scan with PushedFilters"
    # the incremental watermark must be a pushed range predicate on the
    # raw ns column, not a post-scan filter on a derived timestamp
    assert any("GreaterThanOrEqual(ts" in line for line in pushed), pushed


def test_q21_scan_prunes_to_referenced_columns(spark, sf_dir):
    plan = _explain(REGISTRY["q21_dedup_exact"].fn(spark, sf_dir))
    schema_lines = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schema_lines
    line = schema_lines[0]
    assert "text" in line and "doc_id" in line
    # untouched columns must not be read
    for unused in ("lang", "source", "n_chars"):
        assert unused not in line, f"column {unused} should be pruned: {line}"
