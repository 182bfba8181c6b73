"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in
``logistics_data_pipeline_project_spark.queries`` — every entry declares
its Spark implementation and DuckDB oracle side by side (registry.py
documents the cross-engine determinism policy that makes hashes match).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from logistics_data_pipeline_project_spark.queries import REGISTRY
from logistics_data_pipeline_project_spark.session import tune_session


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (supplier return performance — the reference's
    seller_rto_performance gold view) on /root/testdata/sf0.001."""
    tune_session(spark)
    return REGISTRY["q002_supplier_return_performance"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(name):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return REGISTRY[name].fn(spark, sf_dir)

        run.__name__ = name
        return run

    return {name: wrap(name) for name in sorted(REGISTRY)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return {
        name: spec.oracle for name, spec in sorted(REGISTRY.items()) if spec.oracle
    }
