"""Valid/error row router — SURVEY §P9.

The reference routes invalid rows to sibling error tables with an
ERROR_REASON column (dbt/.../models/silver/silver_error_*.sql;
dags/snowflake-EDW-ETL-dag.py:98-145; dags/snowspark-dataframe-ETL.py:64-76).

Spark-first: derive the reason ONCE with a first-match `when()` chain, then
split by `reason IS NULL`. Both branches share the same scan (Catalyst
pushes the common subplan into one parquet read; cache() optional when both
branches are materialized in the same job).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REASON_COL = "ERROR_REASON"


def error_reason(rules: Sequence[tuple[str, Column]]) -> Column:
    """First-match CASE chain: rules are (reason, is_violated_predicate)."""
    expr = F.lit(None).cast("string")
    chain = None
    for reason, violated in rules:
        step = F.when(violated, F.lit(reason))
        chain = step if chain is None else chain.when(violated, F.lit(reason))
    return chain.otherwise(expr) if chain is not None else expr


def validity_router(
    df: DataFrame, rules: Sequence[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """Split ``df`` into (valid, errors-with-ERROR_REASON).

    ``rules``: ordered (reason_label, violation_predicate) pairs; the first
    violated rule wins, mirroring the reference's CASE ordering
    (dags/snowflake-EDW-ETL-dag.py:128-136).
    """
    tagged = df.withColumn(REASON_COL, error_reason(rules))
    valid = tagged.filter(F.col(REASON_COL).isNull()).drop(REASON_COL)
    errors = tagged.filter(F.col(REASON_COL).isNotNull())
    return valid, errors
