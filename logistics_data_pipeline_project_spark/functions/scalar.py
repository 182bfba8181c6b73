"""Scalar expression helpers (SURVEY §2.8, §2.11/U3).

The reference's dbt macros (`calculate_delay_percentage`,
`shipment_metrics` — dbt/dbt-project/macros/metrics.sql:1-2,
shipment_metrics.sql:2-10) become plain Python functions returning Columns;
Snowflake's lenient casts (`TRY_CAST`, `TRY_TO_TIMESTAMP_NTZ` —
dags/snowflake-EDW-ETL-dag.py:75-83, dags/2_logistics-shipment-dag.py:108)
map to Spark's `try_cast`/`try_to_timestamp`.

Determinism note (engine-wide policy): monetary/metric aggregates are summed
as DECIMAL (exact, order-independent — safe under any shuffle/AQE plan) and
only converted to DOUBLE at the end. Floating-point sums of DOUBLE columns
are order-dependent across partitionings, which would make results depend on
the physical plan — unacceptable for an engine whose results are diffed
against an oracle and whose plans change under AQE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast to exact decimal before aggregation (order-independent sums)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def exact_sum(col: Column | str, alias: str, scale: int = 2) -> Column:
    """SUM as exact decimal, rounded and returned as DOUBLE."""
    return F.round(F.sum(dec(col, 18, scale)), scale).cast("double").alias(alias)


def exact_avg(col: Column | str, alias: str, round_to: int = 2, scale: int = 2) -> Column:
    """AVG = exact decimal SUM / COUNT, divided in double space, rounded.

    Both this engine and the DuckDB oracle compute the identical double
    division, so results are bit-stable across engines and plans.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.sum(dec(c, 18, scale)).cast("double") / F.count(c), round_to
    ).cast("double").alias(alias)


def pct(num: Column, den: Column, round_to: int = 2) -> Column:
    """`ROUND(100.0 * num / den, 2)` ratio metric (SURVEY §A5)."""
    return F.round(F.lit(100.0) * num / den, round_to).cast("double")


def delay_percentage(flag_col: Column | str, round_to: int = 2) -> Column:
    """Port of macro calculate_delay_percentage (dbt/.../macros/metrics.sql:1-2):
    `ROUND(100.0 * SUM(CASE WHEN flag THEN 1 ELSE 0 END) / COUNT(*), 2)`."""
    c = F.col(flag_col) if isinstance(flag_col, str) else flag_col
    return pct(F.sum(F.when(c, 1).otherwise(0)), F.count(F.lit(1)), round_to)


def try_cast(col: Column | str, to_type: str) -> Column:
    """Snowflake TRY_CAST parity: NULL instead of error on bad input."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast(to_type)


def try_to_timestamp(col: Column | str, fmt: str | None = None) -> Column:
    """Snowflake TRY_TO_TIMESTAMP_NTZ parity."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c, F.lit(fmt)) if fmt else F.try_to_timestamp(c)
