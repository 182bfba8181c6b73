"""Distributed exact global-order primitives: rank, NTILE, prefix scans.

A bare ``Window.orderBy(...)`` (no partitionBy) funnels EVERY row through
one partition's sort — correct, but a single-executor bottleneck the
moment the ordered domain is unbounded (customers, parts), the one plan
shape this engine bans at 100 TB. These helpers compute the identical
answers with bounded parallelism:

1. ``repartitionByRange`` on the sort key — partition i holds a
   contiguous key range, all ranges in global order, ties split by the
   caller's tiebreaker column (every order here is total, same discipline
   as the engine's window queries). Partition boundaries come from
   Spark's reservoir sampling; WHERE they land affects only balance,
   never results — ranks/prefix scans are exact for any range split.
2. a per-partition scan (local sort / local window) — parallel across
   the P ranges,
3. per-partition summaries (count / sum / max — O(P) rows) collected to
   the driver, turned into prefix OFFSETS, and broadcast-joined back.
   The collect is bounded by the partition count, never the data
   (same justification as dedup.py's gated union-find).

global rank = local position + rows in all earlier ranges; running sum =
local running sum + sum of earlier ranges; prefix max = max(local prefix
max, max of earlier ranges). NTILE is pure integer arithmetic on the
global rank (the exact SQL NTILE bucket formula), so results match a
single-partition NTILE bit-for-bit — these are drop-in de-globalizations,
certified by the unchanged DuckDB oracles of q110/q117/q126.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rk_pid"


def _ranged(df: DataFrame, order_by: Sequence[Column], num_partitions: int | None):
    """Range-partition ``df`` by the (total) sort order and tag each row
    with its range id. Range i < range j ⇒ every key in i sorts before
    every key in j, so per-range local scans compose into the global scan
    with additive offsets."""
    if num_partitions:
        d = df.repartitionByRange(num_partitions, *order_by)
    else:
        d = df.repartitionByRange(*order_by)  # spark.sql.shuffle.partitions
    return d.withColumn(_PID, F.spark_partition_id())


def _offsets(parts: DataFrame, spark, combine) -> tuple[list, object]:
    """Collect the O(P) per-range summaries and fold them into per-range
    prefix offsets (rows = [(pid, offset)]) plus the grand total."""
    rows = sorted((r[0], r[1]) for r in parts.collect())
    out, acc = [], None
    for pid, v in rows:
        out.append((pid, acc))
        acc = v if acc is None else combine(acc, v)
    return out, acc


def with_global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    out: str = "rank",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Add the exact 1-based global row number under ``order_by`` (which
    must be a TOTAL order — carry a unique tiebreaker) without a global
    sort. Returns (df + out column, total row count) — the count falls
    out of the offset pass for free, so NTILE needs no extra job."""
    spark = df.sparkSession
    d = _ranged(df, order_by, num_partitions)
    counts = d.groupBy(_PID).agg(F.count(F.lit(1)).alias("__n"))
    offs, total = _offsets(counts, spark, lambda a, b: a + b)
    off_df = spark.createDataFrame(
        [(p, o if o is not None else 0) for p, o in offs],
        f"{_PID} int, __off long",
    )
    w = Window.partitionBy(_PID).orderBy(*order_by)
    return (
        d.join(F.broadcast(off_df), _PID)
        .withColumn(out, (F.col("__off") + F.row_number().over(w)).cast("long"))
        .drop(_PID, "__off")
    ), int(total or 0)


def exact_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n_buckets: int,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(n) over a total order, no single-partition sort: the
    SQL NTILE bucket of global rank rk over n rows is pure integer math
    (first n%b buckets hold ⌈n/b⌉ rows), so the bucket comes straight off
    `with_global_rank` — bit-identical to Window NTILE, at range-partition
    parallelism."""
    ranked, n = with_global_rank(df, order_by, out="__rk", num_partitions=num_partitions)
    q, r = divmod(n, n_buckets)
    rk = F.col("__rk")
    big_span = r * (q + 1)  # rows living in the ⌈n/b⌉-sized buckets
    bucket = F.when(
        rk <= F.lit(big_span), (rk - 1) / F.lit(q + 1)
    ).otherwise(
        # q == 0 makes this branch unreachable (big_span == n); max(q,1)
        # keeps the expression total under ANSI division semantics
        F.lit(r) + (rk - F.lit(big_span) - 1) / F.lit(max(q, 1))
    )
    return ranked.withColumn(
        out, (F.floor(bucket) + F.lit(1)).cast("int")
    ).drop("__rk")


def with_running_sum(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    cum: str = "cum",
    total: str = "total",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive running sum of ``value_col`` under ``order_by``
    plus the grand total — the cumulative-share scan (ABC/Pareto, Gini)
    — without a global sort. Sums stay in the column's own type (pass
    DECIMAL for exact money); per-range subtotals collect as O(P) Python
    values (exact Decimal) and come back as literal offsets."""
    spark = df.sparkSession
    d = _ranged(df, order_by, num_partitions)
    sums = d.groupBy(_PID).agg(F.sum(value_col).alias("__s"))
    offs, grand = _offsets(sums, spark, lambda a, b: a + b)
    dtype = dict(df.dtypes)[value_col]
    off_df = spark.createDataFrame(offs, f"{_PID} int, __off string").select(
        _PID, F.col("__off").cast(dtype).alias("__off")
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.sum(value_col).over(w)
    return (
        d.join(F.broadcast(off_df), _PID)
        .withColumn(cum, F.coalesce(F.col("__off") + local, local).cast(dtype))
        .withColumn(total, F.lit(str(grand)).cast(dtype))
        .drop(_PID, "__off")
    )


def with_prefix_max(
    df: DataFrame,
    order_by: Sequence[Column],
    value_col: str,
    out: str = "prev_max",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact max of ``value_col`` over all STRICT predecessors in
    ``order_by`` (NULL for the global first row) — the dominance scan a
    2-D skyline needs — without a global sort: local prev-max within each
    range, folded with the broadcast max of all earlier ranges."""
    spark = df.sparkSession
    d = _ranged(df, order_by, num_partitions)
    maxs = d.groupBy(_PID).agg(F.max(value_col).alias("__m"))
    offs, _ = _offsets(maxs, spark, max)
    dtype = dict(df.dtypes)[value_col]
    off_df = spark.createDataFrame(
        [(p, None if o is None else str(o)) for p, o in offs],
        f"{_PID} int, __off string",
    ).select(_PID, F.col("__off").cast(dtype).alias("__off"))
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    return (
        d.join(F.broadcast(off_df), _PID)
        .withColumn(out, F.greatest(F.col("__off"), local))
        .drop(_PID, "__off")
    )
