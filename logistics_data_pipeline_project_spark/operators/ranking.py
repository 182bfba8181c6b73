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
2. a per-partition local scan (window partitioned by range id) —
   parallel across the P ranges,
3. per-range summaries (count / sum / max), reduced map-side to O(P)
   rows, prefix-scanned (a window over the P-row summary frame — the
   only single-partition sort here, bounded by the partition count, not
   the data), and BROADCAST-joined back as offsets.

The range partitioning is MATERIALIZED exactly once
(``localCheckpoint``) and both the summary branch and the scan branch
read the checkpointed partitions. This is load-bearing for correctness,
not a cache hint: Spark's range-boundary reservoir sampling is seeded by
``rdd.id``, so two physically separate ``repartitionByRange`` exchanges
over the same child can sample DIFFERENT boundaries — and column pruning
makes the two branches' exchange subtrees differ, defeating
ReusedExchange (AQE happens to coalesce them today, but AQE-off must not
change answers). Divergent boundaries would tag the same row with
different range ids in the two branches, corrupting every offset. After
the checkpoint, ``spark_partition_id`` is frozen into the data and every
branch sees one consistent partitioning, under any optimizer setting.
Cost context at scale: a shuffle already spills its full input to
executor-local disk, so one local checkpoint of the shuffled result is
the same IO class — not an extra pass over source data. (On executor
loss a localCheckpoint fails the job loudly instead of silently
recomputing a partition under re-sampled boundaries — the failure mode
we want.)

global rank = local position + rows in all earlier ranges; running sum =
local running sum + sum of earlier ranges; prefix max = max(local prefix
max, max of earlier ranges). NTILE is pure integer arithmetic on the
global rank (the exact SQL NTILE bucket formula) with the total count
riding along as a column, so results match a single-partition NTILE
bit-for-bit — these are drop-in de-globalizations, certified by the
unchanged DuckDB oracles of q110/q117/q126.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rk_pid"


def _ranged(df: DataFrame, order_by: Sequence[Column], num_partitions: int | None):
    """Range-partition ``df`` by the (total) sort order, tag each row
    with its range id, and MATERIALIZE the result so every consumer
    branch sees the same boundaries (see module docstring). Range i <
    range j ⇒ every key in i sorts before every key in j, so per-range
    local scans compose into the global scan with additive offsets."""
    if num_partitions:
        d = df.repartitionByRange(num_partitions, *order_by)
    else:
        d = df.repartitionByRange(*order_by)  # spark.sql.shuffle.partitions
    # lazy: materialized by whichever branch runs first (the broadcast
    # offset job), then reused by the row-level scan branch
    return d.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False
    )


def _offset_frame(d: DataFrame, agg: Column, kind: str, want_total: bool):
    """(pid, __off[, __tot]) — per-range summaries prefix-scanned into
    offsets (``kind``: fold earlier ranges by 'sum' or 'max'; __off is
    NULL for the first range). The windows run over the O(P)-row summary
    frame only — the lone single-partition sort, bounded by partition
    count, never data."""
    parts = d.groupBy(_PID).agg(agg.alias("__s"))
    w_prev = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    fold = {"sum": F.sum, "max": F.max}[kind]
    cols = [F.col(_PID), fold("__s").over(w_prev).alias("__off")]
    if want_total:
        cols.append(F.sum("__s").over(w_all).alias("__tot"))
    return parts.select(*cols)


def with_global_rank(
    df: DataFrame,
    order_by: Sequence[Column],
    out: str = "rank",
    total_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add the exact 1-based global row number under ``order_by`` (which
    must be a TOTAL order — carry a unique tiebreaker) without a global
    sort. ``total_out`` optionally adds the total row count as a column
    (it falls out of the offset scan for free — NTILE needs it)."""
    d = _ranged(df, order_by, num_partitions)
    offs = _offset_frame(d, F.count(F.lit(1)), "sum", want_total=bool(total_out))
    w = Window.partitionBy(_PID).orderBy(*order_by)
    out_df = d.join(F.broadcast(offs), _PID).withColumn(
        out,
        (F.coalesce(F.col("__off"), F.lit(0)) + F.row_number().over(w)).cast("long"),
    )
    if total_out:
        out_df = out_df.withColumn(total_out, F.col("__tot").cast("long"))
    return out_df.drop(_PID, "__off", "__tot")


def exact_ntile(
    df: DataFrame,
    order_by: Sequence[Column],
    n_buckets: int,
    out: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(n) over a total order, no single-partition sort: the
    SQL NTILE bucket of global rank rk over n rows is pure integer math
    (the first n mod b buckets hold ⌈n/b⌉ rows), so the bucket comes
    straight off `with_global_rank` with the total count as a column —
    bit-identical to Window NTILE, at range-partition parallelism."""
    ranked = with_global_rank(
        df, order_by, out="__rk", total_out="__n", num_partitions=num_partitions
    )
    rk, n = F.col("__rk"), F.col("__n")
    b = F.lit(n_buckets)
    r = n % b
    q = F.floor(n / b).cast("long")
    big_span = r * (q + 1)  # rows living in the ⌈n/b⌉-sized buckets
    bucket = F.when(
        rk <= big_span, F.floor((rk - 1) / (q + 1))
    ).otherwise(
        # q == 0 makes this branch unreachable (big_span == n);
        # greatest(q, 1) keeps the expression total under ANSI division
        r + F.floor((rk - big_span - 1) / F.greatest(q, F.lit(1)))
    )
    return ranked.withColumn(out, (bucket + 1).cast("int")).drop("__rk", "__n")


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
    DECIMAL for exact money; Spark's sum-widening is cast back)."""
    dtype = dict(df.dtypes)[value_col]
    d = _ranged(df, order_by, num_partitions)
    offs = _offset_frame(d, F.sum(value_col), "sum", want_total=True)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.sum(value_col).over(w)
    return (
        d.join(F.broadcast(offs), _PID)
        .withColumn(cum, F.coalesce(F.col("__off") + local, local).cast(dtype))
        .withColumn(total, F.col("__tot").cast(dtype))
        .drop(_PID, "__off", "__tot")
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
    d = _ranged(df, order_by, num_partitions)
    offs = _offset_frame(d, F.max(value_col), "max", want_total=False)
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    return (
        d.join(F.broadcast(offs), _PID)
        .withColumn(out, F.greatest(F.col("__off"), local))
        .drop(_PID, "__off")
    )
