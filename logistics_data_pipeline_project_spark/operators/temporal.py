"""Temporal join operators Spark lacks as built-ins: as-of (point-in-time)
join and binned interval (range) join.

Neither appears in the reference (SURVEY §2.4 "not present: as-of/interval
joins") — they are engine extensions, built strictly from declarative
DataFrame ops so Catalyst keeps pushdown/pruning and the shapes scale:

- ``asof_join`` is the union + keyed-window formulation: both inputs are
  tagged and unioned, one window per key carries the latest right-side row
  forward, left rows read it. ONE shuffle on the key — never the naive
  per-left-row subquery (O(n²)) nor a driver loop. This is the standard
  distributed point-in-time-correctness join used for feature stores.
- ``interval_bin_join`` is the bucketed range join: intervals explode to
  the fixed-width time bins they cover, points hash to their single bin,
  and the equi-join on (key, bin) + an exact BETWEEN filter replaces the
  non-equi join Spark would otherwise plan as a broadcast nested loop.
  Fan-out is interval_span/bin_width rows per interval — tunable, and at
  100 TB the bin becomes the shuffle/cluster key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    allow_exact: bool = True,
    right_tiebreak: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For every left row, attach the most recent right row of the same
    ``by`` key with ``right_ts <= left_ts`` (strictly ``<`` when
    ``allow_exact=False``); unmatched left rows keep NULLs (left-outer
    as-of semantics, backward direction).

    ``direction="forward"`` flips the match to the NEAREST FOLLOWING
    right row (``right_ts >= left_ts``, or ``>`` without exact) — the
    "next maintenance after the failure" / "next fill after the order"
    lookup, pandas ``merge_asof(direction='forward')``. Implemented by
    running the identical one-shuffle union+window plan over the
    REVERSED time order, so both directions share one code path and one
    physical shape.

    ``value_cols`` are the right-side columns to carry (must not collide
    with left column names — alias beforehand). ``right_tiebreak`` makes
    the winner deterministic when several right rows share one timestamp
    (the row with the greatest tiebreak value wins); without it, ties are
    only deterministic if (by, right_ts) is unique.

    Plan shape: union(tagged left, tagged right) → one window partitioned
    by key ordered by (ts, side, tiebreak) carrying ``last(right_row,
    ignorenulls)`` → filter back to left rows. One shuffle on ``by``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    l_side, r_side = (1, 0) if allow_exact else (0, 1)
    keys = list(by)
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
    rcols = [F.col(right_ts).alias("__rts")] + [F.col(c) for c in value_cols]
    rrow = F.struct(*rcols).alias("__rrow")
    tb: Column = (
        F.col(right_tiebreak) if right_tiebreak is not None else F.lit(0)
    )
    l2 = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(l_side).alias("__side"),
        F.lit(None).cast("long").alias("__tb"),
        lrow,
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(r_side).alias("__side"),
        tb.cast("long").alias("__tb"),
        rrow,
    )
    u = l2.unionByName(r2, allowMissingColumns=True)
    t_order = F.col("__t").asc() if direction == "backward" else F.col("__t").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(t_order, F.col("__side").asc(), F.col("__tb").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("__m", F.last("__rrow", ignorenulls=True).over(w))
    out_cols = [F.col(f"__lrow.{c}").alias(c) for c in left.columns]
    out_cols.append(F.col("__m.__rts").alias(f"{right_ts}_matched"))
    out_cols.extend(F.col(f"__m.{c}").alias(c) for c in value_cols)
    return matched.filter(F.col("__side") == l_side).select(*out_cols)


def interval_bin_join(
    points: DataFrame,
    intervals: DataFrame,
    by: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bin_us: int = 3_600_000_000,
) -> DataFrame:
    """Equi-join each point row to every interval row of the same key
    whose [start, end] (microsecond timestamps, inclusive) contains it.

    The non-equi predicate becomes an equi-join: intervals replicate to
    each covered ``bin_us``-wide bucket (``explode(sequence(...))``,
    map-side), points hash to exactly one bucket, the join runs on
    (key..., bucket) and a BETWEEN filter restores exactness. Each point
    matches an interval at most once (its own bucket), so no dedup pass
    is needed. Pick ``bin_us`` near the typical interval length: fan-out
    stays O(1) per interval while bucket join selectivity stays high.
    """
    cand = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.expr(f"unix_micros({start_col}) div {bin_us}"),
                F.expr(f"unix_micros({end_col}) div {bin_us}"),
            )
        ),
    )
    probe = points.withColumn("__bin", F.expr(f"unix_micros({ts_col}) div {bin_us}"))
    joined = probe.join(cand, [*by, "__bin"]).filter(
        (F.unix_micros(F.col(ts_col)) >= F.unix_micros(F.col(start_col)))
        & (F.unix_micros(F.col(ts_col)) <= F.unix_micros(F.col(end_col)))
    )
    return joined.drop("__bin")


def bitemporal_read(
    store,
    name: str,
    valid_at: Column,
    tx_version: int | None = None,
    valid_from_col: str = "valid_from",
    valid_to_col: str = "valid_to",
):
    """Bitemporal point-in-time read: "what did we BELIEVE (transaction
    time) the world looked like AT (valid time)". The two time axes come
    from two orthogonal engine primitives composed, not a new format:

    - transaction time = the versioned TableStore snapshot (every SCD2
      rewrite commits a new immutable version; ``tx_version`` selects
      what the warehouse knew then — pointer lookup, zero data copy),
    - valid time = the SCD2 interval filter (``scd2_as_of``) inside that
      snapshot — a pure scan-pushed predicate.

    This answers the audit/backtest class of question ("as of last
    Tuesday's load, what was the customer's segment on Jan 1") that
    neither axis alone can: rolling back transaction time undoes bad
    loads, rolling back valid time undoes real-world change. Cost: one
    filtered scan of one snapshot — no join, no window."""
    from .merge import scd2_as_of

    hist = store.read(name, version=tx_version)
    return scd2_as_of(
        hist, valid_at, valid_from_col=valid_from_col, valid_to_col=valid_to_col
    )
