"""Unit tests for the temporal join operators (as-of, binned interval).

Golden-row style per SURVEY §5: tiny fixtures with hand-computed
expectations, covering exact-match inclusion/exclusion, no-match NULLs,
tiebreak determinism, and interval boundary inclusivity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.operators.temporal import (
    asof_join,
    interval_bin_join,
)


def _ts(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_backward_basic(spark):
    left = _ts(
        spark,
        [(1, 100, "2024-01-01 10:00:00"), (1, 101, "2024-01-01 12:00:00"),
         (2, 200, "2024-01-01 09:00:00")],
        "k int, lid int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = _ts(
        spark,
        [(1, 7, "2024-01-01 09:30:00"), (1, 8, "2024-01-01 11:00:00"),
         (3, 9, "2024-01-01 08:00:00")],
        "k int, rid int, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))
    out = asof_join(
        left, right, by=["k"], left_ts="ts", right_ts="rts", value_cols=["rid"]
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    # 10:00 sees 09:30; 12:00 sees 11:00; key 2 has no right rows at all.
    assert got == {100: 7, 101: 8, 200: None}


def test_asof_exact_vs_strict(spark):
    left = _ts(spark, [(1, 100, "2024-01-01 10:00:00")], "k int, lid int, ts string")
    left = left.withColumn("ts", F.to_timestamp("ts"))
    right = _ts(spark, [(1, 7, "2024-01-01 10:00:00")], "k int, rid int, rts string")
    right = right.withColumn("rts", F.to_timestamp("rts"))
    exact = asof_join(left, right, ["k"], "ts", "rts", ["rid"]).collect()[0]
    strict = asof_join(
        left, right, ["k"], "ts", "rts", ["rid"], allow_exact=False
    ).collect()[0]
    assert exact["rid"] == 7  # ts == rts counts when allow_exact
    assert strict["rid"] is None  # and is excluded when strict


def test_asof_tiebreak_deterministic(spark):
    left = _ts(spark, [(1, 100, "2024-01-01 10:00:00")], "k int, lid int, ts string")
    left = left.withColumn("ts", F.to_timestamp("ts"))
    # Two right rows at the SAME timestamp: greatest tiebreak wins.
    right = _ts(
        spark,
        [(1, 7, "2024-01-01 09:00:00"), (1, 8, "2024-01-01 09:00:00")],
        "k int, rid int, rts string",
    ).withColumn("rts", F.to_timestamp("rts"))
    out = asof_join(
        left, right, ["k"], "ts", "rts", ["rid"], right_tiebreak="rid"
    ).collect()[0]
    assert out["rid"] == 8


def test_interval_bin_join_boundaries(spark):
    pts = _ts(
        spark,
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 11:00:00"),
         (1, "2024-01-01 11:00:01"), (2, "2024-01-01 10:30:00")],
        "k int, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    iv = _ts(
        spark,
        [(1, 55, "2024-01-01 10:00:00", "2024-01-01 11:00:00")],
        "k int, ivid int, start_ts string, end_ts string",
    ).withColumn("start_ts", F.to_timestamp("start_ts")).withColumn(
        "end_ts", F.to_timestamp("end_ts")
    )
    out = interval_bin_join(
        pts, iv, by=["k"], ts_col="ts", start_col="start_ts", end_col="end_ts"
    )
    rows = sorted(str(r["ts"]) for r in out.collect())
    # Both endpoints inclusive; 11:00:01 outside; key 2 never matches.
    assert rows == ["2024-01-01 10:00:00", "2024-01-01 11:00:00"]


def test_interval_bin_join_long_interval_no_dups(spark):
    # Interval spanning many bins must still match each point exactly once.
    pts = _ts(spark, [(1, "2024-01-01 13:37:00")], "k int, ts string")
    pts = pts.withColumn("ts", F.to_timestamp("ts"))
    iv = _ts(
        spark,
        [(1, 1, "2024-01-01 00:00:00", "2024-01-02 00:00:00")],
        "k int, ivid int, start_ts string, end_ts string",
    ).withColumn("start_ts", F.to_timestamp("start_ts")).withColumn(
        "end_ts", F.to_timestamp("end_ts")
    )
    out = interval_bin_join(
        pts, iv, by=["k"], ts_col="ts", start_col="start_ts", end_col="end_ts"
    )
    assert out.count() == 1


def test_asof_join_forward_matches_reference(spark):
    from pyspark.sql import functions as F

    from logistics_data_pipeline_project_spark.operators.temporal import asof_join

    left = spark.createDataFrame(
        [(1, 10), (1, 25), (1, 40), (2, 5), (2, 99)], "k long, lt long"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 30, "b"), (1, 35, "c"), (2, 4, "d")],
        "k long, rt long, v string",
    )
    fwd = {
        (r["k"], r["lt"]): (r["rt_matched"], r["v"])
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["v"], direction="forward"
        ).collect()
    }
    # nearest following right (rt >= lt)
    assert fwd[(1, 10)] == (10, "a")   # exact match allowed
    assert fwd[(1, 25)] == (30, "b")
    assert fwd[(1, 40)] == (None, None)
    assert fwd[(2, 5)] == (None, None)
    assert fwd[(2, 99)] == (None, None)
    # strict forward: the exact-timestamp row no longer matches
    strict = {
        (r["k"], r["lt"]): (r["rt_matched"], r["v"])
        for r in asof_join(
            left, right, ["k"], "lt", "rt", ["v"],
            allow_exact=False, direction="forward",
        ).collect()
    }
    assert strict[(1, 10)] == (30, "b")


def test_bitemporal_read_separates_the_two_time_axes(spark, tmp_path):
    """Transaction-time rollback (what we KNEW) vs valid-time as-of (what
    WAS) — the composition must answer all four quadrant queries."""
    from pyspark.sql import functions as F

    from logistics_data_pipeline_project_spark.operators.merge import scd2_apply
    from logistics_data_pipeline_project_spark.operators.temporal import (
        bitemporal_read,
    )
    from logistics_data_pipeline_project_spark.plans.materialize import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    hist0 = spark.createDataFrame(
        [(1, "bronze", "2024-01-01 00:00:00", None, True)],
        "cust long, segment string, valid_from string, valid_to string, is_current boolean",
    ).select(
        "cust", "segment",
        F.col("valid_from").cast("timestamp").alias("valid_from"),
        F.col("valid_to").cast("timestamp").alias("valid_to"),
        "is_current",
    )
    store.overwrite("dim", hist0)  # tx v1: bronze since Jan 1

    # Feb 1 load: segment changes to gold
    upd = spark.createDataFrame([(1, "gold")], "cust long, segment string")
    hist1 = scd2_apply(
        store.read("dim"), upd, "cust", ["segment"],
        F.lit("2024-02-01 00:00:00").cast("timestamp"),
    )
    store.overwrite("dim", hist1.localCheckpoint(eager=True))  # tx v2

    v1, v2 = store.versions("dim")[-2:]
    jan15 = F.lit("2024-01-15 00:00:00").cast("timestamp")
    feb15 = F.lit("2024-02-15 00:00:00").cast("timestamp")

    def seg(tx, valid):
        rows = bitemporal_read(store, "dim", valid, tx_version=tx).collect()
        return rows[0]["segment"] if rows else None

    assert seg(v2, jan15) == "bronze"   # latest knowledge, old valid time
    assert seg(v2, feb15) == "gold"     # latest knowledge, new valid time
    assert seg(v1, jan15) == "bronze"   # old knowledge, old valid time
    # old knowledge never saw the Feb change — still bronze at Feb 15
    assert seg(v1, feb15) == "bronze"
