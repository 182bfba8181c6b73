"""Differential tests for operators/ranking.py: the range-partitioned
global-order primitives must be bit-identical to the single-partition
Window forms they replace (q110/q117/q126 rely on that equivalence for
their unchanged DuckDB oracles)."""

from __future__ import annotations

import random
from decimal import Decimal

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.operators.ranking import (
    exact_ntile,
    with_global_rank,
    with_prefix_max,
    with_running_sum,
)


def _df(spark, n, seed=7, dup_vals=True):
    rnd = random.Random(seed)
    vmax = max(1, n // 3) if dup_vals else 10**9
    rows = [(i, rnd.randint(0, vmax), Decimal(rnd.randint(0, 999)) / 100) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, amt decimal(18,2)").repartition(7)


@pytest.mark.parametrize("n", [0, 1, 3, 97])
def test_global_rank_matches_window(spark, n):
    df = _df(spark, n)
    order = [F.desc("v"), F.asc("id")]
    got = with_global_rank(df, order, out="rk", total_out="n", num_partitions=5)
    assert {r["n"] for r in got.collect()} <= {n}
    w = Window.orderBy(*order)
    want = df.withColumn("rk", F.row_number().over(w).cast("long"))
    assert sorted(got.drop("n").collect()) == sorted(want.collect())


@pytest.mark.parametrize("n,b", [(0, 4), (1, 4), (3, 4), (4, 4), (97, 4), (97, 10)])
def test_exact_ntile_matches_window(spark, n, b):
    df = _df(spark, n)
    order = [F.desc("v"), F.asc("id")]
    got = exact_ntile(df, order, b, "t", num_partitions=5)
    want = df.withColumn("t", F.ntile(b).over(Window.orderBy(*order)))
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n", [0, 1, 97])
def test_running_sum_matches_window(spark, n):
    df = _df(spark, n)
    order = [F.desc("v"), F.asc("id")]
    got = with_running_sum(df, order, "amt", num_partitions=5)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    want = (
        df.withColumn("cum", F.sum("amt").over(w).cast("decimal(18,2)"))
        .withColumn(
            "total", F.sum("amt").over(Window.partitionBy()).cast("decimal(18,2)")
        )
    )
    assert sorted(got.collect()) == sorted(want.collect())
    # the running sum must stay in the exact DECIMAL type end to end
    assert dict(got.dtypes)["cum"] == "decimal(18,2)"


@pytest.mark.parametrize("n", [0, 1, 97])
def test_prefix_max_matches_window(spark, n):
    df = _df(spark, n)
    order = [F.asc("v"), F.desc("id")]
    got = with_prefix_max(df, order, "amt", num_partitions=5)
    w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
    want = df.withColumn("prev_max", F.max("amt").over(w))
    assert sorted(got.collect(), key=repr) == sorted(want.collect(), key=repr)


def test_no_single_partition_sort_over_data_in_plan(spark):
    """The whole point: no global sort of the DATA. The only allowed
    single-partition step is the O(P)-row summary window, which must sit
    strictly downstream of the map-side-combined groupBy(pid)."""
    df = _df(spark, 50)
    got = exact_ntile(df, [F.desc("v"), F.asc("id")], 4, "t", num_partitions=5)
    plan = got._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    assert sp, "expected the O(P)-row summary exchange in the plan"
    for i in sp:
        # the exchange's direct child (next line in tree pre-order) must
        # be the per-range aggregate, never a scan/shuffle of the data
        assert "HashAggregate" in lines[i + 1], plan
    # the full-data window is partitioned by the range id, and the data
    # reaches it through broadcast-joined offsets
    assert "BroadcastHashJoin" in plan
    data_windows = [
        ln for ln in lines if "row_number()" in ln and "windowspecdefinition" in ln
    ]
    assert data_windows and all("__rk_pid" in ln for ln in data_windows), plan
    # the range partitioning is materialized ONCE (localCheckpoint) and
    # both branches scan the checkpointed RDD — a rangepartitioning
    # exchange visible in the plan would mean the boundary sampling can
    # run per-branch and diverge (seeded by rdd.id), silently corrupting
    # ranks when nothing coalesces the branches (e.g. AQE off)
    assert "rangepartitioning" not in plan, plan
    assert "Scan ExistingRDD" in plan, plan


def test_exact_under_aqe_off(spark):
    """Range-boundary sampling is seeded by rdd.id, so two separate
    range exchanges can sample different boundaries; before the
    localCheckpoint fix these primitives were only exact when AQE
    happened to coalesce the branches. They must be exact under ANY
    optimizer setting."""
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = _df(spark, 500)
        order = [F.desc("v"), F.asc("id")]
        got = with_global_rank(df, order, out="rk", num_partitions=13)
        assert sorted(r["rk"] for r in got.collect()) == list(range(1, 501))
        want = df.withColumn(
            "rk", F.row_number().over(Window.orderBy(*order)).cast("long")
        )
        assert sorted(got.collect()) == sorted(want.collect())

        got_nt = exact_ntile(df, order, 4, "t", num_partitions=13)
        want_nt = df.withColumn("t", F.ntile(4).over(Window.orderBy(*order)))
        assert sorted(got_nt.collect()) == sorted(want_nt.collect())

        got_cs = with_running_sum(df, order, "amt", num_partitions=13)
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        want_cs = df.withColumn(
            "cum", F.sum("amt").over(w).cast("decimal(18,2)")
        ).withColumn(
            "total",
            F.sum("amt").over(Window.partitionBy()).cast("decimal(18,2)"),
        )
        assert sorted(got_cs.collect()) == sorted(want_cs.collect())
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
