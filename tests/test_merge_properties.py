"""Property-based tests (hypothesis) for the merge engine — the custom
primitive everything else depends on (SURVEY §7 Phase 2 calls out
idempotence and multi-match semantics as the explicit risks).

Properties:
- merge keys  = union of target and source keys; source wins on match
- idempotence: merging the same (deduped) source twice == once
- full-rebuild equivalence: watermark-incremental merge over two batches
  == one merge of the deduped union
- SCD2 invariants: exactly one current row per key, history only grows,
  closed rows carry the effective timestamp
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from logistics_data_pipeline_project_spark.operators.merge import (
    dedup_latest,
    high_watermark,
    incremental_filter,
    merge_upsert,
    scd2_apply,
)

SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("v", StringType()),
        StructField("ts", LongType()),
    ]
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=8),
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=0, max_value=50),
    ),
    min_size=0,
    max_size=20,
)

def SET_V():
    # built lazily: Column exprs need an active SparkContext
    return {"v": F.col("s.v"), "ts": F.col("s.ts")}

prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _df(spark, data):
    return spark.createDataFrame([tuple(r) for r in data], SCHEMA)


def _latest_by_key(data):
    best = {}
    for k, v, ts in data:
        # tiebreak (ts desc, v desc) mirrors dedup_latest's total order
        if k not in best or (ts, v) > (best[k][2], best[k][1]):
            best[k] = (k, v, ts)
    return best


@pytest.mark.usefixtures("spark")
class TestMergeProperties:
    @given(tgt=rows, src=rows)
    @prop
    def test_merge_key_union_and_source_wins(self, spark, tgt, src):
        target = _df(spark, _latest_by_key(tgt).values())
        source = dedup_latest(_df(spark, src), ["k"], [F.desc("ts"), F.desc("v")])
        merged = merge_upsert(target, source, ["k"], update_set=SET_V(), strict=True)
        got = {r["k"]: (r["v"], r["ts"]) for r in merged.collect()}

        want = {k: (v, ts) for k, (_, v, ts) in _latest_by_key(tgt).items()}
        want.update({k: (v, ts) for k, (_, v, ts) in _latest_by_key(src).items()})
        assert got == want

    @given(tgt=rows, src=rows)
    @prop
    def test_merge_idempotent(self, spark, tgt, src):
        target = _df(spark, _latest_by_key(tgt).values())
        source = dedup_latest(_df(spark, src), ["k"], [F.desc("ts"), F.desc("v")])
        once = merge_upsert(target, source, ["k"], update_set=SET_V(), strict=True)
        twice = merge_upsert(once, source, ["k"], update_set=SET_V(), strict=True)
        assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}

    @given(batch1=rows, batch2=rows)
    @prop
    def test_disjoint_batches_commute(self, spark, batch1, batch2):
        """Snowflake MERGE applies disjoint-key batches in either order
        with the same result; a join-rewrite can silently break that
        (e.g. if un-matched target rows leak or dup). Keys are forced
        disjoint by parity-splitting the generated keys."""
        b1 = [(k, v, ts) for k, v, ts in batch1 if k % 2 == 0]
        b2 = [(k, v, ts) for k, v, ts in batch2 if k % 2 == 1]
        order = [F.desc("ts"), F.desc("v")]
        tgt = _df(spark, [])
        s1 = dedup_latest(_df(spark, b1), ["k"], order)
        s2 = dedup_latest(_df(spark, b2), ["k"], order)
        ab = merge_upsert(
            merge_upsert(tgt, s1, ["k"], update_set=SET_V(), strict=True),
            s2, ["k"], update_set=SET_V(), strict=True,
        )
        ba = merge_upsert(
            merge_upsert(tgt, s2, ["k"], update_set=SET_V(), strict=True),
            s1, ["k"], update_set=SET_V(), strict=True,
        )
        assert {tuple(r) for r in ab.collect()} == {tuple(r) for r in ba.collect()}

    @given(batch1=rows, batch2=rows)
    @prop
    def test_incremental_equals_full_rebuild(self, spark, batch1, batch2):
        order = [F.desc("ts"), F.desc("v")]
        empty = _df(spark, [])
        s1 = dedup_latest(_df(spark, batch1), ["k"], order)
        state = merge_upsert(empty, s1, ["k"], update_set=SET_V())

        wm = high_watermark(state, "ts")
        s2_new = dedup_latest(
            incremental_filter(_df(spark, batch2), "ts", wm), ["k"], order
        )
        state = merge_upsert(state, s2_new, ["k"], update_set=SET_V())
        got = {tuple(r) for r in state.collect()}

        # full rebuild: batch1 first, then batch2 rows above the same
        # watermark (watermark semantics drop batch2 rows at/below max ts)
        survivors = list(_latest_by_key(batch1).values())
        late = [r for r in batch2 if wm is None or r[2] > wm]
        merged = _latest_by_key(survivors)
        for k, (_, v, ts) in _latest_by_key(late).items():
            merged[k] = (k, v, ts)
        assert got == {tuple(r) for r in merged.values()}


HIST_SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("v", StringType()),
        StructField("valid_from", TimestampType()),
        StructField("valid_to", TimestampType()),
        StructField("is_current", BooleanType()),
    ]
)

upd_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),
        st.sampled_from(["a", "b", "c"]),
    ),
    min_size=0,
    max_size=8,
)


@pytest.mark.usefixtures("spark")
class TestScd2Properties:
    @given(updates1=upd_rows, updates2=upd_rows)
    @prop
    def test_scd2_invariants(self, spark, updates1, updates2):
        hist = spark.createDataFrame([], HIST_SCHEMA)
        t1 = dt.datetime(2024, 1, 1)
        t2 = dt.datetime(2024, 2, 1)
        for updates, ts in ((updates1, t1), (updates2, t2)):
            latest = {}
            for k, v in updates:
                latest[k] = v  # last row per key wins in the fixture
            upd = spark.createDataFrame(
                [(k, v) for k, v in latest.items()], "k int, v string"
            )
            prev_count = hist.count()
            hist = scd2_apply(hist, upd, "k", ["v"], F.lit(ts).cast("timestamp"))
            assert hist.count() >= prev_count  # history only grows

        rows_ = hist.collect()
        by_key = {}
        for r in rows_:
            by_key.setdefault(r["k"], []).append(r)
        for k, krows in by_key.items():
            current = [r for r in krows if r["is_current"]]
            assert len(current) == 1, f"key {k}: {len(current)} current rows"
            assert current[0]["valid_to"] is None
            for r in krows:
                if not r["is_current"]:
                    assert r["valid_to"] is not None
                    assert r["valid_to"] >= r["valid_from"]

        # final current values equal last-write-wins over both batches
        want = {}
        for updates in (updates1, updates2):
            for k, v in updates:
                want[k] = v
        got = {r["k"]: r["v"] for r in rows_ if r["is_current"]}
        assert got == want

    @given(updates=upd_rows)
    @prop
    def test_scd2_rerun_idempotent(self, spark, updates):
        """Re-running the same snapshot (a replayed batch / backfill
        rerun) must be a no-op: no rows close, no rows open — the
        dbt-snapshot guarantee a naive join-rewrite breaks by re-opening
        unchanged keys. Applies even at a LATER effective timestamp."""
        latest = {}
        for k, v in updates:
            latest[k] = v
        upd = spark.createDataFrame(
            [(k, v) for k, v in latest.items()], "k int, v string"
        )
        hist = spark.createDataFrame([], HIST_SCHEMA)
        t1 = dt.datetime(2024, 1, 1)
        t2 = dt.datetime(2024, 2, 1)
        once = scd2_apply(hist, upd, "k", ["v"], F.lit(t1).cast("timestamp"))
        again = scd2_apply(once, upd, "k", ["v"], F.lit(t2).cast("timestamp"))
        assert {tuple(r) for r in once.collect()} == {
            tuple(r) for r in again.collect()
        }


@pytest.mark.usefixtures("spark")
class TestIncrementalRollupProperties:
    rollup_rows = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),  # day (cursor)
            st.sampled_from(["a", "b", "c"]),  # key
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=1,
        max_size=20,
    )

    @given(data=rollup_rows, cut=st.integers(min_value=1, max_value=4))
    @prop
    def test_any_slicing_matches_full_recompute(self, spark, tmp_path_factory, data, cut):
        from logistics_data_pipeline_project_spark.plans import (
            TableStore,
            incremental_rollup,
            read_rollup,
        )

        store = TableStore(
            spark, str(tmp_path_factory.mktemp("wh")), retain_versions=1
        )
        full = spark.createDataFrame(data, "day int, k string, v int")
        measures = {
            "n": ("*", "count"),
            "total": ("v", "sum"),
            "vmin": ("v", "min"),
            "vmax": ("v", "max"),
        }
        # arbitrary cut point: rows ≤ cut first, then everything
        incremental_rollup(
            store, "r", full.filter(F.col("day") <= cut), ["k"], measures, "day"
        )
        incremental_rollup(store, "r", full, ["k"], measures, "day")
        got = {
            r["k"]: (r["n"], float(r["total"]), r["vmin"], r["vmax"])
            for r in read_rollup(store, "r").collect()
        }
        want = {
            r["k"]: (r["n"], float(r["total"]), r["vmin"], r["vmax"])
            for r in full.groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(27,2)")).alias("total"),
                F.min("v").alias("vmin"),
                F.max("v").alias("vmax"),
            )
            .collect()
        }
        assert got == want
