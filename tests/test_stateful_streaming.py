"""End-to-end test of the applyInPandasWithState sessionizer: three
micro-batches through a file source. A cross-batch event-time gap closes
a session via the data path; a user who goes quiet is closed by the
watermark-driven event-time timeout."""

from __future__ import annotations

import json
import os

from logistics_data_pipeline_project_spark.streaming.stateful import (
    stream_user_sessions,
)

SCHEMA = "user_id long, ts timestamp"
OUT_SCHEMA = "user_id long, session_start timestamp, session_end timestamp, n_events int"


def _write_batch(landing: str, name: str, rows):
    with open(os.path.join(landing, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _run_once(spark, landing: str, chk: str, out: str):
    stream = spark.readStream.format("json").schema(SCHEMA).load(landing)
    sessions = stream_user_sessions(stream, gap_minutes=30, watermark_delay="0 seconds")
    q = (
        sessions.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(180)
    finally:
        if q.isActive:
            q.stop()


def test_sessions_close_by_gap_and_by_timeout(spark, tmp_path):
    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    os.makedirs(landing)

    _write_batch(
        landing,
        "b1.json",
        [
            {"user_id": 1, "ts": "2024-01-01 10:00:00"},
            {"user_id": 1, "ts": "2024-01-01 10:05:00"},
            {"user_id": 2, "ts": "2024-01-01 10:00:00"},
        ],
    )
    _run_once(spark, landing, chk, out)
    # no gap crossed and watermark hasn't passed any session+gap yet
    assert spark.read.schema(OUT_SCHEMA).parquet(out).count() == 0

    # batch 2: user 1 returns 2h later -> their 10:00-10:05 session closes
    # on the data path (event-time gap > 30 min). The same run advances
    # the watermark to 12:00, which fires user 2's event-time timeout
    # (10:00 + 30 min): their quiet session closes too.
    _write_batch(landing, "b2.json", [{"user_id": 1, "ts": "2024-01-01 12:00:00"}])
    _run_once(spark, landing, chk, out)
    rows = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert rows == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:05:00", 2),
        (2, "2024-01-01 10:00:00", "2024-01-01 10:00:00", 1),
    }

    # batch 3: an unrelated user advances the watermark past 12:30 ->
    # user 1's open 12:00 session closes by timeout; user 3 stays open
    _write_batch(landing, "b3.json", [{"user_id": 3, "ts": "2024-01-01 13:00:00"}])
    _run_once(spark, landing, chk, out)
    rows = {
        (r["user_id"], str(r["session_start"]), str(r["session_end"]), r["n_events"])
        for r in spark.read.parquet(out).collect()
    }
    assert (1, "2024-01-01 12:00:00", "2024-01-01 12:00:00", 1) in rows
    assert len(rows) == 3


def test_first_seen_dedup_across_batches(spark, tmp_path):
    from logistics_data_pipeline_project_spark.streaming.stateful import (
        stream_first_seen,
    )

    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    os.makedirs(landing)
    out_schema = "sig string, occurrences bigint"

    def run_once():
        stream = spark.readStream.format("json").schema("sig string").load(landing)
        q = (
            stream_first_seen(stream, "sig")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            if q.isActive:
                q.stop()

    _write_batch(landing, "b1.json", [{"sig": "A"}, {"sig": "B"}, {"sig": "A"}])
    run_once()
    got1 = {
        (r["sig"], r["occurrences"])
        for r in spark.read.schema(out_schema).parquet(out).collect()
    }
    assert got1 == {("A", 2), ("B", 1)}

    # B recurs in a later batch -> dropped; C is new -> emitted once
    _write_batch(landing, "b2.json", [{"sig": "B"}, {"sig": "C"}])
    run_once()
    got2 = {
        (r["sig"], r["occurrences"])
        for r in spark.read.schema(out_schema).parquet(out).collect()
    }
    assert got2 == {("A", 2), ("B", 1), ("C", 1)}


def test_dedup_within_watermark_evicts_state(spark, tmp_path):
    """dropDuplicatesWithinWatermark: recurrences inside the delay horizon
    drop; once the watermark passes first_ts + delay the key's state is
    evicted and a later recurrence re-emits (the bounded-state contract)."""
    from logistics_data_pipeline_project_spark.streaming.stateful import (
        stream_dedup_within_watermark,
    )

    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    os.makedirs(landing)
    schema = "sig string, ts timestamp"

    def run_once():
        stream = spark.readStream.format("json").schema(schema).load(landing)
        q = (
            stream_dedup_within_watermark(stream, ["sig"], "ts", "10 minutes")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", chk)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(180)
        finally:
            if q.isActive:
                q.stop()

    _write_batch(
        landing,
        "b1.json",
        [
            {"sig": "A", "ts": "2024-01-01 10:00:00"},
            {"sig": "A", "ts": "2024-01-01 10:03:00"},  # in-horizon dup
            {"sig": "B", "ts": "2024-01-01 10:00:00"},
        ],
    )
    run_once()
    got = [
        (r["sig"], str(r["ts"]))
        for r in spark.read.schema(schema).parquet(out).collect()
    ]
    assert sorted(got) == [
        ("A", "2024-01-01 10:00:00"),
        ("B", "2024-01-01 10:00:00"),
    ]

    # batch 2: another in-horizon A dup still drops; a fresh event advances
    # the watermark far past A's 10:00+10min horizon so A's state evicts.
    _write_batch(
        landing,
        "b2.json",
        [
            {"sig": "A", "ts": "2024-01-01 10:05:00"},
            {"sig": "Z", "ts": "2024-01-01 12:00:00"},
        ],
    )
    run_once()
    # batch 3: A recurs AFTER eviction -> re-emitted (at-least-once across
    # watermark horizons, O(recent keys) state)
    _write_batch(landing, "b3.json", [{"sig": "A", "ts": "2024-01-01 12:01:00"}])
    run_once()
    got3 = sorted(
        (r["sig"], str(r["ts"]))
        for r in spark.read.schema(schema).parquet(out).collect()
    )
    assert got3 == [
        ("A", "2024-01-01 10:00:00"),
        ("A", "2024-01-01 12:01:00"),
        ("B", "2024-01-01 10:00:00"),
        ("Z", "2024-01-01 12:00:00"),
    ]


def test_stream_hll_distinct_matches_batch_sketch(spark, tmp_path):
    """Streaming register maintenance == batch sketch of the full
    history, and the estimate tracks the true distinct count."""
    import json
    import os

    from logistics_data_pipeline_project_spark.operators.sketch import (
        hll_estimate,
        hll_registers,
    )
    from logistics_data_pipeline_project_spark.plans.materialize import TableStore
    from logistics_data_pipeline_project_spark.streaming.sketch import (
        stream_hll_distinct,
    )

    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh"))
    schema = "user_id long, event_type string"

    def drain():
        stream = spark.readStream.format("json").schema(schema).load(landing)
        q = stream_hll_distinct(
            stream, store, "uniq_users", "user_id",
            keys=("event_type",), checkpoint_dir=chk,
        )
        try:
            q.awaitTermination(180)
        finally:
            if q.isActive:
                q.stop()

    def write_batch(name, lo, n):
        with open(os.path.join(landing, name), "w") as f:
            for i in range(lo, lo + n):
                f.write(json.dumps({"user_id": i, "event_type": "view"}) + "\n")

    write_batch("b1.json", 0, 400)
    drain()
    write_batch("b2.json", 300, 400)  # overlaps b1: true distinct = 700
    drain()

    maintained = {(r.event_type, r.idx, r.reg) for r in store.read("uniq_users").collect()}
    full = spark.createDataFrame(
        [(i, "view") for i in range(700)], schema
    )
    expected = {
        (r.event_type, r.idx, r.reg)
        for r in hll_registers(full, "user_id", keys=("event_type",)).collect()
    }
    assert maintained == expected

    est = hll_estimate(store.read("uniq_users"), keys=("event_type",)).collect()[0]
    assert abs(est.distinct_est - 700) / 700 < 0.15, est.distinct_est


def test_stream_cms_exactly_once_under_replay(spark, tmp_path):
    """foreachBatch is at-least-once; for a SUM-based sketch (CMS) a
    replayed micro-batch would silently double-count. The fold records
    the last applied batch id atomically with each snapshot and skips
    replays — simulated here the way a real crash produces one: delete
    the checkpoint's commit marker so Structured Streaming re-runs the
    already-applied batch on restart."""
    import json
    import os

    from pyspark.sql import functions as F

    from logistics_data_pipeline_project_spark.operators.sketch import cms_counters
    from logistics_data_pipeline_project_spark.plans.materialize import TableStore
    from logistics_data_pipeline_project_spark.streaming.sketch import (
        stream_sketch_rollup,
    )

    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh"))
    schema = "user_id long"

    def merge(a, b):
        return (
            a.unionByName(b)
            .groupBy("hash_row", "bucket")
            .agg(F.sum("counter").cast("long").alias("counter"))
        )

    def drain():
        stream = spark.readStream.format("json").schema(schema).load(landing)
        q = stream_sketch_rollup(
            stream, store, "cms",
            build=lambda b: cms_counters(b, "user_id"),
            merge=merge,
            checkpoint_dir=chk,
        )
        try:
            q.awaitTermination(180)
        finally:
            if q.isActive:
                q.stop()

    def counters():
        return {
            (r["hash_row"], r["bucket"]): r["counter"]
            for r in store.read("cms").collect()
        }

    with open(os.path.join(landing, "b1.json"), "w") as f:
        for i in range(100):
            f.write(json.dumps({"user_id": i}) + "\n")
    drain()
    c1 = counters()
    assert sum(c1.values()) == 300  # 100 keys × depth 3

    # crash window: the micro-batch committed to the store, but the
    # streaming checkpoint lost its commit marker → restart REPLAYS it
    commit0 = os.path.join(chk, "commits", "0")
    assert os.path.isfile(commit0)
    os.remove(commit0)
    crc0 = os.path.join(chk, "commits", ".0.crc")  # local-FS checksum twin
    if os.path.isfile(crc0):
        os.remove(crc0)
    drain()
    assert counters() == c1, "replayed batch double-counted the CMS"

    # normal progress still folds new batches
    with open(os.path.join(landing, "b2.json"), "w") as f:
        for i in range(50):
            f.write(json.dumps({"user_id": i}) + "\n")
    drain()
    assert sum(counters().values()) == 450
