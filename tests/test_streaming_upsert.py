"""Streaming merge-upsert (foreachBatch) end-to-end: CDC-style JSON files
drained through a file source keep a merged table current across
restarts of the query — the streaming twin of the airbyte high-watermark
MERGE loads (SURVEY §M1/§M4). Also covers the stream-static broadcast
enrichment join riding on the same sink."""

from __future__ import annotations

import json
import os

from logistics_data_pipeline_project_spark.plans.materialize import TableStore
from logistics_data_pipeline_project_spark.streaming.upsert import (
    stream_merge_upsert,
)

SCHEMA = "customer_id long, name string, balance double, extracted_at timestamp, seq long"


def _write_batch(landing: str, name: str, rows):
    with open(os.path.join(landing, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _drain(spark, landing, store, chk, dim=None):
    stream = spark.readStream.format("json").schema(SCHEMA).load(landing)
    q = stream_merge_upsert(
        stream,
        store,
        "dim_customers",
        keys=["customer_id"],
        cursor_col="extracted_at",
        tiebreak_col="seq",
        checkpoint_dir=chk,
        enrich_dim=dim,
        dim_key="customer_id" if dim is not None else None,
    )
    try:
        q.awaitTermination(180)
    finally:
        if q.isActive:
            q.stop()


def test_stream_merge_upsert_across_batches(spark, tmp_path):
    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh"))

    # batch 1: two customers; one key arrives twice (latest-per-key guard)
    _write_batch(
        landing,
        "b1.json",
        [
            {"customer_id": 1, "name": "a0", "balance": 10.0,
             "extracted_at": "2024-01-01 00:00:00", "seq": 1},
            {"customer_id": 1, "name": "a1", "balance": 11.0,
             "extracted_at": "2024-01-01 01:00:00", "seq": 2},
            {"customer_id": 2, "name": "b", "balance": 20.0,
             "extracted_at": "2024-01-01 00:00:00", "seq": 3},
        ],
    )
    _drain(spark, landing, store, chk)
    got = {r["customer_id"]: (r["name"], r["balance"])
           for r in store.read("dim_customers").collect()}
    assert got == {1: ("a1", 11.0), 2: ("b", 20.0)}

    # batch 2 (query restarted, same checkpoint): update + insert; the
    # checkpoint guarantees b1.json is not reprocessed
    _write_batch(
        landing,
        "b2.json",
        [
            {"customer_id": 2, "name": "b2", "balance": 21.0,
             "extracted_at": "2024-01-02 00:00:00", "seq": 4},
            {"customer_id": 3, "name": "c", "balance": 30.0,
             "extracted_at": "2024-01-02 00:00:00", "seq": 5},
        ],
    )
    _drain(spark, landing, store, chk)
    got = {r["customer_id"]: (r["name"], r["balance"])
           for r in store.read("dim_customers").collect()}
    assert got == {1: ("a1", 11.0), 2: ("b2", 21.0), 3: ("c", 30.0)}


def test_stream_merge_with_static_enrichment(spark, tmp_path):
    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh"))
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "silver")], "customer_id long, tier string"
    )

    _write_batch(
        landing,
        "b1.json",
        [
            {"customer_id": 1, "name": "a", "balance": 10.0,
             "extracted_at": "2024-01-01 00:00:00", "seq": 1},
            {"customer_id": 9, "name": "z", "balance": 90.0,
             "extracted_at": "2024-01-01 00:00:00", "seq": 2},
        ],
    )
    _drain(spark, landing, store, chk, dim=dim)
    got = {r["customer_id"]: r["tier"]
           for r in store.read("dim_customers").collect()}
    # stream-static left join: known key enriched, unknown key kept with NULL
    assert got == {1: "gold", 9: None}


def test_stream_checks_block_bad_batch_until_fixed(spark, tmp_path):
    """The streaming DQ circuit breaker: a micro-batch failing its
    constraint suite stops the query with offsets uncommitted — the
    target keeps its last good state — and after fixing the data IN
    PLACE a restart reprocesses the same files and succeeds."""
    import json as _json
    import os

    import pytest

    from logistics_data_pipeline_project_spark.plans import quality
    from logistics_data_pipeline_project_spark.plans.materialize import TableStore
    from logistics_data_pipeline_project_spark.streaming.upsert import (
        stream_merge_upsert,
    )

    landing = str(tmp_path / "landing")
    chk = str(tmp_path / "chk")
    os.makedirs(landing)
    store = TableStore(spark, str(tmp_path / "wh"))
    schema = "k long, v string, seq long"

    def write_file(name, rows):
        with open(os.path.join(landing, name), "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    def suite(df):
        return quality.run_checks(
            [("k_not_null", "t", lambda: quality.not_null(df, ["k"]))]
        )

    def run_once():
        stream = spark.readStream.format("json").schema(schema).load(landing)
        q = stream_merge_upsert(
            stream, store, "t", ["k"], "seq", "seq", chk, checks=suite
        )
        q.awaitTermination(180)

    write_file("b1.json", [{"k": 1, "v": "a", "seq": 1}])
    run_once()
    assert {(r["k"], r["v"]) for r in store.read("t").collect()} == {(1, "a")}

    # batch with a null key -> circuit breaker trips, target untouched
    write_file("b2.json", [{"k": None, "v": "x", "seq": 2}, {"k": 2, "v": "b", "seq": 2}])
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="k_not_null"):
        run_once()
    assert {(r["k"], r["v"]) for r in store.read("t").collect()} == {(1, "a")}

    # fix the file IN PLACE -> restart reprocesses the same batch
    write_file("b2.json", [{"k": 3, "v": "x", "seq": 2}, {"k": 2, "v": "b", "seq": 2}])
    run_once()
    assert {(r["k"], r["v"]) for r in store.read("t").collect()} == {
        (1, "a"), (2, "b"), (3, "x"),
    }
