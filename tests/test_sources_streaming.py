"""Tests for stage readers (CSV/JSON option parity, file metadata, seeds,
skip-if-empty) and the Structured Streaming landing pipeline."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.sources import (
    has_pending_files,
    read_csv_stage,
    read_json_stage,
    read_seed_csv,
    with_file_metadata,
)
from logistics_data_pipeline_project_spark.streaming import (
    stream_file_landing,
    stream_hourly_event_counts,
)

CSV_SCHEMA = (
    "SALES_ORDER_NUMBER string, SALES_ORDER_LINENUMBER int, ORDER_DATE date, "
    "CUSTOMER_NAME string, EMAIL string, ITEM string, QUANTITY int, "
    "UNITPRICE decimal(8,4), TAX decimal(8,2)"
)


def _write_sales_csv(d, name="sales_1.csv"):
    p = os.path.join(d, name)
    with open(p, "w") as f:
        f.write("order,line,date,name,email,item,qty,price,tax\n")
        f.write('SO1,1,2024-01-01,Alice,alice@x.com,Laptop,2,999.5000,10.00\n')
        f.write('SO2,1,2024-01-02,Bob,not-an-email,Mouse,1,25.0000,1.50\n')
        f.write('SO3,1,bad-date,Carol,carol@x.com,Desk,not-a-number,10.0,0.10\n')
    return p


def test_csv_stage_reader_options_and_permissive(spark, tmp_path):
    d = str(tmp_path / "stage")
    os.makedirs(d)
    _write_sales_csv(d)
    df = read_csv_stage(spark, d, schema=CSV_SCHEMA, pattern="sales_*.csv")
    rows = {r["SALES_ORDER_NUMBER"]: r for r in df.collect()}
    assert rows["SO1"]["QUANTITY"] == 2
    assert float(rows["SO1"]["UNITPRICE"]) == 999.5
    # malformed cells → NULL (Snowflake TRY_CAST-like permissive read)
    assert rows["SO3"]["ORDER_DATE"] is None
    assert rows["SO3"]["QUANTITY"] is None
    # pattern filter excludes other files
    _write_sales_csv(d, "other.csv")
    assert read_csv_stage(spark, d, schema=CSV_SCHEMA, pattern="sales_*.csv").count() == 3


def test_csv_positional_names(spark, tmp_path):
    d = str(tmp_path / "pos")
    os.makedirs(d)
    _write_sales_csv(d)
    df = read_csv_stage(spark, d, positional_names=True)
    assert df.columns[:3] == ["c1", "c2", "c3"]


def test_file_metadata_columns(spark, tmp_path):
    d = str(tmp_path / "meta")
    os.makedirs(d)
    _write_sales_csv(d, "a.csv")
    _write_sales_csv(d, "b.csv")
    df = with_file_metadata(read_csv_stage(spark, d, schema=CSV_SCHEMA), row_number=True)
    rows = df.collect()
    assert all(r["METADATA_FILENAME"].endswith((".csv",)) for r in rows)
    assert all(len(r["METADATA_FILE_CONTENT_KEY"]) == 32 for r in rows)
    per_file = {}
    for r in rows:
        per_file.setdefault(os.path.basename(r["METADATA_FILENAME"]), []).append(
            r["METADATA_FILE_ROW_NUMBER"]
        )
    assert sorted(per_file["a.csv"]) == [1, 2, 3]
    assert sorted(per_file["b.csv"]) == [1, 2, 3]


def test_json_stage_reader(spark, tmp_path):
    d = str(tmp_path / "json")
    os.makedirs(d)
    doc = [{"shipment_id": "S1", "charges": {"shipping_cost": 50.0}},
           {"shipment_id": "S2", "charges": {"shipping_cost": 30.0}}]
    with open(os.path.join(d, "batch1.json"), "w") as f:
        json.dump(doc, f)
    df = read_json_stage(spark, d)
    assert df.count() == 2
    assert df.select(F.col("charges.shipping_cost")).agg(F.sum("shipping_cost")).first()[0] == 80.0


def test_seed_and_pending_check(spark, tmp_path):
    d = str(tmp_path / "seed")
    os.makedirs(d)
    p = os.path.join(d, "control_table.csv")
    with open(p, "w") as f:
        f.write("name,key,value,description\n")
        f.write("m1,min_order_amount,500,min amt\n")
        f.write("m1,excluded_customer_ids,\"C1,C2\",skip\n")
    seed = read_seed_csv(spark, p)
    assert seed.count() == 2
    assert has_pending_files(d, "*.csv")
    assert not has_pending_files(d, "*.parquet")


def test_streaming_landing_archive_and_windows(spark, tmp_path):
    landing = str(tmp_path / "landing")
    archive = str(tmp_path / "archive")
    chk = str(tmp_path / "chk")
    out = str(tmp_path / "out")
    os.makedirs(landing)
    rows = [
        {"event_id": 1, "ts": "2024-01-01 10:05:00", "event_type": "click", "value": 1.5},
        {"event_id": 2, "ts": "2024-01-01 10:45:00", "event_type": "click", "value": 2.5},
        {"event_id": 3, "ts": "2024-01-01 11:10:00", "event_type": "view", "value": 4.0},
        # sentinel: advances the watermark past 12:00 so both asserted
        # windows finalize under append mode (its own window stays open)
        {"event_id": 4, "ts": "2024-01-01 13:00:00", "event_type": "view", "value": 0.0},
    ]
    with open(os.path.join(landing, "e1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    schema = "event_id long, ts timestamp, event_type string, value double"
    stream = stream_file_landing(
        spark, landing, schema, fmt="json", archive_dir=archive
    )
    agg = stream_hourly_event_counts(stream, watermark="0 seconds")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    res = spark.read.parquet(out)
    got = {(str(r["window_start"]), r["event_type"]): (r["n_events"], r["sum_value"]) for r in res.collect()}
    assert got[("2024-01-01 10:00:00", "click")] == (2, 4.0)
    assert got[("2024-01-01 11:00:00", "view")] == (1, 4.0)

    # cleanSource=archive moved the consumed file out of landing
    deadline = time.time() + 60
    while time.time() < deadline and os.listdir(landing):
        time.sleep(1)
    assert not os.listdir(landing)
    archived = [p for _, _, fs in os.walk(archive) for p in fs]
    assert "e1.json" in archived


def test_stream_stream_attribution_join(spark, tmp_path):
    from logistics_data_pipeline_project_spark.streaming import (
        stream_attribution_join,
    )

    clicks_dir = tmp_path / "clicks"
    purch_dir = tmp_path / "purchases"
    clicks_dir.mkdir()
    purch_dir.mkdir()
    schema = "user_id long, ts timestamp, value double"

    def _write(d, name, rows):
        with open(os.path.join(str(d), name), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    _write(
        clicks_dir,
        "c1.json",
        [
            {"user_id": 1, "ts": "2024-01-01 10:00:00", "value": 0.0},
            {"user_id": 1, "ts": "2024-01-01 11:30:00", "value": 0.0},
            {"user_id": 2, "ts": "2024-01-01 10:00:00", "value": 0.0},
        ],
    )
    _write(
        purch_dir,
        "p1.json",
        [
            # within 1h of user 1's 10:00 click only
            {"user_id": 1, "ts": "2024-01-01 10:30:00", "value": 50.0},
            # within 1h of user 1's 11:30 click only
            {"user_id": 1, "ts": "2024-01-01 12:00:00", "value": 70.0},
            # user 3 never clicked
            {"user_id": 3, "ts": "2024-01-01 10:15:00", "value": 9.0},
        ],
    )

    clicks = stream_file_landing(spark, str(clicks_dir), schema, fmt="json")
    purchases = stream_file_landing(spark, str(purch_dir), schema, fmt="json")
    joined = stream_attribution_join(clicks, purchases, max_delay="1 hour")
    q = (
        joined.writeStream.format("memory")
        .queryName("attrib")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["click_ts"]), str(r["purchase_ts"]), r["purchase_value"])
        for r in spark.table("attrib").collect()
    }
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:30:00", 50.0),
        (1, "2024-01-01 11:30:00", "2024-01-01 12:00:00", 70.0),
    }
