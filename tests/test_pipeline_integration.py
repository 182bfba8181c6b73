"""Full-engine integration: the reference's medallion pipeline end to end
through every engine layer in one flow —

  REST fetch (fake) → landing JSON (S1/S2) → bulk read (S3) →
  flatten + 3-key dedup merge into fact_shipments (J7/P2/W1/M3) →
  silver dims via the model runner (M4/M5) → quality gate (dbt-test
  surface) → gold mart (J1/A4/A5) → archive lifecycle (K9) →
  HTML report (K7/K8)

A reference user's DAG (2_logistics-shipment-dag + gold metrics + report)
maps onto exactly this composition.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import Row, functions as F

from logistics_data_pipeline_project_spark.models.gold import seller_rto_performance
from logistics_data_pipeline_project_spark.models.shipments import ingest_shipment_batch
from logistics_data_pipeline_project_spark.plans.materialize import TableStore
from logistics_data_pipeline_project_spark.plans.quality import not_null, run_checks, unique
from logistics_data_pipeline_project_spark.plans.report import exec_summary_report
from logistics_data_pipeline_project_spark.sources.ingest import (
    archive_processed,
    fetch_api_to_landing,
)
from logistics_data_pipeline_project_spark.sources.readers import (
    has_pending_files,
    read_json_stage,
)


def _shipment(sid, order, seller, cost, rto):
    return {
        "shipment_id": sid,
        "carrier": {"carrier_id": "C100", "carrier_name": "Delhivery"},
        "route": {
            "origin": {"city": "Mumbai", "pincode": "400001", "warehouse_id": "W1"},
            "destination": {
                "city": "Bangalore",
                "pincode": "560001",
                "customer_address_type": "Home",
            },
        },
        "order_reference": {"order_id": order, "seller_id": seller, "channel": "App"},
        "charges": {
            "shipping_cost": cost,
            "fuel_surcharge": 10.0,
            "insurance": 2.0,
            "cod_fee": 5.0,
        },
        "shipment_details": {
            "status": "Delivered",
            "rto_flag": rto,
            "delay_flag": False,
            "delivery_tat_days": 3,
            "created_at": "2024-03-01 09:00:00",
            "delivered_at": "2024-03-04 12:00:00",
            "status_tracking": [
                {"status": "Created", "timestamp": "2024-03-01 09:00:00"},
                {"status": "Delivered", "timestamp": "2024-03-04 12:00:00"},
            ],
        },
    }


def test_medallion_pipeline_end_to_end(spark, tmp_path):
    landing = str(tmp_path / "landing")
    archive = str(tmp_path / "archive")
    store = TableStore(spark, str(tmp_path / "warehouse"))

    # --- bronze: REST → landing (two API batches, deterministic fetcher)
    batches = {
        "batch_0001.json": [
            _shipment("S1", "O1", "SELL1", 50.0, rto=False),
            _shipment("S2", "O2", "SELL1", 70.0, rto=True),
            _shipment("S3", "O3", "SELL2", 40.0, rto=False),
        ],
        "batch_0002.json": [
            # same 3-key as S1's (order, carrier, seller): latest wins in merge
            _shipment("S1", "O1", "SELL1", 55.0, rto=False),
            _shipment("S4", "O4", "SELL2", 90.0, rto=True),
        ],
    }
    for name, payload in batches.items():
        fetch_api_to_landing(
            "https://api.example.com/shipments",
            landing,
            token="tok",
            fetcher=lambda u, h, p, _pl=payload: _pl,
            filename=name,
        )
    assert has_pending_files(landing, "*.json")

    # --- bronze → silver: bulk JSON read, flatten, 3-key dedup merge
    raw = read_json_stage(spark, landing, multi_line=True)
    target = None
    fact = ingest_shipment_batch(raw, target)
    store.overwrite("fact_shipments", fact)
    fact = store.read("fact_shipments")
    # S1 deduped to one row (latest batch wins is not guaranteed across
    # files in one read — the merge guarantees ONE row per 3-key)
    assert fact.filter(F.col("SHIPMENT_ID") == "S1").count() == 1
    assert fact.count() == 4

    # --- quality gate before gold (the dbt `test >> run` ordering)
    results = run_checks(
        [
            ("not_null_keys", "fact_shipments",
             lambda: not_null(fact, ["ORDER_ID", "CARRIER_ID", "SELLER_ID"])),
            ("unique_3key", "fact_shipments",
             lambda: unique(fact, ["ORDER_ID", "CARRIER_ID", "SELLER_ID"])),
        ]
    )
    assert all(r.passed for r in results), results

    # --- gold: seller RTO performance mart (join + conditional agg + pct)
    dim_sellers = spark.createDataFrame(
        [Row(SELLER_ID="SELL1", SELLER_NAME="Seller One"),
         Row(SELLER_ID="SELL2", SELLER_NAME="Seller Two")]
    )
    gold = seller_rto_performance(fact, dim_sellers)
    by_seller = {r["seller_name"]: r for r in gold.collect()}
    assert by_seller["Seller One"]["total_orders"] == 2
    assert by_seller["Seller One"]["rto_orders"] == 1
    assert by_seller["Seller One"]["rto_pct"] == 50.0
    assert by_seller["Seller Two"]["rto_pct"] == 50.0

    # --- report sink + archive lifecycle
    sent = []
    html = exec_summary_report(
        {"seller_rto_performance": gold},
        send=lambda subject, body: sent.append(subject),
        subject="Daily Ops",
    )
    assert "Seller One" in html and sent == ["Daily Ops"]
    moved = archive_processed(landing, archive, batch_id="run1")
    assert len(moved) == 2
    assert not has_pending_files(landing, "*.json")

    # --- idempotent replay: re-ingesting the archived batch (lazy plans
    # must re-read from the ARCHIVE path — landing is empty now) merges to
    # the identical warehouse state
    replay = read_json_stage(spark, os.path.join(archive, "run1"), multi_line=True)
    fact2 = ingest_shipment_batch(replay, fact)
    assert (
        {tuple(r) for r in fact2.collect()} == {tuple(r) for r in fact.collect()}
    )


def test_cdc_feed_drives_downstream_replica(spark, tmp_path):
    """End-to-end CDC consumption: a downstream replica applies ONLY the
    change feed between two upstream snapshot versions (inserts/updates
    via merge, deletes via anti-join) and converges to exact equality
    with the upstream — the O(delta) refresh path, never re-reading the
    full history."""
    from pyspark.sql import functions as F

    from logistics_data_pipeline_project_spark.operators.merge import merge_upsert
    from logistics_data_pipeline_project_spark.plans.materialize import TableStore

    store = TableStore(spark, str(tmp_path / "wh"), retain_versions=4)
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k int, s string, v double",
    )
    store.overwrite("upstream", v1)
    base_v = store.current_version("upstream")
    # replica bootstraps from the full snapshot once
    store.overwrite("replica", store.read("upstream"))

    v2 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b2", 21.0), (4, "d", 40.0), (5, "e", 50.0)],
        "k int, s string, v double",
    )
    store.overwrite("upstream", v2)

    feed = store.changes("upstream", base_v, keys=["k"])
    upserts = feed.filter(F.col("_change_type") != "delete").drop("_change_type")
    deletes = feed.filter(F.col("_change_type") == "delete").select("k")

    replica = store.read("replica")
    replica = merge_upsert(
        replica,
        upserts,
        keys=["k"],
        update_set={"s": F.col("s.s"), "v": F.col("s.v")},
        strict=True,
    )
    replica = replica.join(deletes, "k", "left_anti")
    store.overwrite("replica", replica)

    got = sorted(tuple(r) for r in store.read("replica").collect())
    want = sorted(tuple(r) for r in v2.collect())
    assert got == want
    # and the feed itself was O(delta): 4 changed keys (1 update, 1
    # delete, 2 inserts), unchanged key 1 absent
    assert feed.count() == 4


def test_cusum_monitor_served_from_maintained_rollup(spark, sf_dir, tmp_path):
    """The q169 drift monitor must be servable from a watermark-maintained
    daily rollup (plans.incremental.incremental_rollup) without re-reading
    facts: fold the orders stream in three arbitrary date-split batches —
    including a replay of batch 2, which the watermark must ignore — and
    the CUSUM over the rollup must equal the direct single-pass query."""
    from pyspark.sql import functions as F

    from logistics_data_pipeline_project_spark.io_utils import load
    from logistics_data_pipeline_project_spark.plans.incremental import (
        incremental_rollup,
        read_rollup,
    )
    from logistics_data_pipeline_project_spark.queries.analytics import (
        cusum_top_days,
        q169_revenue_cusum_changepoint,
    )

    store = TableStore(spark, str(tmp_path / "wh"))
    o = load(spark, sf_dir, "orders").select(
        F.to_date("o_orderdate").alias("d"),
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("cents"),
        F.col("o_orderdate").alias("cursor"),
    )
    cuts = ["1994-01-01", "1996-06-15"]
    batches = [
        o.filter(F.col("d") < cuts[0]),
        o.filter((F.col("d") >= cuts[0]) & (F.col("d") < cuts[1])),
        o.filter((F.col("d") >= cuts[0]) & (F.col("d") < cuts[1])),  # replay
        o.filter(F.col("d") >= cuts[1]),
    ]
    for b in batches:
        incremental_rollup(
            store,
            "daily_revenue",
            b,
            keys=["d"],
            measures={"cents": ("cents", "sum")},
            cursor_col="cursor",
        )
    served = cusum_top_days(read_rollup(store, "daily_revenue"))
    direct = q169_revenue_cusum_changepoint(spark, sf_dir)
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, direct.collect())
    )
