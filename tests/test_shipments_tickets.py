"""Tests for the flagship shipment JSON flow (flatten → status extraction
→ 3-key dedup merge) and the ticket classification flow. The shipment
fixture is the FIXTURES.md / reference JSON shape."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.models.shipments import (
    flatten_shipments,
    ingest_shipment_batch,
)
from logistics_data_pipeline_project_spark.models.tickets import (
    enrich_tickets,
    flatten_tickets,
)
from logistics_data_pipeline_project_spark.operators.ml_text import (
    TRAINING_DATA,
    default_model,
)
from logistics_data_pipeline_project_spark.plans.report import (
    df_to_html_table,
    exec_summary_report,
)


def _shipment(sid, order="O1", carrier="C100", seller="S001", created="2024-01-02 10:00:00",
              status="Delivered", tracking=None):
    return {
        "shipment_id": sid,
        "carrier": {"carrier_id": carrier, "carrier_name": "Delhivery"},
        "route": {
            "origin": {"city": "Mumbai", "pincode": "400001", "warehouse_id": "W1"},
            "destination": {"city": "Bangalore", "pincode": "560001", "customer_address_type": "Home"},
        },
        "order_reference": {"order_id": order, "seller_id": seller, "channel": "App"},
        "charges": {"shipping_cost": 50.0, "fuel_surcharge": 20.0, "insurance": 5.0, "cod_fee": 10.0},
        "shipment_details": {
            "status": status, "rto_flag": False, "delay_flag": True, "delivery_tat_days": 2,
            "created_at": created, "delivered_at": "2024-01-05 18:00:00",
            "status_tracking": tracking if tracking is not None else [
                {"status": "Created", "timestamp": "2024-01-02 10:00:00"},
                {"status": "Created", "timestamp": "2024-01-02 11:00:00"},  # later Created wins
                {"status": "Delivered", "timestamp": "2024-01-05 18:00:00"},
            ],
        },
    }


@pytest.fixture()
def raw_shipments(spark, tmp_path):
    docs = [
        _shipment("S1"),
        _shipment("S2", order="O1", created="2024-01-03 10:00:00"),  # same 3-key, newer
        _shipment("S3", order="O2", created="bad-timestamp", tracking=[]),  # lenient cast
    ]
    p = os.path.join(str(tmp_path), "shipments.json")
    with open(p, "w") as f:
        json.dump(docs, f)
    return spark.read.option("multiLine", "true").json(p)


def test_flatten_shipments_projection_and_status(spark, raw_shipments):
    flat = flatten_shipments(raw_shipments)
    rows = {r["shipment_id"]: r.asDict() for r in flat.collect()}
    assert len(rows) == 3
    s1 = rows["S1"]
    assert s1["origin_city"] == "Mumbai" and s1["destination_pincode"] == "560001"
    assert s1["shipping_cost"] == 50.0 and s1["delivery_tat_days"] == 2
    # latest 'Created' tracking event wins (QUALIFY rn=1 over ts desc)
    assert str(s1["status_created_at"]) == "2024-01-02 11:00:00"
    assert str(s1["status_delivered_at"]) == "2024-01-05 18:00:00"
    # lenient casts: bad created_at → NULL; empty tracking → NULL statuses
    s3 = rows["S3"]
    assert s3["created_at"] is None
    assert s3["status_created_at"] is None


def test_ingest_dedups_and_merges(spark, raw_shipments):
    # bootstrap: S1/S2 share (order,carrier,seller) → latest created_at (S2) wins
    fact = ingest_shipment_batch(raw_shipments)
    rows = {r["order_id"]: r for r in fact.collect()}
    assert fact.count() == 2
    assert rows["O1"]["shipment_id"] == "S2"

    # second batch: update O1 key with newer shipment + brand-new order
    import json as _json, os as _os, tempfile

    docs = [_shipment("S9", order="O1", created="2024-02-01 10:00:00", status="RTO"),
            _shipment("S10", order="O7", seller="S002")]
    d = tempfile.mkdtemp()
    with open(_os.path.join(d, "b2.json"), "w") as f:
        _json.dump(docs, f)
    raw2 = spark.read.option("multiLine", "true").json(_os.path.join(d, "b2.json"))
    fact2 = ingest_shipment_batch(raw2, target=fact)
    rows2 = {(r["order_id"], r["seller_id"]): r for r in fact2.collect()}
    assert fact2.count() == 3  # O1 updated, O2 untouched, O7 inserted
    assert rows2[("O1", "S001")]["shipment_id"] == "S9"  # updated
    assert rows2[("O1", "S001")]["status"] == "RTO"
    assert rows2[("O2", "S001")]["shipment_id"] == "S3"  # untouched
    assert ("O7", "S002") in rows2  # inserted


def test_ticket_flow_classification(spark, tmp_path):
    docs = [
        {"ticket_id": "T1", "customer": {"id": "C1"}, "message": {"body": "I want to cancel my order"}, "created_at": "2025-09-01T10:00:00"},
        {"ticket_id": "T2", "customer": {"id": "C2"}, "message": {"body": "The payment failed via UPI"}, "created_at": "2025-09-01T11:00:00"},
        {"ticket_id": "T3", "customer": {"id": "C3"}, "message": {"body": ""}, "created_at": "2025-09-01T12:00:00"},
    ]
    p = os.path.join(str(tmp_path), "tickets.json")
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    flat = flatten_tickets(spark.read.json(p))
    assert flat.columns == ["TICKET_ID", "CUSTOMER_ID", "MESSAGE_TEXT", "CREATED_AT"]
    enriched = enrich_tickets(flat)
    cats = {r["TICKET_ID"]: r["TICKET_CATEGORY"] for r in enriched.collect()}
    assert cats["T1"] == "Order Cancellation"
    assert cats["T2"] == "Payment Issue"
    assert cats["T3"] == "Unknown"  # empty message


def test_model_classifies_training_set():
    """Golden test: the TF-IDF → logistic-regression pipeline (the
    reference's model class, dags/4_logistics_ticket_classifier_full_dag
    .py:32-52) reproduces the 10-example training labels exactly."""
    m = default_model()
    texts, labels = zip(*TRAINING_DATA)
    assert m.predict(list(texts)) == list(labels)


def test_lr_and_centroid_models_agree_on_probes():
    """Differential check between the LR model and the dependency-free
    centroid fallback on unambiguous held-out probes — plus determinism
    of the fitted LR weights across independent fits (no RNG anywhere)."""
    from logistics_data_pipeline_project_spark.operators.ml_text import (
        centroid_model,
        default_model as fit_lr,
    )

    probes = [
        "cancel my subscription order now",
        "refund did not arrive after payment",
        "parcel is late again",
    ]
    want = ["Order Cancellation", "Payment Issue", "Delivery Issue"]
    lr, cen = fit_lr(), centroid_model()
    assert lr.predict(probes) == want
    assert cen.predict(probes) == want
    assert fit_lr().W == lr.W and fit_lr().b == lr.b


def test_report_sink(spark):
    df = spark.createDataFrame([("Delhivery", 50.0), ("BlueDart", 100.0)], "courier string, delay_pct double")
    sent = {}
    body = exec_summary_report(
        {"Delay rates": df.orderBy(F.desc("delay_pct"))},
        send=lambda subj, b: sent.update(subject=subj, body=b),
        subject="daily ops",
    )
    assert "Delay rates" in body and "Delhivery" in body and "<table" in body
    assert sent["subject"] == "daily ops" and sent["body"] == body
    assert df_to_html_table(df, max_rows=1).count("<tr>") == 2  # header + 1 row
