"""End-to-end model-runner test: a miniature medallion pipeline (raw →
silver incremental → gold view) run twice to prove incremental merge,
snapshot SCD2, audit logging, and idempotence."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row, functions as F

from logistics_data_pipeline_project_spark.models import silver
from logistics_data_pipeline_project_spark.plans import Model, ModelRunner, TableStore


def ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "warehouse"))


def _raw_orders(spark, batch):
    if batch == 1:
        rows = [
            Row(ORDER_ID="O1", ORDER_DATE=ts("2024-01-01"), PRODUCT_ID="P1", CUSTOMER_ID="C1",
                TOTAL_AMOUNT=100.0, PAYMENT_METHOD="COD", _AIRBYTE_EXTRACTED_AT=ts("2024-01-02")),
            Row(ORDER_ID="O2", ORDER_DATE=ts("2024-01-02"), PRODUCT_ID="P2", CUSTOMER_ID="C2",
                TOTAL_AMOUNT=200.0, PAYMENT_METHOD="Prepaid", _AIRBYTE_EXTRACTED_AT=ts("2024-01-02")),
            Row(ORDER_ID=None, ORDER_DATE=ts("2024-01-02"), PRODUCT_ID="P2", CUSTOMER_ID="C2",
                TOTAL_AMOUNT=5.0, PAYMENT_METHOD="COD", _AIRBYTE_EXTRACTED_AT=ts("2024-01-02")),
        ]
    else:
        rows = [
            # updated O2 + new O3, newer watermark; O1 unchanged (older wm)
            Row(ORDER_ID="O2", ORDER_DATE=ts("2024-01-02"), PRODUCT_ID="P2", CUSTOMER_ID="C2",
                TOTAL_AMOUNT=250.0, PAYMENT_METHOD="Prepaid", _AIRBYTE_EXTRACTED_AT=ts("2024-02-01")),
            Row(ORDER_ID="O3", ORDER_DATE=ts("2024-01-20"), PRODUCT_ID="P1", CUSTOMER_ID="C1",
                TOTAL_AMOUNT=300.0, PAYMENT_METHOD="COD", _AIRBYTE_EXTRACTED_AT=ts("2024-02-01")),
        ]
    return spark.createDataFrame(
        rows,
        schema="ORDER_ID string, ORDER_DATE timestamp, PRODUCT_ID string, CUSTOMER_ID string, "
        "TOTAL_AMOUNT double, PAYMENT_METHOD string, _AIRBYTE_EXTRACTED_AT timestamp",
    )


def _build_runner(spark, store, batch):
    runner = ModelRunner(spark, store, threads=3)
    runner.register(
        Model(
            name="fact_orders",
            fn=lambda sp, ref: silver.fact_orders(
                _raw_orders(sp, batch),
                store.read("fact_orders") if store.exists("fact_orders") else None,
            ),
            materialization="incremental",
            unique_key="ORDER_ID",
            watermark_col="_AIRBYTE_EXTRACTED_AT",
        )
    )
    runner.register(
        Model(
            name="error_orders",
            fn=lambda sp, ref: silver.silver_error_orders(_raw_orders(sp, batch)),
            materialization="table",
        )
    )
    runner.register(
        Model(
            name="orders_by_method",
            fn=lambda sp, ref: ref("fact_orders")
            .groupBy("PAYMENT_METHOD")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum(F.col("TOTAL_AMOUNT").cast("decimal(18,2)")), 2)
                .cast("double")
                .alias("revenue"),
            ),
            deps=("fact_orders",),
            materialization="view",
        )
    )
    runner.register(
        Model(
            name="scd_orders",
            fn=lambda sp, ref: ref("fact_orders").select(
                "ORDER_ID", "TOTAL_AMOUNT", "PAYMENT_METHOD"
            ),
            deps=("fact_orders",),
            materialization="snapshot",
            unique_key="ORDER_ID",
            tracked_cols=("TOTAL_AMOUNT", "PAYMENT_METHOD"),
        )
    )
    return runner


def test_pipeline_two_batches(spark, store):
    # batch 1: bootstrap
    r1 = _build_runner(spark, store, batch=1)
    run1 = r1.run()
    fo = store.read("fact_orders")
    assert {r["ORDER_ID"] for r in fo.collect()} == {"O1", "O2"}  # null routed out
    errs = store.read("error_orders")
    assert errs.count() == 1 and errs.first()["error_reason"] == "Missing ORDER_ID"
    view = spark.table("orders_by_method")
    assert {r["PAYMENT_METHOD"]: r["revenue"] for r in view.collect()} == {
        "COD": 100.0,
        "Prepaid": 200.0,
    }
    scd = store.read("scd_orders")
    assert scd.count() == 2 and all(r["is_current"] for r in scd.collect())

    # batch 2: incremental merge (watermark excludes replays), SCD2 history
    r2 = _build_runner(spark, store, batch=2)
    run2 = r2.run()
    fo2 = store.read("fact_orders")
    rows = {r["ORDER_ID"]: r["TOTAL_AMOUNT"] for r in fo2.collect()}
    assert rows == {"O1": 100.0, "O2": 250.0, "O3": 300.0}

    scd2 = store.read("scd_orders")
    # O1 unchanged (1 row), O2 changed (closed + new), O3 new → 4 rows
    assert scd2.count() == 4
    o2 = [r.asDict() for r in scd2.filter(F.col("ORDER_ID") == "O2").collect()]
    assert {(r["TOTAL_AMOUNT"], r["is_current"]) for r in o2} == {(200.0, False), (250.0, True)}

    # audit log: one row per model per run, SUCCESS
    audit = r2.audit_log()
    assert audit.filter(F.col("status") == "SUCCESS").count() == 8
    assert {r["run_id"] for r in audit.collect()} == {run1, run2}


def test_runner_cycle_detection(spark, store):
    runner = ModelRunner(spark, store)
    runner.register(Model(name="a", fn=lambda sp, ref: ref("b"), deps=("b",)))
    runner.register(Model(name="b", fn=lambda sp, ref: ref("a"), deps=("a",)))
    with pytest.raises(ValueError, match="cycle"):
        runner.run()


def test_runner_failure_is_audited(spark, store):
    def boom(sp, ref):
        raise RuntimeError("model exploded")

    runner = ModelRunner(spark, store)
    runner.register(Model(name="bad", fn=boom, materialization="table"))
    with pytest.raises(RuntimeError, match="model exploded"):
        runner.run()
    audit = runner.audit_log()
    assert audit.filter((F.col("job_name") == "bad") & (F.col("status") == "FAILED")).count() == 1
