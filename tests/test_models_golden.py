"""Golden given/expect tests for the gold marts — verbatim ports of the
reference's dbt unit tests (SURVEY §5 level 2):

- dbt/dbt-project/tests/test__delivery_performance_by_courier.yml:1-24
- dbt/dbt-project/tests/unit_tests/test__delivery_sla_rootcause.yml:1-48
- dbt/dbt-project/tests/unit_tests/test__seller_performance.yml:1-27
- dbt/dbt-project/tests/unit_tests/test__seller_product_profitability.yml:1-49

These encode the trickiest semantics: conditional aggregation, ratio
rounding (91.33 via ROUND(x,4)*100), DATEDIFF day-boundary math, and the
orders⋈inventory fan-out reproduced as written.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from logistics_data_pipeline_project_spark.models import gold


def _rows(df):
    return sorted([r.asDict() for r in df.collect()], key=repr)


def ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_delivery_performance_by_courier(spark):
    shipments = spark.createDataFrame(
        [
            Row(CARRIER_ID="C001", CARRIER_NAME="Delhivery", DELIVERY_TAT_DAYS=2, DELAY_FLAG=True),
            Row(CARRIER_ID="C001", CARRIER_NAME="Delhivery", DELIVERY_TAT_DAYS=3, DELAY_FLAG=False),
            Row(CARRIER_ID="C002", CARRIER_NAME="BlueDart", DELIVERY_TAT_DAYS=5, DELAY_FLAG=True),
        ]
    )
    couriers = spark.createDataFrame(
        [Row(COURIER_ID="C001", NAME="Delhivery"), Row(COURIER_ID="C002", NAME="BlueDart")]
    )
    out = {r["CARRIER_NAME"]: r for r in _rows(gold.delivery_performance_by_courier(shipments, couriers))}
    assert out["Delhivery"]["total_shipments"] == 2
    assert out["Delhivery"]["avg_delivery_days"] == pytest.approx(2.5)
    assert out["Delhivery"]["delay_percentage"] == pytest.approx(50.0)
    assert out["BlueDart"]["total_shipments"] == 1
    assert out["BlueDart"]["avg_delivery_days"] == pytest.approx(5.0)
    assert out["BlueDart"]["delay_percentage"] == pytest.approx(100.0)


def test_delivery_sla_rootcause(spark):
    orders = spark.createDataFrame(
        [
            Row(ORDER_ID="O1", ORDER_DATE=ts("2024-01-01"), PRODUCT_ID="P1", CUSTOMER_ID="C1", TOTAL_AMOUNT=500.0, PAYMENT_METHOD="COD"),
            Row(ORDER_ID="O2", ORDER_DATE=ts("2024-01-02"), PRODUCT_ID="P1", CUSTOMER_ID="C2", TOTAL_AMOUNT=700.0, PAYMENT_METHOD="Prepaid"),
        ]
    )
    shipments = spark.createDataFrame(
        [
            Row(SHIPMENT_ID="S1", ORDER_ID="O1", SELLER_ID="S001", CARRIER_ID="C100", CHANNEL="App",
                CREATED_AT=ts("2024-01-02"), DELIVERED_AT=ts("2024-01-05"), DELIVERY_TAT_DAYS=2,
                DELAY_FLAG=True, RTO_FLAG=True, DESTINATION_PINCODE="560001", STATUS="Delivered"),
            Row(SHIPMENT_ID="S2", ORDER_ID="O2", SELLER_ID="S001", CARRIER_ID="C100", CHANNEL="Web",
                CREATED_AT=ts("2024-01-03"), DELIVERED_AT=ts("2024-01-04"), DELIVERY_TAT_DAYS=2,
                DELAY_FLAG=False, RTO_FLAG=False, DESTINATION_PINCODE="560001", STATUS="Delivered"),
        ]
    )
    sellers = spark.createDataFrame([Row(SELLER_ID="S001", SELLER_NAME="ShopX")])
    couriers = spark.createDataFrame([Row(COURIER_ID="C100", NAME="Delhivery")])
    locations = spark.createDataFrame([Row(PINCODE="560001", CITY="Bangalore")])

    rows = _rows(gold.delivery_sla_rootcause(orders, shipments, sellers, couriers, locations))
    assert len(rows) == 1
    r = rows[0]
    assert r["SELLER_NAME"] == "ShopX"
    assert r["CARRIER_NAME"] == "Delhivery"
    assert r["destination_city"] == "Bangalore"
    assert r["total_deliveries"] == 2
    assert r["delayed_shipments"] == 1
    assert r["avg_delivery_time"] == pytest.approx(3.0)
    assert r["avg_fulfillment_lag"] == pytest.approx(1.0)
    assert r["avg_courier_lag"] == pytest.approx(2.0)
    assert r["seller_root_causes"] == 0
    assert r["courier_root_causes"] == 1
    assert r["delay_rate_percentage"] == pytest.approx(50.0)


def test_seller_performance_fanout(spark):
    orders = spark.createDataFrame([Row(ORDER_ID="O1", PRODUCT_ID="P1"), Row(ORDER_ID="O2", PRODUCT_ID="P1")])
    shipments = spark.createDataFrame(
        [
            Row(SHIPMENT_ID="S1", ORDER_ID="O1", DELIVERY_TAT_DAYS=2, RTO_FLAG=True),
            Row(SHIPMENT_ID="S2", ORDER_ID="O2", DELIVERY_TAT_DAYS=3, RTO_FLAG=False),
        ]
    )
    inventory = spark.createDataFrame([Row(PRODUCT_ID="P1", SELLER_ID="S001")])
    sellers = spark.createDataFrame([Row(SELLER_ID="S001", SELLER_NAME="ShopX")])
    rows = _rows(gold.seller_performance(orders, shipments, inventory, sellers))
    assert len(rows) == 1
    r = rows[0]
    assert r["SELLER_ID"] == "S001"
    assert r["SELLER_NAME"] == "ShopX"
    assert r["total_orders"] == 2
    assert r["total_shipments"] == 2
    assert r["avg_delivery_time"] == pytest.approx(2.5)
    assert r["rto_percentage"] == pytest.approx(50.0)


def test_seller_product_profitability_margin_rounding(spark):
    orders = spark.createDataFrame(
        [
            Row(ORDER_ID="O1", ORDER_DATE=ts("2024-06-01"), PRODUCT_ID="P1", CUSTOMER_ID="C1", TOTAL_AMOUNT=1000.0, PAYMENT_METHOD="COD"),
            Row(ORDER_ID="O2", ORDER_DATE=ts("2024-06-02"), PRODUCT_ID="P1", CUSTOMER_ID="C2", TOTAL_AMOUNT=500.0, PAYMENT_METHOD="Prepaid"),
        ]
    )
    shipments = spark.createDataFrame(
        [
            Row(SHIPMENT_ID="S1", ORDER_ID="O1", SELLER_ID="S001", CARRIER_ID="C001", CHANNEL="Web",
                SHIPPING_COST=50.0, FUEL_SURCHARGE=20.0, COD_FEE=10.0, INSURANCE=5.0,
                DELAY_FLAG=False, RTO_FLAG=False, DELIVERY_TAT_DAYS=2, DELIVERED_AT=ts("2024-06-04"),
                DESTINATION_PINCODE="560001", STATUS="Delivered"),
            Row(SHIPMENT_ID="S2", ORDER_ID="O2", SELLER_ID="S001", CARRIER_ID="C001", CHANNEL="App",
                SHIPPING_COST=30.0, FUEL_SURCHARGE=10.0, COD_FEE=0.0, INSURANCE=5.0,
                DELAY_FLAG=False, RTO_FLAG=False, DELIVERY_TAT_DAYS=2, DELIVERED_AT=ts("2024-06-03"),
                DESTINATION_PINCODE="560001", STATUS="Delivered"),
        ]
    )
    inventory = spark.createDataFrame(
        [Row(ID=1, PRODUCT_ID="P1", SELLER_ID="S001", STOCK=50, LAST_UPDATED=ts("2024-06-01"))]
    )
    sellers = spark.createDataFrame([Row(SELLER_ID="S001", SELLER_NAME="MegaStore")])
    products = spark.createDataFrame([Row(PRODUCT_ID="P1", PRODUCT_NAME="Smartwatch", CATEGORY="Electronics")])
    locations = spark.createDataFrame([Row(PINCODE="560001", CITY="Bangalore", STATE="Karnataka", ZONE="South")])

    rows = _rows(
        gold.seller_product_profitability(orders, shipments, inventory, locations, products, sellers)
    )
    assert len(rows) == 1
    r = rows[0]
    assert r["SELLER_NAME"] == "MegaStore"
    assert r["CATEGORY"] == "Electronics"
    assert r["PRODUCT_NAME"] == "Smartwatch"
    assert r["DELIVERY_REGION"] == "South"
    assert r["total_orders"] == 2
    assert r["revenue"] == pytest.approx(1500.00)
    assert r["logistics_expense"] == pytest.approx(130.00)
    assert r["gross_profit"] == pytest.approx(1370.00)
    assert r["gross_margin_pct"] == pytest.approx(91.33)
