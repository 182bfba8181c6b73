"""End-to-end test of the EDW sales flow: raw positional CSV → bronze
split → silver merge → dims → fact → gold aggregations."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.models import edw
from logistics_data_pipeline_project_spark.sources import read_csv_stage


def _stage(tmp_path):
    d = str(tmp_path / "stage")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "sales_1.csv"), "w") as f:
        f.write("c1,c2,c3,c4,c5,c6,c7,c8,c9\n")
        f.write("SO1,1,2024-06-01,Alice,alice@x.com,Gaming Laptop,2,1000.0,50.0\n")
        f.write("SO1,2,2024-06-01,Alice,alice@x.com,Running Shoes,1,100.0,5.0\n")
        f.write("SO2,1,2024-06-02,Bob,bob@y.com,Smart Phone,1,500.0,25.0\n")
        f.write("SO3,1,2024-06-02,Eve,no-at-sign,Desk,1,50.0,2.0\n")   # bad email → silver drop
        f.write("SO4,1,bad-date,Mallory,m@z.com,Chair,1,20.0,1.0\n")   # bad date → error
        f.write("SO5,1,2024-06-03,Trent,t@z.com,Lamp,0,10.0,1.0\n")    # qty 0 → error
    return d


def test_edw_flow_end_to_end(spark, tmp_path):
    raw = read_csv_stage(spark, _stage(tmp_path), positional_names=True)
    casted = edw.bronze_cast(raw)
    valid, errors = edw.bronze_split(casted)
    assert valid.count() == 4  # SO1×2, SO2, SO3 (bad email passes bronze)
    reasons = {r["SALES_ORDER_NUMBER"]: r["ERROR_REASON"] for r in errors.collect()}
    assert reasons["SO4"] == "Invalid ORDER_DATE"
    assert reasons["SO5"] == "Invalid QUANTITY"

    silver = edw.silver_processed_sales(valid)
    assert silver.count() == 3  # SO3 dropped (no @)

    # merge replay with a line update: same 4-key → measures refresh
    update = silver.filter(F.col("SALES_ORDER_NUMBER") == "SO2").withColumn(
        "QUANTITY", F.lit(5)
    )
    merged = edw.silver_processed_sales(update, target=silver)
    assert merged.count() == 3
    so2 = merged.filter(F.col("SALES_ORDER_NUMBER") == "SO2").first()
    assert so2["QUANTITY"] == 5

    dd = edw.dim_date(silver)
    assert {r["ORDER_DATE_ID"] for r in dd.collect()} == {"20240601", "20240602"}
    d1 = dd.filter(F.col("ORDER_DATE_ID") == "20240601").first()
    assert (d1["YEAR"], d1["MONTH"], d1["DAY"], d1["YYYYMM"]) == (2024, 6, 1, "202406")

    dc = edw.dim_customer(silver)
    types = {r["EMAIL"]: r["CUSTOMER_TYPE"] for r in dc.collect()}
    assert types["alice@x.com"] == "Returning Customer"  # 2 lines
    assert types["bob@y.com"] == "New Customer"

    dp = edw.dim_product(silver)
    cats = {r["ITEM_NAME"]: r["CATEGORY"] for r in dp.collect()}
    assert cats["Gaming Laptop"] == "Electronics"
    assert cats["Running Shoes"] == "Footwear"
    assert cats["Smart Phone"] == "Mobile Devices"

    fact = edw.fact_sales(silver, dc, dp, dd)
    assert fact.count() == 3
    amounts = {
        (r["SALES_ORDER_NUMBER"], r["ITEM_ID"]): r["TOTAL_SALES_AMOUNT"]
        for r in fact.collect()
    }
    laptop_id = dp.filter(F.col("ITEM_NAME") == "Gaming Laptop").first()["ITEM_ID"]
    assert amounts[("SO1", laptop_id)] == 2 * 1000.0 + 50.0

    by_day = edw.gold_sales_summary_by_day(fact, dd)
    d = {str(r["ORDER_DATE"]): (r["TOTAL_SALES"], r["TOTAL_UNITS_SOLD"], r["TOTAL_ORDERS"]) for r in by_day.collect()}
    assert d["2024-06-01"] == (2050.0 + 105.0, 3, 1)
    assert d["2024-06-02"] == (525.0, 1, 1)

    cust_agg = edw.gold_customer_sales_agg(fact, dc, dd)
    alice = cust_agg.filter(F.col("CUSTOMER_NAME") == "Alice").first()
    assert alice["TOTAL_QUANTITY"] == 3 and alice["ACTIVE_DAYS"] == 1

    prod = edw.gold_product_sales_summary(fact, dp)
    laptop = prod.filter(F.col("ITEM_NAME") == "Gaming Laptop").first()
    assert laptop["UNITS_SOLD"] == 2 and laptop["REVENUE"] == 2050.0 and laptop["ORDER_COUNT"] == 1
