"""EDW sales warehouse flow (SURVEY §3.3, entry point C): the reference's
Snowpark DataFrame program (dags/snowspark-dataframe-ETL.py) — near-verbatim
in PySpark because Snowpark's API was modeled on it.

Stages (each a pure DataFrame function; chaining/materialization is the
runner's job, mirroring the reference's through-storage stage handoff):

bronze  — positional CSV $1..$9 → typed projection (P1, :37-47) + valid /
          error split (P4/P9, :49-76)
silver  — email/name/item filter + audit timestamps + 4-key merge
          (P5, M2, :80-123)
dims    — dim_date (derived date attributes, :131-137), dim_customer
          (aggregate-then-classify, :140-145), dim_product (ILIKE
          categorization, :164-170)
fact    — 3 left dim lookups + derived amount + 4-key merge (J3/J5, :183-224)
gold    — 3 aggregation marts (:233-260)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..operators.merge import merge_upsert
from ..operators.router import validity_router

BRONZE_SCHEMA_TYPES: list[tuple[str, str]] = [
    ("SALES_ORDER_NUMBER", "string"),
    ("SALES_ORDER_LINENUMBER", "int"),
    ("ORDER_DATE", "date"),
    ("CUSTOMER_NAME", "string"),
    ("EMAIL", "string"),
    ("ITEM", "string"),
    ("QUANTITY", "int"),
    ("UNITPRICE", "float"),
    ("TAX", "float"),
]


def bronze_cast(raw: DataFrame) -> DataFrame:
    """Typed projection of the positional c1..c9 stage columns
    (dags/snowspark-dataframe-ETL.py:37-47). try_cast keeps Snowflake's
    lenient semantics: a bad cell nulls the cell, not the row."""
    return raw.select(
        *[
            F.col(f"c{i + 1}").try_cast(t).alias(name)
            for i, (name, t) in enumerate(BRONZE_SCHEMA_TYPES)
        ]
    )


def bronze_split(casted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid/error router (:49-76). Validity = the reference's conjunctive
    filter; error reasons = its first-match when-chain."""
    rules: list[tuple[str, Column]] = [
        ("Invalid SALES_ORDER_NUMBER", F.col("SALES_ORDER_NUMBER").isNull()),
        ("Invalid SALES_ORDER_LINENUMBER", F.col("SALES_ORDER_LINENUMBER").isNull()),
        ("Invalid ORDER_DATE", F.col("ORDER_DATE").isNull()),
        ("Invalid QUANTITY", F.col("QUANTITY").isNull() | (F.col("QUANTITY") <= 0)),
        ("Invalid UNITPRICE", F.col("UNITPRICE").isNull() | (F.col("UNITPRICE") < 0)),
        ("Invalid TAX", F.col("TAX").isNull() | (F.col("TAX") <= 0)),
    ]
    return validity_router(casted, rules)


SILVER_MERGE_KEYS = ("SALES_ORDER_NUMBER", "ORDER_DATE", "EMAIL", "ITEM")


def silver_processed_sales(
    valid: DataFrame, target: DataFrame | None = None
) -> DataFrame:
    """Silver enrichment + 4-key merge (:80-123): EMAIL LIKE '%@%',
    name/item present, CREATED_TS/MODIFIED_TS audit columns; matched rows
    refresh measures + MODIFIED_TS but keep CREATED_TS."""
    enriched = (
        valid.filter(
            F.col("EMAIL").like("%@%")
            & F.col("CUSTOMER_NAME").isNotNull()
            & F.col("ITEM").isNotNull()
        )
        .withColumn("CREATED_TS", F.current_timestamp())
        .withColumn("MODIFIED_TS", F.current_timestamp())
    )
    if target is None:
        return enriched
    update_set = {
        c: F.col(f"s.{c}")
        for c in ("SALES_ORDER_LINENUMBER", "QUANTITY", "UNITPRICE", "TAX", "MODIFIED_TS")
    }
    return merge_upsert(
        target, enriched, keys=list(SILVER_MERGE_KEYS), update_set=update_set
    )


def dim_date(processed: DataFrame) -> DataFrame:
    """Derived calendar dim (:131-137)."""
    return processed.select(
        F.col("ORDER_DATE"),
        F.date_format("ORDER_DATE", "yyyyMMdd").alias("ORDER_DATE_ID"),
        F.year("ORDER_DATE").alias("YEAR"),
        F.month("ORDER_DATE").alias("MONTH"),
        F.dayofmonth("ORDER_DATE").alias("DAY"),
        F.date_format("ORDER_DATE", "yyyyMM").alias("YYYYMM"),
    ).distinct()


def dim_customer(processed: DataFrame) -> DataFrame:
    """Aggregate-then-classify customer dim (:140-145) plus a surrogate
    CUSTOMER_ID (dense hash of the natural key — the reference relies on
    Snowflake autoincrement; a content-derived id is deterministic and
    cluster-safe: no sequence bottleneck at scale)."""
    return processed.groupBy("EMAIL").agg(
        F.max("CUSTOMER_NAME").alias("CUSTOMER_NAME"),
        F.when(F.count("SALES_ORDER_NUMBER") == 1, "New Customer")
        .when(F.count("SALES_ORDER_NUMBER") > 1, "Returning Customer")
        .otherwise("Regular Customer")
        .alias("CUSTOMER_TYPE"),
    ).withColumn("CUSTOMER_ID", F.crc32(F.col("EMAIL")).cast("int"))


def dim_product(processed: DataFrame) -> DataFrame:
    """ILIKE-categorized product dim (:164-170) + surrogate ITEM_ID."""
    return (
        processed.select("ITEM")
        .distinct()
        .withColumn(
            "CATEGORY",
            F.when(F.col("ITEM").ilike("%Laptop%"), "Electronics")
            .when(F.col("ITEM").ilike("%Phone%"), "Mobile Devices")
            .when(F.col("ITEM").ilike("%Shoes%"), "Footwear")
            .when(F.col("ITEM").ilike("%T-shirt%"), "Clothing")
            .otherwise("Others"),
        )
        .withColumnRenamed("ITEM", "ITEM_NAME")
        .withColumn("ITEM_ID", F.crc32(F.col("ITEM_NAME")).cast("int"))
    )


FACT_MERGE_KEYS = ("SALES_ORDER_NUMBER", "CUSTOMER_ID", "ORDER_DATE_ID", "ITEM_ID")


def fact_sales(
    processed: DataFrame,
    d_customer: DataFrame,
    d_product: DataFrame,
    d_date: DataFrame,
    target: DataFrame | None = None,
) -> DataFrame:
    """Fact build: 3 broadcast left dim lookups + derived amount, then
    4-key merge (:183-224)."""
    p = processed.alias("p")
    fact = (
        p.join(F.broadcast(d_customer.alias("dc")), F.col("p.EMAIL") == F.col("dc.EMAIL"), "left")
        .join(F.broadcast(d_product.alias("dp")), F.col("p.ITEM") == F.col("dp.ITEM_NAME"), "left")
        .join(F.broadcast(d_date.alias("dd")), F.col("p.ORDER_DATE") == F.col("dd.ORDER_DATE"), "left")
        .select(
            F.col("p.SALES_ORDER_NUMBER").alias("SALES_ORDER_NUMBER"),
            F.col("dc.CUSTOMER_ID").cast("int").alias("CUSTOMER_ID"),
            F.col("dp.ITEM_ID").cast("int").alias("ITEM_ID"),
            F.col("dd.ORDER_DATE_ID").cast("int").alias("ORDER_DATE_ID"),
            F.col("p.QUANTITY").alias("QUANTITY"),
            F.col("p.UNITPRICE").alias("UNIT_PRICE"),
            F.col("p.TAX").alias("TAX"),
            (F.col("p.QUANTITY") * F.col("p.UNITPRICE") + F.col("p.TAX")).alias(
                "TOTAL_SALES_AMOUNT"
            ),
        )
    )
    if target is None:
        return fact
    update_set = {
        c: F.col(f"s.{c}")
        for c in ("QUANTITY", "UNIT_PRICE", "TAX", "TOTAL_SALES_AMOUNT")
    }
    return merge_upsert(target, fact, keys=list(FACT_MERGE_KEYS), update_set=update_set)


def gold_customer_sales_agg(fact: DataFrame, d_customer: DataFrame, d_date: DataFrame) -> DataFrame:
    """FACT_CUSTOMER_SALES_AGG (:233-241)."""
    return (
        fact.join(F.broadcast(d_customer), "CUSTOMER_ID")
        .join(F.broadcast(d_date), "ORDER_DATE_ID")
        .groupBy("CUSTOMER_ID", "CUSTOMER_NAME", "YEAR", "MONTH", "YYYYMM")
        .agg(
            F.sum("QUANTITY").alias("TOTAL_QUANTITY"),
            F.sum("TOTAL_SALES_AMOUNT").alias("TOTAL_REVENUE"),
            F.countDistinct("ORDER_DATE").alias("ACTIVE_DAYS"),
        )
    )


def gold_sales_summary_by_day(fact: DataFrame, d_date: DataFrame) -> DataFrame:
    """SALES_SUMMARY_BY_DAY (:244-251)."""
    return (
        fact.join(F.broadcast(d_date), "ORDER_DATE_ID")
        .groupBy("ORDER_DATE")
        .agg(
            F.sum("TOTAL_SALES_AMOUNT").alias("TOTAL_SALES"),
            F.sum("QUANTITY").alias("TOTAL_UNITS_SOLD"),
            F.countDistinct("SALES_ORDER_NUMBER").alias("TOTAL_ORDERS"),
        )
    )


def gold_product_sales_summary(fact: DataFrame, d_product: DataFrame) -> DataFrame:
    """PRODUCT_SALES_SUMMARY (:254-260)."""
    return (
        fact.join(F.broadcast(d_product), "ITEM_ID")
        .groupBy("ITEM_ID", "ITEM_NAME", "CATEGORY")
        .agg(
            F.sum("QUANTITY").alias("UNITS_SOLD"),
            F.sum("TOTAL_SALES_AMOUNT").alias("REVENUE"),
            F.countDistinct("SALES_ORDER_NUMBER").alias("ORDER_COUNT"),
        )
    )
