"""Gold marts: the reference's 8 dbt gold models
(dbt/dbt-project/models/gold/*.sql) and 10 SQL gold views
(dags/logistics-gold-metrics-sql.py:24-197), re-expressed as DataFrame
functions over the silver star schema.

Semantics notes (SURVEY §7 risk register):
- Snowflake ``DATEDIFF(DAY, a, b)`` counts *date-boundary crossings*, not
  24-hour periods → ``datediff(to_date(b), to_date(a))``.
- Reference models with questionable joins (dm_order_fulfillment's
  ``p.PRODUCT_ID = s.SELLER_ID``; seller_performance's orders⋈inventory on
  PRODUCT_ID causing COUNT(*) fan-out) are reproduced **as written** for
  capability parity — their golden tests encode the fan-out behavior.
- Gold views ORDER BY their metric (O1); preserved only at presentation,
  not relied on downstream.
- Time-relative filters (CURRENT_DATE - 30) take an ``as_of`` parameter so
  results are testable/deterministic; default = current_date.

Scale: every mart is fact⋈broadcast-dim + groupBy — one shuffle each;
dims are broadcast explicitly (they are small by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.scalar import delay_percentage


def _day_diff(a: Column, b: Column) -> Column:
    """Snowflake DATEDIFF(DAY, a, b): date-boundary crossings."""
    return F.datediff(F.to_date(b), F.to_date(a))


def _pct(num: Column, den: Column) -> Column:
    return F.round(F.lit(100.0) * num / den, 2)


# ---------------------------------------------------------------------------
# dbt gold models
# ---------------------------------------------------------------------------


def delivery_performance_by_courier(
    fact_shipments: DataFrame, dim_couriers: DataFrame
) -> DataFrame:
    """dbt/.../gold/delivery_performance_by_courier.sql:1-14: join couriers,
    group by carrier name; delay % via macro calculate_delay_percentage."""
    s = fact_shipments.alias("s")
    c = dim_couriers.alias("c")
    return (
        s.join(F.broadcast(c), F.col("s.CARRIER_ID") == F.col("c.COURIER_ID"))
        .groupBy(F.col("s.CARRIER_NAME").alias("CARRIER_NAME"))
        .agg(
            F.count(F.lit(1)).alias("total_shipments"),
            F.avg("s.DELIVERY_TAT_DAYS").alias("avg_delivery_days"),
            delay_percentage(F.col("s.DELAY_FLAG")).alias("delay_percentage"),
        )
    )


def delivery_sla_rootcause(
    fact_orders: DataFrame,
    fact_shipments: DataFrame,
    dim_sellers: DataFrame,
    dim_couriers: DataFrame,
    dim_locations: DataFrame,
) -> DataFrame:
    """dbt/.../gold/delivery_sla_rootcause.sql:1-71: delivered shipments
    joined to orders; fulfillment/courier/total lags; root cause CASE
    (fulfillment>1 → Seller, courier>2 → Courier, else Unknown); grouped by
    seller/carrier/destination city."""
    o = fact_orders.alias("o")
    s = fact_shipments.filter(F.col("STATUS") == "Delivered").alias("s")
    sw = o.join(s, F.col("o.ORDER_ID") == F.col("s.ORDER_ID")).select(
        F.col("s.SELLER_ID").alias("SELLER_ID"),
        F.col("s.CARRIER_ID").alias("CARRIER_ID"),
        F.col("s.DESTINATION_PINCODE").alias("DESTINATION_PINCODE"),
        F.col("s.DELAY_FLAG").alias("DELAY_FLAG"),
        _day_diff(F.col("o.ORDER_DATE"), F.col("s.CREATED_AT")).alias(
            "fulfillment_delay_days"
        ),
        _day_diff(F.col("s.CREATED_AT"), F.col("s.DELIVERED_AT")).alias(
            "courier_delay_days"
        ),
        _day_diff(F.col("o.ORDER_DATE"), F.col("s.DELIVERED_AT")).alias(
            "total_lag_days"
        ),
    )
    jd = (
        sw.alias("sw")
        .join(F.broadcast(dim_sellers.alias("sel")), F.col("sw.SELLER_ID") == F.col("sel.SELLER_ID"), "left")
        .join(F.broadcast(dim_couriers.alias("car")), F.col("sw.CARRIER_ID") == F.col("car.COURIER_ID"), "left")
        .join(F.broadcast(dim_locations.alias("loc")), F.col("sw.DESTINATION_PINCODE") == F.col("loc.PINCODE"), "left")
        .withColumn(
            "root_cause",
            F.when(F.col("fulfillment_delay_days") > 1, "Seller")
            .when(F.col("courier_delay_days") > 2, "Courier")
            .otherwise("Unknown"),
        )
    )
    return (
        jd.groupBy(
            F.col("sel.SELLER_NAME").alias("SELLER_NAME"),
            F.col("car.NAME").alias("CARRIER_NAME"),
            F.col("loc.CITY").alias("destination_city"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_deliveries"),
            F.sum(F.when(F.col("DELAY_FLAG"), 1).otherwise(0)).alias("delayed_shipments"),
            F.round(F.avg("total_lag_days"), 2).alias("avg_delivery_time"),
            F.round(F.avg("fulfillment_delay_days"), 2).alias("avg_fulfillment_lag"),
            F.round(F.avg("courier_delay_days"), 2).alias("avg_courier_lag"),
            F.count(F.when(F.col("root_cause") == "Seller", 1)).alias("seller_root_causes"),
            F.count(F.when(F.col("root_cause") == "Courier", 1)).alias("courier_root_causes"),
            _pct(
                F.sum(F.when(F.col("DELAY_FLAG"), 1).otherwise(0)), F.count(F.lit(1))
            ).alias("delay_rate_percentage"),
        )
        .orderBy(F.desc("delay_rate_percentage"))
    )


def seller_performance(
    fact_orders: DataFrame,
    fact_shipments: DataFrame,
    fact_inventory: DataFrame,
    dim_sellers: DataFrame,
) -> DataFrame:
    """dbt/.../gold/seller_performance.sql:1-13 — reproduced AS WRITTEN
    including the orders⋈inventory join on PRODUCT_ID whose fan-out is
    counted by COUNT(*) (the reference's unit test encodes this)."""
    o = fact_orders.alias("o")
    shp = fact_shipments.alias("shp")
    inv = fact_inventory.alias("s")
    sel = dim_sellers.alias("sel")
    return (
        o.join(shp, F.col("o.ORDER_ID") == F.col("shp.ORDER_ID"))
        .join(inv, F.col("o.PRODUCT_ID") == F.col("s.PRODUCT_ID"))
        .join(F.broadcast(sel), F.col("s.SELLER_ID") == F.col("sel.SELLER_ID"))
        .groupBy(
            F.col("s.SELLER_ID").alias("SELLER_ID"),
            F.col("sel.SELLER_NAME").alias("SELLER_NAME"),
        )
        .agg(
            F.countDistinct("o.ORDER_ID").alias("total_orders"),
            F.countDistinct("shp.SHIPMENT_ID").alias("total_shipments"),
            F.avg("shp.DELIVERY_TAT_DAYS").alias("avg_delivery_time"),
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("shp.RTO_FLAG"), 1).otherwise(0))
                / F.count(F.lit(1))
            ).alias("rto_percentage"),
        )
    )


def seller_product_profitability(
    fact_orders: DataFrame,
    fact_shipments: DataFrame,
    fact_inventory: DataFrame,
    dim_locations: DataFrame,
    dim_products: DataFrame,
    dim_sellers: DataFrame,
) -> DataFrame:
    """dbt/.../gold/seller_product_profitability.sql:1-66: logistics cost =
    COALESCE sum of 4 fee components; margin = ROUND(profit/NULLIF(rev,0),4)*100
    (the 91.33 golden value depends on this exact rounding order)."""
    o = fact_orders.alias("o")
    s = fact_shipments.alias("s")
    inv = fact_inventory.alias("inv")
    loc = dim_locations.alias("c")
    od = (
        o.join(s, F.col("o.ORDER_ID") == F.col("s.ORDER_ID"))
        .join(
            inv,
            (F.col("o.PRODUCT_ID") == F.col("inv.PRODUCT_ID"))
            & (F.col("s.SELLER_ID") == F.col("inv.SELLER_ID")),
            "left",
        )
        .join(F.broadcast(loc), F.col("s.DESTINATION_PINCODE") == F.col("c.PINCODE"), "left")
    )
    logistics_cost = (
        F.coalesce(F.col("s.SHIPPING_COST"), F.lit(0))
        + F.coalesce(F.col("s.FUEL_SURCHARGE"), F.lit(0))
        + F.coalesce(F.col("s.COD_FEE"), F.lit(0))
        + F.coalesce(F.col("s.INSURANCE"), F.lit(0))
    )
    psd = (
        od.join(F.broadcast(dim_products.alias("p")), F.col("o.PRODUCT_ID") == F.col("p.PRODUCT_ID"), "left")
        .join(F.broadcast(dim_sellers.alias("sel")), F.col("s.SELLER_ID") == F.col("sel.SELLER_ID"), "left")
        .withColumn("logistics_cost", logistics_cost)
        .withColumn("gross_profit", F.col("o.TOTAL_AMOUNT") - logistics_cost)
    )
    return (
        psd.groupBy(
            F.col("sel.SELLER_NAME").alias("SELLER_NAME"),
            F.col("p.CATEGORY").alias("CATEGORY"),
            F.col("p.PRODUCT_NAME").alias("PRODUCT_NAME"),
            F.col("c.ZONE").alias("DELIVERY_REGION"),
        )
        .agg(
            F.countDistinct("o.ORDER_ID").alias("total_orders"),
            F.round(F.sum("o.TOTAL_AMOUNT"), 2).alias("revenue"),
            F.round(F.sum("logistics_cost"), 2).alias("logistics_expense"),
            F.round(F.sum("gross_profit"), 2).alias("gross_profit"),
            (
                F.round(
                    F.sum("gross_profit") / F.nullif(F.sum("o.TOTAL_AMOUNT"), F.lit(0)), 4
                )
                * 100
            ).alias("gross_margin_pct"),
        )
        .orderBy(F.asc("gross_margin_pct"))
    )


def customer_experience_summary(
    fact_orders: DataFrame,
    fact_shipments: DataFrame,
    dim_customers: DataFrame,
    control_table: DataFrame,
    model_name: str = "customer_experience_summary",
) -> DataFrame:
    """dbt/.../gold/customer_experience_summary.sql:1-50: control-table
    driven filters — excluded customer ids (CSV → explode → anti join),
    last_loaded_at watermark, min_order_amount TRY_CAST — then per-customer
    delivery KPIs. (The region_filter CTE exists in the reference but is
    never applied — reproduced as written.)"""
    ctl = control_pivot(control_table, model_name)
    row = ctl.first()
    excluded_csv = row["excluded_ids"] if row and "excluded_ids" in ctl.columns else None
    last_loaded_at = row["last_loaded_at"] if row and "last_loaded_at" in ctl.columns else None
    min_amount = row["min_order_amount"] if row and "min_order_amount" in ctl.columns else None

    o = fact_orders.alias("o")
    if excluded_csv:
        excluded = (
            control_table.sparkSession.createDataFrame(
                [(v.strip(),) for v in excluded_csv.split(",")], ["CUSTOMER_ID"]
            )
        )
        o = o.join(F.broadcast(excluded), on="CUSTOMER_ID", how="left_anti").alias("o")
    c = dim_customers.alias("c")
    filtered = o.join(F.broadcast(c), F.col("o.CUSTOMER_ID") == F.col("c.CUSTOMER_ID"))
    if last_loaded_at is not None:
        filtered = filtered.filter(
            F.col("o.ORDER_DATE") > F.lit(last_loaded_at).cast("timestamp")
        )
    if min_amount is not None:
        filtered = filtered.filter(
            F.col("o.TOTAL_AMOUNT") >= F.lit(min_amount).try_cast("double")
        )
    s = fact_shipments.alias("s")
    return (
        filtered.join(s, F.col("o.ORDER_ID") == F.col("s.ORDER_ID"))
        .groupBy(F.col("o.CUSTOMER_ID").alias("CUSTOMER_ID"))
        .agg(
            F.countDistinct("o.ORDER_ID").alias("orders_count"),
            F.sum(F.when(F.col("s.DELAY_FLAG"), 1).otherwise(0)).alias("delayed_shipments"),
            F.round(
                F.avg(_day_diff(F.col("o.ORDER_DATE"), F.col("s.DELIVERED_AT"))), 2
            ).alias("avg_delivery_time"),
        )
    )


def dm_inventory_status(
    fact_inventory: DataFrame, dim_products: DataFrame, dim_sellers: DataFrame
) -> DataFrame:
    """dbt/.../gold/dm_inventory_status.sql:1-11."""
    i = fact_inventory.alias("i")
    return (
        i.join(F.broadcast(dim_products.alias("p")), F.col("i.PRODUCT_ID") == F.col("p.PRODUCT_ID"))
        .join(F.broadcast(dim_sellers.alias("s")), F.col("i.SELLER_ID") == F.col("s.SELLER_ID"))
        .select(
            F.col("i.PRODUCT_ID").alias("PRODUCT_ID"),
            F.col("p.PRODUCT_NAME").alias("PRODUCT_NAME"),
            F.col("i.SELLER_ID").alias("SELLER_ID"),
            F.col("s.SELLER_NAME").alias("SELLER_NAME"),
            F.col("i.STOCK").alias("STOCK"),
            F.col("i.LAST_UPDATED").alias("LAST_UPDATED"),
        )
    )


def dm_order_fulfillment(
    fact_orders: DataFrame,
    dim_customers: DataFrame,
    dim_products: DataFrame,
    dim_sellers: DataFrame,
) -> DataFrame:
    """dbt/.../gold/dm_order_fulfillment.sql:1-14 — reproduced AS WRITTEN,
    including the p.PRODUCT_ID = s.SELLER_ID join (SURVEY §7: capability
    parity over plausibility; semantics documented)."""
    o = fact_orders.alias("o")
    return (
        o.join(F.broadcast(dim_customers.alias("c")), F.col("o.CUSTOMER_ID") == F.col("c.CUSTOMER_ID"))
        .join(F.broadcast(dim_products.alias("p")), F.col("o.PRODUCT_ID") == F.col("p.PRODUCT_ID"))
        .join(F.broadcast(dim_sellers.alias("s")), F.col("p.PRODUCT_ID") == F.col("s.SELLER_ID"))
        .select(
            F.col("o.ORDER_ID").alias("ORDER_ID"),
            F.col("o.ORDER_DATE").alias("ORDER_DATE"),
            F.col("c.NAME").alias("NAME"),
            F.col("c.CITY").alias("CUSTOMER_CITY"),
            F.col("p.PRODUCT_NAME").alias("PRODUCT_NAME"),
            F.col("s.SELLER_NAME").alias("SELLER_NAME"),
            F.col("o.TOTAL_AMOUNT").alias("TOTAL_AMOUNT"),
            F.col("o.PAYMENT_METHOD").alias("PAYMENT_METHOD"),
        )
    )


def order_to_delivery_lifecycle(
    fact_orders: DataFrame, fact_shipments: DataFrame, delivered_only: bool = False
) -> DataFrame:
    """dbt/.../gold/order_to_delivery_lifecycle.sql:1-13 (and the SQL-view
    twin at dags/logistics-gold-metrics-sql.py:131-147 which adds
    STATUS='Delivered')."""
    o = fact_orders.alias("o")
    s = fact_shipments.alias("s")
    if delivered_only:
        s = fact_shipments.filter(F.col("STATUS") == "Delivered").alias("s")
    return o.join(s, F.col("o.ORDER_ID") == F.col("s.ORDER_ID")).select(
        F.col("o.ORDER_ID").alias("ORDER_ID"),
        F.col("o.ORDER_DATE").alias("ORDER_DATE"),
        F.col("s.CREATED_AT").alias("shipment_created_at"),
        F.col("s.DELIVERED_AT").alias("DELIVERED_AT"),
        _day_diff(F.col("o.ORDER_DATE"), F.col("s.CREATED_AT")).alias("order_to_shipment_days"),
        _day_diff(F.col("s.CREATED_AT"), F.col("s.DELIVERED_AT")).alias("shipment_to_delivery_days"),
        _day_diff(F.col("o.ORDER_DATE"), F.col("s.DELIVERED_AT")).alias("total_fulfillment_days"),
    )


# ---------------------------------------------------------------------------
# SQL gold views (dags/logistics-gold-metrics-sql.py)
# ---------------------------------------------------------------------------


def shipment_delay_summary(fact_shipments: DataFrame, as_of: Column | None = None) -> DataFrame:
    """dags/logistics-gold-metrics-sql.py:24-39: last-30-day delay rates by
    courier and destination city."""
    cutoff = (as_of if as_of is not None else F.current_date()) - F.expr("INTERVAL 30 DAYS")
    f = fact_shipments.filter(F.col("STATUS_CREATED_AT") >= cutoff)
    delayed = F.sum(F.when(F.col("DELAY_FLAG"), 1).otherwise(0))
    return (
        f.groupBy(
            F.col("CARRIER_NAME").alias("courier_name"),
            F.col("DESTINATION_CITY").alias("delivery_zone"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_shipments"),
            F.avg(
                _day_diff(F.col("STATUS_CREATED_AT"), F.col("STATUS_DELIVERED_AT"))
            ).alias("avg_delivery_days"),
            delayed.alias("delayed_shipments"),
            _pct(delayed, F.count(F.lit(1))).alias("delay_rate_pct"),
        )
        .orderBy(F.desc("delay_rate_pct"))
    )


def seller_rto_performance(fact_shipments: DataFrame, dim_sellers: DataFrame) -> DataFrame:
    """dags/logistics-gold-metrics-sql.py:43-55 (the flagship view; the
    synthetic-star twin is catalog query q02)."""
    f = fact_shipments.alias("f")
    s = dim_sellers.alias("s")
    rto = F.sum(F.when(F.col("f.RTO_FLAG"), 1).otherwise(0))
    return (
        f.join(F.broadcast(s), F.col("f.SELLER_ID") == F.col("s.SELLER_ID"))
        .groupBy(
            F.col("s.SELLER_ID").alias("seller_id"),
            F.col("s.SELLER_NAME").alias("seller_name"),
        )
        .agg(
            F.count(F.lit(1)).alias("total_orders"),
            F.round(F.avg("f.DELIVERY_TAT_DAYS"), 2).alias("avg_tat"),
            rto.alias("rto_orders"),
            _pct(rto, F.count(F.lit(1))).alias("rto_pct"),
            F.round(F.sum("f.SHIPPING_COST"), 2).alias("total_shipping_cost"),
        )
        .orderBy(F.desc("rto_pct"))
    )


def courier_sla_breach(fact_shipments: DataFrame, dim_couriers: DataFrame) -> DataFrame:
    """dags/logistics-gold-metrics-sql.py:63-76."""
    f = fact_shipments.alias("f")
    c = dim_couriers.alias("c")
    breaches = F.sum(F.when(F.col("f.DELAY_FLAG"), 1).otherwise(0))
    return (
        f.join(F.broadcast(c), F.col("f.CARRIER_ID") == F.col("c.COURIER_ID"))
        .groupBy(F.col("c.NAME").alias("courier_name"))
        .agg(
            F.count(F.lit(1)).alias("total_shipments"),
            breaches.alias("sla_breaches"),
            _pct(breaches, F.count(F.lit(1))).alias("breach_pct"),
        )
        .orderBy(F.desc("breach_pct"))
    )


def inventory_order_summary(
    fact_inventory: DataFrame,
    fact_orders: DataFrame,
    dim_products: DataFrame,
    as_of: Column | None = None,
) -> DataFrame:
    """dags/logistics-gold-metrics-sql.py:96-112: LEFT JOIN with the
    30-day range predicate in the ON clause (J4 — it must not become a
    post-filter or unmatched inventory rows would be dropped)."""
    cutoff = (as_of if as_of is not None else F.current_date()) - F.expr("INTERVAL 30 DAYS")
    i = fact_inventory.alias("i")
    o = fact_orders.alias("o")
    p = dim_products.alias("p")
    return (
        i.join(
            o,
            (F.col("i.PRODUCT_ID") == F.col("o.PRODUCT_ID"))
            & (F.col("o.ORDER_DATE") >= cutoff),
            "left",
        )
        .join(F.broadcast(p), F.col("i.PRODUCT_ID") == F.col("p.PRODUCT_ID"))
        .groupBy(
            F.col("i.PRODUCT_ID").alias("PRODUCT_ID"),
            F.col("p.PRODUCT_NAME").alias("PRODUCT_NAME"),
            F.col("i.STOCK").alias("STOCK"),
        )
        .agg(F.count("o.ORDER_ID").alias("orders_last_30_days"))
    )


def shipment_cost_summary(fact_shipments: DataFrame) -> DataFrame:
    """dags/logistics-gold-metrics-sql.py:115-127."""
    return fact_shipments.groupBy(F.col("CARRIER_NAME")).agg(
        F.round(F.avg("SHIPPING_COST"), 2).alias("avg_shipping_cost"),
        F.round(F.avg("FUEL_SURCHARGE"), 2).alias("avg_fuel_surcharge"),
        F.round(F.avg("INSURANCE"), 2).alias("avg_insurance"),
        F.round(F.avg("COD_FEE"), 2).alias("avg_cod_fee"),
    )


def geo_delivery_summary(fact_shipments: DataFrame, dim_locations: DataFrame) -> DataFrame:
    """dags/logistics-gold-metrics-sql.py:187-197."""
    s = fact_shipments.alias("s")
    l = dim_locations.alias("l")
    delayed = F.sum(F.when(F.col("s.DELAY_FLAG"), 1).otherwise(0))
    return (
        s.join(F.broadcast(l), F.col("s.DESTINATION_PINCODE") == F.col("l.PINCODE"))
        .groupBy(
            F.col("s.DESTINATION_PINCODE").alias("DESTINATION_PINCODE"),
            F.col("l.CITY").alias("CITY"),
        )
        .agg(
            F.count(F.lit(1)).alias("shipment_count"),
            F.round(F.avg("s.DELIVERY_TAT_DAYS"), 2).alias("avg_delivery_days"),
            (F.lit(100.0) * delayed / F.count(F.lit(1))).alias("delay_rate"),
        )
    )


# ---------------------------------------------------------------------------
# control table (A8 pivot; dbt/.../macros/control_table_filters.sql:1-11,
# seeds/control_table.csv)
# ---------------------------------------------------------------------------


def control_pivot(control_table: DataFrame, model_name: str) -> DataFrame:
    """MAX(CASE WHEN key='x' THEN value END) pivot of the key/value control
    rows for one model — the reference's apply_control_table_filters macro."""
    return (
        control_table.filter(F.col("name") == model_name)
        .groupBy("name")
        .pivot("key")
        .agg(F.max("value"))
    )
