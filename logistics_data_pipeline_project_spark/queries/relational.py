"""Relational query catalog — SURVEY §2.3–§2.9 operator coverage over the
driver's synthetic star schema (TESTDATA.md).

Each query's docstring cites the reference construct it re-expresses
(reference = RBENJAMINFRANKLIN/logistics-data-pipeline-project, read-only at
/root/reference). Tags refer to SURVEY §2 operator ids.

Scale notes apply throughout: dims (region/nation/supplier/part) are
broadcast; fact↔fact joins shuffle on their keys and rely on AQE for skew;
aggregates are expressed declaratively so Catalyst performs partial
(map-side) aggregation; every parquet scan benefits from predicate pushdown
and column pruning because plans are fully declarative.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..functions.scalar import dec, exact_avg, exact_sum, pct
from ..io_utils import load
from ..operators.merge import (
    high_watermark,
    merge_upsert,
    scd2_apply,
)
from ..operators.router import error_reason
from .registry import register

# ---------------------------------------------------------------------------
# q01 — wide aggregation (A1, A2, A5; cf. gold marts
# dags/logistics-gold-metrics-sql.py:24-41 join+agg+ratio style)
# ---------------------------------------------------------------------------


@register(
    "q001_pricing_summary",
    tags=("A1", "A2", "A5", "P6"),
    oracle="""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
  CAST(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity), 2) AS DOUBLE) AS avg_qty,
  CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice), 2) AS DOUBLE) AS avg_price,
  CAST(ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount), 4) AS DOUBLE) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def q001_pricing_summary(spark: SparkSession, sf_dir: str):
    """Pricing summary: filtered scan → multi-key hash agg with derived
    measures. Catalyst pushes the shipdate filter into the parquet scan and
    runs partial+final hash aggregation (no custom combiner needed)."""
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    charge = disc_price * (F.lit(1) + dec("l_tax", 4, 2))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
        F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
        exact_avg("l_quantity", "avg_qty"),
        exact_avg("l_extendedprice", "avg_price"),
        F.round(F.sum(dec("l_discount", 4, 2)).cast("double") / F.count("l_discount"), 4)
        .cast("double")
        .alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# q02 — FLAGSHIP: conditional agg + ratio over fact⋈dim broadcast join
# (J1, A4, A5; port of seller_rto_performance,
# dags/logistics-gold-metrics-sql.py:43-55)
# ---------------------------------------------------------------------------


@register(
    "q002_supplier_return_performance",
    tags=("J1", "A1", "A4", "A5", "O1"),
    oracle="""
SELECT s.s_suppkey, s.s_name,
  COUNT(*) AS total_lines,
  COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS returned_lines,
  CAST(ROUND(100.0 * CAST(COUNT(CASE WHEN l.l_returnflag = 'R' THEN 1 END) AS DOUBLE) / COUNT(*), 2) AS DOUBLE) AS return_rate_pct,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY s.s_suppkey, s.s_name
""",
)
def q002_supplier_return_performance(spark: SparkSession, sf_dir: str):
    """Flagship (entry-point) query: the reference's seller_rto_performance
    gold view (dags/logistics-gold-metrics-sql.py:43-55) — fact⋈dim join,
    conditional aggregation, ratio metric, rounding.

    Scale: supplier is a dimension → explicit broadcast() removes the
    shuffle on the fact side entirely; the only shuffle is the final
    group-by, which AQE right-sizes."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier")
    returned = F.count(F.when(F.col("l_returnflag") == "R", 1))
    return (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count(F.lit(1)).alias("total_lines"),
            returned.alias("returned_lines"),
            pct(returned.cast("double"), F.count(F.lit(1))).alias("return_rate_pct"),
            exact_sum("l_extendedprice", "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q03 — join + distinct agg + deterministic top-k (J1, A3, O1, O3)
# ---------------------------------------------------------------------------


@register(
    "q003_top_customers_by_revenue",
    tags=("J1", "A3", "O1", "O3"),
    oracle="""
SELECT c.c_custkey, c.c_name,
  COUNT(DISTINCT o.o_orderkey) AS order_cnt,
  CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 10
""",
)
def q003_top_customers_by_revenue(spark: SparkSession, sf_dir: str):
    """Top-k customers (cf. email_utils.py:29-31 top-5 stores): join →
    distinct agg → global sort limited to k. Spark executes
    TakeOrderedAndProject (per-partition top-k + driver merge), never a full
    sort — the right plan at any scale. Tiebreak on c_custkey keeps the cut
    deterministic."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.countDistinct("o_orderkey").alias("order_cnt"),
            exact_sum("o_totalprice", "revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q04 — multi-way join chain with broadcast dims (J2; cf. seller_performance
# dbt/.../seller_performance.sql:10-12 3-5 table chains)
# ---------------------------------------------------------------------------


@register(
    "q004_regional_revenue",
    tags=("J2", "J1", "A1", "A2"),
    oracle="""
SELECT r.r_name, n.n_name,
  COUNT(*) AS lines,
  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l.l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name, n.n_name
""",
)
def q004_regional_revenue(spark: SparkSession, sf_dir: str):
    """5-table join chain. lineitem⋈orders is the only genuine shuffle
    (both facts, co-keyed on orderkey — at scale, bucket both by orderkey
    to eliminate it); customer/nation/region are broadcast so the chain
    collapses into one shuffle + three broadcast hash joins.

    Eager aggregation: lineitem collapses to per-orderkey partials
    (count + DECIMAL revenue sum) BEFORE the fact⋈fact join — Catalyst
    does not push aggregates below joins, and shuffling ~4× fewer rows
    is the dominant cost at scale. DECIMAL partial sums re-aggregate to
    the exact same totals (addition is associative and exact), so the
    rewrite is value-preserving, not approximate."""
    l = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 4, 2))
    lo = l.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__lines"), F.sum(revenue).alias("__rev")
    )
    return (
        lo.join(o, lo.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum("__lines").cast("long").alias("lines"),
            F.round(F.sum("__rev"), 2).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q05 — left join with range predicate in ON (J4; port of
# dags/logistics-gold-metrics-sql.py:103-105)
# ---------------------------------------------------------------------------


@register(
    "q005_brand_recent_shipments",
    tags=("J4", "J3", "A3", "P7"),
    oracle="""
SELECT p.p_brand,
  COUNT(DISTINCT p.p_partkey) AS n_parts,
  COUNT(l.l_orderkey) AS shipped_lines,
  COALESCE(CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE), 0.0) AS shipped_qty
FROM part p
LEFT JOIN lineitem l
  ON p.p_partkey = l.l_partkey AND l.l_shipdate >= TIMESTAMP '2001-01-01'
GROUP BY p.p_brand
""",
)
def q005_brand_recent_shipments(spark: SparkSession, sf_dir: str):
    """Left join whose range predicate must live in the ON clause to
    preserve unmatched left rows — the inventory-vs-recent-orders pattern
    (dags/logistics-gold-metrics-sql.py:103-105). The range condition stays
    in the join condition, NOT a post-filter."""
    p = load(spark, sf_dir, "part")
    l = load(spark, sf_dir, "lineitem")
    cond = (p.p_partkey == l.l_partkey) & (
        l.l_shipdate >= F.lit("2001-01-01").cast("timestamp")
    )
    return (
        p.join(l, cond, "left")
        .groupBy("p_brand")
        .agg(
            F.countDistinct("p_partkey").alias("n_parts"),
            F.count("l_orderkey").alias("shipped_lines"),
            F.coalesce(F.sum(dec("l_quantity")).cast("double"), F.lit(0.0)).alias(
                "shipped_qty"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q06 — anti join (J6; port of excluded-customers pattern,
# dbt/.../customer_experience_summary.sql:27-30)
# ---------------------------------------------------------------------------


@register(
    "q006_customers_without_orders",
    tags=("J6", "A1", "A2"),
    oracle="""
SELECT c.c_mktsegment,
  COUNT(*) AS n_customers,
  CAST(ROUND(CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c.c_acctbal), 2) AS DOUBLE) AS avg_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY c.c_mktsegment
""",
)
def q006_customers_without_orders(spark: SparkSession, sf_dir: str):
    """Exclusion via left-anti join — the reference writes it as LEFT JOIN
    … IS NULL (dbt/.../customer_experience_summary.sql:27-30); left_anti is
    the idiomatic (and cheaper: no null-padding, early short-circuit)
    Spark expression."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            exact_avg("c_acctbal", "avg_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# q07 — window dedup, latest-record-wins (W1/W2; port of
# dags/2_logistics-shipment-dag.py:149-160 QUALIFY rn=1)
# ---------------------------------------------------------------------------


@register(
    "q007_latest_event_per_user",
    tags=("W1", "W2"),
    oracle="""
SELECT user_id, event_id, event_type, value, ts
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
""",
)
def q007_latest_event_per_user(spark: SparkSession, sf_dir: str):
    """ROW_NUMBER latest-wins dedup with deterministic tiebreaker
    (event_id) — Spark has no QUALIFY, so it desugars to window + filter
    (SURVEY §4 item 3). One shuffle on the partition key."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_id", "event_type", "value", "ts")
    )


# ---------------------------------------------------------------------------
# q08 — projected distinct (W4; dags/snowflake-EDW-ETL-dag.py:390)
# ---------------------------------------------------------------------------


@register(
    "q008_distinct_order_profiles",
    tags=("W4",),
    oracle="SELECT DISTINCT o_orderpriority, o_orderstatus FROM orders",
)
def q008_distinct_order_profiles(spark: SparkSession, sf_dir: str):
    """SELECT DISTINCT over a projection — partial-aggregate dedup
    map-side, so the shuffle carries only distinct pairs."""
    return load(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus").distinct()


# ---------------------------------------------------------------------------
# q09 — pivot rows→columns (A8; port of control-table pivot,
# dbt/.../macros/control_table_filters.sql:2-10)
# ---------------------------------------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@register(
    "q009_daily_event_pivot",
    tags=("A8", "A4"),
    oracle="""
SELECT CAST(ts AS DATE) AS event_date,
  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click_cnt,
  COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view_cnt,
  COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase_cnt,
  COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup_cnt,
  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error_cnt
FROM events
GROUP BY CAST(ts AS DATE)
""",
)
def q009_daily_event_pivot(spark: SparkSession, sf_dir: str):
    """Pivot with an explicit value list (required at scale: without it
    Spark runs an extra distinct-values job). Null cells → 0 to match the
    oracle's COUNT(CASE) semantics."""
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.col("ts").cast("date").alias("event_date"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "event_date",
        *[
            F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"{t}_cnt")
            for t in _EVENT_TYPES
        ],
    )


# ---------------------------------------------------------------------------
# q10 — explode/split lateral (J7/U2; port of SPLIT_TO_TABLE,
# dbt/.../customer_experience_summary.sql:16,22 and LATERAL FLATTEN)
# ---------------------------------------------------------------------------


@register(
    "q010_priority_tokens",
    tags=("J7", "U2", "A1"),
    oracle="""
SELECT token, COUNT(*) AS cnt
FROM (SELECT unnest(string_split(o_orderpriority, '-')) AS token FROM orders)
GROUP BY token
""",
)
def q010_priority_tokens(spark: SparkSession, sf_dir: str):
    """String→rows table function: explode(split()) is the Spark native of
    Snowflake's TABLE(SPLIT_TO_TABLE(...)) / LATERAL FLATTEN. Explode is
    pipelined inside whole-stage codegen — no shuffle until the count."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(F.explode(F.split("o_orderpriority", "-")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# ---------------------------------------------------------------------------
# q11 — aggregate-then-classify segmentation (A6/P6; port of
# dags/snowflake-EDW-ETL-dag.py:353-367, dags/snowspark-dataframe-ETL.py:140-145)
# ---------------------------------------------------------------------------


@register(
    "q011_customer_segments",
    tags=("A6", "P6", "A1"),
    oracle="""
WITH spend AS (
  SELECT o_custkey,
    COUNT(*) AS n_orders,
    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total_dec,
    MAX(o_orderdate) AS last_order
  FROM orders GROUP BY o_custkey
), seg AS (
  SELECT o_custkey, n_orders, total_dec,
    CASE WHEN total_dec > 2000000 THEN 'VIP'
         WHEN n_orders >= 12 THEN 'LOYAL'
         WHEN last_order < TIMESTAMP '1997-07-01' THEN 'DORMANT'
         ELSE 'STANDARD' END AS segment
  FROM spend
)
SELECT segment,
  COUNT(*) AS customers,
  CAST(ROUND(SUM(total_dec), 2) AS DOUBLE) AS total_revenue,
  CAST(ROUND(CAST(SUM(n_orders) AS DOUBLE) / COUNT(*), 2) AS DOUBLE) AS avg_orders
FROM seg GROUP BY segment
""",
)
def q011_customer_segments(spark: SparkSession, sf_dir: str):
    """Two-level aggregation with CASE-over-aggregates between them (the
    customer-segmentation pattern). Totals stay DECIMAL through both agg
    levels so the rollup is exact regardless of partitioning."""
    o = load(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).alias("total_dec"),
        F.max("o_orderdate").alias("last_order"),
    )
    seg = spend.withColumn(
        "segment",
        F.when(F.col("total_dec") > 2000000, "VIP")
        .when(F.col("n_orders") >= 12, "LOYAL")
        .when(F.col("last_order") < F.lit("1997-07-01").cast("timestamp"), "DORMANT")
        .otherwise("STANDARD"),
    )
    return seg.groupBy("segment").agg(
        F.count(F.lit(1)).alias("customers"),
        F.round(F.sum("total_dec"), 2).cast("double").alias("total_revenue"),
        F.round(F.sum("n_orders").cast("double") / F.count(F.lit(1)), 2)
        .cast("double")
        .alias("avg_orders"),
    )


# ---------------------------------------------------------------------------
# q12 — scalar-subquery / config-driven predicate (P10; port of
# dbt/.../customer_experience_summary.sql:31-32 min_order_amount filter)
# ---------------------------------------------------------------------------


@register(
    "q012_above_average_orders",
    tags=("P10", "A7", "A1"),
    oracle="""
SELECT o_orderpriority,
  COUNT(*) AS cnt,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
FROM orders
WHERE o_totalprice > (
  SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice)
  FROM orders
)
GROUP BY o_orderpriority
""",
)
def q012_above_average_orders(spark: SparkSession, sf_dir: str):
    """Scalar-subquery predicate. DataFrame side mirrors the reference's
    control-table pattern: compute the scalar (exact decimal avg → double),
    collect to the driver, apply as a literal filter — the filter then
    pushes down into the scan (a correlated subquery would not)."""
    o = load(spark, sf_dir, "orders")
    avg_price = o.agg(
        (F.sum(dec("o_totalprice")).cast("double") / F.count("o_totalprice")).alias("a")
    ).first()["a"]
    return (
        o.filter(F.col("o_totalprice") > F.lit(avg_price))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            exact_sum("o_totalprice", "revenue"),
        )
    )


# ---------------------------------------------------------------------------
# q13 — JSON path extraction + lenient cast (P2/P3; port of VARIANT access,
# dags/2_logistics-shipment-dag.py:100-103 / TRY_CAST :108)
# ---------------------------------------------------------------------------


@register(
    "q013_event_props_kpi",
    tags=("P2", "P3", "A2", "A4"),
    oracle="""
SELECT event_type,
  COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS n_with_k,
  CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
  COUNT(CASE WHEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50 THEN 1 END) AS high_k,
  CAST(ROUND(CAST(SUM(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)) AS DOUBLE)
       / COUNT(TRY_CAST(json_extract_string(props, '$.k') AS INTEGER)), 2) AS DOUBLE) AS avg_k
FROM events
GROUP BY event_type
""",
)
def q013_event_props_kpi(spark: SparkSession, sf_dir: str):
    """Schema-on-read JSON path access over a string column (the VARIANT
    pattern) with TRY_CAST lenient typing. get_json_object is JVM-side —
    no Python in the hot path."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").try_cast("int")
    return ev.groupBy("event_type").agg(
        F.count(k).alias("n_with_k"),
        F.sum(k).alias("sum_k"),
        F.count(F.when(k >= 50, 1)).alias("high_k"),
        F.round(F.sum(k).cast("double") / F.count(k), 2).cast("double").alias("avg_k"),
    )


# ---------------------------------------------------------------------------
# q14 — valid/error router (P9/P6; port of silver_error_* models,
# dags/snowflake-EDW-ETL-dag.py:98-145)
# ---------------------------------------------------------------------------


@register(
    "q014_lineitem_quality_router",
    tags=("P9", "P6", "A1"),
    oracle="""
SELECT COALESCE(
    CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 'BAD_QTY'
         WHEN l_quantity > 30 THEN 'QTY_GT_30'
         WHEN l_discount > 0.08 THEN 'HIGH_DISCOUNT'
         WHEN l_shipdate > TIMESTAMP '2001-06-01' THEN 'LATE_SHIP'
    END, 'OK') AS error_reason,
  COUNT(*) AS cnt,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM lineitem
GROUP BY 1
""",
)
def q014_lineitem_quality_router(spark: SparkSession, sf_dir: str):
    """Row router: first-violated-rule-wins reason derivation, then both
    branches aggregated. Uses the engine's validity_router rule chain; the
    reason expression evaluates once per row inside codegen."""
    li = load(spark, sf_dir, "lineitem")
    rules = [
        ("BAD_QTY", F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)),
        ("QTY_GT_30", F.col("l_quantity") > 30),
        ("HIGH_DISCOUNT", F.col("l_discount") > 0.08),
        ("LATE_SHIP", F.col("l_shipdate") > F.lit("2001-06-01").cast("timestamp")),
    ]
    reason = F.coalesce(error_reason(rules), F.lit("OK"))
    return (
        li.withColumn("error_reason", reason)
        .groupBy("error_reason")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        )
    )


# ---------------------------------------------------------------------------
# q15 — composite-key join fact↔derived (J5/J8; cf. 3-key MERGE ON
# dags/2_logistics-shipment-dag.py:163-165, inventory (PRODUCT_ID,SELLER_ID))
# ---------------------------------------------------------------------------


@register(
    "q015_above_avg_partsupp_lines",
    tags=("J5", "J8", "A4", "A5"),
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT l.l_returnflag,
  COUNT(*) AS total_lines,
  COUNT(CASE WHEN l.l_quantity > ps.avg_qty THEN 1 END) AS above_avg_lines,
  CAST(ROUND(100.0 * CAST(COUNT(CASE WHEN l.l_quantity > ps.avg_qty THEN 1 END) AS DOUBLE) / COUNT(*), 2) AS DOUBLE) AS above_pct
FROM lineitem l
JOIN ps ON l.l_partkey = ps.l_partkey AND l.l_suppkey = ps.l_suppkey
GROUP BY l.l_returnflag
""",
)
def q015_above_avg_partsupp_lines(spark: SparkSession, sf_dir: str):
    """Composite-key (2-col) self-derived join, collapsed to a window:
    the oracle's aggregate-then-join-back-to-self is the textbook case
    where a window aggregate over the join key computes the same thing
    with ONE scan and ONE shuffle — the join form scans lineitem twice
    and shuffles both sides (the exchanges differ: raw vs partial-agg,
    so Catalyst cannot reuse one for the other). Inner-join semantics are
    preserved because every row's own group always exists. 6× faster at
    sf0.1; identical DECIMAL-average math keeps bit-parity."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey", "l_suppkey")
    avg_qty = (
        F.sum(dec("l_quantity")).over(w).cast("double")
        / F.count("l_quantity").over(w)
    )
    t = li.select("l_returnflag", (F.col("l_quantity") > avg_qty).alias("above"))
    above = F.count(F.when(F.col("above"), 1))
    return t.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("total_lines"),
        above.alias("above_avg_lines"),
        pct(above.cast("double"), F.count(F.lit(1))).alias("above_pct"),
    )


# ---------------------------------------------------------------------------
# q16 — MERGE upsert (M1/M2; dags/logistics-airbyte-sql.py:25-49 and the
# DataFrame form dags/snowspark-dataframe-ETL.py:93-123)
# ---------------------------------------------------------------------------


@register(
    "q016_customer_balance_merge",
    tags=("M1", "M2", "K1"),
    oracle="""
WITH src AS (
  SELECT o_custkey AS c_custkey,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS spend
  FROM orders GROUP BY o_custkey
), src2 AS (
  SELECT c_custkey, spend FROM src
  UNION ALL
  SELECT c_custkey + 1000000, spend FROM src WHERE c_custkey % 50 = 0
)
SELECT c.c_custkey, c.c_name, c.c_nationkey,
  CASE WHEN s.c_custkey IS NOT NULL
       THEN CAST(ROUND(CAST(c.c_acctbal AS DECIMAL(12,2)) + CAST(0.1 AS DECIMAL(2,1)) * s.spend, 2) AS DOUBLE)
       ELSE c.c_acctbal END AS c_acctbal,
  c.c_mktsegment
FROM customer c LEFT JOIN src2 s ON c.c_custkey = s.c_custkey
UNION ALL
SELECT s.c_custkey,
  'NEW-' || CAST(s.c_custkey - 1000000 AS VARCHAR) AS c_name,
  CAST(0 AS INTEGER) AS c_nationkey,
  CAST(ROUND(CAST(0.1 AS DECIMAL(2,1)) * s.spend, 2) AS DOUBLE) AS c_acctbal,
  'NEW' AS c_mktsegment
FROM src2 s
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = s.c_custkey)
""",
)
def q016_customer_balance_merge(spark: SparkSession, sf_dir: str):
    """MERGE INTO semantics via the engine's merge_upsert operator
    (full-outer join + precedence projection — SURVEY §4 custom-work item
    1). Matched customers get balance bumped by 10% of spend; unmatched
    source keys (synthetic +1000000 ids) are inserted.

    Rounding note: the balance update stays in DECIMAL end-to-end
    (acctbal→dec(12,2), 0.1→dec(2,1)) because ROUND on a *double* at an
    exact half-cent is engine-dependent (Spark rounds the shortest decimal
    repr, DuckDB the binary value) — found by differential test."""
    c = load(spark, sf_dir, "customer")
    tenth = F.lit(0.1).cast("decimal(2,1)")
    spend = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("spend"))
    )
    existing = spend.select(F.col("o_custkey").alias("c_custkey"), "spend")
    newbies = spend.filter(F.col("o_custkey") % 50 == 0).select(
        (F.col("o_custkey") + 1000000).alias("c_custkey"), "spend"
    )
    source = existing.unionByName(newbies)
    return merge_upsert(
        target=c,
        source=source,
        keys=["c_custkey"],
        update_set={
            "c_acctbal": F.round(
                F.col("t.c_acctbal").cast("decimal(12,2)") + tenth * F.col("s.spend"), 2
            ).cast("double")
        },
        insert_values={
            "c_name": F.concat(
                F.lit("NEW-"), (F.col("s.c_custkey") - 1000000).cast("string")
            ),
            "c_nationkey": F.lit(0),
            "c_acctbal": F.round(tenth * F.col("s.spend"), 2).cast("double"),
            "c_mktsegment": F.lit("NEW"),
        },
        strict=True,
    )


# ---------------------------------------------------------------------------
# q17 — SCD Type-2 snapshot (M6; dbt/.../snapshots/customers/scd_customers.sql:1-27)
# ---------------------------------------------------------------------------


@register(
    "q017_customer_scd2",
    tags=("M6", "K1"),
    oracle="""
WITH base AS (SELECT c_custkey, c_mktsegment, c_acctbal FROM customer),
upd AS (
  SELECT c_custkey, 'MOVED' AS c_mktsegment,
         CAST(ROUND(c_acctbal + CAST(100.0 AS DOUBLE), 2) AS DOUBLE) AS c_acctbal
  FROM customer WHERE c_custkey % 10 = 0
)
SELECT c_custkey, c_mktsegment, c_acctbal,
       TIMESTAMP '2024-01-01' AS valid_from,
       CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
FROM base WHERE c_custkey % 10 <> 0
UNION ALL
SELECT c_custkey, c_mktsegment, c_acctbal,
       TIMESTAMP '2024-01-01', TIMESTAMP '2024-06-01', FALSE
FROM base WHERE c_custkey % 10 = 0
UNION ALL
SELECT c_custkey, c_mktsegment, c_acctbal,
       TIMESTAMP '2024-06-01', CAST(NULL AS TIMESTAMP), TRUE
FROM upd
""",
)
def q017_customer_scd2(spark: SparkSession, sf_dir: str):
    """SCD2 timestamp-strategy snapshot via the engine's scd2_apply: close
    changed current rows at the effective timestamp, append new versions.
    Update batch = every 10th customer moves segment + balance."""
    c = load(spark, sf_dir, "customer")
    ts1 = F.lit("2024-01-01 00:00:00").cast("timestamp")
    ts2 = F.lit("2024-06-01 00:00:00").cast("timestamp")
    history = (
        c.select("c_custkey", "c_mktsegment", "c_acctbal")
        .withColumn("valid_from", ts1)
        .withColumn("valid_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    updates = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.round(F.col("c_acctbal") + F.lit(100.0), 2).cast("double").alias("c_acctbal"),
    )
    return scd2_apply(
        history,
        updates,
        key="c_custkey",
        tracked_cols=["c_mktsegment", "c_acctbal"],
        effective_ts=ts2,
    )


# ---------------------------------------------------------------------------
# q18 — high-watermark incremental load (M4; dags/logistics-airbyte-sql.py:35-38)
# ---------------------------------------------------------------------------


@register(
    "q018_incremental_event_load",
    tags=("M4", "A7", "S8"),
    oracle="""
SELECT event_type,
  COUNT(*) AS rows_loaded,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value,
  MIN(ts) AS first_ts,
  MAX(ts) AS last_ts
FROM events
WHERE ts > (SELECT MAX(ts) FROM events WHERE ts < TIMESTAMP '2024-01-20')
GROUP BY event_type
""",
)
def q018_incremental_event_load(spark: SparkSession, sf_dir: str):
    """High-watermark incremental pattern: watermark = MAX(ts) of the
    already-loaded target (simulated as pre-cutoff events), source filtered
    to ts > watermark.

    ``events.ts`` is a plain parquet TIMESTAMP(MICROS) attribute, so both
    range predicates (the cutoff and the collected watermark literal) are
    pushed into the parquet scan and prune row groups via min/max stats
    (PushedFilters; asserted in tests/test_catalog_plans) — the difference
    between a full-table scan and an incremental one at 100 TB. The
    watermark literal is cast to the column's exact type (TIMESTAMP_NTZ)
    so the comparison stays a foldable attribute predicate."""
    ev = load(spark, sf_dir, "events")
    ts_type = dict(ev.dtypes)["ts"]
    cutoff = F.lit("2024-01-20 00:00:00").cast(ts_type)
    target = ev.filter(F.col("ts") < cutoff)
    wm = high_watermark(target, "ts")
    inc = ev if wm is None else ev.filter(F.col("ts") > F.lit(wm).cast(ts_type))
    return inc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("rows_loaded"),
        exact_sum("value", "sum_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# q19 — tumbling time windows (beyond-reference streaming surface, batch
# parity form; SURVEY §2.10)
# ---------------------------------------------------------------------------


@register(
    "q019_hourly_event_windows",
    tags=("streaming", "A1", "A2"),
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
  date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
  event_type,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_value
FROM events
GROUP BY date_trunc('hour', ts), event_type
""",
)
def q019_hourly_event_windows(spark: SparkSession, sf_dir: str):
    """Tumbling 1-hour windows via F.window — the exact groupBy that
    becomes a watermarked streaming agg under readStream (see
    streaming.landing for the streaming twin of this query)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", "sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


# ---------------------------------------------------------------------------
# q20 — sessionization via lag + cumulative window (beyond-reference;
# batch form of applyInPandasWithState-style session windows)
# ---------------------------------------------------------------------------


@register(
    "q020_user_sessions",
    tags=("streaming", "W1", "A1"),
    oracle="""
WITH t AS (
  SELECT user_id, ts, event_id,
    LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us,
    epoch_us(ts) AS us
  FROM events
), s AS (
  SELECT user_id, ts,
    SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM t
)
SELECT user_id,
  CAST(MAX(sess_id) AS BIGINT) AS n_sessions,
  COUNT(*) AS n_events,
  MIN(ts) AS first_ts,
  MAX(ts) AS last_ts
FROM s GROUP BY user_id
""",
)
def q020_user_sessions(spark: SparkSession, sf_dir: str):
    """Session assignment with a 30-minute inactivity gap: lag + cumulative
    sum of session-start flags — one shuffle on user_id shared by both
    window functions (same partitioning). Microsecond integer arithmetic on
    both engines keeps gap comparisons exact."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    prev = F.lag(us).over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(prev.isNull() | ((us - prev) > 1800 * 1_000_000), 1).otherwise(0),
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = flagged.withColumn("sess_id", F.sum("new_sess").over(wcum))
    return sess.groupBy("user_id").agg(
        F.max("sess_id").cast("long").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# q34 — date/time scalar family (§2.8: year/month extraction, date_format,
# INTERVAL arithmetic, datediff; cf. dags/snowflake-EDW-ETL-dag.py:325-328,363,
# dags/logistics-gold-metrics-sql.py:29,105)
# ---------------------------------------------------------------------------


@register(
    "q089_order_month_profile",
    tags=("A1", "A2", "P6"),
    oracle="""
SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
  CAST(MIN(EXTRACT(year FROM o_orderdate)) AS INTEGER) AS order_year,
  COUNT(*) AS n_orders,
  COUNT(CASE WHEN o_orderdate >= TIMESTAMP '1998-08-02' - INTERVAL 180 DAY THEN 1 END) AS recent_orders,
  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS month_revenue,
  CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-08-02')) AS INTEGER) AS max_age_days
FROM orders
GROUP BY strftime(o_orderdate, '%Y-%m')
""",
)
def q089_order_month_profile(spark: SparkSession, sf_dir: str):
    """Date/time scalar surface: TO_CHAR-style month bucketing
    (date_format), YEAR extraction, CURRENT_DATE-anchored INTERVAL
    arithmetic (pinned to the dataset's max order date so results are
    time-invariant), and DATEDIFF day-boundary counting — Snowflake's
    DATEDIFF(day,a,b) counts boundary crossings, which Spark's datediff
    over to_date matches exactly (SURVEY §7 risk register)."""
    o = load(spark, sf_dir, "orders")
    anchor = F.lit("1998-08-02").cast("date")
    recent_cut = F.expr("TIMESTAMP '1998-08-02' - INTERVAL 180 DAYS")
    return o.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("order_month")
    ).agg(
        F.min(F.year("o_orderdate")).cast("int").alias("order_year"),
        F.count(F.lit(1)).alias("n_orders"),
        F.count(F.when(F.col("o_orderdate") >= recent_cut, 1)).alias("recent_orders"),
        F.round(F.sum(dec("o_totalprice")), 2).cast("double").alias("month_revenue"),
        F.max(F.datediff(anchor, F.to_date("o_orderdate"))).cast("int").alias("max_age_days"),
    )


# ---------------------------------------------------------------------------
# q35 — string scalar family (§2.8: TRIM/REPLACE/SUBSTRING/LIKE/length;
# cf. dags/snowflake-EDW-ETL-dag.py:325-329, dags/snowspark-dataframe-ETL.py:131-135,
# dbt/.../customer_experience_summary.sql:14-23)
# ---------------------------------------------------------------------------


@register(
    "q035_part_brand_text_stats",
    tags=("A1", "A2", "P5"),
    oracle="""
SELECT replace(p_brand, '#', '') AS brand_norm,
  substring(p_type, 1, 6) AS type_prefix,
  COUNT(*) AS n_parts,
  COUNT(CASE WHEN p_type LIKE 'PROMO%' THEN 1 END) AS promo_parts,
  CAST(SUM(length(trim(p_name))) AS BIGINT) AS name_chars,
  CAST(MIN(upper(p_name)) AS VARCHAR) AS first_name
FROM part
GROUP BY replace(p_brand, '#', ''), substring(p_type, 1, 6)
""",
)
def q035_part_brand_text_stats(spark: SparkSession, sf_dir: str):
    """String scalar surface: REPLACE normalization, SUBSTRING prefixing,
    LIKE pattern predicates, TRIM+LENGTH, case folding — all JVM-side
    column expressions inside one hash aggregate."""
    p = load(spark, sf_dir, "part")
    return p.groupBy(
        F.replace(F.col("p_brand"), F.lit("#"), F.lit("")).alias("brand_norm"),
        F.substring("p_type", 1, 6).alias("type_prefix"),
    ).agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.count(F.when(F.col("p_type").like("PROMO%"), 1)).alias("promo_parts"),
        F.sum(F.length(F.trim(F.col("p_name")))).cast("long").alias("name_chars"),
        F.min(F.upper("p_name")).alias("first_name"),
    )


# ---------------------------------------------------------------------------
# q83 — VARIANT semi-structured access (Spark 4 parity with Snowflake
# VARIANT, the reference's core bronze type — SURVEY §1.1/§1.2)
# ---------------------------------------------------------------------------


@register(
    "q083_props_variant_kpi",
    tags=("P2", "P3", "A1"),
    oracle="""
SELECT event_type,
  COUNT(*) AS events,
  COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS with_k,
  CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
  CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
GROUP BY event_type
""",
)
def q083_props_variant_kpi(spark: SparkSession, sf_dir: str):
    """Open-schema JSON access through Spark 4's VARIANT type — the
    engine-native equivalent of the reference's Snowflake `VARIANT`
    columns and `value:path::TYPE` casts (SURVEY §1.1-§1.2,
    dags/2_logistics-shipment-dag.py:100-103): `parse_json` keeps the
    payload schema-on-read (no schema inference pass, unknown keys
    preserved), `variant_get(v, '$.k', 'int')` is the typed path cast.

    The engine's struct-based flows (models/shipments.py) remain the
    closed-schema path; VARIANT is the true schema-on-read option — at
    100 TB it trades a binary-encoded column (larger scan) for zero
    schema-drift failures. Path extraction is JVM-side; one hash
    aggregate after a pure projection."""
    e = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.count("k").alias("with_k"),
            F.sum("k").cast("long").alias("sum_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# q89 — generated calendar dimension + coverage (EDW dim_date,
# dags/snowflake-EDW-ETL-dag.py:321-339 builds dim_date from order dates)
# ---------------------------------------------------------------------------


@register(
    "q034_calendar_coverage",
    tags=("S10", "J3", "A4"),
    oracle="""
WITH cal AS (
  SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                     INTERVAL 1 DAY)) AS DATE) AS d
),
ev AS (
  SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n,
    COUNT(DISTINCT user_id) AS users
  FROM events GROUP BY CAST(ts AS DATE)
)
SELECT cal.d AS cal_date,
  dayofweek(cal.d) AS dow,
  dayofweek(cal.d) IN (0, 6) AS is_weekend,
  CAST(COALESCE(ev.n, 0) AS BIGINT) AS n_events,
  CAST(COALESCE(ev.users, 0) AS BIGINT) AS active_users,
  ev.d IS NULL AS is_gap
FROM cal LEFT JOIN ev ON cal.d = ev.d
""",
)
def q034_calendar_coverage(spark: SparkSession, sf_dir: str):
    """Generated calendar dimension (the reference's EDW dim_date,
    dags/snowflake-EDW-ETL-dag.py:321-339) joined to daily event rollups:
    `sequence()` + explode generates the date spine engine-side — no
    seed file — and the left join surfaces days with NO data (`is_gap`),
    the check that catches silent ingestion holes that an inner-join
    rollup would hide.

    DOW normalization: Spark's dayofweek is 1=Sunday..7=Saturday,
    DuckDB's is 0=Sunday..6=Saturday — the engine subtracts 1 so both
    report the same ISO-agnostic 0-based encoding. The spine is O(days)
    → broadcast; the fact stream collapses to O(days) first."""
    e = load(spark, sf_dir, "events")
    cal = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(date'2024-01-01', date'2024-01-30', interval 1 day)"
            )
        ).alias("cal_date")
    )
    ev = (
        e.select(F.col("ts").cast("date").alias("d"), "user_id")
        .groupBy("d")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
    )
    dow = F.dayofweek("cal_date") - 1  # Spark 1=Sun → 0=Sun like DuckDB
    return (
        F.broadcast(cal)
        .join(ev, cal.cal_date == ev.d, "left")
        .select(
            "cal_date",
            dow.cast("long").alias("dow"),
            dow.isin(0, 6).alias("is_weekend"),
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.coalesce(F.col("users"), F.lit(0)).cast("long").alias("active_users"),
            F.col("d").isNull().alias("is_gap"),
        )
    )
