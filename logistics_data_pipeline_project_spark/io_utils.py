"""Table loading helpers for the driver's synthetic star schema (TESTDATA.md).

Every query callable receives ``(spark, sf_dir)``; these helpers centralize
the parquet reads so scans stay declarative (Catalyst gets predicate pushdown
+ column pruning into the parquet reader for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Tables small enough (at any realistic SF) to broadcast in joins.
#: region/nation are fixed-cardinality; supplier/part grow slowly with SF
#: but stay well under broadcast thresholds through sf100.
DIM_TABLES = frozenset({"region", "nation", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table. Path layout per TESTDATA.md.

    ``events.ts`` is stored as parquet TIMESTAMP(MICROS) (read as
    TIMESTAMP_NTZ) — a plain attribute column, so range predicates on it
    are pushed into the parquet scan and prune row groups via min/max
    stats (asserted in tests/test_catalog_plans). Older generations of the
    testdata stored TIMESTAMP(NANOS), which Spark reads as Long nanos
    (``spark.sql.legacy.parquet.nanosAsLong``); that path converts to a
    microsecond TimestampType, matching DuckDB's ns→µs floor."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every synthetic table as a temp view for spark.sql queries."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
