"""SQL entry path: QUALIFY desugaring (the reference's three usage
shapes) and plain-SQL passthrough, differentially checked with the
DataFrame equivalents."""

from __future__ import annotations

import duckdb
from pyspark.sql import Window, functions as F

from logistics_data_pipeline_project_spark.io_utils import TABLES, load
from logistics_data_pipeline_project_spark.sql_frontend import desugar_qualify, run_sql


def test_plain_sql_passthrough(spark, sf_dir):
    df = run_sql(
        spark,
        "SELECT r_name, COUNT(*) AS n FROM region GROUP BY r_name",
        sf_dir,
    )
    assert df.count() == 5
    assert df.columns == ["r_name", "n"]


def test_no_qualify_untouched():
    sql = "SELECT a FROM t WHERE b = 'QUALIFY literal untouched'"
    out, had = desugar_qualify(sql)
    assert not had and out == sql


def test_qualify_latest_record_dedup(spark, sf_dir):
    # the reference's latest-record-wins pattern
    # (dags/2_logistics-shipment-dag.py:112,121)
    # the predicate references output columns (the supported subset —
    # which is how the reference uses it: partitioning on projected aliases)
    sql = """
    SELECT event_id, user_id, ts, event_type FROM events
    QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """
    got = run_sql(spark, sql, sf_dir)
    assert got.columns == ["event_id", "user_id", "ts", "event_type"]

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    want = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("event_id", "user_id", "ts", "event_type")
    )
    assert {tuple(map(str, r)) for r in got.collect()} == {
        tuple(map(str, r)) for r in want.collect()
    }


def test_qualify_with_trailing_order_and_limit(spark, sf_dir):
    sql = """
    SELECT o_custkey, o_totalprice FROM orders
    QUALIFY RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) <= 2
    ORDER BY o_custkey, o_totalprice DESC LIMIT 10
    """
    got = run_sql(spark, sql, sf_dir).collect()
    assert len(got) == 10
    # differential: DuckDB supports QUALIFY natively
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    want = con.execute(sql).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_scanner_skips_comments_and_quoted_identifiers():
    sql = (
        'SELECT "QUALIFYING" FROM t  -- a QUALIFY inside a comment\n'
        "WHERE x = 'QUALIFY me'"
    )
    out, had = desugar_qualify(sql)
    assert not had and out == sql

    sql2 = (
        "SELECT a FROM t -- comment before the clause\n"
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY a) = 1"
    )
    out2, had2 = desugar_qualify(sql2)
    assert had2 and "__qualify" in out2
