"""Local mirror of the driver's correctness gate: run every catalog query
on Spark AND its DuckDB oracle, compare row count + sorted values.

This is the engine's primary differential test (SURVEY §5 level-3
recommendation). Float columns are compared exactly — the engine's
determinism policy (decimal-exact sums, double-identical ratio math; see
queries/registry.py) promises bit-equality, and this test enforces it.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from logistics_data_pipeline_project_spark.io_utils import TABLES
from logistics_data_pipeline_project_spark.queries import REGISTRY

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if not s.oracle)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return str(v)
    if isinstance(v, bytes):
        return v.hex()
    return v


def _sorted_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    spec = REGISTRY[name]
    sdf = spec.fn(spark, sf_dir)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    con = _duck(sf_dir)
    cur = con.execute(spec.oracle)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    con.close()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch spark={scols} duckdb={dcols}"
    )
    assert len(srows) == len(drows), (
        f"{name}: row count spark={len(srows)} duckdb={len(drows)}"
    )
    s_sorted = _sorted_rows([c.lower() for c in scols], srows)
    d_sorted = _sorted_rows([c.lower() for c in dcols], drows)
    mismatches = [
        (i, a, b) for i, (a, b) in enumerate(zip(s_sorted, d_sorted)) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:5]}"


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_query_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_q167_matches_pure_python_reference(spark, sf_dir):
    """q167 has no SQL oracle (no engine exposes zlib), but DEFLATE at a
    fixed level is deterministic for a given zlib build — so this test
    IS its differential: an independent pure-Python replay of the whole
    query (per-doc compress + per-source aggregate) compared exactly.
    Leaves q066 (bounded-error approx sketches) as the only catalog
    query without a value-level differential check."""
    import zlib
    from collections import defaultdict

    con = _duck(sf_dir)
    docs = con.execute("SELECT doc_id, source, text FROM documents").fetchall()
    con.close()
    per_source = defaultdict(list)
    for _doc_id, source, text in docs:
        raw = (text or "").encode("utf-8")
        comp = len(zlib.compress(raw, 6)) if raw else 0
        per_source[source].append((comp * 1000) // len(raw) if raw else 0)
    want = sorted(
        (
            s,
            len(rs),
            min(rs),
            sum(rs) // len(rs),
            max(rs),
            sum(1 for r in rs if r < 300),
        )
        for s, rs in per_source.items()
    )
    sdf = REGISTRY["q167_compression_quality"].fn(spark, sf_dir)
    got = sorted(
        (
            r["source"],
            r["n_docs"],
            r["min_ratio_x1000"],
            r["avg_ratio_x1000"],
            r["max_ratio_x1000"],
            r["n_low_entropy"],
        )
        for r in sdf.collect()
    )
    assert got == want


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs = e.queries()
    oq = e.oracle_sql()
    assert set(oq) <= set(qs)
    assert len(qs) == len(REGISTRY)
