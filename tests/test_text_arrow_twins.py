"""Bit-equality proofs for the round-11 Arrow twins in operators/text.py:

- ``_window_hash_rows_arrow`` vs the interpreted explode(transform(...,
  md5(concat(...)))) projection it replaced in frequent_window_scrub;
- ``char_ngram_count_rows`` vs explode(transform(sequence, substring))
  + per-doc count (the lm.py / q154 trigram kernel).

Both twins are exact under the callers' contract (docs pre-filtered to
length >= n): Python slicing and Arrow split are codepoint-compatible
with Spark's substring/split, and hashlib.md5 emits Spark's lowercase
hex.  (Without the length filter the OLD expression form emits bogus
grams for length == n-1 docs via a descending sequence(1, 0) — the
twins emit nothing there, and every caller filters first.)
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.operators.text import (
    _window_hash_rows_arrow,
    char_ngram_count_rows,
    sliding_concat_sql,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def _old_wins(df, id_col, text_col, window):
    toks = df.select(
        F.col(id_col).alias("__id"), F.split(F.col(text_col), " ").alias("__t")
    )
    return (
        toks.filter(F.size("__t") >= window)
        .select(
            "__id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(__t) - {window}),"
                    f" i -> struct(i AS start,"
                    f" md5({sliding_concat_sql('__t', 'i', window)}) AS wh))"
                )
            ).alias("__w"),
        )
        .select("__id", "__w.start", "__w.wh")
    )


def _old_grams(df, id_col, text_col, n):
    return (
        df.select(id_col, F.col(text_col).alias("__t"))
        .where(F.length("__t") >= n)
        .select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(__t) - {n - 1}),"
                    f" i -> substring(__t, i, {n}))"
                )
            ).alias("__g"),
        )
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )


@pytest.mark.parametrize("window", [2, 8])
def test_window_hash_twin_on_corpus(spark, window):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", "text"
    )
    a = sorted(
        map(tuple, _window_hash_rows_arrow(docs, "doc_id", "text", window).collect())
    )
    e = sorted(map(tuple, _old_wins(docs, "doc_id", "text", window).collect()))
    assert a == e


def test_window_hash_twin_adversarial(spark):
    df = spark.createDataFrame(
        [
            (0, "a  b c d e f g h i"),
            (1, ""),
            (2, None),
            (3, "x y"),
            (4, "p " * 20),
            (5, "Ünïcødé tëxt 𝄞 nøt löwered hërë at all ok"),
        ],
        "doc_id long, text string",
    )
    for window in (2, 8):
        a = sorted(
            map(tuple, _window_hash_rows_arrow(df, "doc_id", "text", window).collect())
        )
        e = sorted(map(tuple, _old_wins(df, "doc_id", "text", window).collect()))
        assert a == e, f"window={window}"


@pytest.mark.parametrize("n", [2, 3])
def test_char_ngram_twin_on_corpus(spark, n):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).select(
        "doc_id", F.col("text").alias("__t")
    ).where(F.length("__t") >= n)
    a = sorted(
        map(
            tuple,
            char_ngram_count_rows(docs, "doc_id", "__t", n)
            .groupBy("doc_id", "__g")
            .agg(F.sum("__cnt").alias("__cnt"))
            .collect(),
        )
    )
    e = sorted(map(tuple, _old_grams(docs, "doc_id", "__t", n).collect()))
    assert a == e


def test_char_ngram_twin_unicode(spark):
    # astral-plane codepoints: Python slicing and Spark substring both
    # count CODEPOINTS (surrogate-free), the real parity risk
    df = spark.createDataFrame(
        [
            (0, "héllo wörld 𝄞𝄞𝄞 ünïcødé"),
            (1, "ab"),
            (2, "abc"),
            (3, None),
            (4, "ΣΙΣΥΦΟΣ"),
            (5, "𝄞a𝄞b𝄞"),
        ],
        "doc_id long, __t string",
    )
    for n in (2, 3, 4):
        filt = df.where(F.length("__t") >= n)
        a = sorted(
            map(
                tuple,
                char_ngram_count_rows(filt, "doc_id", "__t", n)
                .groupBy("doc_id", "__g")
                .agg(F.sum("__cnt").alias("__cnt"))
                .collect(),
            )
        )
        e = sorted(map(tuple, _old_grams(df, "doc_id", "__t", n).collect()))
        assert a == e, f"n={n}"
