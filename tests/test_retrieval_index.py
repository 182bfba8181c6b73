"""Incrementally maintained BM25 index: the tf/dl rollup tables folded
batch-by-batch must serve IDENTICAL top-k results to the direct
bm25_topk over the full corpus — after every append, and a re-delivered
(stale-cursor) batch must be a no-op (the rollup watermark guard)."""

from __future__ import annotations

from logistics_data_pipeline_project_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_index,
    maintain_bm25_index,
)
from logistics_data_pipeline_project_spark.plans.materialize import TableStore

QUERIES = [(1, "apple pear"), (2, "plum fig")]

BATCH1 = [
    (1, "apple pear plum quince"),
    (2, "apple apple fig"),
    (3, "kiwi lime"),
]
BATCH2 = [
    (4, "pear pear pear apple"),
    (5, "fig plum fig plum fig"),
]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _topk(df):
    return sorted(map(tuple, df.collect()))


def test_index_serves_identical_topk_after_each_append(spark, tmp_path):
    store = TableStore(spark, str(tmp_path / "wh"))

    maintain_bm25_index(store, "idx", _df(spark, BATCH1))
    assert _topk(
        bm25_topk_from_index(spark, store, "idx", QUERIES, k=10)
    ) == _topk(bm25_topk(_df(spark, BATCH1), QUERIES, k=10))

    maintain_bm25_index(store, "idx", _df(spark, BATCH2))
    full = BATCH1 + BATCH2
    assert _topk(
        bm25_topk_from_index(spark, store, "idx", QUERIES, k=10)
    ) == _topk(bm25_topk(_df(spark, full), QUERIES, k=10))

    # replaying an already-folded batch must not double-count: every
    # doc id is behind the stored watermark
    maintain_bm25_index(store, "idx", _df(spark, BATCH2))
    assert _topk(
        bm25_topk_from_index(spark, store, "idx", QUERIES, k=10)
    ) == _topk(bm25_topk(_df(spark, full), QUERIES, k=10))
