"""Differential property tests: the distributed BM25 scorer and
perceptron trainer against independent pure-Python references on
hypothesis-generated corpora — the same integer formulas, written
forward row-at-a-time, must agree exactly with the Spark dataflow on
every random input (not just the parity fixture corpus)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from logistics_data_pipeline_project_spark.operators.linear import (
    perceptron_epochs,
)
from logistics_data_pipeline_project_spark.operators.retrieval import (
    bm25_scores,
)

prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

VOCAB = ["a", "b", "c", "dd", "ee"]
doc_strategy = st.lists(
    st.sampled_from(VOCAB), min_size=1, max_size=6
)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=8)


def _bm25_reference(corpus: list[list[str]], query_terms: list[str]):
    """Row-at-a-time replay of the documented integer formula."""
    n = len(corpus)
    l = sum(len(d) for d in corpus)
    out = {}
    for term in set(query_terms):
        df = sum(1 for d in corpus if term in d)
        if not df:
            continue
        idf = ((2 * n - 2 * df + 1) * 1000) // (2 * df + 1)
        for doc_id, d in enumerate(corpus):
            tf = d.count(term)
            if not tf:
                continue
            num = idf * (22 * tf * l)
            den = 10 * tf * l + 3 * l + 9 * len(d) * n
            out[doc_id] = out.get(doc_id, 0) + num // den
    return out


@prop
@given(corpus=corpus_strategy, qterms=st.lists(st.sampled_from(VOCAB), min_size=1, max_size=3))
def test_bm25_matches_pure_python_reference(spark, corpus, qterms):
    docs = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(corpus)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.score_x1000
        for r in bm25_scores(docs, [(1, " ".join(qterms))]).collect()
    }
    assert got == _bm25_reference(corpus, qterms)


def _perceptron_reference(rows, epochs):
    w = [0, 0, 0]
    traj = []
    for e in range(1, epochs + 1):
        g = [0, 0, 0]
        m = 0
        for x0, x1, x2, y in rows:
            if y * (w[0] * x0 + w[1] * x1 + w[2] * x2) <= 0:
                m += 1
                g[0] += y * x0
                g[1] += y * x1
                g[2] += y * x2
        w = [w[i] + g[i] for i in range(3)]
        traj.append((e, w[0], w[1], w[2], m))
    return traj


feat_row = st.tuples(
    st.just(1),
    st.integers(min_value=-9, max_value=9),
    st.integers(min_value=-9, max_value=9),
    st.sampled_from([1, -1]),
)


@prop
@given(rows=st.lists(feat_row, min_size=1, max_size=20), epochs=st.integers(min_value=1, max_value=4))
def test_perceptron_matches_pure_python_reference(spark, rows, epochs):
    feats = spark.createDataFrame(
        list(rows), "x0 int, x1 int, x2 int, y int"
    )
    got = [
        (r.epoch, r.w0, r.w1, r.w2, r.n_mistakes)
        for r in perceptron_epochs(feats, ["x0", "x1", "x2"], "y", epochs).collect()
    ]
    assert got == _perceptron_reference(rows, epochs)
