"""Unit semantics for the retrieval (BM25 / RRF) and linear-classifier
operators, independent of the DuckDB parity harness: ranking laws
(tf monotonicity, idf damping, fusion dominance), partitioning
invariance of the integer scores, and perceptron convergence on a
separable toy set."""

from __future__ import annotations

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.operators.linear import (
    perceptron_epochs,
)
from logistics_data_pipeline_project_spark.operators.retrieval import (
    bm25_scores,
    bm25_topk,
    rrf_fuse,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _scores(spark, rows, queries):
    got = bm25_scores(_docs(spark, rows), queries).collect()
    return {(r.query_id, r.doc_id): r.score_x1000 for r in got}


def test_bm25_tf_monotone(spark):
    # same length (padding with a non-query term), more hits => higher
    rows = [
        (1, "apple pear pear pad"),
        (2, "apple apple pear pad"),
    ]
    s = _scores(spark, rows, [(1, "apple")])
    assert s[(1, 2)] > s[(1, 1)]


def test_bm25_idf_damps_common_terms(spark):
    # 'common' appears in every doc, 'rare' in one; equal tf and dl in
    # the probe doc => the rare term must contribute more
    rows = [
        (1, "rare common x y"),
        (2, "common a b c"),
        (3, "common d e f"),
        (4, "common g h i"),
    ]
    s = _scores(spark, rows, [(1, "rare"), (2, "common")])
    assert s[(1, 1)] > s[(2, 1)]


def test_bm25_length_normalization(spark):
    # same tf, longer doc scores lower
    rows = [
        (1, "apple x"),
        (2, "apple x y z w v u t s r q p"),
    ]
    s = _scores(spark, rows, [(1, "apple")])
    assert s[(1, 1)] > s[(1, 2)]


def test_bm25_ignores_no_hit_docs_and_breaks_ties_by_doc_id(spark):
    rows = [
        (7, "apple b"),
        (3, "apple b"),
        (9, "zzz yyy"),
    ]
    got = bm25_topk(_docs(spark, rows), [(1, "apple")], k=10).collect()
    assert [r.doc_id for r in got] == [3, 7]
    assert [r.rnk for r in got] == [1, 2]
    assert len({r.score_x1000 for r in got}) == 1


def test_bm25_partitioning_invariant(spark):
    rows = [(i, f"apple pear w{i % 5} w{i % 7} filler") for i in range(40)]
    queries = [(1, "apple pear")]
    base = _scores(spark, rows, queries)
    repart = {
        (r.query_id, r.doc_id): r.score_x1000
        for r in bm25_scores(
            _docs(spark, rows).repartition(13), queries
        ).collect()
    }
    assert base == repart


def test_rrf_fusion_dominance(spark):
    # doc 1 is rank 1 in both lists; doc 2 rank 2 in one only => doc 1 wins
    r1 = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2)], "query_id int, doc_id long, rnk int"
    )
    r2 = spark.createDataFrame(
        [(1, 1, 1), (1, 3, 2)], "query_id int, doc_id long, rnk int"
    )
    got = {r.doc_id: r for r in rrf_fuse([r1, r2], k=10).collect()}
    assert got[1].fused_rnk == 1 and got[1].n_lists == 2
    assert got[1].rrf_x1e6 == 2 * (1_000_000 // 61)
    assert got[2].n_lists == 1
    assert got[2].rrf_x1e6 == 1_000_000 // 62


def test_perceptron_converges_on_separable_toy(spark):
    # y = sign(x1): trivially separable through the origin
    rows = [(1, x, 1 if x > 0 else -1) for x in range(-20, 21) if x != 0]
    feats = spark.createDataFrame(rows, "x0 int, x1 int, y int")
    traj = perceptron_epochs(feats, ["x0", "x1"], "y", 4).collect()
    assert traj[0].n_mistakes == len(rows)  # zero weights: margin 0
    assert traj[-1].n_mistakes == 0
    assert traj[-1].w1 > 0


def test_perceptron_partitioning_invariant(spark):
    rows = [(1, x % 17 - 8, (x * 7) % 23 - 11, 1 if x % 3 else -1) for x in range(200)]
    feats = spark.createDataFrame(rows, "x0 int, x1 int, x2 int, y int")
    a = perceptron_epochs(feats, ["x0", "x1", "x2"], "y", 3).collect()
    b = perceptron_epochs(
        feats.repartition(11), ["x0", "x1", "x2"], "y", 3
    ).collect()
    assert a == b


def test_hashed_perceptron_learns_separable_sparse_set(spark):
    from logistics_data_pipeline_project_spark.operators.linear import (
        hashed_perceptron,
    )

    # class +1 docs are full of token 'aa', class -1 of token 'bb':
    # after training, aa's bucket weight must be positive and bb's
    # negative, and the final model must classify the train set
    rows = []
    for i in range(10):
        rows += [(i, "aa", 3 + i % 2)]
        rows += [(i + 10, "bb", 3 + i % 2)]
    feats = spark.createDataFrame(rows, "doc_id long, bucket string, c int")
    labels = spark.createDataFrame(
        [(i, 1) for i in range(10)] + [(i + 10, -1) for i in range(10)],
        "doc_id long, y int",
    )
    model = {
        r["bucket"]: r["w"]
        for r in hashed_perceptron(feats, labels, 4).collect()
    }
    assert model["aa"] > 0 > model["bb"]
    for doc_id, b, c in rows:
        y = 1 if doc_id < 10 else -1
        assert y * (model["__bias__"] + model[b] * c) > 0


def test_hashed_perceptron_partitioning_invariant(spark):
    from logistics_data_pipeline_project_spark.operators.linear import (
        hashed_perceptron,
    )

    rows = [
        (i, f"b{(i * 7) % 5}", 1 + (i * 3) % 4) for i in range(60)
    ]
    feats = spark.createDataFrame(rows, "doc_id long, bucket string, c int")
    labels = spark.createDataFrame(
        [(i, 1 if i % 3 else -1) for i in range(60)], "doc_id long, y int"
    )
    a = sorted(map(tuple, hashed_perceptron(feats, labels, 3).collect()))
    b = sorted(
        map(
            tuple,
            hashed_perceptron(
                feats.repartition(17), labels.repartition(5), 3
            ).collect(),
        )
    )
    assert a == b


def test_compression_ratio_semantics(spark):
    from logistics_data_pipeline_project_spark.operators.text import (
        compression_ratio,
    )

    rows = [
        (1, "spam " * 200),            # highly repetitive -> compresses hard
        (2, "the quick brown fox jumps over the lazy dog and then naps"),
        (3, ""),                        # empty guard
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in compression_ratio(df, "doc_id", "text").collect()}
    import zlib

    for i, t in rows:
        raw = t.encode()
        assert out[i]["n_bytes"] == len(raw)
        if raw:
            assert out[i]["n_compressed"] == len(zlib.compress(raw, 6))
            assert out[i]["ratio_x1000"] == len(zlib.compress(raw, 6)) * 1000 // len(raw)
    assert out[3]["ratio_x1000"] == 0 and out[3]["n_compressed"] == 0
    # the repetitive doc must compress far harder than prose
    assert out[1]["ratio_x1000"] < out[2]["ratio_x1000"] // 2
    # determinism across partitionings
    again = {
        r["id"]: r["ratio_x1000"]
        for r in compression_ratio(df.repartition(3), "doc_id", "text").collect()
    }
    assert again == {i: out[i]["ratio_x1000"] for i, _ in rows}


def test_word_bigrams_guards_degenerate_docs(spark):
    from logistics_data_pipeline_project_spark.operators.text import (
        word_bigrams,
    )

    rows = [
        (1, "alpha beta gamma"),
        (2, ""),            # zero tokens: would make slice length -1
        (3, "   "),         # whitespace-only: same
        (4, "solo"),        # one token: no pairs
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(tuple, word_bigrams(df, "text", extra_cols=("doc_id",)).collect())
    )
    assert got == [(1, "alpha", "beta"), (1, "beta", "gamma")]


def test_hashed_perceptron_bucket_universe_includes_unlabeled(spark):
    # r11: buckets appearing ONLY in unlabeled docs still get zero-weight
    # model rows (the docstring's "every feature bucket" contract)
    from logistics_data_pipeline_project_spark.operators.linear import (
        hashed_perceptron,
    )

    feats = spark.createDataFrame(
        [(1, "a", 2), (1, "b", 1), (2, "only_unlabeled", 3)],
        "doc_id long, bucket string, cnt long",
    )
    labels = spark.createDataFrame([(1, 1)], "doc_id long, y long")
    model = hashed_perceptron(
        feats, labels, 1, "doc_id", "bucket", "cnt", "y"
    )
    got = {r[0]: r[1] for r in model.collect()}
    assert "only_unlabeled" in got and got["only_unlabeled"] == 0
    assert "__bias__" in got
