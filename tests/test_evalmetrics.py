"""Differential tests for the exact eval-metric operators: AUC against
brute-force pair counting on hypothesis-generated data, plus the
closed-form edge cases (perfect separation, anti-separation, all ties)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st

from logistics_data_pipeline_project_spark.operators.evalmetrics import (
    exact_binary_auc,
    roc_points,
)

prop = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

labeled = st.lists(
    st.tuples(st.integers(0, 12), st.booleans()), min_size=2, max_size=40
).filter(lambda xs: any(y for _, y in xs) and any(not y for _, y in xs))


def _brute_auc_x2(data):
    pos = [s for s, y in data if y]
    neg = [s for s, y in data if not y]
    u2 = 0
    for p in pos:
        for n in neg:
            if p > n:
                u2 += 2
            elif p == n:
                u2 += 1
    return u2, len(pos), len(neg)


@prop
@given(data=labeled)
def test_auc_matches_bruteforce(spark, data):
    df = spark.createDataFrame(
        [(i, s, y) for i, (s, y) in enumerate(data)], "id long, sc long, y boolean"
    )
    row = exact_binary_auc(df, "sc", "y").collect()[0]
    u2, np_, nn = _brute_auc_x2(data)
    assert (row["u2"], row["n_pos"], row["n_neg"]) == (u2, np_, nn)
    assert row["auc_ppm"] == u2 * 1_000_000 // (2 * np_ * nn)


def test_auc_closed_form_edges(spark):
    # perfect separation -> 1.0; inverted -> 0.0; all tied -> 0.5
    mk = lambda rows: spark.createDataFrame(rows, "id long, sc long, y boolean")
    perfect = mk([(i, 10 + i, True) for i in range(3)] + [(9 + i, i, False) for i in range(3)])
    assert exact_binary_auc(perfect, "sc", "y").collect()[0]["auc_ppm"] == 1_000_000
    inverted = mk([(i, i, True) for i in range(3)] + [(9 + i, 10 + i, False) for i in range(3)])
    assert exact_binary_auc(inverted, "sc", "y").collect()[0]["auc_ppm"] == 0
    tied = mk([(1, 5, True), (2, 5, False), (3, 5, True), (4, 5, False)])
    assert exact_binary_auc(tied, "sc", "y").collect()[0]["auc_ppm"] == 500_000


def test_roc_points_monotone_and_terminal(spark):
    import random

    rng = random.Random(5)
    rows = [(i, rng.randrange(20), rng.random() < 0.4) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, sc long, y boolean")
    pts = sorted(
        roc_points(df, "sc", "y", "id", n_cuts=10).collect(),
        key=lambda r: r["cut"],
    )
    n_pos = sum(1 for _, _, y in rows if y)
    assert pts[-1]["tp"] == n_pos and pts[-1]["n_pred_pos"] == 200
    assert pts[-1]["tpr_ppm"] == 1_000_000 and pts[-1]["fpr_ppm"] == 1_000_000
    for a, b in zip(pts, pts[1:]):
        assert b["tp"] >= a["tp"] and b["fp"] >= a["fp"]


def test_kappa_matches_bruteforce(spark):
    import random
    from collections import Counter

    from logistics_data_pipeline_project_spark.operators.evalmetrics import (
        cohens_kappa,
    )

    rng = random.Random(17)
    cats = ["a", "b", "c"]
    rows = [(rng.choice(cats), rng.choice(cats)) for _ in range(300)]
    df = spark.createDataFrame(rows, "ga string, gb string")
    got = cohens_kappa(df, "ga", "gb").collect()[0]
    n = len(rows)
    agree = sum(1 for x, y in rows if x == y)
    ra, cb = Counter(x for x, _ in rows), Counter(y for _, y in rows)
    e = sum(ra[k] * cb.get(k, 0) for k in ra)
    assert (got["n"], got["n_agree"], got["chance_pairs"]) == (n, agree, e)
    num, den = n * agree - e, n * n - e
    want = (num * 1_000_000) // den if num >= 0 else -((-num * 1_000_000) // den)
    assert got["kappa_ppm"] == want


def test_kappa_edges(spark):
    from logistics_data_pipeline_project_spark.operators.evalmetrics import (
        cohens_kappa,
    )

    # perfect agreement -> 1.0
    df = spark.createDataFrame([("x", "x"), ("y", "y")], "ga string, gb string")
    assert cohens_kappa(df, "ga", "gb").collect()[0]["kappa_ppm"] == 1_000_000
    # systematic disagreement on a balanced 2x2 -> kappa = -1
    df2 = spark.createDataFrame(
        [("x", "y"), ("y", "x"), ("x", "y"), ("y", "x")], "ga string, gb string"
    )
    assert cohens_kappa(df2, "ga", "gb").collect()[0]["kappa_ppm"] == -1_000_000


def test_mmr_select_matches_bruteforce_greedy(spark):
    import random

    from logistics_data_pipeline_project_spark.operators.selection import mmr_select

    rng = random.Random(23)
    vocab = ["a", "b", "c", "d", "e", "f", "g"]
    rows = []
    for i in range(25):
        toks = sorted(set(rng.sample(vocab, rng.randint(2, 5))))
        rows.append((i, toks, rng.randrange(100, 1000)))
    df = spark.createDataFrame(rows, "id long, toks array<string>, rel long")
    got = mmr_select(df, "id", "toks", "rel", k=5, lam=50)

    # brute-force greedy replay
    pool = {i: (set(t), r) for i, t, r in rows}
    sel, want = [], []
    for rank in range(1, 6):
        best = None
        for i, (t, r) in sorted(pool.items()):
            if i in sel:
                continue
            pen = max((len(t & pool[s][0]) for s in sel), default=0)
            obj = r - 50 * pen
            if best is None or obj > best[1]:
                best = (i, obj, r, pen)
        sel.append(best[0])
        want.append(
            {"rank": rank, "id": best[0], "rel": best[2], "penalty": best[3],
             "objective": best[1]}
        )
    assert got == want
    # lazy-greedy batching: a friendly pool resolves in far fewer than
    # k jobs, and the trajectory is identical at every batch size
    for b in (1, 2, 16):
        st = {}
        assert mmr_select(
            df, "id", "toks", "rel", k=5, lam=50, batch=b, stats=st
        ) == want
        assert st["jobs"] <= -(-5 // b) + 5  # bounded; exactness is the bar
    st = {}
    mmr_select(df, "id", "toks", "rel", k=5, lam=50, batch=16, stats=st)
    assert st["jobs"] < 5  # batched beats one-job-per-pick


def test_mmr_batching_exact_under_rank_reshuffle(spark):
    """Adversarial lam: every pick demolishes the stale ranking, so the
    lazy bound must trigger refreshes rather than return stale picks."""
    import random

    from logistics_data_pipeline_project_spark.operators.selection import mmr_select

    rng = random.Random(7)
    vocab = [f"t{j}" for j in range(6)]
    rows = []
    for i in range(30):
        toks = sorted(set(rng.sample(vocab, rng.randint(3, 6))))
        rows.append((i, toks, rng.randrange(0, 40)))
    df = spark.createDataFrame(rows, "id long, toks array<string>, rel long")
    lam = 1000  # one shared token outweighs any relevance gap
    want = mmr_select(df, "id", "toks", "rel", k=6, lam=lam, batch=1)
    for b in (2, 4, 32):
        assert mmr_select(df, "id", "toks", "rel", k=6, lam=lam, batch=b) == want


def test_mmr_pool_cap_two_stage(spark):
    from logistics_data_pipeline_project_spark.operators.selection import mmr_select

    rows = [
        (1, ["a", "b"], 100),
        (2, ["a", "b"], 90),
        (3, ["c", "d"], 80),
        (4, ["e", "f"], 10),  # diverse but below the cap line
    ]
    df = spark.createDataFrame(rows, "id long, toks array<string>, rel long")
    capped = mmr_select(df, "id", "toks", "rel", k=3, lam=50, pool_cap=3)
    assert [p["id"] for p in capped] == [1, 3, 2]  # id 4 never considered
    full = mmr_select(df, "id", "toks", "rel", k=3, lam=50)
    assert [p["id"] for p in full] == [1, 3, 4]  # uncapped greedy prefers 4


def test_gram_whitening_identity(spark):
    import numpy as np

    from logistics_data_pipeline_project_spark.operators.similarity import (
        whitening_from_gram,
    )
    from logistics_data_pipeline_project_spark.queries import REGISTRY

    rows = REGISTRY["q206_embedding_gram_matrix"].fn(
        spark, "/root/testdata/sf0.001"
    ).collect()
    d = 8
    w, vals = whitening_from_gram(rows, d)
    assert vals.shape == (d,) and np.all(vals > 0)
    # rebuild cov from the rows and check W whitens it
    g = np.zeros((d, d))
    n = rows[0]["n_vecs"]
    for r in rows:
        g[r["i"], r["j"]] = g[r["j"], r["i"]] = r["gram"]
    cov = g / n
    ident = w @ cov @ w.T
    assert np.allclose(ident, np.eye(d), atol=1e-6)
