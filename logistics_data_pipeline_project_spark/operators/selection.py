"""Diversity-aware subset selection (training-data curation).

Greedy maximal-marginal-relevance over a candidate pool: pick k items
maximizing ``relevance − lam · max_overlap_with_selected`` — the
submodular-style selection a curation pipeline runs to build small,
diverse high-quality subsets (eval seeds, few-shot pools, dedup-aware
samplers). All arithmetic is integral (relevance and the pairwise
overlap are integers), the tiebreak is total (objective DESC, id ASC),
so the k-step greedy trajectory is bit-deterministic and replayable by
an unrolled SQL oracle (the engine's k-means/perceptron precedent).

Scale shape: k driver-coordinated rounds; each round is ONE Spark job
over the (cached) candidate pool — the selected set is O(k) rows and
BROADCASTS, per-candidate penalty = max over ≤k array_intersects, JVM
higher-order functions, no Python. The ``.collect()`` per round is one
row (the argmax), the same bounded-driver-state idiom as k-means
centroid refresh (operators/similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["mmr_select"]


def mmr_select(
    pool: DataFrame,
    id_col: str,
    tokens_col: str,
    rel_col: str,
    k: int,
    lam: int,
) -> list[dict]:
    """Greedy MMR: returns k dicts (rank, id, rel, penalty, objective).

    ``pool`` columns: ``id_col`` (long, unique), ``tokens_col``
    (array<string>, deduplicated), ``rel_col`` (long). Objective of a
    candidate given the selected set S: rel − lam · max_{s∈S}
    |tokens ∩ tokens_s| (0 for S=∅). Ties: smallest id.
    """
    cached = pool.select(
        F.col(id_col).alias("__id"),
        F.col(tokens_col).alias("__toks"),
        F.col(rel_col).cast("long").alias("__rel"),
    ).localCheckpoint(eager=True)
    selected: list[dict] = []
    chosen_toks: list[list[str]] = []
    for rank in range(1, k + 1):
        cand = cached
        if selected:
            ids = [s["id"] for s in selected]
            cand = cand.filter(~F.col("__id").isin(ids))
            overlaps = [
                F.size(
                    F.array_intersect(
                        "__toks", F.array(*[F.lit(t) for t in toks])
                    )
                )
                for toks in chosen_toks
            ]
            penalty = (
                F.greatest(*overlaps) if len(overlaps) > 1 else overlaps[0]
            ).cast("long")
        else:
            penalty = F.lit(0).cast("long")
        scored = cand.select(
            "__id",
            "__toks",
            "__rel",
            penalty.alias("__pen"),
            (F.col("__rel") - F.lit(lam) * penalty).alias("__obj"),
        )
        top = scored.orderBy(F.desc("__obj"), F.asc("__id")).limit(1).collect()
        if not top:
            break
        r = top[0]
        selected.append(
            {
                "rank": rank,
                "id": r["__id"],
                "rel": r["__rel"],
                "penalty": r["__pen"],
                "objective": r["__obj"],
            }
        )
        chosen_toks.append(list(r["__toks"]))
    return selected
