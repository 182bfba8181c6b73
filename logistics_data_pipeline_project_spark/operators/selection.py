"""Diversity-aware subset selection (training-data curation).

Greedy maximal-marginal-relevance over a candidate pool: pick k items
maximizing ``relevance − lam · max_overlap_with_selected`` — the
submodular-style selection a curation pipeline runs to build small,
diverse high-quality subsets (eval seeds, few-shot pools, dedup-aware
samplers). All arithmetic is integral (relevance and the pairwise
overlap are integers), the tiebreak is total (objective DESC, id ASC),
so the k-step greedy trajectory is bit-deterministic and replayable by
an unrolled SQL oracle (the engine's k-means/perceptron precedent).

Scale shape — lazy greedy (Minoux) batched over Spark jobs:

* The candidate pool is localCheckpointed ONCE; each Spark job fetches
  the top ``batch+1`` candidates by the CURRENT objective, then the
  driver replays exact greedy locally inside that batch. Because the
  penalty term can only GROW as the selected set grows, a candidate's
  stale objective is an upper bound on its true objective — so as long
  as the best re-evaluated in-batch objective strictly beats the
  (batch+1)-th stale score, the pick is provably the global argmax and
  NO new job is needed. Typical cost: ⌈k/batch⌉ jobs (worst case k,
  when every pick reshuffles the ranking); the per-job collect is
  O(batch) rows, the driver state is O(k·tokens).
* ``pool_cap`` is the standard two-stage shape for unbounded corpora:
  restrict greedy to the top-``pool_cap`` candidates by relevance
  (total tiebreak on id) before the loop. At 100 TB the full relation
  must NOT feed k sequential jobs — cap first (one top-k job), then
  select. Capping intentionally changes semantics (selection is over
  the capped pool); leave it None only when the pool is already
  bounded by construction.
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
    pool_cap: int | None = None,
    batch: int = 16,
    stats: dict | None = None,
) -> list[dict]:
    """Greedy MMR: returns k dicts (rank, id, rel, penalty, objective).

    ``pool`` columns: ``id_col`` (long, unique), ``tokens_col``
    (array<string>, deduplicated), ``rel_col`` (long). Objective of a
    candidate given the selected set S: rel − lam · max_{s∈S}
    |tokens ∩ tokens_s| (0 for S=∅). Ties: smallest id. The result is
    EXACT greedy (identical to one-pick-per-job) — batching only
    changes how many Spark jobs the trajectory costs, never the picks.

    ``pool_cap``: two-stage selection — pre-restrict to the top
    ``pool_cap`` rows by (rel DESC, id ASC) first. ``stats`` (optional
    dict) receives ``{"jobs": <spark jobs run by the greedy loop>}``.
    """
    cand_src = pool.select(
        F.col(id_col).alias("__id"),
        F.col(tokens_col).alias("__toks"),
        F.col(rel_col).cast("long").alias("__rel"),
    )
    if pool_cap is not None:
        cand_src = cand_src.orderBy(F.desc("__rel"), F.asc("__id")).limit(
            pool_cap
        )
    cached = cand_src.localCheckpoint(eager=True)
    selected: list[dict] = []
    chosen_toks: list[set] = []
    jobs = 0
    while len(selected) < k:
        cand = cached
        if selected:
            ids = [s["id"] for s in selected]
            cand = cand.filter(~F.col("__id").isin(ids))
            overlaps = [
                F.size(
                    F.array_intersect(
                        "__toks", F.array(*[F.lit(t) for t in sorted(toks)])
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
        rows = (
            scored.orderBy(F.desc("__obj"), F.asc("__id"))
            .limit(batch + 1)
            .collect()
        )
        jobs += 1
        if not rows:
            break
        # stale objective of the first UNcollected candidate = an upper
        # bound on every uncollected candidate's true objective
        bound = rows[batch]["__obj"] if len(rows) > batch else None
        local = [
            {
                "id": r["__id"],
                "toks": set(r["__toks"]),
                "rel": r["__rel"],
                "pen": r["__pen"],
            }
            for r in rows[:batch]
        ]
        base = len(chosen_toks)  # stale pens already cover chosen[:base]
        fresh = True
        while local and len(selected) < k:
            best = None
            for c in local:
                extra = max(
                    (len(c["toks"] & t) for t in chosen_toks[base:]),
                    default=0,
                )
                c["_pen"] = max(c["pen"], extra)
                c["_obj"] = c["rel"] - lam * c["_pen"]
                if best is None or (c["_obj"], -c["id"]) > (
                    best["_obj"],
                    -best["id"],
                ):
                    best = c
            if not fresh and bound is not None and not (best["_obj"] > bound):
                # an uncollected candidate may now win (or tie on a
                # smaller id) — refresh with a new job
                break
            selected.append(
                {
                    "rank": len(selected) + 1,
                    "id": best["id"],
                    "rel": best["rel"],
                    "penalty": best["_pen"],
                    "objective": best["_obj"],
                }
            )
            chosen_toks.append(best["toks"])
            local.remove(best)
            fresh = False
    if stats is not None:
        stats["jobs"] = jobs
    return selected
