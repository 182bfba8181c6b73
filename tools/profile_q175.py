#!/usr/bin/env python
"""Stage-level profile of q175's x10->x20 scale knee (VERDICT r6 ask #2).

FINDINGS (round 7, this tool + /tmp probe variants; kept as the
reproduction recipe):

  * Not the algorithm. q037 and q175 share the SAME edge pipeline
    (shingle_jaccard_pairs, identical params) and the same
    connected_components call; at x20 the symmetrized edge count is
    10,400 — nowhere near the 1M local_edge_threshold, so the
    driver-local union-find path serves every scale point and the
    distributed O(diameter) loop never runs.
  * Fresh-session truth: x10 q175 = 4.22s, x20 = 6.84s — ratio 1.62,
    right next to q037's 1.38. No knee.
  * The r6 SCALE_CURVE's 5.78 -> 14.68 (2.54x) was SESSION-ORDER BIAS:
    in a session that has already run q127/q149/q165 (the HEAVY-list
    order), q175 stabilizes at ~15.5s — 2.3x its own-session cost —
    and the bias survives release_residual_checkpoints AND a forced
    System.gc() between queries, so it is JVM/codegen/worker-pool
    aging, not storage leakage. min-of-4 cannot remove a stable bias;
    every pass of a late-listed query pays it (q037, first in the
    list, never does — hence the illusion that only q175 kneed).
  * Fix shipped: tools/bench_scale.py now measures one subprocess per
    (multiple, query) by default (--shared-session keeps the old
    mode), and SCALE_CURVE.json carries a methodology note.

This script times, in a fresh session per point:

  1. sym_count       — the symmetrized edge count, vs the 1M
                       local_edge_threshold in connected_components
  2. comp_only       — edges + connected_components materialized
  3. q037_full       — the contrast query
  4. q175_full       — the knee query

Usage: python tools/profile_q175.py x10 [x20 ...]   (dirs under .scale/)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from logistics_data_pipeline_project_spark.operators.dedup import (  # noqa: E402
    connected_components,
    shingle_jaccard_pairs,
)
from logistics_data_pipeline_project_spark.queries import REGISTRY  # noqa: E402
from logistics_data_pipeline_project_spark.queries.llmdata import (  # noqa: E402
    _JACCARD_MAX_DF,
    _JACCARD_N,
    _JACCARD_THRESHOLD,
)
from logistics_data_pipeline_project_spark.io_utils import load  # noqa: E402
from logistics_data_pipeline_project_spark.session import get_spark  # noqa: E402


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    points = sys.argv[1:] or ["x10", "x20"]
    for pt in points:
        sf_dir = os.path.join(repo, ".scale", pt)
        if not os.path.isdir(sf_dir):
            print(f"missing {sf_dir} — run tools/bench_scale.py first")
            continue
        spark = get_spark(
            app_name=f"profile-q175-{pt}",
            extra_conf={"spark.driver.memory": "24g"},
        )
        spark.sparkContext.setLogLevel("ERROR")
        spark.range(1_000_000).agg({"id": "sum"}).collect()
        for q in ("q037_near_dup_clusters", "q175_dedup_aware_split"):
            REGISTRY[q].fn(spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()

        docs = load(spark, sf_dir, "documents")

        def edges():
            return shingle_jaccard_pairs(
                docs, "text", "doc_id",
                n=_JACCARD_N, threshold=_JACCARD_THRESHOLD,
                max_shingle_df=_JACCARD_MAX_DF,
            )

        out: dict[str, float] = {}

        t0 = time.perf_counter()
        n_edges = edges().count()
        out["edges_count"] = time.perf_counter() - t0
        print(f"{pt}: n_edges={n_edges} (sym={2 * n_edges},"
              f" threshold=1_000_000)")

        def timeit(name, fn, reps=2):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            out[name] = round(best, 3)
            print(f"{pt}: {name} = {best:.3f}s", flush=True)

        timeit("comp_only", lambda: connected_components(
            docs.select("doc_id"), edges(), id_col="doc_id"
        ).write.format("noop").mode("overwrite").save())
        for q in ("q037_near_dup_clusters", "q175_dedup_aware_split"):
            timeit(q, lambda q=q: REGISTRY[q].fn(spark, sf_dir).write.format(
                "noop").mode("overwrite").save())
        print(f"{pt}: RESULT {out}", flush=True)
        spark.stop()


if __name__ == "__main__":
    main()
