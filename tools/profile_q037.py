#!/usr/bin/env python
"""Stage-level profile of q037's x20->x40 scale step (VERDICT r7 ask #2).

The r7 SCALE_CURVE shows q037_near_dup_clusters stepping 9.50s -> 30.26s
from x20 to x40 (3.2x for 2x data; 11.1x total at x40 — the worst
non-decode ratio), with 2-3x single-host variance (11.9s in a warmed
session).  q175 taught us these curves can lie (its r6 "knee" was
session-order bias), so this tool isolates WHERE the time goes with the
same discipline: one fresh subprocess per (point, conf-variant), each
stage min-of-2, warm-up at sf0.001, checkpoint residue freed between
stages.

Cumulative stages (each includes its predecessors — read the DELTAS):

  1. shingles_count  — parquet scan + explode + count
  2. dfcap_noop      — + the window doc-frequency cap (sort-based
                       window over the full shingle stream — the prime
                       suspect: per-partition sort size doubles per
                       point while spark.sql.shuffle.partitions stays
                       fixed at 32, so this is where a spill knee
                       would live)
  3. inv_noop        — + the collect_list inverted index
  4. edges_count     — + pair explode + intersection agg + size joins
  5. sym_ckpt        — + symmetrize + eager localCheckpoint (what
                       connected_components actually materializes)
  6. cc_noop         — + union-find/propagation + label join-back
  7. q037_full       — + cluster-size aggregate + final join

Each subprocess also reports shuffle spill (memory/disk bytes summed
over completed stages, from the UI REST API — the engine session runs
UI-off, the profiler turns it on) and the symmetrized edge count vs the
1M driver-local threshold.

The A/B lever: ``--partitions 256`` re-runs a point with
spark.sql.shuffle.partitions=256.  If the x40 step collapses under more
partitions, the mechanism is per-partition volume (sort spill /
execution-memory pressure), i.e. a CONF knee, not an algorithmic one —
on a real cluster the same stage gets more parallelism automatically
from AQE's initialPartitionNum sizing.

Usage:
  python tools/profile_q037.py                 # full matrix, subprocesses
  python tools/profile_q037.py x20 x40         # choose points
  python tools/profile_q037.py --point x40 --partitions 32   # one cell
  python tools/profile_q037.py --curve x40 --warm x2 --reps 7 \
      --query q127_prefix_filter_near_dup   # floor study, any query
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spill_totals(spark) -> dict[str, int]:
    """Sum spill/GC metrics over all completed stages via the UI REST
    API (profiler sessions run with spark.ui.enabled=true)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    try:
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )
        app_id = apps[0]["id"]
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages?status=complete",
                timeout=30,
            )
        )
    except Exception as exc:  # UI formats shift between versions
        return {"spill_probe_error": str(exc)[:120]}
    out = {"memoryBytesSpilled": 0, "diskBytesSpilled": 0, "jvmGcTimeMs": 0}
    for s in stages:
        out["memoryBytesSpilled"] += int(s.get("memoryBytesSpilled", 0))
        out["diskBytesSpilled"] += int(s.get("diskBytesSpilled", 0))
        out["jvmGcTimeMs"] += int(s.get("jvmGcTime", 0) or 0)
    return out


def run_point(point: str, partitions: int) -> None:
    from pyspark.sql import functions as F

    from logistics_data_pipeline_project_spark.io_utils import load
    from logistics_data_pipeline_project_spark.operators.checkpoints import (
        free_checkpoints,
        persistent_rdd_ids,
        release_residual_checkpoints,
        tracked_local_checkpoint,
    )
    from logistics_data_pipeline_project_spark.operators.dedup import (
        Window,
        connected_components,
        shingle_jaccard_pairs,
        word_shingles,
    )
    from logistics_data_pipeline_project_spark.queries import REGISTRY
    from logistics_data_pipeline_project_spark.queries.llmdata import (
        _JACCARD_MAX_DF,
        _JACCARD_N,
        _JACCARD_THRESHOLD,
    )
    from logistics_data_pipeline_project_spark.session import get_spark

    sf_dir = os.path.join(REPO, ".scale", point)
    spark = get_spark(
        app_name=f"profile-q037-{point}-p{partitions}",
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.sql.shuffle.partitions": str(partitions),
            "spark.ui.enabled": "true",
            "spark.ui.port": "4055",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).agg({"id": "sum"}).collect()
    REGISTRY["q037_near_dup_clusters"].fn(
        spark, "/root/testdata/sf0.001"
    ).write.format("noop").mode("overwrite").save()
    baseline = persistent_rdd_ids(spark)

    docs = load(spark, sf_dir, "documents")
    out: dict = {"point": point, "partitions": partitions}

    def timeit(name, fn, reps=2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
            release_residual_checkpoints(spark, baseline)
        out[name] = round(best, 3)
        print(f"# {point} p{partitions} {name} = {best:.3f}s",
              file=sys.stderr, flush=True)

    def shingles():
        return word_shingles(docs, "text", "doc_id", n=_JACCARD_N)

    def dfcapped():
        w = Window.partitionBy("shingle")
        return (
            shingles()
            .withColumn("__df", F.count(F.lit(1)).over(w))
            .filter(F.col("__df") <= _JACCARD_MAX_DF)
            .drop("__df")
        )

    def inv():
        return dfcapped().groupBy("shingle").agg(
            F.array_sort(F.collect_list("doc_id")).alias("ids")
        )

    def edges():
        return shingle_jaccard_pairs(
            docs, "text", "doc_id",
            n=_JACCARD_N, threshold=_JACCARD_THRESHOLD,
            max_shingle_df=_JACCARD_MAX_DF,
        )

    out["n_shingle_rows"] = shingles().count()
    timeit("shingles_count", lambda: shingles().count())
    timeit("dfcap_noop", lambda: dfcapped().write.format("noop")
           .mode("overwrite").save())
    timeit("inv_noop", lambda: inv().write.format("noop")
           .mode("overwrite").save())
    out["n_edges"] = edges().count()
    timeit("edges_count", lambda: edges().count())

    def sym_ckpt():
        e = edges()
        sym = e.select(
            F.explode(
                F.array(
                    F.struct(F.col("id1").alias("__a"),
                             F.col("id2").alias("__b")),
                    F.struct(F.col("id2").alias("__a"),
                             F.col("id1").alias("__b")),
                )
            ).alias("__e")
        ).select("__e.__a", "__e.__b")
        ck, ids = tracked_local_checkpoint(sym)
        n = ck.count()
        free_checkpoints(spark, ids)
        return n

    timeit("sym_ckpt", sym_ckpt)
    timeit("cc_noop", lambda: connected_components(
        docs.select("doc_id"), edges(), id_col="doc_id"
    ).write.format("noop").mode("overwrite").save())
    timeit("q037_full", lambda: REGISTRY["q037_near_dup_clusters"].fn(
        spark, sf_dir).write.format("noop").mode("overwrite").save())

    out.update(_spill_totals(spark))
    print(json.dumps(out), flush=True)
    spark.stop()


def run_curve(
    point: str,
    reps: int,
    warm: str | None = None,
    query: str = "q037_near_dup_clusters",
) -> None:
    """Per-rep wall vs executor-CPU curve of ``query`` in one fresh
    session: if CPU is flat across reps and ~linear across points while
    wall swings multiples, the scale step is host/JVM scheduling, not
    algorithmic work.  ``warm`` (an .scale/<dir> name) warms with a
    LARGE-data run instead of sf0.001 — at sf0.001 AQE picks broadcast
    joins, so the sort-merge-join codegen paths the big points execute
    stay cold and rep0 pays the interpreter/C2 ramp.  Round 9 learned a
    second reading: on this sandbox CPU is NOT always flat — q127's
    x40 reps alternate 358-654 with 1126-1198 CPU-s bands (hypervisor
    interference hits wall and CPU together, invisible to guest
    loadavg) — so the FLOOR across reps is the estimator, and a
    ``--query`` flag makes the floor study runnable on any catalog
    query."""
    from logistics_data_pipeline_project_spark.operators.checkpoints import (
        persistent_rdd_ids,
        release_residual_checkpoints,
    )
    from logistics_data_pipeline_project_spark.queries import REGISTRY
    from logistics_data_pipeline_project_spark.session import get_spark

    sf_dir = os.path.join(REPO, ".scale", point)
    spark = get_spark(
        app_name=f"curve-{query}-{point}",
        extra_conf={
            "spark.driver.memory": "24g",
            "spark.ui.enabled": "true",
            "spark.ui.port": "4056",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).agg({"id": "sum"}).collect()
    warm_dir = (
        os.path.join(REPO, ".scale", warm)
        if warm
        else "/root/testdata/sf0.001"
    )
    REGISTRY[query].fn(
        spark, warm_dir
    ).write.format("noop").mode("overwrite").save()
    baseline = persistent_rdd_ids(spark)

    def cpu_ms() -> int:
        import urllib.request

        ui = spark.sparkContext.uiWebUrl
        apps = json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications", timeout=10)
        )
        stages = json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{apps[0]['id']}"
                "/stages?status=complete",
                timeout=30,
            )
        )
        return sum(int(s.get("executorCpuTime", 0)) for s in stages) // 1_000_000

    out = {"point": point, "reps": []}
    prev_cpu = cpu_ms()
    for i in range(reps):
        t0 = time.perf_counter()
        REGISTRY[query].fn(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 3)
        release_residual_checkpoints(spark, baseline)
        cur = cpu_ms()
        rep = {"wall_s": wall, "cpu_s": round((cur - prev_cpu) / 1000, 3)}
        prev_cpu = cur
        out["reps"].append(rep)
        print(f"# {point} rep{i}: wall={rep['wall_s']}s cpu={rep['cpu_s']}s",
              file=sys.stderr, flush=True)
    print(json.dumps(out), flush=True)
    spark.stop()


def main() -> None:
    if "--curve" in sys.argv:
        point = sys.argv[sys.argv.index("--curve") + 1]
        reps = 6
        if "--reps" in sys.argv:
            reps = int(sys.argv[sys.argv.index("--reps") + 1])
        warm = None
        if "--warm" in sys.argv:
            warm = sys.argv[sys.argv.index("--warm") + 1]
        query = "q037_near_dup_clusters"
        if "--query" in sys.argv:
            query = sys.argv[sys.argv.index("--query") + 1]
        run_curve(point, reps, warm, query)
        return
    if "--point" in sys.argv:
        point = sys.argv[sys.argv.index("--point") + 1]
        partitions = 32
        if "--partitions" in sys.argv:
            partitions = int(sys.argv[sys.argv.index("--partitions") + 1])
        run_point(point, partitions)
        return
    points = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "x20", "x40",
    ]
    results = []
    for pt in points:
        if not os.path.isdir(os.path.join(REPO, ".scale", pt)):
            print(f"missing .scale/{pt} — run tools/bench_scale.py first")
            continue
        for parts in (32, 256):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--point", pt, "--partitions", str(parts)],
                capture_output=True, text=True, timeout=3600,
            )
            sys.stderr.write(proc.stderr)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("{")]
            if proc.returncode != 0 or not line:
                print(f"{pt} p{parts}: FAILED rc={proc.returncode}")
                continue
            results.append(json.loads(line[-1]))
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
