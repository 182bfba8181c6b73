#!/usr/bin/env python
"""Round-10 optimization profiler: per-query solo measurement + plan capture.

For each named query (or a built-in target list):
  - writes ``plans/r10/<name>_<suffix>.txt`` with ``explain("formatted")``
    (guide §1 / §7.2 — the judge checks plan claims against these files);
  - runs the query through the noop sink ``--reps`` times (guide §1.4)
    and reports wall (min/all), JVM executor CPU and Python-worker CPU
    per rep (the bench's two load-robust columns);
  - optionally ``--stages``: dumps the per-stage executorRunTime /
    executorCpuTime breakdown of the LAST rep so the expensive stage of
    a multi-job query is attributable.

Usage:
  python tools/profile_r10.py q149_ann_ivfpq_topk q151_bpe_tokenized_vocab \
      --suffix before --reps 3 [--stages] [--sf /root/testdata/sf0.1]

Run SOLO (no concurrent pytest/bench) — the Python-CPU probe sums every
pyspark.daemon tree on the host.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def py_cpu_total() -> float:
    tick = float(os.sysconf("SC_CLK_TCK"))
    ppid: dict[int, int] = {}
    ticks: dict[int, int] = {}
    roots: set[int] = set()
    for ent in os.listdir("/proc"):
        if not ent.isdigit():
            continue
        try:
            with open(f"/proc/{ent}/cmdline", "rb") as f:
                cmd = f.read()
            with open(f"/proc/{ent}/stat", "rb") as f:
                raw = f.read()
        except OSError:
            continue
        rest = raw[raw.rindex(b")") + 2 :].split()
        pid = int(ent)
        ppid[pid] = int(rest[1])
        ticks[pid] = int(rest[11]) + int(rest[12]) + int(rest[13]) + int(rest[14])
        if (
            b"pyspark.daemon" in cmd
            or b"pyspark.worker" in cmd
            or (
                    b"pyspark_zipfast_daemon" in cmd
                    # the conf string also appears in the JVM argv:
                    # only python processes are worker-tree roots
                    and b"python" in cmd.split(b"\x00", 1)[0]
                )  # r11 daemon shim
        ):
            roots.add(pid)
    tree = set(roots)
    changed = True
    while changed:
        changed = False
        for pid, pp in ppid.items():
            if pp in tree and pid not in tree:
                tree.add(pid)
                changed = True
    return sum(ticks[p] for p in tree) / tick


class StageProbe:
    def __init__(self, spark):
        import urllib.request

        self.ui = spark.sparkContext.uiWebUrl
        apps = json.load(
            urllib.request.urlopen(f"{self.ui}/api/v1/applications", timeout=10)
        )
        self.app_id = apps[0]["id"]
        self.last = -1

    def fetch(self):
        import urllib.request

        return json.load(
            urllib.request.urlopen(
                f"{self.ui}/api/v1/applications/{self.app_id}"
                "/stages?status=complete",
                timeout=15,
            )
        )

    def delta(self, detail: bool = False):
        time.sleep(0.15)
        stages = self.fetch()
        cpu = run = 0
        rows = []
        max_seen = self.last
        for s in sorted(stages, key=lambda s: int(s.get("stageId", -1))):
            sid = int(s.get("stageId", -1))
            if sid <= self.last:
                continue
            max_seen = max(max_seen, sid)
            cpu += int(s.get("executorCpuTime", 0) or 0)
            run += int(s.get("executorRunTime", 0) or 0)
            if detail:
                rows.append(
                    (
                        sid,
                        int(s.get("executorRunTime", 0) or 0) / 1e3,
                        int(s.get("executorCpuTime", 0) or 0) / 1e9,
                        int(s.get("numTasks", 0) or 0),
                        (s.get("description") or s.get("name", ""))[:90],
                    )
                )
        self.last = max_seen
        return cpu / 1e9, run / 1e3, rows


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--no-plan", action="store_true")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from logistics_data_pipeline_project_spark.queries import REGISTRY
    from logistics_data_pipeline_project_spark.session import get_spark
    from logistics_data_pipeline_project_spark.operators.checkpoints import (
        persistent_rdd_ids,
        release_residual_checkpoints,
    )

    names = []
    for q in args.queries:
        if q in REGISTRY:
            names.append(q)
        else:
            hits = [n for n in REGISTRY if n.startswith(q)]
            if len(hits) != 1:
                sys.exit(f"unknown query {q!r} (hits: {hits})")
            names.append(hits[0])

    spark = get_spark(
        app_name="profile-r10",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4061",
            "spark.ui.retainedStages": "800",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    ckpt_baseline = persistent_rdd_ids(spark)
    spark.range(1_000_000).agg({"id": "sum"}).collect()
    warm_dir = "/root/testdata/sf0.001"
    for name in names:
        try:
            REGISTRY[name].fn(spark, warm_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        release_residual_checkpoints(spark, ckpt_baseline)

    plans_dir = os.path.join(REPO, "plans", "r10")
    os.makedirs(plans_dir, exist_ok=True)
    probe = StageProbe(spark)
    probe.delta()
    py_cpu_total()

    for name in names:
        spec = REGISTRY[name]
        if not args.no_plan:
            df = spec.fn(spark, args.sf)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plans_dir, f"{name}_{args.suffix}.txt"), "w"
            ) as f:
                f.write(buf.getvalue())
            release_residual_checkpoints(spark, ckpt_baseline)
            probe.delta()  # drain plan-side jobs (fan_out getNumPartitions etc.)
            py_cpu_total()
        walls, cpus, pys = [], [], []
        rows = []
        for rep in range(args.reps):
            py0 = py_cpu_total()
            t0 = time.perf_counter()
            spec.fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            pys.append(py_cpu_total() - py0)
            cpu, run, rows = probe.delta(detail=args.stages and rep == args.reps - 1)
            cpus.append(cpu)
            release_residual_checkpoints(spark, ckpt_baseline)
        print(
            f"{name}: wall_min={min(walls):.3f}s walls={[round(w,3) for w in walls]}"
            f" cpu={[round(c,2) for c in cpus]} py_cpu={[round(p,2) for p in pys]}"
        )
        if args.stages:
            for sid, run, cpu, ntasks, desc in rows:
                if run < 0.02:
                    continue
                print(
                    f"    stage {sid:5d} run={run:7.2f}s cpu={cpu:7.2f}s"
                    f" tasks={ntasks:3d} {desc}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
