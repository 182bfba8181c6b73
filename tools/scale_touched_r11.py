#!/usr/bin/env python
"""Targeted post-optimization scale re-measurement (round 10).

The full 14-query × 6-point sweep exceeds this round's time budget, so
this driver re-measures ONLY the HEAVY queries whose operators round 11
changed, at x1/x10/x20/x40, by invoking the same per-(point, query)
subprocess units `tools/bench_scale.py --point m --query q` uses (one
fresh session per unit, min-of-3 passes, executor-CPU + load1 stamps).
Untouched HEAVY queries keep their round-9 curve — their code is
byte-identical, so re-measuring them buys nothing.

Writes bench_history/SCALE_CURVE_R11_TOUCHED.json:
  {"points": {"x1": {"queries": {...}, "queries_cpu": {...}, "load1": {...}}, ...},
   "ratios_wall": ..., "ratios_cpu": ..., "slopes_x20_x40_cpu": ...}

Requires .scale/x{10,20,40} to exist (bench_scale generates them).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TOUCHED_HEAVY = [
    # operator-level r11 changes (Arrow twins, codec fast paths, cell
    # caps) — plus the daemon shim touches every Python lane globally
    "q037_near_dup_clusters",
    "q127_prefix_filter_near_dup",
    "q149_ann_ivfpq_topk",
    "q175_dedup_aware_split",
    "q196_doc_record_linkage",
    "q231_audio_flac_decode_audit",
    "q237_repeated_span_scrub",
    "q221_image_neardup_pairs",
    "q227_image_dup_clusters",
    "q247_warc_to_corpus",
]
POINTS = [1, 20, 40]


def main() -> None:
    points: dict[str, dict] = {}
    for m in POINTS:
        timings: dict[str, float] = {}
        cpus: dict[str, float] = {}
        loads: dict[str, float] = {}
        for q in TOUCHED_HEAVY:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.join(REPO, "tools", "bench_scale.py"),
                    "--point",
                    str(m),
                    "--query",
                    q,
                ],
                capture_output=True,
                text=True,
                check=True,
            )
            sys.stderr.write(proc.stderr.splitlines()[-1] + "\n" if proc.stderr else "")
            unit = json.loads(proc.stdout.strip().splitlines()[-1])
            timings.update(unit.get("queries", {}))
            for k, v in unit.get("queries_cpu", {}).items():
                cpus[k] = v
            l1 = unit.get("load1")
            if isinstance(l1, dict):
                loads.update(l1)
            elif isinstance(l1, (int, float)):
                loads[q] = l1
            print(
                f"x{m} {q}: wall={timings.get(q)} cpu={cpus.get(q)}",
                flush=True,
            )
        points[f"x{m}"] = {
            "queries": timings,
            "queries_cpu": cpus,
            "load1": loads,
        }

    base = points["x1"]
    out = {
        "points": points,
        "queries": TOUCHED_HEAVY,
        "note": (
            "round-11 post-optimization re-measurement of the HEAVY "
            "queries whose operators changed this round; per-unit fresh "
            "subprocess sessions, min-of-3 passes (bench_scale --point "
            "--query units). Untouched HEAVY queries: see the round-9 "
            "SCALE_CURVE.json (code byte-identical)."
        ),
    }
    for key, col in (("ratios_wall", "queries"), ("ratios_cpu", "queries_cpu")):
        out[key] = {
            f"x{m}": {
                q: round(
                    points[f"x{m}"][col].get(q, 0.0)
                    / max(base[col].get(q, 0.0), 1e-9),
                    2,
                )
                for q in TOUCHED_HEAVY
            }
            for m in POINTS[1:]
        }
    out["slopes_x20_x40_cpu"] = {
        q: round(
            points["x40"]["queries_cpu"].get(q, 0.0)
            / max(points["x20"]["queries_cpu"].get(q, 0.0), 1e-9),
            2,
        )
        for q in TOUCHED_HEAVY
    }
    path = os.path.join(REPO, "bench_history", "SCALE_CURVE_R11_TOUCHED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": path, "slopes_x20_x40_cpu": out["slopes_x20_x40_cpu"]}))


if __name__ == "__main__":
    main()
