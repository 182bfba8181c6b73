#!/usr/bin/env python
"""Resumable driver for the per-(multiple, query) scale sweep.

Runs `tools/bench_scale.py --point <m> --query <q>` one unit at a time,
persisting each unit's min-of-3 to a units file IMMEDIATELY, so a
killed or timed-out sweep resumes instead of restarting (the parent
sweep in bench_scale.py only writes SCALE_CURVE.json at the very end).
When all units are present it assembles SCALE_CURVE.json in the exact
payload shape bench_scale.py produces.

Usage:
  python tools/scale_units_driver.py [--mults 1,2,5,10,20,40]
          [--units /tmp/scale7_units.json]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scale import BASE, HEAVY  # noqa: E402


def main() -> None:
    mults = [1, 2, 5, 10, 20, 40]
    if "--mults" in sys.argv:
        mults = [int(x) for x in sys.argv[sys.argv.index("--mults") + 1].split(",")]
    units_path = "/tmp/scale7_units.json"
    if "--units" in sys.argv:
        units_path = sys.argv[sys.argv.index("--units") + 1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    bench_scale = os.path.join(repo, "tools", "bench_scale.py")

    units: dict[str, float] = {}
    if os.path.exists(units_path):
        with open(units_path) as f:
            units = json.load(f)

    todo = [
        (m, q) for m in mults for q in HEAVY if f"{m}:{q}" not in units
    ]
    print(f"{len(units)} units cached, {len(todo)} to run", file=sys.stderr)
    for m, q in todo:
        proc = subprocess.run(
            [sys.executable, bench_scale, "--point", str(m), "--query", q],
            capture_output=True,
            text=True,
            check=True,
        )
        unit = json.loads(proc.stdout.strip().splitlines()[-1])
        units[f"{m}:{q}"] = unit["queries"][q]
        with open(units_path, "w") as f:
            json.dump(units, f, indent=1)
        print(f"# x{m} {q}: {units[f'{m}:{q}']:.3f}s", file=sys.stderr, flush=True)

    points = {
        f"x{m}": {
            "total": round(sum(units[f"{m}:{q}"] for q in HEAVY), 3),
            "queries": {q: units[f"{m}:{q}"] for q in HEAVY},
        }
        for m in mults
    }
    base_q = points[f"x{mults[0]}"]["queries"]
    ratios = {
        f"x{m}": {
            q: round(points[f"x{m}"]["queries"][q] / max(base_q[q], 1e-9), 2)
            for q in HEAVY
        }
        for m in mults[1:]
    }
    payload = {
        "metric": "heavy_tail_scale_curve",
        "base_sf_dir": BASE,
        "mults": mults,
        "points": points,
        "ratio_vs_x1": ratios,
        "design": (
            "weak-scaling: k independent key-offset sf0.1 shards under "
            "per-replica affine letter/digit permutations (distinct maps "
            "agree on <=2 chars, so replicas share no keys and no "
            "3+-distinct-char tokens)"
        ),
        "methodology": (
            "round 7: one subprocess per (multiple, query), min-of-3, "
            "each query self-warmed at sf0.001, checkpoint residue "
            "released between passes — the prior shared-session points "
            "biased LATE-LISTED queries up to 2x by session state (x20 "
            "q175: 15.5s after q127/q149/q165 in one session vs 6.8-8.0s "
            "in its own; neither residue release nor forced System.gc() "
            "removed it), which is what the r6 curve's q175 x10->x20 "
            "'knee' (5.78->14.68) actually was"
        ),
        "variance_note": (
            "x40 points carry 2-3x single-host variance: q037 x40 "
            "measured 40.8s / 30.3s on two own-session min-of-3 runs "
            "and 11.9s in a heavily warmed session (edges+components "
            "pre-run) — the sandbox's upward-only stalls and JIT depth "
            "dominate at this size, so read the CURVE SHAPE under the "
            "fixed methodology, not any single x40 value"
        ),
    }
    out = os.path.join(repo, "bench_history", "SCALE_CURVE.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps({"total_units": len(units), "out": out}))


if __name__ == "__main__":
    main()
