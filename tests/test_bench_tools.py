"""Unit tests for the bench tooling itself (no Spark session needed):
the SCALE_CURVE --update merge (ADVICE r9: shared-session points store
scalar load1 and crashed the fold AFTER an expensive sweep) and the
Python-worker CPU probe bench.py grew in round 10 (VERDICT r9
what's-wrong #3)."""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))


def _merge():
    from bench_scale import _merge_points

    return _merge_points


def test_merge_points_scalar_load1_old_side():
    """A pre-existing --shared-session point (scalar load1) must merge
    with a fresh per-query point without AttributeError, fanning the
    scalar out to every query it stamped."""
    merged = {
        "x20": {
            "queries": {"qa": 5.0, "qb": 2.0},
            "queries_cpu": {"qa": 10.0},
            "load1": 0.7,  # shared-session shape: ONE scalar
            "x2_warm": True,
            "total": 7.0,
        }
    }
    fresh = {
        "x20": {
            "queries": {"qa": 4.0, "qb": 3.0},
            "queries_cpu": {"qa": 8.0, "qb": 1.5},
            "load1": {"qa": 0.2, "qb": 1.5},
            "x2_warm": True,
            "total": 7.0,
        },
        "x40": {
            "queries": {"qa": 9.0},
            "queries_cpu": {"qa": 20.0},
            "load1": {"qa": 0.1},
            "x2_warm": False,
            "total": 9.0,
        },
    }
    _merge()(merged, fresh)
    pt = merged["x20"]
    assert pt["queries"] == {"qa": 4.0, "qb": 2.0}
    assert pt["queries_cpu"] == {"qa": 8.0, "qb": 1.5}
    # qa: min(0.7 scalar, 0.2) ; qb: min(0.7 scalar, 1.5)
    assert pt["load1"] == {"qa": 0.2, "qb": 0.7}
    assert pt["total"] == 6.0
    # brand-new point passes through untouched
    assert merged["x40"]["queries"] == {"qa": 9.0}
    assert merged["x40"]["x2_warm"] is False
    # the merged curve must stay strict-JSON serializable (no inf/nan
    # from missing-side min folds)
    assert "inf" not in json.dumps(merged, allow_nan=False).lower()


def test_merge_points_scalar_load1_fresh_side():
    """The mirror case: folding a --shared-session re-measurement into
    a per-query curve (pt's load1 is the scalar)."""
    merged = {
        "x20": {
            "queries": {"qa": 5.0},
            "load1": {"qa": 0.9},
            "x2_warm": True,
            "total": 5.0,
        }
    }
    fresh = {
        "x20": {
            "queries": {"qa": 6.0, "qc": 1.0},
            "load1": 0.3,
            "x2_warm": True,
            "total": 7.0,
        }
    }
    _merge()(merged, fresh)
    pt = merged["x20"]
    assert pt["queries"] == {"qa": 5.0, "qc": 1.0}
    assert pt["load1"] == {"qa": 0.3, "qc": 0.3}
    assert pt["total"] == 6.0


def test_merge_points_no_load1_anywhere():
    """Very old curves carry no load stamps at all — the merge must not
    invent inf entries for them."""
    merged = {"x5": {"queries": {"qa": 2.0}, "total": 2.0}}
    fresh = {"x5": {"queries": {"qa": 1.5}, "total": 1.5}}
    _merge()(merged, fresh)
    assert merged["x5"]["queries"] == {"qa": 1.5}
    assert "load1" not in merged["x5"]
    json.dumps(merged, allow_nan=False)


def test_py_cpu_probe_self_consistent():
    """_PyCpuProbe inits on this Linux host, parses /proc stat lines
    (ppid of this process must match os.getppid()), and deltas are
    non-negative and monotone-safe."""
    import bench

    ppid, ticks = bench._PyCpuProbe._stat(str(os.getpid()))
    assert ppid == os.getppid()
    assert ticks >= 0

    probe = bench._PyCpuProbe()
    assert probe.error is None
    d = probe.delta()
    # no pyspark.daemon should be running during unit tests, and the
    # clamp forbids negatives in any case
    assert d is not None and d >= 0.0
