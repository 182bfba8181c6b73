"""Semantics pins for the round-11 daemon-module shim
(``pyspark_zipfast_daemon``): per-task gc policy, conf wiring, and the
pre-import surface.  Companion to tests/test_worker_shim.py."""

from __future__ import annotations

import gc
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyspark_zipfast_daemon as shim


def test_policy_gen1_per_task_full_every_64():
    calls = []
    real_collect = gc.collect

    def fake_collect(gen=2):
        calls.append(gen)
        return 0

    gc.collect = fake_collect
    try:
        pol = shim._PerTaskGcPolicy()
        for _ in range(130):
            pol.collect()
    finally:
        gc.collect = real_collect
    # tasks 64 and 128 escalate to a FULL collect (default gen argument),
    # every other task collects generation 1 only
    assert len(calls) == 130
    assert [i for i, g in enumerate(calls, 1) if g != 1] == [64, 128]


def test_daemon_module_gc_reference_patched_not_global():
    import pyspark.daemon as stock

    # the stock module's reference is the policy object...
    assert isinstance(stock.gc, shim._PerTaskGcPolicy)
    # ...while the global gc module is untouched (UDF code sees stock gc)
    assert gc.collect.__module__ in (None, "gc") or callable(gc.collect)
    assert not isinstance(gc.collect, shim._PerTaskGcPolicy)
    # non-collect gc API passes through
    assert stock.gc.isenabled() == gc.isenabled()


def test_policy_counter_is_per_instance():
    a, b = shim._PerTaskGcPolicy(), shim._PerTaskGcPolicy()
    a.collect()
    assert a.n == 1 and b.n == 0


def test_preimported_surface_present():
    # the daemon pre-imports the heavy worker dependency surface so
    # forked workers inherit it copy-on-write
    for mod in (
        "numpy",
        "pandas",
        "pyarrow",
        "pyspark.worker",
        "logistics_data_pipeline_project_spark.operators.multimodal",
    ):
        assert mod in sys.modules, mod


def test_session_wires_daemon_conf():
    from logistics_data_pipeline_project_spark.session import (
        _zipfast_worker_conf,
    )

    conf = _zipfast_worker_conf("local[4]")
    assert conf.get("spark.python.worker.module") == "pyspark_zipfast_worker"
    assert conf.get("spark.python.daemon.module") == "pyspark_zipfast_daemon"
    # non-local masters: stay out of the way (cluster ships shims via
    # --py-files and sets the confs explicitly)
    assert _zipfast_worker_conf("spark://host:7077") == {}
