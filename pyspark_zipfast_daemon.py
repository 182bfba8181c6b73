"""PySpark daemon-module shim: stock ``pyspark.daemon`` minus the
per-task FULL ``gc.collect()``.

Why this exists (measured on this host, Spark 4.1.2, local[32]):
``pyspark/daemon.py``'s reused-worker loop runs ``gc.collect()`` after
EVERY task::

    while True:
        code = worker(sock, authenticated)
        ...
        gc.collect()

A full (generation-2) collection walks the worker's whole object graph —
pyspark + pandas + numpy + pyarrow imports put ~10^5 objects on the GC
heap, so the sweep costs ~12-31 ms of CPU **per task**, for every UDF
flavor, independent of how much work the task did.  A 32-task identity
``mapInPandas`` stage measured 31.1 ms/task of daemon-tree CPU with
0.3 ms/task of actual worker main-loop CPU — i.e. after round 10's
zip-TOC fix, the per-task collect IS the remaining Python-worker floor.
At cluster scale the tax is identical per task.

What the shim changes: only ``pyspark.daemon``'s module-level ``gc``
reference is swapped for a policy object whose ``collect()`` runs a
generation-1 collection per task (~0.02 ms — young/middle cycles from
the finished task are still reclaimed promptly) and escalates to the
original FULL collection every 64th task, so old-generation cycle
garbage in a long-lived worker stays bounded.  CPython's automatic
threshold GC remains enabled throughout — the daemon's call was always
belt-and-braces on top of it, not load-bearing for correctness.
``gc.collect`` itself is NOT patched: UDF code that calls it gets stock
semantics.

Activation: ``session.get_spark`` sets
``spark.python.daemon.module=pyspark_zipfast_daemon`` alongside the
round-10 worker shim when both files are importable and the master is
local.  On a cluster, ship both files with ``--py-files`` and set both
confs.  The JVM passes the configured worker module as ``argv[1]``;
importing ``pyspark.daemon`` below picks it up from ``sys.argv``
unchanged, so the worker-module contract is untouched.
"""

from __future__ import annotations

import gc
import sys

import pyspark.daemon as _stock_daemon

# ---------------------------------------------------------------------------
# Pre-import the heavy per-worker dependency surface ONCE in the daemon:
# forked workers inherit fully-initialized modules copy-on-write, so the
# first Arrow task per worker no longer pays the ~0.4 s pandas/pyarrow/
# numpy import storm (measured: 32 workers x ~0.4 CPU-s = ~13 CPU-s per
# session before this, the dominant "per-task" Python cost in short
# stages after the gc fix below).  Imports are best-effort — a missing
# optional module just means that worker pays its own import, as stock.
# ---------------------------------------------------------------------------
for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyarrow.ipc",
    "pyspark.worker",
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
    # the engine's own operator modules (present when the repo root is
    # on PYTHONPATH, i.e. whenever this shim itself is importable)
    "logistics_data_pipeline_project_spark.operators.multimodal",
    "logistics_data_pipeline_project_spark.operators.similarity",
    "logistics_data_pipeline_project_spark.operators.dedup",
    "logistics_data_pipeline_project_spark.operators.text",
):
    try:
        __import__(_mod)
    except Exception:  # pragma: no cover - optional at cluster scale
        pass

#: full-collection cadence (tasks) inside one reused worker process
_FULL_EVERY = 64


class _PerTaskGcPolicy:
    """Drop-in for daemon.py's ``gc`` module reference: cheap gen-1
    collection per task, full collection every ``_FULL_EVERY`` tasks.
    Each forked worker inherits an independent counter."""

    __slots__ = ("n",)

    def __init__(self) -> None:
        self.n = 0

    def collect(self) -> int:
        self.n += 1
        if self.n % _FULL_EVERY == 0:
            return gc.collect()
        return gc.collect(1)

    def __getattr__(self, name):  # any other gc API: stock behavior
        return getattr(gc, name)


# Patch the daemon module's reference only (never gc.collect globally).
_stock_daemon.gc = _PerTaskGcPolicy()


if __name__ == "__main__":
    # pyspark.daemon's import already resolved the worker module from
    # sys.argv[1]; just run its manager loop with the patched reference.
    sys.argv[0] = _stock_daemon.__file__
    _stock_daemon.manager()
