"""PySpark worker-module shim: stock ``pyspark.worker`` minus the
per-task zip-TOC re-read.

Why this exists (measured on this host, Spark 4.1.2, local[32]):
``pyspark/worker.py::main`` calls ``setup_spark_files`` for EVERY task,
which ends with ``importlib.invalidate_caches()``.  CPython's
``zipimport.zipimporter.invalidate_caches`` re-reads the **entire zip
central directory** when asked to invalidate, and Spark launches Python
workers with ``$SPARK_HOME/python/lib/pyspark.zip`` + ``py4j-*.zip`` on
``PYTHONPATH`` — so every Python task (any UDF flavor: mapInPandas,
mapInArrow, pandas_udf, pickled row UDFs) pays ~0.2 CPU-s re-parsing
~40k zip entries before doing any work.  An identity ``mapInPandas``
task measured 238 ms worker CPU of which ~85% was
``zipimport._read_directory`` (cProfile via this same worker-module
hook).  At cluster scale the tax is identical per task — thousands of
small Python tasks per stage each re-read the TOC.

What the shim changes: ``importlib.invalidate_caches`` (in the worker
process only) is replaced by a twin that walks the same finder
structures but SKIPS ``zipimport.zipimporter`` instances.  Semantics
kept:

- ``None`` entries are still dropped from ``sys.path_importer_cache``;
- every non-zip finder (``FileFinder`` for directories — the ones that
  matter for ``sc.addPyFile`` of plain ``.py`` files) is still
  invalidated;
- non-PathFinder meta-path finders are still invalidated.

The only behavior lost: a ``.zip``/``.egg`` **replaced in-place** on an
already-cached path mid-session would serve stale entries.  Spark never
does that (``addPyFile`` distributes to a fresh path, which has no
cached finder yet and therefore gets a fresh zipimporter), and this
engine adds no py-files at runtime at all.

Activation: ``session.get_spark`` sets
``spark.python.worker.module=pyspark_zipfast_worker`` when this module
is importable and the master is local (the daemon inherits the driver's
``PYTHONPATH``).  On a cluster, ship this file with ``--py-files`` and
set the same conf — the daemon only requires the module name to start
with ``"pyspark"``.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import sys
import zipimport

import pyspark.worker as _stock_worker


def _invalidate_caches_skip_zip_reread() -> None:
    """``importlib.invalidate_caches()`` with zipimporters left alone."""
    for name, finder in list(sys.path_importer_cache.items()):
        if finder is None:
            sys.path_importer_cache.pop(name, None)
        elif isinstance(finder, zipimport.zipimporter):
            # invalidate_caches() on a zipimporter re-reads the whole
            # zip central directory — the ~0.2 CPU-s/task tax this shim
            # removes.  Skipping keeps the cached TOC; see module doc
            # for why that is safe under Spark's file-distribution model.
            continue
        else:
            inv = getattr(finder, "invalidate_caches", None)
            if inv is not None:
                inv()
    for finder in list(sys.meta_path):
        if finder is importlib.machinery.PathFinder:
            continue  # its work is the path_importer_cache walk above
        inv = getattr(finder, "invalidate_caches", None)
        if inv is not None:
            inv()


# Patch in the WORKER process only — this module is loaded exclusively
# as the pyspark daemon/worker entry point (spark.python.worker.module).
importlib.invalidate_caches = _invalidate_caches_skip_zip_reread

# Loud effectiveness check (fails soft, logs hard): the patch only takes
# effect because pyspark.worker_util calls ``importlib.invalidate_caches``
# via attribute lookup on the importlib MODULE (true in Spark 4.1.x).  A
# pyspark upgrade that switches to ``from importlib import
# invalidate_caches`` would silently bind the stock function and re-pay
# the zip-TOC tax — surface that in the executor stderr log instead.
try:
    import pyspark.worker_util as _wu

    if getattr(_wu, "importlib", None) is not importlib:
        sys.stderr.write(
            "pyspark_zipfast_worker: pyspark.worker_util no longer resolves"
            " invalidate_caches through the importlib module attribute —"
            " the zip-TOC shim is INEFFECTIVE on this pyspark version\n"
        )
except Exception:  # pragma: no cover - only on drastic pyspark reshapes
    sys.stderr.write(
        "pyspark_zipfast_worker: could not verify the worker_util hook;"
        " the zip-TOC shim may be ineffective\n"
    )

#: the daemon looks up ``main`` on the configured worker module
main = _stock_worker.main


if __name__ == "__main__":
    # Mirror pyspark.worker's standalone entry (used when
    # spark.python.use.daemon=false): delegate to the stock module's
    # __main__ path with the patch above already applied.
    import runpy

    sys.argv[0] = _stock_worker.__file__
    runpy.run_module("pyspark.worker", run_name="__main__", alter_sys=True)
