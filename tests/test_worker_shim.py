"""pyspark_zipfast_worker: the per-task zip-TOC-re-read fix (r10).

Three angles:
- conf wiring: ``get_spark`` points ``spark.python.worker.module`` at
  the shim for local masters (and leaves cluster masters alone);
- semantics: the replacement ``invalidate_caches`` still invalidates
  directory (FileFinder) caches — the case Spark's per-task call
  actually protects (``sc.addPyFile`` of plain ``.py`` files) — while
  leaving zipimporter TOC caches untouched;
- end-to-end: every pandas/Arrow UDF test in the suite already runs
  through the shim (conftest sessions come from ``get_spark``), so a
  green suite is the integration check.
"""

from __future__ import annotations

import importlib
import os
import sys
import zipfile

import pyspark_zipfast_worker as shim
from logistics_data_pipeline_project_spark.session import _zipfast_worker_conf


def test_conf_set_for_local_master():
    conf = _zipfast_worker_conf("local[4]")
    assert conf["spark.python.worker.module"] == "pyspark_zipfast_worker"
    assert conf["spark.python.daemon.module"] == "pyspark_zipfast_daemon"
    shim_dir = os.path.dirname(os.path.abspath(shim.__file__))
    assert shim_dir in os.environ.get("PYTHONPATH", "").split(os.pathsep)


def test_conf_not_set_for_cluster_master():
    assert _zipfast_worker_conf("spark://host:7077") == {}
    assert _zipfast_worker_conf("yarn") == {}


def test_invalidate_still_refreshes_file_finder(tmp_path):
    """A module created after the directory was first scanned becomes
    importable after the shim's invalidate — the addPyFile semantics
    the stock per-task call exists for."""
    pkg_dir = str(tmp_path)
    sys.path.insert(0, pkg_dir)
    try:
        name = "zipfast_shim_probe_mod"
        try:
            importlib.import_module(name)
            raise AssertionError("probe module must not exist yet")
        except ImportError:
            pass
        with open(os.path.join(pkg_dir, f"{name}.py"), "w") as f:
            f.write("VALUE = 41\n")
        shim._invalidate_caches_skip_zip_reread()
        mod = importlib.import_module(name)
        assert mod.VALUE == 41
    finally:
        sys.path.remove(pkg_dir)
        sys.modules.pop("zipfast_shim_probe_mod", None)


def test_invalidate_skips_zipimporter_toc_reread(tmp_path):
    """The zipimporter's cached TOC object survives the shim's
    invalidate (identity-stable) but is rebuilt by the stock one —
    the exact cost difference the shim exists to remove."""
    zpath = os.path.join(str(tmp_path), "probe.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        z.writestr("zipfast_probe_zipped.py", "VALUE = 7\n")
    import zipimport

    zi = zipimport.zipimporter(zpath)
    sys.path_importer_cache[zpath] = zi
    try:
        toc_before = zi._files
        shim._invalidate_caches_skip_zip_reread()
        assert zi._files is toc_before, "shim must not drop the TOC"
        zi.invalidate_caches()
        assert zi._files is not toc_before, (
            "stock invalidate re-reads the TOC (the behavior being avoided)"
        )
    finally:
        sys.path_importer_cache.pop(zpath, None)


def test_invalidate_drops_none_entries():
    key = "/nonexistent/zipfast-shim-probe-path"
    sys.path_importer_cache[key] = None
    shim._invalidate_caches_skip_zip_reread()
    assert key not in sys.path_importer_cache


def test_shim_exports_stock_main():
    import pyspark.worker

    assert shim.main is pyspark.worker.main
