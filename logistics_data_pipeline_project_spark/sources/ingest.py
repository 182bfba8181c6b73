"""Driver-side landing ingestion: REST fetch → landing files → archive.

Covers the reference's pre-engine data movement (SURVEY §2.1/§2.2):

- S1: REST API fetch → JSON landing file
  (dags/2_logistics-shipment-dag.py:25-56, dags/restapi.py:16-44,
  dags/weather_util.py:8-12) — a bearer-token GET whose JSON body is
  written to a timestamped landing file for Spark to bulk-read.
- S2: landing upload (dags/2_logistics-shipment-dag.py:50,
  dags/weather_util.py:34-44) — here the landing area is any
  Spark-readable path (local dir, s3a://, hdfs://).
- K9: archive-and-clean lifecycle (dags/utils/aws_utils.py:41-73) —
  after a successful batch load, every processed file moves
  ``unprocessed/ → archive/<ts>/``. The streaming twin is
  ``streaming.landing.stream_file_landing(cleanSource=archive)``.

Scale notes: these helpers run on the driver (or an orchestration worker)
and never touch row data beyond one API response at a time — the actual
data-parallel read is always ``spark.read.json`` over the landing prefix.
Fan-out to thousands of landed objects is therefore Spark's file-listing
parallelism, not a driver loop. The HTTP client (``requests``) is gated
behind an import-try so air-gapped test environments can inject a fake
``fetcher``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Callable


def fetch_api_to_landing(
    url: str,
    landing_dir: str,
    token: str | None = None,
    params: dict | None = None,
    fetcher: Callable[[str, dict, dict], object] | None = None,
    filename: str | None = None,
    timeout: float = 30.0,
) -> str:
    """S1+S2: GET ``url`` and land the JSON body as one file under
    ``landing_dir``; returns the landed path.

    ``fetcher(url, headers, params) -> json-serializable`` overrides the
    HTTP client (tests inject deterministic fakes; production uses
    ``requests``). File naming mirrors the reference's
    ``shipments_<epoch>.json`` (dags/2_logistics-shipment-dag.py:47-50).
    """
    headers = {"Authorization": f"Bearer {token}"} if token else {}
    if fetcher is None:
        try:
            import requests
        except ImportError as exc:  # pragma: no cover - baked into prod images
            raise NotImplementedError(
                "no HTTP client available — pass fetcher= explicitly"
            ) from exc

        def fetcher(u, h, p):
            resp = requests.get(u, headers=h, params=p or None, timeout=timeout)
            resp.raise_for_status()
            return resp.json()

    payload = fetcher(url, headers, params or {})
    os.makedirs(landing_dir, exist_ok=True)
    name = filename or f"batch_{int(time.time() * 1000)}.json"
    path = os.path.join(landing_dir, name)
    tmp = f"{path}.tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(payload, f)
    os.rename(tmp, path)  # atomic publish: readers never see partial JSON
    return path


def archive_processed(
    landing_dir: str,
    archive_dir: str,
    batch_id: str | None = None,
    pattern_suffix: str = "",
) -> list[str]:
    """K9: move every landed file ``landing_dir/ → archive_dir/<batch>/``
    after a successful batch commit; returns the archived paths.

    Mirrors dags/utils/aws_utils.py:41-73 (copy to ``archive/<ts>/`` then
    delete the original) collapsed into a rename per file. Call this only
    after the batch's write has committed — the move is the at-least-once
    / exactly-once boundary for batch file ingestion (§M4's file-level
    analogue).
    """
    batch = batch_id or time.strftime("%Y%m%dT%H%M%S", time.gmtime())
    dest_dir = os.path.join(archive_dir, batch)
    moved: list[str] = []
    if not os.path.isdir(landing_dir):
        return moved
    os.makedirs(dest_dir, exist_ok=True)
    for name in sorted(os.listdir(landing_dir)):
        src = os.path.join(landing_dir, name)
        if not os.path.isfile(src) or (pattern_suffix and not name.endswith(pattern_suffix)):
            continue
        dst = os.path.join(dest_dir, name)
        shutil.move(src, dst)
        moved.append(dst)
    return moved
