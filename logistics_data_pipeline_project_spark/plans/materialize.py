"""Versioned, atomic table materialization over a parquet warehouse.

The reference's writes are Snowflake CTAS / MERGE — implicitly atomic and
(in Snowflake) time-travelable. Over files the same guarantees come from a
tiny commit protocol, the essence of what Delta/Iceberg do with manifest
files (SURVEY §7 Phase 2):

- every write lands in a NEW immutable version directory
  (``warehouse/name/v_000001`` …) that is invisible to readers,
- a one-line ``_LATEST`` pointer file is then swapped atomically
  (``os.replace``) — readers see either the old or the new snapshot,
  never a partial write,
- old versions are retained (``retain_versions``) for time-travel reads
  (``read(name, version=n)``) and instant ``rollback`` (a pointer swap,
  no data copy), then garbage-collected.

``append`` snapshots cheaply: the new version hardlinks the current
version's files and adds the appended part files next to them — O(files)
metadata, zero data copy, and the previous snapshot stays intact.

An incremental model can therefore safely read its own previous state
while computing the next one, and a bad batch is undone in O(1). The API
(read/exists/overwrite/append/versions/rollback) is format agnostic so a
lakehouse format can back it without touching callers.

Pre-versioning layouts (parquet files directly under ``warehouse/name``)
are migrated into ``v_000001`` on the next write.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_VPREFIX = "v_"
_META = "_META.json"


class TableStore:
    """Name → versioned parquet directory mapping with atomic commits."""

    def __init__(
        self, spark: SparkSession, warehouse_dir: str, retain_versions: int = 3
    ):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        self.retain_versions = max(1, retain_versions)
        os.makedirs(warehouse_dir, exist_ok=True)

    # -- layout ---------------------------------------------------------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.warehouse_dir, name)

    def _vdir(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"{_VPREFIX}{version:06d}")

    def versions(self, name: str) -> list[int]:
        """All retained snapshot versions, oldest first."""
        d = self._table_dir(name)
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith(_VPREFIX) and f[len(_VPREFIX) :].isdigit():
                out.append(int(f[len(_VPREFIX) :]))
        return sorted(out)

    def current_version(self, name: str) -> int | None:
        """The committed version the ``_LATEST`` pointer names (falls back
        to the newest version directory if a crash lost the pointer)."""
        ptr = os.path.join(self._table_dir(name), _POINTER)
        if os.path.isfile(ptr):
            with open(ptr) as f:
                v = f.read().strip()
            if v.isdigit() and os.path.isdir(self._vdir(name, int(v))):
                return int(v)
        vs = self.versions(name)
        return vs[-1] if vs else None

    def _has_legacy_files(self, name: str) -> bool:
        d = self._table_dir(name)
        return os.path.isdir(d) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(d)
        )

    def _migrate_legacy(self, name: str) -> None:
        """Move a pre-versioning flat layout into v_000001 + pointer."""
        d = self._table_dir(name)
        v1 = self._vdir(name, 1)
        os.makedirs(v1)
        for f in os.listdir(d):
            if f != os.path.basename(v1) and not f.startswith(_VPREFIX):
                os.rename(os.path.join(d, f), os.path.join(v1, f))
        self._commit_pointer(name, 1)

    def _resolve(self, name: str, version: int | None) -> str:
        if self._has_legacy_files(name):
            return self._table_dir(name)
        cur = self.current_version(name)
        if version is None:
            version = cur
        if version is None:
            return self._table_dir(name)  # nonexistent; let Spark error
        if version not in self.versions(name):
            raise ValueError(
                f"table {name!r} has no version {version}; "
                f"retained: {self.versions(name)}"
            )
        return self._vdir(name, version)

    def _commit_pointer(self, name: str, version: int) -> None:
        d = self._table_dir(name)
        tmp = os.path.join(d, f"{_POINTER}.tmp-{uuid.uuid4().hex[:8]}")
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, os.path.join(d, _POINTER))  # atomic on POSIX

    def _gc(self, name: str) -> None:
        cur = self.current_version(name)
        keep = set(self.versions(name)[-self.retain_versions :])
        if cur is not None:
            keep.add(cur)
        for v in self.versions(name):
            if v not in keep:
                shutil.rmtree(self._vdir(name, v), ignore_errors=True)

    # -- public API -----------------------------------------------------

    def path(self, name: str, version: int | None = None) -> str:
        """Resolved data directory of a (versioned) snapshot."""
        return self._resolve(name, version)

    def exists(self, name: str) -> bool:
        if self._has_legacy_files(name):
            return True
        return self.current_version(name) is not None

    def read(self, name: str, version: int | None = None) -> DataFrame:
        """Read the current snapshot, or time-travel to ``version``."""
        return self.spark.read.parquet(self._resolve(name, version))

    def overwrite(
        self, name: str, df: DataFrame, meta: dict | None = None
    ) -> None:
        """Commit ``df`` as a new snapshot version (atomic pointer swap).

        ``meta`` (a small JSON-able dict, e.g. a stream's last applied
        batch id) is written INTO the version directory before the pointer
        swap, so it commits atomically with the data — readers can never
        see a snapshot without its metadata or vice versa. Spark ignores
        ``_``-prefixed files, so the parquet scan is unaffected."""
        if self._has_legacy_files(name):
            self._migrate_legacy(name)
        os.makedirs(self._table_dir(name), exist_ok=True)
        vs = self.versions(name)
        nxt = (vs[-1] + 1) if vs else 1
        # the version dir is invisible to readers until the pointer swap,
        # so Spark can write it in place; a crash leaves an uncommitted
        # orphan dir that the next write's numbering skips and GC removes
        df.write.mode("overwrite").parquet(self._vdir(name, nxt))
        if meta is not None:
            with open(os.path.join(self._vdir(name, nxt), _META), "w") as f:
                json.dump(meta, f)
        self._commit_pointer(name, nxt)
        self._gc(name)

    def meta(self, name: str, version: int | None = None) -> dict:
        """The snapshot's committed metadata dict ({} if none was given)."""
        p = os.path.join(self._resolve(name, version), _META)
        if os.path.isfile(p):
            with open(p) as f:
                return json.load(f)
        return {}

    def append(
        self, name: str, df: DataFrame, meta: dict | None = None
    ) -> None:
        """Commit a new snapshot = current files (hardlinked, zero copy)
        + ``df``'s part files.

        If ``df``'s schema drifts from the current snapshot (new, missing,
        or re-typed columns), the append falls back to a unionByName
        rewrite — existing rows get NULLs for new columns, incoming rows
        get NULLs for columns they lack — so the committed snapshot always
        has ONE coherent schema (readers never need mergeSchema). The
        zero-copy hardlink path is taken only on an exact schema match.

        ``meta`` replaces the snapshot metadata; when omitted, the prior
        version's ``_META.json`` is carried forward unchanged — an append
        must never silently erase a stream's replay guard (last applied
        batch id), or a crash-replayed micro-batch would be re-folded into
        non-idempotent sketch state."""
        if self._has_legacy_files(name):
            self._migrate_legacy(name)
        cur = self.current_version(name)
        if cur is None:
            self.overwrite(name, df, meta=meta)
            return
        if meta is None:
            meta = self.meta(name) or None
        current = self.read(name)
        if current.schema != df.schema:
            evolved = current.unionByName(df, allowMissingColumns=True)
            # localCheckpoint cuts lineage to the snapshot being replaced
            self.overwrite(
                name, evolved.localCheckpoint(eager=True), meta=meta
            )
            return
        vs = self.versions(name)
        nxt = vs[-1] + 1
        src, dst = self._vdir(name, cur), self._vdir(name, nxt)
        os.makedirs(dst)
        for f in os.listdir(src):
            if f.endswith(".parquet"):
                os.link(os.path.join(src, f), os.path.join(dst, f))
        df.write.mode("append").parquet(dst)
        if meta is not None:
            with open(os.path.join(dst, _META), "w") as f:
                json.dump(meta, f)
        self._commit_pointer(name, nxt)
        self._gc(name)

    def compact(self, name: str, target_file_mb: int = 128) -> int:
        """OPTIMIZE-style small-file compaction: rewrite the current
        snapshot into ~``target_file_mb``-sized parquet files and commit
        the result as a new version (same atomic pointer swap — readers
        of the old snapshot are untouched, rollback still works).

        Repeated appends accumulate one part-file set per batch; at scale
        the resulting small files dominate scan cost (per-file open +
        footer read + scheduler overhead beat actual IO). Returns the new
        file count. Worth running when file count far exceeds
        bytes/target_file_mb — the same trigger heuristic lakehouse
        OPTIMIZE jobs use."""
        cur = self.current_version(name)
        if cur is None:
            raise KeyError(f"no table {name!r}")
        src = self._vdir(name, cur)
        total_bytes = sum(
            os.path.getsize(os.path.join(src, f))
            for f in os.listdir(src)
            if f.endswith(".parquet")
        )
        n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
        # localCheckpoint cuts lineage to the snapshot being replaced;
        # the prior snapshot's metadata (e.g. stream replay guard) must
        # survive a compaction unchanged
        df = self.read(name).coalesce(n_files).localCheckpoint(eager=True)
        self.overwrite(name, df, meta=self.meta(name) or None)
        new = self._vdir(name, self.current_version(name))
        return sum(1 for f in os.listdir(new) if f.endswith(".parquet"))

    def rollback(self, name: str, version: int) -> None:
        """Point the table back at an earlier retained snapshot — a pure
        pointer swap, O(1), no data copy."""
        if version not in self.versions(name):
            raise ValueError(
                f"cannot rollback {name!r} to {version}; "
                f"retained: {self.versions(name)}"
            )
        self._commit_pointer(name, version)

    def changes(
        self,
        name: str,
        from_version: int,
        to_version: int | None = None,
        keys: list[str] | None = None,
        include_preimages: bool = False,
    ) -> DataFrame:
        """Row-level change feed between two retained snapshots — the
        engine's Delta/Iceberg CDF analogue. Returns the ``to`` snapshot's
        columns plus ``_change_type`` ∈ {insert, delete, update_preimage,
        update_postimage} (preimages only with ``include_preimages``).

        With ``keys``: a single full-outer join on the key columns, the
        non-key columns collapsed to ONE struct comparison per row (null-
        safe), so the diff costs one shuffle per side regardless of column
        count — and feeds exactly the (key, postimage) stream an
        incremental MERGE consumer (operators/merge.py) or a maintained
        rollup (plans/incremental.py) wants, without re-reading history.

        Without ``keys``: a multiset diff — groupBy whole row, count per
        side, emit |Δcount| inserts/deletes; order-insensitive and
        duplicate-correct, for tables with no natural key.
        """
        from pyspark.sql import functions as F

        old = self.read(name, from_version)
        new = self.read(name, to_version)
        cols = new.columns
        if old.columns != cols:
            # schema evolution between the snapshots: compare on the union
            # schema (missing columns read as NULL on the older side)
            allc = list(dict.fromkeys(old.columns + cols))
            for c in allc:
                if c not in old.columns:
                    old = old.withColumn(c, F.lit(None))
                if c not in cols:
                    new = new.withColumn(c, F.lit(None))
            cols = allc
        if keys is None:
            o = old.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n_old"))
            n = new.groupBy(*cols).agg(F.count(F.lit(1)).alias("_n_new"))
            cond = [o[c].eqNullSafe(n[c]) for c in cols]
            j = o.join(n, cond, "full_outer").select(
                *[F.coalesce(o[c], n[c]).alias(c) for c in cols],
                F.coalesce("_n_old", F.lit(0)).alias("_n_old"),
                F.coalesce("_n_new", F.lit(0)).alias("_n_new"),
            )
            delta = (F.col("_n_new") - F.col("_n_old")).alias("_delta")
            changed = j.select(*cols, delta).filter(F.col("_delta") != 0)
            return changed.select(
                *cols,
                F.explode(
                    F.expr(
                        "transform(sequence(1, abs(_delta)),"
                        " i -> CASE WHEN _delta > 0 THEN 'insert' ELSE 'delete' END)"
                    )
                ).alias("_change_type"),
            )
        val_cols = [c for c in cols if c not in keys]
        o = old.select(
            *keys, F.struct(*val_cols).alias("_vo"), F.lit(True).alias("_in_old")
        )
        n = new.select(
            *keys, F.struct(*val_cols).alias("_vn"), F.lit(True).alias("_in_new")
        )
        cond = [o[k].eqNullSafe(n[k]) for k in keys]
        j = o.join(n, cond, "full_outer").select(
            *[F.coalesce(o[k], n[k]).alias(k) for k in keys],
            "_vo",
            "_vn",
            F.coalesce("_in_old", F.lit(False)).alias("_in_old"),
            F.coalesce("_in_new", F.lit(False)).alias("_in_new"),
        )
        ins = j.filter(~F.col("_in_old")).select(
            *keys,
            *[F.col(f"_vn.{c}").alias(c) for c in val_cols],
            F.lit("insert").alias("_change_type"),
        )
        dels = j.filter(~F.col("_in_new")).select(
            *keys,
            *[F.col(f"_vo.{c}").alias(c) for c in val_cols],
            F.lit("delete").alias("_change_type"),
        )
        upd = j.filter(
            F.col("_in_old") & F.col("_in_new") & ~F.col("_vo").eqNullSafe(F.col("_vn"))
        )
        post = upd.select(
            *keys,
            *[F.col(f"_vn.{c}").alias(c) for c in val_cols],
            F.lit("update_postimage").alias("_change_type"),
        )
        out = ins.unionByName(dels).unionByName(post)
        if include_preimages:
            pre = upd.select(
                *keys,
                *[F.col(f"_vo.{c}").alias(c) for c in val_cols],
                F.lit("update_preimage").alias("_change_type"),
            )
            out = out.unionByName(pre)
        # restore the snapshot's column order, change type last
        return out.select(*cols, "_change_type")

    def purge_keys(
        self, name: str, key_col: str, keys: DataFrame
    ) -> tuple[int, int]:
        """Hard-delete every row whose ``key_col`` appears in ``keys`` and
        commit the result as a new snapshot — the right-to-be-forgotten
        primitive. Returns (rows_purged, new_version).

        The deletion is ONE broadcast anti-join over the current snapshot
        (the key list is small by nature), so at 100 TB the purge costs a
        single scan+rewrite, and the atomic pointer swap means readers
        never observe a half-purged table. NOTE: retained older snapshots
        still contain the purged rows (that is what makes rollback safe);
        for a compliance-complete erasure, follow with retention GC by
        committing ``retain_versions`` new versions or lowering retention
        — the same two-phase contract Delta's VACUUM has."""
        from pyspark.sql import functions as F

        cur = self.current_version(name)
        if cur is None:
            raise KeyError(f"no table {name!r}")
        df = self.read(name)
        klist = keys.select(F.col(keys.columns[0]).alias(key_col)).distinct()
        kept = df.join(F.broadcast(klist), key_col, "left_anti")
        before = df.count()
        # localCheckpoint cuts lineage to the snapshot being replaced
        self.overwrite(name, kept.localCheckpoint(eager=True))
        after = self.read(name).count()
        return before - after, self.current_version(name)
