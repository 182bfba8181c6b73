"""Atomic table materialization over a parquet warehouse directory.

The reference's writes are Snowflake CTAS / MERGE — implicitly atomic.
Over files, atomicity = write-temp-then-swap (SURVEY §7 Phase 2): readers
see either the old or the new table, never a partial write, and an
incremental model can safely read its own previous state while computing
the next one (the temp write materializes before the swap).

At real cluster scale this protocol is what Delta/Iceberg table commits do
with manifest files; the TableStore API (read/exists/overwrite) is format
agnostic so a lakehouse format can back it without touching callers.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableStore:
    """Name → parquet directory mapping with atomic overwrite."""

    def __init__(self, spark: SparkSession, warehouse_dir: str):
        self.spark = spark
        self.warehouse_dir = warehouse_dir
        os.makedirs(warehouse_dir, exist_ok=True)

    def path(self, name: str) -> str:
        return os.path.join(self.warehouse_dir, name)

    def exists(self, name: str) -> bool:
        p = self.path(name)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f == "_SUCCESS" for f in os.listdir(p)
        )

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self.path(name))

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Atomic swap: write tmp → move old aside → rename tmp → drop old."""
        final = self.path(name)
        tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
        trash = f"{final}.trash-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        try:
            if os.path.exists(final):
                os.rename(final, trash)
            os.rename(tmp, final)
        finally:
            for leftover in (trash, tmp):
                if os.path.exists(leftover) and leftover != final:
                    shutil.rmtree(leftover, ignore_errors=True)

    def append(self, name: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path(name))
