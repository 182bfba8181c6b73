"""Structured Streaming variants of the landing pipeline (SURVEY §2.10).

The reference is batch-only; its file-landing pattern (REST→S3 landing →
COPY INTO → archive, S2/S3/K9) is the natural streaming candidate:
``readStream`` file source + ``cleanSource=archive`` replaces the manual
boto3 archive loop (dags/utils/aws_utils.py:41-73), and the checkpoint
replaces the high-watermark bookkeeping (§M4).

Both entry points return the streaming DataFrame/query unstarted pieces so
tests can run them with a test sink (``test_streaming.py`` drives them
end-to-end with availableNow triggers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StructType


def stream_file_landing(
    spark: SparkSession,
    landing_dir: str,
    schema: StructType | str,
    fmt: str = "json",
    archive_dir: str | None = None,
    max_files_per_trigger: int = 1000,
) -> DataFrame:
    """Streaming file source over a landing directory. With ``archive_dir``
    set, processed files are moved out of the way by Spark itself
    (cleanSource=archive) — the K9 archive-and-clean lifecycle without a
    driver-side copy loop.

    Scale: maxFilesPerTrigger bounds micro-batch size; the checkpoint
    (set on the writer) makes ingestion exactly-once per file.
    """
    reader = (
        spark.readStream.format(fmt)
        .schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    if archive_dir:
        reader = reader.option("cleanSource", "archive").option(
            "sourceArchiveDir", archive_dir
        )
    return reader.load(landing_dir)


def stream_hourly_event_counts(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """Streaming twin of catalog query q19: tumbling 1-hour windows with a
    late-data watermark. State is bounded: windows older than the
    watermark are finalized and evicted — the streaming-correct version of
    the batch group-by."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
