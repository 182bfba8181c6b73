"""Multimodal column support (BASELINE.json north star).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (media_type, n_bytes, sha256, plus
modality-specific fields). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row-by-row
and each batch decodes vectorized.

The actual codec calls are STUBBED (no image/audio libraries in this
container): ``decode_stub=True`` (default) produces a deterministic fake
"decode" (dimensions/duration derived from a stable hash of the payload) so
the Spark-side plumbing — schema, partitioning, UDF signature, batch shape —
is real and tested; pass ``decode_stub=False`` to get NotImplementedError
where Pillow/librosa/pyav calls would go.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["attach_payload_metadata", "decode_media", "MEDIA_FEATURE_SCHEMA"]


def attach_payload_metadata(
    df: DataFrame, payload_col: str, media_type_col: str | None = None
) -> DataFrame:
    """Add the typed metadata struct next to an opaque binary column —
    JVM-side only (octet_length/sha2), no Python."""
    meta = F.struct(
        (
            F.col(media_type_col)
            if media_type_col
            else F.lit("application/octet-stream")
        ).alias("media_type"),
        F.octet_length(F.col(payload_col)).alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
    )
    return df.withColumn("media_meta", meta)


MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
        StructField("feature_digest", StringType()),
    ]
)


def decode_media(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    media_type_col: str,
    decode_stub: bool = True,
) -> DataFrame:
    """Decode/feature-extract media payloads via Arrow-batched mapInPandas.

    Partitioning note: payloads dominate row size, so upstream should
    repartition to keep batches within executor memory
    (``spark.sql.files.maxPartitionBytes`` handles file sources; for table
    sources repartition by id). The iterator-of-batches signature keeps
    peak memory at one Arrow batch per task.
    """

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires Pillow/librosa/pyav; "
                    "not available in this environment"
                )
            out = []
            for _id, payload, mtype in zip(
                pdf[id_col], pdf[payload_col], pdf[media_type_col]
            ):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(payload).hexdigest()
                # Deterministic fake decode: stable pseudo-dimensions from the
                # digest, so tests can assert exact values.
                seed = int(digest[:8], 16)
                is_image = str(mtype).startswith("image")
                out.append(
                    {
                        "id": int(_id),
                        "media_type": str(mtype),
                        "n_bytes": len(payload),
                        "width": 64 + seed % 1024 if is_image else None,
                        "height": 64 + (seed >> 10) % 1024 if is_image else None,
                        "duration_ms": None if is_image else seed % 600000,
                        "feature_digest": digest,
                    }
                )
            yield pd.DataFrame(out, columns=[f.name for f in MEDIA_FEATURE_SCHEMA.fields])

    cols = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
        F.col(media_type_col).alias(media_type_col),
    )
    return cols.mapInPandas(decode_batches, schema=MEDIA_FEATURE_SCHEMA)
