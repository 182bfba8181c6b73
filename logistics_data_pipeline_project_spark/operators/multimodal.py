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

__all__ = [
    "attach_payload_metadata",
    "decode_media",
    "sample_frames",
    "resize_images",
    "MEDIA_FEATURE_SCHEMA",
    "FRAME_SCHEMA",
]


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


FRAME_SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_ms", IntegerType()),
        StructField("frame_digest", StringType()),
    ]
)


def sample_frames(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    every_ms: int = 1000,
    max_frames: int = 8,
    decode_stub: bool = True,
) -> DataFrame:
    """Frame-sample video payloads via mapInPandas: one output row per
    sampled frame (id, frame_index, frame_ms, frame_digest).

    Row explosion happens Python-side inside the Arrow batch, so a task's
    peak memory is one batch of payloads plus its frame rows — the frame
    rows are tiny (no pixel data leaves the UDF; downstream feature
    extraction happens in the same pass at real scale). The codec call is
    STUBBED (no pyav here): frame count/digests derive deterministically
    from the payload hash so tests pin exact shapes.
    """

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real frame sampling requires pyav; not in this environment"
                )
            out = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(payload).hexdigest()
                duration_ms = int(digest[:8], 16) % 600000
                n = min(max_frames, max(1, duration_ms // every_ms))
                for i in range(n):
                    out.append(
                        {
                            "id": int(_id),
                            "frame_index": i,
                            "frame_ms": i * every_ms,
                            "frame_digest": hashlib.sha256(
                                payload + i.to_bytes(4, "little")
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(out, columns=[f.name for f in FRAME_SCHEMA.fields])

    cols = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return cols.mapInPandas(frames, schema=FRAME_SCHEMA)


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int = 224,
    height: int = 224,
    decode_stub: bool = True,
) -> DataFrame:
    """Resize image payloads via mapInPandas: (id, width, height,
    resized_payload) with the binary column preserved end-to-end.

    The Pillow call is STUBBED: the fake "resize" emits a deterministic
    digest-derived payload of bounded size so the binary-in/binary-out
    plumbing (Arrow binary columns both directions) is exercised for real.
    """

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real image resize requires Pillow; not in this environment"
                )
            out = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                fake = hashlib.sha256(
                    payload + f"{width}x{height}".encode()
                ).digest()
                out.append(
                    {
                        "id": int(_id),
                        "width": width,
                        "height": height,
                        "resized_payload": fake,
                    }
                )
            yield pd.DataFrame(
                out, columns=["id", "width", "height", "resized_payload"]
            )

    cols = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return cols.mapInPandas(
        resize,
        schema="id long, width int, height int, resized_payload binary",
    )
