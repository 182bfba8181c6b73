"""Multimodal column support (BASELINE.json north star).

Design: image/audio/video payloads are opaque ``binary`` columns with a
typed metadata struct alongside (media_type, n_bytes, sha256, plus
modality-specific fields). Decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row-by-row
and each batch decodes vectorized.

Decode tiers (no image/audio libraries in this container):

- ``decode_stub=True`` (default): deterministic fake "decode"
  (dimensions/duration from a stable hash of the payload) so the
  Spark-side plumbing — schema, partitioning, UDF signature, batch
  shape — is real and tested regardless of codecs.
- ``decode_stub=False``: REAL header-level decode for the formats whose
  containers are parseable in pure Python — PNG / BMP / GIF / JPEG
  dimensions and WAV duration (`parse_image_header` /
  `parse_wav_duration_ms` below, golden-tested on real byte payloads).
  Full pixel/sample decode (resize, frame extraction) still raises
  NotImplementedError where Pillow/pyav calls would go — an honest
  capability boundary, not a silent fake.
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
    "parse_image_header",
    "parse_wav_duration_ms",
    "sample_frames",
    "resize_images",
    "MEDIA_FEATURE_SCHEMA",
    "FRAME_SCHEMA",
]


def parse_image_header(payload: bytes) -> tuple[int, int] | None:
    """(width, height) from the container header of a PNG, BMP, GIF, or
    JPEG byte payload — pure stdlib, no Pillow. Returns None when the
    payload is not one of those formats (or is truncated): dimensions
    live in fixed header fields for all four, so this is a REAL decode
    of the only image attributes `decode_media` promises.

    PNG: IHDR is always the first chunk — width/height big-endian at
    bytes 16..24. BMP: BITMAPINFOHEADER little-endian int32 at 18..26
    (height may be negative = top-down; abs()). GIF: logical screen size
    little-endian uint16 at 6..10. JPEG: walk the marker segments to the
    first SOF0..SOF15 frame header (skipping DHT/DAC/RST/etc.), height
    then width big-endian at offset 5 of the segment body."""
    import struct

    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if len(payload) >= 26 and payload[:2] == b"BM":
        w, h = struct.unpack("<ii", payload[18:26])
        return int(w), abs(int(h))
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return int(w), int(h)
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 1 < len(payload):
            if payload[i] != 0xFF:
                return None
            # any run of 0xFF bytes before a marker id is legal fill
            while i + 1 < len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 1 >= len(payload):
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            if marker in (0xD9, 0xDA):
                # EOI, or SOS: raw entropy-coded data follows (no length
                # framing) — a well-formed JPEG puts SOF before SOS, so
                # reaching either without one means no dimensions here
                return None
            if i + 4 > len(payload):
                return None
            seglen = struct.unpack(">H", payload[i + 2 : i + 4])[0]
            if seglen < 2:
                return None
            # SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC) hold dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 > len(payload):
                    return None
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seglen
    return None


def parse_wav_duration_ms(payload: bytes) -> int | None:
    """Duration in ms from a RIFF/WAVE header — pure stdlib, no librosa.
    Walks the chunk list for fmt (byte rate) and data (payload size);
    duration = data_bytes / byte_rate. None for non-WAV payloads."""
    import struct

    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, byte_rate, data_size = 12, None, None
    while i + 8 <= len(payload):
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and i + 16 + 8 <= len(payload):
            byte_rate = struct.unpack("<I", payload[i + 16 : i + 20])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        return None
    return int(data_size * 1000 // byte_rate)


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
            out = []
            for _id, payload, mtype in zip(
                pdf[id_col], pdf[payload_col], pdf[media_type_col]
            ):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(payload).hexdigest()
                is_image = str(mtype).startswith("image")
                if decode_stub:
                    # Deterministic fake decode: stable pseudo-dimensions
                    # from the digest, so tests can assert exact values.
                    seed = int(digest[:8], 16)
                    width = 64 + seed % 1024 if is_image else None
                    height = 64 + (seed >> 10) % 1024 if is_image else None
                    duration = None if is_image else seed % 600000
                else:
                    # REAL header decode: PNG/BMP/GIF/JPEG dims, WAV
                    # duration — pure-Python container parsing. Anything
                    # else genuinely needs a codec library.
                    width = height = duration = None
                    if is_image:
                        dims = parse_image_header(payload)
                        if dims is None:
                            raise NotImplementedError(
                                f"image payload id={_id} is not PNG/BMP/GIF/"
                                "JPEG; full decode requires Pillow (absent)"
                            )
                        width, height = dims
                    elif str(mtype).startswith("audio"):
                        duration = parse_wav_duration_ms(payload)
                        if duration is None:
                            raise NotImplementedError(
                                f"audio payload id={_id} is not RIFF/WAVE; "
                                "decode requires librosa/pyav (absent)"
                            )
                    else:
                        raise NotImplementedError(
                            f"media_type {mtype!r} decode requires pyav "
                            "(absent)"
                        )
                out.append(
                    {
                        "id": int(_id),
                        "media_type": str(mtype),
                        "n_bytes": len(payload),
                        "width": width,
                        "height": height,
                        "duration_ms": duration,
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
