"""Non-stub multimodal decode tests: REAL byte payloads (a valid zlib-
compressed PNG, BMP, GIF, JPEG, and RIFF/WAVE built from stdlib only)
through both the pure-Python header parsers and the Spark
`decode_media(decode_stub=False)` path."""

from __future__ import annotations

import struct
import zlib

from logistics_data_pipeline_project_spark.operators.multimodal import (
    decode_media,
    parse_image_header,
    parse_wav_duration_ms,
)


def _png(w: int, h: int) -> bytes:
    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # 8-bit grayscale
    raw = b"".join(b"\x00" + bytes(w) for _ in range(h))  # filter 0 rows
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _bmp(w: int, h: int) -> bytes:
    row = (w * 3 + 3) & ~3
    data_size = row * h
    header = b"BM" + struct.pack("<IHHI", 54 + data_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0)
    return header + info + bytes(data_size)


def _gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00;"


def _jpeg(w: int, h: int) -> bytes:
    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    # a DHT segment BEFORE SOF exercises the C4 skip in the marker walk
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x00\x00"
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    return soi + app0 + dht + sof0 + b"\xff\xd9"


def _wav(seconds: float, sample_rate: int = 8000) -> bytes:
    n = int(seconds * sample_rate)
    data = bytes(n * 2)  # 16-bit mono silence
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_image_header_parsers():
    assert parse_image_header(_png(320, 200)) == (320, 200)
    assert parse_image_header(_bmp(17, 9)) == (17, 9)
    assert parse_image_header(_gif(640, 350)) == (640, 350)
    assert parse_image_header(_jpeg(1920, 1080)) == (1920, 1080)
    assert parse_image_header(b"not an image") is None
    assert parse_image_header(b"") is None


def test_jpeg_marker_walk_edge_cases():
    # 0xFF fill bytes before a marker are legal padding (JPEG B.1.1.2) —
    # the walk must skip them, not treat 0xFF as a length-bearing marker
    soi = b"\xff\xd8"
    app0 = (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    sof0 = b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, 99, 77, 1) + b"\x01\x11\x00"
    padded = soi + app0 + b"\xff\xff\xff" + sof0 + b"\xff\xd9"
    assert parse_image_header(padded) == (77, 99)
    # reaching SOS without a SOF must stop (entropy-coded data has no
    # length framing), not read a bogus length and walk into garbage
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    truncated = soi + app0 + sos + b"\x12\x34\x56"
    assert parse_image_header(truncated) is None
    # EOI right after SOI: valid marker stream, no dimensions
    assert parse_image_header(soi + b"\xff\xd9") is None
    # zero/undersized segment length must not loop forever or crash
    assert parse_image_header(soi + b"\xff\xe0" + struct.pack(">H", 0)) is None


def test_wav_duration_parser():
    assert parse_wav_duration_ms(_wav(2.5)) == 2500
    assert parse_wav_duration_ms(b"RIFFxxxx????") is None
    assert parse_wav_duration_ms(b"") is None


def test_decode_media_non_stub_real_payloads(spark):
    rows = [
        (1, _png(320, 200), "image/png"),
        (2, _bmp(17, 9), "image/bmp"),
        (3, _gif(640, 350), "image/gif"),
        (4, _jpeg(1920, 1080), "image/jpeg"),
        (5, _wav(2.5), "audio/wav"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary, media_type string")
    out = {
        r["id"]: r
        for r in decode_media(
            df, "id", "payload", "media_type", decode_stub=False
        ).collect()
    }
    assert (out[1]["width"], out[1]["height"]) == (320, 200)
    assert (out[2]["width"], out[2]["height"]) == (17, 9)
    assert (out[3]["width"], out[3]["height"]) == (640, 350)
    assert (out[4]["width"], out[4]["height"]) == (1920, 1080)
    assert out[5]["duration_ms"] == 2500 and out[5]["width"] is None
    assert all(len(r["feature_digest"]) == 64 for r in out.values())


def test_decode_media_non_stub_raises_on_unknown_codec(spark):
    import pytest

    df = spark.createDataFrame(
        [(1, b"\x00\x01\x02", "video/mp4")], "id long, payload binary, media_type string"
    )
    with pytest.raises(Exception, match="pyav"):
        decode_media(df, "id", "payload", "media_type", decode_stub=False).collect()
