"""WARC (Web ARChive, ISO 28500) record triage — the container web
crawls actually ship in: Common Crawl publishes its corpus as
per-record-gzipped WARC files, and every corpus build starts by walking
those records BEFORE any text extraction (q228) or hygiene gate (q239)
can run.

This module is header-only by design, like the media triage family
(``sniff_media`` / ``mp3_stream_info`` / ``mp4_stream_info``): a WARC
record is a ``WARC/1.x`` named-field block plus a ``Content-Length``
body, so record type / target URI / HTTP status / payload MIME cost
O(header) bytes per record regardless of body size, and a 100 TB crawl
can census itself (responses vs requests vs metadata, status mix, MIME
mix, payload volume) from record headers alone.

Gzip handling follows the Common Crawl convention: each record is its
own gzip MEMBER, so members concatenate into one .warc.gz and a reader
can skip record-by-record without inflating the whole file;
``parse_warc_records`` walks members via ``zlib.decompressobj``'s
``unused_data`` (stdlib-only) and accepts plain uncompressed WARC too.

Reference parity: the reference engine has no crawl-ingestion surface
(its sources are REST landing + CSV/JSON stages, SURVEY.md §2.1); this
is part of the beyond-reference LLM-training-data operator family the
build brief makes first-class.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BinaryType

__all__ = [
    "parse_warc_records",
    "encode_warc_records",
    "warc_triage",
]

_CRLF = b"\r\n"


def _split_members(payload: bytes) -> list[bytes]:
    """Inflate a concatenation of gzip members into the raw byte
    stream (one inflate pass; members are how CC frames records, but
    record boundaries come from WARC Content-Length, not from member
    boundaries, so the streams just concatenate)."""
    import zlib

    out = []
    rest = payload
    while rest[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        out.append(d.decompress(rest))
        out.append(d.flush())
        if not d.eof:
            break  # truncated member: keep what inflated
        rest = d.unused_data
    return out if out else [payload]


def parse_warc_records(payload: bytes) -> list[dict]:
    """Walk the WARC records of one (optionally per-member-gzipped)
    payload -> list of dicts with keys ``rec_type``, ``target_uri``,
    ``content_length``, ``http_status``, ``mime``.

    Per ISO 28500: a record is a version line (``WARC/1.0`` or 1.1), a
    named-field block terminated by an empty line, ``Content-Length``
    octets of body, then two CRLFs.  Field names are case-insensitive.
    For ``response``/``request`` records the body opens with an HTTP
    message, so the status code and the HTTP ``Content-Type`` (the
    PAYLOAD's MIME, the one corpus builders filter on — not the WARC
    envelope's) parse from the body's own header block; other record
    types report status 0 and the envelope ``Content-Type``.

    Tolerant by the same rule as the media walks: a malformed or
    truncated record ends the walk with the records already parsed
    (real .warc.gz files end in truncation, not exceptions); a payload
    with no leading WARC version line raises ValueError."""
    p = b"".join(_split_members(payload or b""))
    if not p.startswith(b"WARC/"):
        raise ValueError("no WARC version line")
    records: list[dict] = []
    i = 0
    while p.startswith(b"WARC/", i):
        head_end = p.find(_CRLF + _CRLF, i)
        if head_end < 0:
            break
        fields: dict[str, str] = {}
        for line in p[i:head_end].split(_CRLF)[1:]:
            name, _, value = line.partition(b":")
            if _:
                fields[name.strip().lower().decode("latin-1")] = (
                    value.strip().decode("latin-1", "replace")
                )
        try:
            length = int(fields.get("content-length", ""))
        except ValueError:
            break
        body = p[head_end + 4 : head_end + 4 + length]
        if len(body) < length:
            break
        rec_type = fields.get("warc-type", "unknown")
        status = 0
        mime = fields.get("content-type", "").split(";")[0].strip()
        if rec_type in ("response", "request") and body[:5] in (
            b"HTTP/",
            b"GET /",
            b"POST ",
        ):
            http_head = body.split(_CRLF + _CRLF, 1)[0]
            lines = http_head.split(_CRLF)
            first = lines[0].split()
            if rec_type == "response" and len(first) >= 2 and first[1].isdigit():
                status = int(first[1])
            for line in lines[1:]:
                name, _, value = line.partition(b":")
                if _ and name.strip().lower() == b"content-type":
                    mime = (
                        value.strip()
                        .decode("latin-1", "replace")
                        .split(";")[0]
                        .strip()
                    )
                    break
        records.append(
            {
                "rec_type": rec_type,
                "target_uri": fields.get("warc-target-uri", ""),
                "content_length": length,
                "http_status": status,
                "mime": mime,
            }
        )
        i = head_end + 4 + length
        if p[i : i + 4] == _CRLF + _CRLF:
            i += 4
    return records


def encode_warc_records(
    records: Sequence[dict],
    gzip_members: bool = False,
) -> bytes:
    """Synthesize a structurally valid WARC payload — correct version
    lines, named fields, Content-Length accounting and CRLF record
    separators; with ``gzip_members=True`` each record becomes its own
    gzip member (the Common Crawl .warc.gz convention).  The fixture
    twin of :func:`parse_warc_records`.  Each input dict: ``rec_type``,
    ``target_uri`` (optional), ``body`` bytes; response/request bodies
    should be full HTTP messages."""
    import gzip as _gzip

    out = []
    for n, r in enumerate(records):
        body = r.get("body", b"")
        head = [b"WARC/1.0"]
        head.append(b"WARC-Type: " + r["rec_type"].encode("latin-1"))
        head.append(
            b"WARC-Record-ID: <urn:uuid:%08d-0000-0000-0000-000000000000>" % n
        )
        if r.get("target_uri"):
            head.append(
                b"WARC-Target-URI: " + r["target_uri"].encode("latin-1")
            )
        if r.get("content_type"):
            head.append(
                b"Content-Type: " + r["content_type"].encode("latin-1")
            )
        head.append(b"Content-Length: %d" % len(body))
        rec = _CRLF.join(head) + _CRLF + _CRLF + body + _CRLF + _CRLF
        out.append(
            _gzip.compress(rec, compresslevel=1, mtime=0)
            if gzip_members
            else rec
        )
    return b"".join(out)


def warc_triage(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    on_error: str = "fail",
) -> DataFrame:
    """Explode a corpus of (optionally .gz) WARC payloads into one row
    per record — (id, rec_index, rec_type, target_uri, content_length,
    http_status, mime) — via one Arrow-batched mapInPandas pass: the
    census step every Common-Crawl-shaped ingestion runs before
    extraction, and the natural upstream of q224 (URL canonicalization),
    q228 (main-text extraction) and q239 (robots gate).  Scale shape: a
    pure map pass reading O(header) bytes per record, no shuffle; a
    truncated tail record drops rather than failing the partition.

    ``on_error`` (the q226 quarantine convention): 'fail' raises on a
    non-WARC payload (batch audits want the loud failure), 'skip'
    drops it, 'tag' emits one quarantine row (rec_type='invalid') so
    the streaming census counts garbage as a lane instead of killing
    the query."""
    if on_error not in ("fail", "skip", "tag"):
        raise ValueError(f"bad on_error {on_error!r}")

    def walk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id",
            "rec_index",
            "rec_type",
            "target_uri",
            "content_length",
            "http_status",
            "mime",
        ]
        for pdf in batches:
            out = []
            for _id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    recs = parse_warc_records(
                        bytes(payload) if payload is not None else b""
                    )
                except ValueError:
                    if on_error == "fail":
                        raise
                    if on_error == "tag":
                        out.append(
                            {
                                "id": int(_id),
                                "rec_index": 0,
                                "rec_type": "invalid",
                                "target_uri": "",
                                "content_length": 0,
                                "http_status": 0,
                                "mime": "",
                            }
                        )
                    continue
                for ix, r in enumerate(recs):
                    out.append(
                        {
                            "id": int(_id),
                            "rec_index": ix,
                            "rec_type": r["rec_type"],
                            "target_uri": r["target_uri"],
                            "content_length": r["content_length"],
                            "http_status": r["http_status"],
                            "mime": r["mime"],
                        }
                    )
            yield pd.DataFrame(out, columns=cols)

    cols = df.select(
        F.col(id_col).cast("long").alias(id_col),
        F.col(payload_col).cast(BinaryType()).alias(payload_col),
    )
    return cols.mapInPandas(
        walk,
        schema=(
            "id long, rec_index int, rec_type string, target_uri string, "
            "content_length long, http_status int, mime string"
        ),
    )
