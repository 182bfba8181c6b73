"""End-to-end crawl curation pipeline — the round-4 operators composed
the way a real multimodal training-data pipeline chains them:

    raw fetches (URL spellings x HTML pages x image payloads, some corrupt)
      -> URL canonicalization dedup        (operators/text.py)
      -> HTML main-text extraction         (operators/text.py)
      -> quality gate                      (operators/text.py)
      -> exact text dedup                  (operators/dedup.py)
      -> perceptual image dedup + quarantine (multimodal + dedup)
      -> curated TableStore snapshot

Every stage's intermediate counts and the final curated rows are
asserted exactly — this is the integration contract that the per-op
oracles can't see (column handoffs, null flows, join keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from logistics_data_pipeline_project_spark.operators.dedup import (
    exact_dedup,
    hamming_near_pairs,
)
from logistics_data_pipeline_project_spark.operators.multimodal import (
    dhash_images,
    encode_png,
)
from logistics_data_pipeline_project_spark.operators.text import (
    canonicalize_url,
    extract_html_text,
    tokens,
    unique_token_ratio,
)
from logistics_data_pipeline_project_spark.plans.materialize import TableStore


def _image(seed: int, shift: int = 0) -> bytes:
    base = [50 + ((7 * x + 11 * y + 31 * seed) % 120) for y in range(16) for x in range(18)]
    return encode_png(18, 16, 1, bytes(v + shift for v in base))


def test_crawl_pipeline_end_to_end(spark, tmp_path):
    pages = {
        # page key -> (body text, image)
        0: ("alpha beta gamma delta epsilon zeta", _image(0)),
        1: ("one two three four five six seven", _image(1)),
        2: ("alpha beta gamma delta epsilon zeta", _image(0, shift=10)),  # text dup of 0, image perceptual dup
        3: ("spam spam spam spam spam spam spam", _image(3)),  # low quality
        4: ("unique healthy page body words here", b"\x89PNG\r\n\x1a\ntrunc"),  # corrupt image
    }
    rows = []
    fetch_id = 0
    for k, (body, img) in pages.items():
        # three spellings of the same URL -> one fetch survives
        for spelling in (
            f"https://site{k}.com/page?b=2&a=1",
            f"HTTPS://SITE{k}.COM/page?a=1&b=2",
            f"https://site{k}.com:443/page?a=1&b=2#frag",
        ):
            rows.append(
                (
                    fetch_id,
                    spelling,
                    f"<html><body><h1>T</h1><p>{body}</p>"
                    f"<script>var x=1;</script></body></html>",
                    img,
                )
            )
            fetch_id += 1
    raw = spark.createDataFrame(
        rows, "fetch_id long, url string, html string, img binary"
    )

    # 1) URL canonicalization dedup: 15 fetches -> 5 pages
    canon = raw.withColumn("curl", canonicalize_url("url"))
    keep_fetch = canon.groupBy("curl").agg(F.min("fetch_id").alias("fetch_id"))
    fetched = canon.join(keep_fetch, ["curl", "fetch_id"])
    assert fetched.count() == 5

    # 2) HTML extraction: script bodies must not leak into text
    extracted = fetched.withColumn("text", extract_html_text("html"))
    texts = {r["fetch_id"]: r["text"] for r in extracted.collect()}
    assert all("var x" not in t and "<" not in t for t in texts.values())
    assert texts[0] == "T alpha beta gamma delta epsilon zeta"

    # 3) quality gate: the spam page dies on lexical diversity
    quality = extracted.withColumn("__toks", tokens("text")).withColumn(
        "uniq", unique_token_ratio()
    )
    kept = quality.filter(F.col("uniq") >= 0.5).drop("__toks")
    assert kept.count() == 4 and 9 not in {r["fetch_id"] for r in kept.collect()}

    # 4) exact text dedup: pages 0 and 2 share extracted text
    ledger = exact_dedup(kept, "text", "fetch_id")
    winners = kept.join(
        ledger.select(F.col("keeper_fetch_id").alias("fetch_id")), "fetch_id"
    )
    assert winners.count() == 3  # pages 0(keeper), 1, 4

    # 5) perceptual image pass with quarantine: page 4's image is corrupt
    fp = dhash_images(winners, "fetch_id", "img", on_error="tag")
    quarantined = {r["id"] for r in fp.filter(F.col("err").isNotNull()).collect()}
    assert quarantined == {12}  # page 4's surviving fetch
    healthy = fp.filter(F.col("err").isNull())
    # pages 0 and 1 have genuinely different images -> no near-dup pair
    assert (
        hamming_near_pairs(
            healthy.select(F.col("id").alias("fetch_id"), "dhash_hi", "dhash_lo"),
            "fetch_id",
        ).count()
        == 0
    )
    # ...but page 2's brightness-shifted image WOULD have deduped against
    # page 0's had it survived text dedup (the belt-and-braces check)
    all_fp = dhash_images(kept, "fetch_id", "img", on_error="skip")
    pair = hamming_near_pairs(
        all_fp.select(F.col("id").alias("fetch_id"), "dhash_hi", "dhash_lo"),
        "fetch_id",
    ).collect()
    assert {(p["id1"], p["id2"], p["hamming"]) for p in pair} == {(0, 6, 0)}

    # 6) curated snapshot: text docs (all three) + image-bearing subset
    store = TableStore(spark, str(tmp_path / "wh"))
    curated = winners.join(
        fp.select(F.col("id").alias("fetch_id"), "dhash_hi", "dhash_lo", "err"),
        "fetch_id",
    ).select("fetch_id", "curl", "text", "dhash_hi", "dhash_lo", "err")
    store.overwrite("curated", curated)
    got = {
        r["fetch_id"]: (r["err"] is None, r["text"].split()[1])
        for r in store.read("curated").collect()
    }
    assert got == {0: (True, "alpha"), 3: (True, "one"), 12: (False, "unique")}


def test_warc_html_documents_extraction_lane(spark):
    """q247's single-scan lane: warc_html_documents keeps only
    200/text-html responses (404s, JSON, requests, warcinfo drop),
    carries the truncation-capped HTML body, and lanes garbage per the
    quarantine convention instead of failing the task."""
    from logistics_data_pipeline_project_spark.sources.warc import (
        encode_warc_records,
        warc_html_documents,
    )

    def html_rec(uri, body):
        return {
            "rec_type": "response", "target_uri": uri,
            "content_type": "application/http;msgtype=response",
            "body": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + body,
        }

    good = encode_warc_records(
        [
            {"rec_type": "warcinfo",
             "content_type": "application/warc-fields", "body": b"s: t"},
            {"rec_type": "request", "target_uri": "http://a/",
             "content_type": "application/http;msgtype=request",
             "body": b"GET / HTTP/1.1\r\nHost: a\r\n\r\n"},
            html_rec("http://a/x", b"<p>alpha</p>"),
            {"rec_type": "response", "target_uri": "http://a/404",
             "content_type": "application/http;msgtype=response",
             "body": b"HTTP/1.1 404 NF\r\nContent-Type: text/html\r\n\r\nno"},
            {"rec_type": "response", "target_uri": "http://a/j",
             "content_type": "application/http;msgtype=response",
             "body": b"HTTP/1.1 200 OK\r\nContent-Type: "
                     b'application/json\r\n\r\n{"k": 1}'},
            html_rec("http://a/y", b"<p>" + b"z" * 100 + b"</p>"),
        ],
        gzip_members=True,
    )
    df = spark.createDataFrame(
        [(1, good), (2, b"not a warc")], "doc_id long, payload binary"
    )
    got = {
        (r["id"], r["rec_index"]): (r["url"], r["html"])
        for r in warc_html_documents(
            df, "doc_id", "payload", body_max=40, on_error="tag"
        ).collect()
    }
    # only the two 200/text-html records survive; rec_index is the
    # record's position in the WARC, not a dense rank
    assert set(got) == {(1, 2), (1, 5), (2, -1)}
    assert got[(1, 2)] == ("http://a/x", "<p>alpha</p>")
    url_y, html_y = got[(1, 5)]
    assert url_y == "http://a/y" and len(html_y) == 40  # body_max cap
    assert got[(2, -1)] == ("", "")  # garbage lane


def test_warc_html_documents_coding_and_record_quarantine(spark):
    """Round-8 #1 at the Spark lane: gzip-encoded, chunked and
    legacy-charset (latin-1) pages come out as TEXT — identical to
    their identity-encoded twins — while a br-encoded record emits its
    row with html NULL (the per-record quarantine lane: countable by
    url, never mojibake), distinct from the per-PAYLOAD rec_index=-1
    tag lane."""
    import gzip as _gzip

    from logistics_data_pipeline_project_spark.sources.warc import (
        encode_warc_records,
        warc_html_documents,
    )

    text = "<p>café page</p>"

    def resp(uri, body, *headers):
        head = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
        for h in headers:
            head += b"\r\n" + h
        return {"rec_type": "response", "target_uri": uri,
                "content_type": "application/http;msgtype=response",
                "body": head + b"\r\n\r\n" + body}

    body = text.encode("utf-8")
    chunked = b"%x\r\n" % len(body) + body + b"\r\n0\r\n\r\n"
    blob = encode_warc_records(
        [
            resp("http://a/plain", body),
            resp("http://a/gz", _gzip.compress(body),
                 b"Content-Encoding: gzip"),
            resp("http://a/ch", chunked, b"Transfer-Encoding: chunked"),
            {"rec_type": "response", "target_uri": "http://a/l1",
             "content_type": "application/http;msgtype=response",
             "body": b"HTTP/1.1 200 OK\r\nContent-Type: text/html; "
                     b"charset=iso-8859-1\r\n\r\n"
                     + text.encode("latin-1")},
            resp("http://a/br", b"brbytes", b"Content-Encoding: br"),
        ],
        gzip_members=True,
    )
    df = spark.createDataFrame([(7, blob)], "doc_id long, payload binary")
    rows = warc_html_documents(df, "doc_id", "payload").collect()
    by_url = {r["url"]: r for r in rows}
    assert set(by_url) == {
        "http://a/plain", "http://a/gz", "http://a/ch",
        "http://a/l1", "http://a/br",
    }
    for u in ("http://a/plain", "http://a/gz", "http://a/ch",
              "http://a/l1"):
        assert by_url[u]["html"] == text, u
    quar = by_url["http://a/br"]
    assert quar["html"] is None and quar["rec_index"] == 4
