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
