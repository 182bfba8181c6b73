"""Streaming sketch rollups: keep a mergeable sketch (HLL registers,
geometric histograms, KMV bottom-k, CMS counters — operators/sketch.py)
current over an unbounded stream through ``foreachBatch``.

Why this shape: streaming COUNT(DISTINCT) in complete output mode keeps
O(distinct keys) state in the state store forever; a register file is a
few KB per group, FOREVER, and because register merge is idempotent
(max) the sink tolerates micro-batch replays after a crash — the
sketch of "batch applied twice" equals the sketch of "batch applied
once", so exactly-once delivery is not load-bearing here, only the
checkpoint's at-least-once. The maintained sketch is IDENTICAL to the
batch sketch of the full history (merge associativity), which is what
the tests assert.

The same ``build``/``merge`` pair works in batch backfills
(plans/incremental.py) and here — one sketch definition, three
refresh modes (batch, incremental, streaming)."""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..operators.sketch import hll_registers, merge_hll_sketches
from ..plans.materialize import TableStore


def stream_sketch_rollup(
    source_stream: DataFrame,
    store: TableStore,
    table: str,
    build: Callable[[DataFrame], DataFrame],
    merge: Callable[[DataFrame, DataFrame], DataFrame],
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Maintain ``store[table]`` = merge-fold of ``build`` over every
    micro-batch. ``build`` turns a batch into a sketch DataFrame;
    ``merge`` folds two sketches into one (must be associative +
    commutative; idempotent merges additionally make replayed batches
    harmless). Each micro-batch commits one atomic TableStore snapshot,
    so readers never observe a half-applied batch and a bad batch is one
    ``rollback`` away."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        sk = build(batch_df)
        if store.exists(table):
            sk = merge(store.read(table), sk)
        # localCheckpoint cuts lineage to the store's previous snapshot
        # files before the atomic swap (same discipline as upsert.py)
        store.overwrite(table, sk.localCheckpoint(eager=True))

    writer = (
        source_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_hll_distinct(
    source_stream: DataFrame,
    store: TableStore,
    table: str,
    key_col: str,
    keys: Sequence[str] = (),
    checkpoint_dir: str = "",
    available_now: bool = True,
    index_chars: int = 2,
    rank_chars: int = 12,
) -> StreamingQuery:
    """Streaming distinct-count registers: all-time unique ``key_col``
    per ``keys`` maintained as an HLL register file (estimate at read
    time via `operators.sketch.hll_estimate`). State is ≤ 16^index_chars
    rows per group regardless of stream length — the streaming twin of
    q136's batch sketch, sharing its bit-deterministic register math."""
    return stream_sketch_rollup(
        source_stream,
        store,
        table,
        build=lambda b: hll_registers(
            b, key_col, keys=keys, index_chars=index_chars, rank_chars=rank_chars
        ),
        merge=lambda prev, new: merge_hll_sketches(prev, new),
        checkpoint_dir=checkpoint_dir,
        available_now=available_now,
    )
