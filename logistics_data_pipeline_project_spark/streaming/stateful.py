"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch catalog computes user sessions with a window over event time
(q20). In a stream, that window is unbounded state; the streaming-correct
formulation is explicit per-key state with an event-time timeout — exactly
what ``applyInPandasWithState`` provides (Arrow-batched, one fixed-size
state row per user):

- state per user: (session_start, last_ts, n_events)
- a new event within ``gap`` of last_ts extends the session; a later
  event closes the open session (emitted) and starts a new one
- the event-time timeout fires when the watermark passes
  last_ts + gap: the open session of a user who went quiet is emitted
  and their state evicted — no wall-clock dependence, so runs are
  deterministic and replayable from the checkpoint

This is the ``applyInPandasWithState`` pattern from the public Spark
docs/source (python/pyspark/sql/pandas/group_ops.py) applied to the
engine's session semantics; q20 is its oracle-checked batch twin.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", IntegerType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("session_start", LongType()),  # µs since epoch
        StructField("last_ts", LongType()),
        StructField("n_events", IntegerType()),
    ]
)


def _us(ts: pd.Timestamp) -> int:
    return int(ts.value // 1_000)


def _from_us(us: int) -> dt.datetime:
    return dt.datetime.fromtimestamp(us / 1_000_000, tz=dt.timezone.utc).replace(
        tzinfo=None
    )


def stream_user_sessions(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Sessionize a stream of (user_id, ts, ...) events: emit one row per
    closed session. A session closes when a later event arrives more than
    ``gap_minutes`` after the previous one, or when the event-time
    watermark (``watermark_delay`` behind max observed ts) passes the open
    session's last event + gap — i.e. the user verifiably went quiet.

    State is one fixed-size row per active user — memory is O(active
    users), not O(events) — and the watermark-driven timeout guarantees
    quiet users' state is evicted, which is what makes this run forever
    on an unbounded stream.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def _session_df(user_id, sessions):
        return pd.DataFrame(
            {
                "user_id": [user_id] * len(sessions),
                "session_start": [_from_us(s) for s, _, _ in sessions],
                "session_end": [_from_us(e) for _, e, _ in sessions],
                "n_events": [n for _, _, n in sessions],
            }
        )

    def sessionize(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            session_start, last_ts, n_events = state.get
            state.remove()
            yield _session_df(user_id, [(session_start, last_ts, n_events)])
            return

        ts_list: list[int] = []
        for pdf in pdfs:
            ts_list.extend(_us(t) for t in pdf["ts"])
        ts_list.sort()

        if state.exists:
            session_start, last_ts, n_events = state.get
        else:
            session_start, last_ts, n_events = ts_list[0], ts_list[0], 0

        closed: list[tuple[int, int, int]] = []
        for t in ts_list:
            if n_events and t - last_ts > gap_us:
                closed.append((session_start, last_ts, n_events))
                session_start, n_events = t, 0
            last_ts = max(last_ts, t)
            n_events += 1

        state.update((session_start, last_ts, n_events))
        # close this session once the watermark proves no more events can
        # extend it (timeout ts must stay ahead of the current watermark)
        timeout_ms = (last_ts + gap_us) // 1000
        state.setTimeoutTimestamp(max(timeout_ms, state.getCurrentWatermarkMs() + 1))
        if closed:
            yield _session_df(user_id, closed)

    return (
        events.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize,
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_first_seen(
    df: DataFrame,
    key_col: str = "sig",
) -> DataFrame:
    """Streaming exactly-once deduplication: the first row bearing each
    key is emitted (with its in-batch occurrence count); every later
    arrival of the same key — in the same or ANY later micro-batch — is
    dropped. Checkpoint-recoverable via the state store.

    This is the streaming half of the exact-dedup family (batch twins:
    q21/q87): a landing stream of document signatures passes each content
    hash downstream exactly once. State is one boolean per distinct key —
    O(distinct keys); on unbounded key spaces pair it with a TTL/timeout
    eviction policy and push exactness into a compacted batch pass (the
    standard memory/exactness trade at 100 TB).

    Implemented on ``applyInPandasWithState`` (the stateful API available
    without extra deps; Spark 4's ``transformWithStateInPandas`` twin
    additionally needs protobuf at runtime)."""

    def first_seen(key, pdfs, state: GroupState):
        n = 0
        for pdf in pdfs:
            n += len(pdf)
        if state.exists:
            return
        state.update((True,))
        yield pd.DataFrame({key_col: [key[0]], "occurrences": [n]})

    return df.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=f"{key_col} string, occurrences long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """Bounded-state streaming deduplication via the built-in
    ``dropDuplicatesWithinWatermark``: a key's recurrences are dropped as
    long as they arrive within ``delay`` (event time) of the retained row;
    once the watermark passes ``first_ts + delay`` the key's state is
    EVICTED, so a much-later recurrence is emitted again.

    This is the complementary memory/exactness trade to
    :func:`stream_first_seen`: first-seen keeps one state row per distinct
    key forever (exactly-once output, unbounded state), this keeps state
    only for keys inside the watermark horizon (O(recent keys) state,
    at-least-once across horizons). On an unbounded 100 TB landing stream
    the watermarked form is the one that survives; re-run a batch
    exact-dedup (q21/q87) over the sink for the long tail.
    """
    return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
