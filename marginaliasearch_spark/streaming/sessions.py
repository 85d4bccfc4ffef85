"""Custom stateful streaming operators over the transcript turn stream.

The reference has no streaming surface (SURVEY §2.9 — batch journal +
atomic switch); these operators are part of the beyond-reference
training-data pipeline: a 10^12-turn corpus arrives as a stream, and the
two classic shapes a pipeline needs are

- ``conversation_sessions`` — per-``conv_id`` sessionization with an
  event-time idle gap, implemented with ``applyInPandasWithState``
  (Arrow-batched per-group state, event-time timeout). Semantics match SQL
  ``session_window(ts, gap)``: turns merge into one session while each
  consecutive pair is strictly less than ``gap`` apart (regardless of
  which micro-batch they arrive in), and a session row (turn count, span,
  roles seen) is emitted exactly once — when the watermark passes
  ``last_ts + gap``, i.e. when no admissible row can extend or bridge it.
- ``windowed_event_counts`` — watermarked tumbling-window aggregation in
  append mode: late rows beyond the watermark are dropped, and a window is
  emitted exactly once, when it can no longer change.
- ``streaming_exact_dedup`` — first-occurrence-wins exact dedup across
  micro-batches (one int of state per distinct digest, sharded by the
  group-key shuffle), the streaming twin of ``dedup.exact_dedup``.

Both are bounded-state by construction: sessions hold one state row per
LIVE conversation (a short array of pending sessions, drained as the
watermark passes each one), windows hold one partial aggregate per
(window, key) until the watermark closes it.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_SCHEMA = (
    "conv_id string, n_turns long, first_ts_ms long, last_ts_ms long, "
    "n_tool_turns long"
)
# one state row per live conversation holding ALL pending sessions
# (first-ts ascending); arrays because a conversation can have several
# gap-separated sessions in flight before the watermark drains them
_STATE_SCHEMA = (
    "n_turns array<long>, first_ts_ms array<long>, "
    "last_ts_ms array<long>, n_tool array<long>"
)


def _gap_ms(gap: str) -> int:
    n, unit = gap.split()
    mult = {
        "second": 1000,
        "seconds": 1000,
        "minute": 60_000,
        "minutes": 60_000,
        "hour": 3_600_000,
        "hours": 3_600_000,
    }[unit]
    return int(n) * mult


def conversation_sessions(
    turns: DataFrame, gap: str = "30 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming sessionization of transcript turns by ``conv_id``.

    State per live conversation: the array of PENDING sessions, each
    (turn count, first/last event time, tool turns), first-ts ascending.
    Each batch folds its turns in as singleton sessions and re-merges
    exactly like SQL ``session_window``: sessions whose intervals
    ``[first, last + gap)`` overlap (i.e. the idle gap between them is
    strictly under ``gap``) coalesce, whether the turns arrived in one
    batch or many. A session is emitted — and dropped from state — only
    once the watermark reaches ``last_ts + gap``: any row admitted after
    that has ``ts >= watermark >= last_ts + gap``, so it can neither
    extend nor bridge into the emitted session. An event-time timeout at
    the earliest pending ``last_ts + gap`` drains sessions for
    conversations that receive no further turns.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_millis = _gap_ms(gap)

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            s_n, s_first, s_last, s_tool = (
                np.asarray(col, dtype="int64") for col in state.get
            )
        else:
            s_n = s_first = s_last = s_tool = np.empty(0, dtype="int64")
        # fold this batch's turns in as singleton sessions
        new_ts, new_tool = [], []
        for pdf in pdfs:
            if not len(pdf):
                continue
            ts = pdf["ts"]
            if getattr(ts.dtype, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            new_ts.append((ts.astype("int64") // 1_000_000).to_numpy())
            new_tool.append((pdf["role"] == "tool").to_numpy())
        if new_ts:
            t = np.concatenate(new_ts)
            s_first = np.concatenate([s_first, t])
            s_last = np.concatenate([s_last, t])
            s_n = np.concatenate([s_n, np.ones(len(t), dtype="int64")])
            s_tool = np.concatenate(
                [s_tool, np.concatenate(new_tool).astype("int64")]
            )
        if not len(s_first):
            if state.exists:
                state.remove()
            return
        # merge: sort by first ts, split where the idle gap reaches `gap`
        # (strict overlap of [first, last+gap), same as session_window)
        order = np.argsort(s_first, kind="stable")
        s_first, s_last = s_first[order], s_last[order]
        s_n, s_tool = s_n[order], s_tool[order]
        run_last = np.maximum.accumulate(s_last)
        head = np.ones(len(s_first), dtype=bool)
        head[1:] = s_first[1:] - run_last[:-1] >= gap_millis
        seg = np.flatnonzero(head)
        m_first = s_first[seg]
        m_last = np.maximum.reduceat(s_last, seg)
        m_n = np.add.reduceat(s_n, seg)
        m_tool = np.add.reduceat(s_tool, seg)
        # emit every session the watermark has sealed; keep the rest
        wm = state.getCurrentWatermarkMs()
        done = m_last + gap_millis <= wm
        if done.any():
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]] * int(done.sum()),
                    "n_turns": m_n[done],
                    "first_ts_ms": m_first[done],
                    "last_ts_ms": m_last[done],
                    "n_tool_turns": m_tool[done],
                }
            )
        keep = ~done
        if not keep.any():
            state.remove()
            return
        state.update(
            (
                m_n[keep].tolist(),
                m_first[keep].tolist(),
                m_last[keep].tolist(),
                m_tool[keep].tolist(),
            )
        )
        # kept sessions all have last+gap > wm, so this timeout is legal
        state.setTimeoutTimestamp(int(m_last[keep].min()) + gap_millis)
        return

    return (
        turns.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    key: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregate in APPEND mode: a window row
    is emitted exactly once — when the watermark guarantees no more
    (on-time) rows can land in it — and rows later than the watermark are
    dropped, which is the bounded-state contract a 100 TB stream needs."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), key)
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            key,
            "n",
            F.round("sum_value", 6).alias("sum_value"),
        )
    )


DEDUP_SCHEMA = "text_hash string, doc_id long"
_DEDUP_STATE_SCHEMA = "seen int"


def streaming_exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-occurrence-wins exact dedup over a document stream.

    The streaming counterpart of ``dedup.exact_dedup``: a document whose
    normalized-text digest was already emitted in ANY earlier micro-batch
    is dropped; within a batch the smallest ``doc_id`` wins (the same
    keeper rule as the batch operator, so replaying a finite stream
    through this operator yields exactly ``exact_dedup``'s survivor set).

    State per distinct digest is a single int — the bare minimum ANY
    exact streaming dedup must hold — and the ``groupBy(text_hash)`` hash
    shuffle shards that key space across executors for free, so state
    scales horizontally with the cluster, not with one node's memory.
    ``NoTimeout`` matches batch semantics (duplicates are duplicates
    forever); a retention-window variant is one ``EventTimeTimeout`` away.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        ids = [int(pdf["doc_id"].min()) for pdf in pdfs if len(pdf)]
        if state.exists or not ids:
            return  # digest already emitted once — drop everything
        state.update((1,))
        yield pd.DataFrame({"text_hash": [key[0]], "doc_id": [min(ids)]})

    return (
        docs.select("doc_id", F.md5(F.lower(F.col(text_col))).alias("text_hash"))
        .groupBy("text_hash")
        .applyInPandasWithState(
            fn,
            DEDUP_SCHEMA,
            _DEDUP_STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
