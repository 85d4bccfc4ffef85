"""Custom stateful streaming operators over the transcript turn stream.

The reference has no streaming surface (SURVEY §2.9 — batch journal +
atomic switch); these operators are part of the beyond-reference
training-data pipeline: a 10^12-turn corpus arrives as a stream, and the
two classic shapes a pipeline needs are

- ``conversation_sessions`` — per-``conv_id`` sessionization with an
  event-time idle gap, implemented with ``applyInPandasWithState``
  (Arrow-batched per-group state, event-time timeout). A conversation's
  session row (turn count, span, roles seen) is emitted once the watermark
  passes ``last_ts + gap`` — i.e. when no more turns can legally arrive.
- ``windowed_event_counts`` — watermarked tumbling-window aggregation in
  append mode: late rows beyond the watermark are dropped, and a window is
  emitted exactly once, when it can no longer change.

Both are bounded-state by construction: sessions hold one fixed-size state
row per LIVE conversation (closed ones are removed on emit), windows hold
one partial aggregate per (window, key) until the watermark closes it.
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
_STATE_SCHEMA = "n_turns long, first_ts_ms long, last_ts_ms long, n_tool long"


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

    State per live conversation: (turn count, first/last event time, tool
    turns). Each batch folds its turns into the state and re-arms an
    EVENT-TIME timeout at ``last_ts + gap``; when the watermark passes it,
    the session is emitted and the state removed. Emission is
    exactly-once-per-conversation (unless later turns re-open it, which
    the gap semantics define as a NEW session — same as SQL
    ``session_window``, but with custom state so arbitrary per-session
    aggregates ride along).
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_millis = _gap_ms(gap)

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            n, first_ms, last_ms, n_tool = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "n_turns": [n],
                    "first_ts_ms": [first_ms],
                    "last_ts_ms": [last_ms],
                    "n_tool_turns": [n_tool],
                }
            )
            return
        n, first_ms, last_ms, n_tool = (
            state.get if state.exists else (0, None, None, 0)
        )
        saw_rows = False
        for pdf in pdfs:
            if not len(pdf):
                continue
            saw_rows = True
            ts = pdf["ts"]
            if getattr(ts.dtype, "tz", None) is not None:
                ts = ts.dt.tz_convert("UTC").dt.tz_localize(None)
            ts_ms = (ts.astype("int64") // 1_000_000).to_numpy()
            n += len(pdf)
            lo, hi = int(ts_ms.min()), int(ts_ms.max())
            first_ms = lo if first_ms is None else min(first_ms, lo)
            last_ms = hi if last_ms is None else max(last_ms, hi)
            n_tool += int((pdf["role"] == "tool").sum())
        if not saw_rows and not state.exists:
            return
        state.update((n, first_ms, last_ms, n_tool))
        state.setTimeoutTimestamp(last_ms + gap_millis)
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
