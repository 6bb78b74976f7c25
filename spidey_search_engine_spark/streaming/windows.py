"""Watermarked windowed aggregation + custom stateful sessionization.

The reference has no true stream processing (its crawler/indexer loop in
batches), but a Spark-native engine serving a 10^12-file corpus ingests
click/history events continuously — these are the two standard shapes:

* ``windowed_user_counts`` — tumbling/sliding event-time windows with a
  watermark: late events beyond the watermark are DROPPED, finalized
  windows emit exactly once in append mode (the Q13 history-count rollup
  as a stream instead of an upsert).
* ``sessionize_stream`` — a custom stateful operator via
  ``applyInPandasWithState``: per-user gap-based sessions, state = the
  open session (start, last, n), closed sessions emit either when a new
  in-batch event exceeds the gap or when the EVENT-TIME TIMEOUT fires
  (watermark passes last_event + gap). This is the pattern for operators
  Spark's built-ins can't express (SURVEY.md §4 custom ops).

Both are deterministic under replay: windows/sessions are functions of
event time only, so checkpoint recovery re-emits identical results —
the streaming counterpart of the build's chunk lineage idempotency.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT_SCHEMA = ("user_id long, session_start long, session_end long, "
                      "n_events long")
SESSION_STATE_SCHEMA = "start long, last long, n long"


def windowed_user_counts(events: DataFrame, window: str = "10 minutes",
                         slide: str | None = None,
                         watermark: str = "5 minutes") -> DataFrame:
    """Per-user event counts + value sums over event-time windows.
    Append-mode sinks emit each window once, after the watermark passes
    its end; events later than `watermark` behind the max seen ts drop."""
    win = (F.window("ts", window, slide) if slide
           else F.window("ts", window))
    return (events.withWatermark("ts", watermark)
            .groupBy(win.alias("w"), F.col("user_id"))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("sum_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "user_id", "n_events", "sum_value"))


def _session_fn(gap_seconds: int):
    def fn(key: Any, pdfs: Iterable[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        out: list[tuple[int, int, int, int]] = []
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            out.append((user_id, start, last, n))
        else:
            # interval-merge sweep: the open-session state is just another
            # interval, sorted in with the batch's events — so a
            # within-watermark late event PRECEDING the open session merges
            # into it (extending session_start backwards) and the result is
            # identical to processing all events sorted in one batch;
            # everything except the latest run closes and emits.
            intervals: list[tuple[int, int, int]] = [
                (t, t, 1) for pdf in pdfs
                for t in (int(v) // 1_000_000_000
                          for v in pdf["ts"].astype("int64"))]
            if state.exists:
                intervals.append(tuple(state.get))
            intervals.sort()
            cur = intervals[0]
            for iv in intervals[1:]:
                if iv[0] - cur[1] <= gap_seconds:
                    cur = (cur[0], max(cur[1], iv[1]), cur[2] + iv[2])
                else:
                    out.append((user_id,) + cur)
                    cur = iv
            state.update(cur)
            # close the open session when the watermark passes last + gap
            # (clamped above the current watermark — required by Spark when
            # a late event arrives after the nominal timeout already passed)
            state.setTimeoutTimestamp(
                max((cur[1] + gap_seconds) * 1000,
                    state.getCurrentWatermarkMs() + 1))
        yield pd.DataFrame(out, columns=["user_id", "session_start",
                                         "session_end", "n_events"])

    return fn


def sessionize_stream(events: DataFrame, gap_seconds: int = 1800,
                      watermark: str = "0 seconds") -> DataFrame:
    """Gap-based per-user sessions as an applyInPandasWithState operator.
    `events` needs (user_id, ts[timestamp]); emits one row per CLOSED
    session (epoch-second bounds) — open sessions stay in state until the
    event-time timeout fires."""
    return (events.withWatermark("ts", watermark)
            .groupBy("user_id")
            .applyInPandasWithState(_session_fn(gap_seconds),
                                    SESSION_OUT_SCHEMA,
                                    SESSION_STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
