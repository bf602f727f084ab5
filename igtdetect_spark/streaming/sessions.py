"""Custom stateful streaming operator: incremental time-gap
sessionization via ``applyInPandasWithState`` (SURVEY.md §2.9 — the
"custom stateful operator" slot the batch engine fills with
gaps-and-islands windows, here maintained incrementally across
micro-batches).

Semantics match the batch ``session_windows`` query (entry_queries.py):
a gap > ``gap_sec`` between consecutive events of a user starts a new
session; value cents are per-row floored then integer-summed (float
discipline). A session is EMITTED when it closes — either an in-batch
event arrives past the gap, or the event-time watermark passes
``last_ts + gap_sec`` (state timeout) — so output is append-mode and
exactly-once under the streaming checkpoint.

State per user: one open session (epoch seconds + counters), bounded;
the watermark timeout guarantees state for idle users is flushed and
dropped — state size is O(active users), not O(history).
"""

from __future__ import annotations

import math
from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_start", LongType(), False),   # epoch sec
        StructField("session_end", LongType(), False),     # epoch sec
        StructField("n_events", LongType(), False),
        StructField("value_cents", LongType(), False),
        StructField("first_event", LongType(), False),
        StructField("last_event", LongType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_ts", LongType(), False),
        StructField("last_ts", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("value_cents", LongType(), False),
        StructField("first_event", LongType(), False),
        StructField("last_event", LongType(), False),
    ]
)

_COLS = [f.name for f in SESSION_SCHEMA.fields]


def _batch_sessions(pdf: pd.DataFrame, gap_sec: int):
    """Vectorized in-batch sessionization: sorted events → list of
    (start, last, n, cents, first_ev, last_ev) tuples (pandas cumsum
    gaps-and-islands, no per-row Python)."""
    pdf = pdf.sort_values(["_epoch", "event_id"])
    ep = pdf["_epoch"].to_numpy()
    new = pd.Series(True, index=pdf.index)
    new.iloc[1:] = (ep[1:] - ep[:-1]) > gap_sec
    sid = new.cumsum()
    out = []
    for _, g in pdf.groupby(sid.to_numpy()):
        out.append(
            (
                int(g["_epoch"].iloc[0]),
                int(g["_epoch"].iloc[-1]),
                int(len(g)),
                int(g["_cents"].sum()),
                # MIN/MAX like the batch session_windows query — not
                # first/last by time (event ids may be out of ts order)
                int(g["event_id"].min()),
                int(g["event_id"].max()),
            )
        )
    return out


def _fold_sessions(open_sess, sessions, gap_sec):
    """Fold time-ordered in-batch sessions into the carried open session.
    Returns (closed, open_sess). Late-data rules (a non-zero watermark
    delay admits events before the carried session's span):
    - a session after open's horizon → open closes, it becomes open;
    - a session entirely before open with a real gap → a late, already-
      closed session of its own (emitted; open untouched);
    - otherwise merge with min(start)/max(end) so a late early event can
      lower session_start but never drag session_end backwards.

    Implementation is a plain interval-gap merge of ``sessions +
    [open_sess]`` sorted by start — in-batch sessions are mutually
    gap-separated by construction, but the carried open session can sit
    anywhere among them (late data), and once it merges, its extended
    end can reach the NEXT in-batch session too. Only the time-latest
    merged session stays open; every earlier one is closed. (The earlier
    per-item fold wrongly closed the carried session whenever a
    stand-alone late session shared its micro-batch.)"""
    items = [list(s) for s in sessions]
    if open_sess is not None:
        items.append(list(open_sess))
    items.sort(key=lambda s: (s[0], s[1]))
    merged: list[list] = []
    for s in items:
        if merged and s[0] - merged[-1][1] <= gap_sec:
            m = merged[-1]
            m[0] = min(m[0], s[0])
            m[1] = max(m[1], s[1])
            m[2] += s[2]
            m[3] += s[3]
            m[4] = min(m[4], s[4])
            m[5] = max(m[5], s[5])
        else:
            merged.append(list(s))
    closed = [tuple(m) for m in merged[:-1]]
    return closed, (merged[-1] if merged else None)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "0 seconds",
) -> DataFrame:
    """events stream (user_id, event_id, ts, value) → closed sessions.

    ``applyInPandasWithState`` keyed by user_id with EventTimeTimeout:
    the open session rides in state between micro-batches; closed
    sessions append downstream.
    """

    def fn(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        closed = []
        open_sess = list(state.get) if state.exists else None

        if state.hasTimedOut:
            # watermark passed last_ts + gap: flush the open session
            if open_sess is not None:
                closed.append(tuple(open_sess))
            state.remove()
        else:
            batches = [p for p in pdfs if len(p)]
            if batches:
                pdf = pd.concat(batches, ignore_index=True)
                pdf["_epoch"] = (
                    pdf["ts"].astype("datetime64[ns]").astype("int64")
                    // 1_000_000_000
                )
                pdf["_cents"] = (
                    pdf["value"].astype("float64") * 100
                ).apply(math.floor).astype("int64")
                sessions = _batch_sessions(pdf, gap_sec)
                newly_closed, open_sess = _fold_sessions(
                    open_sess, sessions, gap_sec
                )
                closed.extend(newly_closed)
            if open_sess is not None:
                state.update(tuple(int(x) for x in open_sess))
                # flush when the watermark passes the gap horizon; must be
                # strictly beyond the current watermark
                horizon_ms = (open_sess[1] + gap_sec) * 1000
                state.setTimeoutTimestamp(
                    max(horizon_ms, state.getCurrentWatermarkMs() + 1)
                )

        yield pd.DataFrame(
            [(int(user_id), s[0], s[1], s[2], s[3], s[4], s[5])
             for s in closed],
            columns=_COLS,
        )

    from pyspark.sql import functions as F

    return (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            fn,
            SESSION_SCHEMA,
            _STATE_SCHEMA,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
