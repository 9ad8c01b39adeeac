"""Custom stateful streaming operator — gap sessionization via
``applyInPandasWithState``.

The batch sessionizer (operators/events.py::sessionize) needs the whole
history per user; over an unbounded stream the same semantics become a
per-user STATE machine: the open session (start, last-event, count) lives
in Spark's state store, each micro-batch folds its events in, and a
session is EMITTED exactly when a later event arrives more than ``gap``
after it (append semantics — emitted sessions are final). This is the
"custom stateful operator" shape Structured Streaming cannot express with
windows/watermarks alone: session boundaries depend on the data, not the
clock grid.

State per user = 3 longs (bounded regardless of stream length); the
segmentation math inside each (user, batch) group is vectorized numpy over
epoch-microsecond arrays — no per-row Python.

Semantics vs batch (pinned by tests/test_streaming.py): after processing
the full input, the emitted sessions equal the batch sessionizer's output
MINUS each user's final (still-open) session — exactly the sessions a
later event has closed.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

GAP_MIN_DEFAULT = 30

OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_start", T.TimestampType(), False),
        T.StructField("session_end", T.TimestampType(), False),
        T.StructField("n_events", T.LongType(), False),
    ]
)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType(), False),
        T.StructField("last_us", T.LongType(), False),
        T.StructField("n", T.LongType(), False),
    ]
)


def _session_fn(gap_min: int):
    gap_us = gap_min * 60 * 1_000_000

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        parts = [p for p in pdfs if not p.empty]
        if not parts:
            return
        batch = pd.concat(parts, ignore_index=True).sort_values(
            ["ts", "event_id"]
        )
        us = batch["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        # vectorized in-batch segmentation at gap boundaries
        breaks = np.zeros(us.size, dtype=bool)
        breaks[1:] = np.diff(us) > gap_us
        seg_id = np.cumsum(breaks)
        segments: list[tuple[int, int, int]] = []
        for s in range(int(seg_id[-1]) + 1):
            m = seg_id == s
            seg_us = us[m]
            segments.append((int(seg_us[0]), int(seg_us[-1]), int(m.sum())))
        open_sess = tuple(state.get) if state.exists else None
        closed: list[tuple[int, int, int]] = []
        for i, seg in enumerate(segments):
            if open_sess is None:
                open_sess = seg
            elif i == 0 and seg[0] - open_sess[1] <= gap_us:
                # batch head continues the carried open session. min/max
                # bounds, NOT (open_start, seg_end): the file source gives
                # no cross-batch event-time ordering, so a late batch can
                # deliver events BEFORE the open session's last-seen —
                # naively taking seg[1] as the new end would regress
                # session_end below session_start and later split a
                # genuinely continuous session at a phantom gap.
                open_sess = (
                    min(open_sess[0], seg[0]),
                    max(open_sess[1], seg[1]),
                    open_sess[2] + seg[2],
                )
            else:
                closed.append(open_sess)
                open_sess = seg
        state.update((int(open_sess[0]), int(open_sess[1]), int(open_sess[2])))
        if closed:
            out = pd.DataFrame(
                closed, columns=["session_start", "session_end", "n_events"]
            )
            out.insert(0, "user_id", user_id)
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
            yield out

    return fn


def sessionize_stream(
    events: DataFrame, gap_min: int = GAP_MIN_DEFAULT
) -> DataFrame:
    """events stream → closed-session stream (append)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn(gap_min),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
