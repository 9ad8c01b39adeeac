"""Crafted-case semantics for COEC (operators/events.py::coec_scores).

Hand-derivable log: items A and C share position 1, B sits alone at
position 2; the shared prior makes A under-perform (coec < 1) and C
over-perform (coec > 1) at IDENTICAL raw CTR differences a naive CTR
would misread. Oracle parity at fixture scale runs in the driver gate
(events_coec).
"""

from __future__ import annotations

from datetime import datetime

from search_engine_spark.operators.events import coec_scores


def _ev(spark, rows):
    # (event_id, event_type, k) — pos derives as event_id % 10 + 1
    full = [
        (eid, datetime(2024, 1, 1, 10, 0, 0), 1, etype, 0.0, f'{{"k": {k}}}')
        for eid, etype, k in rows
    ]
    return spark.createDataFrame(
        full,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_coec_corrects_position_bias(spark):
    rows = (
        # item A: 4 views + 2 clicks, all at position 1 (ids % 10 == 0)
        [(i * 10, "view", 1) for i in range(4)]
        + [(40, "click", 1), (50, "click", 1)]
        # item C: 2 views + 2 clicks at position 1
        + [(60, "view", 3), (70, "view", 3), (80, "click", 3), (90, "click", 3)]
        # item B: 4 views + 1 click at position 2 (ids % 10 == 1)
        + [(i * 10 + 1, "view", 2) for i in range(4)]
        + [(41, "click", 2)]
        # noise the filter must drop
        + [(7, "purchase", 1), (8, "error", 3)]
    )
    got = {r["k"]: r for r in coec_scores(_ev(spark, rows)).collect()}
    # prior(pos1) = 4 clicks / 6 views = 2/3; prior(pos2) = 1/4
    assert got[1]["views"] == 4 and got[1]["clicks"] == 2
    assert got[1]["expected_clicks"] == 2.6667 and got[1]["coec"] == 0.75
    assert got[3]["expected_clicks"] == 1.3333 and got[3]["coec"] == 1.5
    assert got[2]["expected_clicks"] == 1.0 and got[2]["coec"] == 1.0
    # ranking: coec desc, k asc
    order = [r["k"] for r in coec_scores(_ev(spark, rows)).collect()]
    assert order == [3, 2, 1]


def test_coec_click_only_position_keeps_clicks(spark):
    # a click at a position with zero views must still count in the
    # item's click total (prior coalesces to 0 for EC purposes)
    rows = [
        (0, "view", 5),    # pos 1 view
        (10, "click", 5),  # pos 1 click -> prior(1) = 1/1
        (3, "click", 5),   # pos 4: click, no views anywhere at pos 4
    ]
    got = coec_scores(_ev(spark, rows)).collect()
    assert len(got) == 1
    r = got[0]
    assert r["clicks"] == 2 and r["views"] == 1
    assert r["expected_clicks"] == 1.0 and r["coec"] == 2.0


# ------------------------------------------ flow graph + abandonment pins

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_TEST


def _mk_events(spark, rows):
    """rows: (event_id, ts_str, user_id, event_type, k)"""
    data = [
        (eid, ts, uid, et, 1.0, '{"k": %d}' % k)
        for eid, ts, uid, et, k in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    )
    return df.withColumn("ts", F.to_timestamp("ts"))


def test_item_transitions_crafted_graph(spark):
    """Hand-built stream: u1 views 1→2→2→3 (gap ok), the 2→2 self-loop
    drops; u2's second view is beyond the gap, so no edge; a click
    between views does not break the view chain."""
    from search_engine_spark.operators.events import item_transitions

    rows = [
        (0, "2024-01-01 10:00:00", 1, "view", 1),
        (1, "2024-01-01 10:05:00", 1, "view", 2),
        (2, "2024-01-01 10:06:00", 1, "click", 2),
        (3, "2024-01-01 10:07:00", 1, "view", 2),
        (4, "2024-01-01 10:10:00", 1, "view", 3),
        (5, "2024-01-01 09:00:00", 2, "view", 7),
        (6, "2024-01-01 11:00:00", 2, "view", 8),
    ]
    got = {
        (r["prev_k"], r["next_k"]): r["n"]
        for r in item_transitions(_mk_events(spark, rows)).collect()
    }
    assert got == {(1, 2): 1, (2, 3): 1}


def test_abandonment_crafted_sessions(spark):
    """u1 session: view+click → engaged. u2 session: view only →
    abandoned. u3 session: click only → engaged, not abandoned (no
    view). One day, rate = 1/3."""
    from search_engine_spark.operators.events import session_abandonment

    rows = [
        (0, "2024-01-02 10:00:00", 1, "view", 1),
        (1, "2024-01-02 10:01:00", 1, "click", 1),
        (2, "2024-01-02 10:00:00", 2, "view", 2),
        (3, "2024-01-02 10:00:00", 3, "click", 3),
    ]
    out = session_abandonment(_mk_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["sessions"] == 3 and r["engaged"] == 2 and r["abandoned"] == 1
    assert r["abandonment_rate"] == pytest.approx(0.3333)


def test_abandonment_sessions_match_sessionize(spark):
    """Session population equals sessionize's on the fixture — the shared
    window logic can't drift."""
    from search_engine_spark.operators.events import (
        session_abandonment,
        sessionize,
    )

    ev = spark.read.parquet(f"{SF_TEST}/events.parquet")
    n_sessions = sessionize(ev).count()
    got = session_abandonment(ev).agg(F.sum("sessions")).collect()[0][0]
    assert got == n_sessions
