"""Property-based invariants for the attribution interval join: the Spark
operators must equal a first-principles pure-Python oracle on arbitrary
small event sets (random users, random second-offset timestamps —
collisions and window-edge hits occur by construction)."""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.events import (
    attribution_pairs,
    last_touch_attribution,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)

EVENT = st.tuples(
    st.integers(0, 2),                      # user_id
    st.integers(0, 40),                     # seconds offset
    st.sampled_from(["view", "click"]),
)
EVENTS = st.lists(EVENT, min_size=0, max_size=14)
WINDOW = st.sampled_from([0, 5, 10, 30])


def _frame(spark, evs):
    rows = [
        (i, T0 + timedelta(seconds=off), uid, typ)
        for i, (uid, off, typ) in enumerate(evs)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _py_pairs(evs, w):
    out = []
    for vi, (vu, vo, vt) in enumerate(evs):
        if vt != "view":
            continue
        for ci, (cu, co, ct) in enumerate(evs):
            if ct != "click" or cu != vu:
                continue
            if vo <= co <= vo + w:
                out.append((vi, ci, vu, co - vo))
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=EVENTS, w=WINDOW)
def test_pairs_equal_pure_python(spark, evs, w):
    got = sorted(
        (r["view_id"], r["click_id"], r["user_id"], r["lag_s"])
        for r in attribution_pairs(_frame(spark, evs), w).collect()
    )
    assert got == _py_pairs(evs, w)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(evs=EVENTS, w=WINDOW)
def test_last_touch_is_argmax_of_pairs(spark, evs, w):
    pairs = _py_pairs(evs, w)
    expect = {}
    for view_id, click_id, uid, lag in pairs:
        cur = expect.get(click_id)
        # min lag wins; ties → max view_id (the pinned total order)
        if cur is None or (lag, -view_id) < (cur[2], -cur[1]):
            expect[click_id] = (uid, view_id, lag)
    got = {
        r["click_id"]: (r["user_id"], r["view_id"], r["lag_s"])
        for r in last_touch_attribution(_frame(spark, evs), w).collect()
    }
    assert got == expect
