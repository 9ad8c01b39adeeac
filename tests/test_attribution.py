"""Crafted-case semantics for the attribution interval join — the fixture
corpus never gives one click multiple candidate views, so the argmax and
tie rules are pinned here (oracle parity at fixture scale is covered by
test_oracle_parity)."""

from datetime import datetime

from search_engine_spark.operators.events import (
    attribution_pairs,
    last_touch_attribution,
)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )


def _ts(minute, second=0):
    return datetime(2024, 1, 1, 10, minute, second)


def test_pairs_window_bounds_are_inclusive_and_per_user(spark):
    rows = [
        (1, _ts(0), 7, "view"),
        (2, _ts(10), 7, "click"),     # inside 600s (inclusive upper edge)
        (3, _ts(10, 1), 7, "click"),  # 601s → outside
        (4, _ts(5), 8, "click"),      # other user → never joins
        (5, _ts(0), 9, "click"),      # click with no view
    ]
    got = sorted(
        (r["view_id"], r["click_id"], r["lag_s"])
        for r in attribution_pairs(_events(spark, rows), 600).collect()
    )
    assert got == [(1, 2, 600)]


def test_click_before_view_never_attributes(spark):
    rows = [(1, _ts(5), 7, "view"), (2, _ts(4), 7, "click")]
    assert attribution_pairs(_events(spark, rows), 600).count() == 0


def test_last_touch_picks_latest_view_and_breaks_ties_by_view_id(spark):
    rows = [
        (1, _ts(0), 7, "view"),   # lag 300
        (2, _ts(3), 7, "view"),   # lag 120  ← latest, wins
        (3, _ts(5), 7, "click"),
        # user 8: two views at the SAME second → tie on lag, max view_id wins
        (10, _ts(0), 8, "view"),
        (11, _ts(0), 8, "view"),
        (12, _ts(2), 8, "click"),
    ]
    ev = _events(spark, rows)
    assert attribution_pairs(ev, 600).count() == 4
    got = {
        r["click_id"]: (r["view_id"], r["lag_s"])
        for r in last_touch_attribution(ev, 600).collect()
    }
    assert got == {3: (2, 120), 12: (11, 120)}


def test_last_touch_breaks_subsecond_ties_by_true_instant(spark):
    """Two views inside the same whole second before a click: lag_s
    truncates to the same value for both, but the credit must go to the
    view with the LATER true instant (smaller microsecond lag) — not to
    whichever has the higher view_id."""
    rows = [
        (9, datetime(2024, 1, 1, 10, 0, 0, 200_000), 1, "view"),
        (3, datetime(2024, 1, 1, 10, 0, 0, 700_000), 1, "view"),
        (50, datetime(2024, 1, 1, 10, 0, 1), 1, "click"),
    ]
    got = last_touch_attribution(_events(spark, rows)).collect()
    assert len(got) == 1
    assert got[0]["view_id"] == 3  # the later view, not the higher id
    assert got[0]["lag_s"] == 0
