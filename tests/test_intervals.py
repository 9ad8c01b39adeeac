"""Lucene-style interval queries (operators/intervals.py).

Pins minimal-interval semantics (an interval survives only if it does
not properly contain another match), the max_gaps width filter, the
four combinators, and the equivalence between the ordered interval
source and the ordered SpanNear existence test (`proximity_match`)
at matching gap budgets.
"""

from __future__ import annotations

import pandas as pd

from search_engine_spark.operators.intervals import (
    intervals_containing,
    intervals_not_contained_by,
    intervals_not_containing,
    intervals_overlapping,
    ordered_intervals,
    rank_intervals,
    search_intervals,
    term_intervals,
    unordered_intervals,
)
from search_engine_spark.operators.positional import (
    build_positional,
    proximity_match,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def _pos(spark, rows):
    return build_positional(_docs(spark, rows))


def _ivset(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def test_ordered_minimality_drops_containing_interval(spark):
    # data@0, data@2, fast@3: candidates (0,3) and (2,3); (0,3) properly
    # contains (2,3) so only the tight one survives.
    pos = _pos(spark, [(1, "data scan data fast")])
    got = _ivset(ordered_intervals(pos, ["data", "fast"]))
    assert got == {(1, 2, 3)}


def test_ordered_max_gaps_filters_width(spark):
    # data@0 .. fast@4: width-gaps = 4 - 0 - 1 = 3
    pos = _pos(spark, [(1, "data scan scan scan fast")])
    assert _ivset(ordered_intervals(pos, ["data", "fast"], max_gaps=2)) == set()
    assert _ivset(ordered_intervals(pos, ["data", "fast"], max_gaps=3)) == {
        (1, 0, 4)
    }


def test_ordered_requires_order(spark):
    pos = _pos(spark, [(1, "fast data")])
    assert _ivset(ordered_intervals(pos, ["data", "fast"])) == set()


def test_unordered_matches_either_order_and_is_minimal(spark):
    # merge@0 data@1  AND  data@3 merge@5 → minimal covers (0,1), (3,5)
    pos = _pos(spark, [(1, "merge data scan data scan merge")])
    got = _ivset(unordered_intervals(pos, ["data", "merge"]))
    assert got == {(1, 0, 1), (1, 3, 5)}


def test_unordered_equal_start_candidates_keep_shortest(spark):
    # merge@0 data@1 data@2: rows at data@1 and data@2 both emit covers
    # starting at merge@0 — (0,1) and (0,2); only (0,1) is minimal.
    pos = _pos(spark, [(1, "merge data data")])
    got = _ivset(unordered_intervals(pos, ["data", "merge"]))
    assert got == {(1, 0, 1)}


def test_single_term_source_is_occurrences(spark):
    pos = _pos(spark, [(1, "data scan data")])
    assert _ivset(term_intervals(pos, "data")) == {(1, 0, 0), (1, 2, 2)}
    assert _ivset(ordered_intervals(pos, ["data"])) == {
        (1, 0, 0),
        (1, 2, 2),
    }


def test_combinators(spark):
    # outer: ordered data..fast intervals; doc 1 interval (0,2) spans
    # join@1, doc 2 interval (0,1) does not contain join.
    rows = [(1, "data join fast"), (2, "data fast join")]
    pos = _pos(spark, rows)
    outer = ordered_intervals(pos, ["data", "fast"])
    inner = term_intervals(pos, "join")
    assert _ivset(intervals_containing(outer, inner)) == {(1, 0, 2)}
    assert _ivset(intervals_not_containing(outer, inner)) == {(2, 0, 1)}
    # not_contained_by: inner=unordered cover of the whole doc contains
    # every outer interval in doc 1 only.
    wide = unordered_intervals(pos, ["data", "join"])
    assert (1, 0, 1) in _ivset(wide)  # doc1 cover (0,1)
    got = _ivset(intervals_not_contained_by(outer, wide))
    # doc1 outer (0,2) is NOT inside (0,1); doc2 outer (0,1) is inside
    # doc2's data..join cover (0,2) → dropped.
    assert got == {(1, 0, 2)}
    # overlapping: join@1 overlaps doc1 (0,2); join@2 outside doc2 (0,1)
    assert _ivset(intervals_overlapping(outer, inner)) == {(1, 0, 2)}


def test_rank_orders_by_tf_then_doc_id(spark):
    rows = [
        (1, "data fast"),
        (2, "data fast scan data fast"),
        (3, "data fast"),
    ]
    pos = _pos(spark, rows)
    ranked = rank_intervals(
        ordered_intervals(pos, ["data", "fast"]), k=3
    ).collect()
    assert [(r["doc_id"], r["interval_tf"]) for r in ranked] == [
        (2, 2),
        (1, 1),
        (3, 1),
    ]


def test_search_intervals_end_to_end(spark):
    docs = _docs(
        spark,
        [
            (1, "data scan fast"),          # interval (0,2), no join
            (2, "data join fast"),          # interval spans join → dropped
            (3, "data zz zz zz zz zz zz zz zz zz fast"),  # too wide
        ],
    )
    got = search_intervals(
        docs, ["data", "fast"], max_gaps=8, not_containing="join"
    ).collect()
    assert [(r["doc_id"], r["interval_tf"]) for r in got] == [(1, 1)]


def test_ordered_doc_set_matches_proximity_at_same_budget(spark):
    """Existence equivalence: a doc has >= 1 ordered minimal interval of
    width-gaps <= g  iff  ordered SpanNear (proximity_match) with
    slop = g matches it — the interval source generalizes the span
    query's boolean semantics."""
    from search_engine_spark.sources.documents import load_documents

    from tests.conftest import SF_TEST

    pos = build_positional(load_documents(spark, SF_TEST)).cache()
    try:
        for g in (0, 2, 5):
            iv_docs = {
                r["doc_id"]
                for r in ordered_intervals(
                    pos, ["data", "fast"], max_gaps=g
                )
                .select("doc_id")
                .distinct()
                .collect()
            }
            prox_docs = {
                r["doc_id"]
                for r in proximity_match(
                    pos, ["data", "fast"], slop=g
                ).collect()
            }
            assert iv_docs == prox_docs, g
    finally:
        pos.unpersist()
