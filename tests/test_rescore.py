"""ES rescore semantics (operators/scoring_boosts.py::search_rescore).

Pins the two properties that make rescore rescore: (1) only the
first-pass top-window is eligible — a perfect second-query match
outside the window can never enter; (2) within the window the combined
score query_weight*bm25 + rescore_weight*phrase_tf re-orders hits, and
window docs without the phrase keep query_weight*bm25.
"""

from __future__ import annotations

import pandas as pd

from search_engine_spark.operators.index_build import (
    build_doc_stats,
    build_postings,
    build_term_dict,
    corpus_stats,
)
from search_engine_spark.operators.positional import build_positional
from search_engine_spark.operators.scoring_boosts import search_rescore


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def _ctx(spark, rows):
    docs = _docs(spark, rows)
    postings = build_postings(docs)
    term_dict = build_term_dict(postings)
    doc_stats = build_doc_stats(docs, postings)
    n_docs, avgdl = corpus_stats(docs, doc_stats)
    return docs, postings, term_dict, doc_stats, n_docs, avgdl


def test_rescore_reorders_within_window(spark):
    # doc 1: strong bm25 (data x3) but no phrase; doc 2: weaker bm25,
    # contains the exact phrase "fast table" -> phrase boost wins.
    rows = [
        (1, "data data data scan"),
        (2, "data fast table scan"),
        (3, "scan merge scan merge"),  # no query term: not in first pass
    ]
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _ctx(spark, rows)
    got = search_rescore(
        postings, term_dict, doc_stats, n_docs, avgdl,
        build_positional(docs), ["data"], ["fast", "table"],
        window_size=10, rescore_weight=100.0, k=10,
    ).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 2  # phrase match dominates
    assert set(ids) == {1, 2}  # doc 3 never enters (no first-pass score)


def test_rescore_window_excludes_low_ranked_phrase_match(spark):
    # 4 docs match 'data'; doc 4 has the LOWEST bm25 (longest doc,
    # tf=1) but the only phrase occurrence. window_size=3 excludes it,
    # so the boost cannot apply; widening the window admits it.
    rows = [
        (1, "data data data"),
        (2, "data data scan"),
        (3, "data data merge"),
        (4, "data fast table scan merge scan merge scan merge scan"),
    ]
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _ctx(spark, rows)
    args = (postings, term_dict, doc_stats, n_docs, avgdl,
            build_positional(docs), ["data"], ["fast", "table"])
    narrow = search_rescore(
        *args, window_size=3, rescore_weight=100.0, k=3
    ).collect()
    assert [r["doc_id"] for r in narrow] == [1, 2, 3]
    wide = search_rescore(
        *args, window_size=4, rescore_weight=100.0, k=3
    ).collect()
    assert [r["doc_id"] for r in wide][0] == 4


def test_rescore_without_phrase_keeps_weighted_bm25_order(spark):
    rows = [
        (1, "data data scan"),
        (2, "data scan scan"),
    ]
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _ctx(spark, rows)
    got = search_rescore(
        postings, term_dict, doc_stats, n_docs, avgdl,
        build_positional(docs), ["data"], ["fast", "table"],
        query_weight=3.0, k=5,
    ).collect()
    # nobody matches the phrase: order is pure bm25, scores scaled 3x
    assert [r["doc_id"] for r in got] == [1, 2]
    assert got[0]["score"] > got[1]["score"] > 0
