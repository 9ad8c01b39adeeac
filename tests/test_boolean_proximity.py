"""Boolean AND/NOT search + ordered-window proximity semantics."""

from __future__ import annotations

import pytest

from search_engine_spark.operators.index_build import build_postings
from search_engine_spark.operators.positional import (
    build_positional,
    phrase_match,
    proximity_match,
    search_proximity,
)
from search_engine_spark.operators.search import (
    parse_boolean_query,
    search_boolean,
)
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, f"https://ex.com/{i}", t) for i, t in enumerate(rows)],
        "doc_id long, url string, text string",
    )


# ----------------------------------------------------------------- boolean


def test_parse_boolean_query():
    must, must_not = parse_boolean_query("data fast -merge -scan")
    assert must == ["data", "fast"]
    assert must_not == ["merge", "scan"]


def test_parse_boolean_stopword_vanishes():
    must, must_not = parse_boolean_query("the data -the")
    assert must == ["data"] and must_not == []


def test_boolean_not_excludes(spark):
    docs = _docs(
        spark,
        [
            "data fast merge",   # excluded by -merge
            "data fast clean",   # kept
            "data slow",         # fails AND
        ],
    )
    rows = search_boolean(
        build_postings(docs), ["data", "fast"], ["merge"]
    ).collect()
    assert [r.doc_id for r in rows] == [1]


def test_boolean_empty_not_is_plain_and(spark):
    docs = _docs(spark, ["data fast", "data fast data"])
    rows = search_boolean(build_postings(docs), ["data", "fast"], []).collect()
    # Σtf ranking: doc 1 has score 3, doc 0 score 2
    assert [(r.doc_id, r.score_abs) for r in rows] == [(1, 3), (0, 2)]


# --------------------------------------------------------------- proximity


def test_slop0_equals_phrase(spark):
    docs = load_documents(spark, SF_TEST).limit(200)
    pos = build_positional(docs).cache()
    terms = ["fast", "table"]
    a = sorted(map(tuple, phrase_match(pos, terms).collect()))
    b = sorted(map(tuple, proximity_match(pos, terms, slop=0).collect()))
    assert a == b
    pos.unpersist()


def test_slop_widens_matches(spark):
    docs = _docs(
        spark,
        [
            "fast table",          # slop 0 hit
            "fast red table",      # needs slop ≥ 1 ("red" occupies a pos)
            "fast red red table",  # needs slop ≥ 2
            "table fast",          # wrong order: never matches
        ],
    )
    def ids(slop):
        return sorted(
            r.doc_id
            for r in search_proximity(docs, "fast table", slop=slop).collect()
        )

    assert ids(0) == [0]
    assert ids(1) == [0, 1]
    assert ids(2) == [0, 1, 2]
    assert ids(50) == [0, 1, 2]  # order still required


def test_proximity_counts_anchors(spark):
    docs = _docs(spark, ["fast table x fast red table"])
    rows = search_proximity(docs, "fast table", slop=1).collect()
    assert [(r.doc_id, r.prox_tf) for r in rows] == [(0, 2)]


def test_proximity_empty_phrase(spark):
    docs = _docs(spark, ["fast table"])
    assert search_proximity(docs, "the a", slop=1).collect() == []


# -------------------------------------------------- nested boolean grammar


def test_parse_query_tree_shapes():
    from search_engine_spark.operators.search import parse_query_tree as p

    assert p("data") == ("term", "data")
    assert p("data fast") == ("and", [("term", "data"), ("term", "fast")])
    assert p("data AND fast") == p("data fast")
    assert p("data OR fast") == ("or", [("term", "data"), ("term", "fast")])
    assert p("NOT data") == ("not", ("term", "data"))
    t = p("(data OR dup) AND NOT (slow scan)")
    assert t == (
        "and",
        [
            ("or", [("term", "data"), ("term", "dup")]),
            ("not", ("and", [("term", "slow"), ("term", "scan")])),
        ],
    )
    # analyzer-dropped words vanish; all-stopword query parses to None
    assert p("the a") is None
    assert p("the data") == ("term", "data")
    import pytest as _pt

    with _pt.raises(ValueError):
        p("(data OR fast")
    with _pt.raises(ValueError):
        p("data) OR fast")


def test_query_string_set_semantics(spark):
    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.search import search_query_string

    rows = [
        (1, "data fast"),
        (2, "data slow"),
        (3, "dup fast slow"),
        (4, "fast"),
        (5, "data dup"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    postings = build_postings(docs)

    def ids(q):
        return sorted(
            r["doc_id"]
            for r in search_query_string(docs, postings, q, limit=100).collect()
        )

    assert ids("data OR dup") == [1, 2, 3, 5]
    assert ids("(data OR dup) AND fast") == [1, 3]
    assert ids("(data OR dup) AND NOT slow") == [1, 5]
    assert ids("NOT (data OR dup OR fast)") == []
    assert ids("fast AND NOT (data OR dup)") == [4]
    # top-level NOT = complement against the docs universe
    assert ids("NOT slow") == [1, 4, 5]


def test_query_string_flat_equals_search_boolean(spark):
    """For a flat AND/NOT query the nested evaluator must agree with the
    +/- parser's search_boolean."""
    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.search import (
        search_boolean,
        search_query_string,
    )
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    postings = build_postings(docs)
    nested = search_query_string(
        docs, postings, "data AND fast AND NOT slow", limit=100
    ).collect()
    flat = search_boolean(postings, ["data", "fast"], ["slow"], limit=100) \
        .collect()
    assert [(r["doc_id"], r["score_abs"]) for r in nested] == [
        (r["doc_id"], r["score_abs"]) for r in flat
    ]


def test_parse_query_tree_roundtrip_property():
    """Render arbitrary ASTs with explicit parens → parse → identical
    AST (hypothesis; pure Python, no Spark)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from search_engine_spark.operators.search import parse_query_tree
    from search_engine_spark.textproc.tokenize import tokenize

    words = [w for w in ["data", "fast", "slow", "dup", "scan", "merge"]
             if tokenize(w) == [w]]
    assert len(words) >= 3

    leaf = st.sampled_from(words).map(lambda w: ("term", w))

    def extend(children):
        return st.one_of(
            st.tuples(st.just("and"), st.lists(children, min_size=2, max_size=3))
            .map(tuple),
            st.tuples(st.just("or"), st.lists(children, min_size=2, max_size=3))
            .map(tuple),
            children.map(lambda c: ("not", c)),
        )

    trees = st.recursive(leaf, extend, max_leaves=6)

    def render(node):
        kind = node[0]
        if kind == "term":
            return node[1]
        if kind == "not":
            return f"NOT ({render(node[1])})"
        op = " AND " if kind == "and" else " OR "
        return op.join(f"({render(c)})" for c in node[1])

    @settings(max_examples=200, deadline=None)
    @given(t=trees)
    def check(t):
        assert parse_query_tree(render(t)) == t

    check()
