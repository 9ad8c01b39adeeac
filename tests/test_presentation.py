"""Presentation stage (Q7/Q8 on Spark) + the REST search envelope (A2)."""

from __future__ import annotations

import pytest

from search_engine_spark.engine import SearchEngine

from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def engine(spark):
    return SearchEngine(spark, SF_TEST, n_buckets=8).build()


def test_search_results_columns_and_highlight(engine):
    rows = engine.search_results("data fast", mode="compat", limit=5).collect()
    assert 0 < len(rows) <= 5
    cols = set(rows[0].asDict())
    assert cols == {
        "doc_id", "site", "site_name", "uri", "title", "snippet", "relevance"
    }
    # relevance ordering is preserved after presentation join
    rels = [r["relevance"] for r in rows]
    assert rels == sorted(rels, reverse=True)
    assert rels[0] == 1.0  # compat mode: top hit normalizes to 1.0
    for r in rows:
        assert r["title"] == f"Doc {r['doc_id']}"
        assert r["uri"] == f"/docs/{r['doc_id']}"
        # every hit contains both conjunctive terms highlighted
        assert "<b>data</b>" in r["snippet"] or "<b>data " in r["snippet"]
        assert "fast" in r["snippet"]


def test_search_page_envelope(engine):
    page = engine.search_page("data fast", mode="compat", limit=3, offset=1)
    assert page["result"] is True
    assert page["count"] > 3  # pre-pagination total
    assert len(page["data"]) == 3
    d = page["data"][0]
    assert set(d) == {"site", "siteName", "uri", "title", "snippet", "relevance"}
    # offset=1 skips the rel=1.0 top hit
    assert d["relevance"] <= 1.0


def test_search_page_empty_query(engine):
    page = engine.search_page("the of and")
    assert page["result"] is False
    assert page["data"] == []


def test_search_page_absent_term(engine):
    page = engine.search_page("zzzmissing data")
    assert page["result"] is True
    assert page["count"] == 0
    assert page["data"] == []
