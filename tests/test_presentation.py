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


def test_titles_series_matches_scalar_extractor():
    """The vectorized corpus-wide title path must equal extract_title
    byte-for-byte, including edge cases (no title, entities, commented-out
    title, attributes, multiline, bad utf-8)."""
    import pandas as pd

    from search_engine_spark.operators.presentation import titles_series
    from search_engine_spark.textproc.extract import extract_title

    cases = [
        b"<html><head><title>Doc 1</title></head><body>x</body></html>",
        b"<html><head></head><body>no title</body></html>",
        b"<html><title>A &amp; B &lt;C&gt;</title></html>",
        b"<html><!-- <title>ghost</title> --><title>real</title></html>",
        b"<html><title lang='en'>  spaced \t out  </title></html>",
        b"<html><title>line\nbreak</title></html>",
        b"<html><title>broken \xff utf8</title></html>",
        # cascaded entities: '&amp;lt;' must fully resolve to '<' (the
        # scalar extractor replaces sequentially, &amp; first — a
        # single-pass alternation stops at '&lt;')
        b"<html><title>A &amp;lt; B &amp;amp; C</title></html>",
        b"",
    ]
    got = list(titles_series(pd.Series(cases)))
    want = [extract_title(h) for h in cases]
    assert got == want


def test_search_results_content_golden_oracle_scale(spark):
    """VERDICT r01 #8: the one rows-only driver check (search_results)
    backed by CONTENT assertions at oracle scale — the presented top-10 for
    the contract query at sf0.01 must match the committed golden exactly
    (doc ids, titles, snippets incl. <b> highlights and the <details>
    spoiler, relevances)."""
    import json
    import os

    from search_engine_spark.engine import SearchEngine

    sf = "/root/testdata/sf0.01"
    if not os.path.exists(f"{sf}/documents.parquet"):
        import pytest

        pytest.skip("sf0.01 testdata not present")
    eng = SearchEngine(spark, sf).build()
    rows = eng.search_results("data fast", mode="compat", limit=10).collect()
    got = [
        {
            k: r[k]
            for k in (
                "doc_id", "site", "site_name", "uri", "title", "snippet",
                "relevance",
            )
        }
        for r in rows
    ]
    with open(
        os.path.join(os.path.dirname(__file__),
                     "golden_search_results_sf001.json")
    ) as f:
        want = json.load(f)
    assert got == want
