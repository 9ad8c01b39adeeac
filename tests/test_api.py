"""A2 API envelope parity — the reference's four endpoints as engine
methods: startIndexing / stopIndexing (async + cancel), indexPage
(single-url upsert), search/statistics envelopes are covered in
test_presentation.py."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from search_engine_spark import catalog
from search_engine_spark.engine import SearchEngine
from tests.conftest import SF_TEST


@pytest.fixture()
def eng(spark, tmp_path):
    return SearchEngine(
        spark, SF_TEST, index_dir=str(tmp_path / "api_idx"), n_buckets=8
    )


def test_start_stop_indexing_envelopes(eng):
    assert eng.stop_indexing() == {
        "result": False, "error": "Индексация не запущена"
    }
    assert eng.start_indexing(groups=8) == {"result": True}
    second = eng.start_indexing()
    done = eng.wait_indexing(timeout=0)
    if not done:
        # while running, a second start is rejected with the reference
        # string; stop cancels it
        assert second == {"result": False, "error": "Индексация уже запущена"}
        assert eng.stop_indexing() == {"result": True}
    assert eng.wait_indexing(timeout=300)
    assert eng.stop_indexing() == {
        "result": False, "error": "Индексация не запущена"
    }
    # whether it completed or was cancelled, the store must be resumable to
    # a complete index
    store = catalog.IndexStore(eng.spark, eng.index_dir, 8)
    catalog.build_persistent(eng.docs, store)
    opened = SearchEngine.open(eng.spark, eng.index_dir, docs=eng.docs)
    assert opened.search("data fast join", limit=3).count() == 3


def test_index_page_envelope(spark, tmp_path):
    eng = SearchEngine(
        spark, SF_TEST, index_dir=str(tmp_path / "page_idx"), n_buckets=8
    )
    eng.build_persistent()
    assert eng.index_page("https://other.example/docs/1") == {
        "result": False,
        "error": "Данная страница находится за пределами сайтов, "
                 "указанных в конфигурационном файле",
    }
    assert eng.index_page("https://site-b.example/docs/999999")["result"] is False

    url = [r["url"] for r in eng.docs.filter(F.col("doc_id") == 7)
           .select("url").collect()][0]
    before = eng.search("data fast join", limit=5).collect()
    assert eng.index_page(url) == {"result": True}
    after = eng.search("data fast join", limit=5).collect()
    assert before == after  # unchanged text → identical index state


def test_search_page_fuzzy_corrects_typo(eng):
    eng.build()
    strict = eng.search_page("dat fast")
    fuzzy = eng.search_page("dat fast", fuzzy=True)
    direct = eng.search_page("data fast")
    assert strict["count"] == 0  # the reference dead-end
    assert fuzzy["count"] == direct["count"] > 0
    assert fuzzy["data"] == direct["data"]


def test_search_page_collapse_one_per_site(eng):
    eng.build()
    page = eng.search_page("data fast join", collapse=True)
    sites = [d["site"] for d in page["data"]]
    assert page["count"] <= 3  # one per fixture site
    assert len(sites) == len(set(sites))


def test_percolate_conjunctive_containment(spark):
    from search_engine_spark.operators.search import percolate

    postings = spark.createDataFrame(
        [(1, "data", 2), (1, "fast", 1), (2, "data", 1), (3, "merge", 4)],
        "doc_id long, term string, tf long",
    )
    qs = [("both", ["data", "fast"]), ("solo", ["merge"]),
          ("never", ["data", "zzz"])]
    got = {
        (r["query_id"], r["doc_id"]) for r in percolate(postings, qs).collect()
    }
    # doc 2 has only 'data' → fails the conjunctive gate for 'both';
    # 'never' contains a corpus-absent term → matches nothing
    assert got == {("both", 1), ("solo", 3)}


def test_engine_search_recency_and_percolate(spark):
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.search import percolate
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    eng = SearchEngine(spark, docs=docs).build()

    plain = [r["doc_id"] for r in eng.search("data fast").collect()]
    fresh = eng.search("data fast", recency=True).collect()
    assert fresh and len(fresh) <= 20
    # same candidate universe: recency only reranks docs that match
    assert {r["doc_id"] for r in fresh} <= set(
        r["doc_id"] for r in eng.search("data fast", limit=50).collect()
    )
    assert plain  # sanity: the query matches

    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.search("data", mode="compat", recency=True)

    alerts = {tuple(r) for r in eng.percolate().collect()}
    want = {tuple(r) for r in percolate(ib.build_postings(docs)).collect()}
    assert alerts == want and alerts


def test_suggest_prefix_spell_and_none_routes(spark, tmp_path):
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST).filter("doc_id < 120")
    eng = SearchEngine(spark, docs=docs).build()

    pre = eng.suggest("fast da")
    assert pre["mode"] == "prefix"
    terms = [s["term"] for s in pre["suggestions"]]
    assert terms and all(t.startswith("da") for t in terms)
    dfs = [s["df"] for s in pre["suggestions"]]
    assert dfs == sorted(dfs, reverse=True)

    sp = eng.suggest("datq")  # distance-1 typo of 'data', no 'datq*' terms
    assert sp["mode"] == "spell"
    assert sp["suggestions"][0]["term"] == "data"
    assert sp["suggestions"][0]["df"] > 0

    assert eng.suggest("zzqj")["mode"] == "none"
    assert eng.suggest("   ")["suggestions"] == []


def test_search_page_cache_hit_and_rebuild_invalidation(spark, tmp_path):
    """The request cache returns an equal envelope without recomputing,
    callers cannot mutate cached state, and installing fresh engine state
    (rebuild / index_page via open()) empties the cache."""
    eng = SearchEngine(spark, SF_TEST, n_buckets=8)
    first = eng.search_page("data fast", limit=5)
    assert ("data fast", "bm25", None, 5, 0, False, False) in eng._page_cache
    again = eng.search_page("data fast", limit=5)
    assert again == first
    # mutating the returned envelope must not poison the cache
    again["data"].clear()
    assert eng.search_page("data fast", limit=5) == first
    # cache is keyed on the FULL request
    other = eng.search_page("data fast", limit=5, offset=5)
    assert other != first
    assert len(eng._page_cache) == 2
    # rebuild installs fresh state -> empty cache
    eng.build()
    assert len(eng._page_cache) == 0
    assert eng.search_page("data fast", limit=5) == first


def test_search_page_cache_is_bounded(spark):
    from search_engine_spark import engine as eng_mod

    eng = SearchEngine(spark, SF_TEST, n_buckets=8)
    eng.build()
    eng._page_cache.clear()
    for i in range(eng_mod.PAGE_CACHE_MAX + 10):
        eng._page_cache[("q", i)] = {"result": True, "count": 0, "data": []}
        while len(eng._page_cache) > eng_mod.PAGE_CACHE_MAX:
            eng._page_cache.popitem(last=False)
    assert len(eng._page_cache) == eng_mod.PAGE_CACHE_MAX
    # a real query still lands and evicts the oldest synthetic key
    eng.search_page("data", limit=3)
    assert len(eng._page_cache) == eng_mod.PAGE_CACHE_MAX
    # the real query evicted the oldest surviving synthetic key
    assert ("q", 11) in eng._page_cache and ("q", 10) not in eng._page_cache
