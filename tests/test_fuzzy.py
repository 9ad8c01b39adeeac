"""search_fuzzy: query-time spell correction semantics on the fixture."""

import pytest

from search_engine_spark.operators import search as se

from tests.conftest import SF_TEST

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def ctx(spark):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, SF_TEST
    )
    return postings, term_dict, doc_stats, n_docs, avgdl


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def test_fuzzy_corrects_typo_to_known_term(spark, ctx):
    postings, td, ds, n, avgdl = ctx
    fuzzy = se.search_fuzzy(postings, td, ds, n, avgdl, ["dat", "fast"])
    direct = se.search_bm25(postings, td, ds, n, avgdl, ["data", "fast"])
    assert _rows(fuzzy) == _rows(direct)


def test_fuzzy_known_terms_not_touched(spark, ctx):
    postings, td, ds, n, avgdl = ctx
    fuzzy = se.search_fuzzy(postings, td, ds, n, avgdl, ["data", "fast"])
    direct = se.search_bm25(postings, td, ds, n, avgdl, ["data", "fast"])
    assert _rows(fuzzy) == _rows(direct)


def test_fuzzy_unresolvable_term_drops_out(spark, ctx):
    postings, td, ds, n, avgdl = ctx
    # 'zzzzqqqq' has no distance-1 neighbor: conjunctive bm25 would empty,
    # fuzzy degrades gracefully to the resolvable terms
    fuzzy = se.search_fuzzy(
        postings, td, ds, n, avgdl, ["zzzzqqqq", "data", "fast"]
    )
    direct = se.search_bm25(postings, td, ds, n, avgdl, ["data", "fast"])
    strict = se.search_bm25(
        postings, td, ds, n, avgdl, ["zzzzqqqq", "data", "fast"]
    )
    assert _rows(fuzzy) == _rows(direct)
    assert strict.count() == 0


def test_fuzzy_all_unresolvable_is_empty(spark, ctx):
    postings, td, ds, n, avgdl = ctx
    out = se.search_fuzzy(postings, td, ds, n, avgdl, ["zzzzqqqq"])
    assert out.count() == 0
    assert out.columns == ["doc_id", "score"]


def test_bm25_batch_equals_per_query_runs(spark, ctx):
    postings, td, ds, n, avgdl = ctx
    queries = {
        "a": ["data", "fast"],
        "b": ["dup", "data", "fast"],
        "dead": ["data", "zzabsent"],
    }
    batch = se.search_bm25_batch(spark, postings, td, ds, n, avgdl, queries)
    got = {
        qid: [
            (r["doc_id"], r["score"])
            for r in batch.filter(f"query_id = '{qid}'")
            .orderBy("score", ascending=False)
            .orderBy(batch["score"].desc(), batch["doc_id"].asc())
            .collect()
        ]
        for qid in queries
    }
    for qid, terms in queries.items():
        single = _rows(se.search_bm25(postings, td, ds, n, avgdl, terms))
        assert got[qid] == single, qid
    assert got["dead"] == []
