"""minimum_should_match, hybrid RRF fusion, date-histogram pipeline aggs,
and _rank_eval ranking metrics — invariants the oracle pairing can't state:
msm's endpoints coincide with AND/OR, RRF arithmetic from first principles,
the pipeline's telescoping-delta identity, and NDCG/MRR/P@k recomputed in
pure Python from the same postings."""

import math

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators import search as se
from search_engine_spark.operators.evaluation import (
    GRADE_CAP,
    qrels_from_tf,
    rank_eval,
)
from search_engine_spark.sources.documents import load_embeddings

from tests.conftest import SF_TEST

import __spark_entry__ as entrymod

Q3 = ["dup", "data", "fast"]


@pytest.fixture(scope="module")
def ctx(spark):
    return entrymod._bm25_ctx(spark, SF_TEST)


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# --------------------------------------------------- minimum_should_match

def test_msm_1_equals_disjunctive(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    msm = se.search_bm25_msm(
        postings, td, ds, n, avgdl, Q3, min_should_match=1, limit=50
    )
    disj = se.search_bm25(
        postings, td, ds, n, avgdl, Q3, limit=50, conjunctive=False
    )
    assert _rows(msm) == _rows(disj)


def test_msm_n_equals_conjunctive(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    msm = se.search_bm25_msm(
        postings, td, ds, n, avgdl, Q3, min_should_match=len(Q3), limit=50
    )
    conj = se.search_bm25(postings, td, ds, n, avgdl, Q3, limit=50)
    assert _rows(msm) == _rows(conj)


def test_msm_counts_are_monotone_and_exposed(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    rows = se.search_bm25_msm(
        postings, td, ds, n, avgdl, Q3, min_should_match=2, limit=200
    ).collect()
    assert rows, "fixture should have 2-of-3 matches"
    assert all(2 <= r["n_matched"] <= len(Q3) for r in rows)
    # strictly more hits than the full AND (the fixture has partial matches)
    n_and = se.search_bm25(
        postings, td, ds, n, avgdl, Q3, limit=500
    ).count()
    assert len(rows) > n_and


def test_msm_absent_terms_still_raise_the_bar(spark, ctx):
    """ES semantics: msm counts against the ORIGINAL query terms, so a
    2-term query with one corpus-absent term and msm=2 is empty."""
    docs, postings, td, ds, n, avgdl = ctx
    out = se.search_bm25_msm(
        postings, td, ds, n, avgdl, ["data", "zzabsent"],
        min_should_match=2, limit=50,
    )
    assert out.count() == 0


# ---------------------------------------------------------- ranked_topk

def test_ranked_topk_order_and_ties(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    top = se.search_bm25(
        postings, td, ds, n, avgdl, Q3, limit=10, conjunctive=False
    )
    ranked = {
        r["doc_id"]: r["rank"]
        for r in se.ranked_topk(top, "score").collect()
    }
    expected = {row[0]: i + 1 for i, row in enumerate(_rows(top))}
    assert ranked == expected
    plan = se.ranked_topk(top, "score")._jdf.queryExecution().executedPlan()
    assert "Window" not in plan.toString()


# ----------------------------------------------------------- hybrid RRF

def test_hybrid_rrf_arithmetic(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    emb = load_embeddings(spark, SF_TEST)
    k_each, rrf_k = 20, 60
    fused = se.search_hybrid_rrf(
        postings, td, ds, n, avgdl, Q3, emb, query_vec_id=0,
        k_each=k_each, rrf_k=rrf_k, limit=2 * k_each,
    ).collect()
    assert fused, "fusion should produce rows"
    for r in fused:
        want = 0.0
        if r["lex_rank"] > 0:
            want += 1.0 / (rrf_k + r["lex_rank"])
        if r["vec_rank"] > 0:
            want += 1.0 / (rrf_k + r["vec_rank"])
        assert r["rrf"] == pytest.approx(round(want, 6), abs=1e-9)
        assert r["lex_rank"] > 0 or r["vec_rank"] > 0
    # fused set = union of the two top-k sets, sorted by rrf desc, id asc
    keys = [(r["rrf"], r["doc_id"]) for r in fused]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    lex_in = sum(1 for r in fused if r["lex_rank"] > 0)
    vec_in = sum(1 for r in fused if r["vec_rank"] > 0)
    assert vec_in == k_each
    assert lex_in <= k_each
    # a doc ranked by BOTH retrievers must outscore one ranked only k-th
    # by a single retriever at the same ranks — basic RRF dominance
    both = [r for r in fused if r["lex_rank"] > 0 and r["vec_rank"] > 0]
    only = [r for r in fused if r["lex_rank"] == 0 or r["vec_rank"] == 0]
    if both and only:
        assert max(r["rrf"] for r in both) > min(r["rrf"] for r in only)


# ----------------------------------------------- date-histogram pipeline

def test_datehist_pipeline_identities(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    out = se.datehist_pipeline(
        docs, postings, ["data", "fast"], bucket_secs=3600, window=3
    ).orderBy("bucket_epoch").collect()
    assert out, "fixture spans multiple hourly buckets"
    hist = {
        r["bucket_epoch"]: r["n_hits"]
        for r in se.facet_date_histogram(
            docs, postings, ["data", "fast"], 3600
        ).collect()
    }
    assert {r["bucket_epoch"]: r["n_hits"] for r in out} == hist
    # telescoping: Σ delta over buckets-in-order = last bucket's n_hits
    assert sum(r["delta"] for r in out) == out[-1]["n_hits"]
    assert out[0]["delta"] == out[0]["n_hits"]  # first diffs against 0
    # moving average recomputed from the emitted n_hits
    hs = [r["n_hits"] for r in out]
    for i, r in enumerate(out):
        window = hs[max(0, i - 2): i + 1]
        assert r["mov_avg"] == pytest.approx(
            round(sum(window) / len(window), 4), abs=1e-9
        )


def test_datehist_pipeline_window_1_is_identity(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    out = se.datehist_pipeline(
        docs, postings, ["data", "fast"], bucket_secs=3600, window=1
    ).collect()
    assert all(r["mov_avg"] == pytest.approx(float(r["n_hits"])) for r in out)


# -------------------------------------------------------------- rank_eval

def _py_metrics(ranking, grades, k, thr):
    """First-principles NDCG@k / MRR / P@k (the pinned spec)."""
    got = [grades.get(d, 0) for d in ranking[:k]]
    dcg = sum((2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(got))
    ideal = sorted(grades.values(), reverse=True)[:k]
    idcg = sum((2 ** g - 1) / math.log2(i + 2) for i, g in enumerate(ideal))
    ndcg = dcg / idcg if idcg > 0 else 0.0
    mrr = 0.0
    for i, g in enumerate(got):
        if g >= thr:
            mrr = 1.0 / (i + 1)
            break
    p = sum(1 for g in got if g >= thr) / k
    return round(ndcg, 4), round(mrr, 4), round(p, 4)


def test_rank_eval_matches_pure_python(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    terms = ["data", "fast", "join"]
    k, thr = 10, 2
    grades = {
        r["doc_id"]: r["grade"]
        for r in qrels_from_tf(postings, terms).collect()
    }
    assert all(0 < g <= GRADE_CAP for g in grades.values())
    ranking = [
        r["doc_id"]
        for r in se.search_bm25(
            postings, td, ds, n, avgdl, terms, limit=k, conjunctive=False
        ).collect()
    ]
    want = _py_metrics(ranking, grades, k, thr)
    row = rank_eval(
        postings, td, ds, n, avgdl, terms, k=k, rel_threshold=thr
    ).collect()[0]
    got = (row["ndcg_at_k"], row["mrr"], row["precision_at_k"])
    assert got == pytest.approx(want, abs=2e-4)
    # informative, not tautological: BM25 vs tf-grades is imperfect but good
    assert 0.0 < row["ndcg_at_k"] <= 1.0
    assert 0.0 < row["mrr"] <= 1.0


def test_rank_eval_perfect_ranking_scores_one(spark, ctx):
    """Feeding the qrels' own ideal order through the metric → NDCG=1,
    MRR=1 (the fixture's top grade clears the threshold), P@k = graded
    share — the classic sanity anchor for any NDCG implementation."""
    docs, postings, td, ds, n, avgdl = ctx
    terms = ["data", "fast", "join"]
    grades = {
        r["doc_id"]: r["grade"]
        for r in qrels_from_tf(postings, terms).collect()
    }
    k = 10
    ideal = sorted(grades.items(), key=lambda t: (-t[1], t[0]))[:k]
    ndcg, mrr, p = _py_metrics([d for d, _ in ideal], grades, k, 2)
    assert ndcg == 1.0
    assert mrr == 1.0


def test_rank_eval_absent_terms_empty_metrics(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    row = rank_eval(
        postings, td, ds, n, avgdl, ["zzabsent"], k=10
    ).collect()[0]
    assert (row["ndcg_at_k"], row["mrr"], row["precision_at_k"]) == (
        0.0, 0.0, 0.0,
    )


# --------------------------------------------------- semantic rerank

def test_rerank_candidates_come_from_bm25(spark, ctx):
    """Every reranked doc must be inside the disjunctive BM25
    top-`candidates` set — the reranker never resurrects a doc the
    retriever dropped."""
    docs, postings, td, ds, n, avgdl = ctx
    emb = load_embeddings(spark, SF_TEST)
    rr = se.search_semantic_rerank(
        postings, td, ds, n, avgdl, Q3, emb, query_vec_id=0,
        candidates=30, limit=10,
    ).toPandas()
    lex = se.search_bm25(
        postings, td, ds, n, avgdl, Q3, limit=30, conjunctive=False
    ).toPandas()
    assert set(rr.doc_id) <= set(lex.doc_id)
    assert len(rr) == min(10, len(lex))


def test_rerank_order_is_cosine(spark, ctx):
    """Final ranking follows cos desc (doc_id asc ties), NOT bm25 —
    and ranks are dense 1..k."""
    docs, postings, td, ds, n, avgdl = ctx
    emb = load_embeddings(spark, SF_TEST)
    rr = se.search_semantic_rerank(
        postings, td, ds, n, avgdl, Q3, emb, query_vec_id=0,
        candidates=30, limit=10,
    ).toPandas().sort_values("rank")
    assert list(rr["rank"]) == list(range(1, len(rr) + 1))
    keys = list(zip(-rr.cos, rr.doc_id))
    assert keys == sorted(keys)


def test_rerank_scores_match_standalone_rankers(spark, ctx):
    """bm25 column equals the retriever's score; cos equals the exact
    cosine the brute-force ANN reports for the same (query, doc) pair."""
    from search_engine_spark.operators.similarity import ann_bruteforce

    docs, postings, td, ds, n, avgdl = ctx
    emb = load_embeddings(spark, SF_TEST)
    rr = se.search_semantic_rerank(
        postings, td, ds, n, avgdl, Q3, emb, query_vec_id=0,
        candidates=30, limit=10,
    ).toPandas()
    lex = se.search_bm25(
        postings, td, ds, n, avgdl, Q3, limit=30, conjunctive=False
    ).toPandas().set_index("doc_id")
    bf = ann_bruteforce(emb, [0], k=600).toPandas()
    exact = {int(r.vec_id): float(r.cos) for r in bf.itertuples()}
    for r in rr.itertuples():
        assert float(r.bm25) == float(lex.loc[int(r.doc_id), "score"])
        if int(r.doc_id) != 0:  # self pair excluded by bruteforce
            assert float(r.cos) == exact[int(r.doc_id)]
