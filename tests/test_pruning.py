"""Unit tests for operators/pruning.py — static index pruning."""

from search_engine_spark.operators.pruning import prune_postings


def _postings(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, term string, tf long")


def test_keeps_top_n_by_tf_then_doc_id(spark):
    rows = [(d, "t", tf) for d, tf in [(1, 5), (2, 9), (3, 5), (4, 1), (5, 9)]]
    got = sorted(
        (r["doc_id"], r["tf"])
        for r in prune_postings(_postings(spark, rows), keep=3).collect()
    )
    # tf desc, doc_id asc: (2,9), (5,9), (1,5)
    assert got == [(1, 5), (2, 9), (5, 9)]


def test_small_terms_pass_through(spark):
    rows = [(1, "a", 2), (2, "a", 3), (1, "b", 1)]
    got = prune_postings(_postings(spark, rows), keep=10).collect()
    assert sorted((r["doc_id"], r["term"], r["tf"]) for r in got) == sorted(
        rows
    )


def test_two_phase_equals_global_spec(spark):
    """Cross-bucket merge must equal the single-window spec even when the
    per-bucket partials disagree with the global order."""
    rows = [(d, "t", (d * 7) % 13 + 1) for d in range(60)]
    got = {
        (r["doc_id"], r["tf"])
        for r in prune_postings(
            _postings(spark, rows), keep=5, n_buckets=4
        ).collect()
    }
    want = set(
        sorted(((d, tf) for d, _, tf in rows), key=lambda x: (-x[1], x[0]))[:5]
    )
    assert got == want


def test_pruned_single_term_topk_exact_when_impact_ordered(spark):
    """With b=0 a single-term BM25 score is monotone in tf, and the
    scorer's tiebreak (score desc, doc_id asc) equals the pruning order
    (tf desc, doc_id asc) — so for k ≤ keep the pruned index's top-k is
    EXACTLY the full index's top-k. This is the guarantee a tiered
    serving stack relies on for impact-ordered tier-1 queries."""
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators import search as se
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    postings = ib.build_postings(docs)
    term_dict = ib.build_term_dict(postings)
    doc_stats = ib.build_doc_stats(docs, postings)
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    pruned = prune_postings(postings, keep=50)
    for term in ["data", "fast"]:
        full = se.search_bm25(
            postings, term_dict, doc_stats, n_docs, avgdl, [term],
            b=0.0, limit=10,
        ).collect()
        approx = se.search_bm25(
            pruned, term_dict, doc_stats, n_docs, avgdl, [term],
            b=0.0, limit=10,
        ).collect()
        assert [tuple(r) for r in approx] == [tuple(r) for r in full]
