"""Block-path equivalence: the compressed-block scorer must reproduce the
relational DataFrame scorer (which itself is oracle-verified) exactly."""

import pytest

from tests.conftest import SF_TEST

from search_engine_spark.engine import SearchEngine
from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators import search as se
from search_engine_spark.sources.documents import load_documents

TERM_SETS = [
    ["data", "fast"],
    ["dup", "scan", "merge"],
    ["dup"],
    ["data", "fast", "join", "batch"],
]


@pytest.fixture(scope="module")
def engine(spark):
    return SearchEngine(spark, SF_TEST, n_buckets=8).build()


@pytest.fixture(scope="module")
def ctx(spark):
    docs = load_documents(spark, SF_TEST)
    postings = ib.build_postings(docs).cache()
    term_dict = ib.build_term_dict(postings).cache()
    doc_stats = ib.build_doc_stats(docs, postings).cache()
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    return docs, postings, term_dict, doc_stats, n_docs, avgdl


@pytest.mark.parametrize("terms", TERM_SETS, ids=["-".join(t) for t in TERM_SETS])
def test_bm25_block_equals_dataframe(engine, ctx, terms):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    want = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, terms, limit=50
    ).collect()
    got = engine.search(" ".join(terms), mode="bm25", limit=50).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


@pytest.mark.parametrize("terms", TERM_SETS[:2], ids=["-".join(t) for t in TERM_SETS[:2]])
def test_compat_block_equals_dataframe(engine, ctx, terms):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    want = se.search_compat(docs, postings, terms, limit=50).collect()
    got = engine.search(" ".join(terms), mode="compat", limit=50).collect()
    assert [(r["doc_id"], r["score_abs"], r["rel"]) for r in got] == [
        (r["doc_id"], r["score_abs"], r["rel"]) for r in want
    ]


def test_compat_site_filter(engine, ctx):
    docs, postings, *_ = ctx
    want = se.search_compat(docs, postings, ["data", "fast"], site_key="site-b").collect()
    got = engine.search("data fast", mode="compat", site_key="site-b").collect()
    assert [(r["doc_id"], r["score_abs"], r["rel"]) for r in got] == [
        (r["doc_id"], r["score_abs"], r["rel"]) for r in want
    ]


def test_pagination_consistency(engine):
    full = engine.search("data fast", limit=30).collect()
    p1 = engine.search("data fast", limit=10).collect()
    p2 = engine.search("data fast", limit=10, offset=10).collect()
    p3 = engine.search("data fast", limit=10, offset=20).collect()
    assert [r["doc_id"] for r in p1 + p2 + p3] == [r["doc_id"] for r in full]


def test_absent_and_empty(engine):
    assert engine.search("zebra data").count() == 0
    assert engine.search("the of a").count() == 0
    assert engine.search("").count() == 0


def test_statistics(engine):
    s = engine.statistics()
    assert s["result"] is True
    assert s["statistics"]["total"]["sites"] == 3
    assert s["statistics"]["total"]["pages"] == 500


def test_disjunctive_or_mode_blocks_vs_relational(spark):
    """engine.search(op='or') over compressed blocks == the relational
    disjunctive BM25 plan, including an absent term dropping out."""
    from pyspark.sql import functions as F

    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators import search as se
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    eng = SearchEngine(spark, docs=docs, n_buckets=8).build()
    got = [
        (r["doc_id"], r["score"])
        for r in eng.search("dup merge zzabsent", op="or", limit=15).collect()
    ]
    postings = ib.build_postings(docs)
    td = ib.build_term_dict(postings)
    ds = ib.build_doc_stats(docs, postings)
    n_docs, avgdl = ib.corpus_stats(docs, ds)
    want = [
        (r["doc_id"], r["score"])
        for r in se.search_bm25(
            postings, td, ds, n_docs, avgdl,
            ["dup", "merge", "zzabsent"], conjunctive=False, limit=15,
        ).collect()
    ]
    assert got == want and len(got) == 15
    # OR hits ⊇ AND hits; absent term empties AND but not OR
    assert eng.search("dup merge zzabsent", limit=15).count() == 0


def test_fused_build_equals_rowwise_build(spark):
    """The fused pack/merge pipeline must produce bit-identical blocks and
    norms to the row-per-posting formulation."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators import fused_build as fb
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.blocks import build_posting_blocks
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    packed = fb.pack_documents(docs, 8)
    fused = {
        tuple(r) for r in fb.blocks_from_packed(packed).collect()
    }
    rowwise = {
        tuple(r)
        for r in build_posting_blocks(ib.build_postings(docs), 8).collect()
    }
    assert fused == rowwise

    ds_fused = {
        (r["doc_id"], r["dl"])
        for r in fb.doc_stats_from_packed(packed).collect()
    }
    ds_rel = {
        (r["doc_id"], r["dl"])
        for r in ib.build_doc_stats(docs).filter(F.col("dl") > 0).collect()
    }
    assert ds_fused == ds_rel
