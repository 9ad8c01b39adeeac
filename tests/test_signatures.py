"""Unit tests for operators/signatures.py — signature-file gating."""

from pyspark.sql import functions as F

from search_engine_spark.operators.signatures import (
    SIG_BITS,
    doc_signatures,
    query_mask,
    signature_candidates,
    term_bit,
)


def test_soundness_no_false_negatives(spark):
    """Every true conjunctive match passes the signature gate (sound
    superset), on the real fixture postings."""
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.sources.documents import load_documents

    postings = ib.build_postings(
        load_documents(spark, "/root/testdata/sf0.001")
    )
    terms = ["data", "fast", "join"]
    sigs = doc_signatures(postings)
    gated = {r["doc_id"] for r in signature_candidates(sigs, terms).collect()}
    n = len(set(terms))
    true_matches = {
        r["doc_id"]
        for r in postings.filter(F.col("term").isin(terms))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == n)
        .collect()
    }
    assert true_matches and true_matches <= gated
    # the gate actually prunes: candidates ≪ corpus
    assert len(gated) < postings.select("doc_id").distinct().count()


def test_mask_matches_column_bits(spark):
    postings = spark.createDataFrame(
        [(1, "alpha", 1), (1, "beta", 1)], "doc_id long, term string, tf long"
    )
    (row,) = doc_signatures(postings).collect()
    want = (1 << term_bit("alpha")) | (1 << term_bit("beta"))
    assert row["sig"] == want
    assert query_mask(["alpha", "beta", "beta"]) == want
    assert 0 <= term_bit("alpha") < SIG_BITS


def test_gate_rejects_missing_term(spark):
    postings = spark.createDataFrame(
        [(1, "alpha", 1), (2, "alpha", 1), (2, "beta", 1)],
        "doc_id long, term string, tf long",
    )
    sigs = doc_signatures(postings)
    got = {
        r["doc_id"]
        for r in signature_candidates(sigs, ["alpha", "beta"]).collect()
    }
    assert 2 in got
    # doc 1 passes only if alpha/beta collide on one bit (they don't)
    assert term_bit("alpha") != term_bit("beta")
    assert got == {2}
