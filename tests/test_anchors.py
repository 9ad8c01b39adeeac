"""Unit tests for operators/anchors.py — anchor-text harvest + BM25F.

Oracle parity at fixture scale is covered by test_oracle_parity.py
(anchor_terms / search_bm25f); these pin the semantics on crafted inputs
with hand-derivable expectations.
"""

from pyspark.sql import functions as F

from search_engine_spark.operators.anchors import (
    ANCHOR_WORDS,
    B_ANCHOR,
    B_BODY,
    K1_DEFAULT,
    W_ANCHOR,
    W_BODY,
    anchor_postings,
    anchored_html,
    harvest_anchors,
    search_bm25f,
)
from search_engine_spark.operators.search import bm25_idf


def _docs(spark, n=6):
    from search_engine_spark.sources.documents import load_documents

    return load_documents(spark, "/root/testdata/sf0.001").filter(
        f"doc_id < {n}"
    )


def test_harvest_resolves_and_drops_self_and_dangling(spark):
    got = {
        (r["src_doc"], r["dst_doc"])
        for r in harvest_anchors(anchored_html(_docs(spark, n=4))).collect()
    }
    # doc v anchors v+1 and v//2; 0→0 self dropped; 3→4 dangles (no doc 4)
    assert got == {(0, 1), (1, 2), (1, 0), (2, 3), (2, 1), (3, 1)}


def test_anchor_text_from_frozen_vocab(spark):
    rows = harvest_anchors(anchored_html(_docs(spark, n=4))).collect()
    n = len(ANCHOR_WORDS)
    for r in rows:
        want = (
            f"{ANCHOR_WORDS[r['dst_doc'] % n]} {ANCHOR_WORDS[r['src_doc'] % n]}"
        )
        assert r["anchor_text"] == want


def test_anchor_postings_aggregate_inbound(spark):
    """doc 1 has three inbound anchors (from 0, 2, 3); each contributes
    ANCHOR_WORDS[1]='fast' plus the src word — tf('fast', doc 1) ≥ 3."""
    post = {
        (r["doc_id"], r["term"]): r["tf"]
        for r in anchor_postings(anchored_html(_docs(spark, n=4))).collect()
    }
    assert post[(1, "fast")] >= 3
    # no postings for docs without inbound anchors beyond the corpus
    assert all(d in {0, 1, 2, 3} for d, _ in post)


def test_bm25f_weighted_sum_before_saturation(spark):
    """Hand-check one doc's score: build the two field frames directly so
    every quantity (tf, dl, avgdl, idf) is known exactly."""
    body = spark.createDataFrame(
        [(1, "data", 2), (2, "data", 2)], "doc_id long, term string, tf long"
    )
    anchor = spark.createDataFrame(
        [(1, "data", 3)], "doc_id long, term string, tf long"
    )
    doc_stats = spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, dl long"
    )
    n_docs, avgdl = 2, 10.0
    got = {
        r["doc_id"]: r["score"]
        for r in search_bm25f(
            body, anchor, doc_stats, n_docs, avgdl, ["data"]
        ).collect()
    }
    avg_adl = 3.0 / 2.0
    idf = bm25_idf(2.0, 2.0)  # both docs contain 'data'

    def score(tf_b, tf_a):
        wtf = W_BODY * tf_b / (1 - B_BODY + B_BODY * 10.0 / avgdl)
        if tf_a:
            wtf += W_ANCHOR * tf_a / (1 - B_ANCHOR + B_ANCHOR * 3.0 / avg_adl)
        return round(idf * wtf / (K1_DEFAULT + wtf), 4)

    assert got[1] == score(2, 3)
    assert got[2] == score(2, 0)
    # the anchor field must RANK doc 1 above doc 2 (same body tf)
    assert got[1] > got[2]


def test_bm25f_absent_term_drops_out(spark):
    docs = anchored_html(_docs(spark, n=6))
    from search_engine_spark.operators import index_build as ib

    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    anchor = anchor_postings(docs)
    hits = search_bm25f(
        postings, anchor, doc_stats, n_docs, avgdl, ["data", "zzabsent"]
    ).collect()
    assert hits  # OR semantics: present term still matches
    only_absent = search_bm25f(
        postings, anchor, doc_stats, n_docs, avgdl, ["zzabsent"]
    ).collect()
    assert only_absent == []


def test_bm25f_no_global_window(spark):
    docs = anchored_html(_docs(spark, n=6))
    from search_engine_spark.operators import index_build as ib

    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    plan = search_bm25f(
        postings, anchor_postings(docs), doc_stats, n_docs, avgdl, ["data"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_harvest_anchors_survives_external_anchor(spark):
    """One external/non-doc anchor on a page must neither crash the job
    (ANSI ''::long) nor resolve to a fake internal target."""
    from search_engine_spark.operators.anchors import harvest_anchors

    docs = spark.createDataFrame(
        [
            (1, bytearray(
                b'<a href="https://other.example/x">ext</a>'
                b'<a href="https://evil.example/docs/2">spoof</a>'
                b'<a href="https://site-c.example/docs/2">ok</a>'
            )),
            (2, bytearray(b"")),
        ],
        "doc_id long, html binary",
    )
    got = harvest_anchors(docs).collect()
    assert [(r["src_doc"], r["dst_doc"], r["anchor_text"]) for r in got] == [
        (1, 2, "ok")
    ]


# ------------------------------------------------------------------ dis_max

def test_dismax_endpoints_and_anchor_only_hit(spark):
    """tie_breaker=0 ≡ best single field; tie_breaker=1 ≡ field sum; a doc
    matching ONLY in the anchor field still hits (per-field OR union)."""
    from search_engine_spark.operators.anchors import search_dismax

    body = spark.createDataFrame(
        [(1, "data", 2), (2, "data", 2)], "doc_id long, term string, tf long"
    )
    anchor = spark.createDataFrame(
        [(1, "data", 3), (3, "data", 1)], "doc_id long, term string, tf long"
    )
    doc_stats = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], "doc_id long, dl long"
    )
    n_docs, avgdl = 3, 10.0

    def run(tie):
        return {
            r["doc_id"]: r["score"]
            for r in search_dismax(
                body, anchor, doc_stats, n_docs, avgdl, ["data"],
                tie_breaker=tie,
            ).collect()
        }

    # field scores by hand (field-scoped df: body df=2, anchor df=2)
    avg_adl = 4.0 / 3.0
    idf_b = bm25_idf(3.0, 2.0)
    idf_a = bm25_idf(3.0, 2.0)

    def s_body(tf):
        return idf_b * tf * 2.2 / (tf + 1.2 * (1 - B_BODY + B_BODY * 1.0))

    def s_anchor(tf, adl):
        return idf_a * tf * 2.2 / (
            tf + 1.2 * (1 - B_ANCHOR + B_ANCHOR * adl / avg_adl)
        )

    sb1, sa1 = s_body(2.0), s_anchor(3.0, 3.0)
    sb2 = s_body(2.0)
    sa3 = s_anchor(1.0, 1.0)

    got0 = run(0.0)
    assert got0[1] == round(max(sb1, sa1), 4)
    assert got0[2] == round(sb2, 4)
    assert got0[3] == round(sa3, 4)  # anchor-only doc present

    got1 = run(1.0)
    assert got1[1] == round(sb1 + sa1, 4)
    assert got1[2] == round(sb2, 4)


def test_dismax_vs_bm25f_rank_divergence(spark):
    """The two multi-field modes are genuinely different rankers: a doc
    with balanced evidence across both fields can out-rank under BM25F
    (evidence fuses) while best_fields prefers one dominant field."""
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_dismax,
    )

    docs = anchored_html(_docs(spark, n=20))
    body = ib.build_postings(docs)
    anchor = anchor_postings(docs)
    doc_stats = ib.build_doc_stats(docs, body)
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    hits = search_dismax(
        body, anchor, doc_stats, n_docs, avgdl, ["data", "fast"]
    ).collect()
    assert hits  # fixture anchors carry both words
    scores = [r["score"] for r in hits]
    assert scores == sorted(scores, reverse=True)


def test_cross_fields_blended_df_and_term_max(spark):
    """Hand-check: per term the BEST field's saturated part scores (not
    the sum), idf over max-of-fields df."""
    from search_engine_spark.operators.anchors import search_cross_fields

    body = spark.createDataFrame(
        [(1, "data", 2), (2, "data", 2)], "doc_id long, term string, tf long"
    )
    anchor = spark.createDataFrame(
        [(1, "data", 5)], "doc_id long, term string, tf long"
    )
    doc_stats = spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, dl long"
    )
    n_docs, avgdl = 2, 10.0
    got = {
        r["doc_id"]: r["score"]
        for r in search_cross_fields(
            body, anchor, doc_stats, n_docs, avgdl, ["data"]
        ).collect()
    }
    avg_adl = 5.0 / 2.0
    idf = bm25_idf(2.0, 2.0)  # blended df = max(2, 1) = 2

    def sat(tf, b, dl, avg):
        return tf * 2.2 / (tf + 1.2 * (1 - b + b * dl / avg))

    p1 = max(sat(2.0, B_BODY, 10.0, avgdl), sat(5.0, B_ANCHOR, 5.0, avg_adl))
    p2 = sat(2.0, B_BODY, 10.0, avgdl)
    assert got[1] == round(idf * p1, 4)
    assert got[2] == round(idf * p2, 4)


def test_three_multifield_modes_agree_on_match_set(spark):
    """BM25F, best_fields and cross_fields are different RANKERS over the
    same disjunctive match set (body∪anchor occurrences)."""
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_bm25f,
        search_cross_fields,
        search_dismax,
    )

    docs = anchored_html(_docs(spark, n=30))
    body = ib.build_postings(docs)
    anchor = anchor_postings(docs)
    doc_stats = ib.build_doc_stats(docs, body)
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    q = ["data", "merge"]
    big = 10**6
    sets = []
    for fn in (search_bm25f, search_dismax, search_cross_fields):
        sets.append({
            r["doc_id"]
            for r in fn(
                body, anchor, doc_stats, n_docs, avgdl, q, limit=big
            ).collect()
        })
    assert sets[0] == sets[1] == sets[2] and sets[0]


# ------------------------------------------------- combined_fields model


def _cf_ctx(spark, n=20):
    from search_engine_spark.operators import index_build as ib

    docs = _docs(spark, n=n)
    postings = ib.build_postings(docs)
    doc_stats = ib.build_doc_stats(docs, postings)
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    return docs, postings, doc_stats, n_docs, avgdl


def test_combined_fields_reduces_to_bm25_without_anchors(spark):
    """w_anchor=0 over an EMPTY anchor relation is exactly disjunctive
    single-field BM25 — merged tf/dl/idf all collapse to body stats."""
    from search_engine_spark.operators.anchors import search_combined_fields
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.search import search_bm25

    docs, postings, doc_stats, n_docs, avgdl = _cf_ctx(spark)
    term_dict = ib.build_term_dict(postings)
    empty_anchor = postings.limit(0)
    terms = ["data", "fast"]
    got = search_combined_fields(
        postings, empty_anchor, doc_stats, n_docs, avgdl, terms,
        w_anchor=0.0,
    ).collect()
    want = search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, terms,
        conjunctive=False,
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


def test_combined_fields_matches_on_anchor_only_docs(spark):
    """A term present ONLY in a doc's inbound anchors still matches —
    the synthetic merged field sees it (cross-field matching)."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_combined_fields,
    )

    docs, postings, doc_stats, n_docs, avgdl = _cf_ctx(spark)
    anchor = anchor_postings(anchored_html(docs))
    # find a (doc, term) in anchors but not in body
    arows = {(r["doc_id"], r["term"]) for r in anchor.collect()}
    brows = {(r["doc_id"], r["term"]) for r in postings.collect()}
    only = sorted(arows - brows)
    assert only, "fixture has no anchor-only (doc, term) pair"
    d, t = only[0]
    got = search_combined_fields(
        postings, anchor, doc_stats, n_docs, avgdl, [t], limit=100
    ).collect()
    assert d in {r["doc_id"] for r in got}


# ------------------------------------------------- parent-child join field

def test_has_child_min_children_gate(spark):
    """Raising min_children can only shrink the parent set, and every
    surviving parent reports at least that many children."""
    from search_engine_spark.operators.anchors import has_child
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    one = has_child(docs, ["data", "fast"], min_children=1, limit=10_000)
    three = has_child(docs, ["data", "fast"], min_children=3, limit=10_000)
    ids1 = {r["doc_id"] for r in one.collect()}
    rows3 = three.collect()
    assert {r["doc_id"] for r in rows3} <= ids1
    assert all(r["n_children"] >= 3 for r in rows3)


def test_has_parent_children_of_matching_parents_only(spark):
    """Every returned child's parent conjunctively matches; a child of a
    non-matching parent never appears."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.text_columns import explode_terms
    from search_engine_spark.operators.anchors import has_parent
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    q = ["data", "fast"]
    matching = {
        r["doc_id"]
        for r in explode_terms(docs)
        .filter(F.col("term").isin(q))
        .groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt"))
        .filter(F.col("nt") == 2)
        .collect()
    }
    rows = has_parent(docs, q).collect()
    assert rows
    assert {r["dst_doc"] for r in rows} <= matching


def test_has_child_score_modes(spark):
    """sum ≥ max for every parent; avg = sum / n_children."""
    import pytest

    from search_engine_spark.operators.anchors import has_child
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    by_mode = {
        m: {r["doc_id"]: r for r in has_child(
            docs, ["data", "fast"], score_mode=m, limit=10_000).collect()}
        for m in ("sum", "max", "avg")
    }
    assert set(by_mode["sum"]) == set(by_mode["max"]) == set(by_mode["avg"])
    for d, r in by_mode["sum"].items():
        assert r["score"] >= by_mode["max"][d]["score"]
        assert by_mode["avg"][d]["score"] == pytest.approx(
            round(r["score"] / r["n_children"], 4), abs=1e-4
        )


def test_most_fields_is_sum_of_field_scores(spark):
    """most_fields == s_body + s_anchor for every doc (the tie_breaker=1
    identity), and differs from best_fields wherever both fields match."""
    import pytest

    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_dismax,
        search_most_fields,
    )
    from search_engine_spark.operators.index_build import (
        build_doc_stats,
        build_postings,
        corpus_stats,
    )
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    postings = build_postings(docs)
    ds = build_doc_stats(docs, postings)
    n, avgdl = corpus_stats(docs, ds)
    anchor = anchor_postings(anchored_html(docs))
    q = ["data", "merge", "query"]
    mf = {r["doc_id"]: r["score"] for r in search_most_fields(
        postings, anchor, ds, n, avgdl, q, limit=10_000).collect()}
    bf = {r["doc_id"]: r["score"] for r in search_dismax(
        postings, anchor, ds, n, avgdl, q, limit=10_000).collect()}
    assert set(mf) == set(bf)
    # sum >= dis_max score everywhere; strictly greater where the
    # tie-broken remainder is non-zero
    assert all(mf[d] >= bf[d] - 1e-9 for d in mf)
    assert any(mf[d] > bf[d] + 1e-6 for d in mf)
