"""Keyset pagination, wildcard expansion, term vectors, facets, explain —
the round's search-surface extensions, pinned against the fixture and
against each other (the invariants the oracle pairing can't state)."""

import pytest

from search_engine_spark.operators import search as se
from search_engine_spark.operators.positional import (
    build_positional,
    term_vectors,
)
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST

import __spark_entry__ as entrymod


@pytest.fixture(scope="module")
def ctx(spark):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, SF_TEST
    )
    return docs, postings, term_dict, doc_stats, n_docs, avgdl


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


# ------------------------------------------------------------ keyset paging

def test_keyset_page_equals_offset_page(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    page1 = se.search_bm25(postings, td, ds, n, avgdl, q, limit=7).collect()
    offset_page2 = se.search_bm25(
        postings, td, ds, n, avgdl, q, limit=7, offset=7
    )
    keyset_page2 = se.search_bm25_after(
        postings, td, ds, n, avgdl, q,
        after_score=page1[-1]["score"], after_doc_id=page1[-1]["doc_id"],
        limit=7,
    )
    assert _rows(keyset_page2) == _rows(offset_page2)


def test_keyset_chain_walks_entire_result_set(spark, ctx):
    """Walking pages by cursor visits every hit exactly once, in order."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    full = _rows(se.search_bm25(postings, td, ds, n, avgdl, q, limit=10**6))
    walked, cursor = [], None
    while True:
        if cursor is None:
            page = _rows(se.search_bm25(postings, td, ds, n, avgdl, q, limit=9))
        else:
            page = _rows(se.search_bm25_after(
                postings, td, ds, n, avgdl, q,
                after_score=cursor[1], after_doc_id=cursor[0], limit=9,
            ))
        if not page:
            break
        walked.extend(page)
        cursor = page[-1]
    assert walked == full


# ---------------------------------------------------------------- wildcard

def test_wildcard_prefix_route_matches_like_semantics(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    got = {r["term"] for r in se.wildcard_terms(td, "da*").collect()}
    want = {
        r["term"] for r in td.filter(td.term.like("da%")).collect()
    }
    assert got == want and got  # non-empty: 'data' at least


def test_wildcard_leading_route_matches_like_semantics(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    got = {r["term"] for r in se.wildcard_terms(td, "*ge").collect()}
    want = {r["term"] for r in td.filter(td.term.like("%ge")).collect()}
    assert got == want and "merge" in got


def test_wildcard_max_expansions_cap_is_term_asc(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    capped = [r["term"] for r in se.wildcard_terms(td, "*", 5).collect()]
    all_terms = sorted(r["term"] for r in td.select("term").collect())
    assert capped == all_terms[:5]


def test_wildcard_search_equals_or_query_over_expansions(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    terms = [r["term"] for r in se.wildcard_terms(td, "?a*").collect()]
    direct = se.search_bm25(
        postings, td, ds, n, avgdl, terms, conjunctive=False
    )
    wild = se.search_wildcard(postings, td, ds, n, avgdl, "?a*")
    assert _rows(wild) == _rows(direct)


# ------------------------------------------------------------- term vectors

def test_term_vectors_positions_are_ascending_and_sized_tf(spark, ctx):
    docs = load_documents(spark, SF_TEST)
    tv = term_vectors(build_positional(docs), [1, 2, 3]).collect()
    assert tv
    for r in tv:
        pos = [int(p) for p in r["positions"].split(",")]
        assert len(pos) == r["tf"]
        assert pos == sorted(pos)


def test_term_vectors_tf_matches_postings(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    tv = term_vectors(build_positional(docs), [5]).collect()
    want = {
        (r["term"]): r["tf"]
        for r in postings.filter(postings.doc_id == 5).collect()
    }
    assert {r["term"]: r["tf"] for r in tv} == want


# ------------------------------------------------------------------- facets

def test_date_histogram_sums_to_hit_count(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    hist = se.facet_date_histogram(docs, postings, q, bucket_secs=3600)
    n_hits = se._conjunctive_hits(postings, q).count()
    rows = hist.collect()
    assert sum(r["n_hits"] for r in rows) == n_hits
    assert all(r["bucket_epoch"] % 3600 == 0 for r in rows)


def test_significant_terms_excludes_query_terms_and_lift_is_sane(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    rows = se.significant_terms(postings, td, n, q, k=50).collect()
    assert rows
    assert not {r["term"] for r in rows} & set(q)
    for r in rows:
        assert r["fg_df"] >= 2
        assert r["fg_df"] <= r["bg_df"]
        assert r["lift"] > 0


def test_significant_text_jlh_positive_and_consistent(spark, ctx):
    """JLH keeps only positively significant terms (fg% > bg%), every
    emitted term also appears in the lift facet's candidate set, and
    the JLH value recomputes from the emitted counts."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    n_fg = se._conjunctive_hits(postings, q).count()
    rows = se.significant_text(postings, td, n, q, k=50).collect()
    assert rows
    assert not {r["term"] for r in rows} & set(q)
    for r in rows:
        fg_pct = r["fg_df"] / n_fg
        bg_pct = r["bg_df"] / n
        assert fg_pct > bg_pct  # the ES positive-significance gate
        assert r["jlh"] == pytest.approx(
            (fg_pct - bg_pct) * (fg_pct / bg_pct), abs=1e-4
        )
    # scores descend, ties by term asc
    pairs = [(r["jlh"], r["term"]) for r in rows]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


# ------------------------------------------------------------------ explain

def test_explain_parts_sum_to_search_score(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    top = se.search_bm25(postings, td, ds, n, avgdl, q, limit=3).collect()
    for hit in top:
        parts = se.explain_score(
            postings, td, ds, n, avgdl, q, doc_id=hit["doc_id"]
        ).collect()
        assert {r["term"] for r in parts} == set(q)
        assert sum(r["part_score"] for r in parts) == pytest.approx(
            hit["score"], abs=2e-4  # 4-dp rounding of 3 parts vs the sum
        )


# --------------------------------------------------- LM-Dirichlet similarity

def test_lmd_candidates_equal_disjunctive_bm25(spark, ctx):
    """Both similarities score over the same matched-doc set — the
    similarity is pluggable, the matching is not."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    lmd = se.search_lmd(postings, td, ds, n, avgdl, q, limit=10_000)
    bm = se.search_bm25(
        postings, td, ds, n, avgdl, q, limit=10_000, conjunctive=False
    )
    assert {r["doc_id"] for r in lmd.collect()} == {
        r["doc_id"] for r in bm.collect()
    }


def test_lmd_score_matches_pure_python(spark, ctx):
    """Spot-check the Lucene formula against a from-scratch pandas
    recomputation over the raw postings."""
    import math

    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    mu = 2000.0
    pdf = postings.filter(se.F.col("term").isin(q)).toPandas()
    dl = ds.toPandas().set_index("doc_id")["dl"]
    total = float(dl.sum())
    cf = pdf.groupby("term")["tf"].sum().to_dict()
    expect = {}
    for r in pdf.itertuples():
        part = math.log(1 + r.tf / (mu * cf[r.term] / total)) + math.log(
            mu / (float(dl[r.doc_id]) + mu)
        )
        expect[r.doc_id] = expect.get(r.doc_id, 0.0) + part
    got = {
        r["doc_id"]: r["score"]
        for r in se.search_lmd(
            postings, td, ds, n, avgdl, q, mu=mu, limit=10_000
        ).collect()
    }
    assert set(got) == set(expect)
    for d, s in got.items():
        assert abs(s - round(expect[d], 4)) < 1e-9


def test_lmd_absent_and_conjunctive_semantics(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    assert (
        se.search_lmd(postings, td, ds, n, avgdl, ["zzzabsent"]).count() == 0
    )
    conj = se.search_lmd(
        postings, td, ds, n, avgdl, ["data", "zzzabsent"], conjunctive=True
    )
    assert conj.count() == 0


# ------------------------------------------------------------ regexp query

def test_regexp_is_full_term_anchored(spark, ctx):
    """Lucene RegexpQuery matches the whole term: 'dat' must not expand
    to 'data', while 'dat.*' must."""
    docs, postings, td, ds, n, avgdl = ctx
    assert se.regexp_terms(td, "dat").count() == 0
    exp = [r["term"] for r in se.regexp_terms(td, "dat.*").collect()]
    assert "data" in exp


def test_regexp_search_equals_or_query_over_expansions(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    pat = "[bd]at[ae].*|j[ou]in"
    exp = [r["term"] for r in se.regexp_terms(td, pat).collect()]
    assert len(exp) >= 2
    direct = se.search_regexp(postings, td, ds, n, avgdl, pat, limit=50)
    manual = se.search_bm25(
        postings, td, ds, n, avgdl, exp, limit=50, conjunctive=False
    )
    assert _rows(direct) == _rows(manual)


# ------------------------------------------------------------ filter context

def test_filter_context_preserves_scores(spark, ctx):
    """The filter gates candidates but never alters a surviving doc's
    score — idf/avgdl stay corpus-global (ES filter-context semantics)."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    allowed = docs.filter(se.F.col("doc_id") % 2 == 0).select("doc_id")
    filt = dict(_rows(se.search_bm25_filtered(
        postings, td, ds, n, avgdl, q, allowed, limit=10_000
    )))
    full = dict(_rows(se.search_bm25(
        postings, td, ds, n, avgdl, q, limit=10_000, conjunctive=False
    )))
    assert filt
    assert set(filt) == {d for d in full if d % 2 == 0}
    for d, s in filt.items():
        assert s == full[d]


def test_filter_context_empty_filter_empties_result(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    allowed = docs.filter(se.F.lit(False)).select("doc_id")
    assert se.search_bm25_filtered(
        postings, td, ds, n, avgdl, ["data"], allowed
    ).count() == 0


# ---------------------------------------------------- stats agg + field sort

def test_facet_stats_matches_hand_aggregation(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    row = se.facet_stats(docs, postings, q).collect()[0]
    hits = se._conjunctive_hits(postings, q).toPandas()
    vals = docs.select("doc_id", "n_chars").toPandas().set_index("doc_id") \
        .loc[hits.doc_id, "n_chars"]
    assert row["n_hits"] == len(vals)
    assert row["min_v"] == vals.min() and row["max_v"] == vals.max()
    assert row["sum_v"] == vals.sum()
    assert row["avg_v"] == round(float(vals.mean()), 4)


def test_sort_by_time_is_match_set_ordered_by_epoch(spark, ctx):
    """Same doc set as the conjunctive query, order = crawl time desc
    (not relevance)."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    srt = se.search_sorted_by_time(docs, postings, q, limit=10_000).toPandas()
    hits = se._conjunctive_hits(postings, q).toPandas()
    assert set(srt.doc_id) == set(hits.doc_id)
    keys = list(zip(-srt.epoch_s, srt.doc_id))
    assert keys == sorted(keys)


def test_facet_top_hits_caps_per_bucket_and_orders(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    out = se.facet_top_hits(docs, postings, ["data", "fast"], per_site=2) \
        .toPandas()
    for site, grp in out.groupby("site_key"):
        assert len(grp) <= 2
        assert list(grp.site_rank) == list(range(1, len(grp) + 1))
        keys = list(zip(-grp.score_abs, grp.doc_id))
        assert keys == sorted(keys)


def test_next_word_counts_adjacent_bigrams_and_prefix_filters(spark):
    from search_engine_spark.operators.positional import build_positional

    rows = [
        (1, "data fast data fast data slow"),
        (2, "data fast other data far"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pos = build_positional(docs)
    out = {r["term"]: r["n"] for r in se.next_word_suggest(pos, "data").collect()}
    assert out == {"fast": 3, "slow": 1, "far": 1}
    pref = {r["term"]: r["n"]
            for r in se.next_word_suggest(pos, "data", prefix="fa").collect()}
    assert pref == {"fast": 3, "far": 1}


# ------------------------------------------- AND→OR relaxation + per-lang

def test_relaxed_falls_back_to_or_on_absent_term(spark, ctx):
    """'quantumflux' is corpus-absent → strict rung empty → OR fallback,
    identical to plain disjunctive search_bm25."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "quantumflux"]
    out = se.search_bm25_relaxed(postings, td, ds, n, avgdl, q).collect()
    assert out and all(r["matched_mode"] == "or" for r in out)
    plain = se.search_bm25(
        postings, td, ds, n, avgdl, q, conjunctive=False
    )
    assert [(r["doc_id"], r["score"]) for r in out] == _rows(plain)


def test_relaxed_keeps_and_when_it_hits(spark, ctx):
    """When the conjunction matches, relaxation must be a no-op: same
    rows/scores as strict search_bm25, matched_mode='and'."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    out = se.search_bm25_relaxed(postings, td, ds, n, avgdl, q).collect()
    assert out and all(r["matched_mode"] == "and" for r in out)
    strict = se.search_bm25(postings, td, ds, n, avgdl, q)
    assert [(r["doc_id"], r["score"]) for r in out] == _rows(strict)


def test_per_lang_topk_shape_and_scoping(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    out = se.search_bm25_per_lang(docs, postings, ds, q, k_per_lang=5).collect()
    assert out
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    lang_of = {r["doc_id"]: r["lang"] for r in docs.select("doc_id", "lang").collect()}
    for lang, rows in by_lang.items():
        # ≤ k rows per language, contiguous 1..m ranks, rank order = pinned total order
        assert len(rows) <= 5
        ranks = sorted(r["lang_rank"] for r in rows)
        assert ranks == list(range(1, len(rows) + 1))
        ordered = sorted(rows, key=lambda r: r["lang_rank"])
        assert ordered == sorted(
            ordered, key=lambda r: (-r["score"], r["doc_id"])
        )
        # every hit really belongs to the language it ranked under
        assert all(lang_of[r["doc_id"]] == lang for r in rows)


def test_per_lang_statistics_are_lang_scoped(spark, ctx):
    """idf/avgdl must come from the language slice: for some doc the
    lang-scoped score differs from the global-statistics score."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    per_lang = {
        r["doc_id"]: r["score"]
        for r in se.search_bm25_per_lang(
            docs, postings, ds, q, k_per_lang=10**6
        ).collect()
    }
    global_ = dict(_rows(se.search_bm25(
        postings, td, ds, n, avgdl, q, limit=10**6
    )))
    # same conjunctive candidate set...
    assert set(per_lang) == set(global_)
    # ...different statistics → different scores somewhere
    assert any(abs(per_lang[d] - global_[d]) > 1e-4 for d in per_lang)


# --------------------------------------------------------- phrase suggester

@pytest.fixture(scope="module")
def positional(spark):
    from search_engine_spark.operators.positional import build_positional
    return build_positional(load_documents(spark, SF_TEST)).cache()


def test_phrase_suggest_corrects_multiword_typo(spark, positional):
    out = se.phrase_suggest(positional, ["fst", "sow", "dat"]).collect()
    assert [r["suggestion"] for r in out] in (
        ["fast slow data", "fast row data"],
        ["fast row data", "fast slow data"],
    )
    # scores strictly ordered desc then suggestion asc — pinned total order
    assert all(
        (a["score"], b["suggestion"]) >= (b["score"], a["suggestion"])
        or a["score"] > b["score"]
        for a, b in zip(out, out[1:])
    )


def test_phrase_suggest_uncollatable_position_is_empty(spark, positional):
    """A word with no dictionary term within distance 1 cannot collate →
    no suggestion at all (ES phrase-suggester contract)."""
    assert se.phrase_suggest(positional, ["fst", "zzzzzz"]).count() == 0


def test_phrase_suggest_bigram_beats_backoff(spark, positional):
    """The winning phrase must be the one whose bigrams actually occur
    more: stupid backoff ranks by observed adjacency, not unigram df."""
    from pyspark.sql import functions as F

    rows = se.phrase_suggest(positional, ["fst", "sow", "dat"], k=2).collect()
    a, b = positional.alias("a"), positional.alias("b")
    bi = {
        (r["w1"], r["w2"]): r["n"]
        for r in a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(
            F.col("a.term").alias("w1"), F.col("b.term").alias("w2")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    top = rows[0]["suggestion"].split()
    runner = rows[1]["suggestion"].split()
    top_n = sum(bi.get((x, y), 0) for x, y in zip(top, top[1:]))
    run_n = sum(bi.get((x, y), 0) for x, y in zip(runner, runner[1:]))
    assert top_n >= run_n


# ----------------------------------------------------- MMR diversification

def test_mmr_first_pick_is_top_relevance_and_scores_decrease(spark, ctx):
    from search_engine_spark.sources.documents import load_embeddings

    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    emb = load_embeddings(spark, SF_TEST)
    out = se.search_diversified(
        postings, td, ds, n, avgdl, q, emb
    ).collect()
    assert [r["pick_order"] for r in out] == [1, 2, 3, 4, 5]
    # pick 1 = max-rel candidate (ties by doc_id)
    assert out[0]["rel"] == max(r["rel"] for r in out)
    # from pick 2 on, the pool only shrinks and each candidate's penalty
    # only grows (S grows), so the achieved mmr sequence is non-increasing.
    # Pick 1 is excluded: its empty-S formula has no penalty term, and a
    # NEGATIVE max-cosine at pick 2 acts as a bonus that can exceed it.
    mmrs = [r["mmr"] for r in out[1:]]
    assert all(a >= b - 1e-9 for a, b in zip(mmrs, mmrs[1:]))


def test_mmr_lambda_one_is_pure_relevance(spark, ctx):
    """λ=1 removes the diversity penalty: picks = BM25 top-k order."""
    from search_engine_spark.sources.documents import load_embeddings

    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    emb = load_embeddings(spark, SF_TEST)
    mmr_ids = [
        r["doc_id"]
        for r in se.search_diversified(
            postings, td, ds, n, avgdl, q, emb, lam=1.0
        ).collect()
    ]
    top = se.search_bm25(postings, td, ds, n, avgdl, q, limit=5)
    assert mmr_ids == [r["doc_id"] for r in top.collect()]


def test_mmr_diversifies_on_fixture(spark, ctx):
    """With λ=0.7 the picked order must actually deviate from the pure
    relevance order somewhere in the tail (the fixture has near-dup
    embeddings among top hits)."""
    from search_engine_spark.sources.documents import load_embeddings

    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    emb = load_embeddings(spark, SF_TEST)
    mmr_ids = [
        r["doc_id"]
        for r in se.search_diversified(
            postings, td, ds, n, avgdl, q, emb
        ).collect()
    ]
    rel_ids = [
        r["doc_id"]
        for r in se.search_bm25(
            postings, td, ds, n, avgdl, q, limit=5
        ).collect()
    ]
    assert mmr_ids != rel_ids


# ------------------------------------------------- composite aggregation

def test_composite_after_key_walk_enumerates_every_bucket(spark):
    """Walking pages by after_key visits the full (site_key, term) bucket
    space exactly once, in key order — the ES composite-agg contract."""
    import __spark_entry__ as em
    from search_engine_spark.operators import index_build as ib

    td = ib.build_term_dict_site(load_documents(spark, SF_TEST)).cache()
    full = sorted(
        (r["site_key"], r["term"], r["df"], r["cf"]) for r in td.collect()
    )
    walked, after = [], None
    while True:
        page = [
            (r["site_key"], r["term"], r["df"], r["cf"])
            for r in se.composite_buckets(td, size=7, after=after).collect()
        ]
        if not page:
            break
        walked.extend(page)
        after = (page[-1][0], page[-1][1])
    assert walked == full


# ------------------------------------------ RM3 pseudo-relevance feedback

def test_rm3_expands_beyond_original_query(spark, ctx):
    """With a non-empty feedback set, expansion terms must change the
    ranking relative to plain disjunctive retrieval over q0."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    rm3 = {
        r["doc_id"]: r["score"]
        for r in se.search_rm3(
            postings, td, ds, n, avgdl, q, limit=10_000
        ).collect()
    }
    plain = {
        r["doc_id"]: r["score"]
        for r in se.search_bm25(
            postings, td, ds, n, avgdl, q, conjunctive=False, limit=10_000
        ).collect()
    }
    # candidate set can only grow (expansion adds disjuncts)...
    assert set(plain) <= set(rm3)
    # ...and weighted expansion contributions must move some score
    assert any(rm3[d] != plain.get(d) for d in rm3)


def test_rm3_without_feedback_is_plain_disjunctive(spark, ctx):
    """Conjunctive base empty (absent term) → no judgments → RM3 must
    degenerate to the unexpanded disjunctive query."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "quantumflux"]
    rm3 = se.search_rm3(postings, td, ds, n, avgdl, q)
    plain = se.search_bm25(
        postings, td, ds, n, avgdl, q, conjunctive=False
    )
    assert _rows(rm3) == _rows(plain)


def test_rm3_zero_score_feedback_falls_back(spark, ctx):
    """Degenerate feedback: a term present in (almost) every document of
    a large corpus has idf ≈ 0.5/N, so every 4-dp-rounded feedback score
    is 0.0000 and s_total = 0. RM3 must fall back to the unexpanded
    query instead of dividing by zero. Simulated by inflating df/N in
    the dictionary — the scorer reads both from there."""
    from pyspark.sql import functions as F

    docs, postings, td, ds, n, avgdl = ctx
    big_n = 50_000
    td_common = td.withColumn(
        "df",
        F.when(F.col("term") == "data", F.lit(float(big_n)))
        .otherwise(F.col("df")),
    )
    q = ["data"]
    base = se.search_bm25(
        postings, td_common, ds, big_n, avgdl, q, limit=5
    ).collect()
    # precondition: the feedback scores really do round to zero
    assert base and all(r["score"] == 0.0 for r in base)
    rm3 = se.search_rm3(postings, td_common, ds, big_n, avgdl, q)
    plain = se.search_bm25(
        postings, td_common, ds, big_n, avgdl, q, conjunctive=False
    )
    assert _rows(rm3) == _rows(plain)


def test_rm3_weights_bounded_and_expansion_size(spark, ctx):
    """Relevance-model weights are a mixture of per-doc term
    distributions: each w(t) ∈ (0, 1]; expansion capped at fb_terms."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    base = se.search_bm25(postings, td, ds, n, avgdl, q, limit=5).collect()
    ids = [r["doc_id"] for r in base]
    s = {r["doc_id"]: r["score"] for r in base}
    stot = sum(s.values())
    dl = {
        r["doc_id"]: r["dl"]
        for r in ds.filter(ds.doc_id.isin(ids)).collect()
    }
    acc = {}
    for r in postings.filter(postings.doc_id.isin(ids)).collect():
        acc[r["term"]] = acc.get(r["term"], 0.0) + (
            r["tf"] / dl[r["doc_id"]]
        ) * (s[r["doc_id"]] / stot)
    exp = sorted(
        ((round(v, 4), t) for t, v in acc.items() if t not in q),
        key=lambda x: (-x[0], x[1]),
    )[:3]
    assert 0 < len(exp) <= 3
    assert all(0.0 < w <= 1.0 for w, _ in exp)


# ----------------------------------------------------------- LTR features

def test_ltr_features_consistency_with_scorers(spark, ctx):
    """The feature columns must agree with the operators that define
    them: bm25 == disjunctive search_bm25 score, n_matched == msm path's
    count, dl == doc_stats, sum/max tf == raw postings."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    feats = se.ltr_features(
        postings, td, ds, n, avgdl, q, limit=10_000
    ).collect()
    assert feats
    bm = dict(_rows(se.search_bm25(
        postings, td, ds, n, avgdl, q, conjunctive=False, limit=10_000
    )))
    dl = {r["doc_id"]: r["dl"] for r in ds.collect()}
    pf = postings.filter(postings.term.isin(q)).collect()
    sum_tf, max_tf = {}, {}
    for r in pf:
        sum_tf[r["doc_id"]] = sum_tf.get(r["doc_id"], 0) + r["tf"]
        max_tf[r["doc_id"]] = max(max_tf.get(r["doc_id"], 0), r["tf"])
    for f in feats:
        d = f["doc_id"]
        assert f["bm25"] == bm[d]
        assert f["dl"] == dl[d]
        assert f["sum_tf"] == sum_tf[d]
        assert f["max_tf"] == max_tf[d]
        assert 1 <= f["n_matched"] <= len(q)
        assert f["idf_sum"] > 0


# ------------------------------------------------------------- VSM (lnc.ltc)

def test_vsm_exact_arithmetic_and_norm_covers_offquery_terms(spark):
    """Hand-check the lnc.ltc score, incl. that the doc norm runs over
    ALL the doc's terms (off-query mass dilutes the cosine)."""
    import math

    postings = spark.createDataFrame(
        [(1, "a", 2), (2, "a", 2), (2, "x", 3)],
        "doc_id long, term string, tf long",
    )
    term_dict = spark.createDataFrame(
        [("a", 2), ("x", 1)], "term string, df long"
    )
    got = {
        r["doc_id"]: r["score"]
        for r in se.search_vsm(postings, term_dict, 4, ["a"]).collect()
    }
    idf = math.log(4.0 / 2.0)
    w_a = 1 + math.log(2.0)
    w_x = 1 + math.log(3.0)
    assert got[1] == round(idf * w_a / math.sqrt(w_a**2), 4)
    assert got[2] == round(idf * w_a / math.sqrt(w_a**2 + w_x**2), 4)
    assert got[1] > got[2]  # off-query mass dilutes doc 2


def test_vsm_or_semantics_and_absent_term(spark, ctx):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    hits = se.search_vsm(
        postings, term_dict, n_docs, ["data", "zzabsent"], limit=10
    )
    rows = hits.collect()
    assert rows  # absent term drops out (OR), 'data' still matches
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert se.search_vsm(postings, term_dict, n_docs, ["zzabsent"]).count() == 0


# --------------------------------------------------- sharded terms agg

def test_terms_agg_error_bound_brackets_truth(spark, ctx):
    """ES's exactness guarantee: for every returned bucket,
    true_df ∈ [doc_count, doc_count + error_ub]."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    true_df = {
        r["term"]: r["df"] for r in term_dict.select("term", "df").collect()
    }
    rows = se.terms_agg_sharded(postings, size=10, shard_size=3).collect()
    assert rows
    for r in rows:
        t = true_df[r["term"]]
        assert r["doc_count"] <= t <= r["doc_count"] + r["error_ub"], (
            r.asDict(), t
        )


def test_terms_agg_exact_when_shard_size_covers_vocab(spark, ctx):
    """shard_size ≥ per-shard vocabulary ⇒ every shard reports everything:
    doc_count == true df and error_ub == 0 (the bound collapses)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    n_vocab = term_dict.count()
    true_df = {
        r["term"]: r["df"] for r in term_dict.select("term", "df").collect()
    }
    rows = se.terms_agg_sharded(
        postings, size=5, shard_size=n_vocab + 1
    ).collect()
    top_true = sorted(
        true_df.items(), key=lambda kv: (-kv[1], kv[0])
    )[:5]
    assert [(r["term"], r["doc_count"]) for r in rows] == top_true
    assert all(r["error_ub"] == 0 for r in rows)


def test_terms_agg_tight_cut_produces_nonzero_bound(spark, ctx):
    """With a cut far below the vocabulary size, at least one shard must
    withhold terms — some bucket carries a positive error bound."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    rows = se.terms_agg_sharded(postings, size=10, shard_size=2).collect()
    assert any(r["error_ub"] > 0 for r in rows)


# -------------------------------------------------------- index stats

def test_index_stats_cross_checks_postings(spark, ctx):
    """The rollup must reconcile exactly with the logical postings —
    catching any posting lost or duplicated by block segmentation."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.blocks import build_posting_blocks
    from search_engine_spark.plans.statistics import index_stats

    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    row = index_stats(build_posting_blocks(postings, 16)).collect()[0]
    assert row["n_postings"] == postings.count()
    assert row["n_terms"] == term_dict.count()
    agg = postings.agg(
        F.sum("tf").alias("tot"), F.max("tf").alias("mx")
    ).collect()[0]
    assert row["total_tokens"] == agg["tot"]
    assert row["max_tf"] == agg["mx"]
    assert row["n_blocks"] >= row["n_terms"]  # ≥ one block per (bucket,term)


# ------------------------------------------------ rare terms + boosting

def test_rare_terms_tail_order_and_cap(spark):
    postings = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1), (3, "a", 1),
         (1, "b", 1), (2, "b", 1), (1, "c", 1), (2, "z", 1)],
        "doc_id long, term string, tf long",
    )
    rows = se.rare_terms_agg(postings, max_doc_count=2, k=10).collect()
    assert [(r["term"], r["doc_count"]) for r in rows] == [
        ("c", 1), ("z", 1), ("b", 2)
    ]
    capped = se.rare_terms_agg(postings, max_doc_count=2, k=2).collect()
    assert [r["term"] for r in capped] == ["c", "z"]


def test_boosting_demotes_without_excluding(spark, ctx):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    import __spark_entry__ as em

    plain = {
        r["doc_id"]: r["score"]
        for r in se.search_bm25(
            postings, term_dict, doc_stats, n_docs, avgdl, em.Q_BM25,
            limit=1_000_000, conjunctive=False,
        ).collect()
    }
    boosted = {
        r["doc_id"]: r["score"]
        for r in se.search_boosting(
            postings, term_dict, doc_stats, n_docs, avgdl,
            positive=em.Q_BM25, negative=["merge"], limit=1_000_000,
        ).collect()
    }
    neg_docs = {
        r["doc_id"]
        for r in postings.filter("term = 'merge'")
        .select("doc_id").distinct().collect()
    }
    assert set(boosted) == set(plain)  # demotion never excludes
    assert neg_docs & set(plain)  # the fixture does overlap
    for d, s in boosted.items():
        if d in neg_docs:
            assert s == round(plain[d] * se.NEGATIVE_BOOST, 4)
        else:
            assert s == plain[d]


# ------------------------------------------------ LTR inference + pinned

def test_ltr_inference_recomputes_from_features(spark, ctx):
    """The frozen dot product over the logged features, recomputed in
    pure Python, must equal the operator's scores exactly."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["dup", "data", "fast"]
    feats = {
        r["doc_id"]: r.asDict()
        for r in se.ltr_features(
            postings, td, ds, n, avgdl, q, limit=50
        ).collect()
    }
    got = se.search_ltr(postings, td, ds, n, avgdl, q, limit=50).collect()
    assert got
    w = se.LTR_WEIGHTS
    for r in got:
        f = feats[r["doc_id"]]
        want = round(
            w["bm25"] * f["bm25"] + w["n_matched"] * f["n_matched"]
            + w["dl"] * f["dl"] + w["sum_tf"] * f["sum_tf"]
            + w["max_tf"] * f["max_tf"] + w["idf_sum"] * f["idf_sum"], 4
        )
        assert abs(r["ltr_score"] - want) < 1e-9
    scores = [r["ltr_score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_ltr_reranks_differently_from_bm25(spark, ctx):
    """The model must actually change the ordering relative to raw BM25
    (otherwise the inference stage is vacuous on this corpus)."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["dup", "data", "fast"]
    bm = [r["doc_id"] for r in se.search_bm25(
        postings, td, ds, n, avgdl, q, limit=20, conjunctive=False
    ).collect()]
    ltr = [r["doc_id"] for r in se.search_ltr(
        postings, td, ds, n, avgdl, q, limit=20
    ).collect()]
    assert bm != ltr


def test_pinned_order_and_semantics(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["dup", "data", "fast"]
    organic = se.search_bm25(
        postings, td, ds, n, avgdl, q, limit=10**6, conjunctive=False
    ).collect()
    top = organic[0]["doc_id"]
    all_scores = {r["doc_id"]: r["score"] for r in organic}
    nonmatch = next(d for d in range(500) if d not in all_scores)
    pinned = se.search_pinned(
        postings, td, ds, n, avgdl, q, [nonmatch, top], limit=10
    ).collect()
    rows = sorted(pinned, key=lambda r: r["position"])
    # pinned first, in the GIVEN order, regardless of relevance
    assert [r["doc_id"] for r in rows[:2]] == [nonmatch, top]
    assert rows[0]["pinned"] and rows[1]["pinned"]
    assert rows[0]["score"] is None  # returned although unmatched
    assert rows[1]["score"] == organic[0]["score"]
    # organic tail excludes pinned docs and keeps BM25 order
    tail = rows[2:]
    assert top not in [r["doc_id"] for r in tail]
    tail_scores = [r["score"] for r in tail]
    assert tail_scores == sorted(tail_scores, reverse=True)
    assert [r["position"] for r in rows] == list(range(len(rows)))


def test_adjacency_matrix_counts_and_keys(spark):
    postings = spark.createDataFrame(
        [(1, "x", 1), (1, "y", 2), (2, "x", 1), (3, "y", 1), (3, "z", 1),
         (1, "z", 4)],
        "doc_id long, term string, tf long",
    )
    got = {
        r["key"]: r["doc_count"]
        for r in se.adjacency_matrix(
            postings, {"a": "x", "b": "y", "c": "z"}
        ).collect()
    }
    assert got == {
        "a": 2, "b": 2, "c": 2,        # singles (distinct docs)
        "a&b": 1, "a&c": 1, "b&c": 2,  # name-sorted intersections
    }


# --------------------------------- pipeline aggs 2 / terms_set / suggester

def test_datehist_pipeline2_invariants(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast"]
    # selector off (min_hits=0): cum is a running total ending at the
    # histogram's grand total; shares sum to 1; head sdiff == n_hits
    rows = sorted(
        se.datehist_pipeline2(docs, postings, q, bucket_secs=3600,
                              lag=2, min_hits=0).collect(),
        key=lambda r: r["bucket_epoch"],
    )
    total = sum(r["n_hits"] for r in rows)
    running = 0
    for i, r in enumerate(rows):
        running += r["n_hits"]
        assert r["cum_hits"] == running
        expect_lag = rows[i - 2]["n_hits"] if i >= 2 else 0
        assert r["sdiff"] == r["n_hits"] - expect_lag
    assert rows[-1]["cum_hits"] == total
    assert sum(r["share"] for r in rows) == pytest.approx(1.0, abs=1e-2)
    # selector on: only the filtered buckets disappear, metrics unchanged
    kept = sorted(
        se.datehist_pipeline2(docs, postings, q, bucket_secs=3600,
                              lag=2, min_hits=2).collect(),
        key=lambda r: r["bucket_epoch"],
    )
    by_epoch = {r["bucket_epoch"]: r for r in rows}
    assert all(r["n_hits"] >= 2 for r in kept)
    for r in kept:
        assert by_epoch[r["bucket_epoch"]]["cum_hits"] == r["cum_hits"]


def test_terms_set_dynamic_threshold(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "merge"]
    rows = se.terms_set_query(docs, postings, q).collect()
    assert rows, "fixture must produce terms_set hits"
    for r in rows:
        assert r["required"] == min(3, r["doc_id"] % 3 + 1)
        assert r["n_matched"] >= r["required"]
    # clamp: a single-candidate query can satisfy docs whose field says 3
    one = se.terms_set_query(docs, postings, ["data"]).collect()
    assert any(r["doc_id"] % 3 + 1 == 3 and r["required"] == 1 for r in one)


def test_term_suggester_ranks_and_excludes_exact(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    got = se.term_suggester(td, "dta", max_edits=2, k=10).collect()
    assert got, "dictionary must contain distance<=2 candidates for 'dta'"
    assert all(s["suggestion"] != "dta" for s in got)
    assert all(1 <= s["distance"] <= 2 for s in got)
    keys = [(s["distance"], -s["df"], s["suggestion"]) for s in got]
    assert keys == sorted(keys)
    assert any(s["suggestion"] == "data" for s in got)


def test_auto_date_histogram_targets_bucket_count(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    rows = se.auto_date_histogram(docs, postings, ["data", "fast"],
                                  target_buckets=20).collect()
    assert rows
    ivs = {r["interval_secs"] for r in rows}
    assert len(ivs) == 1 and ivs.pop() in se.AUTO_DH_LADDER
    # bucket count within target unless the ladder topped out
    if rows[0]["interval_secs"] != se.AUTO_DH_LADDER[-1]:
        assert len(rows) <= 20
    # conservation: bucketed hits == conjunctive hit count
    n_hits = se._conjunctive_hits(postings, ["data", "fast"]).count()
    assert sum(r["n_hits"] for r in rows) == n_hits
    # absent term -> empty
    assert se.auto_date_histogram(docs, postings, ["zzabsent"]).count() == 0


def test_top_metrics_is_per_site_argmax(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    got = {r["site_key"]: r for r in se.top_metrics(docs).collect()}
    import pyspark.sql.functions as F
    from search_engine_spark.sources.documents import site_key_col

    manual = (
        docs.select(site_key_col().alias("site_key"), "doc_id")
        .groupBy("site_key").agg(F.max("doc_id").alias("d"))
    ).collect()
    # warc_ts = base + 60*doc_id is monotone in doc_id, so the newest doc
    # per site is simply its max doc_id
    for r in manual:
        assert got[r["site_key"]]["latest_doc_id"] == r["d"]


# ------------------------------------------------- similarity-family pins

def test_bm25_plus_is_bm25_shifted_by_delta_idf_mass(spark, ctx):
    """BM25+ decomposes exactly: for every doc the δ term adds
    δ·Σ idf(matched terms), so on a conjunctive-complete doc set
    score⁺ − score = δ·Σ_q idf — the Lv & Zhai lower-bound mass."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    base = {
        r["doc_id"]: r["score"]
        for r in se.bm25_scored(
            postings, td, ds, n, avgdl, q, conjunctive=False
        ).collect()
    }
    plus = {
        r["doc_id"]: r["score"]
        for r in se.search_bm25_plus(
            postings, td, ds, n, avgdl, q, limit=10_000
        ).collect()
    }
    idf = {
        r["term"]: se.bm25_idf(float(n), float(r["df"]))
        for r in td.filter(td.term.isin(q)).collect()
    }
    # per-doc matched-term sets (which idf mass applies depends on them)
    matched = {
        r["doc_id"]: [t for t in r["ts"]]
        for r in postings.filter(postings.term.isin(q))
        .groupBy("doc_id").agg(se.F.collect_set("term").alias("ts"))
        .collect()
    }
    assert set(plus) == set(base)
    for d, s_plus in plus.items():
        mass = sum(idf[t] for t in matched[d])
        assert s_plus == pytest.approx(base[d] + 1.0 * mass, abs=2e-4)


def test_dfr_part_score_bounded_by_information_content(spark, ctx):
    """DFR I(n)L2's after-effect damps each term part strictly below the
    term's information content log2((N+1)/(df+0.5)) — a single-term
    query's score can never exceed it, and grows with tf."""
    docs, postings, td, ds, n, avgdl = ctx
    import math
    term = "data"
    df = float(td.filter(td.term == term).collect()[0]["df"])
    info = math.log2((n + 1.0) / (df + 0.5))
    scores = se.search_dfr(
        postings, td, ds, n, avgdl, [term], limit=10_000
    ).collect()
    assert scores, "probe term must match"
    assert all(0.0 < r["score"] < info for r in scores)


def test_lmjm_absent_term_drops_out(spark, ctx):
    """Disjunctive LMJM: a corpus-absent query term contributes nothing —
    the result equals the query without it (Lucene scores hits only)."""
    docs, postings, td, ds, n, avgdl = ctx
    with_absent = se.search_lmjm(
        postings, td, ds, n, avgdl, ["data", "zzabsent"]
    ).collect()
    without = se.search_lmjm(postings, td, ds, n, avgdl, ["data"]).collect()
    assert [(r["doc_id"], r["score"]) for r in with_absent] == [
        (r["doc_id"], r["score"]) for r in without
    ]


def test_ib_tfn_monotone_in_tf(spark, ctx):
    """IB log-logistic: between two docs of equal length, the one with
    higher tf for a single-term query scores strictly higher (tfn is
    monotone in tf; ln(1 + tfn/λ) is monotone in tfn)."""
    docs, postings, td, ds, n, avgdl = ctx
    rows = (
        postings.filter(postings.term == "data")
        .join(ds, "doc_id")
        .select("doc_id", "tf", "dl")
        .collect()
    )
    by_dl = {}
    for r in rows:
        by_dl.setdefault(r["dl"], []).append((r["tf"], r["doc_id"]))
    pair = None
    for dl, lst in by_dl.items():
        tfs = sorted(set(t for t, _ in lst))
        if len(tfs) >= 2:
            lo = next(d for t, d in lst if t == tfs[0])
            hi = next(d for t, d in lst if t == tfs[-1])
            pair = (lo, hi)
            break
    if pair is None:
        pytest.skip("fixture has no equal-length tf-contrast pair")
    scores = {
        r["doc_id"]: r["score"]
        for r in se.search_ib(
            postings, td, ds, n, avgdl, ["data"], limit=10_000
        ).collect()
    }
    lo, hi = pair
    assert scores[hi] > scores[lo]


# --------------------------------------------- distributed scoring modes

def test_dfs_mode_is_exactly_global_bm25(spark, ctx):
    """dfs_query_then_fetch == the single-index disjunctive BM25 — the
    identity the extra stats round-trip buys."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    a = [(r["doc_id"], r["score"]) for r in se.search_bm25_sharded(
        postings, td, ds, n, avgdl, q, dfs=True).collect()]
    b = [(r["doc_id"], r["score"]) for r in se.search_bm25(
        postings, td, ds, n, avgdl, q, conjunctive=False).collect()]
    assert a == b


def test_single_shard_local_equals_global(spark, ctx):
    """With one shard, local statistics ARE the global statistics."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    a = [(r["doc_id"], r["score"]) for r in se.search_bm25_sharded(
        postings, td, ds, n, avgdl, q, n_shards=1).collect()]
    b = [(r["doc_id"], r["score"]) for r in se.search_bm25_sharded(
        postings, td, ds, n, avgdl, q, dfs=True).collect()]
    assert a == b


def test_local_idf_skew_changes_scores(spark):
    """The query_then_fetch artifact, crafted: 'rare' lives ONLY on shard
    0 docs, so shard 0 sees df_s=4/N_s=4 (idf ≈ ln(1+1/4.5)) while the
    global view has df=4/N=8 — local and global scores must differ, and
    the other shards' docs simply don't match."""
    import search_engine_spark.operators.index_build as ib

    rows = []
    for i in range(8):
        tok = "rare" if i % 2 == 0 else "filler"
        rows.append((i, f"u{i}", f"{tok} common words here"))
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    postings = ib.build_postings(docs)
    td = ib.build_term_dict(postings)
    ds = ib.build_doc_stats(docs, postings)
    n, avgdl = ib.corpus_stats(docs, ds)
    local = {r["doc_id"]: r["score"] for r in se.search_bm25_sharded(
        postings, td, ds, n, avgdl, ["rare"], n_shards=2).collect()}
    glob = {r["doc_id"]: r["score"] for r in se.search_bm25_sharded(
        postings, td, ds, n, avgdl, ["rare"], dfs=True).collect()}
    assert set(local) == set(glob)  # same matching docs
    assert all(local[d] != glob[d] for d in local)  # different scores


# ------------------------------------------------- common terms query

def test_common_terms_selected_by_rare_scored_by_all(spark, ctx):
    """'dup' (rare) selects; every hit contains it. Scores equal the
    full disjunctive BM25 on the selected set — high terms boost but
    cannot admit."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["dup", "data", "fast"]
    hits = se.search_common_terms(
        postings, td, ds, n, avgdl, q, limit=10_000
    ).collect()
    assert hits
    dup_docs = {
        r["doc_id"] for r in postings.filter(postings.term == "dup").collect()
    }
    assert {r["doc_id"] for r in hits} <= dup_docs
    full = {
        r["doc_id"]: r["score"]
        for r in se.bm25_scored(
            postings, td, ds, n, avgdl, q, conjunctive=False
        ).collect()
    }
    for r in hits:
        assert r["score"] == full[r["doc_id"]]


def test_common_terms_all_high_equals_conjunctive_bm25(spark, ctx):
    """cutoff=0 makes every term high → Lucene's fallback: the high
    group selects conjunctively; equals search_bm25 conjunctive."""
    docs, postings, td, ds, n, avgdl = ctx
    q = ["data", "fast", "join"]
    a = [(r["doc_id"], r["score"]) for r in se.search_common_terms(
        postings, td, ds, n, avgdl, q, cutoff=0.0).collect()]
    b = [(r["doc_id"], r["score"]) for r in se.search_bm25(
        postings, td, ds, n, avgdl, q, conjunctive=True).collect()]
    assert a == b and a


def test_common_terms_absent_required_term_empties(spark, ctx):
    docs, postings, td, ds, n, avgdl = ctx
    assert se.search_common_terms(
        postings, td, ds, n, avgdl, ["data", "zzabsent"]
    ).collect() == []


def test_bool_prefix_supersets_exact_and_relaxes_phrase_prefix(spark, ctx):
    """bool_prefix's hit set ⊇ the exact-terms-only OR query (the prefix
    expansion can only add matching terms), and the expansion really
    fires (some hit matches only via a 'fa*' expansion term)."""
    docs, postings, td, ds, n, avgdl = ctx
    bp = {r["doc_id"]: r["score"] for r in se.search_bool_prefix(
        postings, td, ds, n, avgdl, ["data"], "fa", limit=10_000).collect()}
    exact = {r["doc_id"] for r in se.bm25_scored(
        postings, td, ds, n, avgdl, ["data"], conjunctive=False).collect()}
    assert exact <= set(bp)
    expansions = {r["term"] for r in td.filter(
        td.term.startswith("fa")).collect()}
    assert expansions  # the fixture has fa* vocabulary
    only_prefix = set(bp) - exact
    # docs matching only through the expansion exist on this fixture
    assert only_prefix or exact == set(bp)
