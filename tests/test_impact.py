"""Unit tests for operators/impact.py — Anh-Moffat quantized impact
postings (oracle parity at fixture scale: impact_postings /
search_impact)."""

import math

import __spark_entry__ as entrymod
from search_engine_spark.operators import search as se
from search_engine_spark.operators.impact import (
    QUANT_LEVELS,
    QUANT_SCALE,
    quantized_impacts,
    search_impact,
)
from tests.conftest import SF_TEST


def _crafted(spark):
    postings = spark.createDataFrame(
        [(1, "data", 2), (1, "rare", 100), (2, "data", 1)],
        "doc_id long, term string, tf long",
    )
    term_dict = spark.createDataFrame(
        [("data", 2), ("rare", 1)], "term string, df long"
    )
    doc_stats = spark.createDataFrame(
        [(1, 10), (2, 10)], "doc_id long, dl long"
    )
    return postings, term_dict, doc_stats


def test_quantized_impact_exact_value(spark):
    postings, term_dict, doc_stats = _crafted(spark)
    n_docs, avgdl = 2, 10.0
    got = {
        (r["doc_id"], r["term"]): r["impact"]
        for r in quantized_impacts(
            postings, term_dict, doc_stats, n_docs, avgdl
        ).collect()
    }

    def expect(tf, df):
        idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        part = idf * (tf * 2.2) / (tf + 1.2 * (1 - 0.75 + 0.75 * 1.0))
        return min(QUANT_LEVELS - 1, math.floor(round(part, 6) * QUANT_SCALE))

    assert got[(1, "data")] == expect(2.0, 2.0)
    assert got[(2, "data")] == expect(1.0, 2.0)
    assert got[(1, "rare")] == expect(100.0, 1.0)


def test_quantized_impact_saturates_at_max_level(spark):
    """A df=1 term in a huge corpus with a short doc exceeds the 8-bit
    range and must clamp to QUANT_LEVELS-1, not overflow."""
    postings, term_dict, doc_stats = _crafted(spark)
    got = {
        (r["doc_id"], r["term"]): r["impact"]
        for r in quantized_impacts(
            postings, term_dict, doc_stats, n_docs=1_000_000, avgdl=500.0
        ).collect()
    }
    assert got[(1, "rare")] == QUANT_LEVELS - 1
    assert all(0 <= v <= QUANT_LEVELS - 1 for v in got.values())


def test_impact_range_on_fixture(spark):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, SF_TEST
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    stats = imp.selectExpr(
        "min(impact) AS lo", "max(impact) AS hi", "count(*) AS n"
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] <= QUANT_LEVELS - 1
    assert stats["n"] == postings.count()  # one impact per posting


def test_search_impact_partition_invariant(spark):
    """Integer impact sums are exact under any partitioning (the property
    float scores only have after rounding)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, SF_TEST
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    a = [tuple(r) for r in search_impact(imp, entrymod.Q_BM25).collect()]
    b = [
        tuple(r)
        for r in search_impact(imp.repartition(7), entrymod.Q_BM25).collect()
    ]
    assert a == b


def test_search_impact_topk_tracks_exact_bm25(spark):
    """Quantization error is bounded (≤ |q|/QUANT_SCALE per doc), so the
    impact top-10 must substantially overlap the exact float BM25 OR
    top-10 — pin a floor on the fixture."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, SF_TEST
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    approx = {
        r["doc_id"] for r in search_impact(imp, entrymod.Q_BM25, k=10).collect()
    }
    exact = {
        r["doc_id"]
        for r in se.search_bm25(
            postings, term_dict, doc_stats, n_docs, avgdl, entrymod.Q_BM25,
            limit=10, conjunctive=False,
        ).collect()
    }
    assert len(approx & exact) >= 7


def test_search_impact_empty_terms(spark):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, SF_TEST
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    assert search_impact(imp, []).count() == 0


def test_anytime_bound_brackets_exhaustive(spark):
    """For every returned doc: score_q <= true <= score_q + error_ub,
    with the exhaustive integer scorer as truth; budget large enough
    collapses the bound to 0 and reproduces search_impact exactly."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, entrymod.SF0001
    )
    from search_engine_spark.operators.impact import search_impact_anytime

    imp = quantized_impacts(
        postings, term_dict, doc_stats, n_docs, avgdl
    ).persist()
    truth = {
        r["doc_id"]: r["score_q"]
        for r in search_impact(imp, entrymod.Q_BM25, k=10**6).collect()
    }
    tight = search_impact_anytime(
        imp, entrymod.Q_BM25, k=10**6, budget_per_bucket=3
    ).collect()
    assert any(r["error_ub"] > 0 for r in tight)  # the cut really cut
    for r in tight:
        t = truth[r["doc_id"]]
        assert r["score_q"] <= t <= r["score_q"] + r["error_ub"], r.asDict()
    loose = search_impact_anytime(
        imp, entrymod.Q_BM25, k=10**6, budget_per_bucket=10**6
    ).collect()
    assert all(r["error_ub"] == 0 for r in loose)
    assert {r["doc_id"]: r["score_q"] for r in loose} == truth
    imp.unpersist()


def test_anytime_prefix_is_highest_impact(spark):
    """Crafted run: with budget 1 per bucket, only each (bucket, term)'s
    highest-impact posting scores, and every unseen doc's potential is
    bounded by that bucket's cutoff."""
    from search_engine_spark.operators.impact import search_impact_anytime

    imp = spark.createDataFrame(
        # one bucket (doc_ids ≡ 0 mod 16), one term, impacts 9 > 7 > 3
        [("a", 0, 9), ("a", 16, 7), ("a", 32, 3)],
        "term string, doc_id long, impact int",
    )
    rows = search_impact_anytime(
        imp, ["a"], budget_per_bucket=1, n_buckets=16
    ).collect()
    assert [(r["doc_id"], r["score_q"], r["error_ub"]) for r in rows] == [
        (0, 9, 0)  # the evaluated doc saw its term: no residual error
    ]


def test_champions_bound_brackets_exhaustive(spark):
    """Persisted champion lists: for every returned doc score_q <= true
    <= score_q + error_ub; an oversized budget collapses the bound and
    reproduces search_impact exactly (round-3 serving surface)."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, entrymod.SF0001
    )
    imp = quantized_impacts(
        postings, term_dict, doc_stats, n_docs, avgdl
    ).persist()
    truth = {
        r["doc_id"]: r["score_q"]
        for r in search_impact(imp, entrymod.Q_BM25, k=10**6).collect()
    }
    tight = search_champions(
        champion_lists(imp, budget_per_bucket=3), entrymod.Q_BM25, k=10**6
    ).collect()
    assert any(r["error_ub"] > 0 for r in tight)  # the prune really cut
    for r in tight:
        t = truth[r["doc_id"]]
        assert r["score_q"] <= t <= r["score_q"] + r["error_ub"], r.asDict()
    loose = search_champions(
        champion_lists(imp, budget_per_bucket=10**6), entrymod.Q_BM25, k=10**6
    ).collect()
    assert all(r["error_ub"] == 0 for r in loose)
    assert {r["doc_id"]: r["score_q"] for r in loose} == truth
    imp.unpersist()


def test_champions_matches_anytime_semantics(spark):
    """champion_lists + search_champions == search_impact_anytime at the
    same budget: the persisted table carries exactly the state the
    query-time twin recomputes (cutoffs included)."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions,
        search_impact_anytime,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, entrymod.SF0001
    )
    imp = quantized_impacts(
        postings, term_dict, doc_stats, n_docs, avgdl
    ).persist()
    a = sorted(
        map(
            tuple,
            search_champions(
                champion_lists(imp, budget_per_bucket=3),
                entrymod.Q_BM25,
                k=10**6,
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            search_impact_anytime(
                imp, entrymod.Q_BM25, k=10**6, budget_per_bucket=3
            ).collect(),
        )
    )
    assert a == b and a
    imp.unpersist()


def test_champions_crafted_cutoff_rows(spark):
    """Crafted single run, budget 1, level-aligned cut: the kept row is
    the highest impact; the boundary level {9} is thin (1 row ≤ cap 2)
    so the stored cutoff is v−1 = 8 — strictly below every kept impact
    — and an unmatched query term contributes nothing."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions,
    )

    imp = spark.createDataFrame(
        [("a", 0, 9), ("a", 16, 7), ("a", 32, 3)],
        "term string, doc_id long, impact int",
    )
    ch = champion_lists(imp, budget_per_bucket=1, n_buckets=16).collect()
    assert [(r["doc_bucket"], r["term"], r["doc_id"], r["impact"], r["cutoff"])
            for r in ch] == [(0, "a", 0, 9, 8)]
    rows = search_champions(
        champion_lists(imp, budget_per_bucket=1, n_buckets=16),
        ["a", "zz"],
    ).collect()
    assert [(r["doc_id"], r["score_q"], r["error_ub"]) for r in rows] == [
        (0, 9, 0)
    ]


def test_champions_level_aligned_cut_branches(spark):
    """The three branches of the level-aligned cut (r04-verdict #2),
    budget 1 / cap 2, each on its own crafted run:

      * thin boundary level, tail below → keep the level, cutoff v−1;
      * boundary level exhausts the run → COMPLETE (cutoff 0) even
        though n_run > budget;
      * fat boundary level (> cap rows) → mid-level fallback: top-budget
        prefix kept, cutoff = v (the old sound-but-loose bound);
      * v == 1 floors at 1 (cutoff 0 must still mean complete)."""
    from search_engine_spark.operators.impact import champion_lists

    imp = spark.createDataFrame(
        [
            # bucket 0: impacts [9, 9, 3] — level {9} has 2 rows ≤ cap,
            # tail 3 exists → keep BOTH 9s (beyond budget 1), cutoff 8
            ("a", 0, 9), ("a", 16, 9), ("a", 32, 3),
            # bucket 1: impacts [5, 5] — level {5} exhausts the run →
            # complete, cutoff 0, both rows kept
            ("a", 1, 5), ("a", 17, 5),
            # bucket 2: impacts [7, 7, 7, 2] — level {7} has 3 rows >
            # cap 2 → mid-level fallback: keep top-1, cutoff 7
            ("a", 2, 7), ("a", 18, 7), ("a", 34, 7), ("a", 50, 2),
            # bucket 3: impacts [1, 1, 0] — level {1} thin (2 ≤ cap),
            # tail 0 exists → cutoff max(1, 1-1) = 1 (floor keeps
            # truncated ≠ complete)
            ("a", 3, 1), ("a", 19, 1), ("a", 35, 0),
        ],
        "term string, doc_id long, impact int",
    )
    ch = sorted(
        (r["doc_bucket"], r["doc_id"], r["impact"], r["cutoff"])
        for r in champion_lists(
            imp, budget_per_bucket=1, n_buckets=16, level_cap_factor=2.0
        ).collect()
    )
    assert ch == [
        (0, 0, 9, 8), (0, 16, 9, 8),
        (1, 1, 5, 0), (1, 17, 5, 0),
        (2, 2, 7, 7),
        (3, 3, 1, 1), (3, 19, 1, 1),
    ]
    # factor 0 reproduces the pre-r05 strict top-budget mid-level cut
    old = sorted(
        (r["doc_bucket"], r["doc_id"], r["impact"], r["cutoff"])
        for r in champion_lists(
            imp, budget_per_bucket=1, n_buckets=16, level_cap_factor=0.0
        ).collect()
    )
    assert old == [
        (0, 0, 9, 9),
        (1, 1, 5, 5),
        (2, 2, 7, 7),
        (3, 3, 1, 1),
    ]


def test_champions_and_semantics(spark):
    """Conjunctive champion serving: every CERTAIN doc is a true
    conjunctive match with its exact integer score; every returned
    MAYBE doc's true conjunctive status is consistent with its bound
    (if it truly matches, its true score is inside [score_q, score_q +
    error_ub]); no truly-matching doc that appears in any prefix is
    eliminated."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions_and,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, entrymod.SF0001
    )
    imp = quantized_impacts(
        postings, term_dict, doc_stats, n_docs, avgdl
    ).persist()
    q = entrymod.Q_BM25
    truth = {
        r["doc_id"]: r["score_q"]
        for r in imp.filter(F.col("term").isin(q))
        .groupBy("doc_id")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.count_distinct("term").alias("nt"),
        )
        .filter(F.col("nt") == len(set(q)))
        .collect()
    }
    assert truth  # the fixture has conjunctive matches
    got = search_champions_and(
        champion_lists(imp, budget_per_bucket=8), q, k=10**6
    ).collect()
    certain = [r for r in got if r["certain"]]
    assert certain
    for r in certain:
        assert r["error_ub"] == 0
        assert truth.get(r["doc_id"]) == r["score_q"], r.asDict()
    for r in got:
        if not r["certain"] and r["doc_id"] in truth:
            t = truth[r["doc_id"]]
            assert r["score_q"] <= t <= r["score_q"] + r["error_ub"]
    # oversized budget: every run complete -> output IS the exact
    # conjunctive integer ranking, all certain, zero error
    loose = search_champions_and(
        champion_lists(imp, budget_per_bucket=10**6), q, k=10**6
    ).collect()
    assert all(r["certain"] and r["error_ub"] == 0 for r in loose)
    assert {r["doc_id"]: r["score_q"] for r in loose} == truth
    imp.unpersist()


def test_champions_and_complete_run_eliminates(spark):
    """Crafted: term 'b' has a COMPLETE run (fits budget) not containing
    doc 16 -> doc 16 is eliminated, not flagged maybe; term 'a' run is
    truncated so doc 16 would otherwise be a candidate via 'a'."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions_and,
    )

    imp = spark.createDataFrame(
        # bucket 0 (mod 16): a -> docs {0,16,32}, b -> {0} only
        [("a", 0, 9), ("a", 16, 7), ("a", 32, 3), ("b", 0, 5)],
        "term string, doc_id long, impact int",
    )
    rows = search_champions_and(
        champion_lists(imp, budget_per_bucket=1, n_buckets=16), ["a", "b"]
    ).collect()
    # doc 0: seen in both prefixes -> certain, exact 14
    # doc 16/32: absent from b's COMPLETE run -> eliminated
    assert [(r["doc_id"], r["score_q"], r["error_ub"], r["certain"])
            for r in rows] == [(0, 14, 0, True)]


def test_champion_lists_plan_has_no_join(spark):
    """The cutoff column rides the SAME (doc_bucket, term) window
    partitioning as the prefix rank — no self-join, and in particular
    no broadcast of a vocabulary-scale cutoff relation (the r03-flagged
    driver-OOM hazard at 10M-term × 4096-bucket sharding). A refactor
    reintroducing the join shape fails here."""
    from search_engine_spark.operators.impact import champion_lists

    imp = spark.createDataFrame(
        [("a", 0, 9), ("a", 16, 7), ("b", 3, 5)],
        "term string, doc_id long, impact int",
    )
    plan = (
        champion_lists(imp, budget_per_bucket=1, n_buckets=16)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert "BroadcastExchange" not in plan


def _impacts_fixture(spark):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = entrymod._bm25_ctx(
        spark, SF_TEST
    )
    return quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)


def test_two_tier_equals_exact_across_queries(spark):
    """The composed two-tier serve (champions + maybe-band rescope) is
    value-identical to the exact conjunctive ranking for 1/2/3-term
    queries, a stopword query and an absent term — at the tight budget
    (8) where many runs truncate AND at a loose budget where none do."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_impact_and,
        search_two_tier,
    )

    imp = _impacts_fixture(spark).persist()
    try:
        for budget in (2, 8, 10_000):
            ch = champion_lists(imp, budget_per_bucket=budget).persist()
            for q in (["data"], ["data", "fast"], ["dup", "data", "fast"],
                      ["the"], ["data", "zzabsent"]):
                got = [
                    (r["doc_id"], r["score_q"])
                    for r in search_two_tier(imp, ch, q).collect()
                ]
                want = [
                    (r["doc_id"], r["score_q"])
                    for r in search_impact_and(imp, q).collect()
                ]
                assert got == want, (budget, q)
            ch.unpersist()
    finally:
        imp.unpersist()


def test_two_tier_scope_containment(spark):
    """The exact tier touches ONLY the maybe band: rescoped buckets are
    all-runs-truncated ones, per-doc rescopes are uncertain candidates
    (never certain docs), and at a budget where nothing truncates the
    rescope set is empty — the serve never leaves the champion table."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions_and,
        search_two_tier,
    )

    imp = _impacts_fixture(spark).persist()
    try:
        q = ["dup", "data", "fast"]
        ch = champion_lists(imp, budget_per_bucket=8).persist()
        diag: dict = {}
        # fallback disabled: this test pins the SLICE machinery's scope
        # containment, which the r05 exact-path fallback legitimately
        # skips when the rescope covers most buckets
        search_two_tier(imp, ch, q, diag=diag, fallback_frac=2.0).collect()
        # every per-doc rescope is an UNCERTAIN tier-1 candidate
        from search_engine_spark.operators.impact import (
            _champions_and_scored,
        )

        scored, census = _champions_and_scored(ch, sorted(set(q)))
        certain_ids = {
            r["doc_id"]
            for r in scored.filter("certain").select("doc_id").collect()
        }
        maybe_ids = {
            r["doc_id"]
            for r in scored.filter("NOT certain").select("doc_id").collect()
        }
        assert set(diag["maybe_doc_ids"]).isdisjoint(certain_ids)
        assert set(diag["maybe_doc_ids"]) <= maybe_ids
        # rescoped buckets hold NO complete run (the only shape that can
        # hide a conjunctive match from tier 1)
        trunc_only = {
            r["doc_bucket"]
            for r in census.collect()
            if r["n_complete"] == 0 and r["n_runs"] == len(set(q))
        }
        assert set(diag["rescope_buckets"]) <= trunc_only
        ch.unpersist()

        # loose budget: nothing truncates → zero rescope anywhere
        ch_all = champion_lists(imp, budget_per_bucket=10_000)
        diag2: dict = {}
        rows = search_two_tier(imp, ch_all, q, diag=diag2).collect()
        assert diag2["rescope_buckets"] == []
        assert diag2["n_maybe_rescoped"] == 0
        # and tier 1 alone already equals the serve (all certain)
        t1 = search_champions_and(ch_all, q).collect()
        assert [(r["doc_id"], r["score_q"]) for r in rows] == [
            (r["doc_id"], r["score_q"]) for r in t1
        ]
    finally:
        imp.unpersist()


def test_two_tier_all_rescope_fallback(spark):
    """r04-verdict #1: when the census + θ probe show the rescope set
    covering ≥ fallback_frac of the buckets, the serve takes the plain
    exact path (no slice machinery) — and both routes stay
    value-identical to the exact ranking. A budget-1 champion table
    truncates every run, so every bucket rescopes → fallback fires."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_impact,
        search_impact_and,
        search_two_tier,
        search_two_tier_or,
    )

    imp = _impacts_fixture(spark).persist()
    try:
        q = ["data", "fast"]
        ch = champion_lists(imp, budget_per_bucket=1).persist()
        diag: dict = {}
        got = [
            (r["doc_id"], r["score_q"])
            for r in search_two_tier(imp, ch, q, diag=diag).collect()
        ]
        assert diag["fallback"] is True
        want = [
            (r["doc_id"], r["score_q"])
            for r in search_impact_and(imp, q).collect()
        ]
        assert got == want
        # forcing the slice path on the same shape gives the same values
        diag2: dict = {}
        forced = [
            (r["doc_id"], r["score_q"])
            for r in search_two_tier(
                imp, ch, q, diag=diag2, fallback_frac=2.0
            ).collect()
        ]
        assert diag2["fallback"] is False
        assert forced == want
        # OR variant falls back to the exact disjunctive ranking
        diag3: dict = {}
        got_or = [
            (r["doc_id"], r["score_q"])
            for r in search_two_tier_or(imp, ch, q, diag=diag3).collect()
        ]
        assert diag3["fallback"] is True
        assert got_or == [
            (r["doc_id"], r["score_q"])
            for r in search_impact(imp, q).collect()
        ]
        ch.unpersist()
        # loose budget: nothing truncates, fallback must NOT fire
        ch_all = champion_lists(imp, budget_per_bucket=10_000)
        diag4: dict = {}
        search_two_tier(imp, ch_all, q, diag=diag4).collect()
        assert diag4["fallback"] is False
    finally:
        imp.unpersist()


def test_champion_lists_from_store_bit_identical(spark, tmp_path):
    """The store-folded champion build (decode committed blocks →
    quantize → window; NO re-tokenize) emits the bit-identical table to
    the from-postings path — the r03 #3 fold-in is a pure cost change."""
    from search_engine_spark import catalog
    from search_engine_spark.operators.impact import (
        champion_lists,
        champion_lists_from_store,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    store = catalog.IndexStore(spark, str(tmp_path / "idx"), n_buckets=8)
    catalog.build_persistent(docs, store)
    stats = store.read_corpus_stats()

    got = champion_lists_from_store(
        store.read_blocks(),
        store.read_term_dict(),
        store.read_doc_stats(),
        stats["n_docs"],
        float(stats["avgdl"]),
        budget_per_bucket=8,
    )
    docs2, postings, term_dict, doc_stats, n_docs, avgdl = (
        entrymod._bm25_ctx(spark, SF_TEST)
    )
    want = champion_lists(
        quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl),
        budget_per_bucket=8,
    )
    g = sorted((tuple(r) for r in got.collect()))
    w = sorted((tuple(r) for r in want.collect()))
    assert g == w and len(g) > 0


def test_champion_lists_fused_bit_identical(spark, tmp_path):
    """The one-pass block-level champion build (numpy quantize+select
    inside applyInPandas, dl from dl_bytes, df via vocab-scale join —
    zero corpus-scale shuffles) emits the bit-identical table to the
    window path, at budgets that truncate and budgets that don't."""
    from search_engine_spark import catalog
    from search_engine_spark.operators.impact import (
        champion_lists,
        champion_lists_fused,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    store = catalog.IndexStore(spark, str(tmp_path / "idx"), n_buckets=8)
    catalog.build_persistent(docs, store)
    stats = store.read_corpus_stats()
    docs2, postings, term_dict, doc_stats, n_docs, avgdl = (
        entrymod._bm25_ctx(spark, SF_TEST)
    )
    for budget, champ_nb in ((8, 8), (3, 16), (10_000, 8)):
        got = sorted(
            tuple(r)
            for r in champion_lists_fused(
                store.read_blocks(),
                store.read_term_dict(),
                stats["n_docs"],
                float(stats["avgdl"]),
                budget_per_bucket=budget,
                n_buckets=champ_nb,
                store_n_buckets=8,
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in champion_lists(
                quantized_impacts(
                    postings, term_dict, doc_stats, n_docs, avgdl
                ),
                budget_per_bucket=budget,
                n_buckets=champ_nb,
            ).collect()
        )
        assert got == want and len(got) > 0, (budget, champ_nb)


def test_champion_fused_rejects_non_nesting_buckets(spark, tmp_path):
    import pytest as _pytest

    from search_engine_spark.operators.impact import champion_lists_fused

    blocks = spark.createDataFrame(
        [], "doc_bucket int, term string, count int, doc_bytes binary,"
        " tf_bytes binary, dl_bytes binary"
    )
    td = spark.createDataFrame([], "term string, df long")
    with _pytest.raises(ValueError):
        champion_lists_fused(
            blocks, td, 1, 1.0, n_buckets=8, store_n_buckets=16
        )


def test_engine_two_tier_facade(spark):
    """engine.search_two_tier == the exact conjunctive impact ranking
    over the engine's own index (facade wiring: fused champion build +
    decoded impacts share the engine's doc_bucket sharding)."""
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.operators.impact import search_impact_and

    eng = SearchEngine(spark, sf_dir=SF_TEST, n_buckets=8).build()
    got = [
        (r["doc_id"], r["score_q"])
        for r in eng.search_two_tier("data fast join", k=20,
                                     budget_per_bucket=4).collect()
    ]
    docs, postings, term_dict, doc_stats, n_docs, avgdl = (
        entrymod._bm25_ctx(spark, SF_TEST)
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    want = [
        (r["doc_id"], r["score_q"])
        for r in search_impact_and(imp, ["data", "fast", "join"]).collect()
    ]
    assert got == want and len(got) > 0
    # r05 (r04 ADVICE): budget sweep is LRU-capped — the cache never
    # pins more than CHAMPION_CACHE_MAX champion tables, evicted
    # tables are unpersisted, and evict_impact_cache() drops it all
    for b in (2, 3, 5, 6, 8, 12):
        eng.search_two_tier("data fast", k=5, budget_per_bucket=b).collect()
    champ_keys = [
        kk for kk in eng._impact_cache if isinstance(kk, tuple)
    ]
    assert len(champ_keys) == eng.CHAMPION_CACHE_MAX
    assert ("champs", 12) in eng._impact_cache  # most recent kept
    assert ("champs", 2) not in eng._impact_cache  # oldest evicted
    assert "impacts" in eng._impact_cache  # budget-independent, exempt
    # re-using a cached budget refreshes its LRU slot
    eng.search_two_tier("data", k=5, budget_per_bucket=6).collect()
    eng.search_two_tier("data", k=5, budget_per_bucket=99).collect()
    assert ("champs", 6) in eng._impact_cache
    eng.evict_impact_cache()
    assert not eng._impact_cache
    # and the facade still serves after a full eviction (rebuilds)
    again = [
        (r["doc_id"], r["score_q"])
        for r in eng.search_two_tier("data fast join", k=20,
                                     budget_per_bucket=4).collect()
    ]
    assert again == want


def test_impacts_from_blocks_bit_identical(spark, tmp_path):
    """On-demand impact derivation from the block store equals the
    materialized quantized_impacts table value-for-value, with and
    without the pushed term filter."""
    from search_engine_spark import catalog
    from search_engine_spark.operators.impact import impacts_from_blocks
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    store = catalog.IndexStore(spark, str(tmp_path / "idx"), n_buckets=8)
    catalog.build_persistent(docs, store)
    stats = store.read_corpus_stats()
    docs2, postings, term_dict, doc_stats, n_docs, avgdl = (
        entrymod._bm25_ctx(spark, SF_TEST)
    )
    want_all = sorted(
        (r["term"], r["doc_id"], r["impact"])
        for r in quantized_impacts(
            postings, term_dict, doc_stats, n_docs, avgdl
        ).collect()
    )
    got_all = sorted(
        (r["term"], r["doc_id"], r["impact"])
        for r in impacts_from_blocks(
            store.read_blocks(), store.read_term_dict(),
            stats["n_docs"], float(stats["avgdl"]),
        ).collect()
    )
    assert got_all == want_all and len(got_all) > 0
    q = ["data", "fast", "join"]
    got_q = sorted(
        (r["term"], r["doc_id"], r["impact"])
        for r in impacts_from_blocks(
            store.read_blocks(), store.read_term_dict(),
            stats["n_docs"], float(stats["avgdl"]), terms=q,
        ).collect()
    )
    assert got_q == [t for t in want_all if t[0] in set(q)]
    # the store bucket column is the champion bucket under matched
    # sharding: pmod(doc_id, 8)
    for r in impacts_from_blocks(
        store.read_blocks(), store.read_term_dict(),
        stats["n_docs"], float(stats["avgdl"]), terms=["data"],
    ).collect():
        assert r["doc_bucket"] == r["doc_id"] % 8


def test_refresh_champions_converges_to_rebuild(spark, tmp_path):
    """After an incremental reindex, refreshing ONLY the touched
    buckets' champion runs (epoch stats) equals a full fused rebuild
    over the updated blocks bit-for-bit, and untouched buckets' rows
    pass through verbatim."""
    from pyspark.sql import functions as F

    from search_engine_spark import catalog
    from search_engine_spark.operators.impact import (
        champion_lists_fused,
        refresh_champions,
    )
    from search_engine_spark.operators.incremental import reindex_docs
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    store = catalog.IndexStore(spark, str(tmp_path / "idx"), n_buckets=8)
    catalog.build_persistent(docs, store)
    stats = store.read_corpus_stats()
    epoch_td = store.read_term_dict().persist()
    epoch = (stats["n_docs"], float(stats["avgdl"]))

    champs0 = champion_lists_fused(
        store.read_blocks(), epoch_td, *epoch,
        budget_per_bucket=8, n_buckets=8, store_n_buckets=8,
    ).persist()

    # reindex one page with changed text (new + removed terms)
    target = docs.select("doc_id").limit(1).collect()[0]["doc_id"]
    changed = docs.filter(F.col("doc_id") == target).withColumn(
        "text", F.lit("freshword data data scan")
    )
    report = reindex_docs(store, changed)
    assert report["touched_buckets"]

    refreshed = refresh_champions(
        champs0, store.read_blocks(), epoch_td, *epoch,
        report["touched_buckets"], budget_per_bucket=8, n_buckets=8, store_n_buckets=8,
    )
    rebuilt = champion_lists_fused(
        store.read_blocks(), epoch_td, *epoch,
        budget_per_bucket=8, n_buckets=8, store_n_buckets=8,
    )
    got = sorted(tuple(r) for r in refreshed.collect())
    want = sorted(tuple(r) for r in rebuilt.collect())
    assert got == want and len(got) > 0
    # untouched buckets: rows preserved verbatim from the original table
    untouched = [
        b for b in range(8) if b not in set(report["touched_buckets"])
    ]
    keep0 = sorted(
        tuple(r)
        for r in champs0.filter(
            F.col("doc_bucket").isin(untouched)
        ).collect()
    )
    keep1 = sorted(
        t for t in got if (t[0] % 8) in set(untouched)
    )
    assert keep0 == keep1
    # no-op refresh returns the input relation unchanged
    assert refresh_champions(
        champs0, store.read_blocks(), epoch_td, *epoch, [],
        budget_per_bucket=8, n_buckets=8, store_n_buckets=8,
    ) is champs0
    champs0.unpersist()
    epoch_td.unpersist()


def test_two_tier_or_equals_exact_across_budgets(spark):
    """The disjunctive two-tier serve equals search_impact (exact OR
    ranking) across truncating and non-truncating budgets and query
    shapes (1/2/3 terms, stopword, absent term)."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_two_tier_or,
    )

    imp = _impacts_fixture(spark).persist()
    try:
        for budget in (2, 8, 10_000):
            ch = champion_lists(imp, budget_per_bucket=budget).persist()
            for q in (["data"], ["data", "fast"], ["dup", "data", "fast"],
                      ["the"], ["data", "zzabsent"]):
                got = [
                    (r["doc_id"], r["score_q"])
                    for r in search_two_tier_or(imp, ch, q).collect()
                ]
                want = [
                    (r["doc_id"], r["score_q"])
                    for r in search_impact(imp, q).collect()
                ]
                assert got == want, (budget, q)
            ch.unpersist()
    finally:
        imp.unpersist()


def test_champions_batch_equals_per_query(spark):
    """Batch champion serving returns exactly each query's
    search_champions rows (same scores, same error bounds, same
    tie-broken order per query_id)."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions,
        search_champions_batch,
    )

    imp = _impacts_fixture(spark).persist()
    try:
        ch = champion_lists(imp, budget_per_bucket=3).persist()
        workload = {
            "a": ["data", "fast"],
            "b": ["dup", "data", "fast"],
            "c": ["data"],
            "d": ["zzabsent"],
        }
        out = search_champions_batch(spark, ch, workload, k=10).collect()
        by_q: dict = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score_q"], r["error_ub"])
            )
        for qid, terms in workload.items():
            want = [
                (r["doc_id"], r["score_q"], r["error_ub"])
                for r in search_champions(ch, terms, k=10).collect()
            ]
            assert by_q.get(qid, []) == want, qid
        ch.unpersist()
    finally:
        imp.unpersist()


def test_champions_batch_window_is_query_keyed(spark):
    """Plan pin: the per-query top-k window partitions on query_id
    (bounded by the workload) — never a global sort."""
    import re

    from search_engine_spark.operators.impact import (
        champion_lists,
        search_champions_batch,
    )

    imp = spark.createDataFrame(
        [("a", 0, 9), ("a", 16, 7), ("b", 3, 5)],
        "term string, doc_id long, impact int",
    )
    plan = (
        search_champions_batch(
            spark, champion_lists(imp, budget_per_bucket=1),
            {"q1": ["a"], "q2": ["b"]},
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs
    for spec in specs:
        assert "query_id" in spec or "doc_bucket" in spec, spec


def test_champion_build_resumes_after_kill(spark, tmp_path):
    """Resumable champion build: a simulated mid-build kill leaves
    committed buckets; the resume skips them, completes the rest, and
    the final table equals the one-shot fused build bit-for-bit. An
    epoch/config change invalidates all buckets instead of mixing."""
    import pytest as _pytest

    from search_engine_spark import catalog
    from search_engine_spark.operators.impact import (
        ChampionBuildFailed,
        build_champions_persistent,
        champion_lists_fused,
        read_champions_persistent,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    store = catalog.IndexStore(spark, str(tmp_path / "idx"), n_buckets=8)
    catalog.build_persistent(docs, store)
    stats = store.read_corpus_stats()
    cdir = str(tmp_path / "champs")

    with _pytest.raises(ChampionBuildFailed):
        build_champions_persistent(
            store, cdir, budget_per_bucket=8, n_buckets=8,
            groups=4, fail_after_groups=2,
        )
    report = build_champions_persistent(
        store, cdir, budget_per_bucket=8, n_buckets=8, groups=4,
    )
    assert report["skipped"] and report["built"]
    assert sorted(report["skipped"] + report["built"]) == list(range(8))

    got = sorted(
        tuple(r) for r in read_champions_persistent(spark, cdir).collect()
    )
    want = sorted(
        tuple(r)
        for r in champion_lists_fused(
            store.read_blocks(), store.read_term_dict(),
            stats["n_docs"], float(stats["avgdl"]),
            budget_per_bucket=8, n_buckets=8, store_n_buckets=8,
        ).collect()
    )
    assert got == want and len(got) > 0

    # idempotent re-run: everything already committed
    again = build_champions_persistent(
        store, cdir, budget_per_bucket=8, n_buckets=8,
    )
    assert again["built"] == [] and sorted(again["skipped"]) == list(range(8))

    # budget change = new epoch: full rebuild, not a silent mix
    changed = build_champions_persistent(
        store, cdir, budget_per_bucket=4, n_buckets=8,
    )
    assert sorted(changed["built"]) == list(range(8))


def test_persisted_serving_stack_end_to_end(spark, tmp_path):
    """The full round-4 serving stack composed from PERSISTED artifacts
    only: resumable champion store + on-demand block-derived impacts →
    two-tier serve == exact conjunctive ranking; batch serving over the
    same store == per-query serving."""
    from search_engine_spark import catalog
    from search_engine_spark.operators.impact import (
        build_champions_persistent,
        impacts_from_blocks,
        read_champions_persistent,
        search_champions,
        search_champions_batch,
        search_impact_and,
        search_two_tier,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    store = catalog.IndexStore(spark, str(tmp_path / "idx"), n_buckets=8)
    catalog.build_persistent(docs, store)
    stats = store.read_corpus_stats()
    cdir = str(tmp_path / "champs")
    build_champions_persistent(store, cdir, budget_per_bucket=8,
                               n_buckets=8)
    champs = read_champions_persistent(spark, cdir)
    q = ["data", "fast", "join"]
    imps = impacts_from_blocks(
        store.read_blocks(), store.read_term_dict(),
        stats["n_docs"], float(stats["avgdl"]), terms=q,
    )
    got = [
        (r["doc_id"], r["score_q"])
        for r in search_two_tier(imps, champs, q, n_buckets=8).collect()
    ]
    want = [
        (r["doc_id"], r["score_q"])
        for r in search_impact_and(
            impacts_from_blocks(
                store.read_blocks(), store.read_term_dict(),
                stats["n_docs"], float(stats["avgdl"]), terms=q,
            ),
            q,
        ).collect()
    ]
    assert got == want and len(got) > 0
    batch = search_champions_batch(spark, champs, {"q0": q}, k=20).collect()
    single = search_champions(champs, q, k=20).collect()
    assert [
        (r["doc_id"], r["score_q"], r["error_ub"]) for r in batch
    ] == [(r["doc_id"], r["score_q"], r["error_ub"]) for r in single]


def test_zero_impact_boundary_run_is_not_complete(spark):
    """r04 review finding: a TRUNCATED run whose budget-th impact
    quantizes to 0 must not masquerade as complete (cutoff==0) — the
    conjunctive algebra would wrongly eliminate below-prefix docs that
    DO hold the term with contribution 0. The floored cutoff (≥1 when
    truncated) keeps cutoff==0 ⟺ complete exact, and the two-tier
    serves stay value-identical to the exact rankings."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_impact_and,
        search_two_tier,
        search_two_tier_or,
    )

    # bucket 0 (doc_ids ≡ 0 mod 16): term 'z' is a boilerplate term
    # whose every posting quantizes to impact 0 — budget 1 truncates
    # with a 0-impact boundary (cutoff = last KEPT impact = 0 before the
    # floor); term 'w' gives doc 32 a conjunctive partner score. Exact
    # AND top-k must contain doc 32 (z:0 + w:9) — the pre-fix algebra
    # treated the truncated run as complete and dropped it.
    imp = spark.createDataFrame(
        [
            ("z", 0, 0), ("z", 16, 0), ("z", 32, 0),
            ("w", 16, 1), ("w", 32, 9),
        ],
        "term string, doc_id long, impact int",
    )
    ch = champion_lists(imp, budget_per_bucket=1, n_buckets=16)
    rows = {r["doc_id"]: r["cutoff"] for r in ch.filter("term = 'z'").collect()}
    assert rows == {0: 1}  # truncated: floored cutoff 1, never 0
    for fn, exact in (
        (search_two_tier, search_impact_and),
        (search_two_tier_or, None),
    ):
        got = [
            (r["doc_id"], r["score_q"])
            for r in fn(imp, ch, ["z", "w"], n_buckets=16).collect()
        ]
        if exact is not None:
            want = [
                (r["doc_id"], r["score_q"])
                for r in exact(imp, ["z", "w"]).collect()
            ]
        else:
            want = [
                (r["doc_id"], r["score_q"])
                for r in search_impact(imp, ["z", "w"]).collect()
            ]
        assert got == want, (fn.__name__, got, want)
    assert (32, 9) in [
        (r["doc_id"], r["score_q"])
        for r in search_two_tier(imp, ch, ["z", "w"], n_buckets=16).collect()
    ]


def test_two_tier_randomized_equivalence(spark):
    """Seeded randomized frames (impacts INCLUDING zeros, random
    budgets, random query subsets): both two-tier serves equal their
    exact rankings on every draw — broad-spectrum cover for the
    certainty algebra beyond the crafted cases."""
    import random

    from search_engine_spark.operators.impact import (
        champion_lists,
        search_impact_and,
        search_two_tier,
        search_two_tier_or,
    )

    rng = random.Random(20260821)
    for trial in range(5):
        rows = []
        for t in "abc":
            for did in rng.sample(range(64), rng.randint(3, 12)):
                rows.append((t, did, rng.randint(0, 6)))
        imp = spark.createDataFrame(
            rows, "term string, doc_id long, impact int"
        ).persist()
        ch = champion_lists(
            imp, budget_per_bucket=rng.choice([1, 2, 3]), n_buckets=8
        ).persist()
        q = rng.sample(["a", "b", "c"], rng.randint(1, 3))
        got_and = [
            (r["doc_id"], r["score_q"])
            for r in search_two_tier(imp, ch, q, k=50, n_buckets=8).collect()
        ]
        want_and = [
            (r["doc_id"], r["score_q"])
            for r in search_impact_and(imp, q, k=50).collect()
        ]
        assert got_and == want_and, (trial, q)
        got_or = [
            (r["doc_id"], r["score_q"])
            for r in search_two_tier_or(
                imp, ch, q, k=50, n_buckets=8
            ).collect()
        ]
        want_or = [
            (r["doc_id"], r["score_q"])
            for r in search_impact(imp, q, k=50).collect()
        ]
        assert got_or == want_or, (trial, q)
        ch.unpersist()
        imp.unpersist()


def test_engine_search_batch_facade(spark):
    """engine.search_batch == the per-query operator results on both
    serving tiers (r04-verdict #8: the dashboard facade).

    champions: each query's slice of the batch result equals
    search_champions over the SAME session-cached champion table
    (identical (doc_id, score_q, error_ub) triples in rank order).
    exact: each slice equals search_bm25 over the engine's decoded
    postings. Stopword-only queries are dropped from the workload, and
    an all-stopword workload returns an empty frame with the batch
    schema."""
    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.operators.impact import search_champions
    from search_engine_spark.operators.search import analyze_query, search_bm25

    eng = SearchEngine(spark, sf_dir=SF_TEST, n_buckets=8).build()
    workload = {
        "q_common": "data",
        "q_and2": "data fast",
        "q_and3": "data fast join",
        "q_stop": "the and of",  # analyzer-empty → dropped
    }
    # --- champions tier ---
    got = eng.search_batch(workload, k=10, budget_per_bucket=4)
    by_q: dict = {}
    for r in got.collect():
        by_q.setdefault(r["query_id"], []).append(
            (r["doc_id"], r["score_q"], r["error_ub"])
        )
    assert "q_stop" not in by_q
    champs = eng._cached_champions(4)
    for qid, q in workload.items():
        terms = analyze_query(q)
        if not terms:
            continue
        want = [
            (r["doc_id"], r["score_q"], r["error_ub"])
            for r in search_champions(champs, terms, k=10).collect()
        ]
        assert by_q.get(qid, []) == want and len(want) > 0, qid
    # --- exact tier ---
    got_x = eng.search_batch(workload, k=10, serving="exact")
    by_qx: dict = {}
    for r in got_x.collect():
        by_qx.setdefault(r["query_id"], []).append((r["doc_id"], r["score"]))
    docs, postings, term_dict, doc_stats, n_docs, avgdl = (
        entrymod._bm25_ctx(spark, SF_TEST)
    )
    for qid, q in workload.items():
        terms = analyze_query(q)
        if not terms:
            continue
        want = [
            (r["doc_id"], r["score"])
            for r in search_bm25(
                postings, term_dict, doc_stats, n_docs, avgdl, terms,
                limit=10,
            ).collect()
        ]
        assert by_qx.get(qid, []) == want and len(want) > 0, qid
    assert "q_stop" not in by_qx
    # --- degenerate workloads ---
    empty = eng.search_batch({"s": "the of"}, k=5)
    assert empty.count() == 0
    assert empty.columns == ["query_id", "doc_id", "score_q", "error_ub"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        eng.search_batch(workload, serving="wand")
    eng.evict_impact_cache()


def test_level_aligned_cut_settles_thin_level_corpus(spark):
    """The r04-verdict #2 mechanism, isolated: on a corpus whose
    quantization levels near the champion cut are THIN (distinct
    impacts), the pre-r05 mid-level cut stores cutoff = boundary level
    v, the k-th certain score ties Σ v_t, and EVERY bucket rescopes;
    the level-aligned cut keeps the same rows but bounds the tail at
    v−1, so every bucket settles WITHOUT rescope — same exact result,
    no tier-2 scan. (On tie-heavy corpora the hidden tail genuinely
    attains the bound and rescoping is REQUIRED for exactness — see
    BENCH/QUERIES.md — so this pin is on the thin-level shape the cut
    exists for.)"""
    from search_engine_spark.operators.impact import (
        champion_lists,
        search_impact_and,
        search_two_tier,
    )

    rows = []
    for b in range(4):  # doc_id % 4 buckets, identical structure
        for t in ("a", "b"):
            for i, imp_v in enumerate((10, 9, 3, 2, 1)):
                rows.append((t, b + 4 * i, imp_v))
    imp = spark.createDataFrame(
        rows, "term string, doc_id long, impact int"
    )
    q = ["a", "b"]
    want = [
        (r["doc_id"], r["score_q"])
        for r in search_impact_and(imp, q, k=6).collect()
    ]

    # NEW rule (default cap): boundary level {9} is thin → cutoff 8,
    # Σ cutoffs 16 < θ 18 → zero rescope, tier-1-only serve
    ch_new = champion_lists(imp, budget_per_bucket=2, n_buckets=4)
    d_new: dict = {}
    got_new = [
        (r["doc_id"], r["score_q"])
        for r in search_two_tier(
            imp, ch_new, q, k=6, n_buckets=4, diag=d_new
        ).collect()
    ]
    assert got_new == want and len(want) == 6
    assert d_new["rescope_buckets"] == [] and d_new["fallback"] is False
    assert d_new["theta"] == 18

    # OLD rule (cap 0 = strict top-budget): cutoff 9, Σ cutoffs 18 ≥ θ
    # → every bucket rescopes and the serve takes the exact fallback
    ch_old = champion_lists(
        imp, budget_per_bucket=2, n_buckets=4, level_cap_factor=0.0
    )
    d_old: dict = {}
    got_old = [
        (r["doc_id"], r["score_q"])
        for r in search_two_tier(
            imp, ch_old, q, k=6, n_buckets=4, diag=d_old
        ).collect()
    ]
    assert got_old == want
    assert d_old["rescope_buckets"] == [0, 1, 2, 3]
    assert d_old["fallback"] is True
