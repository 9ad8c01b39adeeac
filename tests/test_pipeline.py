"""Training-data pipeline operators: dedup family, ANN, text stats,
multimodal stubs — unit behavior on crafted inputs (the sf-corpus parity is
covered by the driver-contract oracle pairs in __spark_entry__)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def mini_docs(spark):
    rows = [
        (0, "big data fast scan merge join table"),
        (1, "big data fast scan merge join table"),          # exact dup of 0
        (2, "Big  data fast scan merge join   table"),       # ws/case variant
        (3, "big data fast scan merge join table extra tail words here"),
        (4, "совершенно другой русский текст про таблицы и запросы"),
        (5, "unrelated totally different content about nothing shared"),
        (6, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(spark, mini_docs):
    got = {
        (r["doc_id"], r["canonical_id"], r["group_size"])
        for r in dedup.exact_duplicates(mini_docs).collect()
    }
    # 0,1,2 normalize to the same fingerprint (lower + ws collapse)
    assert got == {(0, 0, 3), (1, 0, 3), (2, 0, 3)}


def test_jaccard_near_dup_ranks_overlap(spark, mini_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(mini_docs, threshold=0.1).collect()
    }
    assert pairs[(0, 1)] == 1.0  # identical shingle sets
    assert pairs[(0, 2)] == 1.0  # normalization removes the difference
    assert 0.1 <= pairs[(0, 3)] < 1.0  # prefix overlap
    assert (0, 5) not in pairs  # disjoint vocab


def test_lsh_candidates_cover_true_near_dups(spark, mini_docs):
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(mini_docs).collect()
    }
    # identical docs always share every band
    assert (0, 1) in cand and (0, 2) in cand
    # disjoint docs never collide on all three band rows
    assert (4, 5) not in cand


def test_minhash_identical_docs_identical_signatures(spark, mini_docs):
    sig = dedup.minhash_signatures(mini_docs).collect()
    by_doc: dict[int, dict[int, int]] = {}
    for r in sig:
        by_doc.setdefault(r["doc_id"], {})[r["perm"]] = r["minhash"]
    assert by_doc[0] == by_doc[1] == by_doc[2]
    assert by_doc[0] != by_doc[5]
    assert len(by_doc[0]) == dedup.N_PERM


def test_simhash_properties(spark, mini_docs):
    sig = {r["doc_id"]: r["simhash"] for r in dedup.simhash_signatures(mini_docs).collect()}
    assert sig[0] == sig[1] == sig[2]
    assert 6 not in sig  # empty doc has no terms → no signature
    ham = bin(sig[0] ^ sig[3]).count("1")
    ham_far = bin(sig[0] ^ sig[5]).count("1")
    assert ham < ham_far  # near-dup closer in Hamming space than unrelated


def test_simhash_near_pairs_finds_variants(spark, mini_docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup.simhash_near_pairs(mini_docs, max_hamming=10).collect()
    }
    assert pairs[(0, 1)] == 0 and pairs[(0, 2)] == 0


@pytest.fixture(scope="module")
def mini_vecs(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0, 0.0]),    # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),   # opposite of 0
        (4, [0.7, 0.7, 0.0, 0.0]),    # between 0 and 2
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_ann_bruteforce_exact_ranks(spark, mini_vecs):
    got = [
        (r["vec_id"], r["rank"], r["cos"])
        for r in similarity.ann_bruteforce(mini_vecs, [0], k=4)
        .orderBy("rank")
        .collect()
    ]
    assert [g[0] for g in got] == [1, 4, 2, 3]
    assert got[0][2] == pytest.approx(0.995, abs=1e-3)
    assert got[-1][2] == -1.0


def test_embedding_near_pairs(spark, mini_vecs):
    pairs = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in dedup.embedding_near_pairs(mini_vecs, threshold=0.9).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 3) not in pairs


def test_ann_lsh_recall_vs_bruteforce(spark, mini_vecs):
    # identical-direction vectors land in the same bucket → rank 1 retained
    exact = similarity.ann_bruteforce(mini_vecs, [0], k=1).collect()
    approx = similarity.ann_lsh(mini_vecs, [0], k=1).collect()
    if approx:  # bucket non-empty → top-1 must agree with exact
        assert approx[0]["vec_id"] == exact[0]["vec_id"]


def test_lang_id_heuristic(spark, mini_docs):
    got = {r["doc_id"]: r["lang_pred"] for r in textstats.language_id(mini_docs).collect()}
    assert got[0] == "en"
    assert got[4] == "ru"
    assert got[6] == "unknown"


def test_quality_scores_bounds(spark, mini_docs):
    rows = textstats.quality_scores(mini_docs).collect()
    for r in rows:
        assert 0.0 <= r["quality"] <= 1.0
    by_doc = {r["doc_id"]: r for r in rows}
    assert by_doc[6]["quality"] == 0.0  # empty doc
    assert by_doc[6]["n_chars"] == 0


def test_token_counts_empty_doc(spark, mini_docs):
    by_doc = {r["doc_id"]: r for r in textstats.token_counts(mini_docs).collect()}
    assert by_doc[6]["n_ws_tokens"] == 0 and by_doc[6]["n_terms"] == 0
    assert by_doc[0]["n_ws_tokens"] == 7


def test_media_stats_and_features(spark, mini_docs):
    docs = mini_docs.withColumn(
        "html", F.encode(F.concat(F.lit("<x>"), F.col("text")), "utf-8")
    )
    stats = {r["doc_id"]: r for r in multimodal.media_stats(docs).collect()}
    assert stats[0]["magic"] == "3c783e62"  # '<x>b'
    feats = {r["doc_id"]: r for r in multimodal.media_features(docs).collect()}
    assert feats[0]["feat_hash"] == stats[0]["content_md5"]
    assert feats[0]["n_bytes"] == stats[0]["n_bytes"]
    # deterministic: identical bytes → identical features
    assert feats[0]["feat0"] == feats[1]["feat0"]


def test_decode_image_raises_without_pillow(spark, mini_docs):
    docs = mini_docs.limit(1).withColumn(
        "image", F.encode(F.col("text"), "utf-8")
    )
    try:
        import PIL  # noqa: F401

        pytest.skip("pillow present; stub path not applicable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="pillow|NotImplemented"):
        multimodal.decode_image(docs).collect()


def test_embedding_neardup_lsh_subset_and_recall(spark):
    """The bucketed near-dup (scale default) returns a SUBSET of the exact
    all-pairs result, and at the contract threshold on the real fixture its
    recall is measured against the exact baseline (pinned floor)."""
    from search_engine_spark.sources.documents import load_embeddings

    emb = load_embeddings(spark, "/root/testdata/sf0.001")
    thr = 0.4
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_pairs(emb, thr).collect()
    }
    lsh = {
        (r["vec_a"], r["vec_b"])
        for r in dedup.embedding_near_pairs_lsh(emb, thr).collect()
    }
    assert lsh <= exact  # bucket restriction never invents pairs
    recall = len(lsh) / len(exact) if exact else 1.0
    # banded 4×4 hyperplane LSH at cos≥0.4: P(candidate) = 1-(1-s^4)^4
    # with s = 1-acos(cos)/π ≈ 0.5 at the threshold edge, higher for
    # tighter pairs; measured recall ≈ 0.47 on the fixture — pin a
    # conservative floor so regressions show
    assert recall >= 0.3, recall


def test_jaccard_candidates_match_corpus_wide(spark, mini_docs):
    """Candidate-driven Jaccard equals the corpus-wide pass restricted to
    the candidate set (same pairs, same scores)."""
    cand = dedup.lsh_candidate_pairs(mini_docs)
    cand_set = {(r["doc_a"], r["doc_b"]) for r in cand.collect()}
    full = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(mini_docs, 0.3).collect()
    }
    driven = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(mini_docs, 0.3, candidates=cand).collect()
    }
    assert driven == {p: j for p, j in full.items() if p in cand_set}
    assert driven  # non-trivial on the fixture (dups collide in bands)


def test_connected_components_crafted_graph(spark):
    """Min-label propagation finds exact components with deterministic
    canonical labels (min doc_id), including a chain longer than one hop."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(pairs).collect()
    }
    assert got == {
        (1, 1), (2, 1), (3, 1), (4, 1),
        (10, 10), (11, 10),
        (20, 20), (21, 20), (22, 20),
    }


def test_connected_components_raises_instead_of_wrong_labels(spark):
    """A component wider than max_iterations must fail loudly — silent
    non-convergence would split one real cluster into several."""
    import pytest

    chain = [(i, i + 1) for i in range(12)]  # path graph, diameter 12
    pairs = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, max_iterations=3)
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(pairs, max_iterations=20).collect()
    }
    assert got == {(i, 0) for i in range(13)}


def test_star_cc_matches_propagation_and_handles_long_chains(spark):
    """Alternating large/small-star must produce byte-identical components
    to min-label propagation on arbitrary graphs AND converge on a chain
    far longer than any sane propagation round cap (O(log n) vs
    O(diameter)) — the threshold-boundary-chain scale defense."""
    import random

    rng = random.Random(7)
    # random sparse graph: 120 vertices, 100 edges → many components of
    # mixed shapes (hubs, chains, cycles)
    edges = list({
        tuple(sorted(rng.sample(range(120), 2))) for _ in range(100)
    })
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    prop = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components(pairs, max_iterations=40).collect()
    }
    star = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_star(pairs).collect()
    }
    assert star == prop

    # 150-long path: propagation at its default 20-round cap fails loudly;
    # the star algorithm needs only O(log n) alternating rounds
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(150)], "doc_a long, doc_b long"
    )
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_star(chain, max_rounds=16).collect()
    }
    assert got == {(i, 0) for i in range(151)}


def test_star_cc_empty_and_single_edge(spark):
    empty = spark.createDataFrame([], "doc_a long, doc_b long")
    assert dedup.connected_components_star(empty).collect() == []
    one = spark.createDataFrame([(5, 9)], "doc_a long, doc_b long")
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in dedup.connected_components_star(one).collect()
    }
    assert got == {(5, 5), (9, 5)}


def test_dedup_clusters_contains_exact_dups(spark, mini_docs):
    """Exact and whitespace-variant duplicates land in one cluster with the
    min doc_id as canonical."""
    got = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"])
        for r in dedup.dedup_clusters(mini_docs, 0.5).collect()
    }
    # docs 0,1 are exact dups, 2 a ws/case variant, 3 shares a long prefix
    assert got[0][0] == 0 and got[1][0] == 0 and got[2][0] == 0
    assert got[0][1] >= 3
    assert 4 not in got and 5 not in got  # unrelated docs not clustered


def test_stratified_sample_deterministic_and_stable(spark):
    """Membership is a pure function of doc_id: repeated runs identical,
    and membership never flips when the corpus grows (append-stability)."""
    from search_engine_spark.operators.sampling import stratified_sample
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    frac = {"en": 0.5, "de": 0.25}
    a = {r["doc_id"] for r in stratified_sample(docs, frac).collect()}
    b = {r["doc_id"] for r in stratified_sample(docs, frac).collect()}
    assert a == b and a
    half = docs.filter(F.col("doc_id") < 250)
    c = {r["doc_id"] for r in stratified_sample(half, frac).collect()}
    assert c == {d for d in a if d < 250}  # growth never flips membership
    # dropped strata contribute nothing
    langs = {
        r["lang"] for r in stratified_sample(docs, frac).select("lang").collect()
    }
    assert langs <= {"en", "de"}


def test_split_train_holdout_disjoint_total(spark):
    from search_engine_spark.operators.sampling import split_train_holdout
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    got = {r["doc_id"]: r["split"] for r in
           split_train_holdout(docs, 0.1).select("doc_id", "split").collect()}
    assert len(got) == docs.count()  # total: every doc assigned exactly once
    n_hold = sum(1 for v in got.values() if v == "holdout")
    assert 0 < n_hold < len(got) * 0.25  # ~10% ± binomial noise


def test_related_terms_absent_probe_and_self_exclusion(spark):
    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.search import related_terms
    from search_engine_spark.sources.documents import load_documents

    post = build_postings(load_documents(spark, "/root/testdata/sf0.001"))
    assert related_terms(post, "zzabsent").count() == 0
    rows = related_terms(post, "data", k=10).collect()
    assert 0 < len(rows) <= 10
    assert all(r["term"] != "data" for r in rows)  # probe never suggests itself
    assert all(r["co_df"] <= r["df"] for r in rows)
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_spell_suggest_neighborhood_exactness(spark):
    from search_engine_spark.operators.search import spell_suggest

    td = spark.createDataFrame(
        [
            ("cat", 10), ("cot", 9), ("cart", 8), ("at", 7), ("ca", 7),
            ("tac", 5),   # transposition = distance 2: must be excluded
            ("dog", 3),
            ("cats", 6),
        ],
        "term string, df long",
    )
    got = [(r["term"], r["df"]) for r in spell_suggest(td, "cat", k=10).collect()]
    # distance exactly 1 from "cat": cot (sub), cart (ins), at (del), ca (del), cats (ins)
    assert got == [("cot", 9), ("cart", 8), ("at", 7), ("ca", 7), ("cats", 6)]
    # "ab"/"ba" style false candidate: shared deletion variant, distance 2
    td2 = spark.createDataFrame([("ba", 4)], "term string, df long")
    assert spell_suggest(td2, "ab").count() == 0


def test_ivf_assign_partitions_corpus(spark, mini_vecs):
    cents = similarity.ivf_centroid_rows(mini_vecs, n_centroids=2)
    assert [c[0] for c in cents] == [0, 1]  # deterministic sample: smallest ids
    got = {r["vec_id"]: r["centroid_id"]
           for r in similarity.ivf_assign(mini_vecs, cents).collect()}
    assert set(got) == {0, 1, 2, 3, 4}  # every vector assigned exactly once
    assert got[0] == 0 and got[1] == 1  # a centroid is its own nearest (cos=1)
    assert got[3] == 1  # −x is least-far from the near-x centroid with higher cos


def test_ann_ivf_recall_vs_bruteforce(spark, mini_vecs):
    # nprobe = all lists → IVF degenerates to exact: full top-k agreement
    exact = similarity.ann_bruteforce(mini_vecs, [0], k=3).orderBy("rank").collect()
    full = similarity.ann_ivf(
        mini_vecs, [0], k=3, n_centroids=2, nprobe=2
    ).orderBy("rank").collect()
    assert [r["vec_id"] for r in full] == [r["vec_id"] for r in exact]
    # nprobe=1 → only the query's own list is searched (recall tradeoff):
    # results must be a prefix-consistent subset of the probed list
    part = similarity.ann_ivf(
        mini_vecs, [0], k=3, n_centroids=2, nprobe=1
    ).collect()
    assert all(r["vec_id"] != 0 for r in part)
    exact_cos = {r["vec_id"]: r["cos"] for r in exact}
    for r in part:
        assert r["cos"] == pytest.approx(exact_cos[r["vec_id"]], abs=1e-9)


def test_more_like_this_semantics(spark, mini_docs):
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.search import more_like_this

    postings = ib.build_postings(mini_docs)
    td = ib.build_term_dict(postings)
    n_docs = mini_docs.count()
    got = more_like_this(postings, td, n_docs, seed_doc_id=0, k=10).collect()
    ids = [r["doc_id"] for r in got]
    assert 0 not in ids  # seed excluded
    assert 1 in ids and 2 in ids  # exact duplicates of the seed rank
    # identical docs tie exactly; tiebreak doc_id asc pins the order
    assert ids.index(1) < ids.index(2)
    # a seed absent from the corpus → empty result, not an error
    assert more_like_this(postings, td, n_docs, seed_doc_id=10**9).count() == 0


def test_synonym_expansion_merges_groups():
    from search_engine_spark.textproc.synonyms import expand_terms

    assert expand_terms(["join"]) == [["join", "merge"]]
    assert expand_terms(["scan"]) == [["scan"]]  # unmapped → singleton
    # two query terms from one group collapse to ONE conjunct
    assert expand_terms(["join", "merge"]) == [["join", "merge"]]
    assert expand_terms(["join", "data"]) == [
        ["join", "merge"], ["data", "dataset"]]


def test_search_synonyms_semantics(spark, mini_docs):
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.search import (
        _conjunctive_hits,
        search_synonyms,
    )

    postings = ib.build_postings(mini_docs)
    # singleton groups ≡ plain conjunctive Σtf search
    syn = search_synonyms(postings, [["fast"], ["scan"]]).collect()
    plain = _conjunctive_hits(postings, ["fast", "scan"]).collect()
    assert {(r["doc_id"], r["score_abs"]) for r in syn} == {
        (r["doc_id"], r["score_abs"]) for r in plain
    }
    # a group matches via ANY member; absent members contribute nothing
    either = search_synonyms(postings, [["fast", "zzabsent"]]).collect()
    only = search_synonyms(postings, [["fast"]]).collect()
    assert {(r["doc_id"], r["score_abs"]) for r in either} == {
        (r["doc_id"], r["score_abs"]) for r in only
    }
    assert search_synonyms(postings, []).count() == 0


def test_collocations_pmi(spark):
    from search_engine_spark.operators.positional import build_positional
    from search_engine_spark.operators.textstats import collocations

    # "alpha beta" always adjacent (strong collocation); "gamma"/"delta"
    # co-occur but never adjacently in a fixed pair order
    rows = [(i, "alpha beta gamma delta" if i % 2 else "alpha beta delta gamma")
            for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = collocations(build_positional(docs), min_count=2, k=5).collect()
    assert got, "expected collocations"
    top = got[0]
    assert (top["term_a"], top["term_b"]) == ("alpha", "beta")
    assert top["pair_count"] == 10
    # every returned pair meets the min_count floor
    assert all(r["pair_count"] >= 2 for r in got)
    # empty corpus → empty result, not an error
    empty = spark.createDataFrame([], "doc_id long, text string")
    assert collocations(build_positional(empty)).count() == 0


def test_repetition_stats_semantics(spark):
    from search_engine_spark.operators.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # one token repeated 4x
            (2, "x y z"),            # no repetition
            (3, ""),                 # empty → all-zero signals
            (4, "solo"),             # single token → no bigrams
            (5, "p q p q p q"),      # dominant bigram loop
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert len(got) == 5
    r1 = got[1]
    assert (r1["n_tok"], r1["dup_token_frac"], r1["top_token_ratio"]) == (4, 0.75, 1.0)
    assert r1["top_bigram_ratio"] == 1.0  # "a a" is every bigram
    r2 = got[2]
    assert (r2["dup_token_frac"], r2["top_token_ratio"]) == (0.0, round(1 / 3, 4))
    assert r2["top_bigram_ratio"] == 0.5  # 2 distinct bigrams of 2
    assert (got[3]["n_tok"], got[3]["dup_token_frac"],
            got[3]["top_token_ratio"], got[3]["top_bigram_ratio"]) == (0, 0.0, 0.0, 0.0)
    assert (got[4]["n_tok"], got[4]["top_bigram_ratio"]) == (1, 0.0)
    r5 = got[5]  # "p q" appears 3/5 bigrams; p and q each 3/6 tokens
    assert (r5["top_token_ratio"], r5["top_bigram_ratio"]) == (0.5, 0.6)


def test_contamination_flags_cross_split_overlap(spark):
    """Craft a corpus where one train doc shares an 8-gram with one holdout
    doc; only that train doc is flagged. Split membership is the pure h60
    function, so we pick doc_ids by computing it."""
    from search_engine_spark.hashing import h60_py
    from search_engine_spark.operators.dedup import CONTAM_K, contamination

    frac = 0.3
    u = lambda d: h60_py(f"split:{d}") / 2**60
    hold_ids = [d for d in range(200) if u(d) < frac]
    train_ids = [d for d in range(200) if u(d) >= frac]
    assert hold_ids and len(train_ids) >= 2
    shared = " ".join(f"w{i}" for i in range(CONTAM_K))  # one exact 8-gram
    rows = [(hold_ids[0], shared + " tailh")]
    rows.append((train_ids[0], "head " + shared))         # contaminated
    for j, d in enumerate(train_ids[1:5]):                # clean train docs
        rows.append((d, " ".join(f"u{j}x{i}" for i in range(12))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = contamination(docs, holdout_fraction=frac).collect()
    assert [r["doc_id"] for r in got] == [train_ids[0]]
    r = got[0]
    assert r["n_hits"] == 1 and r["n_shingles"] == 1 and r["n_holdout_docs"] == 1


def test_unigram_lm_scores_values(spark):
    import math

    from search_engine_spark.operators.textstats import unigram_lm_scores

    postings = spark.createDataFrame(
        [(1, "data", 2), (1, "zebra", 1), (2, "data", 1)],
        "doc_id long, term string, tf long",
    )
    got = {r["doc_id"]: r for r in unigram_lm_scores(postings).collect()}
    # cf: data=3, zebra=1, T=4
    a1 = (2 * math.log(3 / 4) + math.log(1 / 4)) / 3
    a2 = math.log(3 / 4)
    assert got[1]["dl"] == 3 and got[2]["dl"] == 1
    assert got[1]["avg_logp"] == round(a1, 4)
    assert got[2]["avg_logp"] == round(a2, 4)
    assert got[1]["lm_ppl"] == round(math.exp(-a1), 4)
    # rare-heavy doc 1 is higher-perplexity than common-only doc 2
    assert got[1]["lm_ppl"] > got[2]["lm_ppl"]
    empty = spark.createDataFrame([], "doc_id long, term string, tf long")
    assert unigram_lm_scores(empty).count() == 0


def test_doc_keywords_ranking(spark):
    from search_engine_spark.operators.textstats import doc_keywords

    postings = spark.createDataFrame(
        [(1, "rare", 1), (1, "common", 5), (1, "alpha", 1), (1, "beta", 1)],
        "doc_id long, term string, tf long",
    )
    term_dict = spark.createDataFrame(
        [("rare", 1, 1), ("common", 10, 50), ("alpha", 2, 2), ("beta", 2, 2)],
        "term string, df long, cf long",
    )
    got = doc_keywords(postings, term_dict, n_docs=10, k=3).collect()
    ranked = sorted(got, key=lambda r: r["rank"])
    # rare: 1·ln(10/1)=2.3026 beats common: 5·ln(10/10)=0; alpha/beta tie
    # on tfidf 1·ln(5)=1.6094 → broken alphabetically
    assert [r["term"] for r in ranked] == ["rare", "alpha", "beta"]
    assert ranked[0]["tfidf"] == 2.3026 and ranked[1]["tfidf"] == 1.6094
    assert [r["rank"] for r in ranked] == [1, 2, 3]


def test_media_features_null_payload_yields_null_features(spark):
    """One missing media payload must not kill the Arrow task — the row
    surfaces with NULL features, matching media_stats' null handling."""
    from search_engine_spark.operators.multimodal import media_features

    docs = spark.createDataFrame(
        [(1, bytearray(b"payload")), (2, None)],
        "doc_id long, html binary",
    )
    got = {r["doc_id"]: r for r in media_features(docs).collect()}
    assert got[1]["feat_hash"] is not None
    assert got[2]["n_bytes"] is None
    assert got[2]["feat_hash"] is None and got[2]["feat0"] is None


# --------------------------------------------- moment-based aggregations


@pytest.fixture(scope="module")
def stat_docs(spark):
    rows = [
        (0, "aa bb cc", "en"),
        (1, "aaaa bbbb", "en"),
        (2, "a" * 150, "en"),
        (3, "x " * 300, "ru"),          # 600 chars (trailing space)
        (4, "", "ru"),
        (5, "слово два три", "ru"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_extended_stats_matches_numpy(spark, stat_docs):
    import numpy as np

    rows = {r["site_key"]: r for r in textstats.extended_stats(stat_docs).collect()}
    # site key = 'site-' + chr(97 + doc_id % 3): site-a={0,3}, site-b={1,4}, site-c={2,5}
    lens = {"site-a": [8, 600], "site-b": [9, 0], "site-c": [150, 13]}
    for site, xs in lens.items():
        r = rows[site]
        arr = np.array(xs, dtype=float)
        assert r["n"] == len(xs)
        assert r["sum_chars"] == int(arr.sum())
        assert r["variance"] == pytest.approx(arr.var(), abs=1e-3)
        assert r["std"] == pytest.approx(arr.std(), abs=1e-3)
        assert r["std_upper"] == pytest.approx(arr.mean() + 2 * arr.std(), abs=1e-3)


def test_matrix_stats_correlation_bounds(spark, stat_docs):
    import numpy as np

    rows = {r["lang"]: r for r in textstats.matrix_stats(stat_docs).collect()}
    assert set(rows) == {"en", "ru"}
    for r in rows.values():
        assert -1.0 <= r["correlation"] <= 1.0
    # verify 'en' against numpy: x = len(text), y = ws token count
    x = np.array([8.0, 9.0, 150.0])
    y = np.array([3.0, 2.0, 1.0])
    cov = (x * y).mean() - x.mean() * y.mean()
    corr = cov / (x.std() * y.std())
    assert rows["en"]["covariance"] == pytest.approx(cov, abs=1e-3)
    assert rows["en"]["correlation"] == pytest.approx(corr, abs=1e-3)


def test_range_agg_partitions_corpus(spark, stat_docs):
    rows = sorted(textstats.range_agg(stat_docs).collect(), key=lambda r: r["bucket_idx"])
    assert [r["range_key"] for r in rows] == ["*-100", "100-400", "400-1200", "1200-*"]
    assert sum(r["doc_count"] for r in rows) == stat_docs.count()
    # empty bucket present and zero-filled (no doc is >= 1200 chars)
    tail = rows[3]
    assert tail["doc_count"] == 0 and tail["avg_chars"] == 0.0
    # boundary: from-inclusive / to-exclusive
    assert rows[0]["doc_count"] == 4  # 8, 9, 0, 13 chars
    assert rows[1]["doc_count"] == 1  # doc 2 (150 chars)
    assert rows[2]["doc_count"] == 1  # doc 3 (600 chars)


def test_string_stats_entropy(spark):
    import math

    docs = spark.createDataFrame(
        [(0, "aab", "en"), (1, "b", "en")], "doc_id long, text string, lang string"
    )
    r = textstats.string_stats(docs).collect()[0]
    # chars: a×2, b×2 → entropy = 1 bit exactly
    assert r["entropy"] == pytest.approx(1.0, abs=1e-9)
    assert r["n_docs"] == 2 and r["min_len"] == 1 and r["max_len"] == 3
    assert r["avg_len"] == pytest.approx(2.0)
    # skewed: a×3, b×1
    docs2 = spark.createDataFrame(
        [(0, "aaab", "en")], "doc_id long, text string, lang string"
    )
    r2 = textstats.string_stats(docs2).collect()[0]
    expect = -(0.75 * math.log2(0.75) + 0.25 * math.log2(0.25))
    assert r2["entropy"] == pytest.approx(expect, abs=1e-3)


def test_weighted_avg_quality_weights_by_length(spark, stat_docs):
    rows = {r["lang"]: r for r in textstats.weighted_avg_quality(stat_docs).collect()}
    q = {r["doc_id"]: (r["quality"], r["n_chars"])
         for r in textstats.quality_scores(stat_docs).collect()}
    for lang, ids in {"en": [0, 1, 2], "ru": [3, 5]}.items():  # doc 4 empty → excluded
        num = sum(q[i][0] * q[i][1] for i in ids)
        den = sum(q[i][1] for i in ids)
        assert rows[lang]["w_avg_quality"] == pytest.approx(num / den, abs=1e-3)
        assert rows[lang]["n"] == len(ids)
