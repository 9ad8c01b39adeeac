"""Positional postings + phrase search semantics (operators/positional.py).

Pins the contract the DuckDB oracle pair (postings_positional /
search_phrase) relies on: positions number the RETAINED token stream,
phrase analysis keeps order and duplicates, ranking is (phrase_tf desc,
doc_id asc).
"""

from __future__ import annotations

import pandas as pd
import pytest

from search_engine_spark.operators.positional import (
    analyze_phrase,
    build_positional,
    phrase_match,
    search_phrase,
)
from search_engine_spark.operators.search import prefix_suggest


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )


def test_positions_skip_stopwords_and_rejected_tokens(spark):
    # "a"/"the" are stopwords; "x9y" contains a digit → rejected by rule 4.
    docs = _docs(spark, [(1, "fast a the x9y table")])
    got = {
        (r["term"], r["pos"])
        for r in build_positional(docs).collect()
    }
    # retained stream is [fast, table] → positions 0, 1
    assert got == {("fast", 0), ("table", 1)}


def test_phrase_matches_across_dropped_stopword(spark):
    docs = _docs(
        spark,
        [
            (1, "fast a table"),      # stopword between → still adjacent
            (2, "fast scan table"),   # real word between → NOT adjacent
            (3, "table fast"),        # wrong order
        ],
    )
    hits = search_phrase(docs, "fast table").collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in hits] == [(1, 1)]


def test_phrase_query_itself_is_analyzed(spark):
    # stopwords inside the PHRASE also drop before matching
    docs = _docs(spark, [(1, "fast table")])
    hits = search_phrase(docs, "fast the table").collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in hits] == [(1, 1)]


def test_duplicate_word_phrase_requires_two_occurrences(spark):
    docs = _docs(
        spark,
        [(1, "table table scan"), (2, "table scan table")],
    )
    hits = search_phrase(docs, "table table").collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in hits] == [(1, 1)]


def test_single_term_phrase_counts_occurrences(spark):
    docs = _docs(spark, [(1, "scan table scan"), (2, "scan")])
    hits = search_phrase(docs, "scan").collect()
    # ranked by phrase_tf desc then doc_id asc
    assert [(r["doc_id"], r["phrase_tf"]) for r in hits] == [(1, 2), (2, 1)]


def test_absent_term_and_stopword_only_phrase(spark):
    docs = _docs(spark, [(1, "fast table")])
    assert search_phrase(docs, "fast zzzmissing").count() == 0
    assert search_phrase(docs, "a the").count() == 0


def test_phrase_tf_counts_overlapping_occurrences(spark):
    # "scan scan scan" contains "scan scan" at positions 0 and 1
    docs = _docs(spark, [(1, "scan scan scan")])
    hits = phrase_match(
        build_positional(docs), analyze_phrase("scan scan")
    ).collect()
    assert [(r["doc_id"], r["phrase_tf"]) for r in hits] == [(1, 2)]


def test_analyze_phrase_keeps_order_and_duplicates():
    assert analyze_phrase("Table fast table!") == ["table", "fast", "table"]


def test_phrase_match_rejects_empty():
    with pytest.raises(ValueError):
        phrase_match(None, [])


def test_prefix_suggest_orders_by_df(spark):
    td = spark.createDataFrame(
        [("scan", 10), ("sort", 30), ("slow", 30), ("table", 99)],
        "term string, df long",
    )
    got = [(r["term"], r["df"]) for r in prefix_suggest(td, "s", k=2).collect()]
    # df desc, then term asc for the tie
    assert got == [("slow", 30), ("sort", 30)]


def test_best_passage_dense_window_wins(spark):
    """Crafted doc: matches clustered at the tail must beat an isolated
    early match; window anchors at a match position."""
    from search_engine_spark.operators.positional import best_passage

    pos = spark.createDataFrame(
        # doc 1: q at 0 (isolated), q at 50,52,55 (cluster)
        [(1, "q", 0), (1, "q", 50), (1, "q", 52), (1, "q", 55),
         (1, "z", 10),
         # doc 2: two spread-out matches, window of 10 can hold only 1
         (2, "q", 0), (2, "q", 100)],
        "doc_id long, term string, pos long",
    )
    got = {r["doc_id"]: r for r in best_passage(pos, ["q"], width=10).collect()}
    assert (got[1]["p_start"], got[1]["p_end"], got[1]["n_matches"]) == (
        50, 59, 3,
    )
    assert got[2]["n_matches"] == 1 and got[2]["p_start"] == 0
    # ranking: doc 1 (3 matches) above doc 2 (1)
    rows = best_passage(pos, ["q"], width=10).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]


def test_best_passage_earliest_tie(spark):
    from search_engine_spark.operators.positional import best_passage

    pos = spark.createDataFrame(
        [(1, "q", 5), (1, "q", 40)], "doc_id long, term string, pos long"
    )
    (r,) = best_passage(pos, ["q"], width=10).collect()
    assert r["p_start"] == 5  # both windows hold 1 match → earliest wins


# --------------------------------------------------- proximity boost (MinDist)

def test_min_pair_distance_adjacent_pair_reduction(spark):
    """Hand-checkable position sets, incl. the same-term-adjacency case
    the reduction must skip over."""
    from search_engine_spark.operators.positional import min_pair_distance

    pos = spark.createDataFrame(
        # doc 1: a@0 a@10 b@11  -> min cross gap 1 (a@10,b@11)
        # doc 2: a@0 b@5 a@7    -> min(5, 2) = 2
        # doc 3: a@3 only       -> no cross pair, absent from output
        [(1, "a", 0), (1, "a", 10), (1, "b", 11),
         (2, "a", 0), (2, "b", 5), (2, "a", 7),
         (3, "a", 3)],
        "doc_id long, term string, pos long",
    )
    got = {
        r["doc_id"]: r["mindist"]
        for r in min_pair_distance(pos, ["a", "b"]).collect()
    }
    assert got == {1: 1, 2: 2}


def test_prox_boost_breaks_bm25_ties_by_closeness(spark):
    """Two docs with identical BM25 quantities but different term
    proximity: the closer doc must score higher, by exactly the pinned
    ln(1 + e^(-d)) differential."""
    import math

    from search_engine_spark.operators.positional import search_prox_boost

    postings = spark.createDataFrame(
        [(1, "a", 1), (1, "b", 1), (2, "a", 1), (2, "b", 1)],
        "doc_id long, term string, tf long",
    )
    term_dict = spark.createDataFrame(
        [("a", 2), ("b", 2)], "term string, df long"
    )
    doc_stats = spark.createDataFrame(
        [(1, 20), (2, 20)], "doc_id long, dl long"
    )
    pos = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 1), (2, "a", 0), (2, "b", 9)],
        "doc_id long, term string, pos long",
    )
    rows = search_prox_boost(
        pos, postings, term_dict, doc_stats, 2, 20.0, ["a", "b"]
    ).collect()
    assert [r["doc_id"] for r in rows] == [1, 2]
    assert rows[0]["mindist"] == 1 and rows[1]["mindist"] == 9
    from search_engine_spark.operators.search import bm25_scored

    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scored(
            postings, term_dict, doc_stats, 2, 20.0, ["a", "b"]
        ).collect()
    }
    assert rows[0]["score"] == round(
        base[1] + math.log(1 + math.exp(-1.0)), 4
    )
    assert rows[1]["score"] == round(
        base[2] + math.log(1 + math.exp(-9.0)), 4
    )


def test_prox_boost_single_term_degrades_to_bm25(spark):
    from search_engine_spark.operators.positional import search_prox_boost
    from search_engine_spark.operators.search import bm25_scored

    postings = spark.createDataFrame(
        [(1, "a", 3), (2, "a", 1)], "doc_id long, term string, tf long"
    )
    term_dict = spark.createDataFrame([("a", 2)], "term string, df long")
    doc_stats = spark.createDataFrame(
        [(1, 5), (2, 5)], "doc_id long, dl long"
    )
    pos = spark.createDataFrame(
        [(1, "a", 0), (2, "a", 0)], "doc_id long, term string, pos long"
    )
    got = search_prox_boost(
        pos, postings, term_dict, doc_stats, 2, 5.0, ["a"]
    ).collect()
    base = {
        r["doc_id"]: r["score"]
        for r in bm25_scored(
            postings, term_dict, doc_stats, 2, 5.0, ["a"]
        ).collect()
    }
    # alpha=1 -> ln(1)=0 additive term; mindist undefined (NULL)
    for r in got:
        assert r["mindist"] is None
        assert r["score"] == base[r["doc_id"]]


# ------------------------------------------------- unordered SpanNear

def test_unordered_near_matches_any_order(spark):
    from search_engine_spark.operators.positional import (
        unordered_near_match,
    )

    pos = spark.createDataFrame(
        # doc 1: b a   (reversed order, adjacent)     -> matches slop 0
        # doc 2: a x b (gap 2)                         -> needs slop >= 1
        # doc 3: a only                                -> never
        [(1, "b", 0), (1, "a", 1),
         (2, "a", 0), (2, "x", 1), (2, "b", 2),
         (3, "a", 5)],
        "doc_id long, term string, pos long",
    )
    got0 = {
        r["doc_id"]: r["near_tf"]
        for r in unordered_near_match(pos, ["a", "b"], slop=0).collect()
    }
    assert got0 == {1: 1}
    got1 = {
        r["doc_id"]: r["near_tf"]
        for r in unordered_near_match(pos, ["a", "b"], slop=1).collect()
    }
    assert got1 == {1: 1, 2: 1}


def test_unordered_near_counts_window_ends(spark):
    """near_tf counts END positions admitting a cover: a b a -> ends at
    the b (covers a,b) and at the trailing a (covers b,a)."""
    from search_engine_spark.operators.positional import (
        unordered_near_match,
    )

    pos = spark.createDataFrame(
        [(1, "a", 0), (1, "b", 1), (1, "a", 2)],
        "doc_id long, term string, pos long",
    )
    got = unordered_near_match(pos, ["a", "b"], slop=0).collect()
    assert got[0]["near_tf"] == 2


def test_unordered_near_superset_of_ordered(spark):
    """Every ordered-proximity hit is an unordered hit at the same slop
    (on the fixture corpus)."""
    from search_engine_spark.operators.positional import (
        build_positional,
        proximity_match,
        unordered_near_match,
    )
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001").filter(
        "doc_id < 200"
    )
    pos = build_positional(docs).persist()
    terms = ["data", "fast"]
    ordered = {r["doc_id"] for r in proximity_match(pos, terms, 2).collect()}
    unordered = {
        r["doc_id"]
        for r in unordered_near_match(pos, terms, 2).collect()
    }
    assert ordered <= unordered
    pos.unpersist()


# ---------------------------------------- phrase prefix + span first

def test_phrase_prefix_matches_any_expansion(spark):
    docs = _docs(spark, [(1, "merge data now"), (2, "merge database now"),
                         (3, "merge nothing"), (4, "data merge")])
    from search_engine_spark.operators.positional import (
        search_phrase_prefix,
    )

    got = {
        r["doc_id"]: r["phrase_tf"]
        for r in search_phrase_prefix(spark.createDataFrame(
            [(i, t) for i, t in [(1, "merge data now"),
                                 (2, "merge database now"),
                                 (3, "merge nothing"),
                                 (4, "data merge")]],
            "doc_id long, text string",
        ), "merge da").collect()
    }
    assert got == {1: 1, 2: 1}  # both expansions; order matters (doc 4 no)


def test_phrase_prefix_expansion_cap_is_term_asc(spark):
    """max_expansions=1 keeps only the term-asc first expansion
    ('data' < 'database'), exactly Lucene's rewrite cap."""
    from search_engine_spark.operators.positional import (
        search_phrase_prefix,
    )

    docs = spark.createDataFrame(
        [(1, "merge data now"), (2, "merge database now")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]
        for r in search_phrase_prefix(docs, "merge da",
                                      max_expansions=1).collect()
    }
    assert got == {1}


def test_span_first_boundary_and_order(spark):
    from search_engine_spark.operators.positional import search_span_first

    docs = spark.createDataFrame(
        [(1, "data starts here"), (2, "x y data"),
         (3, " ".join(["w"] * 10) + " data")],  # first_pos = 10 -> out
        "doc_id long, text string",
    )
    rows = search_span_first(docs, "data", n=10).collect()
    assert [(r["doc_id"], r["first_pos"]) for r in rows] == [(1, 0), (2, 2)]


# ------------------------------------------- multi-word synonym graph


def test_synonym_graph_variant_or_and_group_and(spark):
    from search_engine_spark.operators.positional import (
        build_positional,
        search_synonym_graph,
    )

    docs = _docs(
        spark,
        [
            (1, "fast table merge"),        # variant A of g0, variant B of g1
            (2, "sort table hash join"),    # variant B of g0, variant A of g1
            (3, "fast table"),              # only g0 -> conjunctive drop
            (4, "merge merge"),             # only g1 -> drop
            (5, "table fast merge"),        # wrong phrase order -> no g0
        ],
    )
    groups = [
        [["fast", "table"], ["sort", "table"]],
        [["hash", "join"], ["merge"]],
    ]
    got = search_synonym_graph(build_positional(docs), groups).collect()
    assert [(r["doc_id"], r["score_abs"]) for r in got] == [(1, 2), (2, 2)]


def test_synonym_graph_sums_variant_occurrences(spark):
    from search_engine_spark.operators.positional import (
        build_positional,
        search_synonym_graph,
    )

    docs = _docs(
        spark,
        [(1, "fast table sort table merge merge merge")],
    )
    groups = [
        [["fast", "table"], ["sort", "table"]],
        [["merge"]],
    ]
    got = search_synonym_graph(build_positional(docs), groups).collect()
    # g0 = 1 (fast table) + 1 (sort table) = 2, g1 = 3 -> score 5
    assert [(r["doc_id"], r["score_abs"]) for r in got] == [(1, 5)]


# ------------------------------------------------------- nextword index

def test_nextword_matches_positional_phrase(spark):
    """The auxiliary index answers 2-word phrases identically to the
    positional join — same docs, same phrase_tf, same order."""
    from search_engine_spark.operators.positional import (
        search_phrase,
        search_phrase_nextword,
    )
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    a = [(r["doc_id"], r["phrase_tf"])
         for r in search_phrase(docs, "fast table").collect()]
    b = [(r["doc_id"], r["phrase_tf"])
         for r in search_phrase_nextword(docs, "fast table").collect()]
    assert a == b and a


def test_nextword_pair_counts_are_positional_adjacency(spark):
    from pyspark.sql import functions as F

    from search_engine_spark.operators.positional import (
        build_nextword,
        build_positional,
    )
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST).limit(50)
    nw = build_nextword(docs)
    pos = build_positional(docs).collect()
    by_doc = {}
    for r in pos:
        by_doc.setdefault(r["doc_id"], []).append((r["pos"], r["term"]))
    expect = {}
    for d, lst in by_doc.items():
        lst.sort()
        for (p1, t1), (p2, t2) in zip(lst, lst[1:]):
            assert p2 == p1 + 1
            expect[(t1, t2, d)] = expect.get((t1, t2, d), 0) + 1
    got = {
        (r["w1"], r["w2"], r["doc_id"]): r["pair_tf"] for r in nw.collect()
    }
    assert got == expect


def test_nextword_rejects_non_two_term_phrase(spark):
    import pytest as _pytest

    from search_engine_spark.operators.positional import (
        search_phrase_nextword,
    )
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    with _pytest.raises(ValueError):
        search_phrase_nextword(docs, "fast slow table")


def test_span_not_crafted_window(spark):
    """Crafted doc 'data fast data x data': with pre=post=1 the first
    'data' (adjacent to fast) and the second (adjacent on the other
    side) are excluded... positions: data@0 fast@1 data@2 x@3 data@4 —
    data@0 and data@2 are within ±1 of fast@1 -> excluded; data@4
    survives ('x' is OOV-identity, occupies a position). A doc with no
    exclude term keeps every occurrence; a doc where every occurrence
    is adjacent vanishes."""
    from search_engine_spark.operators.positional import search_span_not

    docs = spark.createDataFrame(
        [
            (1, "data fast data x data"),
            (2, "data x data"),
            (3, "fast data fast"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["kept_tf"]
        for r in search_span_not(docs, "data", "fast").collect()
    }
    assert got == {1: 1, 2: 2}


def test_span_not_zero_window_keeps_all(spark):
    """pre=post=0 can never exclude (a position holds one term), so the
    result equals the include term's tf per doc."""
    from search_engine_spark.operators.positional import search_span_not

    docs = spark.createDataFrame(
        [(1, "data fast data")], "doc_id long, text string"
    )
    got = search_span_not(docs, "data", "fast", pre=0, post=0).collect()
    assert [(r["doc_id"], r["kept_tf"]) for r in got] == [(1, 2)]


def test_sdm_features_counts(spark):
    """Crafted corpus: the MRF feature relation carries exactly the
    hand-counted unigram / ordered-adjacency / unordered-window tfs."""
    from search_engine_spark.operators.positional import (
        build_positional,
        sdm_features,
    )

    docs = spark.createDataFrame(
        [
            (1, "fast table fast table"),
            (2, "table data"),
            (3, "fast data fast"),
        ],
        "doc_id long, text string",
    )
    rows = sdm_features(
        build_positional(docs), ["fast", "table"]
    ).collect()
    got = {(r["doc_id"], r["feat"]): (r["tf"], r["weight"]) for r in rows}
    assert got[(1, "t:fast")] == (2.0, 0.85)
    assert got[(1, "t:table")] == (2.0, 0.85)
    assert got[(2, "t:table")] == (1.0, 0.85)
    assert got[(3, "t:fast")] == (2.0, 0.85)
    # ordered "fast table": doc1 has two adjacencies (pos 0→1, 2→3)
    assert got[(1, "o:fast table")] == (2.0, 0.10)
    assert (2, "o:fast table") not in got
    assert (3, "o:fast table") not in got
    # unordered |Δ|<8: doc1 all 2×2 fast/table pairs
    assert got[(1, "u:fast table")] == (4.0, 0.05)
    assert (3, "u:fast table") not in got  # no 'table' in doc 3


def test_sdm_matches_python_mirror(spark):
    """search_sdm == a first-principles pure-Python SDM over the same
    crafted corpus (Dirichlet feature smoothing, λ=(0.85,0.10,0.05),
    uw8), and a single-term query degenerates to 0.85 × the LMD part."""
    import math

    from search_engine_spark.operators.positional import (
        build_positional,
        search_sdm,
    )

    texts = {
        1: "fast table fast table",
        2: "table data",
        3: "fast data fast",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    from pyspark.sql import functions as F

    pos = build_positional(docs)
    doc_stats = pos.groupBy("doc_id").agg(F.count("*").alias("dl"))

    # pure-Python mirror from the raw token streams
    toks = {d: t.split() for d, t in texts.items()}
    dl = {d: len(ts) for d, ts in toks.items()}
    total = float(sum(dl.values()))
    mu = 2000.0

    def feats_for(q):
        out = {}  # (doc, feat) -> (tf, w)
        for d, ts in toks.items():
            for t in set(q):
                c = ts.count(t)
                if c:
                    out[(d, f"t:{t}")] = (c, 0.85)
            for a, b in dict.fromkeys(
                (x, y) for x, y in zip(q, q[1:]) if x != y
            ):
                o = sum(
                    1
                    for i in range(len(ts) - 1)
                    if ts[i] == a and ts[i + 1] == b
                )
                u = sum(
                    1
                    for i, x in enumerate(ts)
                    for j, y in enumerate(ts)
                    if x == a and y == b and abs(j - i) < 8
                )
                if o:
                    out[(d, f"o:{a} {b}")] = (o, 0.10)
                if u:
                    out[(d, f"u:{a} {b}")] = (u, 0.05)
        return out

    def py_sdm(q, k=20):
        fe = feats_for(q)
        cf = {}
        for (d, f), (tf, w) in fe.items():
            cf[f] = cf.get(f, 0.0) + tf
        score = {}
        for (d, f), (tf, w) in fe.items():
            part = w * (
                math.log(1.0 + tf / (mu * cf[f] / total))
                + math.log(mu / (dl[d] + mu))
            )
            score[d] = score.get(d, 0.0) + part
        ranked = sorted(
            ((round(s, 4), d) for d, s in score.items()),
            key=lambda x: (-x[0], x[1]),
        )
        return [(d, s) for s, d in ranked[:k]]

    for q in (["fast", "table"], ["fast", "table", "data"], ["data"]):
        got = [
            (r["doc_id"], r["score"])
            for r in search_sdm(pos, doc_stats, q).collect()
        ]
        assert got == py_sdm(q), q


def test_sdm_random_corpora_match_python_mirror(spark):
    """Hypothesis twin of test_sdm_matches_python_mirror: random small
    corpora over a 4-token alphabet (so adjacency and window overlaps
    genuinely occur), random 2-3-term queries — the Spark SDM ranking
    must equal the first-principles mirror exactly (4 dp)."""
    import math

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from pyspark.sql import functions as F

    from search_engine_spark.operators.positional import (
        build_positional,
        search_sdm,
    )

    TOK = st.sampled_from(["alpha", "beta", "gamma", "delta"])
    TEXT = st.lists(TOK, min_size=1, max_size=12).map(" ".join)
    CORPUS = st.lists(TEXT, min_size=1, max_size=5)
    QUERY = st.lists(TOK, min_size=2, max_size=3)

    def py_sdm(texts, q, k=20):
        toks = {d: t.split() for d, t in enumerate(texts)}
        dl = {d: len(ts) for d, ts in toks.items()}
        total = float(sum(dl.values()))
        mu = 2000.0
        fe = {}
        for d, ts in toks.items():
            for t in set(q):
                c = ts.count(t)
                if c:
                    fe[(d, f"t:{t}")] = (c, 0.85)
            for a, b in dict.fromkeys(
                (x, y) for x, y in zip(q, q[1:]) if x != y
            ):
                o = sum(
                    1 for i in range(len(ts) - 1)
                    if ts[i] == a and ts[i + 1] == b
                )
                u = sum(
                    1
                    for i, x in enumerate(ts)
                    for j, y in enumerate(ts)
                    if x == a and y == b and abs(j - i) < 8
                )
                if o:
                    fe[(d, f"o:{a} {b}")] = (o, 0.10)
                if u:
                    fe[(d, f"u:{a} {b}")] = (u, 0.05)
        cf = {}
        for (d, f_), (tf, w) in fe.items():
            cf[f_] = cf.get(f_, 0.0) + tf
        score = {}
        for (d, f_), (tf, w) in fe.items():
            score[d] = score.get(d, 0.0) + w * (
                math.log(1.0 + tf / (mu * cf[f_] / total))
                + math.log(mu / (dl[d] + mu))
            )
        ranked = sorted(
            ((round(s, 4), d) for d, s in score.items()),
            key=lambda x: (-x[0], x[1]),
        )
        return [(d, s) for s, d in ranked[:k]]

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(texts=CORPUS, q=QUERY)
    def _inner(texts, q):
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        pos = build_positional(docs)
        doc_stats = pos.groupBy("doc_id").agg(F.count("*").alias("dl"))
        got = [
            (r["doc_id"], r["score"])
            for r in search_sdm(pos, doc_stats, q).collect()
        ]
        assert got == py_sdm(texts, q), (texts, q)

    _inner()
