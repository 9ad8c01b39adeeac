"""Positional postings + exact-phrase search.

The reference's index stores (page, lemma, tf) only (model/Index.java) —
its query surface is bag-of-words AND (SearchServiceImpl.java:152-180) and
cannot answer "these words, in this order, adjacent". This module is the
Spark-first extension every production fulltext engine ships (Lucene's
positions/PhraseQuery design): the analyzer emits each retained token's
0-based POSITION within its document, and a phrase query matches documents
where the phrase's lemmas occur at consecutive positions.

Semantics (pinned by the DuckDB oracle pair + tests/test_positional.py):

  * positions number the RETAINED token stream — analyzer rules 3-5
    (boundary strip, letter-word filter, stopword drop) apply BEFORE
    numbering, so "fast a table" matches the phrase "fast table" (the
    standard stopword-removal phrase semantics);
  * phrase terms are analyzed like any query text but keep ORDER and
    DUPLICATES (analyze_phrase) — "table table" requires two adjacent
    occurrences;
  * ranking: phrase_tf (number of phrase occurrences in the doc) desc,
    doc_id asc, top-k.

Plan shape at scale: the positional relation is (doc_id, term, pos) —
~dl rows per document. The phrase match filters it to the phrase's terms
FIRST (an isin over a handful of strings — pushed into the scan when the
relation is persisted term-bucketed), then chains |phrase|−1 equi-joins on
(doc_id, pos−offset). All joins are on the same doc_id key, so AQE plans
them as one shuffle per side at worst; no UDF anywhere in the match path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textproc.tokenize import tokenize

POSITIONAL_SCHEMA = "doc_id long, term string, pos long"


def analyze_phrase(phrase: str) -> list[str]:
    """Phrase analysis: the same five analyzer rules + lemmatization as
    analyze_query, but ORDER-PRESERVING and duplicate-keeping — a phrase
    is a sequence, not a set."""
    return tokenize(phrase)


def build_positional(docs: DataFrame) -> DataFrame:
    """documents → positional postings (doc_id, term, pos): one row per
    retained token occurrence. Zero-shuffle: a mapInPandas over the
    2-column pruned (doc_id, text) scan — positions are per-document facts,
    so each input partition emits its rows independently (same invariant
    the fused build's pack stage relies on)."""

    def _gen(batches):
        from ..textproc.fast_tokenize import tokenize_positions_arrays

        for pdf in batches:
            if pdf.empty:
                continue
            d, c, p, vocab = tokenize_positions_arrays(pdf)
            if d.size == 0:
                continue
            yield pd.DataFrame({"doc_id": d, "term": vocab[c], "pos": p})

    return docs.select("doc_id", "text").mapInPandas(
        _gen, schema=POSITIONAL_SCHEMA
    )


def phrase_match(positional: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, phrase_tf) for documents containing the exact term sequence.

    Classic positional intersection as a declarative join chain: anchor on
    the first term's occurrences, then for term i require an occurrence at
    pos₀+i in the same doc. Each side is the positional relation filtered
    to ONE term (scan-prunable); the chain is |terms|−1 inner equi-joins on
    (doc_id, pos0) that Catalyst/AQE is free to reorder or broadcast."""
    if not terms:
        raise ValueError("empty phrase")
    anchor = positional.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("pos0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = positional.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("pos0")
        )
        anchor = anchor.join(nxt, ["doc_id", "pos0"], "inner")
    return anchor.groupBy("doc_id").agg(F.count("*").alias("phrase_tf"))


def proximity_match(
    positional: DataFrame, terms: list[str], slop: int = 0
) -> DataFrame:
    """(doc_id, prox_tf) for docs where `terms` occur IN ORDER within a
    window of len(terms)+slop positions — Lucene's ordered SpanNearQuery.
    prox_tf counts anchor positions (occurrences of terms[0]) that admit a
    completion.

    The chain keeps, per anchor, the EARLIEST feasible position of each
    subsequent term (groupBy min). Greedy-earliest is exact for existence
    inside a fixed window: taking the minimum feasible p_i leaves the
    largest feasible set for p_{i+1}. slop=0 degenerates to exact-phrase
    (strictly increasing positions with span n−1 forces consecutive) —
    pinned by a test against phrase_match.

    Scale shape: per-term filtered slices of the positional relation
    (scan-prunable), each step an equi-join on doc_id with two range
    predicates + a groupBy on (doc_id, pos0) — all shuffle on the same
    doc_id-led keys, so AQE coalesces them; no UDF."""
    if not terms:
        raise ValueError("empty phrase")
    window = len(terms) - 1 + slop
    anchor = positional.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("pos0"), F.col("pos").alias("prev")
    )
    for t in terms[1:]:
        nxt = positional.filter(F.col("term") == t).select(
            F.col("doc_id").alias("n_doc"), F.col("pos").alias("p")
        )
        anchor = (
            anchor.join(
                nxt,
                (F.col("doc_id") == F.col("n_doc"))
                & (F.col("p") > F.col("prev"))
                & (F.col("p") <= F.col("pos0") + window),
                "inner",
            )
            .groupBy("doc_id", "pos0")
            .agg(F.min("p").alias("prev"))
        )
    return anchor.groupBy("doc_id").agg(F.count("*").alias("prox_tf"))


def search_proximity(
    docs: DataFrame, phrase: str, slop: int = 0, k: int = 20
) -> DataFrame:
    """Ordered-window proximity top-k: (doc_id, prox_tf) ranked prox_tf
    desc, doc_id asc. Empty analyzer output → empty result (Q1 gate)."""
    terms = analyze_phrase(phrase)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, prox_tf long"
        )
    hits = proximity_match(build_positional(docs), terms, slop=slop)
    return hits.orderBy(
        F.col("prox_tf").desc(), F.col("doc_id").asc()
    ).limit(k)


def search_phrase(docs: DataFrame, phrase: str, k: int = 20) -> DataFrame:
    """Exact-phrase top-k over the documents table: (doc_id, phrase_tf)
    ranked phrase_tf desc, doc_id asc. Empty analyzer output (stopword-only
    or unparseable phrase) → empty result, matching the engine's Q1 gate."""
    terms = analyze_phrase(phrase)
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, phrase_tf long"
        )
    hits = phrase_match(build_positional(docs), terms)
    return hits.orderBy(
        F.col("phrase_tf").desc(), F.col("doc_id").asc()
    ).limit(k)


MAX_PREFIX_EXPANSIONS = 50


def phrase_prefix_match(
    positional: DataFrame,
    terms: list[str],
    prefix: str,
    max_expansions: int = MAX_PREFIX_EXPANSIONS,
) -> DataFrame:
    """(doc_id, phrase_tf) for ES `match_phrase_prefix`: the exact term
    sequence `terms` immediately followed by ANY dictionary term starting
    with `prefix` — the search-as-you-type phrase query ("new yo" matches
    "new york" and "new yorker" mid-keystroke).

    The expansion set is Lucene's MultiTermQuery rewrite: the first
    max_expansions matching dictionary terms in TERM-ASC order, derived
    relationally from the positional relation itself (sargable startswith
    over the distinct-term projection — the oracle derives the identical
    set, so no driver-side collect). The last join consumes the expansion
    frame as a broadcast-small semi side; everything else is
    phrase_match's equi-join chain."""
    if not terms:
        raise ValueError("empty phrase body")
    exp = (
        positional.filter(F.col("term").startswith(prefix))
        .select("term")
        .distinct()
        .orderBy(F.col("term").asc())
        .limit(max_expansions)
    )
    anchor = positional.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("pos0")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = positional.filter(F.col("term") == t).select(
            "doc_id", (F.col("pos") - i).alias("pos0")
        )
        anchor = anchor.join(nxt, ["doc_id", "pos0"], "inner")
    # left_semi: one row per qualifying position, never duplicated by the
    # expansion list (a position holds exactly one term)
    last = positional.join(exp, "term", "left_semi").select(
        "doc_id", (F.col("pos") - len(terms)).alias("pos0")
    )
    anchor = anchor.join(last, ["doc_id", "pos0"], "inner")
    return anchor.groupBy("doc_id").agg(F.count("*").alias("phrase_tf"))


def search_phrase_prefix(
    docs: DataFrame, text: str, max_expansions: int = MAX_PREFIX_EXPANSIONS,
    k: int = 20,
) -> DataFrame:
    """match_phrase_prefix top-k over the documents table: the trailing
    word of `text` is the prefix-in-progress, the words before it the
    exact phrase body. (doc_id, phrase_tf) ranked phrase_tf desc, doc_id
    asc; an unanalyzable body empties the result (Q1 gate)."""
    words = [w for w in text.strip().lower().split() if w]
    if len(words) < 2:
        raise ValueError("need at least one body word + the prefix")
    body = analyze_phrase(" ".join(words[:-1]))
    prefix = words[-1]
    if not body:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, phrase_tf long"
        )
    hits = phrase_prefix_match(
        build_positional(docs), body, prefix, max_expansions
    )
    return hits.orderBy(
        F.col("phrase_tf").desc(), F.col("doc_id").asc()
    ).limit(k)


def search_span_first(
    docs: DataFrame, word: str, n: int = 10, k: int = 20
) -> DataFrame:
    """(doc_id, first_pos) — Lucene SpanFirstQuery: documents whose FIRST
    occurrence of the analyzed `word` falls within the document's first
    `n` retained-token positions (title-ish / lead-paragraph matching
    without a separate field). Ranked first_pos asc (earlier = better),
    doc_id asc, top-k. One isin-sliced scan + one min aggregate."""
    terms = analyze_phrase(word)
    if len(terms) != 1:
        raise ValueError("span_first takes exactly one analyzable word")
    pos = build_positional(docs)
    firsts = (
        pos.filter(F.col("term") == terms[0])
        .groupBy("doc_id")
        .agg(F.min("pos").cast("long").alias("first_pos"))
        .filter(F.col("first_pos") < int(n))
    )
    return firsts.orderBy(
        F.col("first_pos").asc(), F.col("doc_id").asc()
    ).limit(k)


def unordered_near_match(
    positional: DataFrame, terms: list[str], slop: int = 0
) -> DataFrame:
    """(doc_id, near_tf) for docs where the DISTINCT `terms` all occur —
    in ANY order — within a window of len(terms)+slop positions: Lucene's
    SpanNearQuery(inOrder=false). near_tf counts window END positions
    (occurrences of any query term) at which the minimal cover of all
    terms fits the window.

    Minimal-cover reduction: scan the doc's query-term occurrences in
    position order; at each occurrence, the smallest window ENDING there
    that covers every term spans back to the OLDEST of the per-term
    latest occurrences. Because positions ascend within the doc-window,
    "latest occurrence of t so far" is max(pos) FILTER (term = t) over
    the running frame — one running-max column per query term, no
    IGNORE-NULLS lag gymnastics, portable to the oracle verbatim.

    Scale shape: isin-filter to the ≤|terms| query terms first, then ONE
    window partitioned by doc_id (maximal-cardinality key) carrying
    |terms| running maxes, then a map-side-combinable count."""
    from pyspark.sql import Window

    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("empty term set")
    window = len(uniq) - 1 + slop
    pq = positional.filter(F.col("term").isin(uniq))
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("pos").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lasts = [
        F.max(F.when(F.col("term") == t, F.col("pos"))).over(w).alias(f"_l{i}")
        for i, t in enumerate(uniq)
    ]
    covered = pq.select("doc_id", "pos", *lasts)
    cover_ok = (
        F.col("pos") - F.least(*[F.col(f"_l{i}") for i in range(len(uniq))])
        <= window
    )
    # explicit conjunction — least() SKIPS nulls in both engines, so it
    # cannot express "every term seen"
    all_seen = F.lit(True)
    for i in range(len(uniq)):
        all_seen = all_seen & F.col(f"_l{i}").isNotNull()
    return (
        covered.filter(all_seen & cover_ok)
        .groupBy("doc_id")
        .agg(F.count("*").alias("near_tf"))
    )


def search_near_unordered(
    docs: DataFrame, phrase: str, slop: int = 0, k: int = 20
) -> DataFrame:
    """Unordered-window proximity top-k: (doc_id, near_tf) ranked near_tf
    desc, doc_id asc. The phrase is analyzed like any query; duplicate
    lemmas collapse (unordered windows are over the distinct term SET)."""
    terms = sorted(set(analyze_phrase(phrase)))
    if not terms:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, near_tf long"
        )
    hits = unordered_near_match(build_positional(docs), terms, slop=slop)
    return hits.orderBy(
        F.col("near_tf").desc(), F.col("doc_id").asc()
    ).limit(k)


PROX_WEIGHT = 1.0
PROX_ALPHA = 1.0


def min_pair_distance(positional: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id, mindist) — the minimum position distance between
    occurrences of any two DISTINCT query terms in each document that
    contains ≥2 distinct query terms (Tao & Zhai's MinDist, SIGIR 2007).

    Correctness of the adjacent-pair reduction: sort the query-term
    occurrences of a doc by position; the minimal cross-term pair has no
    occurrence strictly between its endpoints (any in-between occurrence
    would form a closer-or-equal cross-term pair with one endpoint,
    whichever endpoint its term differs from), so it is ADJACENT in the
    sorted stream. mindist is therefore min(pos − prev_pos) over adjacent
    pairs with different terms — one lag window per doc.

    Scale shape: the positional relation filtered to the ≤|terms| query
    terms FIRST (scan-prunable isin), then a window partitioned by doc_id
    — the maximal-cardinality key, no global window — and one
    map-side-combinable min aggregate."""
    from pyspark.sql import Window

    uniq = sorted(set(terms))
    pq = positional.filter(F.col("term").isin(uniq))
    w = Window.partitionBy("doc_id").orderBy(F.col("pos").asc())
    adj = pq.select(
        "doc_id",
        "term",
        "pos",
        F.lag("term").over(w).alias("prev_term"),
        F.lag("pos").over(w).alias("prev_pos"),
    ).filter(
        F.col("prev_term").isNotNull() & (F.col("prev_term") != F.col("term"))
    )
    return adj.groupBy("doc_id").agg(
        F.min(F.col("pos") - F.col("prev_pos")).alias("mindist")
    )


def search_prox_boost(
    positional: DataFrame,
    postings: DataFrame,
    term_dict: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    prox_weight: float = PROX_WEIGHT,
    limit: int = 20,
) -> DataFrame:
    """Proximity-boosted conjunctive BM25 (Tao & Zhai 2007, the best of
    their five proximity measures): (doc_id, mindist, score) with

        score(d) = BM25(d) + prox_weight · ln(α + e^(−MinDist(d)))

    ranked score desc, doc_id asc. Bag-of-words BM25 cannot tell "data …
    3000 words … fast" from "fast data"; the MinDist boost rewards docs
    where the query terms sit close together without requiring phrase or
    window containment. Conjunctive (all terms present) like the
    reference's AND mode, so MinDist is defined for every hit when the
    query has ≥2 distinct terms; single-term queries degrade to plain
    BM25 with mindist = NULL.

    The BM25 part reuses search.bm25_scored (its rounded-4dp score, so
    this surface can never drift from search_bm25); the boost is a pure
    per-doc column expression, and the mindist join is doc_id-keyed on
    the already-tiny conjunctive hit set."""
    import math

    from .search import bm25_scored

    uniq = sorted(set(terms))
    scored = bm25_scored(
        postings, term_dict, doc_stats, n_docs, avgdl, uniq,
        k1=k1, b=b, conjunctive=True,
    )
    if len(uniq) < 2:
        out = scored.select(
            "doc_id",
            F.lit(None).cast("long").alias("mindist"),
            F.round(
                F.col("score") + prox_weight * math.log(PROX_ALPHA), 4
            ).alias("score"),
        )
    else:
        md = min_pair_distance(positional, uniq)
        out = scored.join(md, "doc_id").select(
            "doc_id",
            F.col("mindist").cast("long").alias("mindist"),
            F.round(
                F.col("score")
                + prox_weight
                * F.log(PROX_ALPHA + F.exp(-F.col("mindist").cast("double"))),
                4,
            ).alias("score"),
        )
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        limit
    )


PASSAGE_WIDTH = 30


def best_passage(
    positional: DataFrame,
    terms: list[str],
    width: int = PASSAGE_WIDTH,
    k: int = 20,
) -> DataFrame:
    """Passage retrieval → (doc_id, p_start, p_end, n_matches): per
    document, the `width`-token window holding the MOST query-term
    occurrences (tie → earliest window), then the top-k documents by
    (n_matches desc, doc_id asc) — the "best passage" selection that
    snippet generators and passage-level rankers (Liu & Croft, SIGIR
    2002) run after document retrieval.

    Exactness via anchoring: some optimal window starts AT a match
    position, so enumerating only match-anchored windows is lossless.
    The plan is a doc-keyed range self-join over the query-term
    occurrences ONLY (m occurrences per doc; pairs ≤ m·min(m, width) —
    bounded and tiny next to the corpus), one groupBy for window counts,
    one max_by per doc. Postings filter first: the positional relation
    is isin-pruned to the query terms before anything joins."""
    m = positional.filter(F.col("term").isin(list(set(terms)))).select(
        "doc_id", "pos"
    )
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") >= F.col("a.pos"))
        & (F.col("b.pos") < F.col("a.pos") + width),
    )
    counts = pairs.groupBy(
        F.col("a.doc_id").alias("doc_id"), F.col("a.pos").alias("p_start")
    ).agg(F.count("*").alias("n_matches"))
    best = counts.groupBy("doc_id").agg(
        F.max_by(
            F.col("p_start"),
            F.struct(
                F.col("n_matches"), (-F.col("p_start")).alias("neg_start")
            ),
        ).alias("p_start"),
        # plain max: the struct tiebreak only matters for WHICH p_start
        # wins (max_by above); the maximum n_matches is the same either way
        F.max("n_matches").alias("n_matches"),
    )
    return (
        best.select(
            "doc_id",
            "p_start",
            (F.col("p_start") + width - 1).alias("p_end"),
            "n_matches",
        )
        .orderBy(F.col("n_matches").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def term_vectors(
    positional: DataFrame, doc_ids: list[int] | None = None
) -> DataFrame:
    """Per-document term vectors → (doc_id, term, tf, positions): the
    Elasticsearch `_termvectors` / Lucene TermVectors API — for each
    (doc, term), its frequency and the ascending CSV of its token
    positions. The reference stores only (page, lemma, rank)
    (model/Index.java:32-33); positions generalize that to the surface
    every highlighter/proximity-ranker needs.

    `positions` is a deterministic comma-joined STRING (ascending), not
    an array — a scalar column hashes identically across engines (the
    contract compare and parquet stats both prefer it) and decodes
    trivially. Plan: the positional relation filtered to the requested
    docs (an isin pushed into the scan; absent filter = whole-corpus
    export shape) then ONE (doc_id, term) aggregate — count + sort_array
    (collect_list) — map-side combinable, keyed by the doc, so skew
    follows document length, not term popularity."""
    rel = positional
    if doc_ids is not None:
        rel = rel.filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
    return rel.groupBy("doc_id", "term").agg(
        F.count("*").cast("bigint").alias("tf"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list("pos")),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("positions"),
    )


def variant_phrase_tf(
    positional: DataFrame, variant: list[str]
) -> DataFrame:
    """(doc_id, tf) for one synonym-graph variant: exact-phrase
    occurrences for a multi-token sequence, plain term tf for a
    single-token one (both are the same 'pseudo-term occurrence count'
    to the synonym group)."""
    if len(variant) == 1:
        return (
            positional.filter(F.col("term") == variant[0])
            .groupBy("doc_id")
            .agg(F.count("*").alias("tf"))
        )
    return phrase_match(positional, variant).withColumnRenamed(
        "phrase_tf", "tf"
    )


def search_synonym_graph(
    positional: DataFrame,
    groups: list[list[list[str]]],
    k: int = 20,
) -> DataFrame:
    """Multi-word synonym graph search (Lucene SynonymGraphFilter
    semantics, the query-time graph form): each group is a set of
    token-SEQUENCE variants forming one pseudo-term — a doc matches the
    group if ANY variant occurs as an exact phrase, the group's tf is
    the Σ over variant occurrences, and groups combine conjunctively.
    Ranked (score_abs = Σ group tfs desc, doc_id asc) — the same
    absolute-Σtf scale as search_synonyms, whose single-word groups are
    the degenerate all-singleton case.

    Plan shape: per-variant phrase chains are scan-pruned term slices
    joined on (doc_id, adjacent positions); each group reduces with ONE
    groupBy(doc_id); groups conjoin with inner equi-joins on doc_id
    (AQE broadcasts the rarer group). Variant fan-out is driver-side
    frozen config — a handful of bounded subtrees in one plan, no
    per-variant job."""
    groups = [g for g in groups if g]
    if not groups:
        return positional.sparkSession.createDataFrame(
            [], "doc_id long, score_abs long"
        )
    per_group = []
    for gi, g in enumerate(groups):
        tfs = None
        for v in g:
            t = variant_phrase_tf(positional, v)
            tfs = t if tfs is None else tfs.unionByName(t)
        per_group.append(
            tfs.groupBy("doc_id").agg(F.sum("tf").alias(f"g{gi}"))
        )
    joined = per_group[0]
    for nxt in per_group[1:]:
        joined = joined.join(nxt, "doc_id", "inner")
    score = None
    for gi in range(len(groups)):
        c = F.col(f"g{gi}")
        score = c if score is None else (score + c)
    return (
        joined.select(
            "doc_id", score.cast("long").alias("score_abs")
        )
        .orderBy(F.col("score_abs").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def build_nextword(docs: DataFrame) -> DataFrame:
    """documents → nextword postings (w1, w2, doc_id, pair_tf): one row
    per document per ADJACENT retained-token pair — the auxiliary
    phrase index of Bahle, Williams & Zobel (SIGIR 2002, "Efficient
    phrase querying with an auxiliary index"). Two-word phrases — the
    dominant phrase-query shape in query logs — resolve with ONE lookup
    on (w1, w2) instead of a positional join, and longer phrases can
    seed their positional intersection from the rarest contained pair.

    Adjacency is position p → p+1 of the SAME retained stream the
    positional index numbers, so nextword and positional phrase answers
    can never disagree (pinned by test + the shared oracle). Built as
    lead(term) over (doc_id, pos) — one window partitioned by doc_id
    (state bounded by dl) + one combinable groupBy; persisted
    term-pair-bucketed in production so the pair probe prunes files."""
    from pyspark.sql import Window

    pos = build_positional(docs)
    w = Window.partitionBy("doc_id").orderBy("pos")
    pairs = (
        pos.withColumn("w2", F.lead("term", 1).over(w))
        .filter(F.col("w2").isNotNull())
        .select(F.col("term").alias("w1"), "w2", "doc_id")
    )
    return pairs.groupBy("w1", "w2", "doc_id").agg(
        F.count("*").alias("pair_tf")
    )


def search_phrase_nextword(docs: DataFrame, phrase: str, k: int = 20) -> DataFrame:
    """Two-word exact-phrase top-k served from the nextword index:
    (doc_id, phrase_tf) ranked phrase_tf desc, doc_id asc — IDENTICAL
    output contract to `search_phrase` (the oracle pair reuses the
    positional phrase SQL, so the auxiliary index is held to the main
    index's answers). Raises on phrases that do not analyze to exactly
    two terms — longer phrases belong to the positional path."""
    terms = analyze_phrase(phrase)
    if len(terms) != 2:
        raise ValueError(
            f"nextword serves 2-term phrases; got {len(terms)} from {phrase!r}"
        )
    nw = build_nextword(docs)
    hits = nw.filter(
        (F.col("w1") == terms[0]) & (F.col("w2") == terms[1])
    ).select("doc_id", F.col("pair_tf").alias("phrase_tf"))
    return hits.orderBy(
        F.col("phrase_tf").desc(), F.col("doc_id").asc()
    ).limit(k)


def search_span_not(
    docs: DataFrame,
    include: str,
    exclude: str,
    pre: int = 1,
    post: int = 1,
    k: int = 20,
) -> DataFrame:
    """(doc_id, kept_tf) — Lucene SpanNotQuery(include, exclude, pre,
    post): occurrences of the analyzed `include` term that are NOT
    within `pre` positions before / `post` positions after any
    occurrence of the `exclude` term (negative phrase filtering: "data"
    but not adjacent to "fast"). Docs rank by surviving-occurrence
    count, kept_tf desc / doc_id asc, top-k; docs whose every include
    occurrence is excluded disappear (Lucene drops empty span sets).

    Plan: both sides term-prune FIRST (two narrow slices of the
    zero-shuffle positional stream), then one doc_id-equi left_anti
    join with the position-window predicate — per-doc work is
    tf_inc · tf_exc only within a doc, and the anti-join shuffles the
    two pruned slices, never the positional table."""
    inc = analyze_phrase(include)
    exc = analyze_phrase(exclude)
    if len(inc) != 1 or len(exc) != 1:
        raise ValueError("span_not takes exactly one analyzable word per side")
    pos = build_positional(docs)
    inc_df = pos.filter(F.col("term") == inc[0]).select("doc_id", "pos")
    exc_df = pos.filter(F.col("term") == exc[0]).select(
        F.col("doc_id").alias("e_doc"), F.col("pos").alias("epos")
    )
    kept = inc_df.join(
        exc_df,
        (F.col("doc_id") == F.col("e_doc"))
        & (F.col("epos") >= F.col("pos") - int(pre))
        & (F.col("epos") <= F.col("pos") + int(post)),
        "left_anti",
    )
    return (
        kept.groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("kept_tf"))
        .orderBy(F.col("kept_tf").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )


def span_or_near_match(
    positional: DataFrame,
    anchor: str,
    alternatives: list[str],
    slop: int = 2,
) -> DataFrame:
    """(doc_id, or_tf) — Lucene SpanNearQuery(inOrder=false) over
    [anchor, SpanOrQuery(alternatives)]: count the anchor-term
    occurrences that have at least one occurrence of ANY alternative
    term within `slop` positions (either side). The span_or clause is
    what multi-variant proximity queries compile to ("data near (fast
    OR merge)") — the OR collapses into one isin slice instead of
    unioning per-term subqueries.

    Plan: both sides term-prune FIRST (anchor slice + ONE isin slice
    for the whole alternative set), then a doc_id-equi left_semi join
    with the band predicate — per-doc work is tf_anchor · tf_alts
    within a doc only, and the join shuffles the two pruned slices,
    never the positional table (the span_not shape, positively)."""
    alts = sorted(set(alternatives))
    if not alts:
        raise ValueError("span_or needs at least one alternative term")
    a = positional.filter(F.col("term") == anchor).select("doc_id", "pos")
    b = positional.filter(F.col("term").isin(alts)).select(
        F.col("doc_id").alias("b_doc"), F.col("pos").alias("bpos")
    )
    kept = a.join(
        b,
        (F.col("doc_id") == F.col("b_doc"))
        & (F.col("bpos") >= F.col("pos") - int(slop))
        & (F.col("bpos") <= F.col("pos") + int(slop)),
        "left_semi",
    )
    return kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("or_tf")
    )


def search_span_or(
    docs: DataFrame,
    anchor: str,
    alternatives: list[str],
    slop: int = 2,
    k: int = 20,
) -> DataFrame:
    """Top-k SpanNear[anchor, SpanOr(alternatives)] — or_tf desc,
    doc_id asc. Anchor and every alternative are analyzed like any
    query text (each must analyze to exactly one term)."""
    anc = analyze_phrase(anchor)
    if len(anc) != 1:
        raise ValueError("span_or anchor must analyze to one term")
    alts: list[str] = []
    for alt in alternatives:
        t = analyze_phrase(alt)
        if len(t) != 1:
            raise ValueError("span_or alternatives must analyze to one term")
        alts.append(t[0])
    hits = span_or_near_match(build_positional(docs), anc[0], alts, slop)
    return hits.orderBy(F.col("or_tf").desc(), F.col("doc_id").asc()).limit(
        int(k)
    )


# ---------------------------------------------------------------- SDM

SDM_LAMBDA_T = 0.85  # unigram feature weight (Metzler & Croft 2005)
SDM_LAMBDA_O = 0.10  # ordered-window (exact bigram) feature weight
SDM_LAMBDA_U = 0.05  # unordered-window feature weight
SDM_UW = 8           # unordered window size (the classic uw8)


def sdm_features(
    positional: DataFrame, terms: list[str], uw: int = SDM_UW
) -> DataFrame:
    """(doc_id, feat, tf, weight) — the Markov-random-field feature
    relation of the sequential dependence model (Metzler & Croft,
    SIGIR 2005 "A Markov random field model for term dependencies"):

      * one `t:<term>` row per (doc, distinct query term) with the
        term's tf — the full-independence features;
      * one `o:<a> <b>` row per (doc, adjacent query pair) counting
        EXACT adjacency occurrences (b directly follows a) — the
        sequential-dependence ordered-window #1(a b) features;
      * one `u:<a> <b>` row per (doc, adjacent query pair) counting
        position pairs with |pos_a − pos_b| < uw — the unordered
        #uw8(a b) co-occurrence features.

    Pairs come from the query IN ORDER (dependence is sequential);
    self-pairs (a == b) are skipped. Every feature relation is a join
    of per-term scan-pruned slices of the positional relation keyed on
    doc_id — the same bounded shape as phrase_match, so feature cost
    follows the query terms' posting mass, never the corpus."""
    uniq = sorted(set(terms))
    uni = (
        positional.filter(F.col("term").isin(uniq))
        .groupBy("doc_id", "term")
        .agg(F.count("*").cast("double").alias("tf"))
        .select(
            "doc_id",
            F.concat(F.lit("t:"), F.col("term")).alias("feat"),
            "tf",
            F.lit(SDM_LAMBDA_T).alias("weight"),
        )
    )
    out = uni
    pairs = [
        (a, b) for a, b in zip(terms, terms[1:]) if a != b
    ]
    for a, b in dict.fromkeys(pairs):  # de-dup, keep query order
        pa = positional.filter(F.col("term") == a).select(
            "doc_id", F.col("pos").alias("pa")
        )
        pb = positional.filter(F.col("term") == b).select(
            F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
        )
        ordered = (
            pa.join(
                pb,
                (F.col("doc_id") == F.col("doc_b"))
                & (F.col("pb") == F.col("pa") + 1),
            )
            .groupBy("doc_id")
            .agg(F.count("*").cast("double").alias("tf"))
            .select(
                "doc_id",
                F.lit(f"o:{a} {b}").alias("feat"),
                "tf",
                F.lit(SDM_LAMBDA_O).alias("weight"),
            )
        )
        unordered = (
            pa.join(
                pb,
                (F.col("doc_id") == F.col("doc_b"))
                & (F.abs(F.col("pb") - F.col("pa")) < int(uw)),
            )
            .groupBy("doc_id")
            .agg(F.count("*").cast("double").alias("tf"))
            .select(
                "doc_id",
                F.lit(f"u:{a} {b}").alias("feat"),
                "tf",
                F.lit(SDM_LAMBDA_U).alias("weight"),
            )
        )
        out = out.unionByName(ordered).unionByName(unordered)
    return out


def search_sdm(
    positional: DataFrame,
    doc_stats: DataFrame,
    terms: list[str],
    mu: float = 2000.0,
    uw: int = SDM_UW,
    k: int = 20,
) -> DataFrame:
    """Top-k (doc_id, score) under the SEQUENTIAL DEPENDENCE MODEL —
    Metzler & Croft's MRF ranking (SIGIR 2005), the classic
    term-dependence upgrade over bag-of-words retrieval that Indri/
    Galago ship as their default strong baseline. Each feature f of
    `sdm_features` (unigrams λ=0.85, ordered bigram windows λ=0.10,
    unordered uw8 windows λ=0.05) scores with the SAME Dirichlet
    arithmetic as `search_lmd` generalized from terms to features:

        part_f(D) = λ_f · [ ln(1 + tf_f,D / (μ · cf_f / T))
                            + ln(μ / (dl_D + μ)) ]

    where cf_f is the feature's COLLECTION frequency and T the corpus
    retained-token total — i.e. SDM ≡ LM-Dirichlet over a generalized
    feature-postings relation, which is exactly how it is built here
    (a single-term query degenerates to 0.85 × search_lmd, pinned by
    test). Disjunctive over feature hits, ties doc_id asc.

    Plan shape: per-term scan-pruned positional slices → bounded pair
    joins (sdm_features); cf rides a broadcast join of the ≤ 3|q|-row
    per-feature aggregate; T folds in as a 1-row broadcast scalar; one
    map-side-combinable groupBy(doc_id) scores. No UDFs, no corpus
    window."""
    empty = doc_stats.select(
        F.col("doc_id"), F.lit(0.0).alias("score")
    ).limit(0)
    if not terms:
        return empty
    feats = sdm_features(positional, terms, uw=uw)
    cf = feats.groupBy("feat").agg(F.sum("tf").alias("cf"))
    t_row = doc_stats.agg(
        F.sum("dl").cast("double").alias("total_tokens")
    )
    scored = (
        feats.join(F.broadcast(cf), "feat")
        .join(doc_stats.select("doc_id", "dl"), "doc_id")
        .crossJoin(F.broadcast(t_row))
        .withColumn(
            "part",
            F.col("weight")
            * (
                F.log(
                    1.0
                    + F.col("tf")
                    / (float(mu) * F.col("cf") / F.col("total_tokens"))
                )
                + F.log(
                    F.lit(float(mu)) / (F.col("dl").cast("double") + float(mu))
                )
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("part"), 4).alias("score"))
    )
    return scored.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(int(k))
