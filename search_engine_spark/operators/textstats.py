"""Text-analysis operators for the training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

These go beyond the reference's operator set (it has no corpus-analysis
surface) but are first-class for a web-scale ingestion engine feeding
training pipelines. All four are pure column-expression plans — JVM-side,
whole-stage codegen, zero UDFs — and every rule is mirrored in DuckDB SQL
(functions/oracle_fragments.py::textstats fragments) for the driver's
value-hash gate.

Scale notes: each operator is a single narrow scan projection (no shuffle,
no join); they pushdown-prune to (doc_id, text) columns only, so at 100 TB
they read exactly two parquet columns and stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..textproc.stopwords import STOPWORDS
from ..textproc.tokenize import WS_SPLIT

# frozen constants — mirrored in oracle SQL
CYRILLIC_CLASS = "а-яё"
LATIN_CLASS = "a-z"
LANG_RU_MIN_RATIO = 0.6  # ≥60% of letters Cyrillic → ru
LANG_EN_MIN_RATIO = 0.6
QUALITY_STOPWORD_LO = 0.05  # natural prose has SOME function words
QUALITY_STOPWORD_HI = 0.6
QUALITY_MEAN_WORD_LO = 2.0
QUALITY_MEAN_WORD_HI = 12.0

_STOP_LIST = sorted(STOPWORDS)


def _nchars(col, char_class: str):
    """Count of characters in a regex class: len - len(after removing
    exactly those characters)."""
    return F.length(col) - F.length(
        F.regexp_replace(col, f"[{char_class}]", "")
    )


def language_id(docs: DataFrame) -> DataFrame:
    """(doc_id, cyr, lat, lang_pred) — n-gram-free script heuristic:
    classify by the Cyrillic/Latin letter ratio (deterministic, frozen
    thresholds). 'mixed' when neither script dominates."""
    t = F.lower(F.col("text"))
    cyr = _nchars(t, CYRILLIC_CLASS)
    lat = _nchars(t, LATIN_CLASS)
    letters = cyr + lat
    pred = (
        F.when(letters == 0, F.lit("unknown"))
        .when(cyr / letters >= LANG_RU_MIN_RATIO, F.lit("ru"))
        .when(lat / letters >= LANG_EN_MIN_RATIO, F.lit("en"))
        .otherwise(F.lit("mixed"))
    )
    return docs.select(
        "doc_id",
        cyr.cast("long").alias("cyr"),
        lat.cast("long").alias("lat"),
        pred.alias("lang_pred"),
    )


# GPT-2-style pre-tokenizer shape, restricted to constructs Java regex and
# RE2 (the DuckDB oracle) evaluate identically: contraction suffixes,
# optionally space-prefixed letter runs / digit runs / symbol runs. The real
# GPT-2 pattern's \p{L}/\p{N} classes and trailing-whitespace lookahead are
# dropped (RE2 has no lookahead); what remains is the token-boundary
# behavior a BPE pre-tokenizer induces on ASCII text.
BPE_SPLIT = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^a-zA-Z0-9 \\t\\r\\n\\f]+"


def token_counts(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_terms, n_unique_terms) —
    whitespace token count, BPE-ish pre-tokenizer match count (BPE_SPLIT,
    the training-data cost estimator), and retained-term counts after the
    full analyzer (tokenizer T2-T5 applied via the shared explode;
    aggregated back per doc)."""
    from ..functions.text_columns import explode_terms

    ws = docs.select(
        "doc_id",
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), WS_SPLIT)))
        .cast("long")
        .alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_SPLIT)).cast("long").alias(
            "n_bpe_tokens"
        ),
    )
    terms = (
        explode_terms(docs)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.count_distinct("term").alias("n_unique_terms"),
        )
    )
    return (
        ws.join(terms, "doc_id", "left")
        .select(
            "doc_id",
            "n_ws_tokens",
            "n_bpe_tokens",
            F.coalesce("n_terms", F.lit(0)).cast("long").alias("n_terms"),
            F.coalesce("n_unique_terms", F.lit(0))
            .cast("long")
            .alias("n_unique_terms"),
        )
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, stopword_ratio, mean_word_len, digit_ratio,
    quality) — frozen heuristic quality score in [0,1]:

      * stopword_ratio within [0.05, 0.6]  (+0.4) — prose-like
      * mean word length within [2, 12]    (+0.3) — no gibberish runs
      * digit_ratio ≤ 0.2                  (+0.2) — not a number dump
      * non-empty                          (+0.1)

    Everything is exact integer/decimal arithmetic until the final rounded
    ratio columns (4 dp) so the oracle hashes identically."""
    t = F.lower(F.trim(F.col("text")))
    n_chars = F.length(t)
    toks = F.split(t, WS_SPLIT)
    n_tok = F.when(t == "", F.lit(0)).otherwise(F.size(toks))
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(_STOP_LIST)))
    digits = _nchars(t, "0-9")
    # mean word length = non-whitespace chars / token count (robust to
    # repeated separators; mirrored exactly in the oracle SQL)
    non_ws = F.length(F.regexp_replace(t, WS_SPLIT, ""))
    mean_wl = F.when(n_tok == 0, F.lit(0.0)).otherwise(non_ws / n_tok)
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(stop_hits / n_tok)
    digit_ratio = F.when(n_chars == 0, F.lit(0.0)).otherwise(digits / n_chars)
    quality_sum = (
        F.when(
            (stop_ratio >= QUALITY_STOPWORD_LO)
            & (stop_ratio <= QUALITY_STOPWORD_HI),
            0.4,
        ).otherwise(0.0)
        + F.when(
            (mean_wl >= QUALITY_MEAN_WORD_LO) & (mean_wl <= QUALITY_MEAN_WORD_HI),
            0.3,
        ).otherwise(0.0)
        + F.when(digit_ratio <= 0.2, 0.2).otherwise(0.0)
        + F.when(n_chars > 0, 0.1).otherwise(0.0)
    )
    # an empty document is never "quality" — checks that pass vacuously
    # (digit ratio 0) must not score it
    quality = F.when(n_chars == 0, F.lit(0.0)).otherwise(quality_sum)
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def fingerprint_col(text_col: str = "text"):
    """md5 of the whitespace-normalized lowercase text — the exact-dedup
    key, shared by the batch and streaming dedup paths."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), WS_SPLIT, " ")
    return F.md5(norm)


def fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, fp) — deterministic content fingerprint (fingerprint_col)."""
    return docs.select("doc_id", fingerprint_col().alias("fp"))


def unigram_lm_scores(postings: DataFrame) -> DataFrame:
    """Unigram-LM quality filter → (doc_id, dl, avg_logp, lm_ppl): score
    every document by the mean log-probability of its retained tokens
    under the corpus unigram MLE — the cheap stand-in for the
    perplexity-filtering pass (CCNet/KenLM-style) every web-scale
    training-data pipeline runs. lm_ppl = exp(−avg_logp); high perplexity
    ⇒ the doc's token mix is unlike the corpus (gibberish, boilerplate,
    wrong language).

    Input is the logical postings relation (doc_id, term, tf), so the
    expensive tokenize pass is shared with the index build. Plan: one
    groupBy(term) for corpus frequencies, one term-keyed join back
    (map-side combinable aggs; the cf side is vocabulary-sized — AQE
    broadcasts it while it fits), one groupBy(doc_id). The corpus total T
    is a driver-side scalar baked as a literal (the idf-map pattern).

    Deterministic: avg_logp and lm_ppl rounded 4 dp."""
    cf = postings.groupBy("term").agg(F.sum("tf").alias("cf"))
    t_total = cf.agg(F.sum("cf")).collect()[0][0] or 0
    if t_total == 0:
        return postings.select(
            "doc_id",
            F.lit(0).cast("long").alias("dl"),
            F.lit(0.0).alias("avg_logp"),
            F.lit(0.0).alias("lm_ppl"),
        ).limit(0)
    logp = F.log(F.col("cf").cast("double") / F.lit(float(t_total)))
    per_doc = (
        postings.join(cf, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("dl"),
            (F.sum(F.col("tf").cast("double") * logp) / F.sum("tf")).alias(
                "avg"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        F.round("avg", 4).alias("avg_logp"),
        F.round(F.exp(-F.col("avg")), 4).alias("lm_ppl"),
    )


def doc_keywords(
    postings: DataFrame, term_dict: DataFrame, n_docs: int, k: int = 3
) -> DataFrame:
    """Per-document keyword extraction → (doc_id, term, tfidf, rank): the
    top-k terms of each doc by tf·idf (idf = ln(N/df)) — the tagging /
    labeling operator of a curation pipeline (and the per-doc profile
    "more like this" builds its disjunctive query from).

    Plan: term-keyed join postings↔dictionary (AQE broadcasts the
    vocabulary side while it fits), then one window partitioned by doc_id
    — maximal-cardinality key, no skew. N arrives as a driver scalar.

    Deterministic: ranked on the ROUNDED tfidf (4 dp) so both engines
    order identically; ties → term asc."""
    from pyspark.sql import Window

    tfidf = F.round(
        F.col("tf").cast("double")
        * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
        4,
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        postings.join(term_dict.select("term", "df"), "term")
        .withColumn("tfidf", tfidf)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("doc_id", "term", "tfidf", "rank")
    )


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals → (doc_id, n_tok, dup_token_frac,
    top_token_ratio, top_bigram_ratio): the repetition family of quality
    rules from Rae et al. 2021 ("Scaling Language Models: ... Gopher",
    §A1.1), adapted token-level (this corpus has no line structure):

      * dup_token_frac   — (n_tok − n_distinct) / n_tok: mass of repeated
        whitespace tokens (Gopher's duplicate-line fraction analogue);
      * top_token_ratio  — most-frequent-token count / n_tok (Gopher's
        top-1-gram character fraction analogue);
      * top_bigram_ratio — most-frequent-bigram count / (n_tok − 1)
        (Gopher's top-2-gram rule). 0.0 for docs with < 2 tokens.

    Scale shape: two explode→groupBy passes (tokens, bigrams), both linear
    in corpus size, both map-side combinable, both keyed on
    (doc_id, gram) — maximal cardinality, no skew, no window, no UDF. The
    bigram array is built in-task with zip_with (no self-join). Empty docs
    survive with all-zero signals via the left join from the doc spine.

    Deterministic: ratios rounded 4 dp."""
    toks = F.split(
        F.regexp_replace(F.lower(F.trim("text")), WS_SPLIT, " "), " "
    )
    base = docs.filter(F.trim("text") != "").select(
        "doc_id", toks.alias("toks")
    )
    tok_agg = (
        base.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.count("*").alias("n_distinct"),
            F.max("c").alias("top_tok"),
        )
    )
    n = F.size("toks")
    bigrams = F.zip_with(
        F.slice("toks", 1, n - 1),
        F.slice("toks", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg_agg = (
        base.filter(n >= 2)
        .select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bg"), F.max("c").alias("top_bg"))
    )
    n_tok = F.coalesce("n_tok", F.lit(0)).cast("long")
    return (
        docs.select("doc_id")
        .join(tok_agg, "doc_id", "left")
        .join(bg_agg, "doc_id", "left")
        .select(
            "doc_id",
            n_tok.alias("n_tok"),
            F.round(
                F.when(
                    n_tok > 0,
                    (n_tok - F.coalesce("n_distinct", F.lit(0))) / n_tok,
                ).otherwise(0.0),
                4,
            ).alias("dup_token_frac"),
            F.round(
                F.when(
                    n_tok > 0, F.coalesce("top_tok", F.lit(0)) / n_tok
                ).otherwise(0.0),
                4,
            ).alias("top_token_ratio"),
            F.round(
                F.when(
                    F.coalesce("n_bg", F.lit(0)) > 0,
                    F.col("top_bg") / F.col("n_bg"),
                ).otherwise(0.0),
                4,
            ).alias("top_bigram_ratio"),
        )
    )


def collocations(
    positional: DataFrame, min_count: int = 5, k: int = 20
) -> DataFrame:
    """Collocation mining → (term_a, term_b, pair_count, pmi): adjacent
    retained-token bigrams scored by pointwise mutual information
    PMI = ln(P(ab) / (P(a)·P(b))) — the classic phrase-mining signal for
    training-data pipelines (multi-word expressions, named entities).
    Computed over the positional postings relation
    (operators/positional.py), so stopwords never split a collocation
    (they are filtered before position numbering).

    Scale shape: the bigram self-join keys on (doc_id, pos) — maximal
    cardinality, no skew; both aggregations (per-pair, per-term) are
    map-side combinable; T and B are two scalar aggregates collected
    driver-side and baked into the PMI expression as literals (the idf-map
    pattern). No UDF, no window over the corpus.

    Deterministic: pmi rounded 4 dp; ties → (term_a, term_b) asc."""
    occ = positional.groupBy("term").agg(F.count("*").alias("occ"))
    t_total = positional.count()  # total retained-token occurrences
    right = positional.select(
        F.col("doc_id"),
        (F.col("pos") - 1).alias("pos"),
        F.col("term").alias("term_b"),
    )
    bigrams = (
        positional.withColumnRenamed("term", "term_a")
        .join(right, ["doc_id", "pos"])
        .groupBy("term_a", "term_b")
        .agg(F.count("*").alias("pair_count"))
    )
    b_total = bigrams.agg(F.sum("pair_count")).collect()[0][0] or 0
    if b_total == 0 or t_total == 0:
        return bigrams.withColumn("pmi", F.lit(0.0)).limit(0)
    t_lit = F.lit(float(t_total))
    b_lit = F.lit(float(b_total))
    scored = (
        bigrams.filter(F.col("pair_count") >= min_count)
        .join(occ.withColumnRenamed("term", "term_a").withColumnRenamed("occ", "occ_a"), "term_a")
        .join(occ.withColumnRenamed("term", "term_b").withColumnRenamed("occ", "occ_b"), "term_b")
        .withColumn(
            "pmi",
            F.round(
                F.log(
                    (F.col("pair_count").cast("double") * t_lit * t_lit)
                    / (
                        b_lit
                        * F.col("occ_a").cast("double")
                        * F.col("occ_b").cast("double")
                    )
                ),
                4,
            ),
        )
    )
    return (
        scored.select("term_a", "term_b", "pair_count", "pmi")
        .orderBy(F.col("pmi").desc(), F.col("term_a").asc(), F.col("term_b").asc())
        .limit(k)
    )


LENGTH_QUANTILES = (0.25, 0.5, 0.75, 0.95)
DL_BUCKET_WIDTH = 10


def length_quantiles(
    docs: DataFrame, qs: tuple[float, ...] = LENGTH_QUANTILES
) -> DataFrame:
    """Exact per-language token-length quantiles → (lang, q, n_tokens).

    Curation pipelines threshold on these (e.g. drop docs under the p25 of
    their language). EXACT percentile (sort-based linear interpolation),
    not approx_percentile: the driver oracle hashes values, and a corpus
    report should be reproducible run-to-run. One groupBy(lang) — language
    cardinality is tiny, and Spark's percentile aggregate keeps a
    per-group buffer, so the agg stays map-side-combining; at 10^12 docs
    switch to approx_percentile(…, accuracy) and drop the oracle pairing.
    """
    n_tok = (
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), WS_SPLIT)))
        .cast("long")
    )
    pcts = docs.select("lang", n_tok.alias("n")).groupBy("lang").agg(
        F.percentile("n", F.array(*[F.lit(q) for q in qs])).alias("ps")
    )
    pairs = F.arrays_zip(
        F.array(*[F.lit(q) for q in qs]).alias("q"),
        F.col("ps").alias("n_tokens"),
    )
    return pcts.select(
        "lang", F.explode(pairs).alias("z")
    ).select(
        "lang",
        F.col("z.q").alias("q"),
        F.round(F.col("z.n_tokens"), 4).alias("n_tokens"),
    )


def dl_histogram(docs: DataFrame, width: int = DL_BUCKET_WIDTH) -> DataFrame:
    """Doc-length histogram → (bucket_lo, n_docs, pct): fixed-width
    token-count buckets with corpus share (4 dp). The corpus total enters
    as a one-row broadcast cross join — single pass, two tiny apexes, no
    driver collect."""
    n_tok = (
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), WS_SPLIT)))
        .cast("long")
    )
    b = docs.select(((n_tok / width).cast("long") * width).alias("bucket_lo"))
    total = F.broadcast(b.agg(F.count(F.lit(1)).cast("double").alias("t")))
    return (
        b.groupBy("bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .crossJoin(total)
        .select(
            "bucket_lo",
            "n_docs",
            F.round(F.col("n_docs") / F.col("t"), 4).alias("pct"),
        )
    )


# Frozen logistic quality model (the "LR quality filter" of production
# corpus pipelines — GPT-3 trained a linear classifier WebText-vs-raw-CC
# and kept docs by its score; weights here are a pinned, versioned asset
# over the engine's own quality features, positive on prose-like text).
QM_W_STOP = 2.5
QM_W_MWL = 0.35
QM_W_DIGIT = -6.0
QM_W_LOGLEN = 0.45
QM_BIAS = -2.2
QM_THRESHOLD = 0.5


def quality_model_scores(docs: DataFrame) -> DataFrame:
    """(doc_id, p_keep, keep) — frozen-weight logistic quality classifier:

        z = w·[stopword_ratio, mean_word_len, digit_ratio, ln(1+n_chars)] + b
        p_keep = sigmoid(z),  keep = p_keep ≥ 0.5

    Consumes quality_scores' ROUNDED feature columns, so both engines
    feed bit-identical inputs into the identical arithmetic (the rounded
    p_keep then hashes identically). One codegen projection over the
    feature frame — model inference is just column math; swapping in
    trained weights is a constant edit, not a plan change."""
    q = quality_scores(docs)
    z = (
        F.lit(QM_W_STOP) * F.col("stopword_ratio")
        + F.lit(QM_W_MWL) * F.col("mean_word_len")
        + F.lit(QM_W_DIGIT) * F.col("digit_ratio")
        + F.lit(QM_W_LOGLEN) * F.log(F.lit(1.0) + F.col("n_chars"))
        + F.lit(QM_BIAS)
    )
    p = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 4)
    return q.select(
        "doc_id", p.alias("p_keep"), (p >= QM_THRESHOLD).alias("keep")
    )


def ccnet_buckets(docs: DataFrame, postings: DataFrame) -> DataFrame:
    """CCNet perplexity buckets → (doc_id, lang, lm_ppl, bucket): per
    LANGUAGE, rank documents by unigram-LM perplexity ascending and
    split into equal terciles head / middle / tail (Wenzek et al.,
    "CCNet", 2020 §4.4 — head ≈ Wikipedia-like, tail ≈ noisy; training
    recipes typically keep head+middle or reweight by bucket).

    Determinism: ranking uses the ROUNDED lm_ppl with doc_id-asc ties —
    the same pinned total-order trick as every ranked surface here.
    Docs with no retained tokens have no LM evidence and are excluded
    (CCNet drops empties before scoring).

    Plan: unigram_lm_scores (two corpus aggs + a vocab join), one
    doc_id join for lang, then ntile over a per-language window — the
    per-partition sort IS CCNet's per-language sort; languages
    parallelize independently, and a skewed giant language would move
    to approx-quantile thresholds (three fixed cutpoints) rather than a
    full sort."""
    from pyspark.sql import Window

    scores = unigram_lm_scores(postings).select("doc_id", "lm_ppl")
    joined = scores.join(docs.select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy(
        F.col("lm_ppl").asc(), F.col("doc_id").asc()
    )
    nt = F.ntile(3).over(w)
    return joined.select(
        "doc_id",
        "lang",
        "lm_ppl",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")), nt
        ).alias("bucket"),
    )


TREND_BUCKET_SECS = 3600


def trending_terms(
    docs: DataFrame,
    bucket_secs: int = TREND_BUCKET_SECS,
    k: int = 5,
) -> DataFrame:
    """(bucket_epoch, term, n) — the top-k terms of each crawl-time
    window, by retained-token occurrence count: the "trending now" board
    every search engine runs over its query/ingest logs, here over the
    corpus's event time (warc_ts). TZ-independent epoch bucketing (the
    facet_date_histogram convention); deterministic (n desc, term asc)
    cut per bucket.

    Plan: tokenize → one groupBy(bucket, term) with map-side combine →
    WindowGroupLimit per bucket (bounded: buckets × k rows survive).
    The streaming twin (streaming/stream_trends.py) runs the SAME
    aggregation with a watermark; top-k happens on the sink table there
    because append-mode can only emit closed windows."""
    from pyspark.sql import Window

    from ..functions.text_columns import explode_terms

    terms = explode_terms(docs, keep=["doc_id", "warc_ts"])
    epoch = F.col("warc_ts").cast("long")
    counts = (
        terms.withColumn(
            "bucket_epoch", (epoch - epoch % bucket_secs).cast("long")
        )
        .groupBy("bucket_epoch", "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("bucket_epoch").orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("bucket_epoch", "term", F.col("n").cast("long").alias("n"))
    )


# ----------------------------------------------- moment-based aggregations

# frozen range-aggregation buckets over n_chars (from inclusive, to
# exclusive — Elasticsearch `range` agg semantics); mirrored in
# oracle_pipeline.range_agg_sql
RANGE_BUCKETS = [(None, 100), (100, 400), (400, 1200), (1200, None)]


def _range_key(lo, hi) -> str:
    return f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"


def extended_stats(docs: DataFrame) -> DataFrame:
    """Per-site extended statistics of document length → (site_key, n,
    min_chars, max_chars, sum_chars, avg_chars, sum_sq, variance, std,
    std_upper, std_lower): Elasticsearch's `extended_stats` aggregation
    (population variance, ±2σ bounds).

    Parity is guaranteed by construction, not by trusting each engine's
    variance builtin: both engines aggregate EXACT integer moments
    (count, Σx, Σx² as BIGINT — no float accumulation order to disagree
    on) and then derive avg/var/std with the IDENTICAL IEEE-double
    expression  var = Σx²/n − avg²  (clamped at 0 before sqrt), rounded
    4 dp at the edge. Never var_pop()/stddev_pop() builtins, whose
    single-pass accumulators differ in last-bit rounding across engines.

    Plan: one narrow scan (doc_id, text) → length → groupBy(site_key)
    with map-side-combinable integer sums; output is ≤ |sites| rows.
    At 100 TB this is the canonical one-shuffle moment sketch."""
    from ..sources.documents import site_key_col

    n_chars = F.length("text").cast("bigint")
    g = (
        docs.select(site_key_col().alias("site_key"), n_chars.alias("x"))
        .groupBy("site_key")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.min("x").cast("bigint").alias("min_chars"),
            F.max("x").cast("bigint").alias("max_chars"),
            F.sum("x").cast("bigint").alias("sum_chars"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sum_sq"),
        )
    )
    avg = F.col("sum_chars").cast("double") / F.col("n").cast("double")
    var = F.col("sum_sq").cast("double") / F.col("n").cast("double") - avg * avg
    var0 = F.greatest(var, F.lit(0.0))
    std = F.sqrt(var0)
    return g.select(
        "site_key", "n", "min_chars", "max_chars", "sum_chars", "sum_sq",
        F.round(avg, 4).alias("avg_chars"),
        F.round(var0, 4).alias("variance"),
        F.round(std, 4).alias("std"),
        F.round(avg + 2.0 * std, 4).alias("std_upper"),
        F.round(avg - 2.0 * std, 4).alias("std_lower"),
    )


def matrix_stats(docs: DataFrame) -> DataFrame:
    """Per-language covariance/correlation between document length and
    whitespace token count → (lang, n, mean_chars, mean_tokens, var_chars,
    var_tokens, covariance, correlation): Elasticsearch's `matrix_stats`
    aggregation over the field pair (n_chars, n_ws_tokens).

    Same exact-integer-moment discipline as `extended_stats`: both
    engines reduce to BIGINT (n, Σx, Σy, Σx², Σy², Σxy) and derive
    cov = Σxy/n − x̄·ȳ and corr = cov/√(varx·vary) with the identical
    double expression (corr pinned to 0.0 when either variance is 0),
    rounded 4 dp. One narrow scan, one map-side-combinable groupBy."""
    t = F.trim(F.col("text"))
    x = F.length("text").cast("bigint")
    y = (
        F.when(t == "", F.lit(0))
        .otherwise(F.size(F.split(t, WS_SPLIT)))
        .cast("bigint")
    )
    g = (
        docs.select(F.col("lang"), x.alias("x"), y.alias("y"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("x").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
            F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        )
    )
    nd = F.col("n").cast("double")
    mx = F.col("sx").cast("double") / nd
    my = F.col("sy").cast("double") / nd
    vx = F.greatest(F.col("sxx").cast("double") / nd - mx * mx, F.lit(0.0))
    vy = F.greatest(F.col("syy").cast("double") / nd - my * my, F.lit(0.0))
    cov = F.col("sxy").cast("double") / nd - mx * my
    corr = F.when(
        (vx > 0.0) & (vy > 0.0), cov / F.sqrt(vx * vy)
    ).otherwise(F.lit(0.0))
    return g.select(
        "lang", "n",
        F.round(mx, 4).alias("mean_chars"),
        F.round(my, 4).alias("mean_tokens"),
        F.round(vx, 4).alias("var_chars"),
        F.round(vy, 4).alias("var_tokens"),
        F.round(cov, 4).alias("covariance"),
        F.round(corr, 4).alias("correlation"),
    )


def range_agg(docs: DataFrame) -> DataFrame:
    """Document-length range buckets → (bucket_idx, range_key, doc_count,
    min_chars, max_chars, avg_chars): Elasticsearch's `range` aggregation
    (from inclusive, to exclusive, frozen RANGE_BUCKETS), EMPTY BUCKETS
    INCLUDED with doc_count 0 (the ES contract — a dashboard histogram
    must not drop axes), zero-filled stats.

    Plan: per-doc bucket assignment is a branch-free CASE over one
    length() projection; one groupBy(bucket) with map-side combine; the
    4-row literal bucket frame left-joins the counts (broadcast by
    construction). Output is exactly |RANGE_BUCKETS| rows at any scale."""
    n_chars = F.length("text").cast("bigint")
    bucket = F.lit(None).cast("int")
    expr = None
    for i, (lo, hi) in enumerate(RANGE_BUCKETS):
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (n_chars >= lo)
        if hi is not None:
            cond = cond & (n_chars < hi)
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    counts = (
        docs.select(expr.alias("bucket_idx"), n_chars.alias("x"))
        .groupBy("bucket_idx")
        .agg(
            F.count("*").cast("bigint").alias("doc_count"),
            F.min("x").cast("bigint").alias("min_chars"),
            F.max("x").cast("bigint").alias("max_chars"),
            F.sum("x").cast("bigint").alias("sum_chars"),
        )
    )
    spark = docs.sparkSession
    frame = spark.createDataFrame(
        [(i, _range_key(lo, hi)) for i, (lo, hi) in enumerate(RANGE_BUCKETS)],
        "bucket_idx INT, range_key STRING",
    )
    avg = (
        F.when(
            F.col("doc_count") > 0,
            F.round(
                F.col("sum_chars").cast("double")
                / F.col("doc_count").cast("double"),
                4,
            ),
        ).otherwise(F.lit(0.0))
    )
    return (
        frame.join(counts, "bucket_idx", "left")
        .select(
            "bucket_idx",
            "range_key",
            F.coalesce("doc_count", F.lit(0)).cast("bigint").alias("doc_count"),
            F.coalesce("min_chars", F.lit(0)).cast("bigint").alias("min_chars"),
            F.coalesce("max_chars", F.lit(0)).cast("bigint").alias("max_chars"),
            F.coalesce(avg, F.lit(0.0)).alias("avg_chars"),
        )
    )


def string_stats(docs: DataFrame) -> DataFrame:
    """Elasticsearch `string_stats` (show_distribution shape collapsed to
    the headline metrics) → one row (n_docs, min_len, max_len, avg_len,
    entropy): corpus-level Shannon entropy (bits) of the CHARACTER
    distribution of `text`, plus exact length stats.

    Entropy = −Σ_c p_c·log2(p_c) with p_c = count_c/total from exact
    BIGINT character counts; the per-character terms are identical
    doubles in both engines and the final sum is rounded 4 dp (the same
    float-sum discipline as BM25 score sums). min/max/avg lengths come
    from the usual exact-moment reduction.

    Plan: lengths are the standard one-shuffle scalar aggregate; the
    character histogram is explode(chars) → ONE map-side-combinable
    groupBy(char) — bounded by the alphabet (≤ a few thousand
    codepoints at web scale), so the second aggregate's reduce side is
    tiny no matter the corpus."""
    lens = docs.select(F.length("text").cast("bigint").alias("l")).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.min("l").cast("bigint").alias("min_len"),
        F.max("l").cast("bigint").alias("max_len"),
        F.sum("l").cast("bigint").alias("sum_len"),
    )
    # codepoint-wise split: '(?s).' matches one CODE POINT in Java regex
    # (a zero-width '(?!^)' split would cut astral chars into lone
    # surrogates and diverge from the oracle's UTF-8 string_split — the
    # adversarial emoji doc caught exactly this)
    chars = (
        docs.select(
            F.explode(
                F.regexp_extract_all(F.col("text"), F.lit("(?s)."), 0)
            ).alias("c")
        )
        .filter(F.col("c") != "")
        .groupBy("c")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    total = chars.agg(F.sum("cnt").cast("bigint").alias("total"))
    p = F.col("cnt").cast("double") / F.col("total").cast("double")
    ent = (
        chars.crossJoin(F.broadcast(total))
        .select((p * F.log2(p)).alias("term"))
        .agg(F.round(-F.sum("term"), 4).alias("entropy"))
    )
    return lens.crossJoin(F.broadcast(ent)).select(
        "n_docs", "min_len", "max_len",
        F.round(
            F.col("sum_len").cast("double") / F.col("n_docs").cast("double"), 4
        ).alias("avg_len"),
        "entropy",
    )


def weighted_avg_quality(docs: DataFrame) -> DataFrame:
    """Elasticsearch `weighted_avg` → per-language (lang, n, w_avg_quality):
    the quality score weighted by document length — long documents count
    proportionally more, the standard corpus-health headline number.

    Weighted mean = Σ(q·w)/Σ(w) with q the 4-dp-rounded quality score
    (shared frozen spec with quality_scores) and w = n_chars exact
    BIGINT; docs with zero weight drop out of both sums (the ES
    convention: missing/zero weight excluded). One narrow scan, one
    map-side-combinable groupBy(lang)."""
    q = quality_scores(docs).select("doc_id", "quality", "n_chars")
    base = docs.select("doc_id", "lang").join(q, "doc_id")
    g = (
        base.filter(F.col("n_chars") > 0)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.col("quality") * F.col("n_chars").cast("double")).alias("_num"),
            F.sum(F.col("n_chars").cast("double")).alias("_den"),
        )
    )
    return g.select(
        "lang", "n",
        F.round(F.col("_num") / F.col("_den"), 4).alias("w_avg_quality"),
    )


def clarity_score(
    postings: DataFrame,
    terms: list[str],
    top_terms: int = 30,
) -> DataFrame:
    """Query clarity (Cronen-Townsend, Zhou & Croft, SIGIR'02) — query
    PERFORMANCE PREDICTION: the KL divergence between the language model
    of the query's result set and the collection model. Ambiguous
    queries draw a result set whose word distribution looks like the
    whole collection (clarity → 0); crisp queries concentrate (high
    clarity). The standard pre-retrieval triage for query routing,
    suggestion triggering, and relevance-feedback gating.

    Pinned spec (the simplified document-model form): R = conjunctive
    hit set; P(w|R) = Σ_{d∈R} tf(w,d) / Σ_{d∈R} |d|_retained;
    P(w|C) = ctf(w) / total retained tokens; per-term contribution
    P(w|R)·ln(P(w|R)/P(w|C)), rounded 6 dp, top `top_terms` by
    (contrib desc, term asc). Σ contrib = the clarity score; per-term
    rows are returned because the top contributors ARE the query's
    induced topic — the diagnostic a ranking engineer reads.

    Plan shape: the hit set (bounded by query selectivity) semi-drives
    one postings re-scan; both LM aggregations are map-side combinable
    single-shuffle groupBys; the collection ctf joins on term AFTER the
    result-set vocabulary has collapsed cardinality; the two totals are
    scalar broadcast cross-joins. No window, no UDF.
    """
    from .search import _conjunctive_hits  # local import avoids a cycle

    hits = _conjunctive_hits(postings, terms).select("doc_id")
    rel = postings.join(hits, "doc_id", "left_semi")
    rel_tf = rel.groupBy("term").agg(F.sum("tf").alias("rtf"))
    rel_total = rel.agg(F.sum("tf").cast("double").alias("rtot"))
    coll_tf = postings.groupBy("term").agg(F.sum("tf").alias("ctf"))
    coll_total = postings.agg(F.sum("tf").cast("double").alias("ctot"))
    return (
        rel_tf.join(coll_tf, "term")
        .crossJoin(F.broadcast(rel_total))
        .crossJoin(F.broadcast(coll_total))
        .select(
            "term",
            (F.col("rtf") / F.col("rtot")).alias("p_rel"),
            (F.col("ctf") / F.col("ctot")).alias("p_coll"),
        )
        .select(
            "term",
            F.round(
                F.col("p_rel") * F.log(F.col("p_rel") / F.col("p_coll")),
                6,
            ).alias("contrib"),
        )
        .orderBy(F.col("contrib").desc(), F.col("term").asc())
        .limit(int(top_terms))
    )


def categorize_text(docs: DataFrame, k: int = 20) -> DataFrame:
    """ES `categorize_text` (ML log categorization) → (category, n,
    example_doc_id): documents grouped by their TEMPLATE — the lowercase
    text with digit runs collapsed to '<n>' and space/tab/newline runs
    to one space — a deterministic token-pattern spec where ES runs its
    ML tokenizer (the engine's usual exact-spec upgrade). Top-k by
    doc_count desc, category asc; example is the smallest doc_id.

    Plan: one codegen map (two regexp_replace) → one map-side-
    combinable groupBy → TakeOrdered(k). The explicit [ \\t\\n\\r]
    whitespace class keeps Java-regex and RE2 semantics identical
    (their \\s classes differ on vertical tab)."""
    template = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[0-9]+", "<n>"),
            "[ \\t\\n\\r]+",
            " ",
        )
    )
    return (
        docs.select(template.alias("category"), "doc_id")
        .filter(F.col("category") != "")
        .groupBy("category")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("doc_id").alias("example_doc_id"),
        )
        .orderBy(F.col("n").desc(), F.col("category").asc())
        .limit(k)
    )


def frequent_item_sets(
    docs: DataFrame, min_support: int = 2, k: int = 20
) -> DataFrame:
    """ES `frequent_item_sets` (pairwise tier) → (t1, t2, support):
    term pairs co-occurring in ≥ min_support documents, top-k by
    support desc / t1 asc / t2 asc. The per-doc distinct term sets are
    small (bounded by doc length), so the t1 < t2 self-join fans out
    C(|terms_d|, 2) per doc — a candidate-bounded join keyed on doc_id,
    never a corpus×corpus product (the dedup-family shape)."""
    from ..functions.text_columns import explode_terms

    terms = explode_terms(docs).distinct()
    a = terms.select("doc_id", F.col("term").alias("t1"))
    b = terms.select("doc_id", F.col("term").alias("t2"))
    return (
        a.join(b, "doc_id")
        .filter(F.col("t1") < F.col("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
        .orderBy(
            F.col("support").desc(), F.col("t1").asc(), F.col("t2").asc()
        )
        .limit(k)
    )


# Winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the MOSS
# fingerprint selector): token k-gram hashes, leftmost-minimum per
# sliding window. Frozen parameters, mirrored in the oracle SQL.
WINNOW_K = 3  # tokens per shingle
WINNOW_W = 4  # shingle hashes per selection window


def winnowing_fingerprints(
    docs: DataFrame, k: int = WINNOW_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, pos, fp) — winnowing document fingerprints: hash every
    k-token shingle of the lowercased whitespace token stream, slide a
    w-wide window over the shingle-hash sequence, and select the
    LEFTMOST minimal hash of each window (dropping duplicates — the same
    shingle selected by overlapping windows emits once). Guarantees of
    the scheme (the reason MOSS uses it over "every i-th hash"): at
    least one fingerprint per w consecutive shingles, and any shingle
    match of length ≥ w+k−1 tokens between two documents is caught by a
    shared fingerprint. `pos` is the 0-based shingle index, `fp` the
    60-bit portable shingle hash (hashing.h60 — the oracle recomputes it
    with DuckDB's md5).

    Distinct from `fingerprints` (whole-doc identity hash — exact dedup)
    and from `minhash` (set-similarity sketch): winnowing yields
    POSITIONED substring fingerprints, the unit of plagiarism-style
    local-overlap detection between documents.

    Plan shape: one narrow (doc_id, text) scan; shingling, hashing and
    window selection are per-row array expressions (transform /
    array_min / slice — JVM codegen, zero UDFs, zero shuffle). Docs
    shorter than k tokens emit nothing; docs with fewer than w shingles
    form a single truncated window (slice clamps identically in both
    engines)."""
    from ..hashing import h60_col

    toks = F.split(F.lower(F.trim(F.col("text"))), WS_SPLIT)
    base = (
        docs.filter(F.trim(F.col("text")) != "")
        .select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= int(k))
    )
    n_sh = F.size("toks") - int(k) + 1
    shingles = F.transform(
        F.sequence(F.lit(0), n_sh - 1),
        lambda i: F.concat_ws(" ", F.slice("toks", i + 1, int(k))),
    )
    hashes = F.transform(shingles, lambda g: h60_col(g))
    n_win = F.greatest(F.size(F.col("hs")) - int(w) + 1, F.lit(1))
    win = lambda p: F.slice("hs", p + 1, int(w))  # noqa: E731
    picks = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda p: F.struct(
            (
                p + F.array_position(win(p), F.array_min(win(p))) - 1
            ).alias("pos"),
            F.array_min(win(p)).alias("fp"),
        ),
    )
    return (
        base.select("doc_id", hashes.alias("hs"))
        .select("doc_id", F.explode(F.array_distinct(picks)).alias("z"))
        .select(
            "doc_id",
            F.col("z.pos").cast("long").alias("pos"),
            F.col("z.fp").cast("long").alias("fp"),
        )
    )


def mad_agg(docs: DataFrame) -> DataFrame:
    """ES `median_absolute_deviation` (exact tier) per language over
    token counts → (lang, median_n, mad): MAD = median(|n − median(n)|),
    the robust dispersion measure ES pairs with its median metric (ES
    computes both approximately via TDigest; the pinned spec here is the
    EXACT interpolated median, which the DuckDB quantile_cont mirror
    reproduces bit-for-bit).

    Plan: per-language exact percentile (language cardinality is tiny,
    so the sort-based percentile buffer is per-group bounded), broadcast
    the ≤|langs| medians back, second percentile over the absolute
    deviations. Two language-keyed aggregations, no corpus window; at
    10^12 docs swap both for approx_percentile and drop the oracle
    pairing (the same documented trade as length_quantiles)."""
    n_tok = (
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), WS_SPLIT)))
        .cast("long")
    )
    n = docs.select("lang", n_tok.alias("n"))
    med = n.groupBy("lang").agg(F.percentile("n", 0.5).alias("median_n"))
    return (
        n.join(F.broadcast(med), "lang")
        .select(
            "lang",
            "median_n",
            F.abs(F.col("n") - F.col("median_n")).alias("dev"),
        )
        .groupBy("lang", "median_n")
        .agg(F.round(F.percentile("dev", 0.5), 4).alias("mad"))
        .select("lang", F.round("median_n", 4).alias("median_n"), "mad")
    )
