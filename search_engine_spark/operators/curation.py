"""Web-corpus curation operators: snapshot reconciliation, line-level
dedup, PII redaction, domain-level quality rollups.

These are the operators a Common-Crawl-scale training-data pipeline runs
BEFORE indexing (BASELINE.json input_hint: pages arrive as (url, warc_ts,
html, text, lang) across many crawl snapshots):

- ``latest_revisions``  — pick the newest revision per logical page across
  crawl snapshots. One hash aggregation (``max_by`` over a payload struct),
  NOT a window: ``row_number() OVER (PARTITION BY url ORDER BY ts DESC)``
  shuffles *and sorts* every revision of every page, while ``max_by``
  partial-aggregates map-side, so each executor forwards one candidate row
  per (url-partition) — at 10^12 rows with ~5 revisions/page that is 5×
  less shuffle IO and no sort at all.
- ``doc_lines`` / ``remove_duplicated_lines`` — CCNet-style corpus-wide
  duplicated-line removal (Wenzek et al., "CCNet", 2020: hash every line,
  drop all but one occurrence corpus-wide). Everything stays JVM-side:
  line derivation is ``transform(sequence(...))`` over a split array (no
  explode until the hash join), first-occurrence-wins is a ``min(struct)``
  aggregation on the line hash, and document reassembly is
  ``array_sort + array_join`` — no Python UDF anywhere.
- ``redact_pii`` — vectorized regexp scrubbing of emails / IPv4s / intl
  phone numbers with per-class counts. Patterns are restricted to the
  RE2 ∩ java.util.regex common subset (character classes, bounded repeats,
  ``\\b`` — no lookaround, no backrefs) so the DuckDB oracle matches
  byte-for-byte.
- ``domain_stats`` — per-site curation rollup (doc counts, parseable rate,
  token mass, language spread, newest crawl) used for domain-level
  filtering decisions. One hash agg over derived columns; at scale this is
  a map-side-combine groupBy on ~10^7 domains — trivially parallel.

Reference parity: the reference engine has no curation stage (it indexes
whatever the crawl fetched); these extend SURVEY §2's inventory per the
task brief's training-data-pipeline requirement, same FIXTURES pattern as
sources/documents.py (deterministic derived columns, mirrored in
functions/oracle_pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hashing import h60_col
from ..textproc.tokenize import WS_SPLIT

# ------------------------------------------------ fixture-derived columns
# FIXTURES pattern (sources/documents.py): deterministic derivations give
# the sandbox corpus the columns the operator needs; the same arithmetic is
# mirrored in functions/oracle_pipeline.py so the DuckDB oracle sees
# identical values.

PAGE_KEY_MOD = 101  # logical pages; each re-crawled ~n_docs/101 times
PII_EMAIL_MOD, PII_IP_MOD, PII_PHONE_MOD = 11, 13, 17


def with_page_key(docs: DataFrame, mod: int = PAGE_KEY_MOD) -> DataFrame:
    """Treat the fixture as ``mod`` logical pages, each row a crawl
    revision of page ``doc_id % mod`` (warc_ts already increases with
    doc_id, so revisions have distinct timestamps)."""
    return docs.withColumn("page_key", F.col("doc_id") % mod)


def pii_augment(docs: DataFrame, text: str = "text") -> DataFrame:
    """Inject deterministic PII into sparse doc slices (the fixture corpus
    contains none): an email every 11th doc, an IPv4 every 13th, an
    international phone number every 17th."""
    d = F.col("doc_id")
    email = F.when(
        d % PII_EMAIL_MOD == 0,
        F.concat(F.lit(" contact user"), d.cast("string"), F.lit("@example.com")),
    ).otherwise(F.lit(""))
    ip = F.when(
        d % PII_IP_MOD == 0,
        F.concat(
            F.lit(" from 10."),
            (d % 250).cast("string"),
            F.lit(".0."),
            (d % 200).cast("string"),
        ),
    ).otherwise(F.lit(""))
    phone = F.when(
        d % PII_PHONE_MOD == 0,
        F.concat(F.lit(" call +7915"), F.lpad((d % 10000).cast("string"), 6, "0")),
    ).otherwise(F.lit(""))
    return docs.withColumn(text, F.concat(F.col(text), email, ip, phone))


# ------------------------------------------------------------------ latest


def latest_revisions(
    revs: DataFrame,
    key: str = "page_key",
    ts: str = "warc_ts",
    tiebreak: str = "doc_id",
    payload: tuple[str, ...] = ("doc_id", "warc_ts"),
) -> DataFrame:
    """Newest revision per logical page: (key, n_revisions, *payload).

    ``max_by(struct(payload), struct(ts, tiebreak))`` — struct ordering is
    lexicographic, so ties on ``ts`` resolve deterministically by
    ``tiebreak``. Single shuffle on ``key`` with map-side partial agg;
    no sort, no window.
    """
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload]),
        F.struct(F.col(ts), F.col(tiebreak)),
    ).alias("_w")
    out = revs.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_revisions"), winner
    )
    return out.select(
        key, "n_revisions", *[F.col(f"_w.{c}").alias(c) for c in payload]
    )


# -------------------------------------------------------------- line dedup

# The pinned tokenizer whitespace class (textproc/tokenize.py::WS_SPLIT,
# written as literal characters portable to Java/RE2/Python) — curation
# splits on exactly the same class as the indexer, so token counts and
# line boundaries agree with doc_stats/BM25 dl everywhere.
LINE_WS = WS_SPLIT


LINE_WIDTH = 4  # fixture chunk width (tokens per derived "line")


def doc_lines(docs: DataFrame, width: int = LINE_WIDTH, text: str = "text") -> DataFrame:
    """(doc_id, line_no, line): deterministic fixed-width token chunks.

    Real web text has newlines; the sandbox fixture is single-line, so
    "lines" are derived as ``width``-token chunks (FIXTURES pattern — the
    operator downstream is agnostic to where lines come from; swap this
    for ``posexplode(split(text, '\\n'))`` on real pages).

    The chunking is pure array math inside one projection —
    ``transform(sequence(0, n_lines-1), i -> array_join(slice(...)))`` —
    so no data moves until the consumer aggregates.
    """
    toks = F.split(F.trim(F.col(text)), LINE_WS)
    n_lines = F.ceil(F.size(toks) / F.lit(width)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - 1),
        lambda i: F.array_join(F.slice(toks, i * width + 1, width), " "),
    )
    return (
        docs.select("doc_id", F.posexplode(lines).alias("line_no", "line"))
        .where(F.col("line") != "")
    )


def remove_duplicated_lines(lines: DataFrame) -> DataFrame:
    """CCNet-style corpus-wide line dedup, first occurrence wins.

    Returns (doc_id, clean_text, n_kept, n_dropped). A line occurrence
    survives iff it is the globally-first occurrence of its hash, ordered
    by (doc_id, line_no) — deterministic and append-stable for existing
    docs. Two shuffles, both unavoidable for the semantics: one groupBy on
    the 60-bit line hash to elect winners (map-side combine makes the
    per-hash traffic one struct per upstream partition), one groupBy doc_id
    to reassemble. The rebuild sorts each doc's few surviving lines
    array-side (``array_sort`` on (line_no, line) structs), not via a
    global sort.
    """
    occ = lines.select(
        "doc_id", "line_no", "line", h60_col(F.col("line")).alias("lh")
    )
    winners = occ.groupBy("lh").agg(
        F.min(F.struct("doc_id", "line_no")).alias("w"),
        F.count(F.lit(1)).alias("n_occ"),
    )
    kept = occ.join(winners, "lh").withColumn(
        "is_winner",
        (F.col("doc_id") == F.col("w.doc_id"))
        & (F.col("line_no") == F.col("w.line_no")),
    )
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_winner"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.sum(F.col("is_winner").cast("long")).alias("n_kept"),
            F.sum((~F.col("is_winner")).cast("long")).alias("n_dropped"),
        )
        .select("doc_id", "clean_text", "n_kept", "n_dropped")
    )


# ---------------------------------------------------------------- PII scrub

# RE2 ∩ java.util.regex subset only (no lookaround / backrefs): identical
# semantics in Spark's regexp_replace/regexp_count and DuckDB's
# regexp_replace/len(regexp_extract_all).
PII_PATTERNS = {
    "email": "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ip": "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b",
    # E.164 allows up to 15 digits; a lower max with a trailing \b would
    # not merely truncate longer numbers — it would fail to match them at
    # all (every backtracked length still ends at a digit), leaving 13-15
    # digit numbers completely unredacted.
    "phone": "\\+[0-9]{7,15}\\b",
}
# Redaction order matters (an email contains no IP, but an IP-looking
# fragment could sit inside an email's domain): scrub emails first.
PII_ORDER = ("email", "ip", "phone")


def redact_pii(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ip, n_phone, redacted): count then replace each
    PII class with ``<CLASS>``. Narrow projection over the scan — pure
    codegen (regexp_count/regexp_replace), no shuffle, no UDF; at 100 TB
    this is a single map stage gated only by scan bandwidth.
    """
    col: Column = F.col(text)
    # Each class is counted on the text AFTER the previous classes were
    # redacted, so counts equal the number of <CLASS> placeholders actually
    # emitted (an IP inside an email's host must not double-count: the
    # email redaction consumes it first).
    red = col
    counts = []
    for k in PII_ORDER:
        counts.append(
            F.regexp_count(red, F.lit(PII_PATTERNS[k])).alias(f"n_{k}")
        )
        red = F.regexp_replace(red, PII_PATTERNS[k], f"<{k.upper()}>")
    return docs.select("doc_id", *counts, red.alias("redacted"))


# ------------------------------------------------------------ domain rollup


def domain_stats(docs: DataFrame) -> DataFrame:
    """Per-site curation rollup — the table a pipeline thresholds to drop
    low-quality domains wholesale (the cheapest possible filter: one
    broadcast-join of the verdict back onto the corpus).

    Input must carry the derived columns (site_key, http_code, warc_ts —
    sources/documents.py::load_documents). Output one row per site:
    n_docs, n_parseable, total_tokens, avg_doc_tokens (4 dp), n_langs,
    latest_crawl (epoch seconds).
    """
    n_toks = F.when(F.trim("text") == "", F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), LINE_WS))
    )
    parseable = (F.col("http_code") == 200) & (F.trim(F.col("text")) != "")
    return (
        docs.groupBy("site_key")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(parseable.cast("long")).alias("n_parseable"),
            F.sum(n_toks.cast("long")).alias("total_tokens"),
            F.round(F.avg(n_toks), 4).alias("avg_doc_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.max(F.unix_timestamp("warc_ts")).alias("latest_crawl"),
        )
    )


QUALITY_FLOOR = 0.5
FUNNEL_DROP_LANG = "zh"


def curation_funnel(
    docs: DataFrame,
    quality_floor: float = QUALITY_FLOOR,
    drop_lang: str = FUNNEL_DROP_LANG,
) -> DataFrame:
    """The whole 100 TB preprocessing funnel as ONE auditable plan →
    (stage, n_rows): fetch-status gate → corpus-wide line dedup (drop
    docs emptied by it) → exact dedup on the cleaned text → quality
    floor → language filter → temperature-balanced sample. Every web
    pipeline publishes exactly this table (how many documents each stage
    kept); here each stage composes the already-oracle-verified operators
    and the funnel itself is oracle-paired end to end.

    Plan: seven count aggregates unioned — each stage is the previous
    stage's survivors, recomputed declaratively (no caching, no driver
    collect of data rows), so Catalyst is free to share or re-derive
    scans per branch.
    """
    from ..sources.documents import parseable_documents
    from .sampling import temperature_sample
    from .textstats import quality_scores

    s1 = parseable_documents(docs)
    ld = remove_duplicated_lines(doc_lines(s1))
    s2 = ld.filter(F.col("n_kept") > 0).select("doc_id", "clean_text")
    fp = s2.select("doc_id", h60_col(F.col("clean_text")).alias("fp"))
    w = fp.groupBy("fp").agg(F.min("doc_id").alias("keep"))
    s3 = (
        fp.join(w, "fp")
        .filter(F.col("doc_id") == F.col("keep"))
        .select("doc_id")
    )
    q = quality_scores(s1).select("doc_id", "quality")
    s4 = (
        s3.join(q, "doc_id")
        .filter(F.col("quality") >= quality_floor)
        .select("doc_id")
    )
    s5 = docs.join(s4, "doc_id", "left_semi").filter(
        F.col("lang") != drop_lang
    )
    s6 = temperature_sample(s5)
    stages = [
        ("1_input", docs),
        ("2_parseable", s1),
        ("3_line_nonempty", s2),
        ("4_exact_unique", s3),
        ("5_quality", s4),
        ("6_lang", s5),
        ("7_sampled", s6),
    ]
    parts = [
        d.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("stage"), "n_rows"
        )
        for name, d in stages
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def curation_funnel_v2(
    docs: DataFrame,
    jaccard_threshold: float = 0.5,
    sample_n: int = 100,
) -> DataFrame:
    """The round's NEW curation primitives composed into a second
    auditable funnel → (stage, n_rows): fetch-status gate → near-dup
    CLUSTER canonicalization (keep each cluster's elected representative,
    dedup.cluster_representatives) → frozen-LR quality model gate
    (textstats.quality_model_scores) → weighted sample without
    replacement (sampling.weighted_sample). Same design as
    curation_funnel: every stage is an already-oracle-verified operator,
    the funnel recomputes survivors declaratively (count aggregates
    unioned, no caching, no driver data collect), and the composition
    itself is oracle-paired end to end."""
    from ..sources.documents import parseable_documents
    from .dedup import cluster_representatives, dedup_clusters
    from .sampling import weighted_sample
    from .textstats import quality_model_scores

    s2 = parseable_documents(docs)
    clus = dedup_clusters(s2, jaccard_threshold)
    reps = cluster_representatives(s2, jaccard_threshold, clusters=clus)
    losers = (
        clus.join(reps, "cluster_id")
        .filter(F.col("doc_id") != F.col("rep_doc"))
        .select("doc_id")
    )
    s3 = s2.join(losers, "doc_id", "left_anti")
    keep = quality_model_scores(s3).filter(F.col("keep")).select("doc_id")
    s4 = s3.join(keep, "doc_id", "left_semi")
    s5 = weighted_sample(s4, n=sample_n)
    stages = [
        ("1_input", docs),
        ("2_parseable", s2),
        ("3_canonical", s3),
        ("4_model_quality", s4),
        ("5_sampled", s5),
    ]
    parts = [
        d.agg(F.count(F.lit(1)).alias("n_rows")).select(
            F.lit(name).alias("stage"), "n_rows"
        )
        for name, d in stages
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------- DSIR

DSIR_BUCKETS = 10_000


def dsir_features(positional: DataFrame, n_buckets: int = DSIR_BUCKETS) -> DataFrame:
    """Hashed-ngram feature counts → (doc_id, bucket, cnt): unigrams and
    adjacent bigrams of the retained-token stream, hashed into
    ``n_buckets`` with the portable h60 (DSIR's bag-of-hashed-ngrams
    feature space; Xie et al., "Data Selection for Language Models via
    Importance Resampling", NeurIPS 2023).

    Plan: bigrams come from ``lead(term)`` over (doc_id, pos) — one
    shuffle partitioned by doc_id (per-document windows, never global) —
    and the union aggregates map-side into per-(doc, bucket) counts."""
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    uni = positional.select("doc_id", F.col("term").alias("gram"))
    bi = (
        positional.withColumn("nxt", F.lead("term").over(w))
        .filter(F.col("nxt").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", F.col("term"), F.col("nxt")).alias("gram"),
        )
    )
    return (
        uni.unionByName(bi)
        .select("doc_id", F.pmod(h60_col(F.col("gram")), F.lit(int(n_buckets))).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").cast("double").alias("cnt"))
    )


def dsir_weights(
    docs: DataFrame,
    target_pred: Column | None = None,
    n_buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """DSIR importance log-weights → (doc_id, logw): score every document
    by how much more likely its hashed-ngram bag is under the TARGET
    distribution than under the RAW corpus distribution,

        logw(d) = Σ_b n_d(b) · ( ln p̂(b) − ln q̂(b) )

    with Laplace-smoothed bucket unigram models p̂ (target) and q̂ (raw):
    p̂(b) = (c_tgt(b)+1)/(C_tgt+B). ``target_pred`` selects the in-domain
    exemplar docs (default: ``lang = 'en'`` — "select web text that looks
    like my curated corpus"); feeding logw into ``weighted_sample`` (A-ES
    Gumbel top-k) completes the paper's importance-resampling recipe.
    The reference has no curation stage; this extends SURVEY §2 per the
    training-data-pipeline brief.

    Plan at scale: features are per-doc facts (one doc_id-partitioned
    window + map-side-combined groupBy); the bucket model is a ≤B-row
    aggregate crossJoined back as a broadcast lookup, so the corpus is
    scanned, never self-joined. Docs with no retained tokens get logw=0
    (no evidence). For repeated selection runs, persist dsir_features —
    the plan reuses it on both the model and scoring sides."""
    from .positional import build_positional

    if target_pred is None:
        target_pred = F.col("lang") == "en"
    feats = dsir_features(build_positional(docs), n_buckets=n_buckets)
    # doc_id-keyed equi-join of two corpus-sized sides — never broadcast;
    # AQE picks sort-merge/shuffled-hash (the 2-column flag side is tiny
    # per row, and both sides partition on the same key)
    flagged = feats.join(
        docs.select("doc_id", target_pred.alias("is_tgt")), "doc_id"
    )
    bstats = flagged.groupBy("bucket").agg(
        F.sum("cnt").alias("raw_c"),
        F.sum(F.when(F.col("is_tgt"), F.col("cnt")).otherwise(0.0)).alias("tgt_c"),
    )
    tots = bstats.agg(
        F.sum("raw_c").alias("cr"), F.sum("tgt_c").alias("ct")
    )
    bb = float(n_buckets)
    ratio = bstats.crossJoin(F.broadcast(tots)).select(
        "bucket",
        (
            F.log((F.col("tgt_c") + 1.0) / (F.col("ct") + bb))
            - F.log((F.col("raw_c") + 1.0) / (F.col("cr") + bb))
        ).alias("lr"),
    )
    per_doc = (
        feats.join(F.broadcast(ratio), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("lr")).alias("logw_raw"))
    )
    return docs.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.round(F.coalesce(F.col("logw_raw"), F.lit(0.0)), 4).alias("logw"),
    )


# ------------------------------------------------------------------ C4

C4_MIN_WORDS = 5       # a kept line needs >= this many words
C4_MIN_KEPT_LINES = 3  # a kept doc needs >= this many surviving lines
C4_LINE_WIDTH = 8      # fixture "lines" for C4 (>= MIN_WORDS, unlike dedup's 4)
C4_PUNCT_MOD = 3       # fixture punctuation: '.' after every 3rd token
C4_LOREM_MOD, C4_BRACE_MOD = 97, 89  # fixture injection periods


def c4_augment(docs: DataFrame, text: str = "text") -> DataFrame:
    """FIXTURES pattern (same as pii_augment): the sandbox corpus carries
    no punctuation and no boilerplate, so deterministically (a) append
    '.' to every C4_PUNCT_MOD-th token — giving the terminal-punctuation
    rule both positives and negatives — and (b) inject the page-level
    poison markers, ' lorem ipsum' every C4_LOREM_MOD-th doc and ' {'
    every C4_BRACE_MOD-th, so the page-drop rules have positives at
    every scale. Pure array math in one projection (split → indexed
    transform → rejoin), whitespace-normalizing like the oracle."""
    d = F.col("doc_id")
    toks = F.split(F.trim(F.col(text)), LINE_WS)
    punct = F.array_join(
        F.transform(
            toks,
            lambda t, i: F.when(
                (i + 1) % C4_PUNCT_MOD == 0, F.concat(t, F.lit("."))
            ).otherwise(t),
        ),
        " ",
    )
    return docs.withColumn(
        text,
        F.concat(
            punct,
            F.when(d % C4_LOREM_MOD == 0, F.lit(" lorem ipsum")).otherwise(
                F.lit("")
            ),
            F.when(d % C4_BRACE_MOD == 0, F.lit(" {")).otherwise(F.lit("")),
        ),
    )


def c4_clean(
    docs: DataFrame,
    width: int = C4_LINE_WIDTH,
    min_words: int = C4_MIN_WORDS,
    min_kept: int = C4_MIN_KEPT_LINES,
) -> DataFrame:
    """C4 cleaning (Raffel et al., "Exploring the Limits of Transfer
    Learning...", 2020 §2.2) → (doc_id, n_lines, n_kept, keep_doc,
    clean_text):

      * keep a line iff it ends in terminal punctuation (. ! ? ") AND
        has ≥ ``min_words`` words;
      * drop the whole page if it contains 'lorem ipsum' (case-folded)
        or a curly brace, or fewer than ``min_kept`` lines survive;
      * clean_text = surviving lines rejoined in order.

    Lines come from ``doc_lines`` (the fixture's deterministic
    width-token chunks standing in for real newline splits — the rules
    are agnostic to the split source). Everything is JVM-side: one
    projection to derive lines, one map-side-combinable groupBy per doc
    (collect_list is bounded by the doc's own line count — per-doc
    facts, never corpus-wide state), one doc_id-keyed join back for the
    page-level markers."""
    lines = doc_lines(docs, width=width)
    kept = (
        F.col("line").rlike('[.!?"]$')
        & (F.size(F.split(F.col("line"), " ")) >= int(min_words))
    )
    agg = (
        lines.withColumn("kept", kept)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(F.col("kept").cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("kept"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
        )
    )
    flags = docs.select(
        "doc_id",
        (
            F.contains(F.lower(F.col("text")), F.lit("lorem ipsum"))
            | F.contains(F.col("text"), F.lit("{"))
        ).alias("poisoned"),
    )
    return (
        flags.join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            (
                (F.coalesce(F.col("n_kept"), F.lit(0)) >= int(min_kept))
                & ~F.col("poisoned")
            ).alias("keep_doc"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


# ------------------------------------------------------------ snapshot delta

DELTA_CUTOFF_EPOCH = 1704067200 + 60 * 250  # fixture: revisions split ~50/50


def snapshot_delta(
    docs: DataFrame, cutoff_epoch: int = DELTA_CUTOFF_EPOCH
) -> DataFrame:
    """Crawl-snapshot diff → (page_key, status, old_doc, new_doc): compare
    each logical page's newest LIVE revision at the ``cutoff_epoch`` crawl
    cut against its newest live revision overall, and classify —

      added      no live revision at the cut, live now
      removed    live at the cut, newest revision now dead (non-parseable
                 fetch: the crawler revisited and got an error page)
      changed    live in both, content fingerprint differs
      unchanged  live in both, fingerprint equal

    This is the snapshot-delta report that drives incremental reindexing
    (only `added`+`changed` pages re-enter the build; `removed` become
    tombstones) — the batch analogue of the reference's one-page upsert
    decision (PageAnalyzer.java:301-360 diffs stored vs fresh state).

    Plan: ONE scan → two max_by aggregations per page_key (newest-live
    at cut, newest revision overall) in a single groupBy — max_by
    partial-aggregates map-side exactly like latest_revisions, so the
    shuffle carries two candidate structs per page per partition; the
    classification is a pure projection. Pages dead in BOTH snapshots
    drop out (never indexed, nothing to report)."""
    from ..sources.documents import http_code_col

    live = (http_code_col() == 200) & (F.trim(F.col("text")) != "")
    rev = with_page_key(docs).select(
        "page_key",
        F.col("doc_id"),
        F.col("warc_ts").cast("timestamp").alias("ts"),
        live.alias("is_live"),
        F.md5(F.col("text")).alias("fp"),
    ).withColumn("epoch", F.unix_micros(F.col("ts")) / F.lit(1_000_000))
    old_key = F.when(
        F.col("is_live") & (F.col("epoch") <= F.lit(int(cutoff_epoch))),
        F.struct(F.col("epoch"), F.col("doc_id")),
    )
    new_any = F.max_by(
        F.struct(
            F.col("doc_id"), F.col("is_live"), F.col("fp")
        ),
        F.struct(F.col("epoch"), F.col("doc_id")),
    )
    agg = rev.groupBy("page_key").agg(
        F.max_by(
            F.struct(F.col("doc_id"), F.col("fp")), old_key
        ).alias("old"),
        new_any.alias("new"),
    )
    old_live = F.col("old").isNotNull()
    new_live = F.col("new.is_live")
    status = (
        F.when(~old_live & new_live, F.lit("added"))
        .when(old_live & ~new_live, F.lit("removed"))
        .when(
            old_live & new_live & (F.col("old.fp") != F.col("new.fp")),
            F.lit("changed"),
        )
        .when(old_live & new_live, F.lit("unchanged"))
    )
    return (
        agg.select(
            "page_key",
            status.alias("status"),
            F.col("old.doc_id").alias("old_doc"),
            F.when(new_live, F.col("new.doc_id")).alias("new_doc"),
        )
        .filter(F.col("status").isNotNull())
    )


# ------------------------------------------------- Gopher quality rules

# Gopher / MassiveText document-quality thresholds (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Appendix A.1.1) — frozen, mirrored
# in oracle_pipeline.gopher_rules_sql. The repetition rules of the same
# appendix (duplicate n-gram fractions) live in repetition_stats.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MWL_LO = 3.0
GOPHER_MWL_HI = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1    # '#' or ellipsis per word
GOPHER_MAX_BULLET_RATIO = 0.9    # lines starting with a bullet
GOPHER_MAX_ELLIPSIS_RATIO = 0.3  # lines ending with an ellipsis
GOPHER_MIN_ALPHA_RATIO = 0.8     # words containing an alphabetic char
GOPHER_STOPS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_STOPS = 2
_ALPHA_CLASS = "[A-Za-zА-Яа-яЁё]"


def gopher_rules(docs: DataFrame, width: int = LINE_WIDTH) -> DataFrame:
    """Gopher quality filter → (doc_id, n_words, mean_word_len,
    symbol_ratio, bullet_ratio, ellipsis_ratio, alpha_ratio, n_stop,
    keep_doc): the MassiveText document-level rules, every signal
    surfaced so downstream mixes can re-threshold without re-scanning.

      * 50 ≤ word count ≤ 100 000
      * 3 ≤ mean word length ≤ 10
      * symbol-to-word ratio ('#' / '...' / '…') ≤ 0.1
      * ≤ 90% of lines start with a bullet (-, *, •)
      * ≤ 30% of lines end with an ellipsis
      * ≥ 80% of words contain an alphabetic character
      * ≥ 2 of the 8 frozen English stop words present

    Rule comparisons run on the RAW doubles (identical expressions both
    engines); the emitted ratio columns are rounded 4 dp at the edge.
    Lines come from ``doc_lines`` (the fixture's deterministic chunks
    standing in for newline splits, as in c4_clean).

    Plan: one narrow (doc_id, text) scan computes every word-level
    signal as pure column arithmetic (split → size/filter/intersect —
    no explode, no shuffle); only the two line-level ratios take the
    doc_lines explode + one map-side-combinable groupBy(doc_id), joined
    back on doc_id. At 100 TB: 2-column scan, one bounded shuffle."""
    t = F.trim(F.col("text"))
    toks = F.split(t, LINE_WS)
    n_words = F.when(t == "", F.lit(0)).otherwise(F.size(toks)).cast("bigint")
    non_ws = F.length(F.regexp_replace(t, LINE_WS, ""))
    nwd = n_words.cast("double")
    mwl = F.when(n_words == 0, F.lit(0.0)).otherwise(non_ws / nwd)
    symbols = (
        F.regexp_count(t, F.lit("#"))
        + F.regexp_count(t, F.lit(r"\.\.\."))
        + F.regexp_count(t, F.lit("…"))
    ).cast("double")
    sym_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(symbols / nwd)
    alpha_words = F.size(
        F.filter(toks, lambda x: x.rlike(_ALPHA_CLASS))
    ).cast("double")
    alpha_ratio = F.when(n_words == 0, F.lit(0.0)).otherwise(alpha_words / nwd)
    lower_toks = F.split(F.lower(t), LINE_WS)
    n_stop = sum(
        F.array_contains(lower_toks, w).cast("int") for w in GOPHER_STOPS
    ).cast("int")
    word_side = docs.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("_mwl"),
        sym_ratio.alias("_sym"),
        alpha_ratio.alias("_alpha"),
        n_stop.alias("n_stop"),
    )
    lines = doc_lines(docs, width=width)
    line_side = (
        lines.groupBy("doc_id")
        .agg(
            F.count("*").cast("double").alias("_nl"),
            F.sum(F.col("line").rlike("^[-*•] ").cast("long"))
            .cast("double")
            .alias("_bullets"),
            F.sum(F.col("line").rlike(r"(\.\.\.|…)$").cast("long"))
            .cast("double")
            .alias("_ellipses"),
        )
    )
    j = word_side.join(line_side, "doc_id", "left")
    bullet_ratio = F.coalesce(F.col("_bullets") / F.col("_nl"), F.lit(0.0))
    ellipsis_ratio = F.coalesce(F.col("_ellipses") / F.col("_nl"), F.lit(0.0))
    keep = (
        (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS)
        & (F.col("_mwl") >= GOPHER_MWL_LO)
        & (F.col("_mwl") <= GOPHER_MWL_HI)
        & (F.col("_sym") <= GOPHER_MAX_SYMBOL_RATIO)
        & (bullet_ratio <= GOPHER_MAX_BULLET_RATIO)
        & (ellipsis_ratio <= GOPHER_MAX_ELLIPSIS_RATIO)
        & (F.col("_alpha") >= GOPHER_MIN_ALPHA_RATIO)
        & (F.col("n_stop") >= GOPHER_MIN_STOPS)
    )
    return j.select(
        "doc_id",
        "n_words",
        F.round("_mwl", 4).alias("mean_word_len"),
        F.round("_sym", 4).alias("symbol_ratio"),
        F.round(bullet_ratio, 4).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 4).alias("ellipsis_ratio"),
        F.round("_alpha", 4).alias("alpha_ratio"),
        "n_stop",
        keep.alias("keep_doc"),
    )


# Mojibake marker class: the classic UTF-8-decoded-as-Latin-1 artifact
# characters (Ã/Â lead bytes, â€-cluster punctuation ghosts €/™/œ) plus
# U+FFFD replacement — none are legitimate letters in the engine's en/ru
# corpus languages, so occurrence counts are a pure corruption signal
# (the ftfy/"fix text for you" detection heuristic, reduced to a frozen
# char class portable across Java/RE2/DuckDB regex engines).
MOJIBAKE_CLASS = "[ÂÃ€™œ�]"


def mojibake_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_chars, n_marks, marks_per_kchar, clean) — encoding-
    corruption signal per page: how many mojibake marker characters the
    text carries, normalized per 1,000 chars (4 dp). A curation
    pipeline drops or re-decodes flagged pages before training export
    (every Common-Crawl-derived corpus pays this tax — WET files mix
    mis-declared charsets).

    Plan: one narrow codegen projection (two length() calls over a
    regexp_replace) — no shuffle at all; char-based length semantics
    agree across Spark and DuckDB."""
    t = F.coalesce(F.col("text"), F.lit(""))
    n_chars = F.length(t)
    n_marks = n_chars - F.length(
        F.regexp_replace(t, MOJIBAKE_CLASS, "")
    )
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_marks.cast("long").alias("n_marks"),
        F.when(n_chars == 0, F.lit(0.0))
        .otherwise(
            F.round(
                n_marks.cast("double") * 1000.0
                / n_chars.cast("double"),
                4,
            )
        )
        .alias("marks_per_kchar"),
        (n_marks == 0).alias("clean"),
    )


def _site_line_occ(docs: DataFrame) -> DataFrame:
    """(doc_id, site_key, line_no, line, lh) — one definition of the
    site-keyed line-occurrence stream, shared by detection and removal
    (the SQL mirrors share it as the `_lines_with_site_cte` CTE)."""
    return (
        doc_lines(docs)
        .join(docs.select("doc_id", "site_key"), "doc_id")
        .select(
            "doc_id",
            "site_key",
            "line_no",
            "line",
            h60_col(F.col("line")).alias("lh"),
        )
    )


def boilerplate_lines(
    docs: DataFrame, min_pages: int = 2, min_frac: float = 0.5
) -> DataFrame:
    """(site_key, lh, line, n_pages, frac) — per-SITE boilerplate
    detector: lines appearing on ≥ min_pages pages and ≥ min_frac of
    the site's pages (nav bars, footers, cookie banners — the
    shallow-text-feature boilerplate rule of Kohlschütter et al.
    WSDM'10, keyed by site the way production extractors apply it).
    Differs from CCNet line dedup (corpus-global, first-occurrence-
    wins) in both scope and question: this measures WITHIN-site
    repetition rate, the signal that separates template chrome from
    content that merely repeats somewhere.

    Plan: distinct (site, lh, doc) — the one corpus-scale shuffle —
    then a (site, lh)-keyed count against broadcastable per-site page
    totals; output is bounded by the distinct line vocabulary. frac
    rounds 4 dp from exact integer counts."""
    occ = _site_line_occ(docs)
    per_line = (
        occ.groupBy("site_key", "lh")
        .agg(
            F.count_distinct("doc_id").alias("n_pages"),
            F.min("line").alias("line"),
        )
        .filter(F.col("n_pages") >= int(min_pages))
    )
    site_pages = docs.groupBy("site_key").agg(
        F.count_distinct("doc_id").alias("_site_n")
    )
    frac = F.round(
        F.col("n_pages").cast("double") / F.col("_site_n").cast("double"),
        4,
    )
    return (
        per_line.join(F.broadcast(site_pages), "site_key")
        .filter(
            F.col("n_pages").cast("double")
            >= F.lit(float(min_frac)) * F.col("_site_n").cast("double")
        )
        .select("site_key", "lh", "line", "n_pages", frac.alias("frac"))
    )


def remove_boilerplate(
    docs: DataFrame, min_pages: int = 2, min_frac: float = 0.5
) -> DataFrame:
    """(doc_id, clean_text, n_kept, n_dropped) — pages with their
    site's boilerplate lines removed: a line occurrence survives iff
    (site, line-hash) is NOT in the boilerplate table. Same reassembly
    shape as remove_duplicated_lines (array_sort of surviving (line_no,
    line) structs, no global sort); the boilerplate side joins on
    (site_key, lh) after its own aggregation has collapsed it to the
    line vocabulary.

    Scale shape (r05 self-review): detect-then-remove is inherently
    two passes over the line stream (the detection aggregate must
    finish before removal can filter), but the boilerplate side
    collapses to the line VOCABULARY before the join — broadcast it,
    so the corpus-scale occurrence stream never shuffles for the
    removal join. Both passes share ONE occ definition
    (`_site_line_occ`), mirroring the SQL's shared CTE."""
    bp = boilerplate_lines(docs, min_pages, min_frac).select(
        "site_key", "lh", F.lit(True).alias("_bp")
    )
    occ = _site_line_occ(docs)
    kept = occ.join(
        F.broadcast(bp), ["site_key", "lh"], "left"
    ).withColumn("is_kept", F.col("_bp").isNull())
    return (
        kept.groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("is_kept"),
                                F.struct("line_no", "line"),
                            )
                        )
                    ),
                    lambda s: s["line"],
                ),
                "\n",
            ).alias("clean_text"),
            F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
            F.sum((~F.col("is_kept")).cast("long")).alias("n_dropped"),
        )
        .select("doc_id", "clean_text", "n_kept", "n_dropped")
    )
