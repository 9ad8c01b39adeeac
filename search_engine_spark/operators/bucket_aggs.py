"""Bucket-aggregation surfaces — the remaining Elasticsearch aggregation
shapes the engine did not yet cover: `multi_terms` (compound-key terms),
`percentile_ranks` (inverse quantiles), dense `histogram`
(min_doc_count=0 zero-filled buckets), and the `sampler` /
`diversified_sampler` pair (aggregate over only the best-scoring docs).

The reference has a single aggregate surface (per-site statistics,
StatisticsServiceImpl.java); these generalize it the way an analytics UI
over a web index needs. All are single-pass DataFrame plans with map-side
combine; none collect more than scalar bounds driver-side.

Scale notes (100 TB): multi_terms groups on a (site, lang)-cardinality
key — thousands of groups, partial aggregation collapses each partition
to its local groups before the one shuffle. percentile_ranks is ONE
conditional-sum aggregate (no sort, unlike exact quantiles — ranks of
GIVEN values need only counts). The dense histogram joins a
sequence-generated bucket spine (driver-side scalar bounds → literal
range) against the sparse counts. The samplers bound the aggregated set
to `sample_size` rows by construction, so their group-by never sees the
full corpus — exactly why ES offers them."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..textproc.tokenize import WS_SPLIT

PR_VALUES = (10.0, 50.0, 100.0, 250.0)
SAMPLER_SIZE = 30
DIVERSIFIED_MAX_PER_SITE = 5


def _n_tok():
    return (
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.split(F.trim("text"), WS_SPLIT)))
        .cast("long")
    )


def multi_terms_agg(docs: DataFrame, size: int = 10) -> DataFrame:
    """ES `multi_terms` → (site_key, lang, doc_count, sum_chars): terms
    aggregation over the COMPOUND key (site, lang) — one bucket per
    observed combination, ordered by doc_count (ties: key order), top
    `size`. Differs from nested terms-in-terms: buckets are ranked by
    the combined count, not per-parent.

    Plan: one groupBy on the pair; compound-key cardinality is the
    product of two tiny vocabularies, so partial agg collapses all rows
    map-side and the shuffle carries only group headers."""
    return (
        docs.groupBy("site_key", "lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("doc_count"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
        .orderBy(
            F.col("doc_count").desc(),
            F.col("site_key").asc(),
            F.col("lang").asc(),
        )
        .limit(size)
    )


def percentile_ranks(
    docs: DataFrame, values: tuple[float, ...] = PR_VALUES
) -> DataFrame:
    """ES `percentile_ranks` → (value, rank_pct): for each GIVEN value v,
    the percentage of documents whose token count is ≤ v — the inverse
    of the quantile query (`length_quantiles`), answering "how much of
    the corpus would a ≤v-token filter keep?".

    Exact by counting, not by sorting: ranks of given values need one
    conditional sum per value, so the whole answer is a single aggregate
    row (no percentile buffer, no shuffle of values) unpivoted to one
    row per probe. That is also why this stays exact at 10^12 docs when
    exact quantiles cannot."""
    n = _n_tok()
    aggs = [F.count(F.lit(1)).cast("double").alias("_t")] + [
        F.sum(F.when(n <= v, 1).otherwise(0)).cast("double").alias(f"_c{i}")
        for i, v in enumerate(values)
    ]
    one = docs.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(float(v)).alias("value"),
                F.round(
                    F.when(
                        F.col("_t") > 0,
                        F.col(f"_c{i}") / F.col("_t") * 100.0,
                    ).otherwise(F.lit(0.0)),
                    4,
                ).alias("rank_pct"),
            )
            for i, v in enumerate(values)
        ]
    )
    return (
        one.select(F.explode(pairs).alias("z"))
        .select(F.col("z.value").alias("value"), F.col("z.rank_pct").alias("rank_pct"))
    )


def dl_histogram_dense(docs: DataFrame, width: int = 50) -> DataFrame:
    """ES `histogram` with min_doc_count=0 → (bucket_lo, n_docs): fixed-
    width token-count buckets INCLUDING empty ones between the observed
    min and max bucket — chart-ready output where a missing bar means
    zero, not "bucket absent" (the sparse variant is `dl_histogram`).

    Plan: sparse counts via one groupBy; the bucket spine comes from
    F.sequence over the single-row (min, max) aggregate — generated
    JVM-side, exploded, and left-joined against the counts (broadcast:
    the spine is bounded by value range / width, not by corpus size)."""
    n = _n_tok()
    b = docs.select(((n / width).cast("long") * width).alias("bucket_lo"))
    counts = b.groupBy("bucket_lo").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    spine = (
        b.agg(
            F.min("bucket_lo").alias("lo"), F.max("bucket_lo").alias("hi")
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.lit(int(width)).cast("long"))
            ).alias("bucket_lo")
        )
    )
    return (
        spine.join(counts, "bucket_lo", "left")
        .select(
            "bucket_lo",
            F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("n_docs"),
        )
        .orderBy("bucket_lo")
    )


def sampler_agg(
    hits: DataFrame,
    docs: DataFrame,
    sample_size: int = SAMPLER_SIZE,
    by: str = "lang",
) -> DataFrame:
    """ES `sampler` aggregation → (lang, doc_count): run the sub-
    aggregation over only the `sample_size` BEST-scoring documents of
    the query, not every match — the standard trick for "characterize
    the top of the result list" facets whose cost must not grow with
    hit count. Deterministic cut: (score desc, doc_id asc), the engine's
    pinned total order.

    Plan: TakeOrderedAndProject bounds the sample; the join back to the
    document attributes broadcasts the sample side; the final groupBy
    sees ≤ sample_size rows."""
    top = hits.orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    ).limit(sample_size)
    return (
        top.join(docs.select("doc_id", by), "doc_id")
        .groupBy(by)
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col(by).asc())
    )


def diversified_sampler_agg(
    hits: DataFrame,
    docs: DataFrame,
    sample_size: int = SAMPLER_SIZE,
    max_per_site: int = DIVERSIFIED_MAX_PER_SITE,
    by: str = "lang",
) -> DataFrame:
    """ES `diversified_sampler` → (lang, doc_count): like `sampler`, but
    the sample admits at most `max_per_site` documents per site before
    the size cut, so one dominant host cannot monopolize the facet (the
    de-duplication field is the reference's site, its one grouping
    dimension). Same pinned total order; the per-site cut is a
    row_number window PARTITIONED by site — bounded partitions, never a
    global window.

    The sampler/diversified pair is the aggregation-side mirror of
    result diversification (`search_collapsed` / `search_diversified`):
    there the OUTPUT is deduped, here the AGGREGATED EVIDENCE is."""
    ranked = hits.join(docs.select("doc_id", "site_key"), "doc_id")
    w = Window.partitionBy("site_key").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    sample = (
        ranked.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_per_site)
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(sample_size)
    )
    return (
        sample.join(docs.select("doc_id", by), "doc_id")
        .groupBy(by)
        .agg(F.count(F.lit(1)).cast("long").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col(by).asc())
    )


FILTERS_SPEC = (
    # (bucket_key, SQL-expressible predicate) — ES `filters` buckets are
    # NON-exclusive: a doc counts in every bucket it matches
    ("english", "lang = 'en'"),
    ("cjk", "lang = 'zh'"),
    ("short", "n_chars < 200"),
    ("longform", "n_chars >= 400"),
)


def filters_agg(docs: DataFrame) -> DataFrame:
    """ES `filters` aggregation → (bucket, doc_count, sum_chars): one
    NAMED bucket per predicate, non-exclusive membership (a 150-char
    English doc lands in both `english` and `short`).

    Plan: conditional sums — one corpus pass producing a single row of
    2·|filters| aggregates, unpivoted to bucket rows with stack(). The
    shuffle carries exactly one partial-agg row per task regardless of
    corpus size; an explode-based encoding would instead multiply the
    corpus by the bucket fan-out before aggregating."""
    aggs = []
    for key, pred in FILTERS_SPEC:
        cond = F.expr(pred)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"c_{key}")
        )
        aggs.append(
            F.sum(F.when(cond, F.col("n_chars")).otherwise(0))
            .cast("long")
            .alias(f"s_{key}")
        )
    one = docs.agg(*aggs)
    stack = ", ".join(
        f"'{key}', c_{key}, s_{key}" for key, _ in FILTERS_SPEC
    )
    return one.select(
        F.expr(
            f"stack({len(FILTERS_SPEC)}, {stack}) "
            "AS (bucket, doc_count, sum_chars)"
        )
    )


DATE_RANGES = (
    # (key, from_doc_id, to_doc_id) in warc_ts space — warc_ts ≡
    # 1704067200 + 60·doc_id by fixture; None = open end. Ranges OVERLAP
    # (ES date_range semantics: each range counts independently).
    ("early", None, 150),
    ("q1", 0, 250),
    ("mid", 100, 400),
    ("late", 350, None),
)
_EPOCH = 1704067200


def date_range_agg(docs: DataFrame) -> DataFrame:
    """ES `date_range` aggregation → (bucket, from_ts, to_ts, doc_count):
    half-open [from, to) buckets over the warc_ts capture timestamp, open
    ends allowed, ranges may overlap (each counts independently — the ES
    contract, which is why this is conditional sums and not a CASE-ladder
    groupBy).

    Plan: same single-pass conditional-sum + stack shape as filters_agg —
    bucket bounds are literals, the corpus is read once, the shuffle
    moves one partial row per task."""
    ts = F.col("warc_ts").cast("long")
    aggs = []
    for key, lo, hi in DATE_RANGES:
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ts >= _EPOCH + 60 * lo)
        if hi is not None:
            cond = cond & (ts < _EPOCH + 60 * hi)
        aggs.append(
            F.sum(F.when(cond, 1).otherwise(0)).cast("long").alias(f"c_{key}")
        )
    one = docs.agg(*aggs)
    def _ts_lit(bound):
        if bound is None:
            return "CAST(NULL AS BIGINT)"
        return f"CAST({_EPOCH + 60 * bound} AS BIGINT)"

    rows = ", ".join(
        f"'{key}', {_ts_lit(lo)}, {_ts_lit(hi)}, c_{key}"
        for key, lo, hi in DATE_RANGES
    )
    return one.select(
        F.expr(
            f"stack({len(DATE_RANGES)}, {rows}) "
            "AS (bucket, from_ts, to_ts, doc_count)"
        )
    )


def stats_bucket(
    docs: "DataFrame",
    postings: "DataFrame",
    terms: list[str],
    bucket_secs: int = 3600,
) -> "DataFrame":
    """ES SIBLING pipeline aggregation `stats_bucket` (family:
    avg/min/max/sum/stats_bucket) → ONE summary row over a sibling
    aggregation's bucket series: here the query's hourly date_histogram
    (facet_date_histogram). Where the PARENT pipeline aggs already
    shipped (derivative, moving_fn, cumulative_sum, …) emit one value
    per bucket, the sibling family collapses the whole series —
    "what did the per-hour hit counts look like overall".

    Output: (n_buckets, min_hits, max_hits, avg_hits, sum_hits) with
    avg rounded 4 dp. Non-empty buckets only (the histogram emits no
    empty rows — matching ES, where stats_bucket skips gaps unless the
    sibling uses min_doc_count=0).

    Plan: the audited datehist subtree + ONE more single-row aggregate
    — the coordinator-side fold ES runs, exact here because the bucket
    series is tiny by construction."""
    from .search import facet_date_histogram

    hist = facet_date_histogram(docs, postings, terms, bucket_secs)
    return hist.agg(
        F.count("*").alias("n_buckets"),
        F.min("n_hits").alias("min_hits"),
        F.max("n_hits").alias("max_hits"),
        F.round(F.avg(F.col("n_hits").cast("double")), 4).alias("avg_hits"),
        F.sum("n_hits").alias("sum_hits"),
    )


def boxplot_agg(docs: DataFrame) -> DataFrame:
    """ES `boxplot` aggregation over the whitespace token count →
    ONE row (min_v, q1, q2, q3, max_v, n): exact linear-interpolated
    quartiles (Spark `percentile`, NOT the approximate
    percentile_approx — ES computes its boxplot from TDigest, this
    engine upgrades it to exact, the same choice every exact-moment agg
    here makes). Quartiles round 4 dp; inputs are integers so the
    (n−1)·p interpolation arithmetic is bit-identical to DuckDB's
    quantile_cont. One combinable aggregate — no shuffle beyond the
    final single-group reduce."""
    n = _n_tok()
    return docs.select(n.alias("v")).agg(
        F.min("v").cast("long").alias("min_v"),
        F.round(F.expr("percentile(v, 0.25)"), 4).alias("q1"),
        F.round(F.expr("percentile(v, 0.5)"), 4).alias("q2"),
        F.round(F.expr("percentile(v, 0.75)"), 4).alias("q3"),
        F.max("v").cast("long").alias("max_v"),
        F.count("*").cast("long").alias("n"),
    )


def t_test_agg(docs: DataFrame, lang: str = "en") -> DataFrame:
    """ES `t_test` (heteroscedastic / Welch) between two filter
    populations — token counts of lang==`lang` docs vs all others →
    ONE row (t_value, n_a, n_b, mean_a, mean_b):

        t = (m_a − m_b) / sqrt(v_a/n_a + v_b/n_b),
        v = (Σx² − (Σx)²/n) / (n − 1)

    Exact: Σx and Σx² are INTEGER sums (token counts), so both engines
    compute the same doubles in the same operation order; t and means
    round 4 dp. Scale shape: one conditional aggregate pass — six
    map-side-combinable integer sums, zero shuffle beyond the final
    reduce (the same exact-integer-moment pattern as extended_stats)."""
    v = _n_tok()
    is_a = F.col("lang") == lang
    agg = docs.select(v.alias("v"), is_a.alias("a")).agg(
        F.sum(F.when(F.col("a"), 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(~F.col("a"), 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(F.col("a"), F.col("v")).otherwise(0)).cast("long").alias("s_a"),
        F.sum(F.when(~F.col("a"), F.col("v")).otherwise(0)).cast("long").alias("s_b"),
        F.sum(F.when(F.col("a"), F.col("v") * F.col("v")).otherwise(0))
        .cast("long").alias("q_a"),
        F.sum(F.when(~F.col("a"), F.col("v") * F.col("v")).otherwise(0))
        .cast("long").alias("q_b"),
    )
    m_a = F.col("s_a").cast("double") / F.col("n_a")
    m_b = F.col("s_b").cast("double") / F.col("n_b")
    v_a = (
        F.col("q_a").cast("double")
        - F.col("s_a").cast("double") * F.col("s_a") / F.col("n_a")
    ) / (F.col("n_a") - 1.0)
    v_b = (
        F.col("q_b").cast("double")
        - F.col("s_b").cast("double") * F.col("s_b") / F.col("n_b")
    ) / (F.col("n_b") - 1.0)
    t = (m_a - m_b) / F.sqrt(v_a / F.col("n_a") + v_b / F.col("n_b"))
    return agg.select(
        F.round(t, 4).alias("t_value"),
        "n_a",
        "n_b",
        F.round(m_a, 4).alias("mean_a"),
        F.round(m_b, 4).alias("mean_b"),
    )
