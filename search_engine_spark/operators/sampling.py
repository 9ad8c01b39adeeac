"""Deterministic sampling operators for training-data curation.

A 100 TB corpus feeds training runs through stratified subsampling
(per-language / per-source mixing ratios). Spark's ``sampleBy`` draws from
per-partition RNG state — results change with partitioning, retries, and
cluster size. These operators instead decide membership as a PURE FUNCTION
of the row (portable h60 hash, hashing.py), so a sample is:

  * reproducible across runs, engines, and cluster sizes (the DuckDB
    oracle computes the identical membership bit);
  * stable under incremental growth — a doc's membership never flips when
    other docs arrive (the property curation pipelines need for
    append-only corpora);
  * cheap — one narrow projection + filter, no shuffle, pushdown-friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import h60_col

H60_SPACE = float(2 ** 60)


def sample_uniform(
    docs: DataFrame, fraction: float, seed_tag: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli(fraction) sample: keep a row iff
    h60(tag:doc_id) / 2^60 < fraction."""
    u = h60_col(
        F.concat(F.lit(seed_tag + ":"), F.col("doc_id").cast("string"))
    ) / F.lit(H60_SPACE)
    return docs.filter(u < F.lit(float(fraction)))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str = "lang",
    seed_tag: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample (the mixing-ratio
    operator): keep a row iff h60(tag:doc_id)/2^60 < fractions[stratum].
    Rows whose stratum has no configured fraction are dropped. Distinct
    ``seed_tag`` values give independent samples of the same corpus
    (train/validation splits: disjointness is NOT guaranteed by tag —
    use complementary hash ranges for that)."""
    frac_map = F.create_map(
        *[
            x
            for k in sorted(fractions)
            for x in (F.lit(k), F.lit(float(fractions[k])))
        ]
    )
    u = h60_col(
        F.concat(F.lit(seed_tag + ":"), F.col("doc_id").cast("string"))
    ) / F.lit(H60_SPACE)
    return (
        docs.withColumn("_frac", frac_map[F.col(strata_col)])
        .filter(F.col("_frac").isNotNull() & (u < F.col("_frac")))
        .drop("_frac")
    )


def split_train_holdout(
    docs: DataFrame, holdout_fraction: float = 0.1, seed_tag: str = "split"
) -> DataFrame:
    """(…, split) — disjoint deterministic train/holdout assignment by
    complementary hash ranges: u < holdout_fraction → 'holdout', else
    'train'. Every row lands in exactly one split, stable forever."""
    u = h60_col(
        F.concat(F.lit(seed_tag + ":"), F.col("doc_id").cast("string"))
    ) / F.lit(H60_SPACE)
    return docs.withColumn(
        "split",
        F.when(u < F.lit(float(holdout_fraction)), F.lit("holdout")).otherwise(
            F.lit("train")
        ),
    )


def temperature_sample(
    docs: DataFrame,
    temperature: float = 2.0,
    strata_col: str = "lang",
    seed_tag: str = "temp",
) -> DataFrame:
    """Language-balanced sampling with temperature (the mC4 / XLM-R
    recipe: sample languages ∝ share^(1/T) so low-resource strata are
    upweighted; T=1 keeps natural proportions, T→∞ → uniform).

    Per stratum l with natural share s_l = n_l/N:
        q_l ∝ s_l^(1/T)   (normalized),
        keep-prob p_l = min(1, q_l · N / n_l)
    so the expected output size is ≤ N with the temperature-adjusted mix
    (upsampling beyond 1 would need replication — clamped and documented;
    rare strata simply keep everything). Membership is the same pure
    h60 function as the other samplers — reproducible, append-stable,
    engine-portable. Plan shape: one tiny groupBy(strata) for the weight
    table, broadcast back onto the corpus, one narrow filter — the corpus
    stream shuffles nothing.
    """
    inv_t = 1.0 / float(temperature)
    counts = docs.groupBy(strata_col).agg(
        F.count(F.lit(1)).cast("double").alias("_n_l")
    )
    tot = counts.agg(F.sum("_n_l").alias("_n"))
    q = counts.crossJoin(F.broadcast(tot)).withColumn(
        "_q", F.pow(F.col("_n_l") / F.col("_n"), F.lit(inv_t))
    )
    z = q.agg(F.sum("_q").alias("_z"))
    p = (
        q.crossJoin(F.broadcast(z))
        .withColumn(
            "_p",
            F.least(
                F.lit(1.0),
                (F.col("_q") / F.col("_z")) * F.col("_n") / F.col("_n_l"),
            ),
        )
        .select(strata_col, "_p")
    )
    u = h60_col(
        F.concat(F.lit(seed_tag + ":"), F.col("doc_id").cast("string"))
    ) / F.lit(H60_SPACE)
    return (
        docs.join(F.broadcast(p), strata_col)
        .filter(u < F.col("_p"))
        .drop("_p")
    )


def weighted_sample(
    docs: DataFrame,
    n: int = 100,
    weight_col: str = "n_chars",
    seed_tag: str = "wsample",
) -> DataFrame:
    """(doc_id) — deterministic weighted sampling WITHOUT replacement
    (Efraimidis & Spirakis 2006, the A-ES scheme): each row draws the
    pinned uniform u = h60(tag:doc_id)/2^60 and keeps key = ln(u)/w;
    the n LARGEST keys are the sample. Inclusion probability is
    proportional-to-weight without replacement — the standard way to
    bias a training-mix subsample toward (here) longer documents while
    keeping the draw reproducible and append-stable.

    ln(u)/w is the monotone log form of the textbook u^(1/w): for large
    weights u^(1/w) clusters within ulps of 1.0 (order-unstable across
    engines); the log form keeps keys well separated. Plan: one
    projection + TakeOrderedAndProject(n) — no shuffle beyond the
    per-partition top-n merge."""
    u = h60_col(
        F.concat(F.lit(seed_tag + ":"), F.col("doc_id").cast("string"))
    ) / F.lit(H60_SPACE)
    key = F.log(u) / F.col(weight_col).cast("double")
    return (
        # zero/negative weight = zero inclusion probability — excluded up
        # front (ln(u)/0 would raise DIVIDE_BY_ZERO under Spark 4's
        # default ANSI mode; mirrored in the oracle's WHERE)
        docs.filter(F.col(weight_col).cast("double") > 0.0)
        .select("doc_id", key.alias("wkey"))
        .orderBy(F.col("wkey").desc(), F.col("doc_id").asc())
        .limit(n)
        .select("doc_id")
    )
