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
