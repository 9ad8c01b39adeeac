"""Inverted-index build — reference §2.C reimagined as Spark aggregations.

The reference maintains four mutable MySQL tables row-at-a-time under locks
(dto/indexing/PageAnalyzer.java:301-396). Here the whole index is a pure
function of the documents table, computed with two shuffles:

  documents --explode_terms--> (doc_id, term)          [stage 1, codegen]
            --groupBy(doc_id, term).count()--> postings (doc_id, term, tf)
            --groupBy(term)--> term_dict (term, df, cf)

At 100 TB scale:
  * postings groupBy shuffles on (doc_id, term) — doc_id dominates the key
    space so there is no skew; AQE coalesces.
  * term_dict re-aggregates FROM postings (not from raw terms) — the second
    shuffle moves one row per (doc, term) pair, not one per occurrence.
  * head-term skew (a term in 80% of docs) only matters for the compressed
    block build, which salts (operators/blocks.py); these relational aggs
    are skew-free because doc_id is in the grouping key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_columns import explode_terms
from ..sources.documents import site_key_col


def build_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — logical postings (reference model/Index.java:
    one row per page×lemma, `rank` FLOAT = term frequency; we keep tf exact
    as BIGINT and cast at the scoring edge)."""
    terms = explode_terms(docs)
    return terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))


def build_term_dict(postings: DataFrame) -> DataFrame:
    """(term, df, cf) — global dictionary (reference model/Lemma.java
    `frequency` = document frequency)."""
    return postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("tf").alias("cf")
    )


def build_term_dict_site(docs: DataFrame) -> DataFrame:
    """(site_key, term, df, cf) — per-site dictionary, mirroring the
    reference's site-scoped lemma rows (model/Lemma.java:20-24)."""
    terms = explode_terms(docs.withColumn("site_key", site_key_col()),
                          keep=["doc_id", "site_key"])
    return terms.groupBy("site_key", "term").agg(
        F.count_distinct("doc_id").alias("df"), F.count("*").alias("cf")
    )


def build_doc_stats(docs: DataFrame, postings: DataFrame | None = None) -> DataFrame:
    """(doc_id, dl) for EVERY document (dl = retained term occurrences;
    0 for empty docs). Used by BM25 length normalization."""
    if postings is None:
        postings = build_postings(docs)
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    return (
        docs.select("doc_id")
        .join(dl, "doc_id", "left")
        .select("doc_id", F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl"))
    )


def corpus_stats(docs: DataFrame, doc_stats: DataFrame) -> tuple[int, float]:
    """(N, avgdl) — tiny driver-side scalars, computed once per build and
    broadcast into the scorer."""
    row = doc_stats.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    return int(row["n"]), float(row["avgdl"])
