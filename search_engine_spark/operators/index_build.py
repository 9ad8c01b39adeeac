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

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text_columns import explode_terms
from ..sources.documents import site_key_col

POSTINGS_SCHEMA = "doc_id long, term string, tf long"


def _tokenize_count_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Vectorized Arrow tokenizer (T2-T6): one Arrow batch of documents →
    (doc_id, term, tf) rows. A document's tokens live entirely in its own
    row, so the per-doc term frequency is FINAL within the batch — no
    Spark-side shuffle is needed to form postings. The heavy lifting
    (C++ regex split, unique-token analysis, integer-key counting) lives
    in textproc/fast_tokenize.py."""
    from ..textproc.fast_tokenize import tokenize_tf

    for pdf in batches:
        if pdf.empty:
            continue
        tf = tokenize_tf(pdf)
        if not tf.empty:
            yield tf


def build_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) — logical postings (reference model/Index.java:
    one row per page×lemma, `rank` FLOAT = term frequency; tf kept exact as
    BIGINT, cast at the scoring edge).

    Default path = the north-star Arrow tokenizer: a vectorized pandas
    stage (mapInPandas) that tokenizes, filters, lemmatizes and counts per
    document inside each Arrow batch — postings need NO shuffle because a
    document never spans batches. Python workers are separate processes,
    so this stage scales linearly with cores (the JVM regex pipeline in
    build_postings_sql suffers allocation contention beyond ~8 threads in
    local mode and costs 3-10× more CPU per token — measured at sf0.1×32).
    Semantics are pinned identical to build_postings_sql by
    tests + the driver's DuckDB oracle."""
    return docs.select("doc_id", "text").mapInPandas(
        _tokenize_count_batches, schema=POSTINGS_SCHEMA
    )


def build_postings_sql(docs: DataFrame) -> DataFrame:
    """Column-expression variant of build_postings (array-level lambdas,
    whole-stage codegen). Kept as the pure-SQL cross-check path — equals
    the Arrow path bit-for-bit (oracle-verified)."""
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
    # avg() over zero rows is NULL — an empty corpus yields (0, 0.0) like
    # corpus_stats_from_packed, not a float(None) TypeError
    return int(row["n"]), float(row["avgdl"] or 0)


def build_postings_folded(docs: DataFrame) -> DataFrame:
    """postings over ASCII-FOLDED text — the ES `asciifolding` analyzer
    variant. The base analyzer's letter-word filter DROPS accented Latin
    words outright (café fails the [a-zA-Zа-яёА-ЯЁ] full-match); folding
    first (textproc/folding.py: lower → ß/æ/œ expansion → one translate,
    all codegen) lets them index as their ASCII base forms, exactly the
    cross-language recall fix Lucene's ASCIIFoldingFilter exists for.
    Everything downstream (tf, dictionary, scoring) is the unchanged
    build over the folded stream."""
    from ..textproc.folding import fold_col

    return build_postings(
        docs.withColumn("text", fold_col(F.lower(F.col("text"))))
    )
