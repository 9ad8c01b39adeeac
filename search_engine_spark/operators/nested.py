"""Nested-documents query semantics — Elasticsearch's `nested` type.

ES's flattened default loses object boundaries: a doc with sections
["fast car", "data table"] matches the conjunctive query "fast data" even
though NO single section contains both words. The `nested` mapping
indexes each object as its own hidden sub-document and a `nested` query
requires the whole bool clause to match INSIDE ONE object, then folds the
matching children's scores into the parent (score_mode avg/max/sum).

Here the nested objects are the document's non-overlapping token chunks
(operators/export.py::chunk_documents with overlap=0 — each term
occurrence belongs to exactly one section), analyzed with the SAME
tokenizer chain as the main index. A parent matches when at least one
chunk contains every query term; chunk score = Σtf of the query terms in
that chunk; parent score = score_mode over its matching chunks (ES
default: avg).

Scale shape: chunking is a zero-shuffle codegen projection; the analyzer
explode keeps (doc_id, chunk_id); one combinable groupBy per level
(chunk, then parent). No joins, no windows — the nested semantics cost
exactly one extra aggregation level over the flat query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.functions.text_columns import explode_terms
from search_engine_spark.operators.export import chunk_documents

NESTED_CHUNK_SIZE = 32


def nested_match(
    docs: DataFrame,
    terms: list[str],
    chunk_size: int = NESTED_CHUNK_SIZE,
    score_mode: str = "avg",
    limit: int = 20,
) -> DataFrame:
    """ES `nested` conjunctive query → (doc_id, n_chunks, score): docs
    where ≥1 chunk contains ALL query terms; score = score_mode over the
    matching chunks' Σtf, rounded 4 dp; order score desc, doc_id asc."""
    q = sorted(set(terms))
    empty = docs.select(
        F.col("doc_id"),
        F.lit(0).cast("bigint").alias("n_chunks"),
        F.lit(0.0).alias("score"),
    ).limit(0)
    if not q:
        return empty
    chunks = chunk_documents(docs, chunk_size=chunk_size, overlap=0)
    term_rows = explode_terms(
        chunks.select(
            "doc_id", "chunk_id", F.col("chunk_text").alias("text")
        ),
        keep=["doc_id", "chunk_id"],
    )
    per_chunk = (
        term_rows.filter(F.col("term").isin(q))
        .groupBy("doc_id", "chunk_id")
        .agg(
            F.count_distinct("term").alias("nt"),
            F.count("*").alias("chunk_score"),
        )
        .filter(F.col("nt") == len(q))
    )
    agg = {
        "avg": F.avg(F.col("chunk_score").cast("double")),
        "max": F.max(F.col("chunk_score").cast("double")),
        "sum": F.sum(F.col("chunk_score").cast("double")),
    }[score_mode]
    return (
        per_chunk.groupBy("doc_id")
        .agg(F.count("*").alias("n_chunks"), agg.alias("score_raw"))
        .select(
            "doc_id",
            "n_chunks",
            F.round(F.col("score_raw"), 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(limit))
    )


def flat_vs_nested(
    docs: DataFrame, terms: list[str], chunk_size: int = NESTED_CHUNK_SIZE
) -> DataFrame:
    """The diagnostic ES documents teach with → (doc_id, flat_match,
    nested_match): docs whose chunked token stream contains all query
    terms SOMEWHERE (flattened bool) vs INSIDE one chunk (nested). Rows
    where flat_match and not nested_match are exactly the cross-object
    false positives the nested type exists to kill. Only flat-matching
    docs are returned (the interesting population)."""
    q = sorted(set(terms))
    chunks = chunk_documents(docs, chunk_size=chunk_size, overlap=0)
    term_rows = explode_terms(
        chunks.select(
            "doc_id", "chunk_id", F.col("chunk_text").alias("text")
        ),
        keep=["doc_id", "chunk_id"],
    ).filter(F.col("term").isin(q))
    per_chunk = term_rows.groupBy("doc_id", "chunk_id").agg(
        F.count_distinct("term").alias("nt")
    )
    per_doc = (
        term_rows.groupBy("doc_id")
        .agg(F.count_distinct("term").alias("nt_doc"))
        .filter(F.col("nt_doc") == len(q))
        .select("doc_id")
    )
    nested_docs = (
        per_chunk.filter(F.col("nt") == len(q))
        .select("doc_id")
        .distinct()
        .withColumn("nested_match", F.lit(True))
    )
    return (
        per_doc.withColumn("flat_match", F.lit(True))
        .join(nested_docs, "doc_id", "left")
        .select(
            "doc_id",
            "flat_match",
            F.coalesce("nested_match", F.lit(False)).alias("nested_match"),
        )
        .orderBy("doc_id")
    )


def reverse_nested_agg(
    docs: DataFrame,
    terms: list[str],
    chunk_size: int = NESTED_CHUNK_SIZE,
) -> DataFrame:
    """ES `reverse_nested` aggregation → (site_key, n_parents,
    n_chunks): inside a nested agg over the matching CHUNKS, step back
    to the PARENT document level and bucket by a parent field — "how
    many documents (not sections) per site contain a section matching
    the query". Without reverse_nested a terms agg under a nested agg
    counts chunks, overweighting long documents; this is the ES
    mapping's escape hatch back to parent scope, and the two counts are
    emitted side by side to pin exactly that distinction.

    Plan: the nested_match chunk relation (conjunctive inside ONE
    chunk), then one groupBy(site) with count(distinct doc_id) for the
    parent step-back and count(*) for the chunk scope — the same
    one-extra-aggregation-level cost as the nested query itself."""
    from search_engine_spark.sources.documents import site_key_col

    q = sorted(set(terms))
    chunks = chunk_documents(docs, chunk_size=chunk_size, overlap=0)
    toks = explode_terms(
        chunks.select(
            "doc_id", "chunk_id", F.col("chunk_text").alias("text")
        ),
        keep=["doc_id", "chunk_id"],
    )
    matched = (
        toks.filter(F.col("term").isin(q))
        .groupBy("doc_id", "chunk_id")
        .agg(F.count_distinct("term").alias("_nt"))
        .filter(F.col("_nt") == len(q))
    )
    return (
        matched.withColumn("site_key", site_key_col())
        .groupBy("site_key")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("n_parents"),
            F.count("*").cast("long").alias("n_chunks"),
        )
    )
