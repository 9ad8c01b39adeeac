"""Streaming percolation — stored-search alerting over a document stream.

The batch operator (operators/search.py::percolate) matches a STORED set
of conjunctive queries against a corpus; the streaming twin runs the
same relational-division plan inside each micro-batch, emitting
(query_id, doc_id) alert rows as matching documents arrive — the
Elasticsearch-percolator / Google-Alerts shape expressed as Structured
Streaming.

Design notes:

- The match is per-document (a doc matches a query based only on its own
  tokens), so the stream needs NO state at all: tokenization + broadcast
  query join + per-(query,doc) containment all complete within the
  micro-batch. foreachBatch reuses the EXACT batch operator — one code
  path for backfill and live alerting, the same twin discipline as
  stream_index/stream_dedup.
- The stored query table broadcasts per batch (tiny); postings for the
  batch come from the same build_postings tokenizer, so stream and batch
  agree on analysis down to the lemma dictionary.
- Alerts append to a parquet sink per batch (at scale: the notification
  bus); exactly-once comes from the checkpoint + idempotent downstream,
  the standard foreachBatch contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.index_build import build_postings
from ..operators.search import PERCOLATE_QUERIES, percolate
from .stream_index import STREAM_SCHEMA


def stream_docs(spark: SparkSession, input_glob: str) -> DataFrame:
    return spark.readStream.schema(STREAM_SCHEMA).parquet(input_glob)


def run_percolate_to_dir(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    out_dir: str,
    queries: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """Drive the percolation stream with availableNow, appending alert
    rows (query_id, doc_id) to a parquet sink; returns the sink frame."""
    queries = PERCOLATE_QUERIES if queries is None else queries

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        alerts = percolate(build_postings(batch_df), queries)
        alerts.write.mode("append").parquet(out_dir)

    q = (
        stream_docs(spark, input_glob)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
