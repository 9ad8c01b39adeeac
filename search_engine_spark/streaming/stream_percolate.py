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
- Each micro-batch's alerts land in a batch_id-deterministic directory
  (``out_dir/batch=<id>``) written with overwrite — foreachBatch bodies
  re-run at-least-once on recovery, so the sink write itself must be
  idempotent: a replay of batch N rewrites the same path instead of
  appending a duplicate copy of every alert. At scale the same key
  (batch_id) de-duplicates deliveries to the notification bus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.index_build import build_postings
from ..operators.search import PERCOLATE_QUERIES, percolate
from .stream_dedup import stream_docs  # one doc-stream reader, one schema

__all__ = ["stream_docs", "run_percolate_to_dir"]


def run_percolate_to_dir(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    out_dir: str,
    queries: list[tuple[str, list[str]]] | None = None,
) -> DataFrame:
    """Drive the percolation stream with availableNow, writing alert
    rows (query_id, doc_id) to an idempotent per-batch parquet sink;
    returns the sink frame (empty when the input matched no files)."""
    queries = PERCOLATE_QUERIES if queries is None else queries

    def _batch(batch_df: DataFrame, batch_id: int) -> None:
        alerts = percolate(build_postings(batch_df), queries)
        alerts.write.mode("overwrite").parquet(
            f"{out_dir}/batch={batch_id}"
        )

    q = (
        stream_docs(spark, input_glob)
        .writeStream.foreachBatch(_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    try:
        sink = spark.read.parquet(out_dir)
    except Exception:
        # zero micro-batches ran (empty landing dir) → the sink was never
        # created; an empty alert frame is the correct answer, not a crash
        return spark.createDataFrame([], "query_id string, doc_id bigint")
    return sink.select("query_id", "doc_id")
