"""Structured Streaming ingestion — continuous incremental indexing.

The reference has no streaming surface (SURVEY §2.F: crawl recursion is
task-parallelism, not a stream); this engine adds the natural Spark-first
equivalent for a continuously-arriving corpus (Common-Crawl dumps landing
as parquet files): a file-source ``readStream`` feeding the SAME
incremental-reindex operator the single-document path uses
(operators/incremental.py), one micro-batch at a time via ``foreachBatch``.

Delivery semantics: the file source + checkpointLocation give exactly-once
*batch tracking*; foreachBatch bodies run at-least-once on recovery, and
``reindex_docs`` is idempotent for a given document set (partition
overwrite + manifest append), so replaying a half-applied batch converges.

At cluster scale the same topology ingests 10^12 docs: the stream is
partition-parallel, each micro-batch touches only the doc_buckets of its
documents, and watermarking/late data are irrelevant because documents are
keyed by doc_id (upsert semantics), not event-time windows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..catalog import IndexStore, build_persistent
from ..operators.incremental import reindex_docs

# input_hint schema (BASELINE.json) + doc_id (derived upstream)
STREAM_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)


def stream_documents(
    spark: SparkSession, input_dir: str, schema: T.StructType = STREAM_SCHEMA
) -> DataFrame:
    """File-source stream over a landing directory of document parquet."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )


def run_incremental_indexing(
    stream_df: DataFrame,
    store: IndexStore,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Drive the stream into the persistent index.

    The first micro-batch on an empty store runs the (resumable) full
    build; every later batch is an incremental upsert of exactly its
    documents. Returns the StreamingQuery (already awaited when
    ``available_now``)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not os.path.exists(store.stats_path):
            build_persistent(batch_df, store)
        else:
            reindex_docs(store, batch_df)

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
