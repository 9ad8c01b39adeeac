"""Streaming snapshot reconciliation: newest revision per page, as a
stateful streaming aggregation — the twin of
operators/curation.py::latest_revisions (same max_by(struct) winner
election, same (warc_ts, doc_id) tiebreak).

Production shape: ``outputMode("update")`` emits only the keys whose
winner changed in each micro-batch, feeding a keyed upsert sink
(foreachBatch MERGE INTO on the page key) — per-key state is one struct,
and the watermark bounds how late a straggling revision may still win.
The test harness drives ``outputMode("complete")`` into a memory sink
instead (the memory sink cannot upsert); complete mode disables watermark
eviction, which is fine at test scale and keeps the asserted table
directly comparable to the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .stream_index import STREAM_SCHEMA


def latest_stream(
    revs: DataFrame,
    key: str = "page_key",
    watermark: str = "1 hour",
) -> DataFrame:
    """(key, n_revisions, doc_id, warc_ts) — running newest-revision per
    key. Same aggregation as the batch operator; Spark keeps one
    (count, winner-struct) per key as streaming state."""
    winner = F.max_by(
        F.struct("doc_id", "warc_ts"),
        F.struct(F.col("warc_ts"), F.col("doc_id")),
    ).alias("_w")
    return (
        revs.withWatermark("warc_ts", watermark)
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_revisions"), winner)
        .select(
            key,
            "n_revisions",
            F.col("_w.doc_id").alias("doc_id"),
            F.col("_w.warc_ts").alias("warc_ts"),
        )
    )


def run_latest_to_memory(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    key_mod: int,
    table_name: str = "stream_latest",
) -> DataFrame:
    """Drive the reconciliation with availableNow into a memory sink
    (complete mode — see module docstring), deriving the fixture
    page_key = doc_id % key_mod on the way in."""
    revs = (
        spark.readStream.schema(STREAM_SCHEMA)
        .parquet(input_glob)
        .withColumn("page_key", F.col("doc_id") % key_mod)
    )
    q = (
        latest_stream(revs)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
