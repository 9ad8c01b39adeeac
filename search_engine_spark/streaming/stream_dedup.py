"""Streaming exact deduplication with watermark-bounded state.

The batch exact-dup operator (operators/dedup.py::exact_duplicates) keeps
whole fingerprint groups; a stream cannot — at 10^12 docs the seen-set
would grow without bound. This twin emits ONE document per
content fingerprint and bounds the seen-set with
``dropDuplicatesWithinWatermark``: a duplicate arriving within the
watermark of its original is dropped; state older than the watermark is
evicted. That trades unbounded-lateness exactness (impossible on an
unbounded stream) for bounded state — the standard streaming-dedup design.

Which copy survives: the first ARRIVAL in stream order across
micro-batches; when duplicates co-arrive in the SAME micro-batch the
survivor is whichever row the partition/task ordering surfaces first —
valid but not guaranteed to be the earliest warc_ts. A consumer needing
a deterministic canonical (e.g. reconciling against a batch backfill)
should re-canonicalize downstream with the batch rule (min doc_id per
fingerprint); the stream's job is the bounded-state duplicate drop, not
the election.

Fingerprint = the same normalized-text hash the batch path uses
(operators/textstats.py::fingerprints), so a batch backfill and the stream
agree on what "identical" means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.textstats import fingerprint_col
from .stream_index import STREAM_SCHEMA


def stream_docs(spark: SparkSession, input_glob: str) -> DataFrame:
    return spark.readStream.schema(STREAM_SCHEMA).parquet(input_glob)


def dedup_stream(docs: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """(doc_id, warc_ts, fp) — first-seen document per content fingerprint;
    duplicates within the watermark window are suppressed, state beyond it
    is evicted."""
    return (
        docs.select("doc_id", "warc_ts", fingerprint_col().alias("fp"))
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def run_dedup_to_memory(
    spark: SparkSession,
    input_glob: str,
    checkpoint_dir: str,
    table_name: str = "stream_dedup",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drive the dedup stream with availableNow into a memory sink."""
    q = (
        dedup_stream(stream_docs(spark, input_glob), watermark)
        .writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table_name)
