"""Streaming incremental near-dup gate — the crawl-increment dedup as a
Structured Streaming job.

Batch shape (operators/dedup.py::dedup_incremental): new docs' LSH bands
probe the STORED corpus band table, collisions verify with exact
candidate-driven Jaccard. The daily increment is naturally a stream —
each crawled page arrives once — and the streaming twin runs the SAME
batch operators inside ``foreachBatch`` against the static corpus:

  * stream-static by construction: the corpus is a fixed relation; each
    micro-batch of new docs probes it with the unchanged
    `lsh_probe_pairs` + `jaccard_pairs` code, so the stream CANNOT
    drift from the batch semantics (one implementation, two drivers);
  * no cross-batch state: a candidate pair (new, existing) is generated
    only by the NEW doc's bands, and all of a doc's bands live in the
    micro-batch that carries the doc — per-batch `distinct` is
    globally exact, and the union of per-batch outputs equals the
    batch run over the whole increment (pinned by test across a
    multi-file replay);
  * at 10^12 docs the corpus band table is the persisted bucket-
    partitioned relation; the micro-batch side is small, so AQE
    broadcasts the probe exactly as in the batch plan.

``foreachBatch`` is the right tool (not a stateful streaming op): the
per-arrival computation is a pure batch join against static data —
nothing to watermark, no state to carry. The sink here appends the
verified rows to a driver-side list (the test sink — production writes
the same frame to the increment's reject table instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import jaccard_pairs, lsh_probe_pairs
from .stream_index import STREAM_SCHEMA


def stream_new_docs(spark: SparkSession, input_glob: str) -> DataFrame:
    return spark.readStream.schema(STREAM_SCHEMA).parquet(input_glob)


def run_probe_collect(
    spark: SparkSession,
    input_glob: str,
    corpus_docs: DataFrame,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_files_per_trigger: int | None = 1,
) -> list[tuple]:
    """Drive the probe with availableNow; returns the verified
    (doc_a, doc_b, jaccard) rows accumulated across ALL micro-batches
    (max_files_per_trigger=1 forces one micro-batch per input file, so
    the multi-batch path is actually exercised)."""
    corpus = corpus_docs.select("doc_id", "text").persist()
    corpus.count()
    out: list[tuple] = []

    def process(batch_df: DataFrame, batch_id: int) -> None:
        batch_docs = batch_df.select("doc_id", "text")
        if batch_docs.isEmpty():
            return
        cand = lsh_probe_pairs(corpus, batch_docs)
        verified = jaccard_pairs(
            corpus.unionByName(batch_docs), threshold, candidates=cand
        )
        out.extend(tuple(r) for r in verified.collect())

    reader = spark.readStream.schema(STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", int(max_files_per_trigger))
    try:
        q = (
            reader.parquet(input_glob)
            .writeStream.foreachBatch(process)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        # A failed query must not leak the cached corpus for the session.
        corpus.unpersist()
    return sorted(out)
