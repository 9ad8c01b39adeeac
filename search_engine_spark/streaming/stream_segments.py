"""Structured Streaming → LSM segment ingestion.

The second streaming-indexing topology beside stream_index.py (which
upserts into the single mutable store). Here each micro-batch becomes an
immutable delta segment in a SegmentCatalog and the tiered merge policy
runs opportunistically after every K batches — the Lucene near-real-time
design: ingest latency is one small fused build (proportional to the
batch, never the base index), and compaction amortizes in the background.

Delivery semantics: the file source + checkpointLocation track batches
exactly-once; foreachBatch bodies re-run at-least-once on recovery. A
replayed batch calls add_segment with the SAME deterministic name
(``b<batch_id>``) — the catalog refuses duplicate names, and the handler
then VERIFIES the committed segment's recorded batch identity (n_docs +
doc_id range) before no-opping: a genuine replay matches and is skipped,
while a fresh checkpoint pointed at an existing catalog (batch ids
restart, different data under a colliding name) fails loudly instead of
silently dropping the new documents. A crash between write_blocks and
the manifest commit leaves an orphan dir that the next maintain()
sweeps.

At 10^12-doc scale this is the continuous-ingestion topology: landing
files arrive partition-parallel, each micro-batch's build shuffles only
its own postings, and maintain() keeps query-time segment fan-in
O(merge_factor · log n).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..segment_catalog import SegmentCatalog


def run_segment_ingestion(
    stream_df: DataFrame,
    catalog: SegmentCatalog,
    checkpoint_dir: str,
    maintain_every: int = 4,
    merge_factor: int = 10,
    available_now: bool = True,
):
    """Drive a document stream into the segment catalog.

    One delta segment per non-empty micro-batch; every `maintain_every`
    batches the tiered merge policy compacts. Returns the StreamingQuery
    (already awaited when ``available_now``)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        name = f"b{batch_id:06d}"
        try:
            catalog.add_segment(batch_df, name)
        except ValueError:
            # Name collision. Benign ONLY for a genuine at-least-once
            # replay of the same batch; a fresh checkpoint pointed at an
            # existing catalog also collides (batch ids restart at 0),
            # and silently skipping THOSE batches would drop new
            # documents with no error. Verify the committed segment's
            # recorded batch identity before treating it as a replay.
            committed = catalog.manifest().get(name)
            ident = batch_df.agg(
                F.count("*").alias("n"),
                F.min("doc_id").alias("lo"),
                F.max("doc_id").alias("hi"),
            ).collect()[0]
            if committed is not None and "n_docs" in committed:
                same = (
                    committed["n_docs"] == ident["n"]
                    and committed["doc_lo"] == ident["lo"]
                    and committed["doc_hi"] == ident["hi"]
                )
                if not same:
                    raise RuntimeError(
                        f"segment {name!r} is already committed but holds "
                        f"a DIFFERENT batch (committed n_docs="
                        f"{committed['n_docs']} ids [{committed['doc_lo']},"
                        f" {committed['doc_hi']}], incoming n_docs="
                        f"{ident['n']} ids [{ident['lo']}, {ident['hi']}])."
                        f" This is a fresh checkpoint over an existing "
                        f"catalog, not a replay — use a new catalog dir or "
                        f"the original checkpoint"
                    ) from None
            return  # verified (or legacy pre-identity) replay → no-op
        if batch_id % maintain_every == maintain_every - 1:
            catalog.maintain(merge_factor=merge_factor)

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
