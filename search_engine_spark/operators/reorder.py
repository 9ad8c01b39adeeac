"""Document-ID reordering for index compression — URL-order id assignment.

Web-search engines renumber documents so that similar pages get nearby
doc_ids; posting-list deltas then shrink and the gap codecs pack tighter.
Ordering by URL is the classic cheap heuristic (Yan, Ding & Suel, WWW'09
"Inverted index compression and query processing with optimized document
ordering"): pages on the same site share vocabulary, and URL lexicographic
order clusters a site's pages contiguously. The reference never renumbers
(MySQL auto-increment page ids, model/Page.java) — at 10^12 documents the
ordering is worth a large constant factor of index size, so this engine
makes it a first-class build step.

Interaction with the doc-sharded block layout (operators/blocks.py): with
bucket = new_id % N_BUCKETS, a run of w consecutive same-site ids lands in
each bucket every N_BUCKETS steps, so a site-local term's within-bucket
gaps collapse to the CONSTANT N_BUCKETS — the best case for the PForDelta
codec (one bit width, zero exceptions) — instead of the large variable
gaps a scattered ordering produces. tests/test_reorder.py pins that the
encoded index is strictly smaller on a site-clustered corpus.

Scale notes (10^12 rows):
* The dense rank is NOT a global window (that is one partition — the
  round-1 scale-killer). It is the standard distributed zip-with-index:
  range-repartition by the sort key, rank locally per partition, then add
  per-partition offsets. The only driver-side data is one count per
  partition (bounded by the cluster's partition count, not by data).
* The ranked narrow frame (doc_id, _pid, _rn) is persisted before the
  offsets are collected: the offset pass and the final projection must see
  the SAME range boundaries, and RangePartitioner samples its input — two
  independent evaluations are not guaranteed identical. In a real
  deployment the mapping is staged durably anyway (it must be: future
  incremental batches need it to keep assigning ids), so the persist is
  the in-memory stand-in for that staging write.
* Remapping postings/docs is a plain key join on doc_id — both sides
  corpus-sized, so it shuffles; never broadcast the mapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def url_ordered_ids(
    docs: DataFrame,
    order_cols: tuple[str, ...] = ("url", "doc_id"),
    n_parts: int | None = None,
) -> DataFrame:
    """(doc_id, new_id): new_id is the dense 0-based rank of the document
    under lexicographic (url, doc_id) order. Deterministic: doc_id breaks
    every tie, so the mapping is a pure function of the corpus."""
    spark = docs.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    keep = ["doc_id"] + [c for c in order_cols if c != "doc_id"]
    ranged = (
        docs.select(*keep)
        .repartitionByRange(n_parts, *[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(*[F.col(c) for c in order_cols])
    # Persisted for the life of the session (the in-memory stand-in for the
    # durable mapping-table write a real deployment does here; release with
    # spark.catalog.clearCache() if the session lives on).
    local = ranged.withColumn("_rn", F.row_number().over(w)).persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_col = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    )
    return local.select(
        "doc_id",
        (off_col + F.col("_rn") - 1).cast("long").alias("new_id"),
    )


def reorder_docs(docs: DataFrame, mapping: DataFrame) -> DataFrame:
    """Swap doc_id for its url-ordered new_id ahead of the index build.

    The original id is kept as orig_doc_id so query results can be mapped
    back (presentation joins on it). Corpus-sized ⋈ corpus-sized on doc_id:
    a shuffle join by design — do not broadcast either side."""
    other = [c for c in docs.columns if c != "doc_id"]
    return (
        docs.join(mapping, "doc_id")
        .select(
            F.col("new_id").alias("doc_id"),
            F.col("doc_id").alias("orig_doc_id"),
            *other,
        )
    )


def reorder_postings(postings: DataFrame, mapping: DataFrame) -> DataFrame:
    """Remap an already-built logical postings frame (doc_id, term, tf)
    onto the url-ordered ids — the cheap path when postings exist and the
    corpus does not need re-tokenizing."""
    other = [c for c in postings.columns if c != "doc_id"]
    return postings.join(mapping, "doc_id").select(
        F.col("new_id").alias("doc_id"), *other
    )
