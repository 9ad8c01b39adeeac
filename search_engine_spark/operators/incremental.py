"""Incremental reindex — the reference's POST /api/indexPage path
(services/IndexingServiceImpl.java:145-210) as a partition-surgical
micro-batch over the persistent store (catalog.IndexStore).

Reference semantics replicated relationally (SURVEY §2.C I4-I8):

  * a re-submitted page first has its old contributions retracted —
    lemma df decremented, lemma deleted at df==0, old postings dropped
    (deleteLemmatizationInfo, IndexingServiceImpl.java:244-266;
    correctChangedLemmasFrequency, PageAnalyzer.java:362-378);
  * fresh postings insert with the new tf (analyzeIndex,
    PageAnalyzer.java:332-360);
  * unchanged pages are untouched.

Spark-first shape: postings are derived data sharded by
doc_bucket = doc_id % N, so updating documents D touches ONLY the buckets
{d % N}. Those buckets' logical postings are reconstructed by decoding the
stored blocks (blocks.decode_blocks — no corpus re-read), the affected
doc_ids are swapped out, the buckets re-encode, and a dynamic partition
overwrite replaces just those directories. The term dictionary then
re-derives from block metadata (term_dict_from_blocks), which reproduces
the df-decrement/delete-at-zero semantics *by construction* instead of by
mutation. Lineage: one manifest row per touched bucket, phase='reindex'.

At 10^12-doc scale this is the same MERGE-shaped pattern Iceberg would run:
copy-on-write of the affected partitions, snapshot commit at the end.
"""

from __future__ import annotations

import time
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..catalog import IndexStore, _finalize_dictionary
from .blocks import build_posting_blocks, decode_blocks
from .index_build import build_postings


def reindex_docs(
    store: IndexStore,
    changed_docs: DataFrame,
    delete_ids: list[int] | None = None,
) -> dict:
    """Upsert ``changed_docs`` (doc_id, text, ...) into the persisted index
    and/or remove ``delete_ids`` entirely.

    Returns {build_id, touched_buckets}."""
    spark = store.spark
    n = store.n_buckets
    delete_ids = list(delete_ids or [])

    # last-write-wins within the batch: a micro-batch can deliver several
    # revisions of one doc_id (stream_index reads up to maxFilesPerTrigger
    # files per trigger); indexing them all would encode duplicate doc_ids
    # into a term's posting run — breaking the strictly-increasing invariant
    # the codec relies on — and sum both revisions into dl. Keep the newest
    # by warc_ts when the column exists, else an arbitrary-but-single row.
    if "warc_ts" in changed_docs.columns:
        from pyspark.sql import Window

        w = Window.partitionBy("doc_id").orderBy(F.col("warc_ts").desc())
        changed_docs = (
            changed_docs.withColumn("_rev", F.row_number().over(w))
            .filter(F.col("_rev") == 1)
            .drop("_rev")
        )
    else:
        changed_docs = changed_docs.dropDuplicates(["doc_id"])

    changed_ids = [
        r["doc_id"] for r in changed_docs.select("doc_id").distinct().collect()
    ]
    all_ids = sorted(set(changed_ids) | set(delete_ids))
    if not all_ids:
        return {"build_id": None, "touched_buckets": []}
    touched = sorted({i % n for i in all_ids})

    # lineage FIRST, data second (crash-safe ordering): the phase='reindex'
    # rows supersede the buckets' 'blocks' commits, so if the process dies
    # between here and the partition overwrites, committed_buckets() simply
    # sees the buckets as not-committed for the original fingerprint and a
    # later build_persistent rebuilds them — worst case extra work, never a
    # manifest that claims data the files don't hold (ADVICE r01).
    build_id = uuid.uuid4().hex[:12]
    fp = store.read_corpus_stats().get("fingerprint", "") + f"+r{build_id}"
    now = time.time()
    store.append_manifest(
        [
            {
                "build_id": build_id,
                "fingerprint": fp,
                "doc_bucket": b,
                "phase": "reindex",
                "n_docs": len([i for i in all_ids if i % n == b]),
                "n_postings": 0,
                "n_blocks": 0,
                "committed_at": now,
            }
            for b in touched
        ]
    )

    old = decode_blocks(
        store.read_blocks().filter(F.col("doc_bucket").isin(touched))
    )
    kept = old.filter(~F.col("doc_id").isin(all_ids)).drop("doc_bucket")
    fresh = build_postings(changed_docs)
    merged = kept.unionByName(fresh)
    new_blocks = build_posting_blocks(merged, n).cache()
    present = {
        r["doc_bucket"]
        for r in new_blocks.select("doc_bucket").distinct().collect()
    }
    if present:
        store.overwrite_partitions(
            new_blocks.filter(F.col("doc_bucket").isin(sorted(present))),
            store.blocks_path,
        )
    # a touched bucket with NO remaining postings (its only docs were
    # deleted) is invisible to dynamic overwrite — drop its stale partition
    # directory explicitly (Iceberg would express this as DELETE WHERE)
    store.drop_partitions(store.blocks_path, sorted(set(touched) - present))
    new_blocks.unpersist()

    # norms: drop deleted ids, upsert changed ids' dl within touched buckets
    old_stats = store.read_doc_stats().filter(F.col("doc_bucket").isin(touched))
    kept_stats = old_stats.filter(~F.col("doc_id").isin(all_ids))
    fresh_dl = (
        changed_docs.select("doc_id")
        .join(
            fresh.groupBy("doc_id").agg(F.sum("tf").alias("dl")),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("dl", F.lit(0)).cast("long").alias("dl"),
        )
        .withColumn("doc_bucket", F.pmod(F.col("doc_id"), F.lit(n)).cast("int"))
    )
    new_stats = kept_stats.unionByName(fresh_dl).cache()
    stats_present = {
        r["doc_bucket"]
        for r in new_stats.select("doc_bucket").distinct().collect()
    }
    if stats_present:
        store.overwrite_partitions(
            new_stats.filter(F.col("doc_bucket").isin(sorted(stats_present))),
            store.doc_stats_path,
        )
    store.drop_partitions(
        store.doc_stats_path, sorted(set(touched) - stats_present)
    )
    new_stats.unpersist()

    _finalize_dictionary(store, build_id, fp)
    return {"build_id": build_id, "touched_buckets": touched}
