"""Segment merge — Lucene-style index compaction.

The reference mutates its index row-by-row on every re-crawl
(PageAnalyzer.java:301-360 upserts into MySQL). At 100 TB the scalable
shape is the opposite — the Lucene/LSM segment model: new documents build
a small DELTA index with the same fused pipeline (cheap, touches nothing
existing), queries scan base ∪ delta, and a periodic MERGE compacts
segments back into one. This module is that merge.

Merge = one shuffle: union the segments' block tables, groupBy
(doc_bucket, term), decode each segment's runs, concatenate, sort, and
re-encode with the SAME run-level encoder the build uses
(codec.encode_blocks_columns). Because the logical postings of the merged
segments equal the postings of a from-scratch build over the union corpus,
the merged blocks are BIT-IDENTICAL to that build's blocks — pinned by
tests/test_segments.py. Doc_ids must be disjoint across segments (the
engine's doc_id derivation guarantees it; overlapping ids are an upstream
reindex, operators/incremental.py, not a merge).

Scale notes: group sizes stay bounded by the doc_bucket salt exactly as in
the build's phase 2; the shuffle moves already-compressed block payloads
(v-byte/PForDelta), so merging S segments costs ~S× the index bytes, not
the corpus bytes — the classic reason segment merge beats rebuild.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .blocks import BLOCKS_SCHEMA, block_rows_frame
from .codec import decode_block, decode_payload, encode_blocks_columns


def _remerge_group_fn(deleted: np.ndarray | None):
    def _remerge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """One (doc_bucket, term) group of block rows from ≥1 segments →
        freshly encoded block rows over the union of their postings,
        minus tombstoned doc_ids."""
        bucket = int(pdf["doc_bucket"].iloc[0])
        term = pdf["term"].iloc[0]
        ids_parts, tf_parts, dl_parts = [], [], []
        for row in pdf.itertuples(index=False):
            ids, tfs = decode_block(row.doc_bytes, row.tf_bytes, row.count)
            ids_parts.append(ids)
            tf_parts.append(tfs)
            dl_parts.append(decode_payload(row.dl_bytes, row.count))
        ids = np.concatenate(ids_parts)
        tfs = np.concatenate(tf_parts)
        dls = np.concatenate(dl_parts)
        if deleted is not None and deleted.size:
            live = ~np.isin(ids, deleted)
            ids, tfs, dls = ids[live], tfs[live], dls[live]
            # fully-deleted term → 0 rows out (encode of empty arrays):
            # the term leaves the block table, hence the dictionary too
        order = np.argsort(ids, kind="stable")  # disjoint docs → plain sort
        cols = encode_blocks_columns(ids[order], tfs[order], dls[order])
        return block_rows_frame(bucket, term, cols, BLOCKS_SCHEMA)

    return _remerge_group


def merge_segments(
    *segment_blocks: DataFrame, deleted: np.ndarray | None = None
) -> DataFrame:
    """Compact ≥2 segment block tables (same n_buckets, disjoint doc_ids)
    into one — output blocks are bit-identical to a from-scratch build over
    the union corpus (minus tombstones). Declarative groupBy over the
    unioned block rows; the per-group work is vectorized numpy
    decode/re-encode.

    `deleted` is the tombstone set purged during compaction — the Lucene
    .liv model: deletes are cheap logical marks (apply_tombstones on the
    query path) until a merge REWRITES the segment holding them. A merge
    only purges tombstones from ITS input segments: a tombstoned doc whose
    segment is not in any merge plan stays physically present, so callers
    must keep apply_tombstones on the query path and may drop a tombstone
    only once every segment that existed when it was recorded has been
    rewritten (compare against SegmentCatalog.segment_names()). The array
    ships to executors inside the task closure; like Lucene's live-docs
    bitmaps it must fit in memory, which holds because full compaction
    cycles bound its growth. dl is a per-document fact,
    so purging one doc leaves every other doc's stored norms untouched —
    the bit-identity guarantee vs a from-scratch build over the LIVE docs
    holds with tombstones too (pinned in tests). Corpus-level stats
    (N, avgdl) are the manifest's concern, recomputed at commit."""
    if len(segment_blocks) < 2:
        raise ValueError("need at least two segments to merge")
    unioned = segment_blocks[0]
    for seg in segment_blocks[1:]:
        unioned = unioned.unionByName(seg)
    if deleted is not None:
        deleted = np.unique(np.asarray(deleted, dtype=np.int64))
        # zone-map prune: drop whole blocks only when every doc is dead
        # (cheap driver-side literal filter would need per-block decode;
        # the group fn filters exactly instead)
    return unioned.groupBy("doc_bucket", "term").applyInPandas(
        _remerge_group_fn(deleted), schema=BLOCKS_SCHEMA
    )


def plan_merges(
    segment_sizes: dict[str, int],
    merge_factor: int = 10,
    log_base: float = 10.0,
) -> list[list[str]]:
    """Log-tiered merge policy (Lucene TieredMergePolicy-lite): group
    segments into size tiers ``floor(log_base(size))``; any tier holding
    ≥ merge_factor segments contributes merges of merge_factor segments
    each (smallest-first within the tier, name as tiebreak — deterministic
    for a given input). Returns a list of merge groups to feed
    merge_segments; [] means the index is compacted enough.

    Driver-side planning over segment METADATA only (a dict of sizes —
    thousands of entries at most); the merges themselves are the
    distributed jobs. Repeated build-delta-plan-merge cycles keep segment
    count O(merge_factor · log(total/min_size)), the LSM invariant that
    bounds query-time segment fan-in."""
    if merge_factor < 2:
        raise ValueError("merge_factor must be ≥ 2")

    def _tier(size: int) -> int:
        # exact threshold walk — float log mis-floors exact powers
        # (int(math.log(1000, 10)) == 2), putting a segment one tier low
        t, threshold = 0, float(log_base)
        s = max(int(size), 1)
        while s >= threshold:
            t += 1
            threshold *= log_base
        return t

    tiers: dict[int, list[tuple[int, str]]] = {}
    for name, size in segment_sizes.items():
        tiers.setdefault(_tier(size), []).append((max(int(size), 1), name))
    plans: list[list[str]] = []
    for tier in sorted(tiers):
        members = sorted(tiers[tier])
        while len(members) >= merge_factor:
            group, members = members[:merge_factor], members[merge_factor:]
            plans.append([name for _, name in group])
    return plans


def apply_tombstones(hits: DataFrame, tombstones: DataFrame) -> DataFrame:
    """Query-path logical delete: drop hit rows whose doc_id is
    tombstoned. A left-anti join — AQE broadcasts the (small) tombstone
    side; this is what serving does between compactions."""
    return hits.join(
        tombstones.select("doc_id").distinct(), "doc_id", "left_anti"
    )
