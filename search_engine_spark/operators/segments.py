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

from .blocks import BLOCKS_SCHEMA
from .codec import decode_block, decode_payload, encode_blocks_columns


def _remerge_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (doc_bucket, term) group of block rows from ≥1 segments →
    freshly encoded block rows over the union of their postings."""
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
    order = np.argsort(ids, kind="stable")  # disjoint doc sets → plain sort
    cols = encode_blocks_columns(ids[order], tfs[order], dls[order])
    nb = len(cols["doc_bytes"])
    return pd.DataFrame(
        {
            "doc_bucket": np.full(nb, bucket, dtype=np.int32),
            "term": term,
            **cols,
        },
        columns=[f.name for f in BLOCKS_SCHEMA.fields],
    )


def merge_segments(*segment_blocks: DataFrame) -> DataFrame:
    """Compact ≥2 segment block tables (same n_buckets, disjoint doc_ids)
    into one — output blocks are bit-identical to a from-scratch build over
    the union corpus. Declarative groupBy over the unioned block rows; the
    per-group work is vectorized numpy decode/re-encode."""
    if len(segment_blocks) < 2:
        raise ValueError("need at least two segments to merge")
    unioned = segment_blocks[0]
    for seg in segment_blocks[1:]:
        unioned = unioned.unionByName(seg)
    return unioned.groupBy("doc_bucket", "term").applyInPandas(
        _remerge_group, schema=BLOCKS_SCHEMA
    )
