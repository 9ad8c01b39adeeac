"""Fused index build — the two-phase pack/merge pipeline (SURVEY §7 step 5).

The straightforward build shuffles one row per (doc, term) pair into the
block encoder — at sf0.1×512 that is 56M small Arrow rows, and per-row
shuffle/serialization overhead dominates the stage. This module is the
scale-correct formulation:

  phase 1 (map, one python stage): tokenize + count each document, then
          PACK each input partition's postings into one binary row per
          (doc_bucket, term): doc_ids as delta+varbyte, tf/dl as varbyte
          (operators/codec.py — the same vectorized coders the block
          encoder uses). Per-doc lengths (dl) pack the same way under
          kind='dl'. Shuffle volume drops from |postings| rows to
          |partitions|·|terms-per-bucket| rows (~100× fewer rows), and
          from 24 raw int64 bytes per posting to ~4-6 varbyte bytes —
          the shuffle is the build's only wide edge, so its bytes are
          the scale bottleneck worth spending encode CPU on.
  phase 2 (reduce): groupBy(doc_bucket, term) merges each group's few
          runs — documents are unique to one input partition, so runs are
          disjoint and a concat+argsort yields the term's globally sorted
          posting list — then delta+varbyte encodes blocks
          (operators/codec.py).

This IS the "salted repartition + merge partial sorted runs" design from
the north_star: the doc_bucket in the key is the salt (bounding any
(bucket, term) group by the bucket's doc count, head-term-proof), and the
pack rows are the partial runs. Output blocks are bit-identical to
build_posting_blocks(build_postings(docs)) — pinned by tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .blocks import BLOCKS_SCHEMA, N_BUCKETS_DEFAULT, block_rows_frame
from .codec import (
    delta_decode,
    delta_encode,
    encode_blocks_columns,
    varbyte_decode,
    varbyte_encode,
)

PACKED_SCHEMA = (
    "kind string, doc_bucket int, term string, ids_bytes binary, "
    "payload_bytes binary, dl_run_bytes binary, n long, aux long"
)
_PACKED_COLS = [
    "kind",
    "doc_bucket",
    "term",
    "ids_bytes",
    "payload_bytes",
    "dl_run_bytes",
    "n",
    "aux",
]


def _pack_partition_fn(n_buckets: int):
    def _pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..textproc.fast_tokenize import tokenize_tf_arrays

        # columnar accumulation — integer lemma codes per batch, remapped
        # to a partition-level vocab at the end; the term STRING is
        # materialized once per packed row (≤ |vocab|·n_buckets rows), never
        # per posting (the per-posting object column dominated the profile)
        doc_parts: list[np.ndarray] = []
        code_parts: list[np.ndarray] = []
        tf_parts: list[np.ndarray] = []
        dl_parts: list[np.ndarray] = []
        vocabs: list[np.ndarray] = []
        n_rows = 0  # every input doc, incl. ones with zero retained terms
        for pdf in batches:
            if pdf.empty:
                continue
            n_rows += len(pdf)
            # per-posting dl (documents are whole within a partition, so
            # the map-side sum is the doc's exact length) — rides the pack
            # rows into the block encoder, which stores norms inside the
            # blocks
            d, c, tf, dl, vocab = tokenize_tf_arrays(pdf)
            if d.size == 0:
                continue
            doc_parts.append(d)
            code_parts.append(c)
            tf_parts.append(tf)
            dl_parts.append(dl)
            vocabs.append(vocab)
        if not doc_parts:
            if n_rows:
                # corpus-stat row: docs seen, zero postings (all term-less)
                yield pd.DataFrame(
                    [("stat", -1, None, None, None, None, n_rows, 0)],
                    columns=_PACKED_COLS,
                )
            return
        # partition-level vocab: remap each batch's codes through one
        # searchsorted (vocabs are tiny next to the posting stream)
        gvocab = np.unique(np.concatenate(vocabs))
        code = np.concatenate(
            [
                np.searchsorted(gvocab, v)[c]
                for v, c in zip(vocabs, code_parts)
            ]
        )
        doc = np.concatenate(doc_parts)
        tfs = np.concatenate(tf_parts)
        dls_col = np.concatenate(dl_parts)
        bucket = doc % n_buckets
        # one lexsort replaces groupby + per-group argsort: rows come out
        # grouped by (bucket, code) with doc_id ascending inside each group
        # (docs are unique within the partition, so runs are disjoint)
        order = np.lexsort((doc, code, bucket))
        doc, code, tfs, dls_col, bucket = (
            doc[order], code[order], tfs[order], dls_col[order], bucket[order]
        )
        new = np.empty(doc.size, dtype=bool)
        new[0] = True
        new[1:] = (bucket[1:] != bucket[:-1]) | (code[1:] != code[:-1])
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], doc.size)
        rows = []
        # one packed row per (bucket, term): sorted disjoint runs —
        # doc_ids delta+varbyte, tf/dl varbyte (strictly-increasing ids
        # within a run make the deltas small; the shuffle then moves ~4-6
        # bytes per posting instead of 24)
        for s, e in zip(starts, ends):
            rows.append(
                (
                    "post",
                    int(bucket[s]),
                    gvocab[code[s]],
                    varbyte_encode(delta_encode(doc[s:e])),
                    varbyte_encode(tfs[s:e]),
                    varbyte_encode(dls_col[s:e]),
                    int(e - s),
                    0,
                )
            )
        # per-doc norm rows: tokenize output is doc-major, so first
        # occurrence per doc_id inside each batch is the doc's (doc, dl)
        d_first = np.concatenate(
            [d[np.flatnonzero(np.diff(d, prepend=d[0] - 1))] for d in doc_parts]
        )
        dl_first = np.concatenate(
            [
                dl[np.flatnonzero(np.diff(d, prepend=d[0] - 1))]
                for d, dl in zip(doc_parts, dl_parts)
            ]
        )
        db = d_first % n_buckets
        order = np.lexsort((d_first, db))
        d_first, dl_first, db = d_first[order], dl_first[order], db[order]
        bnew = np.empty(db.size, dtype=bool)
        bnew[0] = True
        bnew[1:] = db[1:] != db[:-1]
        bstarts = np.flatnonzero(bnew)
        bends = np.append(bstarts[1:], db.size)
        for s, e in zip(bstarts, bends):
            rows.append(
                (
                    "dl",
                    int(db[s]),
                    None,
                    varbyte_encode(delta_encode(d_first[s:e])),
                    varbyte_encode(dl_first[s:e]),
                    None,
                    int(e - s),
                    0,
                )
            )
        # corpus-stat row: partition doc count + Σdl — corpus_stats_from_
        # packed aggregates these JVM-side, so build() never re-scans the
        # raw documents just to learn n_docs/avgdl
        rows.append(
            ("stat", -1, None, None, None, None, n_rows,
             int(dl_first.sum()))
        )
        yield pd.DataFrame(rows, columns=_PACKED_COLS)

    return _pack


def _merge_encode(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (doc_bucket, term) group of packed runs → encoded block rows."""
    bucket = int(pdf["doc_bucket"].iloc[0])
    term = pdf["term"].iloc[0]
    ns = pdf["n"].to_numpy(dtype=np.int64)
    ids = np.concatenate(
        [
            delta_decode(varbyte_decode(b, int(n)))
            for b, n in zip(pdf["ids_bytes"], ns)
        ]
    )
    tfs = np.concatenate(
        [varbyte_decode(b, int(n)) for b, n in zip(pdf["payload_bytes"], ns)]
    )
    dls = np.concatenate(
        [varbyte_decode(b, int(n)) for b, n in zip(pdf["dl_run_bytes"], ns)]
    )
    order = np.argsort(ids, kind="stable")  # runs are disjoint → plain sort
    cols = encode_blocks_columns(ids[order], tfs[order], dls[order])
    return block_rows_frame(bucket, term, cols, BLOCKS_SCHEMA)


def pack_documents(docs: DataFrame, n_buckets: int = N_BUCKETS_DEFAULT) -> DataFrame:
    """Phase 1: documents → packed run rows (kind='post' | 'dl')."""
    return docs.select("doc_id", "text").mapInPandas(
        _pack_partition_fn(n_buckets), schema=PACKED_SCHEMA
    )


def blocks_from_packed(packed: DataFrame) -> DataFrame:
    """Phase 2: packed 'post' runs → compressed posting blocks
    (identical to blocks.build_posting_blocks output).

    Declarative groupBy: the shuffle partitioning is left to
    spark.sql.shuffle.partitions + AQE (an A/B at 2.56M docs showed an
    explicit pre-repartition adds task overhead without improving balance
    — group sizes are already bounded by the doc_bucket salt)."""
    return (
        packed.filter(F.col("kind") == "post")
        .groupBy("doc_bucket", "term")
        .applyInPandas(_merge_encode, schema=BLOCKS_SCHEMA)
    )


def corpus_stats_from_packed(packed: DataFrame) -> tuple[int, int]:
    """(n_docs, Σdl) from the pack stage's 'stat' rows — a JVM-only agg
    over the cached packed frame; the raw corpus is never re-scanned just
    to size avgdl. n_docs counts every input document (including ones
    with zero retained terms, matching docs.count())."""
    row = (
        packed.filter(F.col("kind") == "stat")
        .agg(F.sum("n").alias("n_docs"), F.sum("aux").alias("sum_dl"))
        .collect()[0]
    )
    return int(row["n_docs"] or 0), int(row["sum_dl"] or 0)


def doc_stats_from_packed(packed: DataFrame) -> DataFrame:
    """Packed 'dl' runs → (doc_bucket, doc_id, dl) norm rows.

    Documents with zero retained terms have no dl row; they can never
    match a query, so the norms table omits them (build_doc_stats keeps
    the relational join variant for the oracle contract)."""
    dl_rows = packed.filter(F.col("kind") == "dl").select(
        "doc_bucket", "ids_bytes", "payload_bytes", "n"
    )

    def _unpack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            buckets, ids_parts, dl_parts = [], [], []
            for row in pdf.itertuples(index=False):
                ids = delta_decode(varbyte_decode(row.ids_bytes, int(row.n)))
                dls = varbyte_decode(row.payload_bytes, int(row.n))
                ids_parts.append(ids)
                dl_parts.append(dls)
                buckets.append(np.full(ids.size, row.doc_bucket, dtype=np.int32))
            yield pd.DataFrame(
                {
                    "doc_bucket": np.concatenate(buckets),
                    "doc_id": np.concatenate(ids_parts),
                    "dl": np.concatenate(dl_parts),
                }
            )

    return dl_rows.mapInPandas(
        _unpack, schema="doc_bucket int, doc_id long, dl long"
    )
