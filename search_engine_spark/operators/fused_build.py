"""Fused index build — the two-phase pack/merge pipeline (SURVEY §7 step 5).

The straightforward build shuffles one row per (doc, term) pair into the
block encoder — at sf0.1×512 that is 56M small Arrow rows, and per-row
shuffle/serialization overhead dominates the stage. This module is the
scale-correct formulation:

  phase 1 (map, one python stage): tokenize + count each document, then
          PACK each input partition's postings into one binary row per
          (doc_bucket, term): sorted int64 doc_id/tf arrays. Per-doc
          lengths (dl) pack the same way under kind='dl'. Shuffle volume
          drops from |postings| rows to |partitions|·|terms-per-bucket|
          rows (~100× fewer rows for the same bytes), and the bytes
          themselves are raw int64 runs that the shuffle compresses well.
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

from .blocks import BLOCKS_SCHEMA, N_BUCKETS_DEFAULT
from .codec import encode_blocks

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
        from ..textproc.fast_tokenize import tokenize_tf

        post_parts: list[pd.DataFrame] = []
        dl_parts: list[pd.DataFrame] = []
        n_rows = 0  # every input doc, incl. ones with zero retained terms
        for pdf in batches:
            if pdf.empty:
                continue
            n_rows += len(pdf)
            # per-posting dl (documents are whole within a partition, so
            # the map-side sum is the doc's exact length) — rides the pack
            # rows into the block encoder, which stores norms inside the
            # blocks
            tf = tokenize_tf(pdf, with_dl=True)
            if tf.empty:
                continue
            post_parts.append(tf)
            # tokenize_tf returns doc-major rows: one dl row per doc via
            # first-occurrence dedup
            dl_parts.append(
                tf.loc[
                    tf["doc_id"].ne(tf["doc_id"].shift()), ["doc_id", "dl"]
                ]
            )
        if not post_parts:
            if n_rows:
                # corpus-stat row: docs seen, zero postings (all term-less)
                yield pd.DataFrame(
                    [("stat", -1, None, None, None, None, n_rows, 0)],
                    columns=_PACKED_COLS,
                )
            return
        posts = pd.concat(post_parts, ignore_index=True)
        posts["doc_bucket"] = (posts["doc_id"] % n_buckets).astype("int32")
        rows = []
        # one packed row per (bucket, term): sorted disjoint runs
        for (bucket, term), g in posts.groupby(["doc_bucket", "term"], sort=False):
            ids = g["doc_id"].to_numpy(dtype=np.int64)
            tfs = g["tf"].to_numpy(dtype=np.int64)
            per_dl = g["dl"].to_numpy(dtype=np.int64)
            order = np.argsort(ids, kind="stable")
            rows.append(
                (
                    "post",
                    int(bucket),
                    term,
                    ids[order].tobytes(),
                    tfs[order].tobytes(),
                    per_dl[order].tobytes(),
                    int(ids.size),
                    0,
                )
            )
        dls = pd.concat(dl_parts, ignore_index=True)
        dls["doc_bucket"] = (dls["doc_id"] % n_buckets).astype("int32")
        for bucket, g in dls.groupby("doc_bucket", sort=False):
            ids = g["doc_id"].to_numpy(dtype=np.int64)
            vals = g["dl"].to_numpy(dtype=np.int64)
            rows.append(
                (
                    "dl",
                    int(bucket),
                    None,
                    ids.tobytes(),
                    vals.tobytes(),
                    None,
                    int(ids.size),
                    0,
                )
            )
        # corpus-stat row: partition doc count + Σdl — corpus_stats_from_
        # packed aggregates these JVM-side, so build() never re-scans the
        # raw documents just to learn n_docs/avgdl
        rows.append(
            ("stat", -1, None, None, None, None, n_rows,
             int(dls["dl"].sum()))
        )
        yield pd.DataFrame(rows, columns=_PACKED_COLS)

    return _pack


def _merge_encode(pdf: pd.DataFrame) -> pd.DataFrame:
    """One (doc_bucket, term) group of packed runs → encoded block rows."""
    bucket = int(pdf["doc_bucket"].iloc[0])
    term = pdf["term"].iloc[0]
    ids = np.concatenate(
        [np.frombuffer(b, dtype=np.int64) for b in pdf["ids_bytes"]]
    )
    tfs = np.concatenate(
        [np.frombuffer(b, dtype=np.int64) for b in pdf["payload_bytes"]]
    )
    dls = np.concatenate(
        [np.frombuffer(b, dtype=np.int64) for b in pdf["dl_run_bytes"]]
    )
    order = np.argsort(ids, kind="stable")  # runs are disjoint → plain sort
    rows = [
        {"doc_bucket": bucket, "term": term, **blk}
        for blk in encode_blocks(ids[order], tfs[order], dls[order])
    ]
    return pd.DataFrame(rows, columns=[f.name for f in BLOCKS_SCHEMA.fields])


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


def doc_stats_from_packed(packed: DataFrame, docs_count: int | None = None) -> DataFrame:
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
                ids = np.frombuffer(row.ids_bytes, dtype=np.int64)
                dls = np.frombuffer(row.payload_bytes, dtype=np.int64)
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
