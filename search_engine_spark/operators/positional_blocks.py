"""Compressed positional posting blocks — the persisted phrase-query path.

operators/positional.py computes the (doc_id, term, pos) relation from the
corpus on every call; that is the right shape for ad-hoc jobs but not for a
serving index. This module is the Lucene design (separate .doc/.prx files):
positions live in their OWN block table beside the tf blocks, so the hot
BM25 path never pays for them, and phrase queries read only the phrase
terms' position blocks (term + doc-range zone maps prune the scan exactly
as in operators/blocks.py).

Layout per (doc_bucket, term), occurrences sorted by (doc_id, pos), split
into blocks of ≤ BLOCK_SIZE occurrences, every payload via the shared
self-describing v-byte/PForDelta codec (operators/codec.py):

  doc_bytes: codec(gaps) — doc ids are NON-strictly increasing (one row per
             occurrence), so within-block gaps may be 0; the block-start
             gap stores doc_ids[0] + 1 (decode: first = gap − 1), matching
             the tf-block convention.
  pos_bytes: codec(deltas) — pos − prev_pos while the doc id repeats
             (sorted ⇒ non-negative), raw pos at each new doc and at the
             block start. Positions restart per document, so deltas stay
             tiny and PFor-pack tightly.
  metadata:  count, first_doc, last_doc (doc-range zone map).

The reference has no positional surface at all (model/Index.java stores
(page, lemma, tf) only); this is part of the Spark-first extension set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import (
    BLOCK_SIZE,
    _encode_column_blocks,
    decode_payload,
    delta_decode,
)
from .blocks import block_rows_frame
from .positional import analyze_phrase, phrase_match

POS_BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("doc_bucket", T.IntegerType(), False),
        T.StructField("term", T.StringType(), False),
        T.StructField("block_id", T.IntegerType(), False),
        T.StructField("count", T.IntegerType(), False),
        T.StructField("first_doc", T.LongType(), False),
        T.StructField("last_doc", T.LongType(), False),
        T.StructField("doc_bytes", T.BinaryType(), False),
        T.StructField("pos_bytes", T.BinaryType(), False),
    ]
)

N_BUCKETS_DEFAULT = 64


def encode_pos_blocks_columns(
    doc_ids: np.ndarray, poss: np.ndarray
) -> dict[str, np.ndarray | list]:
    """One term's occurrences (sorted by doc_id, pos) → encoded blocks,
    columnar. Mirrors codec.encode_blocks_columns for the positional
    payload pair."""
    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    poss = np.asarray(poss, dtype=np.int64)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return {
            "block_id": z, "count": z, "first_doc": z, "last_doc": z,
            "doc_bytes": [], "pos_bytes": [],
        }
    nb = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    starts = np.arange(nb, dtype=np.int64) * BLOCK_SIZE
    ends = np.minimum(starts + BLOCK_SIZE, n)
    counts = ends - starts

    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = np.diff(doc_ids)
    gaps[starts] = doc_ids[starts] + 1

    same_doc = np.zeros(n, dtype=bool)
    same_doc[1:] = doc_ids[1:] == doc_ids[:-1]
    same_doc[starts] = False  # block-start resets, like the doc gap
    deltas = poss.copy()
    deltas[same_doc] = poss[same_doc] - poss[np.flatnonzero(same_doc) - 1]

    return {
        "block_id": np.arange(nb, dtype=np.int64),
        "count": counts,
        "first_doc": doc_ids[starts],
        "last_doc": doc_ids[ends - 1],
        "doc_bytes": _encode_column_blocks(
            gaps.astype(np.uint64), starts, ends, counts
        ),
        "pos_bytes": _encode_column_blocks(
            deltas.astype(np.uint64), starts, ends, counts
        ),
    }


def decode_pos_block(
    doc_bytes: bytes, pos_bytes: bytes, count: int
) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of one encoded block → (doc_ids, positions)."""
    # the shared tf-block gap convention (gap0 = id0 + 1) lives in ONE
    # place — codec.delta_decode — so the two decoders cannot drift
    ids = delta_decode(decode_payload(doc_bytes, count))
    deltas = decode_payload(pos_bytes, count).astype(np.int64)
    # segmented cumsum: position = Σ deltas since the doc's first
    # occurrence in this block (where the raw pos was stored)
    is_reset = np.empty(count, dtype=bool)
    is_reset[0] = True
    is_reset[1:] = ids[1:] != ids[:-1]
    seg = np.maximum.accumulate(
        np.where(is_reset, np.arange(count, dtype=np.int64), -1)
    )
    cs = np.cumsum(deltas)
    poss = cs - np.where(seg > 0, cs[seg - 1], 0)
    return ids, poss


def _encode_group(pdf: pd.DataFrame) -> pd.DataFrame:
    bucket = int(pdf["doc_bucket"].iloc[0])
    term = pdf["term"].iloc[0]
    order = np.lexsort((pdf["pos"].to_numpy(), pdf["doc_id"].to_numpy()))
    ids = pdf["doc_id"].to_numpy(dtype=np.int64)[order]
    poss = pdf["pos"].to_numpy(dtype=np.int64)[order]
    cols = encode_pos_blocks_columns(ids, poss)
    return block_rows_frame(bucket, term, cols, POS_BLOCKS_SCHEMA)


def build_positional_blocks(
    positional: DataFrame, n_buckets: int = N_BUCKETS_DEFAULT
) -> DataFrame:
    """(doc_id, term, pos) → compressed positional blocks. One shuffle,
    keyed (doc_bucket, term) — the bucket salt bounds head-term group
    sizes exactly as in the tf-block build."""
    with_bucket = positional.withColumn(
        "doc_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
    )
    return with_bucket.groupBy("doc_bucket", "term").applyInPandas(
        _encode_group, schema=POS_BLOCKS_SCHEMA
    )


def decode_positional_blocks(blocks: DataFrame) -> DataFrame:
    """Inverse: block rows → (doc_id, term, pos). Vectorized-per-block
    decode inside mapInPandas batches."""
    out_schema = "doc_id long, term string, pos long"

    def _decode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            ids_parts, pos_parts = [], []
            for row in pdf.itertuples(index=False):
                ids, poss = decode_pos_block(
                    row.doc_bytes, row.pos_bytes, row.count
                )
                ids_parts.append(ids)
                pos_parts.append(poss)
            # per-BLOCK repeat, not a per-POSTING Python loop (see
            # blocks.decode_blocks)
            sizes = np.fromiter(
                (a.size for a in ids_parts), dtype=np.int64, count=len(ids_parts)
            )
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(ids_parts),
                    "term": np.repeat(pdf["term"].to_numpy(object), sizes),
                    "pos": np.concatenate(pos_parts),
                }
            )

    cols = ["term", "count", "doc_bytes", "pos_bytes"]
    return blocks.select(*cols).mapInPandas(_decode, schema=out_schema)


def search_phrase_blocks(
    blocks: DataFrame, phrase: str, k: int = 20
) -> DataFrame:
    """Exact-phrase top-k over a positional block table: filter the blocks
    to the phrase's terms FIRST (an isin over a handful of strings — pushed
    into the parquet scan when the table is persisted term-sorted), decode
    only those, then the standard consecutive-position join chain. Same
    output contract as operators/positional.search_phrase."""
    terms = analyze_phrase(phrase)
    spark = blocks.sparkSession
    if not terms:
        return spark.createDataFrame([], "doc_id long, phrase_tf long")
    needed = blocks.filter(F.col("term").isin(list(set(terms))))
    hits = phrase_match(decode_positional_blocks(needed), terms)
    return hits.orderBy(
        F.col("phrase_tf").desc(), F.col("doc_id").asc()
    ).limit(k)


def write_positional_blocks(blocks: DataFrame, path: str) -> None:
    """Persist term-sorted within files so the phrase path's term isin
    prunes row groups via parquet min/max stats."""
    blocks.sortWithinPartitions("term", "doc_bucket", "block_id").write.mode(
        "overwrite"
    ).parquet(path)
