"""Posting-list codec — delta + varbyte with block-max metadata.

The reference stores one MySQL row per (page, lemma) posting
(model/Index.java). At 10^12-doc scale that layout is untenable; this engine
compresses each term's postings into sorted doc-id-delta varbyte blocks with
per-block max-tf metadata (the "zone map" that powers block-max WAND
pruning). All encode/decode is vectorized numpy — no per-element Python in
the hot path; blocks are built inside applyInPandas (operators/blocks.py).

Format (per block of ≤ BLOCK_SIZE postings):
  doc_bytes: varbyte(delta(doc_ids))  — doc_ids strictly increasing,
             first delta is doc_ids[0] - prev_block_last (or +1 offset from
             -1 baseline for the first block, i.e. doc_ids[0] + 1)
  tf_bytes:  varbyte(tfs)             — raw term frequencies
  metadata:  count, first_doc, last_doc, max_tf

Varbyte: little-endian base-128, high bit set on all bytes except the last
(classic v-byte; public-domain scheme described in Manning/Raghavan/Schütze,
"Introduction to Information Retrieval" §5.3).
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized v-byte encode of a non-negative int64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    while True:
        mask = tmp > 0
        if not mask.any():
            break
        nbits[mask] += 1
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    total = int(nbytes.sum())
    out = np.empty(total, dtype=np.uint8)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    # fill byte-position k of every value that has ≥ k+1 bytes
    max_len = int(nbytes.max())
    shifted = v.copy()
    for k in range(max_len):
        sel = nbytes > k
        pos = starts[sel] + k
        byte = (shifted[sel] & np.uint64(0x7F)).astype(np.uint8)
        is_last = (k == (nbytes[sel] - 1))
        out[pos] = np.where(is_last, byte, byte | np.uint8(0x80))
        shifted[sel] >>= np.uint64(7)
    return out.tobytes()


def varbyte_decode(buf: bytes, count: int) -> np.ndarray:
    """Vectorized v-byte decode of `count` values."""
    if count == 0:
        return np.empty(0, dtype=np.int64)
    b = np.frombuffer(buf, dtype=np.uint8)
    is_last = (b & 0x80) == 0
    # value index for each byte: cumulative count of terminators before it
    val_idx = np.zeros(b.size, dtype=np.int64)
    val_idx[1:] = np.cumsum(is_last)[:-1]
    # byte position within its value
    starts = np.zeros(count, dtype=np.int64)
    ends = np.flatnonzero(is_last)
    starts[1:] = ends[:-1] + 1
    byte_pos = np.arange(b.size, dtype=np.int64) - starts[val_idx]
    out = np.zeros(count, dtype=np.uint64)
    np.add.at(
        out,
        val_idx,
        (b & np.uint64(0x7F)).astype(np.uint64) << (np.uint64(7) * byte_pos.astype(np.uint64)),
    )
    return out.astype(np.int64)


def delta_encode(doc_ids: np.ndarray) -> np.ndarray:
    """Strictly-increasing ids → gaps (first gap = id[0] + 1 so 0 is legal)."""
    d = np.asarray(doc_ids, dtype=np.int64)
    out = np.empty_like(d)
    out[0] = d[0] + 1
    out[1:] = np.diff(d)
    return out


def delta_decode(gaps: np.ndarray) -> np.ndarray:
    g = np.asarray(gaps, dtype=np.int64).copy()
    g[0] -= 1
    return np.cumsum(g)


def encode_blocks(doc_ids: np.ndarray, tfs: np.ndarray) -> list[dict]:
    """Split one term's sorted postings into encoded blocks.

    Returns a list of dicts: {block_id, count, first_doc, last_doc, max_tf,
    doc_bytes, tf_bytes}."""
    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    blocks = []
    for b, lo in enumerate(range(0, n, BLOCK_SIZE)):
        hi = min(lo + BLOCK_SIZE, n)
        ids = doc_ids[lo:hi]
        t = tfs[lo:hi]
        blocks.append(
            {
                "block_id": b,
                "count": int(hi - lo),
                "first_doc": int(ids[0]),
                "last_doc": int(ids[-1]),
                "max_tf": int(t.max()),
                # sum_tf lets term_dict (df=Σcount, cf=Σsum_tf) re-derive
                # from stored blocks alone — no raw-corpus re-read on
                # resume/incremental paths
                "sum_tf": int(t.sum()),
                "doc_bytes": varbyte_encode(delta_encode(ids)),
                "tf_bytes": varbyte_encode(t),
            }
        )
    return blocks


def decode_block(doc_bytes: bytes, tf_bytes: bytes, count: int) -> tuple[np.ndarray, np.ndarray]:
    ids = delta_decode(varbyte_decode(doc_bytes, count))
    tfs = varbyte_decode(tf_bytes, count)
    return ids, tfs
