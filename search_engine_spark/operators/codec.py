"""Posting-list codec — delta + varbyte/PForDelta with block-max metadata.

The reference stores one MySQL row per (page, lemma) posting
(model/Index.java). At 10^12-doc scale that layout is untenable; this engine
compresses each term's postings into sorted doc-id-delta blocks with
per-block max-tf metadata (the "zone map" that powers block-max WAND
pruning). All encode/decode is vectorized numpy — no per-element Python in
the hot path; blocks are built inside applyInPandas (operators/blocks.py).

Format (per block of ≤ BLOCK_SIZE postings): each payload column is
self-describing — 1 codec-tag byte followed by the codec's bytes; the
encoder picks whichever codec is smaller for that array:
  doc_bytes: tag + codec(delta(doc_ids)) — doc_ids strictly increasing,
             first delta is doc_ids[0] + 1 (so gap 0 is never produced and
             an all-equal-gaps block still PFor-packs tightly)
  tf_bytes:  tag + codec(tfs)            — raw term frequencies
  metadata:  count, first_doc, last_doc, max_tf, sum_tf

Codecs:
  TAG_VB  (0x00) — little-endian base-128 v-byte, high bit set on all bytes
           except the last (public-domain scheme described in
           Manning/Raghavan/Schütze, "Introduction to IR" §5.3).
  TAG_PFD (0x01) — PForDelta in the NewPFD/OptPFD style (Yan, Ding & Suel,
           WWW'09 "Inverted index compression and query processing with
           optimized document ordering"): pick the bit width b minimizing
           total size, bit-pack every value's low b bits, and store the
           outliers as fixed-width uint16 positions + v-byte high bits.
           Degenerates gracefully: uniform small gaps pack at
           ~b bits/posting vs v-byte's hard 8-bit floor.
  TAG_EF  (0x02) — Elias-Fano over the prefix sums (Vigna, WSDM'13
           "Quasi-succinct indices"): the payload values v are summed to a
           monotone sequence x = cumsum(v); each x_i splits into l low bits
           (bit-packed) and a high part stored as a set bit at position
           (x_i >> l) + i in a bitvector. Size is n·l + n + (u >> l) + 1
           bits ≈ n·(2 + log2(u/n)) — within a constant of the
           information-theoretic bound for a monotone sequence, and unlike
           PFor it is immune to gap skew (one huge gap costs ~its own log,
           not a widened b or an exception for every other value). l is
           chosen by exact size minimization, not the canonical
           floor(log2(u/n)), so the encoder never regresses on edge shapes.

  TAG_RLE (0x03) — run-length container in the Roaring spirit (Lemire et
           al., "Better bitmap performance with Roaring bitmaps", SPE'16:
           Roaring's run container wins exactly when the data is runny),
           adapted from bitmap sets to value arrays: [n_runs:uint16 LE]
           [v-byte of interleaved (run_value, run_length) pairs]. The
           dominant index shapes it targets: tf columns that are a
           constant 1 for hundreds of postings, dl columns of equal-length
           docs, and gap columns of consecutive doc ids (gap ≡ 1 after
           the first) — each collapses to one or two runs where even
           Elias-Fano still pays ~2 bits/posting.

The four codecs compete per payload on EXACT encoded size (PFor via an
estimate re-checked against real bytes); ties keep the earlier tag
(VB < PFD < EF < RLE) so scalar and batched encoders stay byte-identical.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

TAG_VB = 0x00
TAG_PFD = 0x01
TAG_EF = 0x02
TAG_RLE = 0x03

# EF eligibility: prefix sums must not overflow uint64. Payload arrays are
# capped at PFOR_MAX_N (2^16) values; requiring every value < 2^47 bounds
# the sum below 2^63. Gaps/tfs/dls/position-deltas are all far below this.
EF_MAX_WIDTH = 47


def varbyte_encode(values: np.ndarray) -> bytes:
    """Vectorized v-byte encode of a non-negative int64 array."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # number of 7-bit groups per value (at least 1)
    nbytes = np.maximum((_bit_widths(v) + 6) // 7, 1)
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


_SHIFTS: dict[int, np.ndarray] = {}
_POW2F: dict[int, np.ndarray] = {}


def _shifts(b: int) -> np.ndarray:
    s = _SHIFTS.get(b)
    if s is None:
        s = _SHIFTS[b] = np.arange(b - 1, -1, -1, dtype=np.uint64)
    return s


def _pow2f(b: int) -> np.ndarray:
    p = _POW2F.get(b)
    if p is None:
        p = _POW2F[b] = (2.0 ** np.arange(b - 1, -1, -1)).astype(np.float64)
    return p


def _pack_bits(vals: np.ndarray, b: int) -> bytes:
    """Bit-pack the low `b` bits of each value (MSB-first within a value),
    vectorized via np.packbits."""
    if b == 0 or vals.size == 0:
        return b""
    bits = ((vals[:, None] >> _shifts(b)[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_bits(buf: bytes, n: int, b: int) -> np.ndarray:
    if b == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    bits = np.unpackbits(np.frombuffer(buf, dtype=np.uint8), count=n * b)
    bits = bits.reshape(n, b)
    if b <= 52:  # float64 dot is exact below the mantissa width, and ~2× faster
        return (bits.astype(np.float64) @ _pow2f(b)).astype(np.uint64)
    return (bits.astype(np.uint64) << _shifts(b)[None, :]).sum(
        axis=1, dtype=np.uint64
    )


def _pfd_cost(sorted_bits: np.ndarray, n: int) -> tuple[int, int]:
    """(best_b, payload_bytes) for PForDelta over values whose bit widths,
    sorted ascending, are `sorted_bits`. Exceptions cost ~3 bytes each
    (uint16 position + high-bits v-byte) — an estimate used only for width
    selection; the real encoder writes exact bytes. Fully vectorized: one
    searchsorted over the unique widths."""
    cands = np.unique(sorted_bits)
    n_le = np.searchsorted(sorted_bits, cands, side="right")
    costs = (cands * n + 7) // 8 + 3 * (n - n_le)
    i = int(np.argmin(costs))
    return int(cands[i]), int(costs[i])


_POW2 = (np.uint64(1) << np.arange(64, dtype=np.uint64)).astype(np.uint64)


def _bit_widths(v: np.ndarray) -> np.ndarray:
    """Exact bit length per value (0 → 0) — one searchsorted against the
    powers-of-two table; no float rounding concerns."""
    return np.searchsorted(_POW2, v, side="right").astype(np.int64)


PFOR_MAX_N = 0xFFFF  # uint16 count/position fields


def pfor_encode(
    values: np.ndarray,
    b: int | None = None,
    widths: np.ndarray | None = None,
) -> bytes:
    """NewPFD-style encode: [b:uint8][n_exc:uint16 LE][packed low-b bits]
    [exception positions: n_exc × uint16 LE][exception high bits varbyte].
    Fixed-width auxiliary fields keep decode to ONE unpackbits plus (only
    when exceptions exist) one varbyte decode — the per-block auxiliary
    parses were the decode hot spot, not the bit unpacking. Pass `b` to
    reuse a width already chosen by _pfd_cost. Arrays longer than
    PFOR_MAX_N are the caller's responsibility (encode_payload falls back
    to v-byte; block arrays are ≤ BLOCK_SIZE)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if v.size > PFOR_MAX_N:
        raise ValueError(f"pfor_encode supports ≤ {PFOR_MAX_N} values")
    widths = _bit_widths(v) if widths is None else widths
    if b is None:
        b, _ = _pfd_cost(np.sort(widths), v.size)
    exc_mask = widths > b
    exc_pos = np.flatnonzero(exc_mask).astype(np.uint16)
    low = v & ((np.uint64(1) << np.uint64(b)) - np.uint64(1) if b else np.uint64(0))
    high = v[exc_mask] >> np.uint64(b)
    parts = [
        bytes([b]),
        int(exc_pos.size).to_bytes(2, "little"),
        _pack_bits(low, b),
        exc_pos.astype("<u2").tobytes(),
        varbyte_encode(high),
    ]
    return b"".join(parts)


def pfor_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    b = buf[0]
    n_exc = int.from_bytes(buf[1:3], "little")
    i = 3
    packed_len = (b * count + 7) // 8
    low = _unpack_bits(buf[i : i + packed_len], count, b)
    i += packed_len
    if n_exc:
        pos = np.frombuffer(buf[i : i + 2 * n_exc], dtype="<u2").astype(np.int64)
        high = varbyte_decode(buf[i + 2 * n_exc :], n_exc).astype(np.uint64)
        low[pos] |= high << np.uint64(b)
    return low.astype(np.int64)


_EF_LGRID = np.arange(64, dtype=np.uint64)


def _ef_cost(n: int | np.ndarray, u: int | np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(best_l, body_bytes) minimizing exact Elias-Fano size; vectorized over
    blocks when n/u are arrays. body = 1 header byte (l) + ceil(n·l/8) low
    bytes + ceil((n + (u>>l) + 1)/8) high-bitvector bytes. Ties pick the
    smallest l (np.argmin keeps the first minimum) — load-bearing for the
    scalar/batched byte-identity invariant."""
    n_arr = np.atleast_1d(np.asarray(n, dtype=np.uint64))[:, None]
    u_arr = np.atleast_1d(np.asarray(u, dtype=np.uint64))[:, None]
    lg = _EF_LGRID[None, :]
    cost = (
        1
        + (n_arr * lg + np.uint64(7)) // np.uint64(8)
        + (n_arr + (u_arr >> lg) + np.uint64(8)) // np.uint64(8)
    )
    best_l = np.argmin(cost, axis=1)
    return best_l.astype(np.int64), cost[np.arange(best_l.size), best_l].astype(np.int64)


def ef_encode(values: np.ndarray, l: int | None = None) -> bytes:
    """Elias-Fano encode: [l:uint8][packed low l bits][high bitvector].

    Works on the prefix sums of `values`, so any non-negative payload (gaps,
    tfs, position deltas) is admissible — the transform is inverted by diff
    in ef_decode. Callers must enforce EF_MAX_WIDTH so the cumsum cannot
    overflow uint64."""
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return bytes([0])
    x = np.cumsum(v)
    u = int(x[-1])
    if l is None:
        best_l, _ = _ef_cost(n, u)
        l = int(best_l[0])
    if l:
        low = _pack_bits(x & ((np.uint64(1) << np.uint64(l)) - np.uint64(1)), l)
    else:
        low = b""
    hi_pos = (x >> np.uint64(l)) + np.arange(n, dtype=np.uint64)
    bits = np.zeros(n + (u >> l) + 1, dtype=np.uint8)
    bits[hi_pos] = 1
    return bytes([l]) + low + np.packbits(bits).tobytes()


def ef_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    l = buf[0]
    low_nbytes = (count * l + 7) // 8
    low = _unpack_bits(buf[1 : 1 + low_nbytes], count, l)
    hb = np.unpackbits(np.frombuffer(buf[1 + low_nbytes :], dtype=np.uint8))
    idx = np.flatnonzero(hb)[:count].astype(np.uint64)
    high = idx - np.arange(count, dtype=np.uint64)
    x = (high << np.uint64(l)) | low
    out = np.empty(count, dtype=np.int64)
    out[0] = x[0]
    out[1:] = np.diff(x).astype(np.int64)
    return out


def rle_encode(values: np.ndarray) -> bytes:
    """Run-length encode: [n_runs:uint16 LE][v-byte of interleaved
    (run_value, run_length) pairs]. Run count ≤ value count ≤ PFOR_MAX_N,
    so the uint16 header always fits."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if v.size > PFOR_MAX_N:
        raise ValueError(f"rle_encode supports ≤ {PFOR_MAX_N} values")
    chg = np.empty(v.size, dtype=bool)
    chg[0] = True
    chg[1:] = v[1:] != v[:-1]
    starts = np.flatnonzero(chg)
    lens = np.diff(np.append(starts, v.size)).astype(np.uint64)
    inter = np.empty(2 * starts.size, dtype=np.uint64)
    inter[0::2] = v[starts]
    inter[1::2] = lens
    return int(starts.size).to_bytes(2, "little") + varbyte_encode(inter)


def rle_decode(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    n_runs = int.from_bytes(buf[:2], "little")
    inter = varbyte_decode(buf[2:], 2 * n_runs).astype(np.uint64)
    # A corrupt/truncated buffer must fail like the other decoders (which
    # size their output from count), not silently return the wrong length.
    total = int(inter[1::2].sum())
    if total != int(count):
        raise ValueError(
            f"rle_decode: run lengths sum to {total}, expected {count}"
        )
    return np.repeat(
        inter[0::2].astype(np.int64), inter[1::2].astype(np.int64)
    )


def encode_payload(values: np.ndarray) -> bytes:
    """Tag-prefixed payload: v-byte, PForDelta, Elias-Fano, or run-length —
    smallest wins.

    Selection is analytic — exact v-byte size from the bit widths, PFor size
    from the same widths via _pfd_cost's exception estimate — so the common
    case runs exactly one encoder. The estimate can be off when exception
    high bits span multiple v-bytes, so the real PFor bytes are re-checked
    against the v-byte size before being chosen; the ≤ v-byte+1 size
    invariant therefore always holds. EF's cost formula is exact, so it is
    chosen (strictly smaller only — ties keep the earlier codec) without a
    trial encode. RLE runs last under the 2 + 2·n_runs lower bound screen:
    a trial encode happens only when that bound beats the current winner,
    and RLE is kept only on STRICTLY smaller real bytes — the same
    rule/order the batched encoder replays, keeping byte identity."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return bytes([TAG_VB])
    if v.size > PFOR_MAX_N:
        return bytes([TAG_VB]) + varbyte_encode(values)
    widths = _bit_widths(v)
    vb_size = int(np.maximum((widths + 6) // 7, 1).sum())
    b, pfd_est = _pfd_cost(np.sort(widths), v.size)
    ef_l = ef_size = -1
    tag, body, best_size = TAG_VB, None, vb_size
    if int(widths.max()) <= EF_MAX_WIDTH:
        lv, sv = _ef_cost(v.size, int(v.sum()))
        ef_l, ef_size = int(lv[0]), int(sv[0])
        # pfd_est omits PFor's 3 header bytes and underestimates exception
        # bytes, so actual PFor size ≥ pfd_est + 3: EF under that bound (and
        # under v-byte) wins regardless of the trial encode — skip it.
        if 0 <= ef_size < min(vb_size, pfd_est + 3):
            tag, body, best_size = TAG_EF, None, ef_size
    if tag != TAG_EF:
        if pfd_est < vb_size:
            pfd = pfor_encode(values, b=b, widths=widths)
            if len(pfd) < vb_size:
                tag, body, best_size = TAG_PFD, pfd, len(pfd)
        if 0 <= ef_size < best_size:
            tag, body, best_size = TAG_EF, None, ef_size
    n_runs = 1 + int(np.count_nonzero(v[1:] != v[:-1]))
    if 2 + 2 * n_runs < best_size:
        rle = rle_encode(v)
        if len(rle) < best_size:
            return bytes([TAG_RLE]) + rle
    if tag == TAG_EF:
        return bytes([TAG_EF]) + ef_encode(v, l=ef_l)
    if body is None:
        body = varbyte_encode(values)
    return bytes([tag]) + body


def decode_payload(buf: bytes, count: int) -> np.ndarray:
    if count == 0:
        return np.empty(0, dtype=np.int64)
    tag, body = buf[0], buf[1:]
    if tag == TAG_PFD:
        return pfor_decode(body, count)
    if tag == TAG_EF:
        return ef_decode(body, count)
    if tag == TAG_RLE:
        return rle_decode(body, count)
    return varbyte_decode(body, count)


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


def _encode_column_blocks(
    v: np.ndarray, starts: np.ndarray, ends: np.ndarray, counts: np.ndarray
) -> list[bytes]:
    """Tag-prefixed payload per block for one column of a whole posting run,
    byte-identical to ``[encode_payload(v[s:e]) for s, e in zip(starts, ends)]``
    but with all codec selection and most packing batched at run level:

    - bit widths, v-byte sizes, and the PFor width/cost table are computed
      once for the run (one (n_blocks × 65) histogram instead of a sort +
      unique + searchsorted per block),
    - v-byte bytes are emitted by ONE varbyte_encode over the run and sliced
      at block boundaries (v-byte is a per-value concatenation, so slices are
      identical to per-block encodes),
    - full PFor blocks are bit-packed in (k × BLOCK_SIZE) batches grouped by
      chosen width — BLOCK_SIZE·b bits is byte-aligned, so rows of the batch
      are exactly the per-block payloads — and their exception high bits go
      through one grouped varbyte_encode, sliced per block.

    Only partial tail blocks (≤ 1 per run) fall back to the scalar path."""
    nb = int(starts.size)
    widths = _bit_widths(v)
    nbv = np.maximum((widths + 6) // 7, 1)
    val_ends = np.cumsum(nbv)
    vb_all = varbyte_encode(v)
    blk_byte_end = val_ends[ends - 1]
    blk_vb_size = np.add.reduceat(nbv, starts)
    blk_byte_start = blk_byte_end - blk_vb_size

    # Per-block PFor width selection — mirrors _pfd_cost exactly: candidate
    # widths are those present in the block; ties resolve to the smallest.
    blk_idx = np.repeat(np.arange(nb, dtype=np.int64), counts)
    hist = np.zeros((nb, 65), dtype=np.int64)
    np.add.at(hist, (blk_idx, widths), 1)
    n_le = np.cumsum(hist, axis=1)
    cnt = counts[:, None]
    bgrid = np.arange(65, dtype=np.int64)[None, :]
    costs = np.where(
        hist > 0,
        (bgrid * cnt + 7) // 8 + 3 * (cnt - n_le),
        np.iinfo(np.int64).max,
    )
    best_b = np.argmin(costs, axis=1)
    pfd_est = costs[np.arange(nb), best_b]

    out: list[bytes | None] = [None] * nb
    vb_tag = bytes([TAG_VB])

    def vb_slice(i: int) -> bytes:
        return vb_tag + vb_all[blk_byte_start[i] : blk_byte_end[i]]

    # Elias-Fano exact costs up front: blocks where EF beats v-byte AND the
    # pfd_est + 3 lower bound on real PFor size need no PFor trial at all
    # (same short-circuit as encode_payload — outcome-identical, and it
    # avoids bit-packing those blocks twice).
    blk_maxw = np.maximum.reduceat(widths, starts)
    ef_eligible = blk_maxw <= EF_MAX_WIDTH
    ef_l = np.zeros(nb, dtype=np.int64)
    ef_est = np.full(nb, np.iinfo(np.int64).max, dtype=np.int64)
    if ef_eligible.any():
        blk_u = np.add.reduceat(v, starts)
        eidx = np.flatnonzero(ef_eligible)
        ef_l[eidx], ef_est[eidx] = _ef_cost(counts[eidx], blk_u[eidx])
    ef_certain = ef_eligible & (ef_est < np.minimum(blk_vb_size, pfd_est + 3))

    cand = (pfd_est < blk_vb_size) & ~ef_certain
    full = counts == BLOCK_SIZE
    # partial candidate blocks (the run tail): scalar path, same selection
    for i in np.flatnonzero(cand & ~full):
        s, e = int(starts[i]), int(ends[i])
        pfd = pfor_encode(v[s:e], b=int(best_b[i]), widths=widths[s:e])
        out[i] = bytes([TAG_PFD]) + pfd if len(pfd) < blk_vb_size[i] else vb_slice(i)

    batch_sel = cand & full
    col_range = np.arange(BLOCK_SIZE, dtype=np.int64)[None, :]
    for b in np.unique(best_b[batch_sel]):
        b = int(b)
        sel = np.flatnonzero(batch_sel & (best_b == b))
        k = sel.size
        rows = starts[sel][:, None] + col_range
        vals = v[rows]
        if b:
            bits = (
                (vals[:, :, None] >> _shifts(b)[None, None, :]) & np.uint64(1)
            ).astype(np.uint8)
            packed = np.packbits(bits.reshape(k, -1), axis=1)
        else:
            packed = np.zeros((k, 0), dtype=np.uint8)
        exc_mask = widths[rows] > b
        n_exc = exc_mask.sum(axis=1)
        # grouped exception streams: positions come straight from the mask,
        # high bits through one varbyte_encode sliced at per-block boundaries
        exc_rows, exc_cols = np.nonzero(exc_mask)  # row-major == block order
        pos_all = exc_cols.astype("<u2").tobytes()
        highs = vals[exc_rows, exc_cols] >> np.uint64(b)
        high_all = varbyte_encode(highs)
        high_ends = np.cumsum(np.maximum((_bit_widths(highs) + 6) // 7, 1))
        exc_end = np.cumsum(n_exc)
        exc_start = exc_end - n_exc
        head = bytes([b])
        for j in range(k):
            ne = int(n_exc[j])
            if ne:
                lo, hi = int(exc_start[j]), int(exc_end[j])
                hlo = int(high_ends[lo - 1]) if lo else 0
                body = (
                    head
                    + ne.to_bytes(2, "little")
                    + packed[j].tobytes()
                    + pos_all[2 * lo : 2 * hi]
                    + high_all[hlo : int(high_ends[hi - 1])]
                )
            else:
                body = head + b"\x00\x00" + packed[j].tobytes()
            i = int(sel[j])
            out[i] = (
                bytes([TAG_PFD]) + body if len(body) < blk_vb_size[i] else vb_slice(i)
            )

    for i in np.flatnonzero(~cand):
        out[i] = vb_slice(i)

    # Elias-Fano pass — mirrors encode_payload's final step exactly: EF
    # replaces the chosen VB/PFD payload only on STRICTLY smaller exact
    # size, so this post-pass keeps byte identity with the scalar path.
    # Full winning blocks are encoded in (k × BLOCK_SIZE) batches grouped
    # by chosen l (cumsum + bit ops across the whole group, one packbits
    # per group for lows and one for the padded high bitvectors — trailing
    # pad bits are the zeros packbits emits anyway, so slicing each row to
    # its own ceil(nbits/8) bytes reproduces the scalar encoding); only
    # partial tails (≤ 1 per run) fall back to scalar ef_encode.
    if ef_eligible.any():
        idx = np.flatnonzero(ef_eligible)
        cur_size = np.fromiter((len(out[int(i)]) - 1 for i in idx), np.int64)
        win = ef_est[idx] < cur_size
        ef_tag = bytes([TAG_EF])
        for i in idx[win & (counts[idx] != BLOCK_SIZE)]:
            i = int(i)
            out[i] = ef_tag + ef_encode(v[starts[i] : ends[i]], l=int(ef_l[i]))
        batch = idx[win & (counts[idx] == BLOCK_SIZE)]
        batch_l = ef_l[batch]
        pos128 = np.arange(BLOCK_SIZE, dtype=np.uint64)[None, :]
        for l in np.unique(batch_l):
            l = int(l)
            sel = batch[batch_l == l]
            k = sel.size
            x = np.cumsum(v[starts[sel][:, None] + col_range], axis=1)
            if l:
                mask = (np.uint64(1) << np.uint64(l)) - np.uint64(1)
                bits = (
                    ((x & mask)[:, :, None] >> _shifts(l)[None, None, :])
                    & np.uint64(1)
                ).astype(np.uint8)
                lows = np.packbits(bits.reshape(k, -1), axis=1)
            else:
                lows = np.zeros((k, 0), dtype=np.uint8)
            hi_pos = (x >> np.uint64(l)) + pos128
            u = x[:, -1]
            nbytes = (BLOCK_SIZE + (u >> np.uint64(l)) + np.uint64(8)) // np.uint64(8)
            mat = np.zeros((k, int(nbytes.max()) * 8), dtype=np.uint8)
            mat[np.arange(k)[:, None], hi_pos] = 1
            highs = np.packbits(mat, axis=1)
            head = ef_tag + bytes([l])
            for j in range(k):
                out[int(sel[j])] = (
                    head + lows[j].tobytes() + highs[j, : int(nbytes[j])].tobytes()
                )

    # RLE pass — mirrors encode_payload's final step exactly: candidate
    # blocks under the 2 + 2·n_runs lower-bound screen get a trial encode,
    # kept only on STRICTLY smaller real bytes than the VB/PFD/EF winner.
    # Run counts come from one global change mask (runs restart at block
    # boundaries by construction of the per-block count); winners are rare
    # and cheap (few runs), so the trial itself stays scalar.
    chg = np.empty(v.size, dtype=np.int64)
    chg[0] = 0
    chg[1:] = (v[1:] != v[:-1]).astype(np.int64)
    ccum = np.concatenate(([0], np.cumsum(chg)))
    n_runs = 1 + (ccum[ends] - ccum[starts + 1])
    cur_size = np.fromiter((len(x) - 1 for x in out), np.int64, nb)
    for i in np.flatnonzero(2 + 2 * n_runs < cur_size):
        i = int(i)
        rle = rle_encode(v[starts[i] : ends[i]])
        if len(rle) < cur_size[i]:
            out[i] = bytes([TAG_RLE]) + rle
    return out  # type: ignore[return-value]


def encode_blocks_columns(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> dict[str, np.ndarray | list]:
    """Split one term's sorted postings into encoded blocks — COLUMNAR.

    ``dls`` is the document length (Σ tf over the doc's retained terms)
    aligned with doc_ids — stored per posting so BM25 scoring reads norms
    straight out of the block (the Lucene norms-in-index design) and the
    query path never ships a separate (doc_id, dl) table per query.

    Returns {block_id, count, first_doc, last_doc, max_tf, sum_tf, min_dl:
    int arrays; doc_bytes, tf_bytes, dl_bytes: lists of bytes} — ready to
    drop into a DataFrame column-wise (one array per column instead of one
    dict per block; the dict-rows construction was a measured hot spot in
    the merge stage at 434k blocks). Encoding is batched across the run's
    blocks (_encode_column_blocks) — byte-identical to per-block
    encode_payload."""
    n = len(doc_ids)
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.asarray(dls, dtype=np.int64)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return {
            "block_id": z, "count": z, "first_doc": z, "last_doc": z,
            "max_tf": z, "sum_tf": z, "min_dl": z,
            "doc_bytes": [], "tf_bytes": [], "dl_bytes": [],
        }
    nb = (n + BLOCK_SIZE - 1) // BLOCK_SIZE
    starts = np.arange(nb, dtype=np.int64) * BLOCK_SIZE
    ends = np.minimum(starts + BLOCK_SIZE, n)
    counts = ends - starts
    # per-block delta with the reset-at-block-start convention of delta_encode
    gaps = np.empty(n, dtype=np.int64)
    gaps[1:] = np.diff(doc_ids)
    gaps[starts] = doc_ids[starts] + 1
    return {
        "block_id": np.arange(nb, dtype=np.int64),
        "count": counts,
        "first_doc": doc_ids[starts],
        "last_doc": doc_ids[ends - 1],
        "max_tf": np.maximum.reduceat(tfs, starts),
        # sum_tf lets term_dict (df=Σcount, cf=Σsum_tf) re-derive from
        # stored blocks alone — no raw-corpus re-read on resume/incremental
        "sum_tf": np.add.reduceat(tfs, starts),
        # min_dl tightens the block-max BM25 upper bound (score is
        # decreasing in dl, so f(max_tf, min_dl) dominates the block)
        "min_dl": np.minimum.reduceat(dls, starts),
        "doc_bytes": _encode_column_blocks(
            gaps.astype(np.uint64), starts, ends, counts
        ),
        "tf_bytes": _encode_column_blocks(
            tfs.astype(np.uint64), starts, ends, counts
        ),
        "dl_bytes": _encode_column_blocks(
            dls.astype(np.uint64), starts, ends, counts
        ),
    }


def encode_blocks(
    doc_ids: np.ndarray, tfs: np.ndarray, dls: np.ndarray
) -> list[dict]:
    """Row-wise view of encode_blocks_columns. No production path calls
    this — every builder (bulk, incremental, segment merge) uses the
    columnar form; it exists for test ergonomics (tests/test_codec.py
    asserts per-block dict invariants)."""
    cols = encode_blocks_columns(doc_ids, tfs, dls)
    nb = len(cols["doc_bytes"])
    return [
        {
            "block_id": int(cols["block_id"][b]),
            "count": int(cols["count"][b]),
            "first_doc": int(cols["first_doc"][b]),
            "last_doc": int(cols["last_doc"][b]),
            "max_tf": int(cols["max_tf"][b]),
            "sum_tf": int(cols["sum_tf"][b]),
            "min_dl": int(cols["min_dl"][b]),
            "doc_bytes": cols["doc_bytes"][b],
            "tf_bytes": cols["tf_bytes"][b],
            "dl_bytes": cols["dl_bytes"][b],
        }
        for b in range(nb)
    ]


def decode_block(doc_bytes: bytes, tf_bytes: bytes, count: int) -> tuple[np.ndarray, np.ndarray]:
    ids = delta_decode(decode_payload(doc_bytes, count))
    tfs = decode_payload(tf_bytes, count)
    return ids, tfs
