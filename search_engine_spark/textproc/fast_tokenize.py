"""Vectorized tokenize+count core shared by the Arrow build stages.

Same five analyzer rules as textproc/tokenize.py (the pinned reference
implementation — lowercase, whitespace split, boundary strip, letter-word
filter, stopword drop, lemma map), restructured for throughput:

  * the SPLIT runs in Arrow C++ (``pc.split_pattern_regex`` — WS_SPLIT is
    a class of literal characters, so RE2 and Python ``re`` agree by
    construction; see tokenize.WS_CHARS),
  * boundary strip / word filter / stopwords / lemma lookup run under
    Python ``re`` semantics but over the batch's UNIQUE tokens only
    (``dictionary_encode``): per-token work collapses to a ``take`` on
    the unique-level results (web text repeats tokens heavily — the
    unique set is orders of magnitude smaller than the token stream),
  * the per-document term-frequency aggregation groups on integer codes
    (lexsort + run-length) instead of hashing strings.

Byte-identical to the pandas-per-token formulation it replaced — pinned
by tests/test_textproc.py parity tests, the postings oracle pair, and the
fused-build equivalence tests.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .lemmas import FULL_LEMMA_MAP
from .ruletier import rule_series
from .stopwords import STOPWORDS
from .tokenize import BOUNDARY_STRIP, WORD_PATTERN, WS_SPLIT

_STRIP_RE = re.compile(BOUNDARY_STRIP)

_EMPTY = pd.DataFrame(
    {
        "doc_id": np.empty(0, dtype=np.int64),
        "term": np.empty(0, dtype=object),
        "tf": np.empty(0, dtype=np.int64),
        "dl": np.empty(0, dtype=np.int64),
    }
)


_EMPTY_ARRAYS = (
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=np.int64),
    np.empty(0, dtype=object),
)


def _analyze_stream(
    pdf: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Shared analyzer core: one batch of (doc_id, text) → the RETAINED
    token stream ``(doc_id, lemma_code, vocab)`` in original text order
    (doc-major — each document's tokens are one contiguous run). All five
    analyzer rules applied; ``vocab[lemma_code]`` is the lemma string."""
    s = pdf["text"].astype("string").fillna("").str.lower().str.strip()
    arr = pa.Array.from_pandas(s)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    tok_lists = pc.split_pattern_regex(arr, WS_SPLIT)
    flat = pc.list_flatten(tok_lists)
    if len(flat) == 0:
        return _EMPTY_ARRAYS[0], _EMPTY_ARRAYS[1], _EMPTY_ARRAYS[4]
    parent = pc.list_parent_indices(tok_lists).to_numpy(zero_copy_only=False)
    denc = flat.dictionary_encode()
    codes = denc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    uniq = denc.dictionary.to_pandas().astype("string")

    # analyzer rules 3-5 on the unique tokens only (Python-re semantics)
    uq = uniq.str.replace(_STRIP_RE, "", regex=True)
    keep_u = (
        uq.str.fullmatch(WORD_PATTERN, na=False)
        & ~uq.isin(STOPWORDS)
        & (uq != "")
    ).to_numpy()
    lem_u = uq.map(FULL_LEMMA_MAP)
    _miss = lem_u.isna()
    if _miss.any():
        # rule tier on the UNIQUE-token miss slice only (cheap: the
        # dictionary-encode above already deduplicated the batch)
        lem_u[_miss] = rule_series(uq[_miss])
    lcode_u, lem_vocab = pd.factorize(lem_u.to_numpy(dtype=object))

    keep = keep_u[codes]
    lcode = lcode_u[codes][keep]
    doc = pdf["doc_id"].to_numpy(dtype=np.int64)[parent[keep]]
    return doc, lcode.astype(np.int64), np.asarray(lem_vocab, dtype=object)


def tokenize_positions_arrays(
    pdf: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One batch of (doc_id, text) → the positional token stream
    ``(doc_id, lemma_code, pos, vocab)``: one row per RETAINED token in
    original text order, ``pos`` = the token's 0-based index within its
    document's retained-token stream (rules 3-5 applied BEFORE numbering,
    so stopwords/rejected tokens do not occupy positions — the standard
    stopword-removal phrase semantics: "fast a table" matches the phrase
    query "fast table")."""
    doc, lcode, vocab = _analyze_stream(pdf)
    if doc.size == 0:
        return _EMPTY_ARRAYS[0], _EMPTY_ARRAYS[1], _EMPTY_ARRAYS[2], vocab
    # stream is doc-major: pos = index − start-of-run (one run per doc)
    run_start = np.empty(doc.size, dtype=bool)
    run_start[0] = True
    run_start[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(run_start)
    run_lens = np.diff(np.append(starts, doc.size))
    pos = np.arange(doc.size, dtype=np.int64) - np.repeat(starts, run_lens)
    return doc, lcode, pos, vocab


def tokenize_tf_arrays(
    pdf: pd.DataFrame,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """One batch of (doc_id, text) → columnar postings
    ``(doc_id, lemma_code, tf, dl, vocab)`` where ``vocab[lemma_code]`` is
    the lemma string. Rows are doc-major (sorted by doc_id, then code).

    The integer-code form is the pack stage's native currency — it groups
    and sorts on int64 keys without ever materializing the term strings
    per posting (the object-dtype column was the single largest cost in
    the pack profile, bigger than tokenization itself)."""
    doc, lcode, lem_vocab = _analyze_stream(pdf)
    if doc.size == 0:
        return _EMPTY_ARRAYS

    # integer-key tf aggregation: lexsort + run-length
    order = np.lexsort((lcode, doc))
    d, c = doc[order], lcode[order]
    new = np.empty(d.size, dtype=bool)
    new[0] = True
    new[1:] = (d[1:] != d[:-1]) | (c[1:] != c[:-1])
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, d.size)).astype(np.int64)
    d_g, c_g = d[starts], c[starts]
    # dl = Σtf over each doc's postings (runs of equal doc_id in d_g)
    doc_new = np.empty(d_g.size, dtype=bool)
    doc_new[0] = True
    doc_new[1:] = d_g[1:] != d_g[:-1]
    doc_starts = np.flatnonzero(doc_new)
    dl_per_doc = np.add.reduceat(tf, doc_starts)
    run_lens = np.diff(np.append(doc_starts, d_g.size))
    dl = np.repeat(dl_per_doc, run_lens)
    return d_g, c_g, tf, dl, lem_vocab


def tokenize_tf(pdf: pd.DataFrame, with_dl: bool = False) -> pd.DataFrame:
    """One batch of (doc_id, text) → (doc_id, term, tf[, dl]) rows.

    A document's tokens live entirely in its own row, so tf (and dl = Σtf
    over the doc) are FINAL within the batch — no shuffle needed to form
    postings. Rows come back sorted by (doc_id, term-code); order is not
    part of the contract. Thin DataFrame wrapper over
    ``tokenize_tf_arrays`` (the integer-code core)."""
    cols = ["doc_id", "term", "tf"] + (["dl"] if with_dl else [])
    d, c, tf, dl, vocab = tokenize_tf_arrays(pdf)
    if d.size == 0:
        return _EMPTY[cols].copy()
    out = {"doc_id": d, "term": vocab[c], "tf": tf}
    if with_dl:
        out["dl"] = dl
    return pd.DataFrame(out)
