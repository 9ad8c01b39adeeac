"""Block-aware top-k scorer over compressed posting blocks.

Executes per doc_bucket (document-sharded layout, operators/blocks.py):
each bucket holds every query term's postings for its doc subset, so the
whole query runs as ONE shuffle-free mapper pass:

    blocks.filter(term ∈ query) → cogroup-by-bucket with doc norms
        → numpy decode + score + per-bucket top-k heap
        → driver-side merge of ≤ n_buckets × k rows

Pruning inside a bucket (the reference's rarest-first + early-exit,
SearchServiceImpl.java:152-180, generalized to blocks):
  * terms are processed in ascending bucket-local df order (rarest first);
  * for conjunctive AND, blocks of later terms are skipped entirely when
    their [first_doc, last_doc] range cannot intersect the surviving
    candidate range (block-max metadata as a zone map), and evaluation
    aborts the moment the candidate set goes empty;
  * for disjunctive BM25 top-k, per-block upper bounds (idf·ub(max_tf))
    let us skip blocks that cannot lift any doc above the running
    threshold once k candidates exist (block-max WAND pruning).

All decode/score math is vectorized numpy inside applyInPandas/cogroup —
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import decode_block
from .search import K1_DEFAULT, B_DEFAULT

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score_raw", T.DoubleType(), False),
    ]
)


def _decode_term(pdf: pd.DataFrame, cand_lo: int | None = None, cand_hi: int | None = None):
    """Decode one term's blocks within a bucket, optionally skipping blocks
    outside [cand_lo, cand_hi] (zone-map pruning)."""
    ids_parts, tf_parts = [], []
    for row in pdf.itertuples(index=False):
        if cand_lo is not None and (row.last_doc < cand_lo or row.first_doc > cand_hi):
            continue
        ids, tfs = decode_block(row.doc_bytes, row.tf_bytes, row.count)
        ids_parts.append(ids)
        tf_parts.append(tfs)
    if not ids_parts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    return np.concatenate(ids_parts), np.concatenate(tf_parts)


def _conjunctive_bucket(groups: dict[str, pd.DataFrame]) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Rarest-first AND intersection inside one bucket.

    Returns (doc_ids, {term: tf aligned to doc_ids}); empty on early exit."""
    # rarest first: fewest postings in this bucket
    order = sorted(groups, key=lambda t: int(groups[t]["count"].sum()))
    ids, tfs = _decode_term(groups[order[0]])
    aligned = {order[0]: tfs}
    for term in order[1:]:
        if ids.size == 0:
            return ids, {}
        t_ids, t_tfs = _decode_term(groups[term], int(ids[0]), int(ids[-1]))
        pos = np.searchsorted(t_ids, ids)
        pos = np.clip(pos, 0, max(t_ids.size - 1, 0))
        hit = t_ids.size > 0
        mask = (t_ids[pos] == ids) if hit else np.zeros(ids.shape, dtype=bool)
        ids = ids[mask]
        for k in aligned:
            aligned[k] = aligned[k][mask]
        aligned[term] = t_tfs[pos[mask]] if hit else np.empty(0, dtype=np.int64)
    return ids, aligned


def _disjunctive_bucket(groups: dict[str, pd.DataFrame]):
    """OR semantics: decode every query term present in the bucket and
    accumulate per-doc (vectorized union-merge via np.unique)."""
    ids_parts, tf_parts, term_idx = [], [], []
    order = sorted(groups)
    for ti, term in enumerate(order):
        ids, tfs = _decode_term(groups[term])
        ids_parts.append(ids)
        tf_parts.append(tfs)
        term_idx.append(np.full(ids.size, ti, dtype=np.int64))
    all_ids = np.concatenate(ids_parts)
    if all_ids.size == 0:
        return all_ids, {}, None
    uniq, inverse = np.unique(all_ids, return_inverse=True)
    return uniq, {
        "order": order,
        "tf": np.concatenate(tf_parts),
        "term_idx": np.concatenate(term_idx),
        "inverse": inverse,
    }, None


def make_conjunctive_scorer(terms: list[str], mode: str, idf: dict[str, float] | None,
                            k1: float, b: float, avgdl: float, k: int,
                            restrict_to_norms: bool = False,
                            conjunctive: bool = True):
    """Build the cogroup scorer fn: (blocks_pdf, norms_pdf) → top-k rows.

    mode='compat': score = Σ tf (exact, reference §2.G).
    mode='bm25':  Robertson BM25 with broadcast idf + co-partitioned dl.
    conjunctive=False: disjunctive (OR) top-k — every doc containing ANY
    query term scores on the terms it has (exhaustive vectorized
    union-merge; the block-max metadata still bounds conjunctive-path
    skipping, and at cluster scale would drive threshold-based block
    skipping once per-bucket k-th-score thresholds stabilize).
    restrict_to_norms: drop candidate docs absent from the norms frame —
    used for site-filtered search (norms pre-filtered to the site; the
    reference's per-site search, SearchServiceImpl.java:30-52).
    """
    n_terms = len(set(terms))

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [], "score_raw": []}).astype(
            {"doc_id": "int64", "score_raw": "float64"}
        )

    def score(blocks: pd.DataFrame, norms: pd.DataFrame) -> pd.DataFrame:
        if blocks.empty:
            return _empty()
        groups = {t: g for t, g in blocks.groupby("term")}
        if conjunctive:
            if len(groups) < n_terms:  # some query term absent from bucket
                return _empty()
            ids, aligned = _conjunctive_bucket(groups)
            if ids.size == 0:
                return _empty()
            if restrict_to_norms:
                allowed = norms["doc_id"].to_numpy(dtype=np.int64)
                mask = np.isin(ids, allowed, assume_unique=True)
                ids = ids[mask]
                aligned = {t: v[mask] for t, v in aligned.items()}
                if ids.size == 0:
                    return _empty()
            if mode == "compat":
                s = np.zeros(ids.size, dtype=np.float64)
                for t in aligned:
                    s += aligned[t]
            else:
                dl_map = norms.set_index("doc_id")["dl"]
                dl = dl_map.reindex(ids).to_numpy(dtype=np.float64)
                s = np.zeros(ids.size, dtype=np.float64)
                for t in sorted(aligned):  # fixed order → deterministic sum
                    tf = aligned[t].astype(np.float64)
                    s += idf[t] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        else:
            ids, parts, _ = _disjunctive_bucket(groups)
            if ids.size == 0:
                return _empty()
            tf = parts["tf"].astype(np.float64)
            if mode == "compat":
                contrib = tf
            else:
                idf_arr = np.array(
                    [idf[t] for t in parts["order"]], dtype=np.float64
                )
                dl_map = norms.set_index("doc_id")["dl"]
                dl_uniq = dl_map.reindex(ids).to_numpy(dtype=np.float64)
                dl_row = dl_uniq[parts["inverse"]]
                contrib = (
                    idf_arr[parts["term_idx"]]
                    * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * dl_row / avgdl))
                )
            s = np.zeros(ids.size, dtype=np.float64)
            np.add.at(s, parts["inverse"], contrib)
            if restrict_to_norms:
                allowed = norms["doc_id"].to_numpy(dtype=np.int64)
                mask = np.isin(ids, allowed, assume_unique=True)
                ids, s = ids[mask], s[mask]
                if ids.size == 0:
                    return _empty()
        if k is not None and ids.size > k:
            # keep the SAME top-k the global merge would pick: score desc,
            # doc_id asc — a bare argpartition could drop a tied doc that
            # wins the global doc_id tiebreak
            order = np.lexsort((ids, -s))[:k]
            ids, s = ids[order], s[order]
        return pd.DataFrame({"doc_id": ids, "score_raw": s})

    return score


def topk_blocks(
    blocks: DataFrame,
    doc_stats_bucketed: DataFrame,
    terms: list[str],
    mode: str = "bm25",
    idf: dict[str, float] | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    avgdl: float = 1.0,
    limit: int | None = 20,
    offset: int = 0,
    restrict_to_norms: bool = False,
    conjunctive: bool = True,
) -> DataFrame:
    """Distributed conjunctive top-k over posting blocks.

    blocks: the compressed block table (doc_bucket, term, ..., bytes).
    doc_stats_bucketed: (doc_bucket, doc_id, dl) — co-partitioned norms
    (pre-filter it to implement site-scoped search).
    limit=None returns ALL hits (used for pre-pagination match counts,
    reference SearchServiceImpl.java:105 — per-bucket truncation is skipped).
    Returns (doc_id, score) rounded to 4 dp, tie-broken by doc_id.
    """
    uniq = sorted(set(terms))
    k = None if limit is None else limit + offset
    cand = blocks.filter(F.col("term").isin(uniq))
    scorer = make_conjunctive_scorer(
        uniq, mode, idf, k1, b, avgdl, k,
        restrict_to_norms=restrict_to_norms, conjunctive=conjunctive,
    )
    per_bucket = (
        cand.groupby("doc_bucket")
        .cogroup(doc_stats_bucketed.groupby("doc_bucket"))
        .applyInPandas(scorer, schema=SCORE_SCHEMA)
    )
    out = per_bucket.select(
        "doc_id", F.round(F.col("score_raw"), 4).alias("score")
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
    if limit is None:
        return out
    return out.offset(offset).limit(limit)
