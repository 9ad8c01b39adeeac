"""Block-aware top-k scorer over compressed posting blocks.

Executes per doc_bucket (document-sharded layout, operators/blocks.py):
each bucket holds every query term's postings for its doc subset, so the
whole query runs as ONE shuffle-free mapper pass:

    blocks.filter(term ∈ query) → groupBy-bucket
        → numpy decode + score + per-bucket top-k heap
        → driver-side merge of ≤ n_buckets × k rows

BM25 norms (per-posting dl) are stored inside the blocks (codec.py,
Lucene's norms-in-index design), so the only bytes a query moves are the
query terms' own posting blocks. Site-filtered search additionally
cogroups the site's doc_ids (pre-filtered norms — proportional to the
site, not the corpus).

Pruning inside a bucket (the reference's rarest-first + early-exit,
SearchServiceImpl.java:152-180, generalized to blocks):
  * conjunctive AND: terms process in ascending bucket-local count order
    (rarest first); later terms decode ONLY blocks whose doc range holds a
    surviving candidate (per-block check, block-max metadata as a zone
    map), and evaluation aborts the moment the candidate set goes empty.
    Score-threshold pruning is deliberately NOT applied mid-intersection:
    candidates can still fail later terms, so no valid k-th-score bound
    exists before the AND completes.
  * disjunctive top-k: MaxScore with block-max skipping
    (_maxscore_or_bucket) — terms process in descending whole-term upper
    bound (idf·ub(max_tf) from metadata); once k docs are scored, lists
    whose remaining-UB sum cannot reach the running k-th score switch to
    update-only mode (decoding only candidate-bearing blocks), and
    candidates whose optimistic bound falls below it are dropped. Exact:
    results equal the exhaustive union-merge (oracle-pinned), with
    EPS_PRUNE guarding 4-dp round-ties.

All decode/score math is vectorized numpy inside applyInPandas/cogroup —
no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codec import decode_block, decode_payload
from .search import K1_DEFAULT, B_DEFAULT

SCORE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("score_raw", T.DoubleType(), False),
    ]
)


# Pruning slack: the output rounds scores to 4 dp, so two docs within
# 5e-5 can round EQUAL and the doc_id tiebreak decides between them. A
# doc may therefore only be pruned when its upper bound is below the
# threshold by MORE than the rounding granularity — otherwise pruning
# could drop a doc that would have round-tied the k-th and won the
# tiebreak. 1e-4 > 5e-5 keeps every potential round-tie alive.
EPS_PRUNE = 1e-4


def _decode_term(
    pdf: pd.DataFrame,
    cand: np.ndarray | None = None,
    stats: dict | None = None,
):
    """Decode one term's blocks within a bucket → (doc_ids, tfs, dls).
    dls are the per-posting document lengths stored in the block
    (norms-in-index — no separate norms table at query time). With ``cand``
    (sorted candidate doc_ids), blocks whose [first_doc, last_doc] range
    contains NO candidate are skipped without decoding (block-max metadata
    as a zone map — exact, because a skipped block cannot contain any doc
    we still care about). ``stats`` counts decoded vs total blocks.

    Every downstream consumer binary-searches the returned doc_ids
    (np.searchsorted), so they MUST come back sorted. Block rows arrive in
    shuffle/scan order — pandas groupby preserves it, and nothing upstream
    promises block order once a bucket's parquet spans multiple splits or
    a segment union interleaves doc-id ranges — so sort by first_doc here,
    and repair the rare cross-block overlap (segment unions) after the
    concat. Cost: a few rows per (bucket, term); the decode dominates."""
    pdf = pdf.sort_values("first_doc")
    ids_parts, tf_parts, dl_parts = [], [], []
    for row in pdf.itertuples(index=False):
        if stats is not None:
            stats["blocks_total"] += 1
        if cand is not None:
            if cand.size == 0:
                continue
            lo = int(np.searchsorted(cand, row.first_doc, side="left"))
            if lo >= cand.size or cand[lo] > row.last_doc:
                continue  # no candidate falls inside this block's range
        if stats is not None:
            stats["blocks_decoded"] += 1
        ids, tfs = decode_block(row.doc_bytes, row.tf_bytes, row.count)
        ids_parts.append(ids)
        tf_parts.append(tfs)
        dl_parts.append(decode_payload(row.dl_bytes, row.count))
    if not ids_parts:
        z = np.empty(0, dtype=np.int64)
        return z, z, z
    ids = np.concatenate(ids_parts)
    tfs = np.concatenate(tf_parts)
    dls = np.concatenate(dl_parts)
    if ids.size > 1 and np.any(np.diff(ids) <= 0):
        # blocks' doc ranges overlapped (segment-union path): fall back to
        # a full stable sort so searchsorted stays correct
        o = np.argsort(ids, kind="stable")
        ids, tfs, dls = ids[o], tfs[o], dls[o]
    return ids, tfs, dls


def _conjunctive_bucket(
    groups: dict[str, pd.DataFrame], stats: dict | None = None
) -> tuple[np.ndarray, dict[str, np.ndarray]]:
    """Rarest-first AND intersection inside one bucket.

    The reference's rarest-first ordering + early exit
    (SearchServiceImpl.java:152-180), generalized to blocks: later terms
    decode ONLY blocks whose doc range contains a surviving candidate
    (per-block check against the candidate array, not just the global
    [lo, hi] envelope). Score-threshold pruning does NOT apply mid-AND:
    a candidate may still fail a later term, so no valid k-th-score lower
    bound exists before the intersection completes — decode-what-
    intersects is the sound prune here.

    Returns (doc_ids, {term: tf aligned to doc_ids}, dl aligned to doc_ids);
    empty on early exit. dl comes from the first term's decoded postings
    (dl is a document attribute — identical in every term's payload) and is
    masked along with the candidate set."""
    # rarest first: fewest postings in this bucket
    order = sorted(groups, key=lambda t: int(groups[t]["count"].sum()))
    ids, tfs, dls = _decode_term(groups[order[0]], stats=stats)
    aligned = {order[0]: tfs}
    for term in order[1:]:
        if ids.size == 0:
            return ids, {}, dls
        t_ids, t_tfs, _ = _decode_term(groups[term], cand=ids, stats=stats)
        pos = np.searchsorted(t_ids, ids)
        pos = np.clip(pos, 0, max(t_ids.size - 1, 0))
        hit = t_ids.size > 0
        mask = (t_ids[pos] == ids) if hit else np.zeros(ids.shape, dtype=bool)
        ids = ids[mask]
        dls = dls[mask]
        for k in aligned:
            aligned[k] = aligned[k][mask]
        aligned[term] = t_tfs[pos[mask]] if hit else np.empty(0, dtype=np.int64)
    return ids, aligned, dls


def _term_ub(
    pdf: pd.DataFrame, mode: str, idf_t: float, k1: float, b: float, avgdl: float
) -> float:
    """Whole-term score upper bound from block-max metadata (no decode):
    compat = max_tf; bm25 = max over blocks of idf·f(max_tf, min_dl) — the
    BM25 contribution is increasing in tf and decreasing in dl, so each
    block's (max_tf, min_dl) pair dominates every posting in it. Storing
    min_dl tightens the bound vs the dl→0 floor, so MaxScore flips lists to
    update-only mode sooner."""
    mt = pdf["max_tf"].to_numpy(dtype=np.float64)
    if mode == "compat":
        return float(mt.max())
    md = pdf["min_dl"].to_numpy(dtype=np.float64)
    ub = idf_t * mt * (k1 + 1.0) / (mt + k1 * (1.0 - b + b * md / avgdl))
    return float(ub.max())


def _maxscore_or_bucket(
    groups: dict[str, pd.DataFrame],
    k: int | None,
    mode: str,
    idf: dict[str, float] | None,
    k1: float,
    b: float,
    avgdl: float,
    allowed: np.ndarray | None = None,
    stats: dict | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """EXACT disjunctive top-k with MaxScore/block-max pruning.

    Terms process in descending whole-term upper bound (from block
    metadata). Once k docs are scored, θ = current k-th best PARTIAL score
    (partials are lower bounds of finals, so θ is a valid threshold):

      * a term whose suffix upper-bound sum Σ_{j≥i} UB(t_j) falls below
        θ - EPS_PRUNE cannot introduce a NEW top-k doc — its list switches
        to update-only mode, decoding just the blocks whose doc range
        holds a surviving candidate (the block-max skip);
      * candidates whose score + remaining UB falls below θ - EPS_PRUNE
        are dropped (they cannot reach the top-k even optimistically).

    EPS_PRUNE keeps every potential 4-dp round-tie alive, so the result is
    identical to the exhaustive union-merge (pinned by tests + the
    search_bm25_or oracle pair). k=None disables pruning (pre-pagination
    count path needs ALL hits). ``allowed`` (sorted) restricts candidates
    to a doc subset (site-filtered search) — applied at decode time so θ
    only ever reflects eligible docs.
    """
    idf = idf or {}
    ubs = {
        t: _term_ub(g, mode, idf.get(t, 0.0), k1, b, avgdl)
        for t, g in groups.items()
    }
    order = sorted(groups, key=lambda t: (-ubs[t], t))
    suffix = np.zeros(len(order) + 1, dtype=np.float64)
    for i in range(len(order) - 1, -1, -1):
        suffix[i] = suffix[i + 1] + ubs[order[i]]
    ids = np.empty(0, dtype=np.int64)
    scores = np.empty(0, dtype=np.float64)

    def contrib(t: str, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        tf = tfs.astype(np.float64)
        if mode == "compat":
            return tf
        dl = dls.astype(np.float64)
        return (
            idf[t] * tf * (k1 + 1.0)
            / (tf + k1 * (1.0 - b + b * dl / avgdl))
        )

    for i, t in enumerate(order):
        theta = None
        if k is not None and ids.size >= k:
            theta = np.partition(scores, ids.size - k)[ids.size - k]
        if theta is None or suffix[i] >= theta - EPS_PRUNE:
            # open mode: new docs can still enter the top-k
            t_ids, t_tfs, t_dls = _decode_term(groups[t], cand=allowed, stats=stats)
            if allowed is not None and t_ids.size:
                m = np.isin(t_ids, allowed, assume_unique=True)
                t_ids, t_tfs, t_dls = t_ids[m], t_tfs[m], t_dls[m]
            if t_ids.size:
                new = np.setdiff1d(t_ids, ids, assume_unique=True)
                if new.size:
                    merged = np.union1d(ids, new)
                    grown = np.zeros(merged.size, dtype=np.float64)
                    grown[np.searchsorted(merged, ids)] = scores
                    ids, scores = merged, grown
                scores[np.searchsorted(ids, t_ids)] += contrib(t, t_tfs, t_dls)
        else:
            # update-only: decode just the blocks holding a candidate
            t_ids, t_tfs, t_dls = _decode_term(groups[t], cand=ids, stats=stats)
            if t_ids.size and ids.size:
                pos = np.clip(np.searchsorted(ids, t_ids), 0, ids.size - 1)
                m = ids[pos] == t_ids
                if m.any():
                    scores[pos[m]] += contrib(t, t_tfs[m], t_dls[m])
        if k is not None and ids.size > k:
            theta2 = np.partition(scores, ids.size - k)[ids.size - k]
            keep = scores + suffix[i + 1] >= theta2 - EPS_PRUNE
            ids, scores = ids[keep], scores[keep]
    return ids, scores


def make_conjunctive_scorer(terms: list[str], mode: str, idf: dict[str, float] | None,
                            k1: float, b: float, avgdl: float, k: int,
                            restrict_to_norms: bool = False,
                            conjunctive: bool = True):
    """Build the scorer fn: (blocks_pdf[, norms_pdf]) → top-k rows.

    mode='compat': score = Σ tf (exact, reference §2.G).
    mode='bm25':  Robertson BM25 — idf broadcast with the query, dl decoded
    from the blocks' per-posting norms payload (norms-in-index), so the
    unfiltered path needs NO second frame and runs as a plain
    groupBy(doc_bucket).applyInPandas over the cached blocks.
    conjunctive=False: disjunctive (OR) top-k — every doc containing ANY
    query term scores on the terms it has, evaluated by the MaxScore
    block-max scorer (_maxscore_or_bucket): threshold-based block skipping
    and candidate pruning, exact vs the exhaustive union-merge.
    restrict_to_norms: drop candidate docs absent from the norms frame —
    used for site-filtered search (norms pre-filtered to the site; the
    reference's per-site search, SearchServiceImpl.java:30-52). Only this
    path cogroups a second frame, and it ships just the site's doc_ids.
    """
    n_terms = len(set(terms))

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({"doc_id": [], "score_raw": []}).astype(
            {"doc_id": "int64", "score_raw": "float64"}
        )

    def score(blocks: pd.DataFrame, norms: pd.DataFrame | None = None) -> pd.DataFrame:
        if blocks.empty:
            return _empty()
        groups = {t: g for t, g in blocks.groupby("term")}
        if conjunctive:
            if len(groups) < n_terms:  # some query term absent from bucket
                return _empty()
            ids, aligned, dls = _conjunctive_bucket(groups)
            if ids.size == 0:
                return _empty()
            if restrict_to_norms:
                allowed = norms["doc_id"].to_numpy(dtype=np.int64)
                mask = np.isin(ids, allowed, assume_unique=True)
                ids = ids[mask]
                dls = dls[mask]
                aligned = {t: v[mask] for t, v in aligned.items()}
                if ids.size == 0:
                    return _empty()
            if mode == "compat":
                s = np.zeros(ids.size, dtype=np.float64)
                for t in aligned:
                    s += aligned[t]
            else:
                dl = dls.astype(np.float64)
                s = np.zeros(ids.size, dtype=np.float64)
                for t in sorted(aligned):  # fixed order → deterministic sum
                    tf = aligned[t].astype(np.float64)
                    s += idf[t] * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        else:
            allowed = None
            if restrict_to_norms:
                allowed = np.sort(norms["doc_id"].to_numpy(dtype=np.int64))
            ids, s = _maxscore_or_bucket(
                groups, k, mode, idf, k1, b, avgdl, allowed
            )
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
    doc_stats_bucketed: DataFrame | None,
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

    blocks: the compressed block table (doc_bucket, term, ..., bytes) —
    BM25 norms (per-posting dl) are stored IN the blocks, so the common
    unfiltered query is a single groupBy over the query terms' blocks: no
    norms cogroup, no per-query transfer of a (doc_id, dl) table (at
    10^12 docs that transfer would dwarf the posting bytes).
    doc_stats_bucketed: only consulted when restrict_to_norms — pass the
    co-partitioned (doc_bucket, doc_id[, dl]) frame PRE-FILTERED to the
    allowed doc subset (site-scoped search); the cogroup then ships only
    that subset's ids (the docvalues pattern — proportional to the site,
    not the corpus).
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
    if restrict_to_norms:
        if doc_stats_bucketed is None:
            raise ValueError("restrict_to_norms needs doc_stats_bucketed")
        per_bucket = (
            cand.groupby("doc_bucket")
            .cogroup(doc_stats_bucketed.groupby("doc_bucket"))
            .applyInPandas(scorer, schema=SCORE_SCHEMA)
        )
    else:
        # one-arg wrapper: grouped applyInPandas dispatches on arg count
        # (a two-arg fn would receive (key, pdf))
        def _score_one(pdf: pd.DataFrame) -> pd.DataFrame:
            return scorer(pdf)

        per_bucket = cand.groupby("doc_bucket").applyInPandas(
            _score_one, schema=SCORE_SCHEMA
        )
    out = per_bucket.select(
        "doc_id", F.round(F.col("score_raw"), 4).alias("score")
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
    if limit is None:
        return out
    return out.offset(offset).limit(limit)
