"""Function-score boosts — the Elasticsearch `function_score` family the
engine did not yet cover: the decay trio (gauss / exp / linear on a date
field), the `rank_feature` query (saturation / log / sigmoid over a static
per-document feature), and seeded `random_score`.

The reference engine ranks purely by max-normalized relevance
(SearchServiceImpl.java:160-210); production web search layers static
document priors and freshness on top of the textual score. These operators
are that layer, expressed as *rerank transforms over a bounded hit window*
(the standard two-phase architecture also used by `blend_recency` /
`search_rerank`): the first phase is any top-k scorer, the second phase
joins one scalar feature per hit and re-sorts. All math is deterministic
and mirrored in the DuckDB oracle (4-dp rounded).

Scale notes (100 TB): every operator here touches only the k-row hit
window plus ONE pruned scan of the feature column (AQE broadcasts the hit
side); the decay origin is a single-scalar aggregate. No windows, no
corpus-wide shuffles, no Python UDFs — all whole-stage-codegen column
expressions.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import h60_col

# Decay defaults — ES's own documented defaults (decay=0.5 at `scale`).
DECAY_SCALE_DAYS = 10.0
DECAY_OFFSET_DAYS = 2.0
DECAY_VALUE = 0.5

# rank_feature defaults (ES: saturation pivot ≈ approximate geometric mean
# of the feature; the synthetic corpus quality score lives in [0, 1]).
RF_PIVOT = 0.5
RF_WEIGHT = 2.0
RF_LOG_SCALING = 1.0
RF_SIGMOID_EXP = 0.6

RANDOM_SEED = 7
_H60_RANGE = float(1 << 60)


def _decay_multiplier(mode: str, dist_days, scale: float, decay: float):
    """The three ES decay curves as a column expression over a
    non-negative distance (days past the offset). Each satisfies
    m(0) = 1 and m(scale) = decay."""
    if mode == "gauss":
        # sigma^2 chosen so exp(-scale^2 / (2 sigma^2)) = decay
        sigma2 = -(scale * scale) / (2.0 * math.log(decay))
        return F.exp(-(dist_days * dist_days) / F.lit(2.0 * sigma2))
    if mode == "exp":
        lam = math.log(decay) / scale
        return F.exp(F.lit(lam) * dist_days)
    if mode == "linear":
        s = scale / (1.0 - decay)
        return F.greatest(F.lit(0.0), (F.lit(s) - dist_days) / F.lit(s))
    raise ValueError(f"unknown decay mode: {mode}")


def decay_function_score(
    hits: DataFrame,
    docs: DataFrame,
    mode: str = "gauss",
    scale_days: float = DECAY_SCALE_DAYS,
    offset_days: float = DECAY_OFFSET_DAYS,
    decay: float = DECAY_VALUE,
    limit: int = 20,
) -> DataFrame:
    """ES `function_score` date decay → (doc_id, score): multiply the
    relevance score by gauss / exp / linear decay on crawl age,

        dist  = max(0, age_days − offset)        # flat top inside offset
        gauss : exp(−dist² / 2σ²),  σ² = −scale²/(2·ln decay)
        exp   : exp(ln(decay)/scale · dist)
        linear: max(0, (s − dist)/s),  s = scale/(1−decay)

    anchored at the CORPUS max `warc_ts` (deterministic / replayable, the
    same origin rule as `blend_recency`, which implements the older
    half-life idiom — these are the ES-parameterized curves). Docs inside
    `offset` days of the origin keep their score unchanged; under
    `linear`, docs older than offset + s drop to exactly 0.

    Scale: one scalar agg for the origin + a broadcast-sized join of the
    k-row hit window against the 2-column (doc_id, warc_ts) pruned scan."""
    ep = F.col("warc_ts").cast("long")
    max_ep = docs.agg(F.max(ep).alias("m")).collect()[0]["m"]
    age_days = (F.lit(max_ep) - F.col("ep")) / F.lit(86400.0)
    dist = F.greatest(F.lit(0.0), age_days - F.lit(float(offset_days)))
    mult = _decay_multiplier(mode, dist, float(scale_days), float(decay))
    out = (
        hits.join(docs.select("doc_id", ep.alias("ep")), "doc_id")
        .withColumn("score", F.round(F.col("score") * mult, 4))
        .select("doc_id", "score")
    )
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        limit
    )


def rank_feature_boost(
    hits: DataFrame,
    features: DataFrame,
    feature_col: str = "quality",
    fn: str = "saturation",
    pivot: float = RF_PIVOT,
    weight: float = RF_WEIGHT,
    limit: int = 20,
) -> DataFrame:
    """ES `rank_feature` query → (doc_id, score): add a bounded boost
    derived from a static per-document feature (here the frozen
    heuristic quality score) to the relevance score,

        saturation: S = f / (f + pivot)                  (∈ [0, 1))
        log       : S = ln(scaling + f)                  (scaling = 1)
        sigmoid   : S = f^exp / (f^exp + pivot^exp)

        score' = score + weight · S

    `rank_feature` differs from multiplicative authority blending
    (`search_authority`) in shape: the boost is ADDITIVE and saturating,
    so a perfect feature can add at most `weight` — textual relevance
    stays primary and junk pages cannot ride a huge static score to the
    top. Feature values are the 4-dp-rounded quality column, so both
    engines see bit-identical inputs.

    Scale: the feature frame is a per-doc scalar relation; joining it to
    the k-row hit window broadcasts the hits. No shuffle beyond the
    first-phase scorer's own."""
    if fn == "saturation":
        s2 = F.col("_f") / (F.col("_f") + F.lit(float(pivot)))
    elif fn == "log":
        s2 = F.log(F.lit(RF_LOG_SCALING) + F.col("_f"))
    elif fn == "sigmoid":
        e = float(RF_SIGMOID_EXP)
        fp2 = F.pow(F.col("_f"), F.lit(e))
        s2 = fp2 / (fp2 + F.lit(float(pivot) ** e))
    else:
        raise ValueError(f"unknown rank_feature function: {fn}")
    f = F.col(feature_col).cast("double")
    out = (
        hits.join(features.select("doc_id", f.alias("_f")), "doc_id")
        .withColumn(
            "score",
            F.round(F.col("score") + F.lit(float(weight)) * s2, 4),
        )
        .select("doc_id", "score")
    )
    return out.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        limit
    )


def random_score(
    docs: DataFrame, seed: int = RANDOM_SEED, limit: int = 20
) -> DataFrame:
    """ES `function_score` `random_score` → (doc_id, rscore): a
    deterministic per-document uniform draw in [0, 1), keyed by
    (seed, doc_id) through the portable h60 hash —

        rscore = h60('rs' || seed || ':' || doc_id) / 2^60

    reproducible across engines AND across cluster sizes (no RNG state,
    no partition-order dependence — `F.rand` is neither stable under
    repartitioning nor oracle-reproducible). The canonical uses are
    consistent sampling of result pages and A/B bucket assignment.

    Scale: embarrassingly parallel — one md5 per row on a 1-column scan,
    top-k via TakeOrderedAndProject."""
    key = F.concat(
        F.lit(f"rs{int(seed)}:"), F.col("doc_id").cast("string")
    )
    out = docs.select(
        "doc_id",
        F.round(h60_col(key) / F.lit(_H60_RANGE), 4).alias("rscore"),
    )
    return out.orderBy(
        F.col("rscore").desc(), F.col("doc_id").asc()
    ).limit(limit)


# ------------------------------------------------------------- ES rescore

RESCORE_WINDOW = 100
RESCORE_QUERY_WEIGHT = 1.0
RESCORE_WEIGHT = 2.0


def search_rescore(
    postings: DataFrame,
    term_dict: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    positional: DataFrame,
    terms: list[str],
    rescore_terms: list[str],
    window_size: int = RESCORE_WINDOW,
    query_weight: float = RESCORE_QUERY_WEIGHT,
    rescore_weight: float = RESCORE_WEIGHT,
    k: int = 20,
) -> DataFrame:
    """Elasticsearch `rescore`: a cheap first pass ranks the corpus, an
    expensive second query re-scores ONLY the top `window_size` hits.

    First pass: disjunctive BM25 (`bm25_scored`, OR mode) cut to the
    window on the engine tiebreak (rounded score desc, doc_id asc).
    Second pass: exact-phrase match count over the positional relation
    (`phrase_match`) — the classic proximity rescorer. Combined score is
    ES's `score_mode: total` with the two weights:

        query_weight * bm25 + rescore_weight * phrase_tf

    Docs in the window that miss the phrase keep query_weight * bm25
    (phrase_tf coalesces to 0), matching ES. With k <= window_size the
    result is exactly the re-sorted window, i.e. full ES semantics
    (below-window hits keep first-pass order and can't enter a k-cut
    that the window already covers).

    Scale shape: the corpus-dependent work is ONE bm25_scored pass (the
    same plan search_bm25 runs). The phrase chain runs over positional
    slices pre-restricted to the window's doc_ids (broadcast left-semi —
    the window is <= window_size rows BY CONSTRUCTION, so the broadcast
    is safe at any corpus size), so the second query never scans a doc
    outside the window — rescoring cost is O(window), not O(corpus).
    The final outer join broadcasts the <= window_size-row phrase side
    (an outer join can't broadcast its preserved side, so the window
    streams and the phrase hash table ships). phrase_tf is doc-local,
    so restricting docs never changes a surviving doc's value.
    """
    from .positional import phrase_match
    from .search import bm25_scored

    scored = bm25_scored(
        postings, term_dict, doc_stats, n_docs, avgdl, terms,
        conjunctive=False,
    )
    window = (
        scored.orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(window_size))
    )
    pos_w = positional.join(
        F.broadcast(window.select("doc_id")), "doc_id", "left_semi"
    )
    ph = phrase_match(pos_w, rescore_terms)
    return (
        window.join(F.broadcast(ph), "doc_id", "left")
        .withColumn(
            "score_combined",
            F.round(
                F.lit(float(query_weight)) * F.col("score")
                + F.lit(float(rescore_weight))
                * F.coalesce(F.col("phrase_tf"), F.lit(0)).cast("double"),
                4,
            ),
        )
        .orderBy(F.col("score_combined").desc(), F.col("doc_id").asc())
        .limit(int(k))
        .select("doc_id", F.col("score_combined").alias("score"))
    )
