"""Impact-ordered postings — precomputed quantized score contributions.

Anh & Moffat (SIGIR 2001 "Vector-space ranking with effective early
termination"; CIKM 2006 "Pruned query evaluation using pre-computed
impacts") replace index-time (doc_id, tf) postings with (doc_id, impact):
the per-posting SCORE CONTRIBUTION is computed at build time — when df,
dl and avgdl are all known — quantized to a small integer, and stored.
Query evaluation then degenerates to summing small ints: no floats, no
per-posting length-norm arithmetic, and because postings can be laid out
impact-DESCENDING, an anytime evaluator can stop after the high-impact
prefix with bounded score error (each unread posting of term t adds at
most t's current max remaining impact — the same upper-bound algebra the
engine's MaxScore pruning in wand.py already uses, shifted to ints).

This module is the indexing-side twin of wand.py's query-side pruning:

  * `quantized_impacts` — (term, doc_id, impact): the full-precision
    BM25 partial score (Robertson idf × saturated length-normalized tf —
    bit-identical arithmetic to search.bm25_scored) rounded to 6 dp, then
    uniform-quantized with a FROZEN fixed-point scale: 1/QUANT_SCALE per
    level, saturating at QUANT_LEVELS-1 (8-bit). A frozen scale (rather
    than the corpus-max scale of the original paper) keeps the codebook
    data-independent: segments quantized at different times merge without
    requantization, and the DuckDB oracle can state the identical
    arithmetic with no side-channel scalar.
  * `search_impact` — disjunctive top-k by summed integer impact
    (score_q desc, doc_id asc): the degenerate-cheap query evaluator the
    layout exists for.

Quantization error is bounded by (#query terms)/QUANT_SCALE on any doc's
score, so rank inversions happen only between docs whose true scores sit
within that band — tests/test_impact.py pins a top-k overlap floor vs
the exact float ranking at sf0.001.

Scale shape: quantization is one codegen map over the postings scan
joined to the per-doc dl relation (sort-merge on doc_id, corpus-scaling
side never broadcast; the ≤|vocab| df side rides an AQE broadcast);
search is filter → one map-side-combinable groupBy — integer sums
combine associatively, unlike the float path where only the rounded
total is pinned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 16.0  # levels per unit of BM25 partial score (1/16 step)
QUANT_LEVELS = 256  # 8-bit saturating fixed point

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def _quant_impact_col(
    n_docs: int, avgdl: float, k1: float, b: float
):
    """The shared quantized-impact Column expression over a relation
    carrying (tf, dl, df) — THE arithmetic of the impact family, stated
    once so quantized_impacts and impacts_from_blocks cannot drift
    (champion_lists_fused's numpy twin mirrors it and is pinned
    bit-identical by test)."""
    part = (
        F.col("idf")
        * (F.col("tf").cast("double") * (k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + k1 * (1.0 - b + b * F.col("dl").cast("double") / float(avgdl))
        )
    )
    idf = F.log(
        1.0
        + (float(n_docs) - F.col("df").cast("double") + 0.5)
        / (F.col("df").cast("double") + 0.5)
    )
    quant = F.least(
        F.lit(QUANT_LEVELS - 1),
        F.floor(F.round(part, 6) * QUANT_SCALE),
    )
    return idf, quant


def quantized_impacts(
    postings: DataFrame,
    term_dict: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """(term, doc_id, impact) — 8-bit quantized BM25 partial scores for
    EVERY posting (index-time transform, no query terms involved).

    impact = min(QUANT_LEVELS−1, floor(round(part, 6) · QUANT_SCALE))
    where part is bm25_scored's per-posting contribution. The 6 dp
    rounding before the floor collapses last-ulp float divergence across
    engines so the bucket edge is deterministic."""
    df_map = term_dict.select("term", "df")
    idf, quant = _quant_impact_col(n_docs, avgdl, k1, b)
    return (
        postings.join(df_map, "term")
        .join(doc_stats, "doc_id")
        .withColumn("idf", idf)
        .select(
            "term",
            "doc_id",
            quant.cast("int").alias("impact"),
        )
    )


def search_impact(
    impacts: DataFrame,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """(doc_id, score_q) — disjunctive top-k over the impact-ordered
    index: score_q = Σ impact over the doc's matching query terms, ranked
    score_q desc / doc_id asc. Integer adds only — the whole scorer is
    one isin filter plus one groupBy(sum), and ties broken exactly like
    every other search surface."""
    uniq = sorted(set(terms))
    if not uniq:
        return impacts.select(
            F.col("doc_id"), F.lit(0).cast("bigint").alias("score_q")
        ).limit(0)
    return (
        impacts.filter(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(F.sum("impact").cast("bigint").alias("score_q"))
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(k)
    )


ANYTIME_BUCKETS = 16

# Level-aligned cut (r04-verdict #2): when the budget boundary lands
# inside a quantization level whose full extent fits within
# LEVEL_CAP_FACTOR × budget rows, the run keeps the WHOLE level and the
# tail bound drops to level − 1. Rationale: the mid-level cut stores
# cutoff = boundary level v, and on tie-heavy corpora the certain top-k
# θ equals Σ v_t exactly, so every bucket's hidden-doc bound crosses θ
# and the two-tier serve rescopes everything (measured 32/32,
# BENCH/QUERIES.md). Completing the level makes every θ-tying doc a
# tier-1 CANDIDATE (no longer hidden), so the hidden bound is Σ(v_t−1)
# < θ and the bucket settles without rescope. Per-run growth is bounded
# by the cap; a fatter boundary level falls back to the mid-level cut
# (sound, just loose — the all-rescope fallback then serves exact).
# The 1.2 default bounds champion-table growth at ≤1.2× the strict
# top-budget table BY CONSTRUCTION (the r04-verdict #2 size bar): the
# level completes only when its full extent fits in 0.2·budget extra
# rows — the thin-boundary case where completion actually tightens the
# bound. Measured A/B at 1.28M docs in BENCH/QUERIES.md; factor 0
# exactly reproduces the pre-r05 mid-level cut (used by the A/B tests).
LEVEL_CAP_FACTOR = 1.2


def _level_cut(ranked: DataFrame, budget: int, cap_rows: int, w_run):
    """Attach the level-aligned cut columns to a ranked run relation —
    THE one statement of the rule, shared by `search_impact_anytime`
    and `champion_lists` (pinned equal by test; the fused numpy twin
    and the DuckDB `_champion_kept_ctes` mirror it and are pinned
    bit-identical / value-equal).

    `ranked` must carry (impact, rn, n_run) with rn ordered impact
    desc / doc_id asc within `w_run`'s partitioning. Returns
    (with_nge, keep_predicate, cutoff_expr): v = the budget-th impact
    of an overflowing run (null ⟺ the run fits the budget); n_ge = the
    run's rows with impact ≥ v (the boundary level's full extent);
    keep/cutoff implement the three branches — complete (cutoff 0),
    level-keep within the cap (cutoff max(1, v−1), 0 if that exhausts
    the run), fat-level fallback (top-budget prefix, cutoff
    max(1, v))."""
    with_v = ranked.withColumn(
        "v",
        F.max(
            F.when(
                (F.col("rn") == budget) & (F.col("n_run") > budget),
                F.col("impact"),
            )
        ).over(w_run),
    )
    with_nge = with_v.withColumn(
        "n_ge",
        F.sum(
            F.when(F.col("impact") >= F.col("v"), 1).otherwise(0)
        ).over(w_run),
    )
    keep = (
        F.col("v").isNull()
        | ((F.col("n_ge") <= cap_rows) & (F.col("impact") >= F.col("v")))
        | ((F.col("n_ge") > cap_rows) & (F.col("rn") <= budget))
    )
    # the FLOOR at 1 keeps `cutoff == 0 ⟺ run complete` an exact
    # equivalence: a truncated run whose tail bound quantizes to 0
    # would otherwise masquerade as complete, and the conjunctive
    # certainty algebra would wrongly ELIMINATE below-prefix docs that
    # do hold the term (with contribution 0) — r04 review finding. The
    # inflated bound stays sound: hidden impacts ≤ bound ≤ max(1, ·).
    cutoff = (
        F.when(F.col("v").isNull(), F.lit(0))
        .when(
            (F.col("n_ge") <= cap_rows) & (F.col("n_ge") == F.col("n_run")),
            F.lit(0),
        )
        .when(
            F.col("n_ge") <= cap_rows,
            F.greatest(F.lit(1), F.col("v") - 1),
        )
        .otherwise(F.greatest(F.lit(1), F.col("v")))
    )
    return with_nge, keep, cutoff


def search_impact_anytime(
    impacts: DataFrame,
    terms: list[str],
    k: int = 20,
    budget_per_bucket: int = 8,
    n_buckets: int = ANYTIME_BUCKETS,
    level_cap_factor: float = LEVEL_CAP_FACTOR,
) -> DataFrame:
    """Anytime top-k over impact-ORDERED postings → (doc_id, score_q,
    error_ub): evaluate only the `budget_per_bucket` highest-impact
    postings of each query term within each doc bucket, and report, per
    returned doc, the exact upper bound on what the unread tail could
    still add — Anh & Moffat's anytime evaluation (CIKM'06 §4), in the
    engine's doc-sharded layout.

    The budget cut is per (doc_bucket, term) — the SAME bounded window
    key the block builder and the static pruner use, never a
    term-partitioned window (a head term's full posting list through one
    partition is the round-1 scale-killer shape), and it is
    LEVEL-ALIGNED exactly like champion_lists (pinned equal by test):
    a run whose postings all fit the budget contributes cutoff 0;
    an overflowing run whose boundary quantization level fits within
    LEVEL_CAP_FACTOR·budget rows keeps the whole level with cutoff
    max(1, v−1); a fatter level keeps the top-budget prefix with
    cutoff max(1, v). Either way a doc missing term t in the evaluated
    prefix can gain at most cutoff(bucket(doc), t) from the tail:

        true_score(d) ∈ [score_q(d), score_q(d) + error_ub(d)]

    (pinned by test against the exhaustive search_impact). The bound is
    computed with the same two-sided trick as terms_agg_sharded:
    error_ub = bucket_total_cutoff − Σ_{seen terms} cutoff, where the
    ≤ n_buckets bucket totals fold in as a literal map and the per-term
    cutoffs ride a broadcast-small join (≤ n_buckets·|terms| rows)."""
    from pyspark.sql import Window

    uniq = sorted(set(terms))
    empty = impacts.select(
        F.col("doc_id"),
        F.lit(0).cast("bigint").alias("score_q"),
        F.lit(0).cast("bigint").alias("error_ub"),
    ).limit(0)
    if not uniq:
        return empty
    pq = impacts.filter(F.col("term").isin(uniq)).withColumn(
        "doc_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
    )
    w = Window.partitionBy("doc_bucket", "term").orderBy(
        F.col("impact").desc(), F.col("doc_id").asc()
    )
    w_run = Window.partitionBy("doc_bucket", "term")
    cap_rows = int(level_cap_factor * budget_per_bucket)
    base = pq.select(
        "doc_bucket", "term", "doc_id", "impact",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_run).alias("n_run"),
    )
    with_nge, keep, cut_expr = _level_cut(
        base, budget_per_bucket, cap_rows, w_run
    )
    ranked = with_nge.persist()
    kept = ranked.filter(keep)
    cut_rows = (
        ranked.filter(F.col("rn") == budget_per_bucket)
        .filter(F.col("n_run") > budget_per_bucket)
        .select("doc_bucket", "term", cut_expr.alias("cutoff"))
        .collect()
    )
    cutoff = {
        (r["doc_bucket"], r["term"]): r["cutoff"]
        for r in cut_rows
        if r["cutoff"] > 0
    }
    if not cutoff:
        # every (bucket, term) run fit the budget: the evaluation was
        # exhaustive and the bound collapses to zero
        return (
            kept.groupBy("doc_id")
            .agg(F.sum("impact").cast("bigint").alias("score_q"))
            .select(
                "doc_id", "score_q",
                F.lit(0).cast("bigint").alias("error_ub"),
            )
            .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
            .limit(k)
        )
    bucket_tot = {}
    for (b, t), c in cutoff.items():
        bucket_tot[b] = bucket_tot.get(b, 0) + c
    tot_map = F.create_map(
        *[F.lit(x) for b in sorted(bucket_tot) for x in (b, bucket_tot[b])]
    )
    cut_col = F.create_map(
        *[
            F.lit(x)
            for (b, t) in sorted(cutoff)
            for x in (f"{b}:{t}", cutoff[(b, t)])
        ]
    )
    seen = kept.withColumn(
        "seen_cut",
        F.coalesce(
            cut_col[
                F.concat(
                    F.col("doc_bucket").cast("string"), F.lit(":"),
                    F.col("term"),
                )
            ],
            F.lit(0),
        ),
    )
    scored = (
        seen.groupBy("doc_id", "doc_bucket")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.sum("seen_cut").alias("seen_total"),
        )
        .select(
            "doc_id",
            "score_q",
            (
                F.coalesce(tot_map[F.col("doc_bucket")], F.lit(0))
                - F.col("seen_total")
            )
            .cast("bigint")
            .alias("error_ub"),
        )
    )
    out = scored.orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    ).limit(k)
    # ranked stays persisted for the session (the cutoff collect above and
    # the returned plan must see the same ranking)
    return out


# ------------------------------------------------- persisted champion lists

CHAMPION_BUDGET = 128  # postings kept per (doc_bucket, term) run


def champion_lists(
    impacts: DataFrame,
    budget_per_bucket: int = CHAMPION_BUDGET,
    n_buckets: int = ANYTIME_BUCKETS,
    level_cap_factor: float = LEVEL_CAP_FACTOR,
) -> DataFrame:
    """(doc_bucket, term, doc_id, impact, cutoff) — the PERSISTED pruned
    impact index: per (doc_bucket, term), only the `budget_per_bucket`
    highest-impact postings survive (impact desc, doc_id asc — the
    deterministic champion prefix), and every kept row carries the run's
    tail CUTOFF: an upper bound on any pruned posting's impact when the
    run overflowed the budget, else 0. The cut is LEVEL-ALIGNED
    (r04-verdict #2, see LEVEL_CAP_FACTOR): when the boundary
    quantization level's full extent fits within cap·budget rows the
    run keeps the whole level and cutoff = max(1, v−1) — strictly below
    every kept impact, so tie-heavy corpora stop hiding θ-tying docs
    below the cut; a fatter level falls back to the mid-level cut with
    cutoff = max(1, v). Anh & Moffat's pruned index (CIKM'06) /
    champion lists — `search_champions` serves bounded-error top-k from
    this table ALONE, with no full-index access and no driver-side
    state, which is what makes head-term queries latency-bound by the
    prefix instead of the posting mass (measured: BENCH/QUERIES.md).

    Unlike `search_impact_anytime` (the query-time twin, which collects
    cutoffs to the driver because its input is transient), everything
    here is in-plan with ZERO joins: one window shuffle keyed
    (doc_bucket, term) — the same bounded run key as the block builder,
    so a 100%-df head term still splits across buckets — and the cutoff
    is a conditional max over that SAME partitioning (the run's
    rn==budget row carries it when the run overflowed), so no cutoff
    relation ever materializes. The earlier self-join variant
    force-broadcast a relation with one row per truncated run —
    O(|vocab|·n_buckets) at web scale, a driver-OOM hazard at the 10M-
    term × 4096-bucket sharding DEPLOY.md targets; the window form keeps
    the plan size independent of vocabulary. Write once at index time,
    prune forever."""
    from pyspark.sql import Window

    pq = impacts.withColumn(
        "doc_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int")
    )
    w = Window.partitionBy("doc_bucket", "term").orderBy(
        F.col("impact").desc(), F.col("doc_id").asc()
    )
    w_run = Window.partitionBy("doc_bucket", "term")
    ranked = pq.select(
        "doc_bucket", "term", "doc_id", "impact",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(w_run).alias("n_run"),
    )
    # _level_cut states the rule ONCE for this window form and the
    # anytime twin. The chained selects share ONE (doc_bucket, term)
    # exchange — each later window consumes the prior's column.
    cap_rows = int(level_cap_factor * budget_per_bucket)
    with_nge, keep, cutoff = _level_cut(
        ranked, budget_per_bucket, cap_rows, w_run
    )
    return (
        with_nge.withColumn("cutoff", cutoff.cast("int"))
        .filter(keep)
        .select("doc_bucket", "term", "doc_id", "impact", "cutoff")
    )


def search_champions(
    champions: DataFrame,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """(doc_id, score_q, error_ub) — bounded-error top-k from the
    persisted champion table alone: score_q sums the stored impacts of
    the doc's matched champion rows; error_ub is the exact upper bound
    on what pruned tails could still add, from the STORED cutoffs:

        error_ub(d) = Σ_{t ∈ q} cutoff(bucket(d), t) − Σ_{t seen for d}
                      cutoff(bucket(d), t)

    (a doc absent from term t's champion prefix in its bucket can have
    gained at most that run's cutoff; seen terms contribute their full
    stored impact, so their cutoff is subtracted back out). Same
    interval semantics as `search_impact_anytime`, pinned equal by
    test. Serving shape: pushed In(term) scan of the small pruned
    table → map-side-combinable integer groupBy → broadcast of the
    ≤ n_buckets·|q| cutoff rows → TakeOrdered. Zero Python, zero
    driver-side state, movement bounded by the champion prefix."""
    uniq = sorted(set(terms))
    empty = champions.select(
        F.col("doc_id"),
        F.lit(0).cast("bigint").alias("score_q"),
        F.lit(0).cast("bigint").alias("error_ub"),
    ).limit(0)
    if not uniq:
        return empty
    cand = champions.filter(F.col("term").isin(uniq))
    cuts = cand.select("doc_bucket", "term", "cutoff").distinct()
    bucket_tot = cuts.groupBy("doc_bucket").agg(
        F.sum("cutoff").alias("bucket_cut_total")
    )
    scored = (
        cand.groupBy("doc_id", "doc_bucket")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.sum("cutoff").alias("seen_cut_total"),
        )
        .join(F.broadcast(bucket_tot), "doc_bucket", "left")
        .select(
            "doc_id",
            "score_q",
            (
                F.coalesce(F.col("bucket_cut_total"), F.lit(0))
                - F.col("seen_cut_total")
            )
            .cast("bigint")
            .alias("error_ub"),
        )
    )
    return scored.orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    ).limit(k)


def search_impact_and(
    impacts: DataFrame,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """(doc_id, score_q) — EXACT conjunctive top-k over the full impact
    table: docs containing every query term, ranked by summed integer
    impact (score_q desc, doc_id asc). The ground truth the two-tier
    serve is pinned against; also the exact tier it rescopes through.

    impacts carries one row per (term, doc_id) (it derives from the
    postings groupBy), so count(*) == |q| is the conjunction test — no
    count(distinct). Plan: pushed In(term) scan → one map-side-
    combinable integer groupBy → TakeOrdered(k)."""
    uniq = sorted(set(terms))
    empty = impacts.select(
        F.col("doc_id"), F.lit(0).cast("bigint").alias("score_q")
    ).limit(0)
    if not uniq:
        return empty
    return (
        impacts.filter(F.col("term").isin(uniq))
        .groupBy("doc_id")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.count("*").alias("n_terms"),
        )
        .filter(F.col("n_terms") == len(uniq))
        .select("doc_id", "score_q")
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def _champions_and_scored(
    champions: DataFrame, uniq: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Shared tier-1 core of the conjunctive champion serve: the FULL
    (un-limited) candidate relation and the per-bucket run census.

    Returns (scored, census):
      scored — (doc_id, doc_bucket, score_q, error_ub, certain) for
        every candidate doc that survives certain-absence elimination;
      census — (doc_bucket, n_runs, n_complete, bucket_cut_total), one
        row per bucket holding ≥1 query-term run (≤ n_buckets rows)."""
    n_q = len(uniq)
    cand = champions.filter(F.col("term").isin(uniq))
    runs = cand.select("doc_bucket", "term", "cutoff").distinct()
    census = runs.groupBy("doc_bucket").agg(
        F.count("*").alias("n_runs"),
        F.sum((F.col("cutoff") == 0).cast("int")).alias("n_complete"),
        F.sum("cutoff").alias("bucket_cut_total"),
    )
    scored = (
        cand.groupBy("doc_id", "doc_bucket")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.count("*").alias("n_seen"),
            F.sum((F.col("cutoff") == 0).cast("int")).alias("seen_complete"),
            F.sum("cutoff").alias("seen_cut_total"),
        )
        .join(F.broadcast(census), "doc_bucket")
        # bucket must hold a run for EVERY query term, and the doc must
        # have been seen in every COMPLETE run
        .filter(
            (F.col("n_runs") == n_q)
            & (F.col("seen_complete") == F.col("n_complete"))
        )
        .select(
            "doc_id",
            "doc_bucket",
            "score_q",
            (F.col("bucket_cut_total") - F.col("seen_cut_total"))
            .cast("bigint")
            .alias("error_ub"),
            (F.col("n_seen") == n_q).alias("certain"),
        )
    )
    return scored, census


def _two_tier_serve(
    impacts: DataFrame,
    scored: DataFrame,
    census: DataFrame,
    uniq: list[str],
    k: int,
    n_buckets: int,
    diag: dict | None,
    impacts_bucket_n: int | None,
    rescope_pred,
    conjunctive_n: int | None,
    fallback_frac: float = 0.5,
) -> DataFrame:
    """Shared tier-2 machinery of the AND/OR two-tier serves: θ probe
    over the certain candidates, bucket-census rescope selection
    (`rescope_pred(census_row, theta)` decides), the two disjoint exact
    slices (whole rescoped buckets + maybe docs via left-semi), and the
    final union/order/limit. `scored` must carry (doc_id, doc_bucket,
    score_q, error_ub, certain); `conjunctive_n` adds the exact tier's
    match-all filter for the AND variant. One copy of the subtle parts
    (r04 review finding — the siblings previously duplicated ~50 lines
    that had to be bug-fixed in lockstep).

    `fallback_frac` (r04-verdict #1): when the rescope set covers ≥
    this fraction of the buckets — head-term conjunctions over
    tie-heavy corpora, where θ sits below every bucket's Σ cutoffs —
    the composed serve would cost the champion tier PLUS the slice
    machinery PLUS an (almost-)full exact scan, measured >2× the plain
    exact path (BENCH/QUERIES.md r04 table: 5.5–5.9 s vs 2.6–2.7 s
    all-rescope). The census + θ probe reveal that shape BEFORE tier 2
    is built, so the serve falls back to the one-aggregation exact plan
    (`search_impact_and` / `search_impact` by construction) and skips
    the slice plumbing. Pass a value > 1.0 to disable (diagnostics)."""
    # θ probe + census BEFORE any persist: the fallback decision needs
    # only these two bounded collects, so the all-rescope case pays two
    # champion-scale jobs and nothing else — persisting scored first
    # added a third materialization job that the fallback then threw
    # away (~1 s of pure overhead at 10M docs, measured r05)
    certain_top = (
        scored.filter(F.col("certain"))
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    )
    theta = certain_top[-1]["score_q"] if len(certain_top) == k else None
    census_rows = census.collect()
    rescope_buckets = sorted(
        r["doc_bucket"] for r in census_rows if rescope_pred(r, theta)
    )
    if n_buckets > 0 and len(rescope_buckets) >= fallback_frac * n_buckets:
        # tier 1 buys (almost) nothing here — serve the plain exact
        # aggregation directly; value-identical by the shared pinned
        # semantics (the rescope-everything serve degenerates to it)
        if diag is not None:
            diag["rescope_buckets"] = rescope_buckets
            diag["theta"] = theta
            diag["fallback"] = True
            diag["n_certain"] = scored.filter(F.col("certain")).count()
            diag["n_maybe_rescoped"] = 0
            diag["maybe_doc_ids"] = []
        # delegate to the exact serves themselves rather than inlining
        # their aggregation (r05 self-review — the same lockstep-copy
        # class the r04 review removed from these siblings)
        if conjunctive_n is None:
            return search_impact(impacts, uniq, k=k)
        return search_impact_and(impacts, uniq, k=k)
    # slice path: NOW pin scored — it feeds the maybe band, the
    # certain pass-through and the diag collects below (the θ probe
    # above recomputes once into the cache; champion-scale, cheap)
    scored = scored.persist()
    maybe = scored.filter(~F.col("certain"))
    if theta is not None:
        maybe = maybe.filter(F.col("score_q") + F.col("error_ub") >= theta)
    maybe = maybe.filter(~F.col("doc_bucket").isin(rescope_buckets))

    # a pre-stored doc_bucket column (impacts parquet partitioned by
    # bucket, or the block store's own bucket) makes the bucket rescope
    # a PARTITION-PRUNED scan — but ONLY when the caller declares (via
    # impacts_bucket_n) that the stored sharding equals this serve's
    # champion sharding; silently trusting a column computed under a
    # DIFFERENT modulus would compare bucket ids across two bucket
    # spaces and corrupt the rescope slices (r04 review finding).
    # Otherwise the champion bucket is re-derived row-level.
    if impacts_bucket_n == n_buckets and "doc_bucket" in impacts.columns:
        imp_q = impacts.filter(F.col("term").isin(uniq)).withColumn(
            "doc_bucket", F.col("doc_bucket").cast("int")
        )
    else:
        imp_q = impacts.filter(F.col("term").isin(uniq)).withColumn(
            "doc_bucket",
            F.pmod(F.col("doc_id"), F.lit(n_buckets)).cast("int"),
        )
    part_rb = imp_q.filter(F.col("doc_bucket").isin(rescope_buckets))
    part_maybe = imp_q.filter(
        ~F.col("doc_bucket").isin(rescope_buckets)
    ).join(maybe.select("doc_id"), "doc_id", "left_semi")
    exact_scored = (
        part_rb.unionByName(part_maybe)
        .groupBy("doc_id")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.count("*").alias("n_terms"),
        )
    )
    if conjunctive_n is not None:
        exact_scored = exact_scored.filter(
            F.col("n_terms") == conjunctive_n
        )
    exact_scored = exact_scored.select("doc_id", "score_q")
    certain_keep = scored.filter(
        F.col("certain") & ~F.col("doc_bucket").isin(rescope_buckets)
    ).select("doc_id", "score_q")
    if diag is not None:
        diag["rescope_buckets"] = rescope_buckets
        diag["theta"] = theta
        diag["fallback"] = False
        diag["n_certain"] = scored.filter(F.col("certain")).count()
        diag["n_maybe_rescoped"] = maybe.count()
        diag["maybe_doc_ids"] = sorted(
            r["doc_id"] for r in maybe.select("doc_id").collect()
        )
    # the cache only serves the in-function collects (θ probe, diag);
    # release it now so repeated serves don't accumulate cached frames —
    # the returned plan recomputes the champion-scale aggregation once
    # at collection, which is cheap next to the rescope scan
    scored.unpersist()
    return (
        exact_scored.unionByName(certain_keep)
        .orderBy(F.col("score_q").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_two_tier(
    impacts: DataFrame,
    champions: DataFrame,
    terms: list[str],
    k: int = 20,
    n_buckets: int = ANYTIME_BUCKETS,
    diag: dict | None = None,
    impacts_bucket_n: int | None = None,
    fallback_frac: float = 0.5,
) -> DataFrame:
    """(doc_id, score_q) — the composed TWO-TIER conjunctive serve:
    champion tier first, then the exact impact path over ONLY the part
    of the corpus the champion certainty algebra cannot settle. The
    result is provably value-identical to `search_impact_and` (the
    exact conjunctive ranking) — pinned by the driver oracle pair,
    whose SQL mirror IS the exact ranking.

    Tier 1 (champions only): full candidate scoring with per-doc
    certainty (`_champions_and_scored`). Certain docs carry their EXACT
    score (seen in every query-term run). θ = the k-th certain score —
    if k certain docs exist, no doc whose upper bound falls below θ can
    enter the top-k (ties break doc_id asc, so the crossing test is ≥).

    Tier 2 (exact rescope), two disjoint slices of the impact scan:
      * rescoped BUCKETS — a doc hidden from tier 1 entirely must
        appear in NO query-term champion run, which is only possible
        in a bucket where EVERY run is truncated (a complete run lists
        all of its term's bucket postings); such a doc's score is ≤ the
        bucket's Σ cutoffs. Buckets with n_runs == |q|, n_complete == 0
        and bucket_cut_total ≥ θ are re-scored wholesale.
      * maybe DOCS — candidates with certain == false and
        score_q + error_ub ≥ θ in NON-rescoped buckets join the exact
        scan by doc_id (left-semi; the maybe band is a DataFrame, never
        collected).
    Certain docs outside rescoped buckets pass through from tier 1;
    certain docs inside them re-score to the same value in tier 2 (no
    union dedup needed — the slices partition the docs).

    Driver-side state: the θ probe (≤ k rows) and the bucket census
    (≤ n_buckets rows) — both bounded, per the package's .collect()
    conventions. When every (bucket, term) run fit the champion budget
    the rescope set is empty and the serve never touches `impacts`.

    `diag`, when given, receives rescope_buckets / theta / n_certain /
    n_maybe_rescoped for the scope-containment pytest."""
    uniq = sorted(set(terms))
    empty = impacts.select(
        F.col("doc_id"), F.lit(0).cast("bigint").alias("score_q")
    ).limit(0)
    if not uniq:
        return empty
    n_q = len(uniq)
    scored, census = _champions_and_scored(champions, uniq)

    def rescope(r, theta):
        # only an all-runs-truncated bucket can hide a conjunctive match
        return (
            r["n_runs"] == n_q
            and r["n_complete"] == 0
            and (
                r["bucket_cut_total"] >= theta
                if theta is not None
                else r["bucket_cut_total"] > 0
            )
        )

    return _two_tier_serve(
        impacts, scored, census, uniq, k, n_buckets, diag,
        impacts_bucket_n, rescope, conjunctive_n=n_q,
        fallback_frac=fallback_frac,
    )


def search_champions_and(
    champions: DataFrame,
    terms: list[str],
    k: int = 20,
) -> DataFrame:
    """(doc_id, score_q, error_ub, certain) — CONJUNCTIVE (AND) top-k
    from the persisted champion table, with per-doc certainty: the
    engine's default search mode served from the pruned index.

    The cutoff column makes absence INFORMATIVE: a (bucket, term) run
    with cutoff 0 is COMPLETE (every posting survived the budget), so a
    doc missing from it definitively lacks the term — eliminated. A
    truncated run (cutoff > 0) makes the missing doc a MAYBE whose
    hidden impact is bounded by the cutoff. A query term with NO run in
    the doc's bucket eliminates the whole bucket. Hence per doc d in
    bucket b with seen terms S:

        eliminated  ⇔ some query term is absent-with-certainty
        certain     ⇔ S = q           (score exact, error_ub = 0)
        maybe       ⇔ every unseen term's run is truncated;
                      true_score ∈ [score_q, score_q + error_ub]

    Ordering: certain first, then score_q desc, doc_id asc — a server
    rescopes only the maybe band through the exact path (the same
    two-tier design as the disjunctive variant, but with conjunctive
    eliminations making the band far smaller). Completeness caveat
    shared with the disjunctive variant: a doc whose EVERY query-term
    posting fell below the prefixes is not returned at all — its score
    is bounded by its bucket's Σ cutoffs, the same quantity error_ub
    reports, so the k-th returned score_q exceeding that sum certifies
    the top-k complete. All in-plan: the per-bucket run census
    (complete/truncated/missing counts) is a broadcast of ≤ n_buckets
    rows."""
    uniq = sorted(set(terms))
    empty = champions.select(
        F.col("doc_id"),
        F.lit(0).cast("bigint").alias("score_q"),
        F.lit(0).cast("bigint").alias("error_ub"),
        F.lit(True).alias("certain"),
    ).limit(0)
    if not uniq:
        return empty
    scored, _ = _champions_and_scored(champions, uniq)
    return (
        scored.select("doc_id", "score_q", "error_ub", "certain")
        .orderBy(
            F.col("certain").desc(),
            F.col("score_q").desc(),
            F.col("doc_id").asc(),
        )
        .limit(k)
    )


def champion_lists_from_store(
    blocks: DataFrame,
    term_dict: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    budget_per_bucket: int = CHAMPION_BUDGET,
    n_buckets: int = ANYTIME_BUCKETS,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Champion build folded onto the PERSISTED index (r03-verdict #3):
    identical table to `champion_lists(quantized_impacts(postings, …))`
    but sourced from the committed block store instead of re-tokenizing
    the corpus — the r03 champ build re-ran the whole docs→postings
    pipeline (Arrow tokenize + postings groupBy) just to re-derive rows
    the index already holds.

    Plan: pruned block scan → vectorized numpy decode (blocks.decode_
    blocks, the same path incremental reindex trusts) → the quantize
    map (join df + dl, both index-resident relations) → the bounded
    (doc_bucket, term) champion window. One shuffle keyed by the run
    key; the tokenizer, the corpus scan and the postings groupBy all
    drop out of the build. Measured in BENCH/QUERIES.md."""
    from .blocks import decode_blocks

    postings = decode_blocks(blocks).select("term", "doc_id", "tf")
    imp = quantized_impacts(
        postings, term_dict, doc_stats, n_docs, avgdl, k1, b
    )
    return champion_lists(imp, budget_per_bucket, n_buckets)


def _round6_half_up(x):
    """Vectorized twin of Spark's round(col, 6) on doubles (BigDecimal
    HALF_UP over the shortest decimal representation). The fast path is
    plain scale-and-compare; values within 1e-7 of a .5 boundary — where
    the *1e6 scaling itself could cross the edge — re-round through
    Decimal(repr(x)), which matches Java's Double.toString shortest
    round-trip digits. Inputs are the nonnegative BM25 partials (< ~100),
    so the 1e-7 guard band safely exceeds the scaling error."""
    import numpy as np

    y = x * 1e6
    f = np.floor(y)
    frac = y - f
    out = np.where(frac >= 0.5, f + 1.0, f) / 1e6
    sus = np.abs(frac - 0.5) < 1e-7
    if sus.any():
        from decimal import ROUND_HALF_UP, Decimal

        q = Decimal("0.000001")
        for i in np.nonzero(sus)[0]:
            out[i] = float(
                Decimal(repr(float(x[i]))).quantize(q, ROUND_HALF_UP)
            )
    return out


def champion_lists_fused(
    blocks: DataFrame,
    term_dict: DataFrame,
    n_docs: int,
    avgdl: float,
    budget_per_bucket: int = CHAMPION_BUDGET,
    n_buckets: int = ANYTIME_BUCKETS,
    store_n_buckets: int | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
    level_cap_factor: float = LEVEL_CAP_FACTOR,
) -> DataFrame:
    """Champion build as ONE pass over the compressed block store — the
    r03-verdict #3 fold, final form: no posting explode, no corpus-scale
    join, no corpus-scale window. Emits the bit-identical table to
    `champion_lists(quantized_impacts(postings, …))` (pinned by test and
    by the shared `search_champions` oracle mirror).

    Why no corpus-scale work is needed: a block row already carries the
    run's (doc_ids, tfs, DLS) — dl_bytes ships per posting, so the
    doc_stats join drops out; df rides a VOCAB-scale join (blocks ⋈
    term_dict on term — both |vocab|·n_buckets-ish relations, never the
    corpus); quantization and top-budget selection happen in numpy
    inside one applyInPandas over groupBy(doc_bucket, term) — the only
    shuffle moves the COMPRESSED blocks (≈ index_bytes, 6× smaller than
    raw postings), not 224M decoded rows. Measured vs the decode→join→
    window path in BENCH/QUERIES.md.

    Sharding contract: champion runs must nest inside stored block
    buckets, i.e. n_buckets % store_n_buckets == 0 (equal by default).
    With n_buckets a strict multiple, each group splits its postings by
    doc_id % n_buckets and selects per sub-run. Rounding matches Spark's
    round(…, 6) exactly (see _round6_half_up)."""
    import math

    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .codec import decode_payload, delta_decode

    store_n = store_n_buckets if store_n_buckets is not None else n_buckets
    if n_buckets % store_n != 0:
        raise ValueError(
            f"champion n_buckets={n_buckets} must be a multiple of the "
            f"store's {store_n} (runs must nest inside stored buckets)"
        )
    n = float(n_docs)
    k1p1 = k1 + 1.0
    one_minus_b = 1.0 - b
    avg = float(avgdl)
    budget = int(budget_per_bucket)
    cap_rows = int(level_cap_factor * budget)
    nb = int(n_buckets)

    out_schema = T.StructType(
        [
            T.StructField("doc_bucket", T.IntegerType(), False),
            T.StructField("term", T.StringType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("impact", T.IntegerType(), False),
            T.StructField("cutoff", T.IntegerType(), False),
        ]
    )

    def _champ(pdf: pd.DataFrame) -> pd.DataFrame:
        ids_p, tf_p, dl_p = [], [], []
        for row in pdf.itertuples(index=False):
            ids_p.append(delta_decode(decode_payload(row.doc_bytes, row.count)))
            tf_p.append(decode_payload(row.tf_bytes, row.count))
            dl_p.append(decode_payload(row.dl_bytes, row.count))
        ids = np.concatenate(ids_p)
        tfd = np.concatenate(tf_p).astype(np.float64)
        dld = np.concatenate(dl_p).astype(np.float64)
        dfv = float(pdf["df"].iloc[0])
        idf = math.log(1.0 + ((n - dfv) + 0.5) / (dfv + 0.5))
        # identical operation ORDER to quantized_impacts' column expr
        part = (idf * (tfd * k1p1)) / (
            tfd + k1 * (one_minus_b + (b * dld) / avg)
        )
        imp = np.minimum(
            QUANT_LEVELS - 1, np.floor(_round6_half_up(part) * QUANT_SCALE)
        ).astype(np.int64)
        term = pdf["term"].iloc[0]
        cb = (ids % nb).astype(np.int64)
        frames = []
        for c in np.unique(cb):
            m = cb == c
            cids, cimp = ids[m], imp[m]
            order = np.lexsort((cids, -cimp))
            if order.size > budget:
                # level-aligned cut — identical rule to champion_lists
                # (see LEVEL_CAP_FACTOR): v = budget-th impact; keep the
                # whole boundary level when its extent fits the cap
                v = int(cimp[order[budget - 1]])
                n_ge = int((cimp >= v).sum())
                if n_ge <= cap_rows:
                    kept = order[:n_ge]
                    # floor 1: cutoff==0 must mean COMPLETE (see
                    # champion_lists)
                    cut = 0 if n_ge == order.size else max(1, v - 1)
                else:
                    kept = order[:budget]
                    cut = max(1, v)
            else:
                kept = order
                cut = 0
            frames.append(
                pd.DataFrame(
                    {
                        "doc_bucket": np.full(kept.size, c, dtype=np.int32),
                        "term": term,
                        "doc_id": cids[kept],
                        "impact": cimp[kept].astype(np.int32),
                        "cutoff": np.full(kept.size, cut, dtype=np.int32),
                    }
                )
            )
        if not frames:
            return pd.DataFrame(
                {
                    "doc_bucket": np.empty(0, dtype=np.int32),
                    "term": pd.Series([], dtype=object),
                    "doc_id": np.empty(0, dtype=np.int64),
                    "impact": np.empty(0, dtype=np.int32),
                    "cutoff": np.empty(0, dtype=np.int32),
                }
            )
        return pd.concat(frames, ignore_index=True)

    df_map = term_dict.select("term", "df")
    joined = blocks.select(
        "doc_bucket", "term", "count", "doc_bytes", "tf_bytes", "dl_bytes"
    ).join(df_map, "term")
    return joined.groupBy("doc_bucket", "term").applyInPandas(
        _champ, out_schema
    )


def impacts_from_blocks(
    blocks: DataFrame,
    term_dict: DataFrame,
    n_docs: int,
    avgdl: float,
    terms: list[str] | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """(term, doc_id, impact, doc_bucket) derived ON DEMAND from the
    committed block store — bit-identical values to `quantized_impacts`
    (shared arithmetic, pinned by test) with NO second materialized
    impact table and NO corpus-scale join: dl comes from the blocks' own
    dl_bytes (decode_blocks_with_dl), df from a vocab-scale term_dict
    join, and an optional `terms` list filters the BLOCK SCAN itself
    (pushed In(term) + row-group stats on the term-sorted layout), so a
    query decodes only its own runs.

    This is the two-tier exact tier's scale-correct input: at 10^12
    docs you do not write a second postings-sized impacts table — you
    re-derive the few runs a rescope touches from the index you already
    have. doc_bucket is the STORE bucket (valid as the champion bucket
    whenever the two shardings match, the default)."""
    from .blocks import decode_blocks_with_dl

    src = blocks
    if terms is not None:
        uniq = sorted(set(terms))
        src = blocks.filter(F.col("term").isin(uniq))
    decoded = decode_blocks_with_dl(src)
    idf, quant = _quant_impact_col(n_docs, avgdl, k1, b)
    return (
        decoded.join(term_dict.select("term", "df"), "term")
        .withColumn("idf", idf)
        .select(
            "term",
            "doc_id",
            quant.cast("int").alias("impact"),
            "doc_bucket",
        )
    )


def refresh_champions(
    champions: DataFrame,
    blocks: DataFrame,
    term_dict: DataFrame,
    n_docs: int,
    avgdl: float,
    touched_buckets: list[int],
    budget_per_bucket: int = CHAMPION_BUDGET,
    n_buckets: int = ANYTIME_BUCKETS,
    store_n_buckets: int | None = None,
    k1: float = K1_DEFAULT,
    b: float = B_DEFAULT,
) -> DataFrame:
    """Incremental champion maintenance after a partial reindex: replace
    ONLY the runs of the touched store buckets (incremental.reindex_docs
    returns them) with a fresh one-pass fused rebuild over those
    buckets' blocks; every other champion row passes through untouched.

    Stats epoch semantics: pass the BUILD-EPOCH corpus stats (n_docs,
    avgdl, the epoch term_dict) — impact values depend on global df /
    avgdl, so refreshing touched buckets under the epoch stats keeps the
    whole table internally consistent with the original build, exactly
    like a Lucene segment index serves slightly-stale idf until a
    stats refresh; re-epoch (full champion rebuild, 19-29 s at 10M docs)
    on whatever cadence stats drift warrants. Pinned by test: refreshed
    == full fused rebuild on the updated blocks under the same epoch,
    bit-for-bit, and untouched buckets' rows are preserved verbatim.

    Plan shape: the touched-bucket filter prunes the block scan to the
    reindexed partitions (blocks are stored partitioned by doc_bucket),
    so the refresh costs O(touched buckets' block bytes) — per-page
    reindex touches one bucket."""
    store_n = store_n_buckets if store_n_buckets is not None else n_buckets
    if n_buckets % store_n != 0:
        raise ValueError(
            f"champion n_buckets={n_buckets} must be a multiple of the "
            f"store's {store_n}"
        )
    touched = sorted(set(int(x) for x in touched_buckets))
    if not touched:
        return champions
    fresh = champion_lists_fused(
        blocks.filter(F.col("doc_bucket").isin(touched)),
        term_dict,
        n_docs,
        avgdl,
        budget_per_bucket=budget_per_bucket,
        n_buckets=n_buckets,
        store_n_buckets=store_n,
    )
    # champion buckets nest inside store buckets (factor m = nb/store_n):
    # champion bucket c belongs to store bucket c % store_n
    kept = champions.filter(
        ~F.pmod(F.col("doc_bucket"), F.lit(store_n)).isin(touched)
    )
    return kept.unionByName(fresh)


def search_two_tier_or(
    impacts: DataFrame,
    champions: DataFrame,
    terms: list[str],
    k: int = 20,
    n_buckets: int = ANYTIME_BUCKETS,
    diag: dict | None = None,
    impacts_bucket_n: int | None = None,
    fallback_frac: float = 0.5,
) -> DataFrame:
    """(doc_id, score_q) — the DISJUNCTIVE two-tier serve, pinned
    value-identical to `search_impact` (the exact OR ranking) by the
    shared oracle mirror. Same machinery as `search_two_tier`
    (_two_tier_serve) with the OR certainty algebra:

      * certain ⇔ error_ub == 0 — the doc was seen in EVERY truncated
        run of its bucket (complete runs it is absent from contribute
        exactly 0 to an OR score, so absence there costs nothing);
      * a hidden doc (in no champion run) lacks every complete run's
        term entirely, so its score is bounded by the bucket's Σ
        truncated-run cutoffs = bucket_cut_total — rescope the bucket
        when that crosses θ (no all-runs-truncated precondition: OR has
        no conjunctive elimination and no match-all filter);
      * maybe docs (error_ub > 0, score_q + error_ub ≥ θ) rescope
        per-doc via left-semi join, outside rescoped buckets."""
    uniq = sorted(set(terms))
    empty = impacts.select(
        F.col("doc_id"), F.lit(0).cast("bigint").alias("score_q")
    ).limit(0)
    if not uniq:
        return empty
    cand = champions.filter(F.col("term").isin(uniq))
    runs = cand.select("doc_bucket", "term", "cutoff").distinct()
    census = runs.groupBy("doc_bucket").agg(
        F.sum("cutoff").alias("bucket_cut_total"),
    )
    scored = (
        cand.groupBy("doc_id", "doc_bucket")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.sum("cutoff").alias("seen_cut_total"),
        )
        .join(F.broadcast(census), "doc_bucket")
        .select(
            "doc_id",
            "doc_bucket",
            "score_q",
            (F.col("bucket_cut_total") - F.col("seen_cut_total"))
            .cast("bigint")
            .alias("error_ub"),
        )
        .withColumn("certain", F.col("error_ub") == 0)
    )

    def rescope(r, theta):
        return (
            r["bucket_cut_total"] >= theta
            if theta is not None
            else r["bucket_cut_total"] > 0
        )

    return _two_tier_serve(
        impacts, scored, census, uniq, k, n_buckets, diag,
        impacts_bucket_n, rescope, conjunctive_n=None,
        fallback_frac=fallback_frac,
    )


def search_champions_batch(
    spark,
    champions: DataFrame,
    queries: dict[str, list[str]],
    k: int = 20,
) -> DataFrame:
    """(query_id, doc_id, score_q, error_ub) — a whole query WORKLOAD
    served from the persisted champion table in ONE pass: top-k per
    query with the same bounded-error semantics as `search_champions`
    (pinned per-query-equal by test, and by the shared-arithmetic
    oracle mirror).

    Shape (the batch twin of search_bm25_batch, on the pruned tier):
    the (query_id, term) workload relation broadcasts into one join
    against the champion scan filtered to the UNION term set — champion
    runs are per-term independent, so sharing rows between queries is
    free — then per-(query, doc) integer sums, a broadcast per-(query,
    bucket) cutoff census, and a WindowGroupLimit top-k partitioned by
    query_id (bounded by the workload, never a global sort). N dashboard
    queries cost one scan of a vocabulary-bound table instead of N."""
    from pyspark.sql import Window

    qt_rows = [
        (qid, t)
        for qid in sorted(queries)
        for t in sorted(set(queries[qid]))
    ]
    empty = champions.sparkSession.createDataFrame(
        [], "query_id string, doc_id long, score_q bigint, error_ub bigint"
    )
    if not qt_rows:
        return empty
    qt = spark.createDataFrame(qt_rows, "query_id string, term string")
    union_terms = sorted({t for _, t in qt_rows})
    cand = champions.filter(F.col("term").isin(union_terms)).join(
        F.broadcast(qt), "term"
    )
    runs = cand.select(
        "query_id", "doc_bucket", "term", "cutoff"
    ).distinct()
    census = runs.groupBy("query_id", "doc_bucket").agg(
        F.sum("cutoff").alias("bucket_cut_total")
    )
    scored = (
        cand.groupBy("query_id", "doc_id", "doc_bucket")
        .agg(
            F.sum("impact").cast("bigint").alias("score_q"),
            F.sum("cutoff").alias("seen_cut_total"),
        )
        .join(F.broadcast(census), ["query_id", "doc_bucket"], "left")
        .select(
            "query_id",
            "doc_id",
            "score_q",
            (
                F.coalesce(F.col("bucket_cut_total"), F.lit(0))
                - F.col("seen_cut_total")
            )
            .cast("bigint")
            .alias("error_ub"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_q").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# ------------------------------------------------ resumable champion build

class ChampionBuildFailed(RuntimeError):
    pass


def build_champions_persistent(
    store,
    champions_dir: str,
    budget_per_bucket: int = CHAMPION_BUDGET,
    n_buckets: int | None = None,
    groups: int = 1,
    fail_after_groups: int | None = None,
) -> dict:
    """Checkpoint-resumable champion build with per-bucket lineage — the
    north-rule resumability contract, extended to the serving artifact.

    Commit unit = one STORE bucket's champion runs (the fused build's
    natural partition): each unit is one partition-pruned
    `champion_lists_fused` pass over that bucket's blocks written to
    ``{champions_dir}/sb=<bucket>`` with parquet's own _SUCCESS marker
    as the commit record. A killed build resumes by skipping committed
    buckets; `meta.json` pins the epoch (corpus fingerprint + stats +
    budget + sharding), and a fingerprint/config mismatch invalidates
    every bucket rather than silently mixing epochs. Returns
    {build_id, built, skipped}.

    groups: commit units are batched into this many write rounds (the
    checkpoint granularity, as in catalog.build_persistent).
    fail_after_groups: test hook — raise after N committed groups to
    simulate a mid-build kill."""
    import json
    import os
    import shutil
    import uuid

    spark = store.spark
    stats = store.read_corpus_stats()
    nb = n_buckets if n_buckets is not None else store.n_buckets
    if nb % store.n_buckets != 0:
        raise ValueError(
            f"champion n_buckets={nb} must be a multiple of the store's "
            f"{store.n_buckets}"
        )
    meta = {
        "fingerprint": stats.get("fingerprint"),
        "n_docs": stats["n_docs"],
        "avgdl": stats["avgdl"],
        "budget_per_bucket": int(budget_per_bucket),
        "n_buckets": int(nb),
        "store_n_buckets": int(store.n_buckets),
        # the cut rule IS part of the epoch: a dir built under a
        # different pruning rule (pre-r05 strict top-budget, or a
        # different cap) must invalidate rather than resume into a
        # mixed-rule table (r05 review finding)
        "cut_rule": "level_aligned",
        "level_cap_factor": LEVEL_CAP_FACTOR,
    }
    meta_path = f"{champions_dir}/meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as fh:
            old = json.load(fh)
        if old != meta:
            # epoch/config changed: never mix — restart from scratch
            shutil.rmtree(champions_dir)
    os.makedirs(champions_dir, exist_ok=True)
    if not os.path.exists(meta_path):
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)

    def _committed(b: int) -> bool:
        return os.path.exists(f"{champions_dir}/sb={b}/_SUCCESS")

    build_id = uuid.uuid4().hex[:12]
    all_b = list(range(store.n_buckets))
    missing = [b for b in all_b if not _committed(b)]
    skipped = [b for b in all_b if b not in missing]
    td = store.read_term_dict()
    done_groups = 0
    built: list[int] = []
    n_groups = max(1, min(groups, len(missing)))
    chunks = [missing[i::n_groups] for i in range(n_groups)]
    for chunk in chunks:
        if not chunk:
            continue
        for b in chunk:
            champs = champion_lists_fused(
                store.read_blocks().filter(F.col("doc_bucket") == b),
                td,
                stats["n_docs"],
                float(stats["avgdl"]),
                budget_per_bucket=budget_per_bucket,
                n_buckets=nb,
                store_n_buckets=store.n_buckets,
            )
            champs.write.mode("overwrite").parquet(
                f"{champions_dir}/sb={b}"
            )
            built.append(b)
        done_groups += 1
        if fail_after_groups is not None and done_groups >= fail_after_groups:
            raise ChampionBuildFailed(
                f"simulated kill after {done_groups} groups"
            )
    return {"build_id": build_id, "built": built, "skipped": skipped}


def read_champions_persistent(spark, champions_dir: str) -> DataFrame:
    """The committed champion table (union of per-bucket partitions) —
    the same 5-column relation `champion_lists_fused` emits. REFUSES a
    partial build: a killed build leaves some buckets uncommitted, and
    serving the committed subset would silently misreport absent runs
    as term-has-no-postings (r04 review finding); meta.json records the
    expected store bucket count, and every bucket must carry _SUCCESS."""
    import json
    import os

    with open(f"{champions_dir}/meta.json") as fh:
        meta = json.load(fh)
    missing = [
        b
        for b in range(int(meta["store_n_buckets"]))
        if not os.path.exists(f"{champions_dir}/sb={b}/_SUCCESS")
    ]
    if missing:
        raise ChampionBuildFailed(
            f"champion store incomplete: buckets {missing} uncommitted "
            f"(resume with build_champions_persistent)"
        )
    return spark.read.option("basePath", champions_dir).parquet(
        f"{champions_dir}/sb=*"
    ).select("doc_bucket", "term", "doc_id", "impact", "cutoff")
