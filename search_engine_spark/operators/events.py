"""Event-stream operators — tumbling windows, sessionization, JSON props.

The reference has no time semantics (SURVEY §2.F: streaming "none"), but a
web-scale ingestion engine meets event logs (crawl telemetry, click
feedback) constantly; these are the Spark-first operators for the driver's
``events`` table (event_id, ts, user_id, event_type, value, props-json).

All three are single-shuffle DataFrame plans with DuckDB oracle mirrors
(functions/oracle_pipeline.py). The same tumbling aggregation runs under
Structured Streaming with a watermark in streaming/stream_events.py —
batch and stream share this module's column logic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_GAP_MIN = 30


def windowed_counts(events: DataFrame) -> DataFrame:
    """Tumbling 1-hour event-time aggregation:
    (win_start, event_type, n, sum_value). The canonical pre-aggregation
    for dashboard/rollup serving; map-side partial aggs make the shuffle
    one row per (hour, type)."""
    return (
        events.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            # DECIMAL sum: double summation order differs between engines
            # and a 4-dp round can land on a half-point; decimal is exact
            # exact decimal sum, presented as double (identical on both
            # engines since it derives from the same exact decimal)
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def _with_session_ids(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """events + session_id: the ONE definition of the gap-based session
    boundary (a new session when a user's inter-event gap exceeds
    gap_min minutes), shared by every session-scoped surface so the
    session populations cannot drift between them."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_min * 60 * 1_000_000
    # microsecond-exact epoch on both engines (a seconds-truncated cast
    # would disagree with the oracle on sub-second gap boundaries);
    # TIMESTAMP_NTZ first pins to the UTC session zone
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    with_flag = events.withColumn(
        "new_session",
        (ts_us - F.lag(ts_us, 1).over(w) > gap_us).cast("int"),
    ).withColumn(
        "new_session", F.coalesce("new_session", F.lit(1))
    )
    return with_flag.withColumn(
        "session_id", F.sum("new_session").over(w)
    ).drop("new_session")


def sessionize(events: DataFrame, gap_min: int = SESSION_GAP_MIN) -> DataFrame:
    """Gap-based sessionization per user: one row per session —
    (user_id, session_id, n_events, start_ts, end_ts).

    Shuffle-wise this is ONE repartition by user_id feeding two stacked
    window functions (lag → running sum) — the standard distributed
    sessionization; user_id count bounds state, no skew concern here."""
    return _with_session_ids(events, gap_min).groupBy(
        "user_id", "session_id"
    ).agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("start_ts"),
        F.max("ts").alias("end_ts"),
    )


def props_extract(events: DataFrame) -> DataFrame:
    """JSON property extraction: (event_id, k). The engine treats the
    props column as semi-structured payload; get_json_object stays
    JVM-side (Jackson), no UDF."""
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


def type_rollup(events: DataFrame) -> DataFrame:
    """Per-type daily rollup with distinct users — the A1-style statistics
    shape over the event stream: (day, event_type, n, users, sum_value)."""
    return (
        events.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.count_distinct("user_id").alias("users"),
            # exact decimal sum, presented as double (identical on both
            # engines since it derives from the same exact decimal)
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("sum_value"),
        )
    )


ATTRIBUTION_WINDOW_SECS = 3600


def attribution_pairs(
    events: DataFrame, window_secs: int = ATTRIBUTION_WINDOW_SECS
) -> DataFrame:
    """Interval self-join → (view_id, click_id, user_id, lag_s): every
    (view, click) pair by the same user where the click lands in
    [view.ts, view.ts + window_secs] — the raw attribution relation of
    every ads/analytics pipeline, and the batch twin of the
    stream-stream interval join (streaming/stream_attribution.py).

    Plan: both sides filter by event_type FIRST (scan-level pruning),
    the join is an equi-join on user_id with the time bound as a
    residual range predicate — per-user data, maximal-cardinality key,
    no broadcast of either corpus-sized side. lag_s is exact integer
    epoch arithmetic (no float)."""
    return _attribution_pairs_us(events, window_secs).select(
        "view_id",
        "click_id",
        "user_id",
        (F.col("lag_us") / F.lit(1_000_000)).cast("long").alias("lag_s"),
    )


def _attribution_pairs_us(
    events: DataFrame, window_secs: int
) -> DataFrame:
    """attribution_pairs with the UNtruncated microsecond lag — the
    ordering key last-touch needs (two views inside the same whole
    second truncate to equal lag_s; ordering by that would let the
    view_id tiebreak credit the EARLIER view)."""
    # microsecond-exact epochs (same emitter as sessionize: unix_micros
    # over the NTZ->timestamp cast, session TZ pinned to UTC)
    v_us = F.unix_micros(F.col("ts").cast("timestamp"))
    v = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        v_us.alias("v_us"),
    )
    c = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        v_us.alias("c_us"),
    )
    w_us = int(window_secs) * 1_000_000
    return (
        v.join(c, "user_id")
        .filter(
            (F.col("c_us") >= F.col("v_us"))
            & (F.col("c_us") <= F.col("v_us") + w_us)
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            (F.col("c_us") - F.col("v_us")).alias("lag_us"),
        )
    )


def last_touch_attribution(
    events: DataFrame, window_secs: int = ATTRIBUTION_WINDOW_SECS
) -> DataFrame:
    """Last-touch attribution → (click_id, user_id, view_id, lag_s):
    each click credited to the LATEST qualifying view (max view ts; ties
    → highest view_id — pinned total order). One max_by aggregation over
    the pair relation: map-side partial agg forwards one candidate per
    click per partition, no per-click window sort.

    The election key is the MICROSECOND lag, not the emitted whole-second
    lag_s — two views in the same second truncate to equal lag_s, and
    breaking that tie by view_id could credit the earlier view."""
    pairs = _attribution_pairs_us(events, window_secs).withColumn(
        "lag_s", (F.col("lag_us") / F.lit(1_000_000)).cast("long")
    )
    best = F.max_by(
        F.struct(F.col("view_id"), F.col("lag_s")),
        # latest view == smallest microsecond lag; maximize (-lag_us, id)
        F.struct((-F.col("lag_us")).alias("k1"), F.col("view_id").alias("k2")),
    ).alias("b")
    return (
        pairs.groupBy("click_id", "user_id")
        .agg(best)
        .select(
            "click_id",
            "user_id",
            F.col("b.view_id").alias("view_id"),
            F.col("b.lag_s").alias("lag_s"),
        )
    )


N_SERP_POSITIONS = 10


def coec_scores(
    events: DataFrame,
    n_positions: int = N_SERP_POSITIONS,
    min_views: int = 1,
) -> DataFrame:
    """COEC — Clicks Over Expected Clicks (Zhang & Jones 2007), the
    position-bias-corrected click-through rate used to mine relevance
    feedback from search logs: raw CTR rewards items shown at high SERP
    positions; COEC divides an item's clicks by the clicks EXPECTED
    from its impression positions under the global position prior:

        prior(p)  = clicks_at(p) / views_at(p)
        EC(item)  = Σ over the item's view events of prior(position)
        COEC      = clicks(item) / EC(item)      (> 1 → beats its slots)

    Derivations on the synthetic log: item = props.k, position =
    (event_id % n_positions) + 1 — deterministic, mirrored in the
    oracle. Items with < min_views views drop (COEC of a sparse item
    is noise; EC > 0 is also guaranteed since every view's position
    prior exists — the view itself counts in the prior's denominator).

    Output: (k, views, clicks, expected_clicks, coec) ranked coec desc,
    k asc. Scale shape: two map-side-combinable aggregations (position
    priors — n_positions rows — then per-item), one broadcast-sized
    prior join; the events table streams through exactly twice with a
    two-column projection, no window, no UDF.
    """
    base = events.filter(
        F.col("event_type").isin("view", "click")
    ).select(
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        ((F.col("event_id") % n_positions) + 1).alias("pos"),
        (F.col("event_type") == "click").cast("long").alias("is_click"),
        (F.col("event_type") == "view").cast("long").alias("is_view"),
    )
    prior = (
        base.groupBy("pos")
        .agg(
            F.sum("is_click").alias("c_p"),
            F.sum("is_view").alias("v_p"),
        )
        .filter(F.col("v_p") > 0)
        .select(
            "pos", (F.col("c_p") / F.col("v_p")).alias("prior")
        )
    )
    per_item = (
        base.join(F.broadcast(prior), "pos", "left")
        .groupBy("k")
        .agg(
            F.sum("is_view").alias("views"),
            F.sum("is_click").alias("clicks"),
            F.sum(
                F.col("is_view") * F.coalesce(F.col("prior"), F.lit(0.0))
            ).alias("ec"),
        )
        .filter(F.col("views") >= int(min_views))
    )
    return (
        per_item.select(
            "k",
            "views",
            "clicks",
            F.round(F.col("ec"), 4).alias("expected_clicks"),
            F.round(F.col("clicks") / F.col("ec"), 4).alias("coec"),
        )
        .orderBy(F.col("coec").desc(), F.col("k").asc())
    )


def item_transitions(
    events: DataFrame,
    gap_min: int = SESSION_GAP_MIN,
    limit: int = 50,
) -> DataFrame:
    """Query-flow-graph edge mining (Boldi et al., CIKM'08 "The
    query-flow graph") → (prev_k, next_k, n): within one user's stream,
    consecutive `view` events whose gap is ≤ gap_min minutes form a
    directed transition between their items (props.k — the stand-in for
    the query/page id); corpus-wide counts are the flow-graph edge
    weights. Self-loops are dropped (a re-view is a refresh, not a
    reformulation). Top `limit` edges, count desc with a pinned (prev,
    next) tiebreak.

    Plan: one repartition by user_id feeding a lag window over the
    view-filtered stream, then one combinable groupBy on the edge key —
    the same two-exchange shape as sessionize; per-user state is two
    scalar lags, no skew concern."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = gap_min * 60 * 1_000_000
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    views = events.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )
    trans = (
        views.withColumn("prev_k", F.lag("k", 1).over(w))
        .withColumn("gap_us", ts_us - F.lag(ts_us, 1).over(w))
        .filter(
            F.col("prev_k").isNotNull()
            & (F.col("gap_us") <= gap_us)
            & (F.col("prev_k") != F.col("k"))
        )
    )
    return (
        trans.groupBy(
            F.col("prev_k"), F.col("k").alias("next_k")
        )
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("prev_k").asc(), F.col("next_k").asc())
        .limit(int(limit))
    )


def session_abandonment(
    events: DataFrame, gap_min: int = SESSION_GAP_MIN
) -> DataFrame:
    """Search-abandonment analytics → per day of session start:
    (day, sessions, engaged, abandoned, abandonment_rate). A session
    ABANDONS when it contains ≥1 `view` but no `click` — the classic
    SERP-abandonment proxy; ENGAGED sessions have ≥1 click. Sessions are
    the same gap-based ids `sessionize` builds (shared window logic, so
    the two surfaces can never drift). Rate = abandoned/sessions rounded
    4 dp.

    Plan: sessionize's repartition-by-user + stacked windows (the SHARED
    `_with_session_ids` subtree — one definition of the session
    boundary), then per (user, session) conditional flags in ONE
    combinable groupBy, then the tiny per-day rollup."""
    per_session = _with_session_ids(events, gap_min).groupBy(
        "user_id", "session_id"
    ).agg(
        F.min("ts").alias("start_ts"),
        F.max((F.col("event_type") == "view").cast("int")).alias("has_view"),
        F.max((F.col("event_type") == "click").cast("int")).alias("has_click"),
    )
    return (
        per_session.groupBy(F.date_trunc("day", "start_ts").alias("day"))
        .agg(
            F.count("*").alias("sessions"),
            F.sum(F.col("has_click")).cast("long").alias("engaged"),
            F.sum(
                ((F.col("has_view") == 1) & (F.col("has_click") == 0)).cast("int")
            ).cast("long").alias("abandoned"),
        )
        .withColumn(
            "abandonment_rate",
            F.round(
                F.col("abandoned").cast("double") / F.col("sessions"), 4
            ),
        )
        .orderBy("day")
    )


def rate_agg(events: DataFrame) -> DataFrame:
    """ES `rate` aggregation inside a daily date_histogram →
    (day, n, rate_per_hour, value_per_day): the count normalized to the
    per-hour unit (ES semantics: bucket total / bucket span in units)
    plus the DECIMAL-exact value sum per day. Only the INTEGER count is
    divided: n·10⁴/24 can never land on a rounding half-point (10⁴ ≡ 16
    mod 24 and 16n mod 24 ∈ {0, 8, 16}), whereas a 2-dp value sum / 24
    does (measured: 60.45125 rounded differently by the two engines) —
    so the value rate is exposed at the exact per-day unit instead. One
    map-side-combinable groupBy."""
    return (
        events.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("_sv"),
        )
        .select(
            "day",
            F.col("n").cast("long").alias("n"),
            F.round(F.col("n").cast("double") / 24.0, 4).alias(
                "rate_per_hour"
            ),
            F.col("_sv").alias("value_per_day"),
        )
    )


def variable_width_histogram(
    events: DataFrame, buckets: int = 4
) -> DataFrame:
    """ES `variable_width_histogram` over `value` → one row per cluster
    (bucket, n, min_v, max_v, avg_v): values clustered into `buckets`
    equal-frequency groups split at exact interpolated quantiles — a
    DETERMINISTIC spec where ES uses a streaming nearest-neighbor
    heuristic (same upgrade as boxplot's exact-vs-TDigest choice).

    Exactness across engines: values quantize to integer CENTS first
    (inputs carry 2 decimals), so the quantile interpolation and every
    boundary comparison is integer-exact arithmetic (Spark `percentile`
    == DuckDB quantile_cont on ints, the boxplot precedent); bucket id
    = 1 + Σ (cents > cut_i) — a codegen map, NO global sort/window.
    Cut collection is ≤ buckets−1 driver rows. avg rounds 4 dp with the
    shared (sum/n)/100 operation order."""
    cents = F.round(F.col("value") * 100).cast("long")
    v = events.select(cents.alias("v"))
    qs = [i / buckets for i in range(1, buckets)]
    # buckets=1 (valid in ES) has no cuts to probe — everything is
    # cluster 1, and an empty agg(*[]) would be rejected by Spark
    # (r05 self-review); empty input still yields an empty frame
    # (groupBy over zero rows), all-null input one bucket-1 row with
    # null stats — both matching the mirror's degenerate form
    cuts_row = (
        v.agg(
            *[
                F.expr(f"percentile(v, {q!r})").alias(f"c{i}")
                for i, q in enumerate(qs)
            ]
        ).collect()[0]
        if qs
        else None
    )
    if qs and any(cuts_row[i] is None for i in range(len(qs))):
        # the percentile aggregate returns NULL cuts in two cases, and
        # the DuckDB mirror treats them differently (r04 ADVICE fix,
        # corrected in r05 self-review): an EMPTY table CROSS JOINs to
        # zero rows; an all-NULL `value` column keeps its rows, whose
        # NULL > NULL comparisons group into ONE null-bucket row with
        # null min/max/avg — letting the null cuts flow through the
        # expression below reproduces exactly that.
        if v.limit(1).count() == 0:
            return v.limit(0).select(
                F.lit(1).cast("int").alias("bucket"),
                F.lit(0).cast("long").alias("n"),
                F.lit(0.0).alias("min_v"),
                F.lit(0.0).alias("max_v"),
                F.lit(0.0).alias("avg_v"),
            )
        cut_cols = [F.lit(None).cast("long") for _ in qs]
    else:
        cut_cols = [
            F.lit(float(cuts_row[i])) for i in range(len(qs))
        ]
    bucket = F.lit(1)
    for c in cut_cols:
        bucket = bucket + (F.col("v") > c).cast("int")
    return (
        v.withColumn("bucket", bucket.cast("int"))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n"),
            (F.min("v").cast("double") / 100.0).alias("min_v"),
            (F.max("v").cast("double") / 100.0).alias("max_v"),
            F.sum("v").cast("double").alias("_sum"),
        )
        .select(
            "bucket",
            "n",
            "min_v",
            "max_v",
            F.round(
                F.col("_sum") / F.col("n").cast("double") / 100.0, 4
            ).alias("avg_v"),
        )
    )


def change_point(events: DataFrame) -> DataFrame:
    """ES `change_point` (ML) on the daily event-count series → ONE row
    (change_day, diff): the split maximizing the absolute difference of
    the left/right segment mean counts — a deterministic mean-shift
    detector where ES runs its ML heuristics (the same exact-spec
    upgrade as variable_width_histogram). change_day = first day of the
    right segment; ties break earliest day.

    Shape: one daily groupBy, then windows over the DAILY series only
    (bounded: one row per calendar day — the pipeline-agg precedent),
    never over events. Means are exact-integer divisions in a shared
    operation order; diff rounds 4 dp before the argmax ordering."""
    from pyspark.sql import Window

    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = daily.select(
        "day",
        F.sum("n").over(w).alias("cum_n"),
        F.row_number().over(Window.orderBy("day")).alias("i"),
        F.sum("n").over(w_all).alias("tot"),
        F.count("*").over(w_all).alias("m"),
    )
    cand = cum.select(
        "day",
        "i",
        "m",
        "cum_n",
        "tot",
        F.lead("day", 1).over(Window.orderBy("day")).alias("change_day"),
    ).filter(F.col("i") < F.col("m")).select(
        "day",
        "change_day",
        F.round(
            F.abs(
                F.col("cum_n").cast("double") / F.col("i").cast("double")
                - (F.col("tot") - F.col("cum_n")).cast("double")
                / (F.col("m") - F.col("i")).cast("double")
            ),
            4,
        ).alias("diff"),
    )
    return (
        cand.orderBy(F.col("diff").desc(), F.col("day").asc())
        .select("change_day", "diff")
        .limit(1)
    )


def cumulative_cardinality(events: DataFrame) -> DataFrame:
    """ES x-pack `cumulative_cardinality` pipeline agg over the daily
    date histogram → (day, new_users, total_users): how many DISTINCT
    users have been seen up to and including each day — the
    incremental-reach curve (ES docs motivate it with exactly this
    "new daily visitors" case).

    Exactness upgrade over ES (which stacks the agg on per-bucket HLL
    sketches): total cardinality through day D equals the count of
    users whose FIRST-SEEN day ≤ D, so one map-side-combinable
    min(day) per user + one bounded daily series gives the EXACT curve
    — no sketch, no per-bucket distinct-union. Days with events but no
    new users still emit a row (new_users = 0, total unchanged), the ES
    histogram contract.

    Plan: user-keyed groupBy(min) reduces the corpus to one row per
    user; both the first-seen counts and the histogram days are
    bounded daily series, merged and cumulated via the same
    collect-into-one-sorted-array pattern as datehist_pipeline (≤
    time-span rows — no corpus-scale Window)."""
    day = F.date_trunc("day", F.col("ts")).alias("day")
    first_seen = (
        events.select(F.col("user_id"), day)
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("nu"))
    )
    days = events.select(day).distinct()
    merged = days.join(first_seen, "day", "left").select(
        "day", F.coalesce(F.col("nu"), F.lit(0)).cast("long").alias("nu")
    )
    xs = F.array_sort(
        F.collect_list(F.struct(F.col("day").alias("d"),
                                F.col("nu").alias("u")))
    )
    rows = merged.agg(xs.alias("xs")).select(
        F.col("xs"), F.posexplode("xs").alias("_pos", "_x")
    )
    cum = F.aggregate(
        F.slice(F.col("xs"), 1, F.col("_pos") + 1),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x.getField("u"),
    )
    return rows.select(
        F.col("_x.d").alias("day"),
        F.col("_x.u").alias("new_users"),
        cum.cast("bigint").alias("total_users"),
    )


def events_retention(events: DataFrame) -> DataFrame:
    """Cohort retention matrix → (cohort_day, day_offset, n_users): of
    the users whose FIRST event fell on cohort_day, how many were
    active day_offset days later — the product-analytics retention
    triangle (Amplitude/Mixpanel's core report; ES reaches it with a
    scripted terms+filters agg).

    Pinned spec: activity is distinct (user, day); day_offset counts
    calendar days from the user's cohort day (offset 0 row = cohort
    size); cells with no surviving users simply don't appear (sparse
    triangle).

    Plan: one distinct over (user, day) — the only corpus-scale
    shuffle, user-keyed; the per-user min(day) cohort rides the SAME
    user-keyed partitioning (AQE reuses the exchange), and the final
    (cohort, offset) groupBy is triangle-bounded (days² cells max).
    count(*) == count(DISTINCT user) in the last groupBy because
    (user, day) rows are already distinct and a user has exactly one
    cohort day."""
    day = F.date_trunc("day", F.col("ts")).alias("day")
    activity = events.select(F.col("user_id"), day).distinct()
    cohorts = activity.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        activity.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.col("day"), F.col("cohort_day"))
            .cast("int")
            .alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def normalize_agg(events: DataFrame) -> DataFrame:
    """ES `normalize` pipeline agg over the daily event-count histogram
    → (day, n, pct_of_sum, rescaled): the two rescaling methods ES
    ships side by side — `percent_of_sum` (n / Σn) and
    `rescale_0_100` ((n − min) / (max − min) · 100; a flat series
    rescales to 0, division guarded). Both round 4 dp from exact
    integer inputs in a shared operation order.

    Plan: the histogram's map-side-combinable count reduces the corpus
    first; min/max/sum are ONE scalar aggregate over the bounded daily
    series, broadcast back by a literal cross join — the Q5
    max-normalization pattern, no global Window."""
    daily = events.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count("*").cast("long").alias("n"))
    stats = daily.agg(
        F.sum("n").alias("_tot"),
        F.min("n").alias("_min"),
        F.max("n").alias("_max"),
    )
    spread = (F.col("_max") - F.col("_min")).cast("double")
    return daily.crossJoin(F.broadcast(stats)).select(
        "day",
        "n",
        F.round(
            F.col("n").cast("double") / F.col("_tot").cast("double"), 4
        ).alias("pct_of_sum"),
        F.when(F.col("_max") == F.col("_min"), F.lit(0.0))
        .otherwise(
            F.round(
                (F.col("n") - F.col("_min")).cast("double")
                / spread
                * 100.0,
                4,
            )
        )
        .alias("rescaled"),
    )


# ip_prefix fixture: a deterministic synthetic IPv4 per user, derived
# from the portable h60 hash — the FIXTURES.md pattern (no IP column in
# the events table; the oracle re-derives the identical address).
IP_SALT = "ip:"
IP_PREFIX_BITS = 16


def client_ip_col(user_col):
    """Synthetic IPv4 of a user id (32 low bits of h60('ip:'||user))."""
    from ..hashing import h60_col

    return h60_col(F.concat(F.lit(IP_SALT), user_col.cast("string"))) % F.lit(
        2**32
    )


def ip_prefix_agg(events: DataFrame, bits: int = IP_PREFIX_BITS) -> DataFrame:
    """ES `ip_prefix` aggregation → (prefix, n_events, n_users): events
    bucketed by the /bits CIDR network of the client IPv4 (the abuse /
    bot-blocking view every crawl-telemetry dashboard draws), with the
    event count and the distinct-user cardinality per network.

    Plan: the address and its network are pure codegen arithmetic (hash,
    mod, bit shifts — no UDF); one groupBy on the network key. The group
    count is bounded by 2^bits (65,536 at /16), so the shuffle is
    map-side combinable into a tiny apex; count_distinct(user_id) keeps
    the partial-agg property via Spark's two-phase distinct rewrite."""
    shift = 32 - int(bits)
    ip = client_ip_col(F.col("user_id"))
    # group on the 8-byte numeric network, NOT the formatted string —
    # the string concat then runs once per ≤2^bits output groups
    # instead of once per event, and the shuffle carries longs
    net = F.shiftleft(F.shiftright(ip, shift), shift)
    grouped = (
        events.select(net.alias("net"), "user_id")
        .groupBy("net")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count_distinct(F.col("user_id")).cast("long").alias("n_users"),
        )
    )
    prefix = F.concat(
        F.shiftright("net", 24).cast("string"),
        F.lit("."),
        (F.shiftright("net", 16) % 256).cast("string"),
        F.lit("."),
        (F.shiftright("net", 8) % 256).cast("string"),
        F.lit("."),
        (F.col("net") % 256).cast("string"),
        F.lit("/"),
        F.lit(int(bits)).cast("string"),
    )
    return grouped.select(
        prefix.alias("prefix"), "n_events", "n_users"
    )


MOVPCT_WINDOW = 4  # trailing days per moving-percentile window
MOVPCT_QS = (0.5, 0.9)


def moving_percentiles(
    events: DataFrame, window: int = MOVPCT_WINDOW
) -> DataFrame:
    """ES `moving_percentiles` pipeline agg → (day, n, p50, p90):
    interpolated percentiles of the trailing `window` DAILY COUNTS
    ending at each day (shorter head windows take what exists) — the
    smoothed-latency/traffic band a search-ops dashboard draws around
    the rate line. ES computes this over TDigest states; the pinned
    spec here is the EXACT sort-based linear interpolation (the same
    definition as Spark percentile / DuckDB quantile_cont), spelled
    out as element arithmetic so both engines evaluate the identical
    formula: idx = (len−1)·q, v = x[⌊idx⌋] + (x[⌈idx⌉] − x[⌊idx⌋]) ·
    (idx − ⌊idx⌋) over the sorted window.

    Plan: the datehist_pipeline shape — the corpus collapses through
    ONE map-side-combinable daily count first, the bounded daily series
    collects into one sorted array, and every window metric is
    slice/array_sort/element_at arithmetic on exploded positions. No
    corpus Window, no second pass."""
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    xs = F.array_sort(
        F.collect_list(F.struct(F.col("day").alias("d"), F.col("n").alias("h")))
    )
    w = int(window)
    rows = daily.agg(xs.alias("xs")).select(
        F.col("xs"), F.posexplode("xs").alias("_pos", "_x")
    )
    trail = F.array_sort(
        F.transform(
            F.slice(
                F.col("xs"),
                F.greatest(F.lit(1), F.col("_pos") + 2 - w),
                F.least(F.lit(w), F.col("_pos") + 1),
            ),
            lambda z: z.getField("h").cast("double"),
        )
    )

    def pct(q):
        idx = (F.size(trail) - 1) * F.lit(float(q))
        lo = F.floor(idx).cast("int")
        hi = F.ceil(idx).cast("int")
        vlo = F.element_at(trail, lo + 1)
        vhi = F.element_at(trail, hi + 1)
        return F.round(vlo + (vhi - vlo) * (idx - lo), 4)

    out = rows.select(
        F.col("_x.d").alias("day"),
        F.col("_x.h").alias("n"),
        *[
            pct(q).alias(f"p{int(q * 100)}")
            for q in MOVPCT_QS
        ],
    )
    return out


# ES ip_range edges (half-open [from, to) over the synthetic IPv4 int
# space; open ends '*'); frozen, mirrored in the oracle.
IP_RANGE_EDGES = (1 << 30, 1 << 31, 3 << 30)


def ip_range_bounds() -> list[tuple[int | None, int | None, str]]:
    """(lo, hi, label) per range — the ONE bounds/label assembly, shared
    by the Spark CASE and the oracle SQL (r05 review: the label format
    cannot drift between engines)."""
    edges = [int(e) for e in IP_RANGE_EDGES]
    bounds = [(None, edges[0])]
    bounds += [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]
    bounds += [(edges[-1], None)]
    return [
        (lo, hi, f"{'*' if lo is None else lo}-{'*' if hi is None else hi}")
        for lo, hi in bounds
    ]


def ip_range_agg(events: DataFrame) -> DataFrame:
    """ES `ip_range` aggregation → (range, n_events, n_users): events
    bucketed into explicit half-open [from, to) ranges of the client
    IPv4 integer (first range open below, last open above — the
    range-agg convention ip_range shares with `range`/`date_range`/
    `geo_distance` rings). The sibling of ip_prefix_agg with
    user-specified edges instead of CIDR buckets.

    Plan: the range label is a codegen CASE over the hash-derived
    address; one groupBy bounded by len(edges)+1 buckets, count_distinct
    via the two-phase rewrite."""
    ip = client_ip_col(F.col("user_id"))
    label = None
    for lo, hi, key in ip_range_bounds():
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (ip >= lo)
        if hi is not None:
            cond = cond & (ip < hi)
        label = F.when(cond, F.lit(key)) if label is None else label.when(
            cond, F.lit(key)
        )
    return (
        events.select(label.alias("range"), "user_id")
        .groupBy("range")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.count_distinct(F.col("user_id")).cast("long").alias("n_users"),
        )
    )


PCT_BUCKET_QS = (0.25, 0.5, 0.75)


def percentiles_bucket(events: DataFrame) -> DataFrame:
    """ES `percentiles_bucket` pipeline agg → ONE summary row (n_buckets,
    p25, p50, p75): exact interpolated percentiles OVER the sibling
    date-histogram's daily-count series — the stats_bucket family member
    ES computes with TDigest, pinned here to the exact sort-based
    interpolation (the boxplot/MAD exactness upgrade applied to the
    bucket series). The series is bounded by the time span, so the exact
    percentile buffer is trivially small — the coordinator-side fold
    shape."""
    daily = events.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    qs = list(PCT_BUCKET_QS)
    agg = daily.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.percentile("n", F.array(*[F.lit(q) for q in qs])).alias("ps"),
    )
    return agg.select(
        "n_buckets",
        *[
            F.round(F.element_at("ps", i + 1), 4).alias(
                f"p{int(q * 100)}"
            )
            for i, q in enumerate(qs)
        ],
    )
