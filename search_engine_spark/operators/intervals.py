"""Lucene-style interval queries: minimal-interval sources + algebra.

Lucene's `intervals` query (`IntervalsSource`) generalizes the span
family: every sub-query produces, per document, the set of MINIMAL
position intervals that match it (an interval is minimal when it does
not properly contain another matching interval), and combinators
(`containing`, `not_containing`, `not_contained_by`, `overlapping`)
filter one source's intervals by their positional relation to
another's. The final score here is `interval_tf` — the number of
surviving minimal intervals per document — ranked desc with the
engine-wide (doc_id asc) tiebreak.

Everything is declarative DataFrame algebra over the positional
postings relation (operators/positional.py::build_positional — a
zero-shuffle Arrow tokenizer pass):

- `ordered_intervals`: the greedy-earliest join chain used by
  `proximity_match`, WITHOUT an in-chain window bound — for each
  occurrence of the first term (the anchor/start), taking the minimum
  feasible position of each subsequent term yields the least feasible
  end for that start, which is exactly the candidate minimal interval
  anchored there. `max_gaps` then filters on width AFTER the chain
  (Lucene applies gap constraints to candidate intervals, unlike
  SpanNear's in-flight window).
- `unordered_intervals`: the minimal-cover reduction used by
  `unordered_near_match` (one running max per distinct term over the
  doc's merged occurrence stream), each complete row emitting the
  candidate cover [least(last_i), pos].
- `_minimalize`: candidate → minimal intervals with ONE window pass:
  sorted by start desc within doc, an interval survives iff its end is
  strictly below the running min of the ends of all later-starting
  candidates (a later start with end <= this end is properly
  contained; candidate starts are distinct by construction).

Scale shape: per-term filtered slices of the positional relation
(scan-prunable on the `term` predicate), equi-joins + groupBys all
keyed doc_id-first (AQE coalesces the shuffles), one window function
partitioned by doc_id (never a global window), and the combinators are
left-semi/anti range joins on doc_id — no UDF anywhere.

Reference basis: the public Lucene `Intervals` API semantics
(org.apache.lucene.queries.intervals); the reference engine itself has
no interval surface — this extends the positional family
(SURVEY.md §2.Q3's positional generalizations).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INTERVAL_COLS = ("doc_id", "start", "end")


def _minimalize(cand: DataFrame) -> DataFrame:
    """Candidate (doc_id, start, end) rows → minimal intervals.

    Keeps an interval iff no other candidate with a later-or-equal
    start has an end at-or-before its end (such a candidate is
    contained in it). One doc-partitioned window, (start desc, end
    asc), running min(end) over strictly-preceding rows: the end-asc
    secondary sort makes equal-start candidates (the unordered source
    emits them — same last-seen cover start, different ending rows)
    resolve deterministically, the shorter one surviving.
    """
    w = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("start").desc(), F.col("end").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        cand.withColumn("_m", F.min("end").over(w))
        .filter(F.col("_m").isNull() | (F.col("end") < F.col("_m")))
        .select("doc_id", "start", "end")
    )


def term_intervals(positional: DataFrame, term: str) -> DataFrame:
    """Single-term source: one width-0 interval per occurrence (already
    minimal — no term occurrence can contain another)."""
    return positional.filter(F.col("term") == term).select(
        "doc_id",
        F.col("pos").alias("start"),
        F.col("pos").alias("end"),
    )


def ordered_intervals(
    positional: DataFrame, terms: list[str], max_gaps: int = -1
) -> DataFrame:
    """Minimal intervals of `terms` occurring in order (strictly
    increasing positions). max_gaps < 0 means unbounded (Lucene's
    default); otherwise keep intervals with
    (end - start) - (len(terms) - 1) <= max_gaps.
    """
    if not terms:
        raise ValueError("empty interval source")
    if len(terms) == 1:
        return term_intervals(positional, terms[0])
    anchor = positional.filter(F.col("term") == terms[0]).select(
        "doc_id", F.col("pos").alias("start"), F.col("pos").alias("prev")
    )
    for t in terms[1:]:
        nxt = positional.filter(F.col("term") == t).select(
            F.col("doc_id").alias("n_doc"), F.col("pos").alias("p")
        )
        anchor = (
            anchor.join(
                nxt,
                (F.col("doc_id") == F.col("n_doc"))
                & (F.col("p") > F.col("prev")),
                "inner",
            )
            .groupBy("doc_id", "start")
            .agg(F.min("p").alias("prev"))
        )
    cand = anchor.select("doc_id", "start", F.col("prev").alias("end"))
    if max_gaps >= 0:
        cand = cand.filter(
            F.col("end") - F.col("start") - (len(terms) - 1)
            <= int(max_gaps)
        )
    return _minimalize(cand)


def unordered_intervals(
    positional: DataFrame, terms: list[str], max_gaps: int = -1
) -> DataFrame:
    """Minimal intervals covering every distinct term in any order.

    The merged occurrence stream of the query terms is scanned once per
    doc (window running-max per term); each row where every term has
    been seen emits the candidate cover [least(last_i), current pos] —
    the tightest cover ENDING at that row. Distinct + minimalize then
    keeps the minimal set. Duplicate terms collapse (Lucene's unordered
    source over a term multiset requires distinct positions only across
    DIFFERENT terms; we pin the distinct-terms semantics).
    """
    uniq = sorted(set(terms))
    if not uniq:
        raise ValueError("empty interval source")
    if len(uniq) == 1:
        return term_intervals(positional, uniq[0])
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    stream = positional.filter(F.col("term").isin(uniq))
    lasts = [
        F.max(
            F.when(F.col("term") == t, F.col("pos"))
        ).over(w).alias(f"_l{i}")
        for i, t in enumerate(uniq)
    ]
    covered = stream.select("doc_id", "pos", *lasts)
    not_null = None
    for i in range(len(uniq)):
        c = F.col(f"_l{i}").isNotNull()
        not_null = c if not_null is None else (not_null & c)
    cand = (
        covered.filter(not_null)
        .select(
            "doc_id",
            F.least(*[F.col(f"_l{i}") for i in range(len(uniq))]).alias(
                "start"
            ),
            F.col("pos").alias("end"),
        )
        .distinct()
    )
    if max_gaps >= 0:
        cand = cand.filter(
            F.col("end") - F.col("start") - (len(uniq) - 1)
            <= int(max_gaps)
        )
    return _minimalize(cand)


def _rel_join(
    outer: DataFrame, inner: DataFrame, cond, mode: str
) -> DataFrame:
    o = outer.alias("o")
    i = inner.alias("i")
    joined = o.join(
        i,
        (F.col("o.doc_id") == F.col("i.doc_id")) & cond,
        mode,
    )
    return joined.select(
        F.col("o.doc_id").alias("doc_id"),
        F.col("o.start").alias("start"),
        F.col("o.end").alias("end"),
    )


def intervals_containing(outer: DataFrame, inner: DataFrame) -> DataFrame:
    """Outer intervals that contain >= 1 inner interval."""
    cond = (F.col("i.start") >= F.col("o.start")) & (
        F.col("i.end") <= F.col("o.end")
    )
    return _rel_join(outer, inner, cond, "left_semi")


def intervals_not_containing(
    outer: DataFrame, inner: DataFrame
) -> DataFrame:
    """Outer intervals that contain NO inner interval."""
    cond = (F.col("i.start") >= F.col("o.start")) & (
        F.col("i.end") <= F.col("o.end")
    )
    return _rel_join(outer, inner, cond, "left_anti")


def intervals_not_contained_by(
    outer: DataFrame, inner: DataFrame
) -> DataFrame:
    """Outer intervals not lying inside any inner interval."""
    cond = (F.col("i.start") <= F.col("o.start")) & (
        F.col("i.end") >= F.col("o.end")
    )
    return _rel_join(outer, inner, cond, "left_anti")


def intervals_overlapping(outer: DataFrame, inner: DataFrame) -> DataFrame:
    """Outer intervals sharing >= 1 position with some inner interval."""
    cond = (F.col("i.start") <= F.col("o.end")) & (
        F.col("i.end") >= F.col("o.start")
    )
    return _rel_join(outer, inner, cond, "left_semi")


def rank_intervals(intervals: DataFrame, k: int = 20) -> DataFrame:
    """(doc_id, interval_tf) top-k: surviving-minimal-interval count per
    doc, ranked desc with the engine tiebreak (doc_id asc)."""
    return (
        intervals.groupBy("doc_id")
        .agg(F.count("*").alias("interval_tf"))
        .orderBy(F.col("interval_tf").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def search_intervals(
    docs: DataFrame,
    terms: list[str],
    max_gaps: int,
    not_containing: str | None = None,
    k: int = 20,
) -> DataFrame:
    """The composite surface wired into the contract: ordered minimal
    intervals of `terms` within `max_gaps`, optionally dropping
    intervals that contain an occurrence of `not_containing`, ranked by
    interval_tf. Analysis (lemmatize/stopword rules) is the caller's
    concern — `terms` are ANALYZED terms, mirroring the other
    positional surfaces."""
    from .positional import build_positional

    positional = build_positional(docs)
    iv = ordered_intervals(positional, terms, max_gaps=max_gaps)
    if not_containing is not None:
        iv = intervals_not_containing(
            iv, term_intervals(positional, not_containing)
        )
    return rank_intervals(iv, k=k)
