"""Property-based invariants for interval queries (hypothesis).

A brute-force pure-Python reference enumerates ALL matching intervals
(every ordered occurrence tuple / every covering window) and reduces
them to the minimal set by literal pairwise containment checks; the
Spark sources must produce exactly that set on random small corpora.
Tokens are letter-only (analyzer retains all) and drawn from a 4-term
alphabet so matches are dense.
"""

from __future__ import annotations

from itertools import product

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.intervals import (
    ordered_intervals,
    unordered_intervals,
)
from search_engine_spark.operators.positional import build_positional

TOKENS = st.sampled_from(["aa", "bb", "cc", "dd"])
TEXT = st.lists(TOKENS, min_size=0, max_size=12).map(" ".join)
CORPUS = st.lists(TEXT, min_size=1, max_size=4)


def _minimalize(cands: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """Literal Lucene minimality: drop any interval that PROPERLY
    contains another candidate."""
    out = set()
    for s, e in cands:
        if any(
            (s2, e2) != (s, e) and s2 >= s and e2 <= e
            for s2, e2 in cands
        ):
            continue
        out.add((s, e))
    return out


def _py_ordered(toks: list[str], terms: list[str], max_gaps: int):
    occ = [[i for i, t in enumerate(toks) if t == term] for term in terms]
    cands = set()
    for combo in product(*occ):
        if all(combo[i] < combo[i + 1] for i in range(len(combo) - 1)):
            s, e = combo[0], combo[-1]
            if max_gaps < 0 or e - s - (len(terms) - 1) <= max_gaps:
                cands.add((s, e))
    return _minimalize(cands)


def _py_unordered(toks: list[str], terms: list[str], max_gaps: int):
    uniq = sorted(set(terms))
    occ = [[i for i, t in enumerate(toks) if t == term] for term in uniq]
    cands = set()
    for combo in product(*occ):
        if len(set(combo)) < len(combo):
            continue  # distinct positions across different terms
        s, e = min(combo), max(combo)
        if max_gaps < 0 or e - s - (len(uniq) - 1) <= max_gaps:
            cands.add((s, e))
    return _minimalize(cands)


def _spark_set(df):
    return {(r["doc_id"], r["start"], r["end"]) for r in df.collect()}


def _expected(texts, terms, max_gaps, fn):
    want = set()
    for d, text in enumerate(texts):
        toks = text.split()
        for s, e in fn(toks, terms, max_gaps):
            want.add((d, s, e))
    return want


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS, gaps=st.sampled_from([-1, 0, 1, 3]))
def test_ordered_matches_bruteforce(spark, texts, gaps):
    terms = ["aa", "bb"]
    pos = build_positional(
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
    )
    got = _spark_set(ordered_intervals(pos, terms, max_gaps=gaps))
    assert got == _expected(texts, terms, gaps, _py_ordered)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS, gaps=st.sampled_from([-1, 1, 4]))
def test_unordered_matches_bruteforce(spark, texts, gaps):
    terms = ["aa", "bb", "cc"]
    pos = build_positional(
        spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
    )
    got = _spark_set(unordered_intervals(pos, terms, max_gaps=gaps))
    assert got == _expected(texts, terms, gaps, _py_unordered)
