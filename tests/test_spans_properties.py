"""Property-based invariants for ExactSubstr span dedup (hypothesis).

A pure-Python oracle recomputes duplicated windows from first
principles; the Spark operator's merged spans must cover EXACTLY the
duplicated (non-canonical) window starts — no more, no less. Token
alphabet is small so genuine duplicated runs occur; tokens are
letter-only so the analyzer retains them all.
"""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.spans import dup_spans

W = 4
TOKENS = st.sampled_from(["aa", "bb", "cc", "dd"])
TEXT = st.lists(TOKENS, min_size=0, max_size=14).map(" ".join)
CORPUS = st.lists(TEXT, min_size=1, max_size=5)


def _py_dup_starts(texts: list[str]) -> dict[int, set[int]]:
    """First-principles duplicated window starts per doc (excluding each
    hash's lexicographically-first occurrence)."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, text in enumerate(texts):
        toks = text.split()
        for s in range(len(toks) - W + 1):
            h = hashlib.md5(" ".join(toks[s : s + W]).encode()).hexdigest()
            occ.setdefault(h, []).append((d, s))
    out: dict[int, set[int]] = {}
    for positions in occ.values():
        if len(positions) < 2:
            continue
        keeper = min(positions)
        for d, s in positions:
            if (d, s) != keeper:
                out.setdefault(d, set()).add(s)
    return out


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
def test_spans_cover_exactly_the_duplicated_windows(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    spans = dup_spans(docs, window=W).collect()
    want = _py_dup_starts(texts)

    # spans only exist for docs with duplicated windows, don't overlap,
    # and their union of in-span window starts == the oracle's start set
    got: dict[int, set[int]] = {}
    by_doc: dict[int, list[tuple[int, int]]] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"])
        )
    for d, ivals in by_doc.items():
        ivals.sort()
        for (s1, e1), (s2, e2) in zip(ivals, ivals[1:]):
            assert e1 < s2  # merged spans are disjoint and non-adjacent
        starts = set()
        n_toks = len(texts[d].split())
        for s, e in ivals:
            assert e == min(e, n_toks - 1) or e - s + 1 >= W
            for x in range(s, e - W + 2):
                starts.add(x)
        got[d] = starts

    # every oracle duplicated start lies inside some reported span
    for d, starts in want.items():
        assert d in got and starts <= got[d], (d, starts, got.get(d))
    # and spans don't cover non-duplicated starts beyond the merge hull:
    # each span's endpoints are genuine duplicated windows
    for d, ivals in by_doc.items():
        for s, e in ivals:
            assert s in want.get(d, set())
            assert (e - W + 1) in want.get(d, set())
