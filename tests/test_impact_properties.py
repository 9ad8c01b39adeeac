"""Property-based invariants for the level-aligned champion cut
(hypothesis): a pure-Python first-principles mirror of champion_lists'
pruning rule must reproduce the Spark operator row-for-row on random
impact tables, and the stored cutoffs must be SOUND — every pruned
posting's impact ≤ its run's cutoff, with cutoff == 0 exactly when the
run is complete (the conjunctive certainty algebra's load-bearing
equivalence)."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.impact import (
    LEVEL_CAP_FACTOR,
    champion_lists,
)

ROW = st.tuples(
    st.sampled_from(["a", "b", "c"]),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=0, max_value=6),
)
TABLE = st.lists(ROW, min_size=1, max_size=60).map(
    # one impact per (term, doc_id) — the relation's key
    lambda rows: sorted({(t, d): i for t, d, i in rows}.items())
)


def _py_champions(items, budget, nb, factor):
    """First-principles level-aligned cut (mirrors champion_lists)."""
    runs: dict = {}
    for (t, d), i in items:
        runs.setdefault((d % nb, t), []).append((d, i))
    cap = int(factor * budget)
    out = []
    for (b, t), posts in runs.items():
        posts.sort(key=lambda x: (-x[1], x[0]))
        if len(posts) <= budget:
            kept, cut = posts, 0
        else:
            v = posts[budget - 1][1]
            n_ge = sum(1 for _, i in posts if i >= v)
            if n_ge <= cap:
                kept = posts[:n_ge]
                cut = 0 if n_ge == len(posts) else max(1, v - 1)
            else:
                kept = posts[:budget]
                cut = max(1, v)
        for d, i in kept:
            out.append((b, t, d, i, cut))
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    items=TABLE,
    budget=st.sampled_from([1, 2, 3]),
    nb=st.sampled_from([2, 4]),
    factor=st.sampled_from([LEVEL_CAP_FACTOR, 0.0, 2.0]),
)
def test_champion_cut_matches_python_mirror(spark, items, budget, nb, factor):
    imp = spark.createDataFrame(
        [(t, d, i) for (t, d), i in items],
        "term string, doc_id long, impact int",
    )
    got = sorted(
        (r["doc_bucket"], r["term"], r["doc_id"], r["impact"], r["cutoff"])
        for r in champion_lists(
            imp, budget_per_bucket=budget, n_buckets=nb,
            level_cap_factor=factor,
        ).collect()
    )
    want = _py_champions(items, budget, nb, factor)
    assert got == want

    # soundness of the stored bound, from the raw relation:
    runs: dict = {}
    for (t, d), i in items:
        runs.setdefault((d % nb, t), []).append((d, i))
    kept_by_run: dict = {}
    cut_by_run: dict = {}
    for b, t, d, i, cut in got:
        kept_by_run.setdefault((b, t), set()).add(d)
        cut_by_run[(b, t)] = cut
    for key, posts in runs.items():
        kept = kept_by_run.get(key, set())
        cut = cut_by_run.get(key)
        assert kept, key  # every run keeps at least one posting
        pruned = [i for d, i in posts if d not in kept]
        # cutoff == 0 ⟺ complete; truncated runs bound their tail
        if cut == 0:
            assert not pruned, key
        else:
            assert pruned and all(i <= cut for i in pruned), key
        # the cap really caps: kept rows ≤ max(budget, ⌊factor·budget⌋)
        assert len(kept) <= max(budget, int(factor * budget)), key
