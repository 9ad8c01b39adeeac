"""HLL distinct counting and count-min frequency estimation — accuracy
bounds vs exact answers, the never-underestimate CM property, and exact
equality against the pure-Python mirrors of the pinned specs."""

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators.sketches import (
    HLL_M,
    cm_estimate_py,
    cm_estimates,
    cm_counters,
    cm_heavy_hitters,
    hll_distinct,
    hll_py,
)
from search_engine_spark.sources.documents import load_documents, site_key_col

from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def postings(spark):
    return ib.build_postings(load_documents(spark, SF_TEST)).cache()


def test_hll_matches_python_mirror_and_exact_within_bound(spark, postings):
    keyed = postings.withColumn("site_key", site_key_col())
    got = {
        r["site_key"]: r["est_distinct"]
        for r in hll_distinct(keyed, "term", ["site_key"]).collect()
    }
    by_site = {}
    for r in keyed.select("site_key", "term").distinct().collect():
        by_site.setdefault(r["site_key"], set()).add(r["term"])
    assert set(got) == set(by_site)
    for site, terms in by_site.items():
        assert got[site] == hll_py(terms)  # exact vs the pinned spec
        exact = len(terms)
        # m=256 → σ ≈ 6.5%; 4σ bound leaves honest failure room
        assert abs(got[site] - exact) / exact < 0.26, (site, got[site], exact)


def test_hll_linear_counting_branch_small_sets(spark):
    """Cardinalities « m take the linear-counting correction; the branch
    must agree between Spark and the Python mirror and stay tight."""
    for n in (3, 17, 60):
        keys = [f"key-{i}" for i in range(n)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        est = hll_distinct(df, "k", []).collect()[0]["est_distinct"]
        assert est == hll_py(keys)
        assert abs(est - n) / n < 0.25


def test_hll_insensitive_to_duplication(spark):
    """The sketch sees register maxima only — feeding each key 5× must
    produce the identical estimate."""
    keys = [f"key-{i}" for i in range(40)]
    once = spark.createDataFrame([(k,) for k in keys], "k string")
    five = spark.createDataFrame([(k,) for k in keys * 5], "k string")
    assert (
        hll_distinct(once, "k", []).collect()[0]["est_distinct"]
        == hll_distinct(five, "k", []).collect()[0]["est_distinct"]
    )


def test_cm_never_underestimates_and_matches_python(spark, postings):
    exact = {
        r["term"]: r["cf"]
        for r in postings.groupBy("term")
        .agg(F.sum("tf").alias("cf"))
        .collect()
    }
    td = ib.build_term_dict(postings)
    est = {
        r["term"]: r["cm_est"]
        for r in cm_estimates(cm_counters(postings), td).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)  # CM's one-sided error
    for t in sorted(exact)[:10]:
        assert est[t] == cm_estimate_py(exact, t)


def test_cm_heavy_hitters_order_and_membership(spark, postings):
    td = ib.build_term_dict(postings)
    rows = cm_heavy_hitters(postings, td, k=20).collect()
    assert len(rows) == 20
    keys = [(r["cm_est"], r["term"]) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    # not a theorem (a rival can inflate past it under heavy collisions),
    # but at 4 rows × 1024 cells over this fixture's ~3k-term dictionary
    # the true top term's ≥-exact estimate keeps it in the top-20
    exact_top = (
        postings.groupBy("term").agg(F.sum("tf").alias("cf"))
        .orderBy(F.col("cf").desc(), F.col("term").asc())
        .limit(1)
        .collect()[0]["term"]
    )
    assert any(r["term"] == exact_top for r in rows)


def test_hll_merge_is_lossless(spark, postings):
    """Register-wise max of per-segment sketches EQUALS the whole-corpus
    sketch — the property that lets segment builds carry 256-row state
    instead of rescanning old segments."""
    from search_engine_spark.operators.sketches import (
        hll_estimate,
        hll_merge,
        hll_registers,
    )

    keyed = postings.withColumn("site_key", site_key_col())
    whole = {
        (r["site_key"],): r["est_distinct"]
        for r in hll_distinct(keyed, "term", ["site_key"]).collect()
    }
    seg_a = keyed.filter(F.col("doc_id") % 2 == 0)
    seg_b = keyed.filter(F.col("doc_id") % 2 == 1)
    merged = hll_merge(
        hll_registers(seg_a, "term", ["site_key"]),
        hll_registers(seg_b, "term", ["site_key"]),
    )
    got = {
        (r["site_key"],): r["est_distinct"]
        for r in hll_estimate(merged).collect()
    }
    assert got == whole


def test_cm_merge_is_lossless(spark, postings):
    """Cell-wise sum of per-segment CM tables equals the whole-corpus
    table, so merged estimates are identical (counters are linear)."""
    from search_engine_spark.operators.sketches import cm_merge

    td = ib.build_term_dict(postings)
    whole = {
        r["term"]: r["cm_est"]
        for r in cm_estimates(cm_counters(postings), td).collect()
    }
    seg_a = postings.filter(F.col("doc_id") % 2 == 0)
    seg_b = postings.filter(F.col("doc_id") % 2 == 1)
    merged = cm_merge(cm_counters(seg_a), cm_counters(seg_b))
    got = {r["term"]: r["cm_est"] for r in cm_estimates(merged, td).collect()}
    assert got == whole


def test_cm_estimate_for_absent_key_is_zero(spark, postings):
    """The sketch's defining guarantee: probing a key that never occurred
    gives min over ALL d cells — 0 when any of its cells is empty. An
    inner join against the counter table would instead report the
    smallest colliding count (or drop the key entirely)."""
    probe = spark.createDataFrame(
        [("zzz-never-in-corpus-7f3a",)], "term string"
    )
    got = cm_estimates(cm_counters(postings), probe).collect()
    assert len(got) == 1
    assert got[0]["cm_est"] == cm_estimate_py(
        {
            r["term"]: r["tf"]
            for r in postings.groupBy("term")
            .agg(F.sum("tf").alias("tf"))
            .collect()
        },
        "zzz-never-in-corpus-7f3a",
    )


def test_hll_ignores_null_keys(spark):
    """NULL is not an element: the estimate over ['a','b',NULL] must
    equal the pinned estimator's answer for the two real keys (a NULL
    register row used to skew the empty-register denominator)."""
    df = spark.createDataFrame(
        [("g", "a"), ("g", "b"), ("g", None)], "grp string, k string"
    )
    got = hll_distinct(df, "k", ["grp"]).collect()
    assert len(got) == 1
    assert got[0]["est_distinct"] == hll_py({"a", "b"})
