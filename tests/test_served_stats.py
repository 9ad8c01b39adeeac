"""Precomputed collection stats threaded through the similarity family
(round-3 item #3).

search_lmd/lmjm/ib need Σcf per query term and the corpus token total T;
search_dfr needs df. Standalone calls collect these at call time (two
eager aggregates). A SERVED query supplies them precomputed —
SearchEngine.corpus_stat_maps reads cf/df from the term dictionary
(driver-cached dict lookup) and T from the build-time Σdl persisted in
corpus_stats.json — so constructing the query plan launches ZERO Spark
jobs and no postings/doc_stats aggregate exists anywhere. These tests
pin (a) supplied-stats results identical to the standalone path, (b) the
zero-job construction, (c) corpus_stats.json's sum_dl round-trip.
"""

import pytest
from pyspark.sql import functions as F

import search_engine_spark.operators.search as se
from __spark_entry__ import _bm25_ctx
from tests.conftest import SF_TEST

QUERY = ["data", "fast"]


@pytest.fixture(scope="module")
def ctx(spark):
    return _bm25_ctx(spark, SF_TEST)


@pytest.fixture(scope="module")
def stats(ctx):
    docs, postings, td, ds, n, avgdl = ctx
    rows = td.filter(F.col("term").isin(QUERY)).select("term", "df", "cf").collect()
    cf = {r["term"]: float(r["cf"]) for r in rows}
    df = {r["term"]: float(r["df"]) for r in rows}
    total = float(ds.agg(F.sum("dl")).collect()[0][0])
    return cf, df, total


@pytest.mark.parametrize("model", ["lmd", "lmjm", "dfr", "ib"])
def test_supplied_stats_match_standalone(spark, ctx, stats, model):
    docs, postings, td, ds, n, avgdl = ctx
    cf, df, total = stats
    fn = getattr(se, f"search_{model}")
    base = fn(postings, td, ds, n, avgdl, QUERY).collect()
    if model == "dfr":
        served = fn(postings, td, ds, n, avgdl, QUERY, df_map=df).collect()
    elif model == "ib":
        served = fn(postings, td, ds, n, avgdl, QUERY, cf_map=cf).collect()
    else:
        served = fn(
            postings, td, ds, n, avgdl, QUERY, cf_map=cf, total_tokens=total
        ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, served)) and base


@pytest.mark.parametrize("model", ["lmd", "lmjm", "dfr", "ib"])
def test_supplied_stats_construction_is_zero_job(spark, ctx, stats, model):
    """With stats supplied, building the query DataFrame must launch no
    Spark job at all (the standalone path launches >= 1 for the eager
    stat collects) — the 'no postings-wide aggregate' plan assert."""
    docs, postings, td, ds, n, avgdl = ctx
    cf, df, total = stats
    fn = getattr(se, f"search_{model}")
    sc = spark.sparkContext
    group = f"served-stats-probe-{model}"
    sc.setJobGroup(group, "construction probe")
    try:
        if model == "dfr":
            out = fn(postings, td, ds, n, avgdl, QUERY, df_map=df)
        elif model == "ib":
            out = fn(postings, td, ds, n, avgdl, QUERY, cf_map=cf)
        else:
            out = fn(
                postings, td, ds, n, avgdl, QUERY, cf_map=cf, total_tokens=total
            )
        jobs = spark.sparkContext.statusTracker().getJobIdsForGroup(group)
        assert jobs == [], f"construction launched jobs: {jobs}"
    finally:
        sc.setJobGroup("", "")
    assert out.count() >= 0  # the plan still executes fine afterwards


def test_corpus_stats_json_carries_sum_dl(spark, tmp_path):
    """build_persistent persists the exact Σdl; SearchEngine.open exposes
    it and corpus_stat_maps serves cf/df/T without touching postings."""
    from search_engine_spark.engine import SearchEngine

    eng = SearchEngine(spark, sf_dir=SF_TEST, n_buckets=4)
    eng.index_dir = str(tmp_path / "idx")
    eng.build_persistent()
    stats = eng.store.read_corpus_stats()
    assert "sum_dl" in stats and stats["sum_dl"] > 0

    opened = SearchEngine.open(spark, eng.index_dir, sf_dir=SF_TEST)
    cf, df, total = opened.corpus_stat_maps(QUERY)
    assert total == float(stats["sum_dl"])
    # dictionary-derived stats equal the postings-derived ones
    docs, postings, td, ds, n, avgdl = _bm25_ctx(spark, SF_TEST)
    exp = {
        r["term"]: (float(r["df"]), float(r["cf"]))
        for r in td.filter(F.col("term").isin(QUERY)).collect()
    }
    assert {t: (df[t], cf[t]) for t in cf} == exp
    assert total == float(ds.agg(F.sum("dl")).collect()[0][0])
