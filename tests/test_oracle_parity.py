"""Oracle-parity tests — mirror the driver's correctness gate.

Every (queries, oracle_sql) pair from __spark_entry__ is executed on
sf0.001: the Spark DataFrame result must equal the DuckDB result as an
order-insensitive row multiset with exact values (the driver hashes values,
so approximate equality is not enough).
"""

import pytest

from tests.conftest import SF_TEST, compare_frames

import __spark_entry__ as entrymod

NAMES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, oracle_small):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        df = q(spark, SF_TEST)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    compare_frames(q(spark, SF_TEST), oracle_small.sql(sql))


def test_bool_prefix_empty_fixed_terms_oracle(spark, oracle_small):
    """Prefix-only match_bool_prefix (no completed terms): the oracle SQL
    must stay valid (no 'VALUES ()') and match the engine — guards the
    r02-ADVICE asymmetry where only the engine handled the empty list."""
    import search_engine_spark.operators.search as se
    from search_engine_spark.functions import oracle_fragments as ora
    from __spark_entry__ import _bm25_ctx

    docs, postings, td, ds, n, avgdl = _bm25_ctx(spark, SF_TEST)
    eng = se.search_bool_prefix(postings, td, ds, n, avgdl, [], "fa")
    sql = ora.search_bool_prefix_sql([], "fa")
    assert "VALUES ()" not in sql
    compare_frames(eng, oracle_small.sql(sql))


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert df.columns == ["doc_id", "score"]


def test_evict_ctx_unpersists_and_rebuilds(spark):
    """evict_ctx drops the per-(session, sf_dir) persisted frames so a
    multi-scale session doesn't accumulate caches until GC (r03
    ADVICE); a later query on the same sf_dir rebuilds transparently."""
    entrymod._bm25_ctx(spark, SF_TEST)  # populate both ctx keys
    assert entrymod.evict_ctx(spark, SF_TEST) >= 2
    assert entrymod.evict_ctx(spark, SF_TEST) == 0
    docs, postings = entrymod._search_ctx(spark, SF_TEST)  # rebuilds
    assert postings.limit(1).count() == 1
