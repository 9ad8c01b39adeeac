"""Shared fixtures: one session-scoped local SparkSession + DuckDB oracle."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from search_engine_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

SF_TEST = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", parallelism=8, shuffle_partitions=8)
    yield s


def make_duckdb(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


@pytest.fixture(scope="session")
def oracle_small():
    con = make_duckdb(SF_TEST)
    yield con
    con.close()


def compare_frames(spark_df, duck_rel, atol: float = 0.0):
    """Order-insensitive comparison mirroring the driver's gate:
    sort columns by name, compare row multisets. atol>0 relaxes float
    equality (diagnostics only — the driver hashes exact values)."""
    import math

    sp = spark_df.toPandas()
    du = duck_rel.df()
    sp_cols, du_cols = sorted(sp.columns), sorted(du.columns)
    assert sp_cols == du_cols, f"schema mismatch: {sp_cols} vs {du_cols}"
    sp = sp[sp_cols]
    du = du[du_cols]
    assert len(sp) == len(du), f"row count {len(sp)} vs {len(du)}"

    def norm(df):
        rows = []
        for tup in df.itertuples(index=False):
            rows.append(tuple(x.item() if hasattr(x, "item") else x for x in tup))
        return sorted(rows, key=repr)

    a, b = norm(sp), norm(du)
    for i, (ra, rb) in enumerate(zip(a, b)):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float):
                if va != vb and not (
                    math.isnan(va) and math.isnan(vb)
                ) and abs(va - vb) > atol:
                    raise AssertionError(f"row {i}: {ra} != {rb}")
            elif va != vb:
                raise AssertionError(f"row {i}: {ra} != {rb}")
