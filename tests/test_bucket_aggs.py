"""Property tests for bucket_aggs.py: dense-histogram spine contiguity,
percentile-rank monotonicity, and the samplers' cardinality guarantees."""

import pytest
from pyspark.sql import functions as F

from search_engine_spark.operators import bucket_aggs as ba


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, n_chars long",
    ).withColumn("site_key", F.concat(F.lit("site-"), F.char(F.col("doc_id") % 3 + 97)))


def test_dense_histogram_fills_gaps(spark):
    # token counts 1, 2, and 201 with width 50 → buckets 0 and 200
    # observed; 50/100/150 must appear with n_docs = 0
    texts = ["a", "a b", " ".join(["w"] * 201)]
    rows = ba.dl_histogram_dense(_docs(spark, texts), width=50).collect()
    got = {r["bucket_lo"]: r["n_docs"] for r in rows}
    assert sorted(got) == [0, 50, 100, 150, 200]
    assert got[0] == 2 and got[200] == 1
    assert got[50] == got[100] == got[150] == 0


def test_dense_histogram_empty_corpus(spark):
    rows = ba.dl_histogram_dense(_docs(spark, []), width=50).collect()
    assert rows == []


def test_percentile_ranks_monotone_and_bounded(spark):
    texts = [" ".join(["w"] * n) for n in (1, 5, 20, 80, 300)]
    rows = ba.percentile_ranks(_docs(spark, texts)).collect()
    by_v = sorted((r["value"], r["rank_pct"]) for r in rows)
    ranks = [p for _, p in by_v]
    assert ranks == sorted(ranks)  # CDF is monotone
    assert all(0.0 <= p <= 100.0 for p in ranks)
    assert by_v[-1] == (250.0, 80.0)  # 4 of 5 docs ≤ 250 tokens


def test_diversified_sampler_caps_per_site(spark):
    # 30 hits all on one site: diversified sample admits max_per_site,
    # so the facet count is exactly that cap
    docs = _docs(spark, ["t"] * 30).withColumn(
        "site_key", F.lit("site-a")
    )
    hits = spark.createDataFrame(
        [(i, 1000.0 - i) for i in range(30)], "doc_id long, score double"
    )
    rows = ba.diversified_sampler_agg(
        hits, docs, sample_size=20, max_per_site=3
    ).collect()
    assert len(rows) == 1 and rows[0]["doc_count"] == 3


def test_sampler_bounds_sample(spark):
    docs = _docs(spark, ["t"] * 50)
    hits = spark.createDataFrame(
        [(i, 1000.0 - i) for i in range(50)], "doc_id long, score double"
    )
    rows = ba.sampler_agg(hits, docs, sample_size=10).collect()
    assert sum(r["doc_count"] for r in rows) == 10


def test_stats_bucket_folds_the_histogram_exactly(spark):
    """The sibling fold equals a hand recomputation over the sibling's
    own bucket rows (min/max/avg/sum/count of the n_hits series)."""
    from search_engine_spark.operators.bucket_aggs import stats_bucket
    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.search import facet_date_histogram
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    postings = build_postings(docs)
    q = ["data", "fast"]
    hist = [r["n_hits"] for r in facet_date_histogram(
        docs, postings, q, bucket_secs=3600).collect()]
    assert hist
    row = stats_bucket(docs, postings, q, bucket_secs=3600).collect()[0]
    assert row["n_buckets"] == len(hist)
    assert row["min_hits"] == min(hist)
    assert row["max_hits"] == max(hist)
    assert row["sum_hits"] == sum(hist)
    assert row["avg_hits"] == round(sum(hist) / len(hist), 4)


def test_boxplot_matches_numpy_exact(spark):
    """Exact quartiles == numpy linear interpolation on the same values
    (the semantic pin the SQL mirror can't state: both engines must
    agree with the REFERENCE definition, not merely each other)."""
    import numpy as np

    from search_engine_spark.operators.bucket_aggs import boxplot_agg
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    row = boxplot_agg(docs).collect()[0]
    vals = np.array(
        [
            len(t.split()) if t.strip() else 0
            for t in [r["text"] for r in docs.select("text").collect()]
        ],
        dtype=np.float64,
    )
    assert row["n"] == vals.size
    assert row["min_v"] == int(vals.min()) and row["max_v"] == int(vals.max())
    for q, col in [(25, "q1"), (50, "q2"), (75, "q3")]:
        assert row[col] == round(float(np.percentile(vals, q)), 4), col
    assert row["min_v"] <= row["q1"] <= row["q2"] <= row["q3"] <= row["max_v"]


def test_t_test_matches_pure_python_welch(spark):
    """Welch t recomputed from raw values driver-side — pins the
    statistic itself (mean/variance/denominator), not just parity."""
    import math

    from search_engine_spark.operators.bucket_aggs import t_test_agg
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    row = t_test_agg(docs, lang="en").collect()[0]
    a, b = [], []
    for r in docs.select("text", "lang").collect():
        v = len(r["text"].split()) if r["text"].strip() else 0
        (a if r["lang"] == "en" else b).append(v)
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    t = (ma - mb) / math.sqrt(va / len(a) + vb / len(b))
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))
    assert row["mean_a"] == round(ma, 4) and row["mean_b"] == round(mb, 4)
    assert abs(row["t_value"] - t) < 5e-4  # 4-dp rounding band


class TestRound4MLAggs:
    def test_variable_width_histogram_partitions_values(self, spark):
        from search_engine_spark.operators.events import (
            variable_width_histogram,
        )
        from tests.conftest import SF_TEST

        ev = spark.read.parquet(f"{SF_TEST}/events.parquet")
        out = variable_width_histogram(ev, buckets=4).orderBy("bucket").collect()
        assert [r["bucket"] for r in out] == [1, 2, 3, 4]
        total = sum(r["n"] for r in out)
        assert total == ev.count()
        # near-equal frequency split; ranges ordered and disjoint
        assert max(r["n"] for r in out) - min(r["n"] for r in out) <= max(
            4, total // 10
        )
        for a, b in zip(out, out[1:]):
            assert a["max_v"] <= b["min_v"]
            assert a["min_v"] <= a["avg_v"] <= a["max_v"]

    def test_variable_width_histogram_empty_and_null(self, spark):
        """r04 ADVICE (+ r05 self-review correction): empty input yields
        an EMPTY 5-column frame (the DuckDB mirror's CROSS JOIN against
        zero rows); an ALL-NULL value column keeps its rows — one
        null-bucket row with null stats, exactly what the mirror's
        NULL>NULL comparisons group to — instead of TypeError on the
        NULL percentile cuts."""
        from search_engine_spark.operators.events import (
            variable_width_histogram,
        )

        empty = spark.createDataFrame([], "value double")
        out = variable_width_histogram(empty, buckets=4)
        assert out.columns == ["bucket", "n", "min_v", "max_v", "avg_v"]
        assert out.count() == 0
        nulls = spark.createDataFrame(
            [(None,), (None,)], "value double"
        )
        rows = variable_width_histogram(nulls, buckets=3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["bucket"] is None and r["n"] == 2
        assert r["min_v"] is None and r["max_v"] is None
        assert r["avg_v"] is None
        # and the DuckDB mirror agrees on the same all-null frame
        import duckdb

        from search_engine_spark.functions.oracle_pipeline import (
            variable_width_histogram_sql,
        )

        con = duckdb.connect()
        con.execute("CREATE TABLE events(value DOUBLE)")
        con.execute("INSERT INTO events VALUES (NULL), (NULL)")
        du = con.sql(variable_width_histogram_sql(buckets=3)).fetchall()
        con.close()
        assert du == [(None, 2, None, None, None)]

    def test_variable_width_histogram_single_bucket(self, spark):
        """buckets=1 (valid ES parameterization, r05 self-review): no
        cuts — one cluster holding everything, and the DuckDB mirror
        emits the same degenerate form instead of an empty SELECT."""
        import duckdb

        from search_engine_spark.functions.oracle_pipeline import (
            variable_width_histogram_sql,
        )
        from search_engine_spark.operators.events import (
            variable_width_histogram,
        )

        vals = [(1.25,), (2.5,), (10.0,)]
        ev = spark.createDataFrame(vals, "value double")
        rows = variable_width_histogram(ev, buckets=1).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["bucket"], r["n"], r["min_v"], r["max_v"]) == (
            1, 3, 1.25, 10.0,
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE events(value DOUBLE)")
        con.executemany("INSERT INTO events VALUES (?)", vals)
        du = con.sql(variable_width_histogram_sql(buckets=1)).fetchall()
        con.close()
        assert du == [(1, 3, 1.25, 10.0, r["avg_v"])]
        # empty input at buckets=1 is still an empty frame
        empty = spark.createDataFrame([], "value double")
        assert variable_width_histogram(empty, buckets=1).count() == 0

    def test_change_point_finds_crafted_shift(self, spark):
        import datetime

        from search_engine_spark.operators.events import change_point

        rows = []
        eid = 0
        for d in range(10):
            per_day = 2 if d < 6 else 20  # shift at day index 6
            for i in range(per_day):
                rows.append(
                    (eid, datetime.datetime(2024, 3, 1 + d, 12, 0, i), 1,
                     "view", 1.0, "{}")
                )
                eid += 1
        ev = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        got = change_point(ev).collect()[0]
        assert got["change_day"] == datetime.datetime(2024, 3, 7)
        assert got["diff"] == 18.0  # mean 2 vs mean 20

    def test_categorize_text_collapses_numbers(self, spark):
        from search_engine_spark.operators.textstats import categorize_text

        docs = spark.createDataFrame(
            [
                (1, "error 42 in job 7"),
                (2, "error 9 in job 1234"),
                (3, "disk   full on node 3"),
            ],
            "doc_id long, text string",
        )
        out = {r["category"]: (r["n"], r["example_doc_id"])
               for r in categorize_text(docs).collect()}
        assert out["error <n> in job <n>"] == (2, 1)
        assert out["disk full on node <n>"] == (1, 3)

    def test_frequent_item_sets_supports(self, spark):
        from search_engine_spark.operators.textstats import (
            frequent_item_sets,
        )

        docs = spark.createDataFrame(
            [
                (1, "data fast"),
                (2, "data fast join"),
                (3, "data join"),
            ],
            "doc_id long, text string",
        )
        got = {(r["t1"], r["t2"]): r["support"]
               for r in frequent_item_sets(docs, min_support=2).collect()}
        assert got == {("data", "fast"): 2, ("data", "join"): 2}

    def test_rate_agg_crafted_day(self, spark):
        import datetime

        from search_engine_spark.operators.events import rate_agg

        ev = spark.createDataFrame(
            [(i, datetime.datetime(2024, 5, 1, i, 0, 0), 1, "view",
              1.25, "{}") for i in range(12)],
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        r = rate_agg(ev).collect()[0]
        assert r["n"] == 12 and r["rate_per_hour"] == 0.5
        assert r["value_per_day"] == 15.0


EV_SCHEMA = ("event_id long, ts timestamp, user_id long, "
             "event_type string, value double, props string")


class TestRound5Events:
    def _ev(self, spark, rows):
        return spark.createDataFrame(rows, EV_SCHEMA)

    def test_cumulative_cardinality_crafted(self, spark):
        """3-day fixture: day2 has ONLY returning users (row still
        emitted, new_users 0); totals are the exact distinct-to-date."""
        import datetime

        d = lambda day, h: datetime.datetime(2024, 5, day, h, 0, 0)
        rows = [
            (0, d(1, 1), 10, "view", 1.0, "{}"),
            (1, d(1, 2), 11, "view", 1.0, "{}"),
            (2, d(2, 1), 10, "view", 1.0, "{}"),   # returning only
            (3, d(3, 1), 11, "view", 1.0, "{}"),
            (4, d(3, 2), 12, "view", 1.0, "{}"),   # one new
        ]
        from search_engine_spark.operators.events import (
            cumulative_cardinality,
        )

        got = {
            r["day"].day: (r["new_users"], r["total_users"])
            for r in cumulative_cardinality(self._ev(spark, rows)).collect()
        }
        assert got == {1: (2, 2), 2: (0, 2), 3: (1, 3)}

    def test_events_retention_triangle(self, spark):
        """Two cohorts; offset-0 cells equal cohort sizes; a user active
        twice in one day counts once; sparse cells absent."""
        import datetime

        d = lambda day, h: datetime.datetime(2024, 5, day, h, 0, 0)
        rows = [
            # cohort day1: users 1,2 — user1 returns day2 AND day3,
            # user2 never returns
            (0, d(1, 1), 1, "view", 1.0, "{}"),
            (1, d(1, 2), 2, "view", 1.0, "{}"),
            (2, d(2, 1), 1, "view", 1.0, "{}"),
            (3, d(2, 2), 1, "view", 1.0, "{}"),   # same user, same day
            (4, d(3, 1), 1, "view", 1.0, "{}"),
            # cohort day2: user 3
            (5, d(2, 3), 3, "view", 1.0, "{}"),
        ]
        from search_engine_spark.operators.events import events_retention

        got = {
            (r["cohort_day"].day, r["day_offset"]): r["n_users"]
            for r in events_retention(self._ev(spark, rows)).collect()
        }
        assert got == {
            (1, 0): 2, (1, 1): 1, (1, 2): 1,
            (2, 0): 1,
        }

    def test_normalize_agg_flat_and_sloped(self, spark):
        import datetime

        from search_engine_spark.operators.events import normalize_agg

        d = lambda day, i: datetime.datetime(2024, 5, day, 1, 0, i)
        flat = [
            (i, d(1 + i // 2, i % 2), 1, "v", 1.0, "{}") for i in range(6)
        ]
        rows = normalize_agg(self._ev(spark, flat)).collect()
        assert all(r["rescaled"] == 0.0 for r in rows)  # flat series
        assert sum(r["pct_of_sum"] for r in rows) == pytest.approx(
            1.0, abs=len(rows) * 5e-5  # 4-dp rounding per bucket
        )
        sloped = (
            [(i, d(1, i), 1, "v", 1.0, "{}") for i in range(1)]
            + [(10 + i, d(2, i), 1, "v", 1.0, "{}") for i in range(3)]
            + [(20 + i, d(3, i), 1, "v", 1.0, "{}") for i in range(5)]
        )
        got = {
            r["day"].day: (r["n"], r["pct_of_sum"], r["rescaled"])
            for r in normalize_agg(self._ev(spark, sloped)).collect()
        }
        assert got == {
            1: (1, round(1 / 9, 4), 0.0),
            2: (3, round(3 / 9, 4), 50.0),
            3: (5, round(5 / 9, 4), 100.0),
        }
