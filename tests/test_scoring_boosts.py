"""Property tests for the function_score family (scoring_boosts.py):
closed-form decay values, flat-top offsets, linear cutoff-to-zero,
rank_feature boost bounds, and random_score determinism."""

import math

import pytest

from search_engine_spark.operators import scoring_boosts as sb

BASE_EP = 1_704_067_200  # 2024-01-01, the fixture epoch


def _mk_docs(spark, ages_days):
    """One doc per requested crawl age (days before the corpus max)."""
    mx = BASE_EP + 86_400 * 365
    rows = [
        (i, float(mx - int(a * 86_400)))
        for i, a in enumerate(ages_days)
    ]
    return spark.createDataFrame(rows, "doc_id long, ep double").select(
        "doc_id", F_ts("ep").alias("warc_ts")
    )


def F_ts(col):
    from pyspark.sql import functions as F

    return F.col(col).cast("timestamp")


def _mk_hits(spark, n):
    return spark.createDataFrame(
        [(i, 1.0) for i in range(n)], "doc_id long, score double"
    )


AGES = [0.0, 1.0, 2.0, 5.0, 12.0, 30.0, 200.0]


@pytest.mark.parametrize("mode", ["gauss", "exp", "linear"])
def test_decay_matches_closed_form(spark, mode):
    docs = _mk_docs(spark, AGES)
    hits = _mk_hits(spark, len(AGES))
    got = {
        r["doc_id"]: r["score"]
        for r in sb.decay_function_score(
            hits, docs, mode=mode, limit=100
        ).collect()
    }
    scale, offset, dec = (
        sb.DECAY_SCALE_DAYS,
        sb.DECAY_OFFSET_DAYS,
        sb.DECAY_VALUE,
    )
    for i, age in enumerate(AGES):
        dist = max(0.0, age - offset)
        if mode == "gauss":
            sigma2 = -(scale * scale) / (2.0 * math.log(dec))
            want = math.exp(-(dist * dist) / (2.0 * sigma2))
        elif mode == "exp":
            want = math.exp(math.log(dec) / scale * dist)
        else:
            s = scale / (1.0 - dec)
            want = max(0.0, (s - dist) / s)
        assert got[i] == pytest.approx(round(want, 4), abs=1e-9), (
            mode,
            age,
        )


def test_decay_flat_top_and_scale_point(spark):
    """Inside the offset the score is untouched; at offset+scale the
    multiplier is exactly `decay` for every curve."""
    docs = _mk_docs(
        spark, [0.0, sb.DECAY_OFFSET_DAYS, sb.DECAY_OFFSET_DAYS + sb.DECAY_SCALE_DAYS]
    )
    hits = _mk_hits(spark, 3)
    for mode in ("gauss", "exp", "linear"):
        got = {
            r["doc_id"]: r["score"]
            for r in sb.decay_function_score(
                hits, docs, mode=mode, limit=10
            ).collect()
        }
        assert got[0] == 1.0 and got[1] == 1.0, mode  # flat top
        assert got[2] == pytest.approx(sb.DECAY_VALUE, abs=1e-4), mode


def test_linear_decay_hits_zero(spark):
    cutoff = sb.DECAY_OFFSET_DAYS + sb.DECAY_SCALE_DAYS / (
        1.0 - sb.DECAY_VALUE
    )
    docs = _mk_docs(spark, [0.0, cutoff + 1.0, cutoff + 500.0])
    hits = _mk_hits(spark, 3)
    got = {
        r["doc_id"]: r["score"]
        for r in sb.decay_function_score(
            hits, docs, mode="linear", limit=10
        ).collect()
    }
    assert got[1] == 0.0 and got[2] == 0.0
    assert got[0] == 1.0


def test_rank_feature_boost_bounded(spark):
    """Saturation boost is additive and < weight — a perfect feature
    cannot override a textual-relevance gap larger than `weight`."""
    hits = spark.createDataFrame(
        [(1, 10.0), (2, 10.0 + sb.RF_WEIGHT + 0.01)],
        "doc_id long, score double",
    )
    feats = spark.createDataFrame(
        [(1, 1.0), (2, 0.0)], "doc_id long, quality double"
    )
    rows = sb.rank_feature_boost(hits, feats).collect()
    assert [r["doc_id"] for r in rows] == [2, 1]  # gap survives max boost
    by_id = {r["doc_id"]: r["score"] for r in rows}
    assert by_id[1] - 10.0 < sb.RF_WEIGHT  # S(f) < 1 strictly
    assert by_id[2] == pytest.approx(10.0 + sb.RF_WEIGHT + 0.01, abs=1e-9)


def test_random_score_deterministic_and_seed_sensitive(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    a = [(r["doc_id"], r["rscore"]) for r in sb.random_score(docs, limit=200).collect()]
    b = [(r["doc_id"], r["rscore"]) for r in sb.random_score(docs, limit=200).collect()]
    assert a == b  # replayable
    assert all(0.0 <= s < 1.0 for _, s in a)
    c = [r["doc_id"] for r in sb.random_score(docs, seed=99, limit=200).collect()]
    assert c != [d for d, _ in a]  # seed changes the permutation
