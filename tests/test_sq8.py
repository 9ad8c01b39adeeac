"""int8 scalar quantization: code validity, reconstruction error bound,
two-stage rescoring exactness, recall vs brute force."""

import numpy as np
import pytest

from search_engine_spark.operators.similarity import (
    EMB_DIM,
    SQ_LEVELS,
    ann_bruteforce,
    ann_sq8,
    sq8_bounds,
    sq8_encode,
)
from search_engine_spark.sources.documents import load_embeddings

from tests.conftest import SF_TEST

QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def emb(spark):
    return load_embeddings(spark, SF_TEST).cache()


@pytest.fixture(scope="module")
def bounds(emb):
    return sq8_bounds(emb)


def test_bounds_cover_corpus(emb, bounds):
    lo, hi = bounds
    assert len(lo) == len(hi) == EMB_DIM
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float32,
    )
    assert np.allclose(mat.min(axis=0), np.array(lo, dtype=np.float32))
    assert np.allclose(mat.max(axis=0), np.array(hi, dtype=np.float32))


def test_codes_in_range_and_monotone(emb, bounds):
    """Every code in 0..255; extreme values hit the extreme codes."""
    codes = sq8_encode(emb, bounds).toPandas()
    arr = np.array(codes["codes"].tolist())
    assert arr.shape[1] == EMB_DIM
    assert arr.min() >= 0 and arr.max() <= SQ_LEVELS - 1
    # each dimension's min value encodes to 0 and max value to 255
    assert (arr.min(axis=0) == 0).all()
    assert (arr.max(axis=0) == SQ_LEVELS - 1).all()


def test_reconstruction_error_bounded(emb, bounds):
    """Midpoint dequantization error is at most half a bucket per dim."""
    lo = np.array(bounds[0])
    hi = np.array(bounds[1])
    span = hi - lo
    codes = sq8_encode(emb, bounds).toPandas().set_index("vec_id")
    raw = {
        int(r["vec_id"]): np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }
    for vec_id in list(raw)[:50]:
        c = np.array(codes.loc[vec_id, "codes"], dtype=np.float64)
        deq = lo + (c + 0.5) * span / SQ_LEVELS
        err = np.abs(deq - raw[vec_id])
        # half a bucket width, plus float32 slack
        assert (err <= span / SQ_LEVELS / 2 + 1e-5).all()


def test_ann_sq8_scores_are_exact(spark, emb):
    """Stage 2 rescoring: every reported cos equals the brute-force exact
    cosine for that (query, vec) pair — quantization may change WHICH docs
    surface, never the score printed for them."""
    sq = ann_sq8(emb, QUERY_IDS, k=5).toPandas()
    bf = ann_bruteforce(emb, QUERY_IDS, k=200).toPandas()
    exact = {
        (int(r.query_id), int(r.vec_id)): float(r.cos)
        for r in bf.itertuples()
    }
    hits = 0
    for r in sq.itertuples():
        key = (int(r.query_id), int(r.vec_id))
        if key in exact:
            assert float(r.cos) == exact[key]
            hits += 1
    assert hits >= len(sq) * 0.8  # nearly all survivors rank inside exact top-200


def test_ann_sq8_recall(spark, emb):
    """int8 quantization at 64 dims is nearly lossless for ranking:
    top-5 recall vs brute force should be high (≥0.8 mean)."""
    sq = ann_sq8(emb, QUERY_IDS, k=5).toPandas()
    bf = ann_bruteforce(emb, QUERY_IDS, k=5).toPandas()
    recalls = []
    for qid in QUERY_IDS:
        s = set(sq[sq.query_id == qid].vec_id)
        b = set(bf[bf.query_id == qid].vec_id)
        recalls.append(len(s & b) / len(b))
    assert np.mean(recalls) >= 0.8


def test_sq8_encode_clamps_below_foreign_bounds(spark):
    """Bounds trained on one segment, vectors from another (the Lucene
    per-segment case): a value below the trained lo must clamp to code 0,
    never go negative; above hi clamps to 255."""
    lo = [0.0] * EMB_DIM
    hi = [1.0] * EMB_DIM
    v = [-0.5] * EMB_DIM
    v[0] = 2.0  # above hi on dim 0, below lo elsewhere
    emb = spark.createDataFrame(
        [(0, v)], "vec_id long, embedding array<float>"
    )
    codes = sq8_encode(emb, (lo, hi)).collect()[0]["codes"]
    assert codes[0] == SQ_LEVELS - 1
    assert all(c == 0 for c in codes[1:])
