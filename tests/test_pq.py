"""Product quantization: code validity, determinism, ADC recall floor."""

import duckdb
import numpy as np
import pytest

from search_engine_spark.operators.similarity import (
    PQ_K,
    PQ_M,
    ann_pq,
    pq_codebook_rows,
    pq_encode,
)
from search_engine_spark.sources.documents import load_embeddings

from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def emb(spark):
    return load_embeddings(spark, SF_TEST).cache()


def test_pq_codes_shape_and_range(spark, emb):
    codes = pq_encode(spark, emb).toPandas()
    n_vec = emb.count()
    assert len(codes) == n_vec * PQ_M
    assert set(codes["m"]) == set(range(PQ_M))
    assert codes["code"].between(0, PQ_K - 1).all()
    # deterministic re-run
    again = pq_encode(spark, emb).toPandas()
    key = ["vec_id", "m"]
    assert codes.sort_values(key).reset_index(drop=True).equals(
        again.sort_values(key).reset_index(drop=True)
    )


def test_pq_codebook_vectors_encode_to_themselves(spark, emb):
    """A codebook source vector's subvector is at distance 0 from its own
    centroid, so vec_id k < PQ_K must encode to code k in every subspace."""
    codes = pq_encode(spark, emb).toPandas()
    own = codes[codes["vec_id"] < PQ_K]
    assert (own["code"] == own["vec_id"]).all()


def test_ann_pq_recall_floor(spark, emb):
    """ADC top-5 vs exact L2 top-5: the crude sampled codebook (FAISS
    random-init, no Lloyd) must still beat random guessing by far —
    measured 0.28 mean recall on this fixture; floor pinned at 0.15.
    (A trained codebook through the same seam raises this; the operator
    contract is the plan shape + exactness of ADC arithmetic, which the
    DuckDB oracle pins value-for-value.)"""
    qids = [0, 1, 2, 3, 4]
    got = ann_pq(spark, emb, qids).toPandas()
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([[float(x) for x in r["embedding"]] for r in rows])
    recalls = []
    for q in qids:
        d = np.linalg.norm(V - V[ids.tolist().index(q)], axis=1)
        order = [i for i in np.argsort(d, kind="stable") if ids[i] != q]
        exact = {int(ids[i]) for i in order[:5]}
        approx = set(got[got["qid"] == q]["vec_id"])
        recalls.append(len(exact & approx) / 5)
    assert sum(recalls) / len(recalls) >= 0.15
