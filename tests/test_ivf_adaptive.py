"""Scale-adaptive IVF coarse quantizer (round-3 item #1).

The r02 verdict's one remaining scale cliff was the fixed K=16 default:
per-cell work (n/16)² is still quadratic at fixed K. The default is now
K = max(16, ⌈√n⌉) (adaptive_n_centroids), which bounds cells at O(√n)
and corpus-wide pair work at O(n^1.5). These tests pin that shape on
the real testdata at two scales (n=500 → K=23, n=2000 → K=45), and pin
the broadcast-join assignment twin (used past LITERAL_CENTROID_MAX,
where a literal centroid array would sink codegen) exactly equal to the
literal-projection path.
"""

import math

import pytest

from search_engine_spark.operators import similarity as sim

SF_SMALL = "/root/testdata/sf0.001"
SF_LARGE = "/root/testdata/sf0.1"


def _cells(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    assign = sim.ivf_assign(emb, sim.ivf_centroid_rows(emb))
    sizes = [r["count"] for r in assign.groupBy("centroid_id").count().collect()]
    return n, sizes


def test_adaptive_k_follows_sqrt_n(spark):
    emb_s = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    emb_l = spark.read.parquet(f"{SF_LARGE}/embeddings.parquet")
    assert sim.adaptive_n_centroids(emb_s) == max(16, math.ceil(math.sqrt(emb_s.count())))
    assert sim.adaptive_n_centroids(emb_l) == max(16, math.ceil(math.sqrt(emb_l.count())))
    # the floor: a tiny corpus never drops below 16 centroids
    assert sim.adaptive_n_centroids(emb_s.limit(10)) == 16


@pytest.mark.parametrize("sf_dir", [SF_SMALL, SF_LARGE])
def test_cell_population_is_order_sqrt_n(spark, sf_dir):
    """Max cell ≤ 3·√n and Σ|cell|² ≤ 3·n^1.5 — the O(n) per-cell /
    O(n^1.5) corpus-wide bound the adaptive K buys (measured: ~1.3·√n
    and ~1.01·n^1.5 on this data; quadratic would be √n× larger)."""
    n, sizes = _cells(spark, sf_dir)
    assert max(sizes) <= 3 * math.sqrt(n)
    assert sum(s * s for s in sizes) <= 3 * n**1.5


def test_pair_work_scales_subquadratically(spark):
    """n grows 4× (500→2000): pair work must grow ≤ 4^1.5·slack = 10×,
    where the old fixed-K default grew it 4² = 16×."""
    n_s, sizes_s = _cells(spark, SF_SMALL)
    n_l, sizes_l = _cells(spark, SF_LARGE)
    assert (n_l, n_s) == (2000, 500)
    ratio = sum(s * s for s in sizes_l) / sum(s * s for s in sizes_s)
    assert ratio <= 10.0


def test_ivf_assign_join_path_matches_literal(spark):
    """The broadcast-join assignment twin (kicks in past
    LITERAL_CENTROID_MAX centroids) is row-identical to the literal
    argmax projection, embeddings carried through and all."""
    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    cents = sim.ivf_centroid_rows(emb)
    for keep in (False, True):
        a = sorted(
            map(tuple, sim.ivf_assign(emb, cents, keep_embedding=keep).collect())
        )
        b = sorted(
            map(
                tuple,
                sim._ivf_assign_join(emb, cents, keep_embedding=keep).collect(),
            )
        )
        assert a == b


def test_large_k_auto_routes_to_join_path(spark):
    """ivf_assign on > LITERAL_CENTROID_MAX centroids must not build the
    literal array (the plan would carry K·dim literals); the join path
    produces a plan with a broadcast join instead."""
    emb = spark.read.parquet(f"{SF_LARGE}/embeddings.parquet")
    cents = sim.ivf_centroid_rows(emb, n_centroids=sim.LITERAL_CENTROID_MAX + 4)
    df = sim.ivf_assign(emb, cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    # and it still assigns every vector exactly once
    assert df.count() == emb.count()
