"""Geo family pins — the invariants the oracle pairing can't state:
wrap-box decomposition, grid/ring partition totality, and a pure-Python
haversine cross-check."""

import math

import pytest

from search_engine_spark.hashing import h60_py
from search_engine_spark.operators.geo import (
    geo_bounding_box,
    geo_distance_rings,
    geo_distance_search,
    geotile_grid,
    with_geo,
)
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST


@pytest.fixture(scope="module")
def docs(spark):
    return load_documents(spark, SF_TEST)


def _py_point(doc_id: int):
    lat = (h60_py(f"geo:lat:{doc_id}") % 1_600_001 - 800_000) / 10000.0
    lon = (h60_py(f"geo:lon:{doc_id}") % 3_600_001 - 1_800_000) / 10000.0
    return lat, lon


def _py_haversine(lat, lon, clat, clon):
    dphi = math.radians(lat - clat)
    dlmb = math.radians(lon - clon)
    a = (
        math.sin(dphi / 2) ** 2
        + math.cos(math.radians(clat))
        * math.cos(math.radians(lat))
        * math.sin(dlmb / 2) ** 2
    )
    return 2 * 6371000.0 * math.asin(math.sqrt(a))


def test_geo_derivation_matches_pure_python(spark, docs):
    rows = with_geo(docs).select("doc_id", "lat", "lon").limit(50).collect()
    assert rows
    for r in rows:
        lat, lon = _py_point(r["doc_id"])
        assert r["lat"] == lat and r["lon"] == lon
        assert -80.0 <= lat <= 80.0 and -180.0 <= lon <= 180.0


def test_wrap_box_is_union_of_two_plain_boxes(spark, docs):
    """ES antimeridian semantics: the wrapping box [150, -150] equals the
    union of [150, 180] and [-180, -150] — and is disjoint from the
    complement band."""
    wrap = {
        r["doc_id"]
        for r in geo_bounding_box(docs, -30.0, 30.0, 150.0, -150.0).collect()
    }
    east = {
        r["doc_id"]
        for r in geo_bounding_box(docs, -30.0, 30.0, 150.0, 180.0).collect()
    }
    west = {
        r["doc_id"]
        for r in geo_bounding_box(docs, -30.0, 30.0, -180.0, -150.0).collect()
    }
    assert wrap == east | west
    mid = {
        r["doc_id"]
        for r in geo_bounding_box(
            docs, -30.0, 30.0, -149.9999, 149.9999
        ).collect()
    }
    assert not (wrap & mid)


def test_geotile_partitions_the_corpus(spark, docs):
    """Every doc lands in exactly one tile: with an uncut bucket list the
    counts sum to the corpus size, and x/y stay inside [0, 2^z)."""
    n_docs = docs.count()
    tiles = geotile_grid(docs, zoom=4, size=10**9).collect()
    assert sum(r["doc_count"] for r in tiles) == n_docs
    for r in tiles:
        z, x, y = (int(p) for p in r["tile"].split("/"))
        assert z == 4 and 0 <= x < 16 and 0 <= y < 16


def test_rings_partition_and_bound_distances(spark, docs):
    n_docs = docs.count()
    edges = [2_000_000.0, 5_000_000.0, 10_000_000.0]
    rings = geo_distance_rings(docs, 40.7128, -74.006, edges).collect()
    assert sum(r["doc_count"] for r in rings) == n_docs
    by_label = {r["ring"]: r for r in rings}
    full = [None] + edges + [None]
    for i in range(len(full) - 1):
        lo, hi = full[i], full[i + 1]
        label = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        if label not in by_label:
            continue  # empty ring emits no row
        r = by_label[label]
        if lo is not None:
            assert r["min_dist"] >= lo
        if hi is not None:
            assert r["max_dist"] < hi


def test_geo_distance_sorted_filtered_and_exact(spark, docs):
    hits = geo_distance_search(docs, 48.8566, 2.3522, 3_000_000.0).collect()
    assert hits
    dists = [r["dist_m"] for r in hits]
    assert dists == sorted(dists)
    assert all(d <= 3_000_000.0 for d in dists)
    for r in hits[:10]:
        lat, lon = _py_point(r["doc_id"])
        expect = _py_haversine(lat, lon, 48.8566, 2.3522)
        assert r["dist_m"] == pytest.approx(expect, abs=1e-3)


def test_geo_centroid_is_exact_integer_mean(spark, docs):
    from search_engine_spark.operators.geo import geo_centroid

    rows = geo_centroid(docs).collect()
    assert {r["site_key"] for r in rows} == {"site-a", "site-b", "site-c"}
    n_docs = docs.count()
    assert sum(r["n"] for r in rows) == n_docs
    # exact recomputation from the pure-python derivation
    by_site = {}
    for r in docs.select("doc_id").collect():
        d = r["doc_id"]
        lat_e4 = h60_py(f"geo:lat:{d}") % 1_600_001 - 800_000
        lon_e4 = h60_py(f"geo:lon:{d}") % 3_600_001 - 1_800_000
        key = "site-" + chr(97 + d % 3)
        s = by_site.setdefault(key, [0, 0, 0])
        s[0] += 1
        s[1] += lat_e4
        s[2] += lon_e4
    for r in rows:
        n, slat, slon = by_site[r["site_key"]]
        assert r["n"] == n
        assert r["centroid_lat"] == round(slat / n / 10000.0, 4)
        assert r["centroid_lon"] == round(slon / n / 10000.0, 4)


def test_distance_feature_saturating_ranker(spark):
    """Semantic pins for distance_feature: score strictly decreases with
    distance (same ordering as the _geo_distance sort), lies in
    (0, boost], and a point at EXACTLY pivot distance scores boost/2."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.geo import (
        _haversine_m,
        distance_feature,
        with_geo,
    )

    docs = load_documents(spark, SF_TEST)
    pivot, boost = 1_000_000.0, 2.0
    rows = distance_feature(
        docs, 48.8566, 2.3522, pivot_m=pivot, boost=boost, k=50
    ).collect()
    assert rows and all(0.0 < r["score"] <= boost for r in rows)
    g = with_geo(docs)
    dist = {
        r["doc_id"]: r["d"]
        for r in g.select(
            "doc_id",
            F.round(
                _haversine_m(F.col("lat"), F.col("lon"), 48.8566, 2.3522), 4
            ).alias("d"),
        ).collect()
    }
    # closer == higher score, up to 4-dp score ties (two docs whose
    # scores round equal may order by doc_id, not distance)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for i in range(len(rows) - 1):
        if scores[i] != scores[i + 1]:
            assert dist[rows[i]["doc_id"]] < dist[rows[i + 1]["doc_id"]]
    # the pivot law itself
    assert round(boost * pivot / (pivot + pivot), 4) == boost / 2
