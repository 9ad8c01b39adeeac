"""Geo query + aggregation family — Elasticsearch's geo surface over the
documents table.

The reference has no geo support at all; Elasticsearch (the system a
full-text-engine user would otherwise reach for) treats `geo_point` as a
first-class field with distance queries, bounding-box filters, and grid
aggregations. This module supplies that surface over a deterministic
geo_point derived from doc_id (the FIXTURES pattern used for http_code /
warc_ts / required_matches: the sandbox parquet has no geo column, so both
the engine and the DuckDB oracle derive the SAME point from the row key).

Derivation (integer-exact in all engines, no float divergence possible):

    lat_e4 = h60('geo:lat:' || doc_id) % 1600001 - 800000   # ±80.0000°×1e4
    lon_e4 = h60('geo:lon:' || doc_id) % 3600001 - 1800000  # ±180.000°×1e4
    lat = lat_e4 / 10000.0,  lon = lon_e4 / 10000.0

Latitude stays inside ±80° so every point is far from the web-mercator
singularity (ES clamps at ±85.05112878°).

Scale notes: every operator here is a narrow codegen projection/filter over
the documents scan — no joins, no UDFs; the only shuffles are the grid/ring
groupBy aggregations (map-side combinable, cardinality = tiles/rings, tiny).
At 100 TB the bounding-box and distance filters push down to the scan; a
production layout would additionally cluster the table by a space-filling
curve (geotile/geohash prefix) so file pruning kicks in — the tile key
computed here IS that clustering key.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from search_engine_spark.hashing import h60_col

EARTH_RADIUS_M = 6371000.0
LAT_MOD = 1_600_001
LAT_OFF = 800_000
LON_MOD = 3_600_001
LON_OFF = 1_800_000


def lat_e4_col(doc_id="doc_id"):
    """Integer micro-degree latitude (×1e4), derived via h60."""
    key = F.concat(F.lit("geo:lat:"), F.col(doc_id).cast("string"))
    return (h60_col(key) % LAT_MOD - LAT_OFF).cast("long")


def lon_e4_col(doc_id="doc_id"):
    key = F.concat(F.lit("geo:lon:"), F.col(doc_id).cast("string"))
    return (h60_col(key) % LON_MOD - LON_OFF).cast("long")


def with_geo(docs: DataFrame) -> DataFrame:
    """documents + (lat_e4, lon_e4, lat, lon). The float columns are exact
    (integer / 1e4 is correctly rounded identically everywhere); filters
    that must be knife-edge-exact compare on the integer columns."""
    return (
        docs.withColumn("lat_e4", lat_e4_col())
        .withColumn("lon_e4", lon_e4_col())
        .withColumn("lat", F.col("lat_e4") / 10000.0)
        .withColumn("lon", F.col("lon_e4") / 10000.0)
    )


def _haversine_m(lat_col, lon_col, clat: float, clon: float):
    """Great-circle distance in meters from (clat, clon) literals — the
    textbook haversine, stated in the EXACT operation order the DuckDB
    oracle mirrors (geo_distance_sql) so both engines agree to ~1e-9 m."""
    dphi = F.radians(lat_col - float(clat))
    dlmb = F.radians(lon_col - float(clon))
    a = (
        F.sin(dphi / 2.0) * F.sin(dphi / 2.0)
        + F.cos(F.radians(F.lit(float(clat))))
        * F.cos(F.radians(lat_col))
        * F.sin(dlmb / 2.0)
        * F.sin(dlmb / 2.0)
    )
    return 2.0 * EARTH_RADIUS_M * F.asin(F.sqrt(a))


def geo_distance_search(
    docs: DataFrame,
    center_lat: float,
    center_lon: float,
    radius_m: float,
    limit: int = 20,
) -> DataFrame:
    """ES `geo_distance` query + `_geo_distance` sort → the `limit`
    closest docs within `radius_m` of the center: (doc_id, dist_m) with
    dist rounded 4 dp, ordered dist asc, doc_id asc. One pass over the
    scan; the radius filter applies BEFORE the top-k heap so the sort
    never sees the far corpus."""
    g = with_geo(docs)
    dist = _haversine_m(F.col("lat"), F.col("lon"), center_lat, center_lon)
    return (
        g.withColumn("dist_m", F.round(dist, 4))
        .filter(F.col("dist_m") <= float(radius_m))
        .select("doc_id", "dist_m")
        .orderBy(F.col("dist_m").asc(), F.col("doc_id").asc())
        .limit(int(limit))
    )


def geo_bounding_box(
    docs: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> DataFrame:
    """ES `geo_bounding_box` filter → (doc_id, lat, lon). Comparisons run
    on the INTEGER micro-degree columns (exact; a point on the edge can
    never flip between engines). Antimeridian crossing follows ES: when
    min_lon > max_lon the box wraps — longitude matches `>= min OR
    <= max` instead of the AND band."""
    g = with_geo(docs)
    lo_lat = int(round(min_lat * 10000))
    hi_lat = int(round(max_lat * 10000))
    lo_lon = int(round(min_lon * 10000))
    hi_lon = int(round(max_lon * 10000))
    lat_ok = (F.col("lat_e4") >= lo_lat) & (F.col("lat_e4") <= hi_lat)
    if lo_lon > hi_lon:  # wraps the antimeridian
        lon_ok = (F.col("lon_e4") >= lo_lon) | (F.col("lon_e4") <= hi_lon)
    else:
        lon_ok = (F.col("lon_e4") >= lo_lon) & (F.col("lon_e4") <= hi_lon)
    return g.filter(lat_ok & lon_ok).select("doc_id", "lat", "lon")


def geotile_grid(docs: DataFrame, zoom: int = 5, size: int = 20) -> DataFrame:
    """ES `geotile_grid` aggregation → (tile, doc_count): web-mercator
    z/x/y tile keys at `zoom`, top `size` buckets by count desc (tie:
    tile key asc — pinned, where ES leaves ties unspecified).

        x = floor((lon + 180)/360 · 2^z)
        y = floor((1 − ln(tan(φ) + 1/cos(φ))/π)/2 · 2^z)

    clamped to [0, 2^z − 1]. The derivation keeps |lat| ≤ 80° so the
    mercator term is well-conditioned. groupBy cardinality ≤ 4^z —
    map-side combinable, trivially small shuffle. `size` is clamped to
    min(4^z, 65536): the tile space bounds the bucket count, 65536 is
    ES's search.max_buckets guard, and an unbounded top-k limit would
    make TakeOrdered allocate an O(size) heap per task.

    Cross-engine determinism: unlike geo_bounding_box (integer
    micro-degree compares, exactly reproducible), the tile key passes
    through tan/cos/ln, where JVM and DuckDB libm may differ by 1 ULP —
    enough to flip floor() when the raw coordinate sits on a knife edge.
    Both engines therefore round the raw tile coordinate to 9 dp (same
    half-away mode) BEFORE floor: a 1-ULP divergence (~1e-16 relative)
    is absorbed, and the residual risk window shrinks to |coord −
    boundary| < 5e-10, which no e4-quantized input point occupies. The
    x path is already exact ((lon+180)/360·2^z is exact FP arithmetic on
    e4-grid inputs); the rounding is applied to both for symmetry."""
    size = min(int(size), (1 << int(zoom)) ** 2, 65536)
    n = float(1 << int(zoom))
    g = with_geo(docs)
    phi = F.radians(F.col("lat"))
    merc = F.log(F.tan(phi) + 1.0 / F.cos(phi))
    x = F.floor(F.round((F.col("lon") + 180.0) / 360.0 * n, 9))
    y = F.floor(F.round((1.0 - merc / math.pi) / 2.0 * n, 9))
    clamp = lambda c: F.greatest(  # noqa: E731
        F.lit(0.0), F.least(c.cast("double"), F.lit(n - 1.0))
    ).cast("long")
    tile = F.concat_ws("/", F.lit(str(int(zoom))), clamp(x), clamp(y))
    return (
        g.groupBy(tile.alias("tile"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("tile").asc())
        .limit(int(size))
    )


def geo_distance_rings(
    docs: DataFrame,
    center_lat: float,
    center_lon: float,
    edges_m: list[float],
) -> DataFrame:
    """ES `geo_distance` aggregation → (ring, doc_count, min_dist,
    max_dist): concentric half-open rings [from, to) around the center,
    first ring open below, last open above — exactly ES's range-agg
    bucketing applied to the haversine distance. Ring label format
    mirrors ES: '*-500000.0', '500000.0-2000000.0', '2000000.0-*'.
    min/max of the (rounded) distance per ring are the range-agg
    sub-metrics; ordered by ring lower edge."""
    g = with_geo(docs)
    dist = F.round(
        _haversine_m(F.col("lat"), F.col("lon"), center_lat, center_lon), 4
    )
    edges = [float(e) for e in edges_m]
    bounds = [(None, edges[0])]
    bounds += [(edges[i], edges[i + 1]) for i in range(len(edges) - 1)]
    bounds += [(edges[-1], None)]
    ring = None
    order = None
    for i, (lo, hi) in enumerate(bounds):
        label = f"{'*' if lo is None else lo}-{'*' if hi is None else hi}"
        cond = F.lit(True)
        if lo is not None:
            cond = cond & (F.col("dist_m") >= lo)
        if hi is not None:
            cond = cond & (F.col("dist_m") < hi)
        ring = F.when(cond, F.lit(label)) if ring is None else ring.when(
            cond, F.lit(label)
        )
        order = F.when(cond, F.lit(i)) if order is None else order.when(
            cond, F.lit(i)
        )
    return (
        g.withColumn("dist_m", dist)
        .groupBy(ring.alias("ring"), order.alias("ord"))
        .agg(
            F.count("*").alias("doc_count"),
            F.min("dist_m").alias("min_dist"),
            F.max("dist_m").alias("max_dist"),
        )
        .orderBy(F.col("ord").asc())
        .drop("ord")
    )


def geo_centroid(docs: DataFrame) -> DataFrame:
    """ES `geo_centroid` aggregation per site → (site_key, n,
    centroid_lat, centroid_lon): the arithmetic mean point of each
    bucket's documents. Computed from the INTEGER micro-degree sums
    (exact int64 arithmetic in every engine — no float summation-order
    divergence), divided once at the end and rounded 4 dp. One
    map-side-combinable groupBy over a projected scan; bucket
    cardinality = sites."""
    from search_engine_spark.sources.documents import site_key_col

    g = with_geo(docs).withColumn("site_key", site_key_col())
    return (
        g.groupBy("site_key")
        .agg(
            F.count("*").alias("n"),
            F.sum("lat_e4").alias("_slat"),
            F.sum("lon_e4").alias("_slon"),
        )
        .select(
            "site_key",
            "n",
            F.round(
                F.col("_slat").cast("double") / F.col("n") / 10000.0, 4
            ).alias("centroid_lat"),
            F.round(
                F.col("_slon").cast("double") / F.col("n") / 10000.0, 4
            ).alias("centroid_lon"),
        )
        .orderBy("site_key")
    )


def distance_feature(
    docs: DataFrame,
    center_lat: float,
    center_lon: float,
    pivot_m: float,
    boost: float = 1.0,
    k: int = 20,
) -> DataFrame:
    """ES `distance_feature` query (geo_point flavour) → top-k
    (doc_id, score): score = boost · pivot / (pivot + distance), the
    saturating proximity ranker that contributes smoothly to relevance
    instead of hard-filtering like geo_distance. The distance is the
    haversine rounded 4 dp BEFORE entering the score (the same
    cross-engine pin geo_distance_rings uses), then the score rounds
    4 dp; ties doc_id asc. One narrow scan + TakeOrdered — no shuffle,
    no filter (every doc scores; the pivot does the discounting)."""
    g = with_geo(docs)
    dist = F.round(
        _haversine_m(F.col("lat"), F.col("lon"), center_lat, center_lon), 4
    )
    score = F.round(
        float(boost) * float(pivot_m) / (float(pivot_m) + dist), 4
    )
    return (
        g.select("doc_id", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(int(k))
    )


GEOHASH_ALPHABET = "0123456789bcdefghjkmnpqrstuvwxyz"
GEOHASH_PRECISION = 4  # chars → 20 bits (10 lon + 10 lat)


def geohash_grid(
    docs: DataFrame, precision: int = GEOHASH_PRECISION, size: int = 20
) -> DataFrame:
    """ES `geohash_grid` aggregation → (geohash, doc_count): classic
    base32 geohash cells at `precision` chars, top `size` buckets by
    count desc (tie: hash asc — pinned where ES leaves ties
    unspecified). The sibling of geotile_grid with the geodesy swapped:
    equirectangular lat/lon quantization + bit interleave (lon takes the
    even bit positions from the MSB) instead of web-mercator z/x/y.

    The quantization is EXACT FP arithmetic on the e4-grid inputs
    ((lat+90)/180·2^bits has no tan/ln in the path — unlike the geotile
    y axis no libm guard is needed; the round-9 is kept for symmetry
    with geotile_grid's documented knife-edge policy). The interleave
    and base32 digits are integer shift/mod expressions unrolled at plan
    build (5·precision terms — whole-stage codegen folds them), so both
    engines compute the identical cell id bit-for-bit. groupBy
    cardinality ≤ 32^precision, map-side combinable; `size` clamped by
    the cell space and ES's 65536 max-buckets guard."""
    p = int(precision)
    total = 5 * p
    latbits = total // 2
    lonbits = total - latbits
    size = min(int(size), 32**p, 65536)
    g = with_geo(docs)
    lat_q = (
        F.greatest(
            F.lit(0.0),
            F.least(
                F.floor(
                    F.round((F.col("lat") + 90.0) / 180.0 * float(1 << latbits), 9)
                ).cast("double"),
                F.lit(float((1 << latbits) - 1)),
            ),
        )
    ).cast("long")
    lon_q = (
        F.greatest(
            F.lit(0.0),
            F.least(
                F.floor(
                    F.round((F.col("lon") + 180.0) / 360.0 * float(1 << lonbits), 9)
                ).cast("double"),
                F.lit(float((1 << lonbits) - 1)),
            ),
        )
    ).cast("long")
    combined = F.lit(0).cast("long")
    for i in range(total):  # i = 0 is the MSB; even positions take lon
        if i % 2 == 0:
            src, nb, idx = lon_q, lonbits, i // 2
        else:
            src, nb, idx = lat_q, latbits, i // 2
        bit = F.shiftright(src, nb - 1 - idx) % 2
        combined = combined + bit * F.lit(1 << (total - 1 - i)).cast("long")
    alpha = F.array(*[F.lit(ch) for ch in GEOHASH_ALPHABET])
    chars = [
        F.element_at(
            alpha,
            (F.shiftright(combined, 5 * (p - 1 - c)) % 32 + 1).cast("int"),
        )
        for c in range(p)
    ]
    gh = F.concat(*chars)
    return (
        g.groupBy(gh.alias("geohash"))
        .agg(F.count("*").alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("geohash").asc())
        .limit(size)
    )


def geo_bounds(docs: DataFrame) -> DataFrame:
    """ES `geo_bounds` aggregation per site → (site_key, n, top, left,
    bottom, right): the smallest lat/lon box enclosing each bucket's
    points (top = max lat, left = min lon, bottom = min lat, right =
    max lon — ES's top_left/bottom_right envelope, without wrap_longitude
    since the fixture never crosses the antimeridian). min/max run on
    the INTEGER micro-degree columns (exact in every engine), divided
    once at the end. One map-side-combinable groupBy; bucket cardinality
    = sites."""
    from search_engine_spark.sources.documents import site_key_col

    g = with_geo(docs).withColumn("site_key", site_key_col())
    return (
        g.groupBy("site_key")
        .agg(
            F.count("*").alias("n"),
            F.max("lat_e4").alias("_top"),
            F.min("lon_e4").alias("_left"),
            F.min("lat_e4").alias("_bottom"),
            F.max("lon_e4").alias("_right"),
        )
        .select(
            "site_key",
            "n",
            (F.col("_top") / 10000.0).alias("top"),
            (F.col("_left") / 10000.0).alias("left"),
            (F.col("_bottom") / 10000.0).alias("bottom"),
            (F.col("_right") / 10000.0).alias("right"),
        )
        .orderBy("site_key")
    )


GEO_LINE_SIZE = 10  # points per track (ES geo_line `size`)


def geo_line(docs: DataFrame, size: int = GEO_LINE_SIZE) -> DataFrame:
    """ES `geo_line` aggregation per site → (site_key, seq, doc_id, lat,
    lon): the first `size` points of each site's track, ordered by the
    sort field (warc_ts asc, doc_id asc tiebreak — the crawl-trajectory
    line a monitoring map draws). ES emits one LineString per bucket;
    the pinned relational form is the exploded ordered point list
    (seq = 1-based position on the line), which hashes engine-neutrally.

    Plan: one window partitioned by site (maximal-cardinality key is
    sites — at web scale partition by a finer bucket key first and merge
    heads, the top-k-per-group shape) ranked by the sort field, rank
    filter ≤ size. No corpus sort, no collect."""
    from pyspark.sql import Window

    from search_engine_spark.sources.documents import site_key_col

    g = with_geo(docs).withColumn("site_key", site_key_col())
    w = Window.partitionBy("site_key").orderBy(
        F.col("warc_ts").asc(), F.col("doc_id").asc()
    )
    return (
        g.withColumn("seq", F.row_number().over(w))
        .filter(F.col("seq") <= int(size))
        .select("site_key", F.col("seq").cast("int").alias("seq"),
                "doc_id", "lat", "lon")
    )
