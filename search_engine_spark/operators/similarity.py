"""Similarity search over embedding columns — brute-force cosine top-k
baseline + random-hyperplane-LSH bucketed variant (the scale path).

The embeddings table (vec_id, embedding: array<float>, label) models the
training-pipeline ANN workload. Both operators are pure DataFrame plans:

* brute-force — query set (small, broadcast) × corpus, exact cosine in
  float64 via zip_with/aggregate, per-query top-k with a window. At 100 TB
  the corpus side streams (narrow scan), the query side broadcasts, and
  the window is per-query (bounded k·|queries| state) — no corpus shuffle.
* LSH — H deterministic hyperplanes derived from the portable h60 hash
  (frozen pseudo-random components baked into the plan as literal arrays),
  signature = sign-bit string of the H dot products. Vectors sharing a
  signature bucket are candidates; exact cosine re-ranks inside buckets.
  Trades recall for a |bucket|² join instead of |corpus|² — the classic
  SimHash-for-vectors design.

The same hyperplanes are emitted as SQL literal lists so the DuckDB oracle
(list_dot_product / list_cosine_similarity) reproduces buckets and scores.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..hashing import h60_py
from .dedup import cosine_expr

N_PLANES = 8
EMB_DIM = 64


def hyperplane(j: int, dim: int = EMB_DIM) -> list[float]:
    """The j-th frozen pseudo-random hyperplane: components in [-1, 1)
    derived from h60('plane:<j>:<i>') — deterministic, identical in the
    oracle SQL (emitted as a literal list)."""
    return [
        h60_py(f"plane:{j}:{i}") / float(2**59) - 1.0 for i in range(dim)
    ]


def _dot_literal(col, plane: list[float]):
    """Dot product of an array<float> column with a literal plane, in
    float64 with left-to-right accumulation (same order as the oracle)."""
    arr = F.transform(col, lambda x: x.cast("double"))
    lit = F.array(*[F.lit(v) for v in plane])
    return F.aggregate(
        F.zip_with(arr, lit, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def lsh_signature_col(col, n_planes: int = N_PLANES, dim: int = EMB_DIM):
    """Bit-string signature: '1' where dot(v, plane_j) > 0."""
    bits = [
        F.when(_dot_literal(col, hyperplane(j, dim)) > 0, F.lit("1")).otherwise(
            F.lit("0")
        )
        for j in range(n_planes)
    ]
    return F.concat(*bits)


def ann_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — exact cosine top-k neighbors of each
    query vector (self excluded). Deterministic tiebreak: cos desc, vec_id
    asc."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.select("vec_id", "embedding")
    scored = (
        c.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos", F.round(cosine_expr(F.col("qe"), F.col("embedding")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def ann_filtered(
    embeddings: DataFrame,
    query_ids: list[int],
    labels: list[int],
    k: int = 5,
) -> DataFrame:
    """(query_id, vec_id, cos, rank, label) — FILTERED vector search
    (Elasticsearch `knn.filter` / pgvector WHERE): exact cosine top-k
    among candidates whose `label` is in the allow-list. The filter gates
    WHICH vectors may match but never HOW they score — pre-filter
    semantics, so a query always gets the k best PASSING vectors (the
    post-filter alternative, filtering after an unfiltered top-k, can
    return < k or even 0 passing hits; ES chose pre-filter for exactly
    this reason). Query vectors are looked up in the FULL table: a query
    may itself carry a filtered-out label.

    Plan: the label predicate lands in the candidate scan (pushed to the
    parquet reader), queries broadcast, per-query bounded top-k — the
    brute-force scan shape of ann_bruteforce over a smaller scan."""
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = embeddings.filter(F.col("label").isin(labels)).select(
        "vec_id", "embedding", "label"
    )
    scored = c.join(
        F.broadcast(q), F.col("vec_id") != F.col("query_id")
    ).withColumn(
        "cos", F.round(cosine_expr(F.col("qe"), F.col("embedding")), 4)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank", "label")
    )


def lsh_buckets(embeddings: DataFrame, n_planes: int = N_PLANES) -> DataFrame:
    """(vec_id, sig) — hyperplane-LSH bucket assignment for every vector."""
    return embeddings.select(
        "vec_id", lsh_signature_col(F.col("embedding"), n_planes).alias("sig")
    )


def ann_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = N_PLANES,
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — approximate top-k: candidates share
    the query's LSH bucket; exact cosine ranks within the bucket. Queries
    whose bucket holds < k neighbors simply return fewer rows (recall
    tradeoff — measured against ann_bruteforce in tests)."""
    with_sig = embeddings.select(
        "vec_id", "embedding", lsh_signature_col(F.col("embedding"), n_planes).alias("sig")
    )
    q = with_sig.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("sig").alias("qsig"),
    )
    scored = (
        with_sig.join(
            F.broadcast(q),
            (F.col("sig") == F.col("qsig"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .withColumn(
            "cos", F.round(cosine_expr(F.col("qe"), F.col("embedding")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


# ------------------------------------------------------------------ IVF

N_CENTROIDS = 16      # FLOOR for the adaptive quantizer, not the default K
NPROBE = 4
# Above this K the nearest-centroid argmax switches from a literal-array
# projection to a broadcast join: a 31k-centroid corpus (K = √10⁹) as
# ~2M literal doubles would blow the codegen expression tree, while a
# broadcast of 31k × 64-dim doubles is ~16 MB — well inside the default
# 8 GB broadcast-join ceiling.
LITERAL_CENTROID_MAX = 256


def adaptive_n_centroids(embeddings: DataFrame) -> int:
    """K = max(16, ⌈√n⌉) — the standard IVF sizing (FAISS guideline:
    K ∝ √n keeps both the assignment pass (n·K) and the per-cell
    quadratic ((n/K)² per cell, n²/K total → n^1.5) sub-quadratic).
    One COUNT over the narrow vec_id column; IEEE-correctly-rounded
    sqrt + ceil matches DuckDB's identical expression in the oracle CTE
    exactly (sqrt of a perfect square ≤ 2^52 is exact, and of a
    non-square is never an integer, so ceil cannot diverge)."""
    n = embeddings.count()
    return max(N_CENTROIDS, math.ceil(math.sqrt(n)))


def ivf_centroid_rows(
    embeddings: DataFrame, n_centroids: int | None = None
) -> list[tuple[int, list[float]]]:
    """The coarse quantizer: n_centroids (centroid_id, vector) pairs,
    collected driver-side (a few KB — the same driver-side-scalar pattern
    as the BM25 idf map).

    Centroids are a DETERMINISTIC SAMPLE of the corpus — the n_centroids
    smallest vec_ids — i.e. FAISS's random-selection initializer without
    Lloyd refinement, chosen because it is reproducible in ANSI SQL
    (ORDER BY vec_id LIMIT n). A production deployment would train k-means
    offline (kmeans_refine is that loop) and feed the trained table
    through this same seam; every plan below only sees a list of
    (id, vector) pairs.

    n_centroids=None (the default everywhere) resolves to
    adaptive_n_centroids — K ∝ √n — so cell populations stay O(√n) as
    the corpus grows instead of the fixed-K quadratic cliff."""
    if n_centroids is None:
        n_centroids = adaptive_n_centroids(embeddings)
    rows = (
        embeddings.orderBy("vec_id")
        .limit(n_centroids)
        .select("vec_id", "embedding")
        .collect()
    )
    return [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in rows]


def _lit_vec(vec: list[float]):
    return F.array(*[F.lit(v) for v in vec])


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    keep_embedding: bool = False,
) -> DataFrame:
    """(vec_id, centroid_id, cos) — inverted-file list assignment: every
    vector to its nearest centroid by cosine (rounded 4 dp; ties →
    smallest centroid_id). keep_embedding=True carries the vector through
    (the query path re-ranks candidates without re-joining the corpus).

    Scale shape: the argmax is computed INSIDE one projection — an
    array<struct(cos, -centroid_id)> of the K literal centroids reduced
    with array_max (struct ordering = cos desc then centroid_id asc) —
    pure whole-stage codegen over a narrow scan: zero shuffle, zero join,
    zero UDF for the corpus-wide assignment pass. Past
    LITERAL_CENTROID_MAX centroids (adaptive K on a large corpus) the
    literal expression tree would sink codegen, so the same argmax runs
    as a broadcast crossJoin + map-side-combined max_by — one n-row
    shuffle of the pre-reduced frame, never n·K."""
    if len(centroids) > LITERAL_CENTROID_MAX:
        return _ivf_assign_join(embeddings, centroids, keep_embedding)
    entries = F.array(
        *[
            F.struct(
                F.round(
                    cosine_expr(F.col("embedding"), _lit_vec(vec)), 4
                ).alias("cos"),
                F.lit(-cid).alias("neg_id"),
            )
            for cid, vec in centroids
        ]
    )
    best = F.array_max(entries)
    cols = [
        F.col("vec_id"),
        (-best["neg_id"]).cast("long").alias("centroid_id"),
        best["cos"].alias("cos"),
    ]
    if keep_embedding:
        cols.append(F.col("embedding"))
    return embeddings.select(*cols)


def _ivf_assign_join(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    keep_embedding: bool = False,
) -> DataFrame:
    """Large-K assignment twin of ivf_assign: broadcast the centroid
    table, score every (vector, centroid) pair in the join projection,
    reduce to the argmax with max(struct(cos, -centroid_id)) — Spark's
    partial aggregation collapses the n·K scored rows to n per map task
    before the single hash shuffle on vec_id. Bit-identical ordering
    semantics to the literal path (cos 4 dp desc, centroid_id asc) —
    pinned equal by test_ivf_assign_join_path_matches_literal."""
    spark = embeddings.sparkSession
    cent = spark.createDataFrame(
        [(int(cid), [float(x) for x in vec]) for cid, vec in centroids],
        "centroid_id bigint, cvec array<double>",
    )
    scored = embeddings.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        *(["embedding"] if keep_embedding else []),
        F.struct(
            F.round(cosine_expr(F.col("embedding"), F.col("cvec")), 4).alias(
                "cos"
            ),
            (-F.col("centroid_id")).alias("neg_id"),
        ).alias("entry"),
    )
    keys = ["vec_id"] + (["embedding"] if keep_embedding else [])
    best = scored.groupBy(*keys).agg(F.max("entry").alias("best"))
    cols = [
        F.col("vec_id"),
        (-F.col("best.neg_id")).cast("long").alias("centroid_id"),
        F.col("best.cos").alias("cos"),
    ]
    if keep_embedding:
        cols.append(F.col("embedding"))
    return best.select(*cols)


def ann_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int | None = None,
    nprobe: int = NPROBE,
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — IVF-flat approximate top-k: probe
    the query's nprobe nearest inverted lists, exact-cosine re-rank inside
    them (the classic FAISS IVF design, beside the hyperplane-LSH variant
    — IVF recall degrades gracefully with nprobe instead of with bucket
    population).

    Scale shape: corpus-side work is ONE codegen assignment pass
    (ivf_assign, no shuffle) + a broadcast semi-join against the
    |Q|·nprobe probe list that keeps ≈ nprobe/K of the corpus; the exact
    re-rank joins the (broadcast) query vectors and windows per query_id
    over only the surviving candidates."""
    centroids = ivf_centroid_rows(embeddings, n_centroids)
    # query → nprobe nearest centroids: sort an array of (−cos, id) structs
    # ascending = cos desc, centroid_id asc; slice the first nprobe
    entries = F.array(
        *[
            F.struct(
                (
                    -F.round(cosine_expr(F.col("embedding"), _lit_vec(vec)), 4)
                ).alias("ncos"),
                F.lit(cid).alias("centroid_id"),
            )
            for cid, vec in centroids
        ]
    )
    probes = (
        embeddings.filter(F.col("vec_id").isin(query_ids))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qe"),
            F.explode(
                F.slice(F.array_sort(entries), 1, nprobe)
            ).alias("probe"),
        )
        .select("query_id", "qe", F.col("probe.centroid_id").alias("centroid_id"))
    )
    assigned = ivf_assign(embeddings, centroids, keep_embedding=True).select(
        "vec_id", "centroid_id", "embedding"
    )
    scored = (
        assigned.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cos", F.round(cosine_expr(F.col("qe"), F.col("embedding")), 4)
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


# --------------------------------------------------------- product quantizer

PQ_M = 8           # subspaces (EMB_DIM 64 → 8 dims each)
PQ_K = 16          # codes per subspace (4-bit codes)
PQ_SUB = EMB_DIM // PQ_M


def pq_codebook_rows(
    embeddings: DataFrame, m_sub: int = PQ_M, k_codes: int = PQ_K
) -> list[tuple[int, int, list[float]]]:
    """(m, code, subvector) — the PQ codebook. Like ivf_centroid_rows,
    codebooks are a DETERMINISTIC corpus sample (subvectors of the
    k_codes smallest vec_ids — FAISS's random init without Lloyd
    refinement, reproducible in ANSI SQL); a trained codebook feeds the
    same seam. ~M·K rows, driver-side, broadcast into every plan."""
    sub = EMB_DIM // m_sub
    rows = (
        embeddings.orderBy("vec_id")
        .limit(k_codes)
        .select("vec_id", "embedding")
        .collect()
    )
    out = []
    for r in rows:
        vec = [float(x) for x in r["embedding"]]
        for m in range(m_sub):
            out.append((m, int(r["vec_id"]), vec[m * sub : (m + 1) * sub]))
    return out


def _l2_expr(a, b):
    """Euclidean distance of two array<double> columns, left-to-right
    accumulation (matches DuckDB list_distance within 4 dp rounding)."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def _subvectors(embeddings: DataFrame, m_sub: int = PQ_M) -> DataFrame:
    """(vec_id, m, sub: array<double>) — in-plan slicing, no shuffle."""
    sub = EMB_DIM // m_sub
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    slices = F.transform(
        F.sequence(F.lit(0), F.lit(m_sub - 1)),
        lambda m: F.slice(arr, m * sub + 1, sub),
    )
    return embeddings.select(
        "vec_id", F.posexplode(slices).alias("m", "sub")
    )


def _codebook_df(spark, codebook: list[tuple[int, int, list[float]]]):
    return spark.createDataFrame(
        [(m, c, [float(x) for x in v]) for m, c, v in codebook],
        "m int, code int, csub array<double>",
    )


def pq_encode(
    spark,
    embeddings: DataFrame,
    codebook: list[tuple[int, int, list[float]]] | None = None,
) -> DataFrame:
    """(vec_id, m, code) — each subvector quantized to its nearest
    codebook entry (L2, rounded 4 dp; ties → smallest code). 64 float32
    dims become M=8 4-bit codes: 256 B → 4 B per vector, the compression
    that lets a 10^9-vector index live in executor memory.

    Plan: corpus subvectors (in-plan slicing) ⋈ broadcast codebook
    (M·K = 128 rows) → per-(vec_id, m) argmin via min_by — one map-side
    combining aggregation, no corpus shuffle before it."""
    codebook = codebook or pq_codebook_rows(embeddings)
    cb = F.broadcast(_codebook_df(spark, codebook))
    sv = _subvectors(embeddings)
    d = sv.join(cb, "m").select(
        "vec_id",
        "m",
        "code",
        F.round(_l2_expr(F.col("sub"), F.col("csub")), 4).alias("d"),
    )
    return (
        d.groupBy("vec_id", "m")
        .agg(F.min_by("code", F.struct(F.col("d"), F.col("code"))).alias("code"))
        .select("vec_id", "m", "code")
    )


def ann_pq(
    spark,
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
) -> DataFrame:
    """(qid, vec_id, adc, rank) — asymmetric-distance-computation top-k:
    the query stays un-quantized; per (query, subspace) the M·K distance
    lookup table is computed once (in-plan, broadcastable), then every
    corpus vector's approximate distance is Σ_m table[m][code_m]² — the
    sum of SQUARED per-subspace distances, which (at zero quantization
    error) equals the squared L2 distance, the quantity FAISS's ADC
    ranks by. Summing unsquared distances would rank by an L1-of-L2
    hybrid that disagrees with the L2 ordering. The scan never touches
    raw vectors, only the 4-bit codes.

    All distance arithmetic happens in-plan on both engines (4 dp-rounded
    per cell and per sum), so the oracle reproduces it exactly."""
    codebook = pq_codebook_rows(embeddings)
    codes = pq_encode(spark, embeddings, codebook)
    cb = F.broadcast(_codebook_df(spark, codebook))
    qsub = F.broadcast(
        _subvectors(
            embeddings.filter(F.col("vec_id").isin(query_ids))
        ).withColumnRenamed("vec_id", "qid").withColumnRenamed("sub", "qsub")
    )
    lut = qsub.join(cb, "m").select(
        "qid",
        "m",
        "code",
        F.round(_l2_expr(F.col("qsub"), F.col("csub")), 4).alias("dq"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .groupBy("qid", "vec_id")
        # square the already-4dp-rounded cell distance: products of
        # bit-identical doubles stay bit-identical across engines
        .agg(F.round(F.sum(F.col("dq") * F.col("dq")), 4).alias("adc"))
        .filter(F.col("vec_id") != F.col("qid"))
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("adc").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ------------------------------------------------- int8 scalar quantization

SQ_LEVELS = 256
SQ_RERANK = 20


def sq8_bounds(embeddings: DataFrame) -> tuple[list[float], list[float]]:
    """Per-dimension (mins, maxs) over the corpus — the quantizer's only
    trained state (Lucene's int8 scalar quantization / ES `int8_hnsw`
    keeps exactly this pair per segment). Collected driver-side (2·dim
    floats) and baked into every plan as literal arrays; min/max of the
    stored float32 values involves no arithmetic, so the oracle recomputes
    the identical bounds inline."""
    agg = embeddings.select(
        F.posexplode("embedding").alias("dim", "v")
    ).groupBy("dim").agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    rows = sorted(agg.collect(), key=lambda r: r["dim"])
    return (
        [float(r["lo"]) for r in rows],
        [float(r["hi"]) for r in rows],
    )


def sq8_encode(
    embeddings: DataFrame,
    bounds: tuple[list[float], list[float]],
) -> DataFrame:
    """(vec_id, codes: array<int>) — each float32 dimension quantized to
    an unsigned 8-bit level: code = max(0, min(255,
    floor((x-lo)/(hi-lo)·256))) — the lower clamp matters when the bounds
    were trained on a different segment/corpus than the vectors being
    encoded (the Lucene per-segment case), where x < lo would otherwise
    emit a negative "unsigned" code. Constant dimensions → 0. 64 float32
    dims become 64 bytes — 4× smaller,
    and the approximate scan never touches raw vectors. floor() instead of
    a rounding mode keeps the arithmetic engine-portable (both sides do
    the same IEEE-double chain)."""
    lo_lit = F.array(*[F.lit(v) for v in bounds[0]])
    hi_lit = F.array(*[F.lit(v) for v in bounds[1]])
    arr = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    spans = F.zip_with(hi_lit, lo_lit, lambda h, l: h - l)
    scaled = F.zip_with(
        F.zip_with(arr, lo_lit, lambda x, l: x - l),
        spans,
        lambda d, s: F.when(
            s > 0,
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(SQ_LEVELS - 1),
                    F.floor(d / s * SQ_LEVELS).cast("int"),
                ),
            ),
        ).otherwise(F.lit(0)),
    )
    return embeddings.select("vec_id", scaled.alias("codes"))


def ann_sq8(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 5,
    rerank: int = SQ_RERANK,
) -> DataFrame:
    """(query_id, vec_id, cos, rank) — two-stage quantized ANN, the
    Lucene/ES int8 design: stage 1 scans only the int8 codes, scoring
    approximate cosine against the full-precision query (asymmetric:
    corpus side reconstructed to bucket midpoints); stage 2 rescores the
    top-`rerank` survivors per query with exact float cosine and returns
    the top-k. Quantization error changes stage-1 ORDER only — reported
    scores are exact.

    Scale shape: the corpus-wide pass is a zero-shuffle projection over
    the 4×-smaller codes column with the query codes broadcast; exact
    vectors are joined for only rerank·|Q| rows."""
    bounds = sq8_bounds(embeddings)
    lo_lit = F.array(*[F.lit(v) for v in bounds[0]])
    hi_lit = F.array(*[F.lit(v) for v in bounds[1]])
    codes = sq8_encode(embeddings, bounds)
    # midpoint dequantization: lo + (code + 0.5) * (hi - lo) / 256
    half = F.zip_with(
        F.col("codes").cast("array<double>"),
        F.zip_with(hi_lit, lo_lit, lambda h, l: h - l),
        lambda c, s: (c + 0.5) * s / SQ_LEVELS,
    )
    deq = codes.select(
        "vec_id", F.zip_with(half, lo_lit, lambda v, l: v + l).alias("deq")
    )
    q = embeddings.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    approx = (
        deq.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "acos", F.round(cosine_expr(F.col("qe"), F.col("deq")), 4)
        )
        .select("query_id", "vec_id", "acos")
    )
    w1 = Window.partitionBy("query_id").orderBy(
        F.col("acos").desc(), F.col("vec_id").asc()
    )
    survivors = (
        approx.withColumn("arank", F.row_number().over(w1))
        .filter(F.col("arank") <= rerank)
        .select("query_id", "vec_id")
    )
    exact = (
        survivors.join(embeddings.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn(
            "cos", F.round(cosine_expr(F.col("qe"), F.col("embedding")), 4)
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos", "rank")
    )


def kmeans_refine(
    embeddings: DataFrame,
    n_centroids: int | None = None,
    rounds: int = 1,
) -> DataFrame:
    """(vec_id, centroid_id, cos) — Lloyd's k-means over the embedding
    corpus, `rounds` refinement iterations from the deterministic
    ivf_centroid_rows initializer: assign (nearest centroid by cosine) →
    update (per-dimension mean, rounded 6 dp — the cross-engine float
    pin) → reassign. Topic clustering for corpus curation, and exactly
    the training loop whose output the IVF index consumes.

    Distributed shape per round: ONE posexplode + (centroid, dim)
    groupBy-avg (map-side combinable, 32·K cells) — the new centroids
    collect driver-side (KBs) and re-enter the next assignment as
    literals, keeping every corpus-wide pass a zero-shuffle projection
    (same driver-scalar discipline as the BM25 idf map). Empty clusters
    keep their previous centroid (FAISS's empty-cluster convention)."""
    cents = ivf_centroid_rows(embeddings, n_centroids)
    for _ in range(rounds):
        assigned = ivf_assign(embeddings, cents, keep_embedding=True)
        means = (
            assigned.select(
                "centroid_id", F.posexplode("embedding").alias("dim", "v")
            )
            .groupBy("centroid_id", "dim")
            .agg(F.round(F.avg("v"), 6).alias("m"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("vec")
            )
            .collect()
        )
        updated = {int(r["centroid_id"]): list(r["vec"]) for r in means}
        cents = [
            (cid, updated.get(cid, vec)) for cid, vec in cents
        ]
    return ivf_assign(embeddings, cents)


def knn_graph(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]] | None = None,
    k: int = 5,
    n_centroids: int | None = None,
) -> DataFrame:
    """(vec_id, nbr_id, cos, rank) — k-nearest-neighbor graph restricted
    to IVF cells: each vector's top-k cosine neighbors among vectors
    assigned to the SAME coarse cell. The kNN graph is the backbone
    artifact of embedding-space curation (SemDeDup-style dedup, density
    estimation, cluster pruning); cell restriction is what makes it
    buildable at corpus scale — with the default adaptive quantizer
    (K = ⌈√n⌉) cells hold O(√n) vectors, so the per-cell quadratic is
    O(n) and the corpus-wide pair count O(n^1.5), the standard IVF trade
    (recall loss only at cell boundaries, recovered in production with
    multi-probe or Lloyd-trained centroids via kmeans_refine through the
    same seam).

    Plan shape: one zero-shuffle assignment projection (ivf_assign), one
    hash-shuffle of the narrow (vec_id, centroid_id, embedding) frame on
    centroid_id for the self-join, per-vector top-k via window — state
    bounded by k, never the cell. No UDFs; exact float64 cosine."""
    if centroids is None:
        centroids = ivf_centroid_rows(embeddings, n_centroids)
    assign = ivf_assign(embeddings, centroids, keep_embedding=True).select(
        "vec_id", "centroid_id", "embedding"
    )
    pairs = assign.alias("a").join(
        assign.alias("b"),
        (F.col("a.centroid_id") == F.col("b.centroid_id"))
        & (F.col("a.vec_id") != F.col("b.vec_id")),
    )
    scored = pairs.select(
        F.col("a.vec_id").alias("vec_id"),
        F.col("b.vec_id").alias("nbr_id"),
        F.round(
            cosine_expr(F.col("a.embedding"), F.col("b.embedding")), 4
        ).alias("cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("nbr_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("vec_id", "nbr_id", "cos", "rank")
    )


def semdedup(
    embeddings: DataFrame,
    threshold: float,
    centroids: list[tuple[int, list[float]]] | None = None,
    n_centroids: int | None = None,
) -> DataFrame:
    """(vec_id, keep) — semantic deduplication: inside each IVF cell,
    drop every vector that has a same-cell near-duplicate (cosine ≥
    threshold, 4 dp) with a SMALLER vec_id, keeping exactly one
    deterministic representative per near-dup group reachable through
    such chains. This is SemDeDup (Abbas et al. 2023, arXiv:2303.09540)
    with min-id representative selection instead of the paper's
    lowest-centroid-similarity choice — id order is reproducible across
    engines and needs no second pass.

    Scale shape mirrors knn_graph: the pair join never leaves the cell,
    the duplicate set reduces by a distinct on vec_id (map-side
    combinable), and the final verdict is a left join of the narrow id
    column against that set — the embedding column is touched only inside
    the cell join."""
    if centroids is None:
        centroids = ivf_centroid_rows(embeddings, n_centroids)
    assign = ivf_assign(embeddings, centroids, keep_embedding=True).select(
        "vec_id", "centroid_id", "embedding"
    )
    dups = (
        assign.alias("a")
        .join(
            assign.alias("b"),
            (F.col("a.centroid_id") == F.col("b.centroid_id"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(
            F.round(
                cosine_expr(F.col("a.embedding"), F.col("b.embedding")), 4
            )
            >= threshold
        )
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        embeddings.select("vec_id")
        .join(dups, "vec_id", "left")
        .select("vec_id", F.col("_dup").isNull().alias("keep"))
    )
