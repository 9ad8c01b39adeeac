"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine. The training-data-pipeline surface a 100 TB corpus needs
before indexing (none exist in the reference; they are first-class here).

Everything is built from the portable h60 hash (hashing.py: md5-derived
60-bit int, identical in Spark / DuckDB / Python), so the driver's DuckDB
oracle reproduces every signature bit-for-bit. All plans are pure
DataFrame ops — explode/groupBy/join — no UDFs.

Scale notes per operator:

* exact_duplicates — one groupBy on a 16-byte hash; the canonical-id
  min() is a map-side-combinable agg. At 100 TB this is THE cheap first
  pass; shuffle moves one short row per doc.
* minhash signatures — explode(shingles) → groupBy(doc, perm).min(hash):
  shuffle is |docs|·|perms| small rows; perms explode via a literal
  array so the fan-out is in-task, not a join.
* LSH bands — signatures → (band, band_key) → self-join inside buckets.
  Bucket sizes are bounded because band keys concatenate PERM_BAND
  min-hashes; the classic (b bands × r rows) S-curve tunes recall.
* simhash — explode(term bits) via a 60-element literal bit array;
  groupBy(doc).sum(signed tf) per bit → 60-bit signature; near-dups =
  signatures at Hamming distance ≤ d over band-join candidates.
* ngram_jaccard — word n-gram shingle explode + pair self-join +
  |∩|/|∪|; exact but quadratic in shared-shingle pairs — the verification
  stage AFTER LSH candidate generation, never the corpus-wide pass.
* embedding near-dup — brute pairwise cosine on candidate pairs;
  corpus-wide pairs only at test scale (similarity.py has the ANN path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..hashing import h60_col
from ..textproc.tokenize import WS_SPLIT
from .textstats import fingerprints

N_PERM = 12  # minhash permutations
PERM_BAND = 3  # rows per band  → 4 bands
N_BANDS = N_PERM // PERM_BAND
SHINGLE_K = 3  # word shingle width
SIMHASH_BITS = 60


# ------------------------------------------------------------------ exact

def exact_duplicates(docs: DataFrame) -> DataFrame:
    """(doc_id, canonical_id, group_size) for docs whose normalized text
    collides exactly; canonical = min doc_id of the group. Unique docs are
    excluded (group_size ≥ 2)."""
    fp = fingerprints(docs)
    w = Window.partitionBy("fp")
    return (
        fp.withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("group_size", F.count("*").over(w))
        .filter(F.col("group_size") >= 2)
        .select("doc_id", "canonical_id", "group_size")
    )


# ----------------------------------------------------------------- shingles

def word_shingles(docs: DataFrame, k: int = SHINGLE_K) -> DataFrame:
    """(doc_id, shingle) — distinct word k-grams of the normalized text.
    Docs shorter than k words contribute their full text as one shingle."""
    toks = F.split(F.regexp_replace(F.lower(F.trim("text")), WS_SPLIT, " "), " ")
    n = F.size(toks)
    grams = F.when(n <= k, F.array(F.array_join(toks, " "))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.array_join(F.slice(toks, i + 1, k), " "),
        )
    )
    return (
        docs.filter(F.trim("text") != "")
        .select("doc_id", F.explode(grams).alias("shingle"))
        .distinct()
    )


# ------------------------------------------------------------------ minhash

def minhash_signatures(docs: DataFrame, n_perm: int = N_PERM) -> DataFrame:
    """(doc_id, perm, minhash) — classic MinHash: the i-th 'permutation'
    re-hashes each shingle with an i-prefixed portable h60 and takes the
    min per doc (hashing.py explains why re-hashing replaces a*h+b)."""
    sh = word_shingles(docs)
    perms = F.explode(
        F.array(*[F.lit(i) for i in range(n_perm)])
    ).alias("perm")
    exploded = sh.select("doc_id", "shingle", perms)
    h = h60_col(
        F.concat(F.col("perm").cast("string"), F.lit(":"), F.col("shingle"))
    )
    return (
        exploded.withColumn("h", h)
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_band_table(
    docs: DataFrame, n_perm: int = N_PERM, band_rows: int = PERM_BAND
) -> DataFrame:
    """(doc_id, band, band_key) — the LSH bucket relation (band key =
    concat of the band's min-hashes). This IS the stored artifact of an
    incremental dedup deployment: the corpus's band table persists (a
    few rows per doc), and each new crawl batch probes it
    (`lsh_probe_pairs`) instead of re-running the corpus-wide
    self-join."""
    sig = minhash_signatures(docs, n_perm)
    return (
        sig.withColumn("band", (F.col("perm") / band_rows).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("perm", "minhash"))
                    ),
                    lambda s: s["minhash"].cast("string"),
                ),
                "-",
            ).alias("band_key")
        )
    )


def lsh_candidate_pairs(
    docs: DataFrame, n_perm: int = N_PERM, band_rows: int = PERM_BAND
) -> DataFrame:
    """(doc_a, doc_b) candidate near-dup pairs: docs sharing at least one
    LSH band (band key = concat of the band's min-hashes)."""
    banded = lsh_band_table(docs, n_perm, band_rows)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )


# ------------------------------------------------------------------ jaccard

def jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard) — exact word-shingle Jaccard similarity kept
    at jaccard ≥ threshold.

    With ``candidates`` (the DEFAULT wiring — fed from
    lsh_candidate_pairs), the plan is candidate-DRIVEN: candidates join to
    each side's shingles and only those pairs' intersections are counted,
    so cost is O(|candidates| · shingles-per-doc). Without candidates the
    corpus-wide shingle self-join runs — exact but quadratic in
    shared-shingle pairs; verification/oracle scale only, never the 100 TB
    pass."""
    sh = word_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if candidates is not None:
        sh_a = sh.select(
            F.col("doc_id").alias("ca"), F.col("shingle").alias("sh_a")
        )
        sh_b = sh.select(
            F.col("doc_id").alias("cb"), F.col("shingle").alias("sh_b")
        )
        inter = (
            candidates.join(sh_a, F.col("doc_a") == F.col("ca"))
            .join(
                sh_b,
                (F.col("doc_b") == F.col("cb"))
                & (F.col("sh_a") == F.col("sh_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count("*").alias("n_inter"))
        )
    sa = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")
    )
    sb = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")
    )
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def containment_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """(contained, container, containment) — Broder's CONTAINMENT
    c(A,B) = |S(A)∩S(B)| / |S(A)| (resemblance's asymmetric twin,
    Broder 1997 §2): how much of doc A's shingle set lives inside doc B.
    Catches what Jaccard misses — a page quoted wholesale inside a much
    longer page scores near-1 containment but low Jaccard (the union is
    dominated by the container). Emits BOTH orientations of each
    candidate pair that clear the threshold, rounded 4 dp.

    Same candidate-driven plan as jaccard_pairs (one intersection count
    per unordered candidate pair, then two orientation rows derived from
    it) — with candidates from LSH band collisions the cost is
    O(|candidates| · shingles-per-doc); the corpus-wide self-join default
    is verification scale only."""
    sh = word_shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    if candidates is not None:
        sh_a = sh.select(
            F.col("doc_id").alias("ca"), F.col("shingle").alias("sh_a")
        )
        sh_b = sh.select(
            F.col("doc_id").alias("cb"), F.col("shingle").alias("sh_b")
        )
        inter = (
            candidates.join(sh_a, F.col("doc_a") == F.col("ca"))
            .join(
                sh_b,
                (F.col("doc_b") == F.col("cb"))
                & (F.col("sh_a") == F.col("sh_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("n_inter"))
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        inter = (
            a.join(
                b,
                (F.col("a.shingle") == F.col("b.shingle"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .agg(F.count("*").alias("n_inter"))
        )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    sized = inter.join(sa, "doc_a").join(sb, "doc_b")
    fwd = sized.select(
        F.col("doc_a").alias("contained"),
        F.col("doc_b").alias("container"),
        F.round(F.col("n_inter") / F.col("na"), 4).alias("containment"),
    )
    rev = sized.select(
        F.col("doc_b").alias("contained"),
        F.col("doc_a").alias("container"),
        F.round(F.col("n_inter") / F.col("nb"), 4).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)


# ---------------------------------------------------------- decontamination

CONTAM_K = 8  # contamination shingle width (word 8-grams)
CONTAM_HOLDOUT = 0.05  # stand-in benchmark fraction for the contract query


def contamination(
    docs: DataFrame,
    holdout_fraction: float = CONTAM_HOLDOUT,
    k: int = CONTAM_K,
    seed_tag: str = "split",
) -> DataFrame:
    """Benchmark-decontamination check → (doc_id, n_hits, n_shingles,
    n_holdout_docs): training documents sharing at least one word k-gram
    with the held-out (benchmark stand-in) split. The GPT-3/PaLM-style
    n-gram-overlap decontamination pass, expressed over the deterministic
    split (sampling.split_train_holdout) so the oracle reproduces
    membership bit-for-bit.

      * n_hits          — matched (shingle, holdout doc) pairs
      * n_shingles      — distinct contaminated shingles in the doc
      * n_holdout_docs  — distinct benchmark docs it collides with

    Scale shape: the benchmark side is small by construction (real eval
    suites are MBs against a 100 TB corpus), so its shingle set broadcasts
    and the train side streams through a map-side hash join — no shuffle
    of the corpus. Output is ONLY contaminated docs (inner join), so
    result size is bounded by actual contamination. For a holdout too big
    to broadcast, drop the hint and AQE falls back to a shuffle join."""
    from .sampling import split_train_holdout

    split = split_train_holdout(docs, holdout_fraction, seed_tag)
    train = split.filter(F.col("split") == "train")
    hold = split.filter(F.col("split") == "holdout")
    hsh = word_shingles(hold, k).withColumnRenamed("doc_id", "holdout_id")
    hits = word_shingles(train, k).join(F.broadcast(hsh), "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.count_distinct("shingle").alias("n_shingles"),
            F.count_distinct("holdout_id").alias("n_holdout_docs"),
        )
        .orderBy(F.col("n_hits").desc(), F.col("doc_id").asc())
    )


# ------------------------------------------------------------------ simhash

def simhash_signatures(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash) — tf-weighted SimHash over retained terms: bit j
    of the signature is 1 iff Σ_terms tf·(±1 by bit j of h60(term)) > 0."""
    from ..functions.text_columns import explode_terms

    tf = (
        explode_terms(docs)
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", h60_col(F.col("term")))
    )
    bit = F.explode(
        F.array(*[F.lit(j) for j in range(bits)])
    ).alias("bit")
    contrib = tf.select("doc_id", "tf", "h", bit).withColumn(
        "signed",
        F.when(
            F.expr("shiftright(h, bit) & 1") == 1, F.col("tf")
        ).otherwise(-F.col("tf")),
    )
    per_bit = contrib.groupBy("doc_id", "bit").agg(
        F.sum("signed").alias("s")
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), bit)"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_near_pairs(
    docs: DataFrame, max_hamming: int = 8, bits: int = SIMHASH_BITS
) -> DataFrame:
    """(doc_a, doc_b, hamming) — pairs whose SimHash signatures differ in
    ≤ max_hamming of the 60 bits. Candidate generation joins on 4 15-bit
    sub-bands (pigeonhole: ≤8 differing bits can corrupt at most 8 of the
    4 bands... at least one band intact when hamming ≤ 3·(bands-1); for
    the general case the band join is a recall-tuned candidate filter,
    verified by the exact popcount)."""
    sig = simhash_signatures(docs, bits)
    band_w = bits // 4
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright(F.col("simhash"), i * band_w)
                        .bitwiseAND(F.lit((1 << band_w) - 1))
                        .alias("key"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "simhash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sig_a"),
            F.col("b.simhash").alias("sig_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        pairs.withColumn("hamming", ham.cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# -------------------------------------------------------------- embeddings

def cosine_expr(a, b):
    """Exact cosine over two float array columns, computed in float64.

    A zero-norm vector is defined as similar to nothing (cos = 0.0) —
    without the guard one all-zero embedding raises DIVIDE_BY_ZERO under
    Spark 4's default ANSI mode and aborts every consumer (near-dup, ANN,
    k-means). The DuckDB oracle's list_cosine_similarity builtin is only
    compared on non-degenerate fixtures, so the definitions agree where
    they are tested."""
    da = F.transform(a, lambda x: x.cast("double"))
    db = F.transform(b, lambda x: x.cast("double"))
    dot = F.aggregate(
        F.zip_with(da, db, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(da, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    nb = F.sqrt(
        F.aggregate(db, F.lit(0.0), lambda acc, x: acc + x * x)
    )
    denom = na * nb
    return F.when(denom > 0.0, dot / denom).otherwise(F.lit(0.0))


def embedding_near_pairs(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """(vec_a, vec_b, cos) — EXACT embedding near-dup pairs (cosine ≥
    threshold) via brute-force all-pairs. Verification/oracle scale ONLY —
    quadratic in the corpus; embedding_near_pairs_lsh is the default scale
    path (bucket-restricted pairs), with this as its recall baseline
    (tests/test_pipeline.py)."""
    a = embeddings.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea")
    )
    b = embeddings.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb")
    )
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", F.round(cosine_expr(F.col("ea"), F.col("eb")), 4))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


EMB_BANDS = 4  # OR-amplification: candidates share ANY band
EMB_BAND_PLANES = 4  # AND within a band: r sign bits must all agree


def embedding_near_pairs_lsh(
    embeddings: DataFrame, threshold: float = 0.95
) -> DataFrame:
    """(vec_a, vec_b, cos) — near-dup pairs restricted to BANDED
    hyperplane-LSH buckets: 16 frozen hyperplanes split into 4 bands of 4
    sign bits; vectors colliding in ANY band are candidates (the classic
    b×r S-curve — P(candidate) = 1-(1-s^r)^b with s = 1-θ/π), exact cosine
    verifies inside the candidate set. The scale default: cost is
    b·Σ|bucket|² instead of |corpus|²; recall-vs-exact is measured against
    embedding_near_pairs in tests/test_pipeline.py."""
    from .similarity import lsh_signature_col

    n_planes = EMB_BANDS * EMB_BAND_PLANES
    sig = embeddings.select(
        "vec_id",
        "embedding",
        lsh_signature_col(F.col("embedding"), n_planes).alias("sig"),
    )
    banded = sig.select(
        "vec_id",
        "embedding",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.substring(
                            "sig", i * EMB_BAND_PLANES + 1, EMB_BAND_PLANES
                        ).alias("key"),
                    )
                    for i in range(EMB_BANDS)
                ]
            )
        ).alias("bk"),
    ).select(
        "vec_id", "embedding",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("ea"),
            F.col("b.embedding").alias("eb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return (
        pairs.withColumn(
            "cos", F.round(cosine_expr(F.col("ea"), F.col("eb")), 4)
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


# ------------------------------------------------------------- clustering

def connected_components(
    pairs: DataFrame, max_iterations: int = 20
) -> DataFrame:
    """(doc_id, cluster_id) — connected components over near-dup pairs;
    cluster_id = min doc_id reachable (deterministic canonical label).

    Iterative min-label propagation: every vertex repeatedly adopts the
    smallest label among itself and its neighbors; converges in
    O(component diameter) rounds (near-dup clusters are shallow — a hub
    duplicate plus satellites, diameter ≤ 3-4 in practice). Each round is
    one join + one groupBy(min) on (src) — the standard distributed
    formulation (large-star/small-star adds constant-factor tricks the
    shallow dedup case does not need). The driver loop carries only a
    changed-row COUNT per round, never data; at 100 TB each round shuffles
    one short row per edge."""
    edges = (
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
        .union(
            pairs.select(
                F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
            )
        )
        .distinct()
        .cache()
    )
    labels = (
        edges.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .cache()
    )
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                edges.join(labels.withColumnRenamed("doc_id", "src"), "src")
                .groupBy(F.col("dst").alias("doc_id"))
                .agg(F.min("label").alias("nmin"))
            )
            # localCheckpoint (not cache): caching alone keeps the full
            # logical plan, which doubles per round — by ~12 iterations
            # merely *printing* the plan OOMs the driver. Truncating
            # lineage each round keeps the plan O(1) regardless of
            # component diameter; the label frame is one short row per
            # vertex, so materializing it is the cheap part.
            updated = (
                labels.join(neighbor_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("label"), F.coalesce("nmin", F.col("label"))
                    ).alias("label"),
                )
                .localCheckpoint()
            )
            changed = (
                updated.join(
                    labels.withColumnRenamed("label", "old"), "doc_id"
                )
                .filter(F.col("label") != F.col("old"))
                .count()
            )
            labels = updated
            if changed == 0:
                break
        else:
            # silent non-convergence would emit one real component as
            # several clusters (under-deduplication nobody notices) — a
            # component wider than max_iterations must fail loudly
            raise RuntimeError(
                f"connected_components did not converge in "
                f"{max_iterations} rounds ({changed} labels still "
                f"changing) — component diameter exceeds the cap; raise "
                f"max_iterations"
            )
        return labels.select("doc_id", F.col("label").alias("cluster_id"))
    finally:
        edges.unpersist()


def connected_components_star(
    pairs: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """(doc_id, cluster_id) — connected components via alternating
    large-star / small-star (Kiveris et al., "Connected Components in
    MapReduce and Beyond", SoCC'14): cluster_id = min doc_id reachable,
    identical output contract to connected_components.

    Why a second CC implementation: min-label propagation converges in
    O(component diameter) rounds. Near-dup graphs are USUALLY shallow
    hubs, but threshold-boundary chains (A≈B≈C≈… where only adjacent
    pairs clear the bar) have diameter ~ component size — at web scale a
    10⁵-long chain stalls propagation while this algorithm contracts any
    topology in O(log n) rounds (each star step at least halves the
    distance to the component minimum).

    Per round both steps are one groupBy(min) + one join over the edge
    frame — no collect_set, so a hub of any degree never materializes a
    neighbor array; lineage is truncated per round (localCheckpoint) for
    the same plan-growth reason documented in connected_components.
    Convergence = the oriented edge set reaches a fixed point (star
    forest), checked exactly with subtract — one extra shuffle per round,
    bounded by the O(log n) round count."""
    # canonical orientation: (src > dst) — every undirected edge once
    edges = (
        pairs.select(
            F.greatest("doc_a", "doc_b").alias("src"),
            F.least("doc_a", "doc_b").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        # large-star: for every node u (as BOTH endpoints), m(u) = min
        # neighbor ∪ {u}; strictly larger neighbors v re-attach to m(u)
        sym = edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = sym.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        large = (
            sym.filter(F.col("dst") > F.col("src"))
            .join(mins, "src")
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # small-star on the (big→small) orientation: u and all its
        # ≤-neighbors re-attach to m(u)
        mins2 = large.groupBy("src").agg(
            F.least(F.min("dst"), F.first("src")).alias("m")
        )
        small = (
            large.join(mins2, "src")
            .select(
                F.col("dst").alias("src"), F.col("m").alias("dst")
            )
            .union(mins2.select(F.col("src"), F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint()
        )
        if (
            small.subtract(edges).limit(1).count() == 0
            and edges.subtract(small).limit(1).count() == 0
        ):
            edges = small
            break
        edges = small
    else:
        raise RuntimeError(
            f"connected_components_star did not reach a fixed point in "
            f"{max_rounds} alternating rounds — raise max_rounds"
        )
    # fixed point is a star forest: every edge points at its component
    # min; roots appear only as dst
    members = edges.select(
        F.col("src").alias("doc_id"), F.col("dst").alias("cluster_id")
    )
    roots = edges.select(F.col("dst").alias("doc_id")).distinct().withColumn(
        "cluster_id", F.col("doc_id")
    )
    return members.union(roots).distinct()


def dedup_clusters(
    docs: DataFrame, threshold: float = 0.5, algorithm: str = "prop"
) -> DataFrame:
    """(doc_id, cluster_id, cluster_size) — the full near-dup pipeline a
    training-data curation pass needs: MinHash-LSH candidates → exact
    candidate-driven Jaccard verification → connected components. The
    keep-one-per-cluster decision is then `filter(doc_id == cluster_id)`.
    Only docs that belong to some near-dup pair appear (singletons are
    implicitly their own cluster). algorithm: "prop" (min-label
    propagation, O(diameter) rounds — the shallow-hub default) or "star"
    (alternating large/small-star, O(log n) rounds — the defense against
    threshold-boundary chains)."""
    pairs = jaccard_pairs(
        docs, threshold, candidates=lsh_candidate_pairs(docs)
    ).select("doc_a", "doc_b")
    cc = connected_components_star if algorithm == "star" else connected_components
    comp = cc(pairs)
    sizes = comp.groupBy("cluster_id").agg(
        F.count("*").alias("cluster_size")
    )
    return comp.join(sizes, "cluster_id").select(
        "doc_id", "cluster_id", "cluster_size"
    )


def cluster_representatives(
    docs: DataFrame, threshold: float = 0.5, clusters: DataFrame = None
) -> DataFrame:
    """(cluster_id, rep_doc, cluster_size, n_dropped) — keep-best election
    per near-dup cluster, the decision step a curation pipeline runs after
    clustering: the representative is the member with the LONGEST text
    (the usual keep-richest policy; Lee et al. 2022 keep one arbitrary
    member — longest is the deterministic refinement), tie → lowest
    doc_id. The deduped corpus is then
    ``docs.join(losers, "doc_id", "left_anti")``.

    Scale: one doc-keyed join to attach lengths (clusters ≪ corpus, AQE
    broadcasts the cluster side) + one groupBy(cluster_id) max_by — no
    window over the corpus. Pass a precomputed ``clusters`` frame when
    the caller already ran dedup_clusters — the MinHash→LSH→Jaccard→
    connected-components pipeline is by far the most expensive stage and
    must not be paid twice for the same input."""
    if clusters is None:
        clusters = dedup_clusters(docs, threshold)
    member = clusters.join(
        docs.select("doc_id", F.length("text").alias("n_chars")), "doc_id"
    )
    return (
        member.groupBy("cluster_id")
        .agg(
            F.max_by(
                F.col("doc_id"),
                F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nd")),
            ).alias("rep_doc"),
            F.max("cluster_size").alias("cluster_size"),
        )
        .select(
            "cluster_id",
            "rep_doc",
            "cluster_size",
            (F.col("cluster_size") - 1).cast("long").alias("n_dropped"),
        )
    )


def mirror_hosts(docs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """(site_a, site_b, n_shared) — mirror-site detection (Bharat &
    Broder, WWW 1999): host pairs sharing many near-duplicate documents
    are mirrors/scrapes of each other; n_shared = count of cross-host
    near-dup pairs from the LSH→Jaccard pipeline, unordered pair
    canonicalized (site_a < site_b).

    A curation pipeline uses this to collapse whole mirrored HOSTS before
    per-document dedup ever runs — at web scale the host-pair aggregate
    is tiny (hosts² bounded by observed pairs, not hosts)."""
    from ..sources.documents import site_key_col

    pairs = jaccard_pairs(
        docs, threshold, candidates=lsh_candidate_pairs(docs)
    ).select("doc_a", "doc_b")
    sa = site_key_col(doc_id="doc_a")
    sb = site_key_col(doc_id="doc_b")
    m = (
        pairs.select(
            F.least(sa, sb).alias("site_a"), F.greatest(sa, sb).alias("site_b")
        )
        .filter(F.col("site_a") != F.col("site_b"))
    )
    return m.groupBy("site_a", "site_b").agg(
        F.count("*").alias("n_shared")
    )


def lsh_probe_pairs(
    corpus_docs: DataFrame,
    new_docs: DataFrame,
    n_perm: int = N_PERM,
    band_rows: int = PERM_BAND,
) -> DataFrame:
    """(doc_a = new, doc_b = existing) candidate pairs: each NEW doc's
    bands probe the corpus band table. The incremental complement of
    `lsh_candidate_pairs`: cost is O(|batch| · bands) probe rows against
    a stored relation, never the corpus-wide self-join — the shape a
    daily crawl increment needs at 10^12 docs (the corpus side is a
    persisted, bucket-partitioned table; the batch side is small enough
    that AQE broadcasts it)."""
    corpus = lsh_band_table(corpus_docs, n_perm, band_rows)
    new = lsh_band_table(new_docs, n_perm, band_rows)
    n = new.alias("n")
    c = corpus.alias("c")
    return (
        n.join(
            c,
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_key") == F.col("c.band_key")),
        )
        .select(
            F.col("n.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
        )
        .distinct()
    )


def dedup_incremental(
    docs: DataFrame,
    threshold: float = 0.5,
    new_mod: int = 13,
) -> DataFrame:
    """The incremental near-dup gate end-to-end: the deterministic
    doc_id % new_mod == 0 slice plays the NEW BATCH, the rest the
    existing corpus; batch bands probe the corpus band table and the
    collisions verify with candidate-driven exact Jaccard. Returns
    (doc_a = new, doc_b = existing, jaccard >= threshold) — the rows a
    production increment would anti-join against before appending."""
    is_new = (F.col("doc_id") % new_mod) == 0
    cand = lsh_probe_pairs(docs.filter(~is_new), docs.filter(is_new))
    return jaccard_pairs(docs, threshold, candidates=cand)
