"""Distributed Bloom filter — broadcastable membership for decontamination.

The training-pipeline problem: drop every corpus document whose text
appears in a held-out evaluation set (test-set decontamination) WITHOUT
joining 10^12 corpus rows against the holdout. A Bloom filter built over
the holdout keys is a few KB–MB of bits regardless of corpus size; it
ships to every task as plan literals and the probe is pure codegen column
arithmetic — the corpus-side cost is one narrow scan, zero shuffles,
zero joins. False positives (bounded by the classic (1-e^{-kn/m})^k) are
the price; false negatives are impossible — the filter DROPS a superset,
exactly the safe direction for decontamination. The surface reports both
verdicts per doc (bloom_hit vs exact_member) so the FP overhead is
observable; at production scale only the probe column runs and the exact
join is omitted.

Build side: k h60 re-hashes per key ("b{i}:" prefix — same portable
re-hash family as MinHash, hashing.py), positions mod m_bits, bits
packed 32-per-BIGINT word (bit 31 max keeps every shift inside signed-64
range in BOTH Spark and DuckDB — no 1<<63 sign traps), sparse
(word_idx, word) rows via groupBy(word_idx).agg(bit_or) — map-side
combinable, reduce state bounded by m_words regardless of |holdout|.
The sparse words collect to the driver (<= m_words rows BY CONSTRUCTION)
and enter the probe plan as a map literal.

The DuckDB oracle reproduces the identical arithmetic (same md5-based
h60, same packing), so bloom_hit — INCLUDING its false positives — is
bit-reproducible, not just statistically similar.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..hashing import h60_col

BITS_PER_WORD = 32  # bit 31 max: every (1 << off) stays positive signed-64
M_WORDS_DEFAULT = 32  # 1024 bits
K_HASHES_DEFAULT = 2
HOLDOUT_MOD_DEFAULT = 97


def bloom_key_col() -> Column:
    """The membership key: whitespace-trimmed, case-folded text — the
    same normalization exact dedup fingerprints use."""
    return F.lower(F.trim(F.col("text")))


def _position(col: Column, i: int, m_bits: int) -> Column:
    return h60_col(F.concat(F.lit(f"b{i}:"), col)) % F.lit(m_bits)


def bloom_build(
    keys: DataFrame,
    key: Column,
    m_words: int = M_WORDS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> DataFrame:
    """Holdout keys → sparse filter words (word_idx, word). One narrow
    scan, k-way in-row position fan-out, one bounded groupBy."""
    m_bits = m_words * BITS_PER_WORD
    pos = keys.select(
        F.explode(
            F.array(*[_position(key, i, m_bits) for i in range(k)])
        ).alias("pos")
    )
    return (
        pos.select(
            (F.col("pos") / F.lit(BITS_PER_WORD))
            .cast("long")
            .alias("word_idx"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                (F.col("pos") % BITS_PER_WORD).cast("int"),
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_words(
    keys: DataFrame,
    key: Column,
    m_words: int = M_WORDS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> dict[int, int]:
    """Materialized filter: {word_idx: word}. <= m_words entries."""
    return {
        r["word_idx"]: r["word"]
        for r in bloom_build(keys, key, m_words, k).collect()
    }


def bloom_probe_col(
    key: Column,
    words: dict[int, int],
    m_words: int = M_WORDS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> Column:
    """Membership test as a pure column expression (codegen, no join):
    every one of the k bits must be set. Empty filter → constant false."""
    if not words:
        return F.lit(False)
    m_bits = m_words * BITS_PER_WORD
    word_map = F.create_map(
        *[x for wi, w in sorted(words.items()) for x in (F.lit(wi), F.lit(w))]
    )
    cond = None
    for i in range(k):
        pos = _position(key, i, m_bits)
        word = F.coalesce(
            word_map[(pos / F.lit(BITS_PER_WORD)).cast("long")],
            F.lit(0).cast("long"),
        )
        bit_set = (
            F.call_function(
                "shiftright", word, (pos % BITS_PER_WORD).cast("int")
            ).bitwiseAND(F.lit(1).cast("long"))
            == 1
        )
        cond = bit_set if cond is None else (cond & bit_set)
    return cond


def decontaminate(
    docs: DataFrame,
    holdout_mod: int = HOLDOUT_MOD_DEFAULT,
    m_words: int = M_WORDS_DEFAULT,
    k: int = K_HASHES_DEFAULT,
) -> DataFrame:
    """(doc_id, bloom_hit, exact_member) for every document, probing a
    Bloom filter built over the deterministic holdout slice
    (doc_id % holdout_mod == 0 — the synthetic stand-in for an external
    eval set; a real pipeline passes any keys frame to bloom_words).

    bloom_hit ⊇ exact_member always (no false negatives); the gap is
    the observable FP cost of m_words × 32 bits at this holdout size.
    The exact column is gate-scale instrumentation — a broadcast-range
    join at corpus scale it would be omitted (that is the point of the
    filter)."""
    key = bloom_key_col()
    holdout = docs.filter(
        (F.col("doc_id") % holdout_mod) == 0
    ).select(key.alias("hk"))
    words = bloom_words(holdout, F.col("hk"), m_words, k)
    exact = (
        holdout.distinct()
        .withColumnRenamed("hk", "_k")
        .withColumn("_m", F.lit(True))
    )
    return (
        docs.select("doc_id", key.alias("_k"))
        .withColumn("bloom_hit", bloom_probe_col(F.col("_k"), words, m_words, k))
        .join(F.broadcast(exact), "_k", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce(F.col("_m"), F.lit(False)).alias("exact_member"),
        )
    )


def ngram_contamination(
    docs: DataFrame,
    holdout_mod: int = HOLDOUT_MOD_DEFAULT,
    shingle_k: int | None = None,
    m_words: int = 64,
    k: int = K_HASHES_DEFAULT,
) -> DataFrame:
    """Per-document n-gram overlap vs the holdout's shingle Bloom filter
    — the FUZZY tier of decontamination. `decontaminate` drops exact
    full-text members; real eval-set leakage usually arrives as
    paraphrase-with-copied-passages, which full-text hashing misses.
    This scores every document by the fraction of its word k-shingles
    present in the holdout filter:

        (doc_id, n_shingles, n_flagged, overlap_ratio)

    High ratio → quarantine (the Dolma/RefinedWeb-style passage-overlap
    gate, made join-free at corpus scale by the broadcast filter —
    corpus-side cost is one shingle fan-out + a codegen probe per
    shingle, no shuffle touches the holdout). overlap_ratio is a
    conservative UPPER bound on true overlap (Bloom false positives
    inflate, never deflate), the safe direction for a drop gate.
    Holdout members themselves score 1.0 by construction — the gate's
    sanity anchor. Shingling reuses dedup's `word_shingles` (distinct
    k-grams, short docs contribute their full text as one shingle).
    """
    from .dedup import SHINGLE_K, word_shingles

    sk = SHINGLE_K if shingle_k is None else shingle_k
    sh = word_shingles(docs, sk)
    holdout_sh = sh.join(
        docs.filter((F.col("doc_id") % holdout_mod) == 0).select("doc_id"),
        "doc_id",
        "left_semi",
    ).select("shingle")
    words = bloom_words(holdout_sh, F.col("shingle"), m_words, k)
    return (
        sh.withColumn(
            "hit",
            bloom_probe_col(F.col("shingle"), words, m_words, k).cast(
                "long"
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum("hit").alias("n_flagged"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_flagged",
            F.round(
                F.col("n_flagged") / F.col("n_shingles"), 4
            ).alias("overlap_ratio"),
        )
    )
