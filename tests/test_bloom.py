"""Bloom-filter decontamination (operators/bloom.py).

Pins the two structural guarantees — no false negatives ever, filter
size bounded by m_words regardless of key count — and demonstrates a
deterministic false positive at an artificially tiny m (the probe is
md5-based, so FP behavior is reproducible, not statistical).
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import functions as F

from search_engine_spark.operators.bloom import (
    BITS_PER_WORD,
    bloom_probe_col,
    bloom_words,
    decontaminate,
)


def _keys(spark, ks):
    return spark.createDataFrame(
        pd.DataFrame({"hk": ks}), "hk string"
    )


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_positions(key: str, k: int, m_bits: int) -> list[int]:
    return [_h60(f"b{i}:{key}") % m_bits for i in range(k)]


def test_no_false_negatives_and_bounded_words(spark):
    ks = [f"document text number {i}" for i in range(50)]
    words = bloom_words(_keys(spark, ks), F.col("hk"), m_words=4, k=3)
    assert len(words) <= 4
    probed = (
        _keys(spark, ks)
        .withColumn("hit", bloom_probe_col(F.col("hk"), words, 4, 3))
        .collect()
    )
    assert all(r["hit"] for r in probed)  # members ALWAYS hit


def test_matches_pure_python_reference(spark):
    ks = ["alpha", "beta", "gamma"]
    m_words, k = 2, 2
    m_bits = m_words * BITS_PER_WORD
    words = bloom_words(_keys(spark, ks), F.col("hk"), m_words, k)
    ref: dict[int, int] = {}
    for key in ks:
        for p in _py_positions(key, k, m_bits):
            ref[p // BITS_PER_WORD] = ref.get(p // BITS_PER_WORD, 0) | (
                1 << (p % BITS_PER_WORD)
            )
    assert words == ref


def test_deterministic_false_positive_at_tiny_m(spark):
    # one word = 32 bits; enough members saturate it so SOME non-member
    # collides. Find one with the python reference, then assert Spark
    # reports exactly that FP.
    ks = [f"member {i}" for i in range(20)]
    m_words, k = 1, 2
    m_bits = m_words * BITS_PER_WORD
    words = bloom_words(_keys(spark, ks), F.col("hk"), m_words, k)
    fp = None
    for j in range(200):
        cand = f"outsider {j}"
        if all(
            (words.get(p // BITS_PER_WORD, 0) >> (p % BITS_PER_WORD)) & 1
            for p in _py_positions(cand, k, m_bits)
        ):
            fp = cand
            break
    assert fp is not None, "tiny filter failed to produce any collision"
    got = (
        _keys(spark, [fp, "outsider zzz-no-collision-hopefully"])
        .withColumn("hit", bloom_probe_col(F.col("hk"), words, m_words, k))
        .collect()
    )
    assert {r["hk"]: r["hit"] for r in got}[fp] is True


def test_empty_filter_rejects_everything(spark):
    df = _keys(spark, ["anything"]).withColumn(
        "hit", bloom_probe_col(F.col("hk"), {}, 32, 2)
    )
    assert [r["hit"] for r in df.collect()] == [False]


def test_decontaminate_superset_invariant(spark):
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": list(range(300)),
                "text": [f"text body {i}" for i in range(300)],
            }
        ),
        "doc_id long, text string",
    )
    out = decontaminate(docs, holdout_mod=29, m_words=2, k=2).collect()
    for r in out:
        if r["exact_member"]:
            assert r["bloom_hit"]  # bloom_hit ⊇ exact_member
    assert sum(1 for r in out if r["exact_member"]) == len(
        [i for i in range(300) if i % 29 == 0]
    )


def test_ngram_contamination_scores_partial_overlap(spark):
    """Holdout docs anchor at 1.0; a doc copying a passage from the
    holdout scores in between; an unrelated doc scores 0 (filter sized
    so FPs vanish at this key count)."""
    from search_engine_spark.operators.bloom import ngram_contamination

    holdout_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, holdout_text),                                  # 0 % 3 == 0 -> holdout
        (1, "alpha beta gamma delta nu xi omicron pi rho"), # copied prefix
        (2, "one two three four five six seven eight"),     # unrelated
    ]
    docs = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"]),
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in ngram_contamination(
            docs, holdout_mod=3, m_words=256
        ).collect()
    }
    assert got[0]["overlap_ratio"] == 1.0
    assert got[2]["overlap_ratio"] == 0.0
    r1 = got[1]
    # doc 1 has 7 shingles (9 tokens, k=3); the first two ('alpha beta
    # gamma', 'beta gamma delta') are holdout shingles
    assert r1["n_shingles"] == 7 and r1["n_flagged"] == 2
    assert r1["overlap_ratio"] == round(2 / 7, 4)
