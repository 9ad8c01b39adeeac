"""Unit tests for operators/spans.py — ExactSubstr span dedup.

Oracle parity at fixture scale is covered by test_oracle_parity.py
(dup_spans); these pin the semantics on crafted corpora where the
duplicated spans are known by construction.
"""

from search_engine_spark.operators.spans import (
    dup_spans,
    remove_dup_spans,
    window_hashes,
)

# 16 distinct filler words so crafted docs produce no accidental windows
_FILL = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa",
]
# 15-token common run (letter-only: digit-bearing tokens are rejected by T3)
_SHARED = " ".join(f"shared{chr(97 + i)}" for i in range(15))


def _corpus(spark):
    """doc 1: unique prefix + shared run; doc 2: other prefix + SAME run;
    doc 3: fully unique."""
    rows = [
        (1, " ".join(_FILL[:6]) + " " + _SHARED),
        (2, " ".join(_FILL[6:12]) + " " + _SHARED),
        (3, " ".join(_FILL) + " " + " ".join(f"uniq{chr(97 + i)}" for i in range(8))),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_window_hashes_shape(spark):
    rows = window_hashes(_corpus(spark), window=4).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["start"])
    # doc 1: 6 + 15 = 21 tokens → 18 windows of 4, starts 0..17
    assert sorted(per_doc[1]) == list(range(18))
    assert len(set(r["whash"] for r in rows if r["doc_id"] == 3)) == len(
        per_doc[3]
    )


def test_dup_spans_finds_shared_run(spark):
    spans = dup_spans(_corpus(spark), window=12).collect()
    got = {(r["doc_id"], r["span_start"], r["span_end"]) for r in spans}
    # doc 1 < doc 2 so doc 1's copy is canonical; doc 2 loses the full
    # 15-token run at positions 6..20 (windows 6..9 merge into one island)
    assert got == {(2, 6, 20)}
    (r,) = spans
    assert r["n_windows"] == 4


def test_dup_spans_empty_when_no_duplicates(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(_FILL)), (2, " ".join(f"xx{chr(97 + i)}" for i in range(16)))],
        "doc_id long, text string",
    )
    assert dup_spans(docs, window=12).count() == 0


def test_dup_spans_window_threshold(spark):
    """A duplicated run SHORTER than the window is below the noise floor."""
    short = " ".join(f"short{chr(97 + i)}" for i in range(8))
    docs = spark.createDataFrame(
        [
            (1, " ".join(_FILL[:8]) + " " + short),
            (2, " ".join(_FILL[8:16]) + " " + short),
        ],
        "doc_id long, text string",
    )
    assert dup_spans(docs, window=12).count() == 0


def test_remove_dup_spans_deletes_only_the_span(spark):
    cleaned = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_dup_spans(_corpus(spark), window=12).collect()
    }
    # doc 2's shared run removed (15 tokens), its unique prefix kept
    text2, n2 = cleaned[2]
    assert n2 == 15
    assert text2 == " ".join(_FILL[6:12])
    # canonical copy (doc 1) and unique doc 3 untouched
    assert cleaned[1][1] == 0
    assert "shareda" in cleaned[1][0]
    assert cleaned[3][1] == 0


def test_remove_dup_spans_keeps_fully_duplicated_doc(spark):
    """A verbatim copy whose ENTIRE token stream is one duplicated span
    must surface as clean_text='' with the full removal count — not
    silently vanish from the output (regression: the final join used to
    anchor on the rebuilt frame, which has no row for such a doc)."""
    full = " ".join(f"copy{chr(97 + i)}" for i in range(16))
    docs = spark.createDataFrame(
        [(1, full), (2, full)], "doc_id long, text string"
    )
    cleaned = {
        r["doc_id"]: (r["clean_text"], r["n_removed"])
        for r in remove_dup_spans(docs, window=12).collect()
    }
    assert set(cleaned) == {1, 2}
    assert cleaned[1] == (full, 0)  # canonical copy untouched
    assert cleaned[2] == ("", 16)  # duplicate fully removed, still present
