"""Property-based invariants for the line-dedup operator (hypothesis).

Run on a single shared SparkSession; text is drawn from a small token
alphabet so duplicate lines actually occur.
"""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.curation import (
    doc_lines,
    remove_duplicated_lines,
)

TOKENS = st.sampled_from(["aa", "bb", "cc", "dd"])
TEXT = st.lists(TOKENS, min_size=0, max_size=12).map(" ".join)
CORPUS = st.lists(TEXT, min_size=1, max_size=6)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
def test_line_dedup_invariants(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    lines = doc_lines(docs, width=2)
    line_rows = lines.collect()
    out = remove_duplicated_lines(lines).collect()

    # reference computation in plain Python: first (doc_id, line_no) wins
    first_seen = {}
    for r in sorted(line_rows, key=lambda r: (r["doc_id"], r["line_no"])):
        first_seen.setdefault(r["line"], (r["doc_id"], r["line_no"]))
    expect_kept = {}
    for r in sorted(line_rows, key=lambda r: (r["doc_id"], r["line_no"])):
        if first_seen[r["line"]] == (r["doc_id"], r["line_no"]):
            expect_kept.setdefault(r["doc_id"], []).append(r["line"])

    by_doc = {r["doc_id"]: r for r in out}
    # every doc with at least one line appears exactly once
    assert set(by_doc) == {r["doc_id"] for r in line_rows}
    total_kept = 0
    for doc_id, r in by_doc.items():
        kept = r["clean_text"].split("\n") if r["clean_text"] else []
        assert kept == expect_kept.get(doc_id, [])
        assert r["n_kept"] == len(kept)
        total_kept += r["n_kept"]
        # kept + dropped = doc's line count
        doc_lines_n = sum(1 for x in line_rows if x["doc_id"] == doc_id)
        assert r["n_kept"] + r["n_dropped"] == doc_lines_n
    # exactly one survivor per distinct line corpus-wide
    assert total_kept == len({r["line"] for r in line_rows})


# ---------------------------------------------------------------- PII scrub

PII_BITS = st.sampled_from(
    [
        "hello",
        "world",
        "a@b.co",
        "x.y+z@mail.example.org",
        "10.0.0.1",
        "256.1.2.3",          # still 4 dotted octet groups → matches \d{1,3}
        "+12345678",
        "+123",               # too short → not a phone
        "v1.2",
        "admin@10.0.0.1.example.com",
    ]
)
PII_TEXT = st.lists(PII_BITS, min_size=0, max_size=8).map(" ".join)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(text=PII_TEXT)
def test_redact_counts_equal_emitted_placeholders(spark, text):
    """Post-fix invariant: n_<class> equals the number of <CLASS>
    placeholders actually present in the redacted output, for any
    composition of overlapping PII-like fragments."""
    from search_engine_spark.operators.curation import redact_pii

    row = redact_pii(
        spark.createDataFrame([(1, text)], "doc_id long, text string")
    ).collect()[0]
    red = row["redacted"]
    assert row["n_email"] == red.count("<EMAIL>")
    assert row["n_ip"] == red.count("<IP>")
    assert row["n_phone"] == red.count("<PHONE>")
