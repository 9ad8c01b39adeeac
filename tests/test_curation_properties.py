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
