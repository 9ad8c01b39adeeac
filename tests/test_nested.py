"""ES nested-documents semantics pins — the cross-object false positive
the nested type exists to kill, and score_mode arithmetic."""

import pytest

from search_engine_spark.operators.nested import flat_vs_nested, nested_match


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_cross_chunk_terms_match_flat_but_not_nested(spark):
    """doc 0: 'fast' in chunk 0, 'data' in chunk 1 (chunk_size=4 splits
    them) → flat matches, nested does not. doc 1: both words in one
    chunk → both match."""
    rows = [
        (0, "u0", "fast car goes zoom data table rows here"),
        (1, "u1", "fast data in one place"),
        (2, "u2", "nothing relevant at all"),
    ]
    docs = _docs(spark, rows)
    fv = {r["doc_id"]: (r["flat_match"], r["nested_match"])
          for r in flat_vs_nested(docs, ["fast", "data"], chunk_size=4).collect()}
    assert fv == {0: (True, False), 1: (True, True)}
    hits = {r["doc_id"] for r in
            nested_match(docs, ["fast", "data"], chunk_size=4).collect()}
    assert hits == {1}


def test_score_modes_avg_max_sum(spark):
    """Two matching chunks with Σtf 3 and 1 → avg 2.0, max 3.0, sum 4.0
    (chunk 0: fast fast data → 3; chunk 2: fast data → 2? craft exact)."""
    # chunk_size=4, overlap=0: chunks = tokens [0:4), [4:8), [8:12)
    text = "fast fast data pad " + "pad pad pad pad " + "fast data pad pad"
    docs = _docs(spark, [(0, "u0", text)])
    got = {m: nested_match(docs, ["fast", "data"], chunk_size=4,
                           score_mode=m).collect()[0]
           for m in ("avg", "max", "sum")}
    assert got["avg"]["n_chunks"] == 2
    assert got["avg"]["score"] == pytest.approx(2.5)  # (3 + 2) / 2
    assert got["max"]["score"] == pytest.approx(3.0)
    assert got["sum"]["score"] == pytest.approx(5.0)


def test_nested_empty_query_and_no_match(spark):
    docs = _docs(spark, [(0, "u0", "plain words only")])
    assert nested_match(docs, [], chunk_size=4).collect() == []
    assert nested_match(docs, ["absent"], chunk_size=4).collect() == []
