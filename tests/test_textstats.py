

# ---------------------------------------------------------- query clarity


def test_clarity_zero_for_query_matching_whole_corpus(spark):
    """A term in EVERY doc induces a result set whose language model IS
    the collection model -> every KL contribution is exactly 0."""
    import pandas as pd

    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.textstats import clarity_score

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2],
                "text": ["data fast table", "data merge scan"],
            }
        ),
        "doc_id long, text string",
    )
    got = clarity_score(build_postings(docs), ["data"]).collect()
    assert got and all(r["contrib"] == 0.0 for r in got)


def test_clarity_concentrates_on_crisp_query_topic(spark):
    """A term exclusive to one topic makes that topic's vocabulary
    over-represented (positive contrib) and the query term itself the
    top contributor; off-topic terms never appear."""
    import pandas as pd

    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.textstats import clarity_score

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "vector vector index",
                    "vector index probe",
                    "table scan merge",
                    "table merge scan scan",
                ],
            }
        ),
        "doc_id long, text string",
    )
    rows = clarity_score(build_postings(docs), ["vector"]).collect()
    by_term = {r["term"]: r["contrib"] for r in rows}
    assert set(by_term) == {"vector", "index", "probe"}
    assert max(by_term, key=by_term.get) == "vector"
    assert all(c > 0 for c in by_term.values())
