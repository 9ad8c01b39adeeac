"""Unit tests for operators/dedup.py::containment_pairs and
operators/similarity.py::ann_filtered (oracle parity at fixture scale:
containment / ann_filtered)."""

from search_engine_spark.operators.dedup import (
    containment_pairs,
    jaccard_pairs,
)
from search_engine_spark.operators.similarity import ann_filtered


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_containment_catches_what_jaccard_misses(spark):
    """A short doc quoted wholesale inside a 3x-longer doc: containment
    (short in long) = 1.0 while Jaccard stays below 0.5."""
    quote = " ".join(f"w{i}" for i in range(30))
    filler = " ".join(f"f{i}" for i in range(70))
    docs = _docs(spark, [(1, quote), (2, quote + " " + filler)])
    got = {
        (r["contained"], r["container"]): r["containment"]
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert got == {(1, 2): 1.0}  # reverse orientation below threshold
    assert jaccard_pairs(docs, threshold=0.5).count() == 0


def test_containment_both_orientations_for_near_equal_docs(spark):
    a = " ".join(f"w{i}" for i in range(20))
    docs = _docs(spark, [(1, a), (2, a + " extraword")])
    got = {
        (r["contained"], r["container"])
        for r in containment_pairs(docs, threshold=0.8).collect()
    }
    assert (1, 2) in got and (2, 1) in got


def test_containment_candidate_driven_subset(spark):
    """With a candidate relation, only candidate pairs are scored."""
    quote = " ".join(f"w{i}" for i in range(30))
    docs = _docs(
        spark, [(1, quote), (2, quote + " tail"), (3, quote + " cauda")]
    )
    cand = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    got = {
        (r["contained"], r["container"])
        for r in containment_pairs(docs, 0.8, candidates=cand).collect()
    }
    assert got == {(1, 2), (2, 1)}  # pair (1,3)/(2,3) never scored


# ------------------------------------------------------------- filtered ANN

def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_ann_filtered_prefilter_returns_k_passing(spark):
    """Pre-filter semantics: the globally-best neighbor is label-excluded,
    yet the query still gets k PASSING hits (post-filter would return the
    survivors of an unfiltered top-k instead)."""
    rows = [(0, [1.0, 0.0], 9)]  # the query itself
    rows.append((1, [1.0, 0.01], 9))  # best neighbor, excluded label
    for i in range(2, 8):
        rows.append((i, [1.0, float(i)], 0))  # passing, increasingly far
    emb = _emb(spark, rows)
    got = ann_filtered(emb, [0], labels=[0], k=3).collect()
    assert [r["vec_id"] for r in got] == [2, 3, 4]
    assert all(r["label"] == 0 for r in got)
    assert [r["rank"] for r in got] == [1, 2, 3]


def test_ann_filtered_query_may_carry_excluded_label(spark):
    """The query vector is looked up in the FULL table even when its own
    label is filtered out of the candidate set."""
    rows = [(0, [0.0, 1.0], 5), (1, [0.0, 0.9], 0), (2, [1.0, 0.0], 0)]
    emb = _emb(spark, rows)
    got = ann_filtered(emb, [0], labels=[0], k=2).collect()
    assert [r["vec_id"] for r in got] == [1, 2]
