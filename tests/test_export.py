"""Token-balanced export sharding — exact equality vs the pure-Python
mirror of the pinned spec, the balance bound, contiguity/monotonicity,
and the no-global-window plan shape."""

import pytest

from pyspark.sql import functions as F

from search_engine_spark.operators.export import (
    shard_manifest,
    shards_py,
    token_balanced_shards,
)
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST

N_SHARDS = 8


@pytest.fixture(scope="module")
def assigned(spark):
    docs = load_documents(spark, SF_TEST)
    return token_balanced_shards(docs, n_shards=N_SHARDS).cache()


def test_matches_python_mirror_exactly(spark, assigned):
    rows = assigned.collect()
    mirror = shards_py([(r["doc_id"], r["n_tokens"]) for r in rows],
                       N_SHARDS)
    assert {r["doc_id"]: r["shard"] for r in rows} == mirror


def test_every_shard_within_one_doc_of_budget(spark, assigned):
    """A doc is assigned by where its token run STARTS, so each shard's
    token mass differs from the budget by less than one document weight
    (the last shard absorbs the remainder and can only be lighter)."""
    rows = assigned.collect()
    total = sum(r["n_tokens"] for r in rows)
    budget = max(-(-total // N_SHARDS), 1)
    w_max = max(r["n_tokens"] for r in rows)
    per_shard = {}
    for r in rows:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + r["n_tokens"]
    assert set(per_shard) == set(range(N_SHARDS))
    for s, tok in per_shard.items():
        if s < N_SHARDS - 1:
            assert abs(tok - budget) < w_max, (s, tok, budget, w_max)
        else:
            assert tok < budget + w_max


def test_shards_are_contiguous_doc_id_ranges(spark, assigned):
    man = shard_manifest(assigned).orderBy("shard").collect()
    for prev, cur in zip(man, man[1:]):
        assert cur["shard"] == prev["shard"] + 1
        assert cur["min_doc_id"] > prev["max_doc_id"]
    n_docs = assigned.count()
    assert sum(r["n_docs"] for r in man) == n_docs


def test_bucket_fanin_does_not_change_assignment(spark):
    """The bucket count is an EXECUTION parameter of the hierarchical
    scan, not part of the spec — any fan-in yields identical shards."""
    docs = load_documents(spark, SF_TEST)
    base = {
        r["doc_id"]: r["shard"]
        for r in token_balanced_shards(docs, n_shards=N_SHARDS,
                                       buckets=1024).collect()
    }
    for b in (1, 7, 64):
        got = {
            r["doc_id"]: r["shard"]
            for r in token_balanced_shards(docs, n_shards=N_SHARDS,
                                           buckets=b).collect()
        }
        assert got == base, b


def test_no_global_window_in_plan(spark, assigned):
    """The scale claim: the only Window is partitioned by bucket — no
    empty partition spec (single-partition funnel) anywhere."""
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Window" in line and "partitionBy" not in line:
            # executedPlan prints windows as Window [..], [bucket#..], ...
            assert "bucket#" in line, line


def test_pack_sequences_invariants(spark):
    """Greedy-fill invariants: example ids are contiguous per bucket,
    every example's fill ≤ cap unless it is a single over-cap doc, and
    no example could absorb its successor's first doc (greedy tightness:
    the packing is maximal, not just feasible)."""
    from search_engine_spark.operators.export import pack_py, pack_sequences

    cap = 256
    docs = load_documents(spark, SF_TEST)
    rows = pack_sequences(docs, cap=cap, buckets=16).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r)
    for bkt, rs in by_bucket.items():
        rs.sort(key=lambda r: r["doc_id"])
        mirror = pack_py([(r["doc_id"], r["n_tokens"]) for r in rs], cap)
        assert {r["doc_id"]: r["example_id"] for r in rs} == mirror
        fills = {}
        for r in rs:
            fills.setdefault(r["example_id"], []).append(r["n_tokens"])
        assert sorted(fills) == list(range(len(fills)))  # contiguous, 0-based
        for ex in sorted(fills)[:-1]:
            fill = sum(fills[ex])
            assert fill <= cap or len(fills[ex]) == 1, (bkt, ex)
            # maximal: the NEXT example's first doc would overflow this one
            assert fill + fills[ex + 1][0] > cap, (bkt, ex)
        last = sorted(fills)[-1]
        assert sum(fills[last]) <= cap or len(fills[last]) == 1


def test_pack_oversized_doc_gets_own_example(spark):
    from search_engine_spark.operators.export import pack_py

    packed = pack_py([(0, 10), (1, 999), (2, 10), (3, 10)], cap=100)
    assert packed == {0: 0, 1: 1, 2: 2, 3: 2}


def test_chunk_documents_pinned_spec(spark):
    """Boundary behavior of the sliding window: exact-fit docs produce one
    chunk, one extra token opens a second, pure-suffix runts are never
    emitted, and NULL/blank text yields zero chunks."""
    from search_engine_spark.operators.export import chunk_documents

    def doc(doc_id, n_tokens):
        return (doc_id, " ".join(f"t{i}" for i in range(n_tokens)))

    rows = [doc(0, 8), doc(1, 9), doc(2, 10), doc(3, 1), (4, ""), (5, None),
            doc(6, 20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(docs, chunk_size=8, overlap=2)  # stride 6
    got = {
        (r.doc_id, r.chunk_id): (r.start_tok, r.n_tokens, r.chunk_text)
        for r in out.collect()
    }
    by_doc = {}
    for (d, k) in got:
        by_doc.setdefault(d, []).append(k)
    # n=8 → exactly one chunk (chunk 1 at start 6 would add nothing new)
    assert by_doc[0] == [0] and got[(0, 0)][1] == 8
    # n=9 → second chunk holds tokens 6..8 (3 tokens, 1 new)
    assert sorted(by_doc[1]) == [0, 1]
    assert got[(1, 1)] == (6, 3, "t6 t7 t8")
    # n=10 → still two chunks; second covers 6..9
    assert got[(2, 1)] == (6, 4, "t6 t7 t8 t9")
    # single-token and empty docs
    assert got[(3, 0)] == (0, 1, "t0")
    assert 4 not in by_doc and 5 not in by_doc
    # n=20, stride 6 → chunks at 0, 6, 12; a fourth at 18 would cover
    # t18..t19 only — a pure suffix of chunk 2 (12..19) — so suppressed
    assert sorted(by_doc[6]) == [0, 1, 2]
    assert got[(6, 2)] == (12, 8, "t12 t13 t14 t15 t16 t17 t18 t19")
    # overlap invariant: consecutive chunks share exactly `overlap` tokens
    # when both are full
    assert got[(6, 0)][2].split()[6:] == got[(6, 1)][2].split()[:2]


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest
    from search_engine_spark.operators.export import chunk_documents

    docs = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(docs, chunk_size=8, overlap=8)
