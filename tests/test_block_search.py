"""Block-path equivalence: the compressed-block scorer must reproduce the
relational DataFrame scorer (which itself is oracle-verified) exactly."""

import pytest

from tests.conftest import SF_TEST

from search_engine_spark.engine import SearchEngine
from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators import search as se
from search_engine_spark.sources.documents import load_documents

TERM_SETS = [
    ["data", "fast"],
    ["dup", "scan", "merge"],
    ["dup"],
    ["data", "fast", "join", "batch"],
]


@pytest.fixture(scope="module")
def engine(spark):
    return SearchEngine(spark, SF_TEST, n_buckets=8).build()


@pytest.fixture(scope="module")
def ctx(spark):
    docs = load_documents(spark, SF_TEST)
    postings = ib.build_postings(docs).cache()
    term_dict = ib.build_term_dict(postings).cache()
    doc_stats = ib.build_doc_stats(docs, postings).cache()
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    return docs, postings, term_dict, doc_stats, n_docs, avgdl


@pytest.mark.parametrize("terms", TERM_SETS, ids=["-".join(t) for t in TERM_SETS])
def test_bm25_block_equals_dataframe(engine, ctx, terms):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    want = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, terms, limit=50
    ).collect()
    got = engine.search(" ".join(terms), mode="bm25", limit=50).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]


@pytest.mark.parametrize("terms", TERM_SETS[:2], ids=["-".join(t) for t in TERM_SETS[:2]])
def test_compat_block_equals_dataframe(engine, ctx, terms):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = ctx
    want = se.search_compat(docs, postings, terms, limit=50).collect()
    got = engine.search(" ".join(terms), mode="compat", limit=50).collect()
    assert [(r["doc_id"], r["score_abs"], r["rel"]) for r in got] == [
        (r["doc_id"], r["score_abs"], r["rel"]) for r in want
    ]


def test_compat_site_filter(engine, ctx):
    docs, postings, *_ = ctx
    want = se.search_compat(docs, postings, ["data", "fast"], site_key="site-b").collect()
    got = engine.search("data fast", mode="compat", site_key="site-b").collect()
    assert [(r["doc_id"], r["score_abs"], r["rel"]) for r in got] == [
        (r["doc_id"], r["score_abs"], r["rel"]) for r in want
    ]


def test_pagination_consistency(engine):
    full = engine.search("data fast", limit=30).collect()
    p1 = engine.search("data fast", limit=10).collect()
    p2 = engine.search("data fast", limit=10, offset=10).collect()
    p3 = engine.search("data fast", limit=10, offset=20).collect()
    assert [r["doc_id"] for r in p1 + p2 + p3] == [r["doc_id"] for r in full]


def test_absent_and_empty(engine):
    assert engine.search("zebra data").count() == 0
    assert engine.search("the of a").count() == 0
    assert engine.search("").count() == 0


def test_statistics(engine):
    s = engine.statistics()
    assert s["result"] is True
    assert s["statistics"]["total"]["sites"] == 3
    assert s["statistics"]["total"]["pages"] == 500


def test_disjunctive_or_mode_blocks_vs_relational(spark):
    """engine.search(op='or') over compressed blocks == the relational
    disjunctive BM25 plan, including an absent term dropping out."""
    from pyspark.sql import functions as F

    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators import search as se
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    eng = SearchEngine(spark, docs=docs, n_buckets=8).build()
    got = [
        (r["doc_id"], r["score"])
        for r in eng.search("dup merge zzabsent", op="or", limit=15).collect()
    ]
    postings = ib.build_postings(docs)
    td = ib.build_term_dict(postings)
    ds = ib.build_doc_stats(docs, postings)
    n_docs, avgdl = ib.corpus_stats(docs, ds)
    want = [
        (r["doc_id"], r["score"])
        for r in se.search_bm25(
            postings, td, ds, n_docs, avgdl,
            ["dup", "merge", "zzabsent"], conjunctive=False, limit=15,
        ).collect()
    ]
    assert got == want and len(got) == 15
    # OR hits ⊇ AND hits; absent term empties AND but not OR
    assert eng.search("dup merge zzabsent", limit=15).count() == 0


def test_fused_build_equals_rowwise_build(spark):
    """The fused pack/merge pipeline must produce bit-identical blocks and
    norms to the row-per-posting formulation."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators import fused_build as fb
    from search_engine_spark.operators import index_build as ib
    from search_engine_spark.operators.blocks import build_posting_blocks
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, SF_TEST)
    packed = fb.pack_documents(docs, 8)
    fused = {
        tuple(r) for r in fb.blocks_from_packed(packed).collect()
    }
    rowwise = {
        tuple(r)
        for r in build_posting_blocks(ib.build_postings(docs), 8).collect()
    }
    assert fused == rowwise

    ds_fused = {
        (r["doc_id"], r["dl"])
        for r in fb.doc_stats_from_packed(packed).collect()
    }
    ds_rel = {
        (r["doc_id"], r["dl"])
        for r in ib.build_doc_stats(docs).filter(F.col("dl") > 0).collect()
    }
    assert ds_fused == ds_rel


class TestMaxScorePruning:
    """The disjunctive MaxScore scorer must (a) return exactly the
    exhaustive result and (b) actually SKIP block decodes on a skewed
    fixture (VERDICT r01 #4: threshold prune, not just zone maps)."""

    @pytest.fixture(scope="class")
    def skewed_groups(self, spark):
        import pandas as pd

        from search_engine_spark.operators.blocks import build_posting_blocks

        # one common term everywhere (low idf), one rare high-tf term
        # clustered in low doc_ids → after the rare list seeds the top-k,
        # most of the common term's blocks hold no candidate
        rows = [(d, "common", 1 + d % 3) for d in range(2000)]
        rows += [(d, "rare", 50) for d in range(10)]
        postings = spark.createDataFrame(
            rows, "doc_id long, term string, tf long"
        )
        blocks = build_posting_blocks(postings, 1).toPandas()
        return {t: g for t, g in blocks.groupby("term")}

    @staticmethod
    def _exhaustive(groups, mode, idf, k1, b, avgdl):
        from search_engine_spark.operators.codec import decode_block, decode_payload

        scores: dict[int, float] = {}
        for t, g in groups.items():
            for row in g.itertuples(index=False):
                ids, tfs = decode_block(row.doc_bytes, row.tf_bytes, row.count)
                dls = decode_payload(row.dl_bytes, row.count)
                for d, tf, dl in zip(ids, tfs, dls):
                    if mode == "compat":
                        c = float(tf)
                    else:
                        c = (
                            idf[t] * tf * (k1 + 1.0)
                            / (tf + k1 * (1.0 - b + b * float(dl) / avgdl))
                        )
                    scores[d] = scores.get(d, 0.0) + c
        return scores

    def test_exact_and_blocks_skipped(self, skewed_groups):
        import math

        from search_engine_spark.operators import wand

        k1, b, n_docs, avgdl = 1.2, 0.75, 2000, 2.0
        idf = {
            "common": math.log(1 + (n_docs - 2000 + 0.5) / (2000 + 0.5)),
            "rare": math.log(1 + (n_docs - 10 + 0.5) / (10 + 0.5)),
        }
        stats = {"blocks_total": 0, "blocks_decoded": 0}
        ids, scores = wand._maxscore_or_bucket(
            skewed_groups, 5, "bm25", idf, k1, b, avgdl, stats=stats
        )
        truth = self._exhaustive(skewed_groups, "bm25", idf, k1, b, avgdl)
        want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
        got = sorted(zip(ids, scores), key=lambda kv: (-kv[1], kv[0]))[:5]
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, a), (_, e) in zip(got, want):
            assert a == pytest.approx(e, abs=1e-9)
        assert stats["blocks_decoded"] < stats["blocks_total"], stats

    def test_no_prune_when_k_none(self, skewed_groups):
        from search_engine_spark.operators import wand

        stats = {"blocks_total": 0, "blocks_decoded": 0}
        ids, scores = wand._maxscore_or_bucket(
            skewed_groups, None, "compat", None, 1.2, 0.75, 1.0,
            stats=stats,
        )
        assert ids.size == 2000  # every doc scored (count path)
        assert stats["blocks_decoded"] == stats["blocks_total"]

    def test_conjunctive_block_skip(self, skewed_groups):
        from search_engine_spark.operators import wand

        stats = {"blocks_total": 0, "blocks_decoded": 0}
        ids, aligned, _dls = wand._conjunctive_bucket(skewed_groups, stats=stats)
        assert list(ids) == list(range(10))  # AND = the rare docs
        # the rare list decodes whole; common decodes only the block(s)
        # spanning doc_ids 0-9
        assert stats["blocks_decoded"] < stats["blocks_total"], stats

    def test_block_row_order_does_not_matter(self, skewed_groups):
        """Regression: block rows arrive in shuffle/scan order, not block
        order (pandas groupby preserves arrival order). The scorers
        binary-search the decoded doc_ids, so _decode_term must sort —
        a shuffled-row group has to score identically to the built one."""
        import math

        from search_engine_spark.operators import wand

        shuffled = {
            t: g.sample(frac=1.0, random_state=7).reset_index(drop=True)
            for t, g in skewed_groups.items()
        }
        assert any(
            list(shuffled[t]["first_doc"]) != list(skewed_groups[t]["first_doc"])
            for t in shuffled
        ), "fixture must actually permute rows"

        ids_a, aligned_a, dls_a = wand._conjunctive_bucket(skewed_groups)
        ids_b, aligned_b, dls_b = wand._conjunctive_bucket(shuffled)
        assert list(ids_a) == list(ids_b)
        assert list(dls_a) == list(dls_b)
        for t in aligned_a:
            assert list(aligned_a[t]) == list(aligned_b[t])

        n_docs = 2000
        idf = {
            "common": math.log(1 + (n_docs - 2000 + 0.5) / (2000 + 0.5)),
            "rare": math.log(1 + (n_docs - 10 + 0.5) / (10 + 0.5)),
        }
        oa, sa = wand._maxscore_or_bucket(
            skewed_groups, 5, "bm25", idf, 1.2, 0.75, 2.0
        )
        ob, sb = wand._maxscore_or_bucket(
            shuffled, 5, "bm25", idf, 1.2, 0.75, 2.0
        )
        assert sorted(zip(oa, sa)) == sorted(zip(ob, sb))

    def test_multiblock_intersection_survives_row_shuffle(self, spark):
        """The bite case the skewed fixture misses: the RAREST term itself
        spans several blocks, so its shuffled rows seed the intersection
        with an unsorted candidate array unless _decode_term sorts."""
        import pandas as pd

        from search_engine_spark.operators import wand
        from search_engine_spark.operators.blocks import build_posting_blocks

        rows = [(d, "alla", 1 + d % 2) for d in range(2000)]
        rows += [(d, "quarter", 2) for d in range(0, 2000, 4)]  # 500 → 4 blocks
        postings = spark.createDataFrame(
            rows, "doc_id long, term string, tf long"
        )
        blocks = build_posting_blocks(postings, 1).toPandas()
        groups = {t: g for t, g in blocks.groupby("term")}
        assert len(groups["quarter"]) >= 4  # must be a multi-block list
        shuffled = {
            t: g.sample(frac=1.0, random_state=11).reset_index(drop=True)
            for t, g in groups.items()
        }
        assert list(shuffled["quarter"]["first_doc"]) != list(
            groups["quarter"]["first_doc"]
        )
        ids_a, aligned_a, dls_a = wand._conjunctive_bucket(groups)
        ids_b, aligned_b, dls_b = wand._conjunctive_bucket(shuffled)
        assert list(ids_a) == list(range(0, 2000, 4))
        assert list(ids_b) == list(ids_a)
        assert list(dls_b) == list(dls_a)
        for t in aligned_a:
            assert list(aligned_b[t]) == list(aligned_a[t])


class TestQueryPlanShape:
    """Pin the physical plan of the hot query path (PLANS.md §2): the
    unfiltered search must be a single grouped scorer over the blocks
    cache — no cogroup (norms live in the blocks) and no Exchange (the
    cache is already hash-partitioned on doc_bucket)."""

    @staticmethod
    def _query_plan(df) -> str:
        """Executed plan ABOVE the cache boundary: everything from the
        first InMemoryRelation down is the cached blocks' build plan
        (which legitimately shuffles once); the query path is what runs
        per search."""
        full = df._jdf.queryExecution().executedPlan().toString()
        return full.split("InMemoryRelation", 1)[0]

    def test_unfiltered_query_no_cogroup_no_exchange(self, engine):
        plan = self._query_plan(engine.search("data fast", mode="bm25", limit=10))
        assert "FlatMapGroupsInPandas" in plan
        assert "FlatMapCoGroupsInPandas" not in plan
        assert "Exchange" not in plan
        assert "InMemoryTableScan" in plan

    def test_site_filtered_query_cogroups_no_exchange(self, engine):
        plan = self._query_plan(
            engine.search("data fast", mode="bm25", site_key="site-b", limit=10)
        )
        # the one path that legitimately cogroups (site doc_id allowlist),
        # still shuffle-free against the co-partitioned caches
        assert "FlatMapCoGroupsInPandas" in plan
        assert "Exchange" not in plan
