"""Persistent store: checkpoint-resume (I9) + incremental reindex (I5-I8).

The north_rule requires the build to be resumable from checkpoint with
per-partition lineage, and the incremental path to converge to a
from-scratch rebuild (FIXTURES.md §6).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark import catalog
from search_engine_spark.engine import SearchEngine
from search_engine_spark.operators.blocks import decode_blocks
from search_engine_spark.operators.incremental import reindex_docs
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST

N_BUCKETS = 8


def _store(spark, tmp_path, name):
    return catalog.IndexStore(spark, str(tmp_path / name), n_buckets=N_BUCKETS)


def _logical_postings(store):
    return {
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_blocks(store.read_blocks()).collect()
    }


def _term_dict(store):
    return {
        (r["term"], r["df"], r["cf"]) for r in store.read_term_dict().collect()
    }


@pytest.fixture(scope="module")
def docs(spark):
    return load_documents(spark, SF_TEST)


def test_build_open_roundtrip(spark, docs, tmp_path):
    store = _store(spark, tmp_path, "idx")
    report = catalog.build_persistent(docs, store)
    assert sorted(report["built_buckets"]) == list(range(N_BUCKETS))
    eng = SearchEngine.open(spark, store.dir, docs=docs)
    mem = SearchEngine(spark, docs=docs, n_buckets=N_BUCKETS).build()
    got = [(r["doc_id"], r["score"]) for r in eng.search("data fast join").collect()]
    want = [(r["doc_id"], r["score"]) for r in mem.search("data fast join").collect()]
    assert got == want and len(got) > 0


def test_rebuild_same_input_skips_everything(spark, docs, tmp_path):
    store = _store(spark, tmp_path, "idx2")
    r1 = catalog.build_persistent(docs, store)
    r2 = catalog.build_persistent(docs, store)
    assert r2["built_buckets"] == []
    assert sorted(r2["skipped"]) == list(range(N_BUCKETS))
    # lineage: every bucket's blocks row still carries the FIRST build_id
    rows = store.manifest().filter(F.col("phase") == "blocks").collect()
    assert {r["build_id"] for r in rows} == {r1["build_id"]}


def test_resume_after_simulated_kill(spark, docs, tmp_path):
    ref_store = _store(spark, tmp_path, "ref")
    catalog.build_persistent(docs, ref_store)

    store = _store(spark, tmp_path, "killed")
    with pytest.raises(RuntimeError, match="simulated failure"):
        catalog.build_persistent(docs, store, groups=4, fail_after_groups=2)
    committed_before = store.committed_buckets(catalog.fingerprint_docs(docs))
    assert 0 < len(committed_before) < N_BUCKETS  # partial progress persisted

    report = catalog.build_persistent(docs, store, groups=4)
    assert set(report["skipped"]) == committed_before
    assert set(report["built_buckets"]) == set(range(N_BUCKETS)) - committed_before
    # resumed index is identical to a clean one
    assert _logical_postings(store) == _logical_postings(ref_store)
    assert _term_dict(store) == _term_dict(ref_store)
    # lineage: committed buckets keep their original build_id
    rows = store.manifest().filter(F.col("phase") == "blocks").collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["doc_bucket"], set()).add(r["build_id"])
    assert all(len(v) == 1 for v in by_bucket.values())
    assert len({next(iter(v)) for v in by_bucket.values()}) == 2  # two builds


def test_manifest_counters(spark, docs, tmp_path):
    store = _store(spark, tmp_path, "counted")
    catalog.build_persistent(docs, store)
    rows = store.manifest().filter(F.col("phase") == "blocks").collect()
    post = decode_blocks(store.read_blocks())
    truth = {
        r["doc_bucket"]: (r["nd"], r["np"])
        for r in post.groupBy("doc_bucket")
        .agg(F.count_distinct("doc_id").alias("nd"), F.count("*").alias("np"))
        .collect()
    }
    for r in rows:
        nd, np_ = truth.get(r["doc_bucket"], (0, 0))
        assert (r["n_docs"], r["n_postings"]) == (nd, np_)


# ----------------------------------------------------------- incremental

CHANGED_ID = 7
NEW_TEXT = "fresh merge merge testing tables dup"


def _modified_docs(docs):
    return docs.withColumn(
        "text",
        F.when(F.col("doc_id") == CHANGED_ID, F.lit(NEW_TEXT)).otherwise(
            F.col("text")
        ),
    )


def test_incremental_reindex_converges_to_rebuild(spark, docs, tmp_path):
    # index v1, then incrementally apply the v2 change of one document
    inc_store = _store(spark, tmp_path, "inc")
    catalog.build_persistent(docs, inc_store)
    changed = _modified_docs(docs).filter(F.col("doc_id") == CHANGED_ID)
    result = reindex_docs(inc_store, changed)
    assert result["touched_buckets"] == [CHANGED_ID % N_BUCKETS]

    # from-scratch rebuild of v2 = the golden
    ref_store = _store(spark, tmp_path, "inc_ref")
    catalog.build_persistent(_modified_docs(docs), ref_store)

    assert _logical_postings(inc_store) == _logical_postings(ref_store)
    assert _term_dict(inc_store) == _term_dict(ref_store)
    ds_inc = {
        (r["doc_id"], r["dl"]) for r in inc_store.read_doc_stats().collect()
    }
    ds_ref = {
        (r["doc_id"], r["dl"]) for r in ref_store.read_doc_stats().collect()
    }
    assert ds_inc == ds_ref


def test_incremental_delete(spark, docs, tmp_path):
    inc_store = _store(spark, tmp_path, "del")
    catalog.build_persistent(docs, inc_store)
    empty = docs.filter(F.lit(False))
    reindex_docs(inc_store, empty, delete_ids=[CHANGED_ID])

    ref_store = _store(spark, tmp_path, "del_ref")
    catalog.build_persistent(
        docs.filter(F.col("doc_id") != CHANGED_ID), ref_store
    )
    assert _logical_postings(inc_store) == _logical_postings(ref_store)
    assert _term_dict(inc_store) == _term_dict(ref_store)


def test_df_decrement_and_delete_at_zero(spark, docs, tmp_path):
    """I6 semantics: removing the only page containing a term deletes the
    dictionary row; removing one of many decrements df."""
    store = _store(spark, tmp_path, "df")
    catalog.build_persistent(docs, store)
    td_before = {r["term"]: r["df"] for r in store.read_term_dict().collect()}

    # give doc CHANGED_ID a unique term, then take it away again
    unique = "zzuniqueterm"
    with_unique = docs.filter(F.col("doc_id") == CHANGED_ID).withColumn(
        "text", F.concat(F.col("text"), F.lit(f" {unique}"))
    )
    reindex_docs(store, with_unique)
    td_mid = {r["term"]: r["df"] for r in store.read_term_dict().collect()}
    assert td_mid[unique] == 1

    reindex_docs(store, docs.filter(F.col("doc_id") == CHANGED_ID))
    td_after = {r["term"]: r["df"] for r in store.read_term_dict().collect()}
    assert unique not in td_after  # deleted at df == 0
    assert td_after == td_before


def test_cancel_mid_build_then_resume(spark, tmp_path):
    """I9 cancel (reference stopIndexing): a cancel requested after the
    first committed group stops the build at the next group boundary with
    phase='cancelled' recorded; committed buckets stay readable; a fresh
    build resumes from them and completes to the exact full-build state."""
    docs = load_documents(spark, SF_TEST)
    store = _store(spark, tmp_path, "cancelled")

    def cancel_after_first(done_groups):
        if done_groups == 1:
            catalog.request_cancel(store)

    with pytest.raises(catalog.BuildCancelled):
        catalog.build_persistent(
            docs, store, groups=4, on_group_commit=cancel_after_first
        )
    m = store.manifest()
    phases = {r["phase"] for r in m.select("phase").distinct().collect()}
    assert "cancelled" in phases
    committed = {
        r["doc_bucket"]
        for r in m.filter(F.col("phase") == "blocks").collect()
    }
    assert 0 < len(committed) < N_BUCKETS  # partial progress survived
    # committed partitions are readable mid-cancel
    assert store.read_blocks().count() > 0

    # resume: marker was consumed by... a NEW build clears it and skips
    # the committed buckets
    out = catalog.build_persistent(docs, store, groups=2)
    assert set(out["skipped"]) == committed
    full = _store(spark, tmp_path, "full")
    catalog.build_persistent(docs, full)
    assert _logical_postings(store) == _logical_postings(full)
    assert _term_dict(store) == _term_dict(full)


def test_reindex_supersedes_blocks_lineage(spark, tmp_path):
    """ADVICE r01: after reindex_docs rewrites a bucket, a build_persistent
    over the ORIGINAL corpus must rebuild that bucket (its latest lineage
    row no longer matches the original fingerprint), restoring the exact
    original state instead of silently keeping reindexed data under the
    original corpus_stats stamp."""
    docs = load_documents(spark, SF_TEST)
    store = _store(spark, tmp_path, "superseded")
    catalog.build_persistent(docs, store)
    before = _logical_postings(store)

    changed = docs.filter(F.col("doc_id") == 3).withColumn(
        "text", F.lit("totally different replacement text")
    )
    touched = reindex_docs(store, changed)["touched_buckets"]
    assert touched == [3 % N_BUCKETS]
    assert _logical_postings(store) != before  # reindex actually landed

    out = catalog.build_persistent(docs, store)
    assert set(out["built_buckets"]) == set(touched)  # only those rebuild
    assert set(out["skipped"]) == set(range(N_BUCKETS)) - set(touched)
    assert _logical_postings(store) == before
    assert store.read_corpus_stats()["fingerprint"] == catalog.fingerprint_docs(docs)


def test_writer_seam_routes_all_physical_writes(spark, tmp_path, monkeypatch):
    """Iceberg adapter seam (VERDICT r01 missing #5): every physical write
    of the persistent store — partition overwrites, partition drops,
    manifest appends, dictionary replacement — must pass through the four
    IndexStore seam methods, and NOTHING may write parquet behind them.
    Swapping the parquet bodies for Iceberg writeTo() calls is then the
    whole migration."""
    docs = load_documents(spark, SF_TEST)
    store = _store(spark, tmp_path, "seam")
    calls = {"overwrite_partitions": 0, "drop_partitions": 0,
             "append_rows": 0, "replace_table": 0}

    for name in calls:
        orig = getattr(catalog.IndexStore, name)

        def wrapper(self, *a, _name=name, _orig=orig, **kw):
            calls[_name] += 1
            return _orig(self, *a, **kw)

        monkeypatch.setattr(catalog.IndexStore, name, wrapper)

    # any DataFrameWriter.parquet call NOT inside a seam method is a bypass
    from pyspark.sql.readwriter import DataFrameWriter

    orig_parquet = DataFrameWriter.parquet
    in_seam = {"flag": 0}

    for name in ("overwrite_partitions", "append_rows", "replace_table"):
        orig = getattr(catalog.IndexStore, name)

        def guarded(self, *a, _orig=orig, **kw):
            in_seam["flag"] += 1
            try:
                return _orig(self, *a, **kw)
            finally:
                in_seam["flag"] -= 1

        monkeypatch.setattr(catalog.IndexStore, name, guarded)

    def checked_parquet(self, *a, **kw):
        assert in_seam["flag"] > 0, "parquet write bypassed the writer seam"
        return orig_parquet(self, *a, **kw)

    monkeypatch.setattr(DataFrameWriter, "parquet", checked_parquet)

    catalog.build_persistent(docs, store, groups=2)
    changed = docs.filter(F.col("doc_id") == 7).withColumn(
        "text", F.lit("replacement text for seam test")
    )
    reindex_docs(store, changed)

    assert calls["overwrite_partitions"] >= 4  # blocks+norms × build/reindex
    assert calls["append_rows"] >= 3  # group commits + dict + reindex rows
    assert calls["replace_table"] >= 2  # term_dict after build and reindex
    assert calls["drop_partitions"] >= 2  # reindex empty-bucket cleanup


def test_snapshot_delta_drives_incremental_to_scratch_state(
    spark, docs, tmp_path
):
    """Close the incremental loop end-to-end: snapshot_delta says WHAT
    changed between two crawl cuts; ONE reindex_docs call applying
    exactly that delta (insert new revisions of added+changed pages,
    delete superseded/removed old revisions) must leave the store
    bit-identical (postings + term_dict) to a scratch build over the new
    snapshot's live corpus."""
    from search_engine_spark.operators.curation import snapshot_delta

    delta = snapshot_delta(docs).collect()
    old_ids = sorted(r["old_doc"] for r in delta if r["old_doc"] is not None)
    new_ids = sorted(r["new_doc"] for r in delta if r["new_doc"] is not None)
    assert old_ids and new_ids and set(old_ids) != set(new_ids)

    store = _store(spark, tmp_path, "inc")
    catalog.build_persistent(docs.filter(F.col("doc_id").isin(old_ids)), store)

    insert_ids = [
        r["new_doc"] for r in delta
        if r["status"] in ("added", "changed") and r["new_doc"] is not None
    ]
    delete_ids = [
        r["old_doc"] for r in delta
        if r["status"] in ("changed", "removed") and r["old_doc"] is not None
    ]
    reindex_docs(
        store,
        docs.filter(F.col("doc_id").isin(insert_ids)),
        delete_ids=delete_ids,
    )

    ref = _store(spark, tmp_path, "scratch")
    catalog.build_persistent(docs.filter(F.col("doc_id").isin(new_ids)), ref)

    assert _logical_postings(store) == _logical_postings(ref)
    assert _term_dict(store) == _term_dict(ref)


def test_reindex_dedups_same_doc_revisions_in_batch(spark, docs, tmp_path):
    """A micro-batch can carry several revisions of one doc_id (the
    streaming source reads multiple files per trigger). Only the newest
    (max warc_ts) revision may be indexed — duplicate doc_ids in a term's
    posting run would break the codec's strictly-increasing invariant and
    double-count dl."""
    store = _store(spark, tmp_path, "dupbatch")
    catalog.build_persistent(docs, store)
    older = docs.filter(F.col("doc_id") == CHANGED_ID).withColumn(
        "text", F.lit("stale stale stale")
    )
    newer = (
        docs.filter(F.col("doc_id") == CHANGED_ID)
        .withColumn("text", F.lit(NEW_TEXT))
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    reindex_docs(store, older.unionByName(newer))

    ref = _store(spark, tmp_path, "dupbatch_ref")
    catalog.build_persistent(_modified_docs(docs), ref)
    assert _logical_postings(store) == _logical_postings(ref)
    # no duplicate (term, doc) postings survived
    decoded = decode_blocks(store.read_blocks()).groupBy(
        "term", "doc_id"
    ).count().filter(F.col("count") > 1).count()
    assert decoded == 0


def test_negative_doc_ids_bucket_and_reindex(spark, tmp_path):
    """Upstream doc_ids may be signed hashes: bucketing must agree between
    the Spark plans (pmod) and the driver-side Python % (floor-mod), or a
    reindex retraction targets the wrong bucket and the doc duplicates."""
    from search_engine_spark.operators.blocks import build_posting_blocks

    rows = [(-7, "alpha", 2), (-23, "alpha", 1), (9, "alpha", 3), (-7, "beta", 1)]
    postings = spark.createDataFrame(rows, "doc_id long, term string, tf long")
    blocks = build_posting_blocks(postings, 8)
    got = {
        (r["doc_bucket"], r["doc_id"])
        for r in decode_blocks(blocks).collect()
    }
    for bucket, doc in got:
        assert bucket == doc % 8, (bucket, doc)  # Python floor-mod
        assert 0 <= bucket < 8


def test_job_group_cleared_after_build(spark, docs, tmp_path):
    """build_persistent must not leave its cancellable job group stuck on
    the calling thread — a later request_cancel would kill unrelated jobs
    (streaming micro-batches share the foreachBatch thread)."""
    store = _store(spark, tmp_path, "jobgroup")
    catalog.build_persistent(docs, store)
    jsc = spark.sparkContext._jsc
    gid = jsc.getLocalProperty("spark.jobGroup.id")
    assert gid is None or gid != catalog.BUILD_JOB_GROUP


def test_open_legacy_stats_recomputes_exact_sum_dl(spark, docs, tmp_path):
    """A pre-sum_dl corpus_stats.json must NOT reconstruct Σdl as the
    float product n_docs·avgdl (which can flip 4-dp-rounded LM scores);
    open() recomputes it exactly from the persisted doc_stats (r03
    ADVICE)."""
    import json

    store = _store(spark, tmp_path, "idx_legacy")
    catalog.build_persistent(docs, store)
    stats = store.read_corpus_stats()
    exact = stats.pop("sum_dl")
    with open(store.stats_path, "w") as fh:
        json.dump(stats, fh)
    eng = SearchEngine.open(spark, store.dir, docs=docs)
    assert eng.sum_dl == float(exact)
    assert float(eng.sum_dl).is_integer()
