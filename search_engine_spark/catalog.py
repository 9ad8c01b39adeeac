"""Persistent index store — checkpoint-resumable build with per-partition
lineage and counters (reference I9 lifecycle, SURVEY §2.C; north_rule:
"resumable from checkpoint with per-partition lineage + metrics").

Layout (plain parquet standing in for Iceberg — the sandbox ships no Iceberg
runtime jar; the table/partition/manifest design below is Iceberg-shaped so
swapping the writer for `writeTo(...).overwritePartitions()` is mechanical):

    index_dir/
      postings_blocks/doc_bucket=K/   compressed posting blocks (blocks.py)
      doc_stats/doc_bucket=K/         (doc_id, dl) norms, co-partitioned
      term_dict/                      (term, df, cf) — derived from blocks
      manifest/                       append-only per-bucket commit log
      corpus_stats.json               {n_docs, avgdl, build_id, fingerprint}

Commit protocol (the reference mutates per-site status rows under locks,
model/Site.java:20-27; here state is an append-only log):

  1. a build computes the deterministic input ``fingerprint`` of the docs;
  2. buckets already present in the manifest for that fingerprint are
     SKIPPED (their files are not rewritten — lineage keeps the original
     build_id);
  3. missing buckets are written via dynamic partition overwrite (only
     those directories are replaced — idempotent under kill/retry), then a
     manifest row per bucket commits them with row counters;
  4. term_dict + corpus_stats re-derive from the committed blocks
     (blocks.term_dict_from_blocks — no corpus re-read), so the dictionary
     phase is always idempotent.

A build killed between (3) writes and its manifest append leaves orphan
partition files; the next run simply overwrites them — no torn state is
observable because readers go through the manifest.

At cluster scale the manifest is a small Iceberg table and step (3) is one
job per bucket *group* (``groups`` knob) so a 1000-executor build commits
progress every few minutes instead of only at the end.
"""

from __future__ import annotations

import json
import math
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.blocks import N_BUCKETS_DEFAULT, term_dict_from_blocks

MANIFEST_SCHEMA = (
    "build_id string, fingerprint string, doc_bucket int, phase string, "
    "n_docs long, n_postings long, n_blocks long, committed_at double"
)

# job group used for best-effort kill of in-flight Spark jobs on cancel
BUILD_JOB_GROUP = "search-engine-build"


class BuildCancelled(RuntimeError):
    """Raised by build_persistent when a cancel request is observed
    (reference stopIndexing semantics, IndexingServiceImpl.java:98-142)."""


def fingerprint_docs(docs: DataFrame) -> str:
    """Deterministic input fingerprint: order-insensitive aggregate over
    (doc_id, text length). Cheap — one scan of two columns."""
    row = docs.select(
        F.count("*").alias("n"),
        F.sum("doc_id").alias("s"),
        F.sum(F.length("text")).alias("l"),
        F.sum(F.crc32(F.col("text"))).alias("c"),
    ).collect()[0]
    return f"{row['n']}-{row['s']}-{row['l']}-{row['c']}"


class IndexStore:
    """Paths + manifest I/O for one persisted index."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 n_buckets: int = N_BUCKETS_DEFAULT):
        self.spark = spark
        self.dir = index_dir.rstrip("/")
        self.n_buckets = n_buckets
        self.blocks_path = f"{self.dir}/postings_blocks"
        self.doc_stats_path = f"{self.dir}/doc_stats"
        self.term_dict_path = f"{self.dir}/term_dict"
        self.manifest_path = f"{self.dir}/manifest"
        self.stats_path = f"{self.dir}/corpus_stats.json"
        self.cancel_path = f"{self.dir}/CANCEL"

    # ------------------------------------------------------------ manifest
    def manifest(self) -> DataFrame:
        if not os.path.exists(self.manifest_path):
            return self.spark.createDataFrame([], MANIFEST_SCHEMA)
        return self.spark.read.schema(MANIFEST_SCHEMA).parquet(self.manifest_path)

    def committed_buckets(self, fingerprint: str) -> set[int]:
        """Buckets whose LATEST lineage row matches ``fingerprint``.

        A later phase='reindex' row supersedes the original 'blocks'
        commit (its synthetic fingerprint differs), so a subsequent
        build_persistent over the original corpus REBUILDS reindexed
        buckets instead of silently skipping them while their files hold
        different data (ADVICE r01)."""
        from pyspark.sql import Window

        m = self.manifest().filter(F.col("phase").isin("blocks", "reindex"))
        w = Window.partitionBy("doc_bucket").orderBy(
            F.col("committed_at").desc()
        )
        rows = (
            m.withColumn("rn", F.row_number().over(w))
            .filter(
                (F.col("rn") == 1)
                & (F.col("phase") == "blocks")
                & (F.col("fingerprint") == fingerprint)
            )
            .select("doc_bucket")
            .collect()
        )
        return {r["doc_bucket"] for r in rows}

    def append_manifest(self, rows: list[dict]) -> None:
        df = self.spark.createDataFrame(
            [
                (
                    r["build_id"], r["fingerprint"], r["doc_bucket"],
                    r["phase"], r["n_docs"], r["n_postings"], r["n_blocks"],
                    r["committed_at"],
                )
                for r in rows
            ],
            MANIFEST_SCHEMA,
        )
        self.append_rows(df, self.manifest_path)

    # -------------------------------------------------- writer seam
    # Every physical write goes through these four methods — the Iceberg
    # adapter surface (tests/test_persistence.py asserts nothing bypasses
    # them). Swapping plain parquet for Iceberg is mechanical:
    #   overwrite_partitions → df.writeTo(tbl).overwritePartitions()
    #   drop_partitions      → DELETE FROM tbl WHERE doc_bucket IN (...)
    #   append_rows          → df.writeTo(tbl).append()
    #   replace_table        → df.writeTo(tbl).createOrReplace()
    def overwrite_partitions(self, df: DataFrame, path: str) -> None:
        _dynamic_overwrite(df, path)

    def drop_partitions(self, path: str, buckets: list[int]) -> None:
        import shutil

        for b in buckets:
            shutil.rmtree(f"{path}/doc_bucket={b}", ignore_errors=True)

    def append_rows(self, df: DataFrame, path: str) -> None:
        df.coalesce(1).write.mode("append").parquet(path)

    def replace_table(self, df: DataFrame, path: str) -> None:
        df.coalesce(4).write.mode("overwrite").parquet(path)

    # ------------------------------------------------------------- readers
    def read_blocks(self) -> DataFrame:
        return self.spark.read.parquet(self.blocks_path)

    def read_doc_stats(self) -> DataFrame:
        return self.spark.read.parquet(self.doc_stats_path)

    def read_term_dict(self) -> DataFrame:
        return self.spark.read.parquet(self.term_dict_path)

    def read_corpus_stats(self) -> dict:
        with open(self.stats_path) as f:
            return json.load(f)


def _with_bucket(df: DataFrame, n_buckets: int, col: str = "doc_id") -> DataFrame:
    return df.withColumn("doc_bucket", F.pmod(F.col(col), F.lit(n_buckets)).cast("int"))


def _dynamic_overwrite(df: DataFrame, path: str) -> None:
    """Overwrite ONLY the doc_bucket partitions present in df."""
    (
        df.repartition("doc_bucket")
        .sortWithinPartitions("doc_bucket")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("doc_bucket")
        .parquet(path)
    )


def _finalize_dictionary(store: IndexStore, build_id: str, fp: str) -> None:
    """Idempotent dictionary phase: term_dict + corpus stats from the
    committed store (never from the raw corpus)."""
    blocks = store.read_blocks()
    store.replace_table(term_dict_from_blocks(blocks), store.term_dict_path)
    row = store.read_doc_stats().agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
        F.sum("dl").alias("sum_dl"),
    ).collect()[0]
    stats = {
        "n_docs": int(row["n"]),
        "avgdl": float(row["avgdl"] or 0.0),
        # exact Σdl (total retained tokens) — the T scalar the LM-family
        # similarities need; persisting it makes a served query zero-scan
        "sum_dl": int(row["sum_dl"] or 0),
        "build_id": build_id,
        "fingerprint": fp,
        "n_buckets": store.n_buckets,
    }
    with open(store.stats_path, "w") as f:
        json.dump(stats, f)
    store.append_manifest([
        {
            "build_id": build_id, "fingerprint": fp, "doc_bucket": -1,
            "phase": "dict", "n_docs": stats["n_docs"], "n_postings": 0,
            "n_blocks": 0, "committed_at": time.time(),
        }
    ])


def request_cancel(store: IndexStore) -> None:
    """Reference stopIndexing (IndexingServiceImpl.java:98-142): ask the
    running build to stop. Two mechanisms, mirroring the reference's
    task-tree cancel + cooperative isCancelled() polls
    (PageAnalyzer.java:569-578):

      * a durable CANCEL marker the build polls between commit groups
        (works across processes — the builder may be another driver);
      * best-effort cancelJobGroup for in-flight Spark jobs in THIS
        session.

    Already-committed groups stay committed (they are valid checkpoints);
    the build records phase='cancelled' and raises BuildCancelled. A later
    build_persistent resumes from the committed buckets."""
    os.makedirs(store.dir, exist_ok=True)  # build may not have written yet
    with open(store.cancel_path, "w") as f:
        f.write(str(time.time()))
    try:
        store.spark.sparkContext.cancelJobGroup(BUILD_JOB_GROUP)
    except Exception:
        pass  # no jobs in flight / different session — marker suffices


def _check_cancelled(store: IndexStore, build_id: str, fp: str) -> None:
    if os.path.exists(store.cancel_path):
        store.append_manifest([
            {
                "build_id": build_id, "fingerprint": fp, "doc_bucket": -1,
                "phase": "cancelled", "n_docs": 0, "n_postings": 0,
                "n_blocks": 0, "committed_at": time.time(),
            }
        ])
        raise BuildCancelled("stopped by user")


def build_persistent(
    docs: DataFrame,
    store: IndexStore,
    groups: int = 1,
    fail_after_groups: int | None = None,
    on_group_commit=None,
) -> dict:
    """Resumable full build. Returns {build_id, built_buckets, skipped}.

    groups: number of commit units the missing buckets are split into (each
    unit = one write job + one manifest append — the checkpoint granularity).
    fail_after_groups: test hook — raise after N committed groups to
    simulate a mid-build kill.
    on_group_commit: callback(done_groups) after each committed group
    (tests use it to inject a cancel at a deterministic point).

    Cancellation: request_cancel() writes a CANCEL marker; the build polls
    it at every group boundary (cooperative, like the reference's
    isCancelled() checks) and raises BuildCancelled after recording a
    phase='cancelled' manifest row. The marker is consumed at build start —
    a cancel only ever applies to the build that observes it.
    """
    spark = store.spark
    n_buckets = store.n_buckets
    fp = fingerprint_docs(docs)
    build_id = uuid.uuid4().hex[:12]
    if os.path.exists(store.cancel_path):
        os.remove(store.cancel_path)  # stale marker from a previous cancel
    spark.sparkContext.setJobGroup(
        BUILD_JOB_GROUP, f"index build {build_id}", interruptOnCancel=True
    )
    try:
        return _build_persistent_grouped(
            store, docs, fp, build_id, groups, on_group_commit,
            fail_after_groups,
        )
    finally:
        # the job group is THREAD-local and sticky: without clearing it,
        # every later job from this thread (streaming micro-batches,
        # driver-side queries) inherits it, and a stray request_cancel()
        # would interrupt them mid-write. PySpark exposes no
        # clearJobGroup; go through the JVM handle.
        try:
            spark.sparkContext._jsc.clearJobGroup()
        except Exception:
            spark.sparkContext.setJobGroup("", "")


def _build_persistent_grouped(
    store: IndexStore,
    docs,
    fp: str,
    build_id: str,
    groups: int,
    on_group_commit,
    fail_after_groups: int | None,
) -> dict:
    spark = store.spark
    n_buckets = store.n_buckets
    committed = store.committed_buckets(fp)
    missing = sorted(set(range(n_buckets)) - committed)
    if not missing:
        if not os.path.exists(store.stats_path) or (
            store.read_corpus_stats().get("fingerprint") != fp
        ):
            _finalize_dictionary(store, build_id, fp)
        return {"build_id": build_id, "built_buckets": [], "skipped": sorted(committed)}

    # fused two-phase pipeline (operators/fused_build.py): the packed runs
    # feed blocks AND norms, so the corpus is tokenized exactly once per
    # build; norms re-complete with dl=0 rows via a cheap doc_id-only
    # left join (the store keeps EVERY document, matching the reference's
    # pages table and the avgdl definition)
    from .operators import fused_build as fb

    packed = fb.pack_documents(docs, n_buckets).cache()
    doc_stats = (
        docs.select("doc_id")
        .join(
            fb.doc_stats_from_packed(packed).drop("doc_bucket"),
            "doc_id",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("dl", F.lit(0)).cast("long").alias("dl"),
        )
    )
    doc_stats = _with_bucket(doc_stats, n_buckets)

    group_size = math.ceil(len(missing) / max(groups, 1))
    try:
        _run_groups(
            store, packed, doc_stats, missing, group_size, build_id, fp,
            on_group_commit, fail_after_groups,
        )
        _check_cancelled(store, build_id, fp)
    finally:
        packed.unpersist()
    _finalize_dictionary(store, build_id, fp)
    return {
        "build_id": build_id,
        "built_buckets": missing,
        "skipped": sorted(committed),
    }


def _run_groups(
    store: IndexStore,
    packed: DataFrame,
    doc_stats: DataFrame,
    missing: list[int],
    group_size: int,
    build_id: str,
    fp: str,
    on_group_commit,
    fail_after_groups: int | None,
) -> None:
    from .operators import fused_build as fb

    done_groups = 0
    for lo in range(0, len(missing), group_size):
        _check_cancelled(store, build_id, fp)
        batch = missing[lo : lo + group_size]
        sub = packed.filter(
            (F.col("kind") == "post") & F.col("doc_bucket").isin(batch)
        )
        blocks = fb.blocks_from_packed(sub)
        store.overwrite_partitions(blocks, store.blocks_path)
        store.overwrite_partitions(
            doc_stats.filter(F.col("doc_bucket").isin(batch)),
            store.doc_stats_path,
        )
        # per-bucket counters (lineage metrics) from the packed runs:
        # n_postings = Σ run lengths; n_docs = distinct docs via dl runs
        counters = {
            r["doc_bucket"]: r
            for r in doc_stats.filter(
                (F.col("doc_bucket").isin(batch)) & (F.col("dl") > 0)
            )
            .groupBy("doc_bucket")
            .agg(F.count("*").alias("n_docs"))
            .join(
                sub.groupBy("doc_bucket").agg(
                    F.sum("n").alias("n_postings")
                ),
                "doc_bucket",
                "outer",
            )
            .collect()
        }
        now = time.time()
        store.append_manifest(
            [
                {
                    "build_id": build_id,
                    "fingerprint": fp,
                    "doc_bucket": b,
                    "phase": "blocks",
                    "n_docs": int(counters[b]["n_docs"] or 0) if b in counters else 0,
                    "n_postings": int(counters[b]["n_postings"] or 0) if b in counters else 0,
                    "n_blocks": 0,
                    "committed_at": now,
                }
                for b in batch
            ]
        )
        done_groups += 1
        if on_group_commit is not None:
            on_group_commit(done_groups)
        if fail_after_groups is not None and done_groups >= fail_after_groups:
            raise RuntimeError(
                f"simulated failure after {done_groups} committed groups"
            )
