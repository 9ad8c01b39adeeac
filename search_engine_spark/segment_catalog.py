"""Multi-segment persistent index — the LSM layout that makes continuous
ingestion scale.

The reference re-crawls a page by mutating MySQL rows in place
(PageAnalyzer.java:301-360); the single-store build (catalog.py) mirrors
that with bucket-overwrite upserts. This module is the other half of the
Lucene/LSM design the segment operators (operators/segments.py) enable:

* every batch of NEW documents becomes its own immutable delta segment —
  a from-scratch fused build over just that batch (cheap: touches nothing
  existing, no read-modify-write of the base index);
* queries read the UNION of all live segments' block tables (plus the
  tombstone anti-join, operators/segments.py::apply_tombstones);
* a background `maintain()` pass asks the tiered merge policy
  (segments.plan_merges) which segments to compact and runs
  merge_segments on each group — keeping segment count
  O(merge_factor · log n) so query-time fan-in stays bounded.

Layout on disk (plain parquet standing in for Iceberg, same seam as
catalog.IndexStore):

    index_dir/segments/<name>/          block table (partitioned by bucket)
    index_dir/segments.json             {name: {n_docs, n_postings}} manifest

The manifest is tiny driver-side metadata (like Lucene's segments_N file);
every mutation rewrites it atomically (write-temp + rename) AFTER the data
it describes is fully written, so a crash leaves either the old or the new
manifest — never a manifest pointing at half-written blocks. Orphan
segment dirs from a crash are invisible (not in the manifest) and are
swept by the next maintain().
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.blocks import BLOCKS_SCHEMA, write_blocks
from .operators.fused_build import blocks_from_packed, pack_documents
from .operators.segments import merge_segments, plan_merges

N_BUCKETS_DEFAULT = 16


class SegmentCatalog:
    """Manages the segment set of one index directory."""

    def __init__(
        self, spark: SparkSession, index_dir: str, n_buckets: int = N_BUCKETS_DEFAULT
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.n_buckets = n_buckets
        self.seg_root = os.path.join(index_dir, "segments")
        self.manifest_path = os.path.join(index_dir, "segments.json")
        os.makedirs(self.seg_root, exist_ok=True)

    # ------------------------------------------------------------ manifest

    def manifest(self) -> dict[str, dict]:
        if not os.path.exists(self.manifest_path):
            return {}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict[str, dict]) -> None:
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, sort_keys=True, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    def segment_names(self) -> list[str]:
        return sorted(self.manifest())

    # ------------------------------------------------------------- ingest

    def add_segment(self, docs: DataFrame, name: str) -> dict:
        """Build an immutable delta segment from a document batch.

        A from-scratch fused build over ONLY this batch (the whole point of
        the LSM shape: ingest cost is proportional to the delta, never the
        base). doc_ids must be globally unique across segments — the
        engine's doc_id derivation guarantees it; overlapping ids are an
        upstream reindex (operators/incremental.py), not a new segment."""
        m = self.manifest()
        if name in m:
            raise ValueError(f"segment {name!r} already exists")
        packed = pack_documents(docs, n_buckets=self.n_buckets)
        blocks = blocks_from_packed(packed)
        path = os.path.join(self.seg_root, name)
        write_blocks(blocks, path)
        stats = (
            self.spark.read.schema(BLOCKS_SCHEMA).parquet(path)
            .agg(
                F.sum("count").alias("n_postings"),
                F.count("*").alias("n_blocks"),
            )
            .collect()[0]
        )
        m[name] = {
            "n_postings": int(stats["n_postings"] or 0),
            "n_blocks": int(stats["n_blocks"]),
        }
        self._write_manifest(m)
        return m[name]

    # -------------------------------------------------------------- query

    def read_segment(self, name: str) -> DataFrame:
        # explicit schema: partition-dir doc_bucket stays IntegerType, and
        # an all-tombstoned (empty) segment reads as 0 rows, not an error
        return self.spark.read.schema(BLOCKS_SCHEMA).parquet(
            os.path.join(self.seg_root, name)
        )

    def read_blocks(self) -> DataFrame:
        """The queryable block table: union of every live segment.

        Parquet union is scan-parallel; per-segment files stay partitioned
        by doc_bucket so bucket pruning / term min-max skipping apply
        per segment exactly as in the single-store path."""
        names = self.segment_names()
        if not names:
            raise FileNotFoundError(f"no segments in {self.index_dir}")
        # one read per segment root (each is its own partitioned layout;
        # a multi-root read trips partition discovery), unioned — the scan
        # stays file-parallel and per-segment pruning is preserved
        out = self.read_segment(names[0])
        for n in names[1:]:
            out = out.unionByName(self.read_segment(n))
        return out

    # ----------------------------------------------------------- maintain

    def maintain(
        self,
        merge_factor: int = 10,
        deleted: np.ndarray | None = None,
        max_rounds: int = 8,
    ) -> list[str]:
        """Run the tiered merge policy to convergence (≤ max_rounds).

        Each round: plan_merges over the manifest's n_postings sizes; for
        every planned group, merge_segments → write the compacted segment
        → commit the manifest (new segment in, inputs out) → delete input
        dirs. Rounds repeat because a round's outputs may themselves tier
        up into a mergeable group. Also sweeps orphan dirs (crashed adds).

        `deleted` tombstones are purged physically in every merge this
        pass performs (Lucene .liv semantics — logical until compaction).
        Returns the names of segments created."""
        created: list[str] = []
        for _ in range(max_rounds):
            m = self.manifest()
            sizes = {n: max(int(v["n_postings"]), 1) for n, v in m.items()}
            plans = plan_merges(sizes, merge_factor=merge_factor)
            if not plans:
                break
            for group in plans:
                new_name = f"m-{min(group)}-{len(group)}"
                if new_name in m:  # merge-of-merge landing on same name
                    new_name = f"{new_name}-{len(m)}"
                merged = merge_segments(
                    *[self.read_segment(n) for n in group], deleted=deleted
                )
                path = os.path.join(self.seg_root, new_name)
                write_blocks(merged, path)
                stats = (
                    self.spark.read.schema(BLOCKS_SCHEMA).parquet(path)
                    .agg(
                        F.sum("count").alias("n_postings"),
                        F.count("*").alias("n_blocks"),
                    )
                    .collect()[0]
                )
                m = self.manifest()
                for n in group:
                    m.pop(n, None)
                m[new_name] = {
                    "n_postings": int(stats["n_postings"] or 0),
                    "n_blocks": int(stats["n_blocks"]),
                }
                self._write_manifest(m)
                for n in group:
                    shutil.rmtree(os.path.join(self.seg_root, n), ignore_errors=True)
                created.append(new_name)
        self._sweep_orphans()
        return created

    def _sweep_orphans(self) -> None:
        live = set(self.manifest())
        for d in os.listdir(self.seg_root):
            if d not in live:
                shutil.rmtree(os.path.join(self.seg_root, d), ignore_errors=True)
