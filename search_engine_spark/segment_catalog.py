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
    index_dir/segments.json             current manifest (live pointer)
    index_dir/snapshots/v<N>.json       immutable snapshot per commit

The manifest is tiny driver-side metadata (like Lucene's segments_N file);
every mutation rewrites it atomically (write-temp + rename) AFTER the data
it describes is fully written, so a crash leaves either the old or the new
manifest — never a manifest pointing at half-written blocks. Orphan
segment dirs from a crash are invisible (not in any retained snapshot)
and are swept by the next maintain().

Snapshots give the catalog Iceberg's table-versioning semantics over the
same files: every commit (add_segment / each maintain merge / rollback)
appends an immutable ``snapshots/v<N>.json`` recording the full segment
set, its parent version and the operation. ``read_blocks(at_version=…)``
time-travels; ``rollback(v)`` makes an old snapshot current (a NEW
snapshot, Iceberg-style — history is append-only); data files compacted
away stay on disk until ``expire_snapshots(keep_last=…)`` drops the last
snapshot referencing them — exactly Iceberg's expire-snapshots contract,
so readers of any retained version never lose files underneath them.
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
        self, spark: SparkSession, index_dir: str,
        n_buckets: int | None = None,
    ):
        self.spark = spark
        self.index_dir = index_dir
        self.seg_root = os.path.join(index_dir, "segments")
        self.manifest_path = os.path.join(index_dir, "segments.json")
        self.snap_root = os.path.join(index_dir, "snapshots")
        self.meta_path = os.path.join(index_dir, "catalog.json")
        os.makedirs(self.seg_root, exist_ok=True)
        os.makedirs(self.snap_root, exist_ok=True)
        # n_buckets is a PHYSICAL property of every segment already on disk
        # (doc_bucket = pmod(doc_id, n)): mixing bucketings in one catalog
        # would silently break bucket pruning and cross-segment merges, so
        # the first opener pins it in catalog.json and later opens must
        # match (or omit the argument to adopt the pinned value).
        stored = None
        if os.path.exists(self.meta_path):
            with open(self.meta_path) as f:
                stored = json.load(f).get("n_buckets")
        if stored is not None:
            if n_buckets is not None and int(n_buckets) != int(stored):
                raise ValueError(
                    f"index at {index_dir} was created with "
                    f"n_buckets={stored}; refusing to open with "
                    f"n_buckets={n_buckets} (mixed bucketings corrupt "
                    f"merges and bucket pruning)"
                )
            self.n_buckets = int(stored)
        else:
            self.n_buckets = int(
                N_BUCKETS_DEFAULT if n_buckets is None else n_buckets
            )
            tmp = self.meta_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"n_buckets": self.n_buckets}, f)
            os.replace(tmp, self.meta_path)

    # ------------------------------------------------------------ manifest

    def manifest(self) -> dict[str, dict]:
        if not os.path.exists(self.manifest_path):
            return {}
        with open(self.manifest_path) as f:
            return json.load(f)

    def _write_manifest(self, m: dict[str, dict], operation: str) -> None:
        """Commit: append an immutable snapshot file, then atomically swing
        the current pointer. Data files are always fully written before
        this is called; a crash between the two writes leaves an orphan
        snapshot describing a state that never became current — harmless,
        aged out by expire_snapshots()."""
        parent = self.current_version()
        version = parent + 1
        snap = {
            "version": version,
            "parent": parent or None,
            "operation": operation,
            "segments": m,
        }
        spath = os.path.join(self.snap_root, f"v{version}.json")
        tmp = spath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, sort_keys=True, indent=1)
        os.replace(tmp, spath)
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f, sort_keys=True, indent=1)
        os.replace(tmp, self.manifest_path)  # atomic on POSIX

    # ----------------------------------------------------------- snapshots

    def _snapshot_versions(self) -> list[int]:
        out = []
        for fn in os.listdir(self.snap_root):
            if fn.startswith("v") and fn.endswith(".json"):
                out.append(int(fn[1:-5]))
        return sorted(out)

    def current_version(self) -> int:
        """0 when no commit has happened yet."""
        vs = self._snapshot_versions()
        return vs[-1] if vs else 0

    def snapshot(self, version: int) -> dict:
        path = os.path.join(self.snap_root, f"v{version}.json")
        if not os.path.exists(path):
            raise KeyError(
                f"snapshot v{version} not found (expired or never committed)"
            )
        with open(path) as f:
            return json.load(f)

    def snapshots(self) -> list[dict]:
        """History, oldest first: [{version, parent, operation, segments}]."""
        return [self.snapshot(v) for v in self._snapshot_versions()]

    def rollback(self, version: int) -> int:
        """Make an old snapshot's segment set current — as a NEW commit
        (append-only history, Iceberg semantics). Refuses if any of the
        target's segment dirs has been expired from disk."""
        snap = self.snapshot(version)
        missing = [
            n
            for n in snap["segments"]
            if not os.path.isdir(os.path.join(self.seg_root, n))
        ]
        if missing:
            raise KeyError(
                f"cannot roll back to v{version}: segments expired {missing}"
            )
        self._write_manifest(dict(snap["segments"]), f"rollback-to-v{version}")
        return self.current_version()

    def expire_snapshots(self, keep_last: int = 1) -> list[str]:
        """Drop all but the newest ``keep_last`` snapshots, then delete
        segment dirs no retained snapshot references (Iceberg
        expire-snapshots). Returns the deleted segment names."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        vs = self._snapshot_versions()
        for v in vs[:-keep_last]:
            os.remove(os.path.join(self.snap_root, f"v{v}.json"))
        live = self._referenced_segments()
        deleted = []
        for d in sorted(os.listdir(self.seg_root)):
            if d not in live:
                shutil.rmtree(os.path.join(self.seg_root, d), ignore_errors=True)
                deleted.append(d)
        return deleted

    def _name_taken(self, name: str) -> bool:
        """A segment name is unusable if the CURRENT manifest or ANY
        retained snapshot still references it — segment dirs are
        immutable, and write_blocks overwrites, so reusing such a name
        would silently corrupt time travel (older snapshots would read
        the new data under the old name). An on-disk dir that NO snapshot
        references is a crash orphan: not taken — the writer clears it
        (``_clear_orphan_dir``) so a retried ingest can reuse its name."""
        return name in self._referenced_segments()

    def _clear_orphan_dir(self, name: str) -> None:
        """Remove a half-written, unreferenced dir before (re)writing
        under the same name (the add_segment crash-retry path)."""
        path = os.path.join(self.seg_root, name)
        if os.path.isdir(path):
            shutil.rmtree(path, ignore_errors=True)

    def _referenced_segments(self) -> set[str]:
        """Every segment any retained snapshot (or the current manifest)
        still points at — the files expire_snapshots/_sweep_orphans must
        keep."""
        live = set(self.manifest())
        for v in self._snapshot_versions():
            live |= set(self.snapshot(v)["segments"])
        return live

    def segment_names(self, at_version: int | None = None) -> list[str]:
        if at_version is None:
            return sorted(self.manifest())
        return sorted(self.snapshot(at_version)["segments"])

    # ------------------------------------------------------------- ingest

    def add_segment(self, docs: DataFrame, name: str) -> dict:
        """Build an immutable delta segment from a document batch.

        A from-scratch fused build over ONLY this batch (the whole point of
        the LSM shape: ingest cost is proportional to the delta, never the
        base). doc_ids must be globally unique across segments — the
        engine's doc_id derivation guarantees it; overlapping ids are an
        upstream reindex (operators/incremental.py), not a new segment."""
        m = self.manifest()
        if self._name_taken(name):
            raise ValueError(
                f"segment {name!r} already exists (live or referenced by "
                f"a retained snapshot)"
            )
        self._clear_orphan_dir(name)  # crash-retry: clobber the leftover
        ident = docs.agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("doc_lo"),
            F.max("doc_id").alias("doc_hi"),
        ).collect()[0]
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
            # batch identity — lets a streaming replay distinguish "this
            # exact batch is already committed" (benign, no-op) from "a
            # DIFFERENT batch collided with a committed name" (data loss
            # if silently skipped); see streaming/stream_segments.py
            "n_docs": int(ident["n_docs"]),
            "doc_lo": None if ident["doc_lo"] is None else int(ident["doc_lo"]),
            "doc_hi": None if ident["doc_hi"] is None else int(ident["doc_hi"]),
        }
        self._write_manifest(m, f"append:{name}")
        return m[name]

    # -------------------------------------------------------------- query

    def read_segment(self, name: str) -> DataFrame:
        # explicit schema: partition-dir doc_bucket stays IntegerType, and
        # an all-tombstoned (empty) segment reads as 0 rows, not an error
        return self.spark.read.schema(BLOCKS_SCHEMA).parquet(
            os.path.join(self.seg_root, name)
        )

    def read_blocks(self, at_version: int | None = None) -> DataFrame:
        """The queryable block table: union of every live segment —
        current by default, or any retained snapshot via ``at_version``
        (time travel; segments are immutable, so an old version is just a
        different union over the same files).

        Parquet union is scan-parallel; per-segment files stay partitioned
        by doc_bucket so bucket pruning / term min-max skipping apply
        per segment exactly as in the single-store path."""
        names = self.segment_names(at_version)
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

        `deleted` tombstones are purged physically ONLY from segments a
        merge in this pass rewrites (Lucene .liv semantics — logical
        until compaction). Segments outside every merge plan keep the
        dead postings, so callers retain the tombstone set and keep
        apply_tombstones on the query path until all segments that
        pre-date the delete have left segment_names().
        Returns the names of segments created."""
        created: list[str] = []
        for _ in range(max_rounds):
            m = self.manifest()
            sizes = {n: max(int(v["n_postings"]), 1) for n, v in m.items()}
            plans = plan_merges(sizes, merge_factor=merge_factor)
            if not plans:
                break
            for group in plans:
                # segments are immutable: a compacted output may NEVER
                # reuse a name any retained snapshot (or on-disk dir)
                # still references — time travel reads those files.
                # Suffix with the next commit version until unique.
                base = f"m-{min(group)}-{len(group)}"
                new_name, suffix = base, 0
                while self._name_taken(new_name):
                    suffix += 1
                    new_name = f"{base}-{suffix}"
                self._clear_orphan_dir(new_name)
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
                self._write_manifest(m, f"compact:{new_name}")
                created.append(new_name)
        self._sweep_orphans()
        return created

    def _sweep_orphans(self) -> None:
        """Delete segment dirs NO retained snapshot references (half-written
        crash leftovers). Compacted-away inputs are NOT orphans — older
        snapshots still reference them until expire_snapshots()."""
        live = self._referenced_segments()
        for d in os.listdir(self.seg_root):
            if d not in live:
                shutil.rmtree(os.path.join(self.seg_root, d), ignore_errors=True)
