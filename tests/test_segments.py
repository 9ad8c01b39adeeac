"""Segment merge (operators/segments.py): compacting delta indexes.

The invariant under test is the one the module promises: merging the block
tables of disjoint segments yields blocks BIT-IDENTICAL to a from-scratch
build over the union corpus — so queries over a merged index are trivially
correct (they read the same bytes), and incremental ingestion (base ∪ delta
→ merge) converges to the rebuild state.
"""

from __future__ import annotations

import pytest

from search_engine_spark.operators.fused_build import (
    blocks_from_packed,
    pack_documents,
)
from search_engine_spark.operators.segments import merge_segments
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST

N_BUCKETS = 8


def _blocks_sorted(blocks_df):
    rows = blocks_df.collect()
    return sorted(
        (tuple(r[f] for f in blocks_df.columns) for r in rows),
    )


@pytest.fixture(scope="module")
def docs(spark):
    return load_documents(spark, SF_TEST).cache()


def _build(docs_df):
    return blocks_from_packed(pack_documents(docs_df, n_buckets=N_BUCKETS))


def test_merge_two_segments_bit_identical(spark, docs):
    """base(2/3) ∪ delta(1/3) merged == from-scratch build over all docs."""
    base = docs.filter("doc_id % 3 != 0")
    delta = docs.filter("doc_id % 3 = 0")
    merged = _blocks_sorted(merge_segments(_build(base), _build(delta)))
    scratch = _blocks_sorted(_build(docs))
    assert merged == scratch


def test_merge_three_segments(spark, docs):
    segs = [_build(docs.filter(f"doc_id % 3 = {i}")) for i in range(3)]
    merged = _blocks_sorted(merge_segments(*segs))
    scratch = _blocks_sorted(_build(docs))
    assert merged == scratch


def test_merge_requires_two(spark, docs):
    with pytest.raises(ValueError):
        merge_segments(_build(docs))


def test_merge_with_tombstones_equals_live_rebuild(spark, docs):
    """Merge-time purge: merging segments with a tombstone set yields
    blocks bit-identical to a from-scratch build over the LIVE docs only
    (dl is per-document, so survivors' norms are untouched by deletes)."""
    import numpy as np

    base = docs.filter("doc_id % 3 != 0")
    delta = docs.filter("doc_id % 3 = 0")
    dead = np.array(
        [r.doc_id for r in docs.filter("doc_id % 5 = 0").collect()],
        dtype=np.int64,
    )
    assert dead.size > 0
    merged = _blocks_sorted(
        merge_segments(_build(base), _build(delta), deleted=dead)
    )
    live = _blocks_sorted(_build(docs.filter("doc_id % 5 != 0")))
    assert merged == live


def test_apply_tombstones_query_path(spark, docs):
    from search_engine_spark.operators.segments import apply_tombstones

    hits = docs.select("doc_id").limit(50)
    tomb = docs.select("doc_id").filter("doc_id % 2 = 0")
    out = apply_tombstones(hits, tomb).collect()
    assert out and all(r.doc_id % 2 == 1 for r in out)


def test_plan_merges_tiering():
    from search_engine_spark.operators.segments import plan_merges

    # 12 small segments (~same tier) + 1 big: one merge of the 10 smallest
    sizes = {f"s{i:02d}": 100 + i for i in range(12)}
    sizes["big"] = 10_000_000
    plans = plan_merges(sizes, merge_factor=10)
    assert plans == [[f"s{i:02d}" for i in range(10)]]
    # under the factor: nothing to do
    assert plan_merges({"a": 100, "b": 120}, merge_factor=10) == []
    # deterministic: same input, same plan
    assert plan_merges(dict(reversed(list(sizes.items())))) == plans
    import pytest as _pytest

    with _pytest.raises(ValueError):
        plan_merges(sizes, merge_factor=1)


def test_merge_disjoint_terms_pass_through(spark, docs):
    """A segment whose docs share no terms with the other still lands in
    the merged output unchanged (groups of size 1 re-encode to the same
    bytes — encoder determinism)."""
    a = docs.filter("doc_id % 7 = 0")
    b = docs.filter("doc_id % 7 = 3")
    merged = _blocks_sorted(merge_segments(_build(a), _build(b)))
    scratch = _blocks_sorted(_build(a.unionByName(b)))
    assert merged == scratch


def _postings_set(blocks_df):
    from search_engine_spark.operators.blocks import decode_blocks

    return {
        (r["term"], r["doc_id"], r["tf"]) for r in decode_blocks(blocks_df).collect()
    }


def test_segment_catalog_lifecycle(spark, docs, tmp_path):
    """Delta-segment ingest + tiered maintain: the queryable union stays
    posting-equivalent to a from-scratch build while segment count drops."""
    from search_engine_spark.segment_catalog import SegmentCatalog

    cat = SegmentCatalog(spark, str(tmp_path / "idx"), n_buckets=N_BUCKETS)
    for i in range(8):
        cat.add_segment(docs.filter(f"doc_id % 8 = {i}"), f"s{i:02d}")
    assert len(cat.segment_names()) == 8
    with pytest.raises(ValueError):  # immutable: no overwrite by name
        cat.add_segment(docs.limit(1), "s00")

    created = cat.maintain(merge_factor=4)
    assert created and len(cat.segment_names()) < 8
    assert _postings_set(cat.read_blocks()) == _postings_set(_build(docs))

    # manifest survives process boundaries: a fresh catalog sees the same set
    cat2 = SegmentCatalog(spark, str(tmp_path / "idx"), n_buckets=N_BUCKETS)
    assert cat2.segment_names() == cat.segment_names()


def test_segment_catalog_tombstone_purge(spark, docs, tmp_path):
    """maintain(deleted=…) physically purges tombstoned docs during the
    merges it performs — result equals a build over the live docs."""
    import numpy as np

    from search_engine_spark.segment_catalog import SegmentCatalog

    cat = SegmentCatalog(spark, str(tmp_path / "idx2"), n_buckets=N_BUCKETS)
    cat.add_segment(docs.filter("doc_id % 2 = 0"), "even")
    cat.add_segment(docs.filter("doc_id % 2 = 1"), "odd")
    dead = np.array([r["doc_id"] for r in docs.limit(40).collect()])
    cat.maintain(merge_factor=2, deleted=dead)
    assert len(cat.segment_names()) == 1
    live = docs.join(
        docs.sparkSession.createDataFrame(
            [(int(d),) for d in dead], "doc_id long"
        ),
        "doc_id",
        "left_anti",
    )
    assert _blocks_sorted(cat.read_blocks().drop("doc_bucket")) == _blocks_sorted(
        _build(live).drop("doc_bucket")
    )


def test_snapshot_time_travel_and_expiry(spark, docs, tmp_path):
    """Iceberg-style versioning: every commit is an immutable snapshot;
    old versions stay readable through compaction until expired; rollback
    is an append-only new commit; expiry removes unreferenced files."""
    from search_engine_spark.segment_catalog import SegmentCatalog

    cat = SegmentCatalog(spark, str(tmp_path / "tt"), n_buckets=N_BUCKETS)
    for i in range(4):
        cat.add_segment(docs.filter(f"doc_id % 4 = {i}"), f"s{i}")
    v_pre = cat.current_version()
    assert v_pre == 4
    pre_names = cat.segment_names()
    pre_postings = _postings_set(cat.read_blocks())

    created = cat.maintain(merge_factor=2)
    assert created
    v_post = cat.current_version()
    assert v_post > v_pre
    # time travel: the pre-compaction version still reads, same postings
    assert cat.segment_names(at_version=v_pre) == pre_names
    assert _postings_set(cat.read_blocks(at_version=v_pre)) == pre_postings
    # current version reads the compacted set, same logical postings
    assert _postings_set(cat.read_blocks()) == pre_postings
    ops = [s["operation"] for s in cat.snapshots()]
    assert ops[:4] == [f"append:s{i}" for i in range(4)]
    assert any(op.startswith("compact:") for op in ops[4:])

    # rollback re-activates the old segment set as a NEW commit
    v_rb = cat.rollback(v_pre)
    assert v_rb == v_post + 1
    assert cat.segment_names() == pre_names
    assert _postings_set(cat.read_blocks()) == pre_postings
    cat.rollback(v_post)  # back to the compacted set

    # history survives a process boundary
    cat2 = SegmentCatalog(spark, str(tmp_path / "tt"), n_buckets=N_BUCKETS)
    assert cat2.current_version() == v_rb + 1
    assert cat2.segment_names(at_version=v_pre) == pre_names

    # expiry: keep only the current snapshot → old versions gone, the
    # compacted-away input dirs deleted, current still fully readable
    deleted = cat2.expire_snapshots(keep_last=1)
    # the originals AND intermediate merge outputs go; current set stays
    assert set(pre_names) <= set(deleted)
    assert not set(cat2.segment_names()) & set(deleted)
    with pytest.raises(KeyError):
        cat2.snapshot(v_pre)
    with pytest.raises(KeyError):
        cat2.rollback(v_pre)
    assert _postings_set(cat2.read_blocks()) == pre_postings


def test_sweep_keeps_snapshot_referenced_segments(spark, docs, tmp_path):
    """maintain()'s orphan sweep must not delete compacted-away inputs
    while older snapshots still reference them — only true orphans
    (crash leftovers absent from every snapshot) go."""
    import os

    from search_engine_spark.segment_catalog import SegmentCatalog

    cat = SegmentCatalog(spark, str(tmp_path / "sw"), n_buckets=N_BUCKETS)
    cat.add_segment(docs.filter("doc_id % 2 = 0"), "a")
    cat.add_segment(docs.filter("doc_id % 2 = 1"), "b")
    orphan = os.path.join(cat.seg_root, "crashed-tmp")
    os.makedirs(orphan)
    cat.maintain(merge_factor=2)
    assert not os.path.isdir(orphan)  # true orphan swept
    assert os.path.isdir(os.path.join(cat.seg_root, "a"))  # still referenced
    assert os.path.isdir(os.path.join(cat.seg_root, "b"))


def test_segment_name_reuse_cannot_corrupt_history(spark, docs, tmp_path):
    """Reusing the name of a compacted-away (snapshot-referenced) segment
    must be refused, and maintain() must never regenerate a name an older
    snapshot still points at — segment dirs are immutable."""
    from search_engine_spark.segment_catalog import SegmentCatalog

    cat = SegmentCatalog(spark, str(tmp_path / "nr"), n_buckets=N_BUCKETS)
    cat.add_segment(docs.filter("doc_id < 20"), "a")
    cat.add_segment(docs.filter("doc_id >= 20 and doc_id < 40"), "b")
    v_pre = cat.current_version()
    pre = _postings_set(cat.read_blocks(at_version=v_pre))
    cat.maintain(merge_factor=2)  # 'a'/'b' leave the manifest, stay on disk

    # name reuse of a snapshot-referenced segment is refused
    with pytest.raises(ValueError):
        cat.add_segment(docs.filter("doc_id >= 40 and doc_id < 60"), "a")
    # history unharmed
    assert _postings_set(cat.read_blocks(at_version=v_pre)) == pre

    # rollback then re-maintain must mint a FRESH merge name, not overwrite
    merged_v = cat.current_version()
    merged_names = set(cat.segment_names())
    cat.rollback(v_pre)
    created = cat.maintain(merge_factor=2)
    assert created and not (set(created) & merged_names)
    assert _postings_set(cat.read_blocks(at_version=merged_v)) == pre


def test_crash_orphan_dir_allows_retry(spark, docs, tmp_path):
    """A half-written dir NO snapshot references must not block a retried
    add_segment under the same name (the crash-retry path) — only
    snapshot-referenced names are immutable."""
    import os

    from search_engine_spark.segment_catalog import SegmentCatalog

    cat = SegmentCatalog(spark, str(tmp_path / "rt"), n_buckets=N_BUCKETS)
    orphan = os.path.join(cat.seg_root, "batch-1")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "partial.parquet"), "w") as f:
        f.write("junk")  # simulated half-write, never committed
    info = cat.add_segment(docs.filter("doc_id < 20"), "batch-1")
    assert info["n_postings"] > 0
    assert _postings_set(cat.read_blocks()) == _postings_set(
        _build(docs.filter("doc_id < 20"))
    )


def test_catalog_pins_n_buckets(spark, tmp_path):
    """n_buckets is a physical property of the on-disk segments: the first
    opener pins it; a conflicting later open must refuse (mixed bucketings
    silently corrupt merges and bucket pruning), and an argument-less open
    adopts the pinned value."""
    from search_engine_spark.segment_catalog import SegmentCatalog

    d = str(tmp_path / "pinned")
    SegmentCatalog(spark, d, n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets"):
        SegmentCatalog(spark, d, n_buckets=32)
    assert SegmentCatalog(spark, d).n_buckets == 16
    assert SegmentCatalog(spark, d, n_buckets=16).n_buckets == 16


def test_plan_merges_exact_power_tier_boundary():
    """Sizes at an exact power of the base must tier ABOVE sizes just
    below it (float log mis-floors: int(math.log(1000, 10)) == 2) — the
    two cohorts may never land in one merge group."""
    from search_engine_spark.operators.segments import plan_merges

    sizes = {f"p{i}": 1000 for i in range(10)}
    sizes.update({f"q{i}": 999 for i in range(10)})
    plans = plan_merges(sizes, merge_factor=10)
    assert len(plans) == 2
    for group in plans:
        kinds = {name[0] for name in group}
        assert len(kinds) == 1, f"mixed tiers in one group: {group}"
