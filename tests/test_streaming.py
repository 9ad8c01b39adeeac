"""Structured Streaming ingestion: two landed batches converge to the same
index a one-shot batch build produces."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from search_engine_spark import catalog
from search_engine_spark.operators.blocks import decode_blocks
from search_engine_spark.sources.documents import load_documents
from search_engine_spark.streaming import (
    run_incremental_indexing,
    stream_documents,
)

from tests.conftest import SF_TEST

N_BUCKETS = 8
STREAM_COLS = ["doc_id", "url", "warc_ts", "html", "text", "lang"]


def test_streamed_batches_equal_batch_build(spark, tmp_path):
    docs = load_documents(spark, SF_TEST).filter(F.col("doc_id") < 120)
    landing = str(tmp_path / "landing")
    # two files land at different times → two micro-batches
    docs.filter(F.col("doc_id") < 60).select(*STREAM_COLS).coalesce(1).write.parquet(
        landing + "/part1"
    )
    docs.filter(F.col("doc_id") >= 60).select(*STREAM_COLS).coalesce(1).write.parquet(
        landing + "/part2"
    )

    store = catalog.IndexStore(spark, str(tmp_path / "sidx"), n_buckets=N_BUCKETS)
    stream = stream_documents(spark, landing + "/part*")
    # maxFilesPerTrigger=8 would merge both files into one batch — force
    # file-by-file batches to exercise the incremental branch
    stream = (
        spark.readStream.schema(stream.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/part*")
    )
    run_incremental_indexing(stream, store, str(tmp_path / "ckpt"))

    ref_store = catalog.IndexStore(spark, str(tmp_path / "bidx"), n_buckets=N_BUCKETS)
    catalog.build_persistent(docs, ref_store)

    def postings(s):
        return {
            (r["term"], r["doc_id"], r["tf"])
            for r in decode_blocks(s.read_blocks()).collect()
        }

    assert postings(store) == postings(ref_store)
    td = {
        (r["term"], r["df"], r["cf"]) for r in store.read_term_dict().collect()
    }
    td_ref = {
        (r["term"], r["df"], r["cf"])
        for r in ref_store.read_term_dict().collect()
    }
    assert td == td_ref
    # streamed manifest shows both phases: initial build + incremental batch
    phases = {
        r["phase"] for r in store.manifest().select("phase").distinct().collect()
    }
    assert "blocks" in phases and "reindex" in phases


def test_streamed_windowed_counts_match_batch(spark, tmp_path):
    """Watermarked streaming tumbling windows == batch windowed_counts for
    all windows the watermark has closed (append mode emits closed windows;
    with availableNow over finite input, every window except possibly the
    last open one emits)."""
    from search_engine_spark.operators.events import windowed_counts
    from search_engine_spark.streaming.stream_events import (
        run_windowed_to_memory,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    landing = str(tmp_path / "events_in")
    events.coalesce(2).write.parquet(landing)

    streamed = run_windowed_to_memory(
        spark, landing, str(tmp_path / "eckpt"), table_name="tw_test"
    )
    got = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in streamed.collect()
    }
    want_rows = windowed_counts(events).collect()
    want = {
        (r["win_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in want_rows
    }
    # every emitted window matches batch exactly
    assert got, "stream emitted no closed windows"
    for k, v in got.items():
        assert want[k] == v
    # and the stream emitted every window older than the final watermark
    max_ts = max(r["win_start"] for r in want_rows)
    missing = {k for k in want if k not in got and k[0] < max_ts}
    assert not missing


def test_stateful_sessionize_stream_matches_batch(spark, tmp_path):
    """applyInPandasWithState sessionizer: over the finite fixture stream
    (forced multi-batch so state carries across micro-batches), the emitted
    CLOSED sessions must equal the batch sessionizer's output minus each
    user's final session (still open in state — no later event closed it)."""
    from search_engine_spark.operators.events import sessionize
    from search_engine_spark.streaming.stream_events import EVENTS_SCHEMA
    from search_engine_spark.streaming.stream_sessions import sessionize_stream

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet").filter(
        F.col("user_id") < 40
    )
    landing = str(tmp_path / "sess_in")
    # split by time so state genuinely spans micro-batches
    cut = events.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    events.filter(F.col("ts") <= cut).coalesce(1).write.parquet(landing + "/p1")
    events.filter(F.col("ts") > cut).coalesce(1).write.parquet(landing + "/p2")

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/p*")
    )
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_test")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sess_test").collect()
    }

    batch = sessionize(events).collect()
    last_per_user = {}
    for r in batch:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["start_ts"] > cur["start_ts"]:
            last_per_user[r["user_id"]] = r
    want = {
        (r["user_id"], r["start_ts"], r["end_ts"], r["n_events"])
        for r in batch
        if last_per_user[r["user_id"]] is not r
    }
    assert got == want
    assert got, "no sessions closed — fixture should span many gaps"


def test_stream_dedup_matches_batch_distinct(spark, tmp_path):
    """Streaming exact dedup emits exactly one doc per distinct fingerprint
    (all fixture timestamps land inside one watermark window), and the
    emitted doc set is a valid canonical pick: one member of each batch
    fingerprint group."""
    from search_engine_spark.operators.textstats import fingerprints
    from search_engine_spark.streaming.stream_dedup import run_dedup_to_memory

    docs = load_documents(spark, SF_TEST).filter(F.col("doc_id") < 150)
    landing = str(tmp_path / "dedup_landing")
    docs.filter(F.col("doc_id") < 75).select(*STREAM_COLS).coalesce(1).write.parquet(
        landing + "/part1"
    )
    docs.filter(F.col("doc_id") >= 75).select(*STREAM_COLS).coalesce(1).write.parquet(
        landing + "/part2"
    )
    got = run_dedup_to_memory(
        spark,
        landing + "/part*",
        str(tmp_path / "dedup_ckpt"),
        watermark="365 days",  # fixture spans days; keep every dup in-window
    ).collect()

    batch = fingerprints(docs).collect()
    groups: dict[str, set] = {}
    for r in batch:
        groups.setdefault(r["fp"], set()).add(r["doc_id"])
    assert len(got) == len(groups)  # one emission per distinct fingerprint
    for r in got:
        assert r["doc_id"] in groups[r["fp"]]  # a member of its group


def test_stream_segments_lsm_ingestion(spark, tmp_path):
    """foreachBatch → immutable delta segments + periodic tiered maintain:
    the catalog's queryable union is posting-equivalent to a batch build
    over everything streamed."""
    from search_engine_spark.operators.blocks import decode_blocks
    from search_engine_spark.operators.fused_build import (
        blocks_from_packed,
        pack_documents,
    )
    from search_engine_spark.segment_catalog import SegmentCatalog
    from search_engine_spark.streaming.stream_segments import (
        run_segment_ingestion,
    )

    docs = load_documents(spark, SF_TEST).filter(F.col("doc_id") < 120)
    landing = str(tmp_path / "seg_landing")
    for lo, hi, part in [(0, 40, "p1"), (40, 80, "p2"), (80, 120, "p3")]:
        docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select(*STREAM_COLS).coalesce(1).write.parquet(f"{landing}/{part}")

    cat = SegmentCatalog(spark, str(tmp_path / "segidx"), n_buckets=N_BUCKETS)
    stream = (
        spark.readStream.schema(stream_documents(spark, landing).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/p*")
    )
    run_segment_ingestion(
        stream, cat, str(tmp_path / "seg_ckpt"), maintain_every=2, merge_factor=2
    )
    assert cat.segment_names()  # ingested (maintain may have compacted)

    streamed = {
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_blocks(cat.read_blocks()).collect()
    }
    scratch = {
        (r["term"], r["doc_id"], r["tf"])
        for r in decode_blocks(
            blocks_from_packed(pack_documents(docs, n_buckets=N_BUCKETS))
        ).collect()
    }
    assert streamed == scratch


def test_stream_latest_revision_matches_batch(spark, tmp_path):
    """Streaming newest-revision reconciliation over two arrival batches
    equals the batch latest_revisions over the union — including a
    late-arriving OLDER revision that must NOT displace the winner."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.curation import latest_revisions
    from search_engine_spark.sources.documents import load_documents
    from search_engine_spark.streaming.stream_latest import (
        run_latest_to_memory,
    )

    from tests.conftest import SF_TEST

    mod = 7
    docs = load_documents(spark, SF_TEST).filter("doc_id < 60").select(
        "doc_id", "url", "warc_ts", "html", "text", "lang"
    )
    landing = str(tmp_path / "landing")
    # batch 1: the newer half arrives FIRST; batch 2 delivers older
    # revisions late (lower doc_id == earlier warc_ts by derivation)
    docs.filter("doc_id >= 30").write.parquet(landing, mode="append")
    docs.filter("doc_id < 30").write.parquet(landing, mode="append")

    got = run_latest_to_memory(
        spark, landing, str(tmp_path / "ck"), key_mod=mod
    )
    batch = latest_revisions(
        docs.withColumn("page_key", F.col("doc_id") % mod)
    )
    to_set = lambda df: {
        (r["page_key"], r["n_revisions"], r["doc_id"])
        for r in df.select("page_key", "n_revisions", "doc_id").collect()
    }
    assert to_set(got) == to_set(batch)


def test_stream_percolate_matches_batch(spark, tmp_path):
    """Streaming percolation (two micro-batches) emits exactly the batch
    percolate alert set — the stateless-twin equivalence."""
    from search_engine_spark.operators.index_build import build_postings
    from search_engine_spark.operators.search import percolate
    from search_engine_spark.streaming.stream_percolate import (
        run_percolate_to_dir,
    )

    docs = load_documents(spark, SF_TEST).filter(F.col("doc_id") < 120)
    landing = str(tmp_path / "perc_landing")
    docs.filter(F.col("doc_id") < 60).select(*STREAM_COLS).coalesce(1).write.parquet(
        landing + "/part1"
    )
    docs.filter(F.col("doc_id") >= 60).select(*STREAM_COLS).coalesce(1).write.parquet(
        landing + "/part2"
    )
    got = run_percolate_to_dir(
        spark,
        landing + "/part*",
        str(tmp_path / "perc_ckpt"),
        str(tmp_path / "perc_out"),
    ).collect()
    want = percolate(build_postings(docs)).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert want  # non-vacuous: the stored queries match fixture docs


def test_stream_attribution_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == batch interval join:
    same (view, click, lag) multiset after both micro-batches land."""
    from search_engine_spark.operators.events import attribution_pairs
    from search_engine_spark.streaming.stream_attribution import (
        run_attribution_to_memory,
    )

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    landing = str(tmp_path / "landing")
    events.filter(F.col("event_id") % 2 == 0).coalesce(1).write.parquet(
        landing + "/part1"
    )
    events.filter(F.col("event_id") % 2 == 1).coalesce(1).write.parquet(
        landing + "/part2"
    )
    got = run_attribution_to_memory(
        spark, landing + "/part*", str(tmp_path / "ckpt")
    )
    want = attribution_pairs(events)
    key = lambda df: sorted(
        (r["view_id"], r["click_id"], r["user_id"], r["lag_s"])
        for r in df.collect()
    )
    assert key(got) == key(want)
    assert len(key(got)) > 0


def test_sessionize_fn_merges_late_batch_with_minmax_bounds():
    """A micro-batch can deliver events EARLIER than the open session's
    last-seen (the file source gives no cross-batch event-time order).
    The merge must take min(start)/max(end) — naively adopting the late
    segment's end would regress session_end below session_start and a
    later in-gap event would falsely close an invalid session."""
    import pandas as pd

    from search_engine_spark.streaming.stream_sessions import _session_fn

    class FakeState:
        def __init__(self):
            self.exists = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

    fn = _session_fn(gap_min=30)
    state = FakeState()

    def run(ts_list):
        batch = pd.DataFrame(
            {
                "user_id": [1] * len(ts_list),
                "event_id": range(len(ts_list)),
                "ts": pd.to_datetime(ts_list),
            }
        )
        return list(fn((1,), iter([batch]), state))

    base = "2024-01-01 "
    # open session 10:00-10:20 carried in state
    run([base + "10:00:00", base + "10:10:00", base + "10:20:00"])
    assert state._v == (
        int(pd.Timestamp(base + "10:00:00").value // 1000),
        int(pd.Timestamp(base + "10:20:00").value // 1000),
        3,
    )
    # late batch: one event BEFORE the open session — must merge, keeping
    # end=10:20 (max), start=09:50 (min), closing nothing
    out = run([base + "09:50:00"])
    assert out == []
    assert state._v == (
        int(pd.Timestamp(base + "09:50:00").value // 1000),
        int(pd.Timestamp(base + "10:20:00").value // 1000),
        4,
    )
    # 10:40 is within gap of the true last-seen 10:20 → still nothing
    # closes (the bug closed an invalid start>end session here)
    out = run([base + "10:40:00"])
    assert out == []
    assert state._v[1] == int(pd.Timestamp(base + "10:40:00").value // 1000)
    assert state._v[2] == 5


def test_stream_segments_fresh_checkpoint_collision_raises(spark, tmp_path):
    """A fresh checkpoint pointed at an EXISTING catalog restarts batch
    ids at 0; the colliding segment name holds different data, which must
    fail loudly — silently treating it as a replay drops the new docs."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    from search_engine_spark.segment_catalog import SegmentCatalog
    from search_engine_spark.streaming.stream_segments import (
        run_segment_ingestion,
    )

    docs = load_documents(spark, SF_TEST)
    land1, land2 = str(tmp_path / "l1"), str(tmp_path / "l2")
    docs.filter(F.col("doc_id") < 30).select(*STREAM_COLS).coalesce(
        1
    ).write.parquet(land1 + "/p1")
    docs.filter((F.col("doc_id") >= 30) & (F.col("doc_id") < 60)).select(
        *STREAM_COLS
    ).coalesce(1).write.parquet(land2 + "/p1")

    cat = SegmentCatalog(spark, str(tmp_path / "idx"), n_buckets=N_BUCKETS)
    schema = stream_documents(spark, land1).schema
    run_segment_ingestion(
        spark.readStream.schema(schema).parquet(land1 + "/p*"),
        cat,
        str(tmp_path / "ckpt1"),
    )
    assert cat.segment_names() == ["b000000"]

    with pytest.raises(StreamingQueryException, match="DIFFERENT batch"):
        run_segment_ingestion(
            spark.readStream.schema(schema).parquet(land2 + "/p*"),
            cat,
            str(tmp_path / "ckpt2"),  # fresh checkpoint → batch_id 0 again
        )
    # and a GENUINE replay (same data, fresh checkpoint) stays a no-op
    run_segment_ingestion(
        spark.readStream.schema(schema).parquet(land1 + "/p*"),
        cat,
        str(tmp_path / "ckpt3"),
    )
    assert cat.segment_names() == ["b000000"]


def test_stream_percolate_empty_input_returns_empty(spark, tmp_path):
    from search_engine_spark.streaming.stream_percolate import (
        run_percolate_to_dir,
    )

    landing = tmp_path / "empty_landing"
    landing.mkdir()
    got = run_percolate_to_dir(
        spark,
        str(landing),
        str(tmp_path / "ckpt"),
        str(tmp_path / "alerts"),
    )
    assert got.columns == ["query_id", "doc_id"]
    assert got.count() == 0


def test_stream_percolate_replay_is_idempotent(spark, tmp_path):
    """Re-delivering batch 0 (checkpoint lost) rewrites the same
    batch-deterministic sink path instead of appending a duplicate copy
    of every alert."""
    import shutil

    from search_engine_spark.streaming.stream_percolate import (
        run_percolate_to_dir,
    )

    docs = load_documents(spark, SF_TEST).filter(F.col("doc_id") < 60)
    landing = str(tmp_path / "perc_landing")
    docs.select(*STREAM_COLS).coalesce(1).write.parquet(landing + "/p1")
    out = str(tmp_path / "alerts")
    ckpt = str(tmp_path / "ckpt")
    first = sorted(
        (r["query_id"], r["doc_id"])
        for r in run_percolate_to_dir(
            spark, landing + "/p*", ckpt, out
        ).collect()
    )
    assert first, "fixture should trigger at least one alert"
    shutil.rmtree(ckpt)  # lose the checkpoint → batch 0 replays
    second = sorted(
        (r["query_id"], r["doc_id"])
        for r in run_percolate_to_dir(
            spark, landing + "/p*", ckpt, out
        ).collect()
    )
    assert second == first


def test_stream_trending_counts_match_batch(spark, tmp_path):
    """Streaming trending-term counts == the batch board's underlying
    counts for every watermark-closed window (the tokenizer + the
    stream-static lemma join run identically in both)."""
    from pyspark.sql import functions as F

    from search_engine_spark.functions.text_columns import explode_terms
    from search_engine_spark.sources.documents import load_documents
    from search_engine_spark.streaming.stream_trends import (
        run_trends_to_memory,
    )

    docs = load_documents(spark, "/root/testdata/sf0.001").select(
        "doc_id", "warc_ts", "text"
    )
    landing = str(tmp_path / "docs_in")
    docs.coalesce(2).write.parquet(landing)

    streamed = run_trends_to_memory(
        spark, landing, str(tmp_path / "tckpt"), table_name="trend_test"
    )
    got = {
        (r["bucket_epoch"], r["term"]): r["n"] for r in streamed.collect()
    }
    epoch = F.col("warc_ts").cast("long")
    want_rows = (
        explode_terms(docs, keep=["doc_id", "warc_ts"])
        .withColumn("bucket_epoch", (epoch - epoch % 3600).cast("long"))
        .groupBy("bucket_epoch", "term")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    )
    want = {(r["bucket_epoch"], r["term"]): r["n"] for r in want_rows}
    assert got, "stream emitted no closed windows"
    for k, v in got.items():
        assert want[k] == v
    # append mode emits a window once the watermark passes its END:
    # closed ⇔ win_start + 3600 ≤ max(warc_ts) − 30 min
    max_ts = docs.agg(F.max(epoch)).collect()[0][0]
    missing = {
        k for k in want if k not in got and k[0] + 3600 <= max_ts - 1800
    }
    assert not missing


def test_trending_board_topk_is_deterministic(spark):
    """The batch board keeps exactly k rows per bucket, ordered n desc /
    term asc (cross-checked against its own counts)."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.textstats import trending_terms
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, "/root/testdata/sf0.001")
    board = trending_terms(docs, k=3).collect()
    per = {}
    for r in board:
        per.setdefault(r["bucket_epoch"], []).append((r["n"], r["term"]))
    for b, rows in per.items():
        assert len(rows) <= 3
        assert rows == sorted(rows, key=lambda x: (-x[0], x[1]))


def test_stream_coec_windows_match_batch_under_frozen_priors(spark, tmp_path):
    """Streaming COEC accumulation == the batch aggregation restricted
    to each closed window, under the SAME frozen position priors (the
    production split: batch refreshes priors, the stream accumulates
    per-item windowed clicks/EC)."""
    from pyspark.sql import functions as F

    from search_engine_spark.streaming.stream_coec import (
        EVENTS_SCHEMA,
        run_coec_to_memory,
    )

    events = spark.read.schema(EVENTS_SCHEMA).parquet(
        "/root/testdata/sf0.001/events.parquet"
    )
    landing = str(tmp_path / "coec_in")
    events.coalesce(2).write.parquet(landing)

    # batch-side frozen priors from the full log (mirrors coec_scores)
    base = events.filter(F.col("event_type").isin("view", "click")).select(
        ((F.col("event_id") % 10) + 1).alias("pos"),
        (F.col("event_type") == "click").cast("long").alias("is_click"),
        (F.col("event_type") == "view").cast("long").alias("is_view"),
    )
    priors = {
        r["pos"]: r["c"] / r["v"]
        for r in base.groupBy("pos")
        .agg(F.sum("is_click").alias("c"), F.sum("is_view").alias("v"))
        .collect()
        if r["v"] > 0
    }

    streamed = run_coec_to_memory(
        spark, landing, priors, str(tmp_path / "coec_ckpt"),
        table_name="coec_test",
    )
    got = {
        (r["bucket_epoch"], r["k"]): (
            r["views"], r["clicks"], r["expected_clicks"]
        )
        for r in streamed.collect()
    }
    assert got, "stream emitted no closed windows"

    # batch reference: same derivations, same hourly windows, same priors
    pr = F.create_map(
        *[x for p, v in sorted(priors.items()) for x in (F.lit(p), F.lit(v))]
    )
    want_rows = (
        events.filter(F.col("event_type").isin("view", "click"))
        .select(
            "ts",
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            ((F.col("event_id") % 10) + 1).alias("pos"),
            (F.col("event_type") == "click").cast("long").alias("is_click"),
            (F.col("event_type") == "view").cast("long").alias("is_view"),
        )
        .withColumn("prior", F.coalesce(pr[F.col("pos")], F.lit(0.0)))
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(
            F.sum("is_view").alias("views"),
            F.sum("is_click").alias("clicks"),
            F.round(F.sum(F.col("is_view") * F.col("prior")), 4).alias("ec"),
        )
        .select(
            F.col("w.start").cast("long").alias("b"), "k",
            "views", "clicks", "ec",
        )
        .collect()
    )
    want = {
        (r["b"], r["k"]): (r["views"], r["clicks"], r["ec"])
        for r in want_rows
    }
    for key, v in got.items():
        assert want[key] == v
    max_b = max(r["b"] for r in want_rows)
    missing = {k for k in want if k not in got and k[0] < max_b}
    assert not missing


def test_stream_lsh_probe_matches_batch_incremental(spark, tmp_path):
    """The streaming increment gate == the batch dedup_incremental over
    the same new/corpus split, replayed as MULTIPLE micro-batches (one
    per landed file) — per-batch probing loses nothing because all of a
    doc's bands travel with its arrival."""
    from search_engine_spark.operators.dedup import dedup_incremental
    from search_engine_spark.sources.documents import load_documents
    from search_engine_spark.streaming.stream_lsh_probe import (
        run_probe_collect,
    )
    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    new_mod = 13
    is_new = F.col("doc_id") % new_mod == 0
    corpus = docs.filter(~is_new)
    new_docs = docs.filter(is_new)

    landing = str(tmp_path / "landing")
    # two files → two micro-batches under maxFilesPerTrigger=1
    new_docs.filter(F.col("doc_id") < 250).select(*STREAM_COLS).coalesce(
        1
    ).write.parquet(landing + "/p1")
    new_docs.filter(F.col("doc_id") >= 250).select(*STREAM_COLS).coalesce(
        1
    ).write.parquet(landing + "/p2")

    got = run_probe_collect(
        spark,
        landing + "/p*",
        corpus,
        checkpoint_dir=str(tmp_path / "ckpt"),
        threshold=0.5,
    )
    expect = sorted(
        tuple(r) for r in dedup_incremental(docs, threshold=0.5,
                                            new_mod=new_mod).collect()
    )
    assert got == expect and expect


def test_stream_champion_maintenance_converges(spark, tmp_path):
    """Streaming champion maintenance: after N micro-batches (full build
    then incremental refreshes of touched buckets only), the maintained
    champion table equals a from-scratch fused build over the final
    blocks under the frozen first-batch epoch — bit-for-bit."""
    import json

    from search_engine_spark.operators.impact import champion_lists_fused
    from search_engine_spark.streaming.stream_champions import (
        run_champion_maintenance,
    )

    docs = load_documents(spark, SF_TEST).filter(F.col("doc_id") < 120)
    landing = str(tmp_path / "landing")
    docs.filter(F.col("doc_id") < 60).select(*STREAM_COLS).coalesce(
        1
    ).write.parquet(landing + "/part1")
    # second batch: new docs PLUS an update of an existing one
    upd = docs.filter(F.col("doc_id") >= 60).select(*STREAM_COLS).union(
        docs.filter(F.col("doc_id") == 3)
        .withColumn("text", F.lit("freshword data data scan"))
        .select(*STREAM_COLS)
    )
    upd.coalesce(1).write.parquet(landing + "/part2")

    store = catalog.IndexStore(
        spark, str(tmp_path / "cidx"), n_buckets=N_BUCKETS
    )
    champs_path = str(tmp_path / "champions")
    stream = (
        spark.readStream.schema(
            load_documents(spark, SF_TEST).select(*STREAM_COLS).schema
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(landing + "/part*")
    )
    run_champion_maintenance(
        stream, store, champs_path, str(tmp_path / "cckpt"),
        budget_per_bucket=8, n_buckets=N_BUCKETS,
    )

    with open(champs_path + "_epoch/stats.json") as fh:
        es = json.load(fh)
    epoch_td = spark.read.parquet(champs_path + "_epoch/term_dict")
    want = sorted(
        tuple(r)
        for r in champion_lists_fused(
            store.read_blocks(), epoch_td, es["n_docs"],
            float(es["avgdl"]), budget_per_bucket=8,
            n_buckets=N_BUCKETS, store_n_buckets=N_BUCKETS,
        ).collect()
    )
    got = sorted(
        tuple(r) for r in spark.read.parquet(champs_path).collect()
    )
    assert got == want and len(got) > 0
    # the epoch froze at batch 1: its stats describe the FIRST batch's
    # corpus, not the final one (stale-idf-until-re-epoch semantics)
    assert es["n_docs"] == 60
    # r05 (r04 ADVICE): publish is a versioned dir + ONE atomic symlink
    # replace — the serving path is a link onto a complete table, and
    # only current+previous generations are retained
    import os

    assert os.path.islink(champs_path)
    assert os.path.exists(os.path.join(champs_path, "_SUCCESS"))
    vdirs = [
        n
        for n in os.listdir(str(tmp_path))
        if n.startswith("champions_v")
    ]
    assert 1 <= len(vdirs) <= 2


def test_write_champions_atomic_publish(spark, tmp_path):
    """_write_champions unit contract: every publish is one symlink
    replace; a reader that resolved the PREVIOUS link keeps its files
    (kept one generation); a leftover tmp link from a crash is
    reclaimed; the legacy real-dir layout upgrades in place."""
    import os

    from search_engine_spark.streaming.stream_champions import (
        _write_champions,
    )

    path = str(tmp_path / "ch")
    t1 = spark.range(3).selectExpr("id", "id * 2 AS v")
    t2 = spark.range(5).selectExpr("id", "id * 3 AS v")
    # legacy layout: a REAL directory at path upgrades to the link
    t1.write.parquet(path)
    assert os.path.isdir(path) and not os.path.islink(path)
    _write_champions(t2, path, 1)
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == 5
    prev_target = os.path.realpath(path)
    # crash leftover: a dangling tmp link must not wedge the publish
    os.symlink("nowhere", path + "_lnk_tmp")
    _write_champions(t1, path, 2)
    assert os.path.islink(path)
    assert spark.read.parquet(path).count() == 3
    # previous generation retained for in-flight readers, then pruned
    assert os.path.isdir(prev_target)
    _write_champions(t2, path, 3)
    assert not os.path.exists(prev_target)
    assert spark.read.parquet(path).count() == 5
    # replay of the SAME batch id after publish writes beside the live
    # dir (…r suffix), never overwriting under readers
    live = os.path.realpath(path)
    _write_champions(t2, path, 3)
    assert os.path.realpath(path) == live + "r"
    assert spark.read.parquet(path).count() == 5
    # DOUBLE replay (r05 self-review): the retained previous generation
    # (live) must survive untouched — the next attempt takes a fresh
    # 'rr' dir instead of overwriting the retained …r or the old base
    retained = os.path.realpath(path)       # …_v3r, now the live gen
    files_before = sorted(os.listdir(retained))
    _write_champions(t2, path, 3)
    assert os.path.realpath(path) == live + "rr"
    assert sorted(os.listdir(retained)) == files_before  # untouched
    assert spark.read.parquet(path).count() == 5
    # sibling-table safety: a table whose name extends ours with a _v
    # suffix must never be pruned by our generation sweep — not its
    # generation dirs, not its LIVE symlink (grammar-matching name!),
    # not a legacy real-dir sibling (no ownership marker)
    sib = path + "_v99"
    t1.write.parquet(sib + "_v1")          # sibling's generation dir
    os.symlink(os.path.basename(sib + "_v1"), sib)  # sibling live link
    legacy_sib = path + "_v77"
    t1.write.parquet(legacy_sib)           # pre-symlink sibling table
    _write_champions(t1, path, 4)
    assert os.path.isdir(sib + "_v1")      # sibling generation intact
    assert os.path.islink(sib)             # sibling live link intact
    assert os.path.isdir(legacy_sib)       # legacy sibling intact
    assert spark.read.parquet(sib).count() == 3
