"""Structured Streaming champion maintenance — near-real-time pruned
serving beside continuous ingestion.

Topology: the same file-source document stream stream_index.py ingests
feeds, per micro-batch, (1) the incremental reindex of the persistent
store and (2) `operators/impact.py::refresh_champions` — a partition-
pruned fused rebuild of ONLY the touched store buckets' champion runs.
The champion table stays query-ready between batches without ever
re-scanning the base index: per-batch champion cost is proportional to
the batch's buckets, exactly like the reindex itself.

EPOCH SEMANTICS (the refresh_champions contract, applied streaming):
impact values depend on global df / avgdl / n_docs, so every refresh
uses the stats + term_dict FROZEN at the first batch (persisted beside
the champion table). The maintained table is therefore pinned equal —
bit-for-bit, by test — to a from-scratch fused champion build over the
CURRENT blocks under the SAME epoch: the incremental path can never
drift from the rebuild. Terms first seen after the epoch have no df in
the epoch dictionary and enter the champion tier at the next re-epoch
(one fused rebuild, 19-29 s at 10M docs — the Lucene stale-idf refresh
cadence); the exact block path always sees them immediately. Serving
consistency note: the two-tier certainty algebra requires champions and
the exact tier to share one epoch — a server that re-epochs swaps both
references together.

Delivery semantics: checkpointed file source = exactly-once batch
tracking; the foreachBatch body is at-least-once on recovery, and both
halves are convergent re-runs (reindex_docs is idempotent per document
set; refresh recomputes touched runs from the already-reindexed blocks,
landing on the same rows). The champion table publishes through
versioned directories + ONE atomic symlink replace (rename(2)), so a
reader or a crash at any instant observes either the previous complete
table or the new one — never a missing or partial table (object-store
deployments use the equivalent manifest-pointer commit, e.g. an Iceberg
snapshot swap).
"""

from __future__ import annotations

import json
import os
import re
import shutil

from pyspark.sql import DataFrame

from ..catalog import IndexStore, build_persistent
from ..operators.impact import (
    CHAMPION_BUDGET,
    champion_lists_fused,
    refresh_champions,
)
from ..operators.incremental import reindex_docs


def _epoch_dir(champions_path: str) -> str:
    return champions_path + "_epoch"


# dot-prefixed so Spark/Hadoop parquet listings ignore it
_GEN_MARKER = ".champion_generation"


def _write_champions(df: DataFrame, champions_path: str,
                     batch_id: int) -> None:
    """Publish via versioned dirs + ONE atomic symlink replace (r04
    ADVICE): the batch writes to `{path}_v{batch}`, then a tmp symlink
    is `os.replace`d onto `{path}` — a single rename(2), so a reader
    (or a crash) at ANY instant sees either the previous complete table
    or the new one, never a missing/partial table. The previous version
    dir is kept one generation (a reader that resolved the old link
    mid-scan keeps its files); older generations are pruned."""
    vdir = f"{champions_path}_v{batch_id}"
    while os.path.exists(vdir):
        # at-least-once replays after crashes write each attempt to a
        # FRESH directory ('r' suffix per attempt) — an existing dir is
        # either the live/retained generation (readers hold it) or a
        # crashed orphan (pruned below once unreferenced); overwriting
        # EITHER in place would pull files out from under readers
        # (r05 self-review: the previous live-link-only check missed
        # the retained-previous-generation case on double replay)
        vdir += "r"
    df.write.parquet(vdir)
    # ownership marker (r05 self-review #2): a sibling TABLE's name can
    # itself match our generation grammar ('champions' beside
    # 'champions_v2'), so name shape alone cannot authorize deletion —
    # only dirs carrying this sentinel (written by us, dot-prefixed so
    # parquet readers ignore it) are ever pruned
    with open(os.path.join(vdir, _GEN_MARKER), "w"):
        pass
    if os.path.islink(champions_path):
        prev = os.path.realpath(champions_path)
    elif os.path.isdir(champions_path):
        # legacy real-dir layout (pre-symlink): move it aside once; the
        # window here is the old two-rename behavior, first swap only
        prev = f"{champions_path}_v{batch_id}_legacy"
        os.rename(champions_path, prev)
        with open(os.path.join(prev, _GEN_MARKER), "w"):
            pass
    else:
        prev = None
    lnk = f"{champions_path}_lnk_tmp"
    if os.path.lexists(lnk):
        os.remove(lnk)
    os.symlink(os.path.basename(vdir), lnk)
    os.replace(lnk, champions_path)  # the one atomic publish
    base = os.path.basename(champions_path)
    parent = os.path.dirname(champions_path) or "."
    keep = {os.path.basename(vdir)}
    if prev is not None:
        keep.add(os.path.basename(prev))
    # prune ONLY this table's generation dirs: the exact name grammar
    # this function emits (_v<batch>, replay 'r' suffixes, the one-time
    # _legacy dir) AND the ownership sentinel AND not a symlink — a
    # SIBLING table named '{base}_v2' matches the grammar with its very
    # own root (live symlink, or legacy real dir), and only the marker
    # distinguishes our orphan from their data (r05 self-review ×2)
    gen_re = re.compile(re.escape(base) + r"_v\d+(?:_legacy|r*)$")
    for name in os.listdir(parent):
        full = os.path.join(parent, name)
        if (
            gen_re.fullmatch(name)
            and name not in keep
            and not os.path.islink(full)
            and os.path.isdir(full)
            and os.path.exists(os.path.join(full, _GEN_MARKER))
        ):
            shutil.rmtree(full)


def run_champion_maintenance(
    stream_df: DataFrame,
    store: IndexStore,
    champions_path: str,
    checkpoint_dir: str,
    budget_per_bucket: int = CHAMPION_BUDGET,
    n_buckets: int | None = None,
    available_now: bool = True,
):
    """Drive a document stream into the store AND keep the champion
    table current. First non-empty batch: full (resumable) build + full
    fused champion build + epoch freeze. Later batches: incremental
    reindex + touched-bucket champion refresh under the frozen epoch.
    Returns the StreamingQuery (awaited when ``available_now``)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        nb = n_buckets if n_buckets is not None else store.n_buckets
        first = not os.path.exists(store.stats_path)
        if first:
            build_persistent(batch_df, store)
            touched = None
        else:
            touched = reindex_docs(store, batch_df)["touched_buckets"]
        epoch = _epoch_dir(champions_path)
        if first or not os.path.exists(f"{epoch}/stats.json"):
            stats = store.read_corpus_stats()
            os.makedirs(epoch, exist_ok=True)
            store.read_term_dict().write.mode("overwrite").parquet(
                f"{epoch}/term_dict"
            )
            with open(f"{epoch}/stats.json", "w") as fh:
                json.dump(
                    {"n_docs": stats["n_docs"], "avgdl": stats["avgdl"]},
                    fh,
                )
        with open(f"{epoch}/stats.json") as fh:
            es = json.load(fh)
        epoch_td = spark.read.parquet(f"{epoch}/term_dict")
        if touched is None or not os.path.exists(
            f"{champions_path}/_SUCCESS"
        ):
            champs = champion_lists_fused(
                store.read_blocks(), epoch_td, es["n_docs"],
                float(es["avgdl"]), budget_per_bucket=budget_per_bucket,
                n_buckets=nb, store_n_buckets=store.n_buckets,
            )
        else:
            current = spark.read.parquet(champions_path)
            champs = refresh_champions(
                current, store.read_blocks(), epoch_td, es["n_docs"],
                float(es["avgdl"]), touched,
                budget_per_bucket=budget_per_bucket, n_buckets=nb,
                store_n_buckets=store.n_buckets,
            )
        _write_champions(champs, champions_path, batch_id)

    writer = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
