"""Exact duplicated-substring detection (ExactSubstr dedup) — the
span-level counterpart to document-level dedup (operators/dedup.py).

Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
Better") showed that training corpora contain long VERBATIM substrings
repeated across otherwise-distinct documents (licenses, boilerplate,
quoted passages) and that removing the duplicated SPANS — not whole
documents — measurably improves LMs. Their implementation builds a
suffix array over the concatenated corpus; that is fundamentally
sequential over a global structure and does not distribute. The
standard distributed reformulation (fixed-width window fingerprints,
as in content-defined-chunking dedup) is what a Spark-first engine
wants:

1. every document emits a fingerprint per WINDOW-token sliding window
   over its retained-token stream (partition-local: a doc never spans
   Arrow batches — zero shuffle, same invariant the fused index build
   uses);
2. a window hash seen under more than one (doc, start) is a duplicate;
   the lexicographically-first occurrence (min (doc_id, start)) is the
   canonical copy (one groupBy(whash) — the only corpus-wide shuffle,
   map-side combinable);
3. per document, overlapping duplicate windows merge into maximal
   spans (gaps-and-islands over a doc_id-keyed window — maximal-
   cardinality partition key, never a global window).

A window of W tokens detects any duplicated run of ≥ W tokens exactly
(every length-W subwindow of the run collides); runs shorter than W are
deliberately below the noise floor — the same W-token threshold knob as
Lee et al.'s min-match-length (they use 50 BPE tokens at corpus scale;
the default here is sized to the test fixture).

Scale notes: windows ≈ n_tokens rows — linear in corpus size, short
rows (doc_id, int, 16-byte hash). At 100 TB the groupBy(whash) shuffle
is the cost center; whash is uniform (md5) so there is NO skew, and
map-side combine collapses each partition's windows before shuffling
(the min-struct + count aggregate is algebraic).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WINDOW = 12

_WIN_SCHEMA = "doc_id long, start long, whash string"


def window_hashes(docs: DataFrame, window: int = WINDOW) -> DataFrame:
    """(doc_id, start, whash) — md5 over each sliding window of `window`
    consecutive retained tokens (space-joined), start = 0-based position
    of the window's first token in the doc's retained-token stream.

    mapInPandas over the 2-column pruned (doc_id, text) scan — positions
    are per-document facts, so no shuffle (cf. positional.build_positional).
    """

    def _gen(batches):
        import hashlib

        import numpy as np

        from ..textproc.fast_tokenize import tokenize_positions_arrays

        for pdf in batches:
            if pdf.empty:
                continue
            d, c, p, vocab = tokenize_positions_arrays(pdf)
            if d.size == 0:
                continue
            run_start = np.empty(d.size, dtype=bool)
            run_start[0] = True
            run_start[1:] = d[1:] != d[:-1]
            starts = np.flatnonzero(run_start)
            ends = np.append(starts[1:], d.size)
            out_d: list[int] = []
            out_s: list[int] = []
            out_h: list[str] = []
            for s0, e0 in zip(starts, ends):
                toks = vocab[c[s0:e0]]
                n = int(e0 - s0)
                doc = int(d[s0])
                for s in range(n - window + 1):
                    h = hashlib.md5(
                        " ".join(toks[s : s + window]).encode("utf-8")
                    ).hexdigest()
                    out_d.append(doc)
                    out_s.append(s)
                    out_h.append(h)
            yield pd.DataFrame(
                {"doc_id": out_d, "start": out_s, "whash": out_h}
            )

    return docs.select("doc_id", "text").mapInPandas(_gen, schema=_WIN_SCHEMA)


def dup_spans(docs: DataFrame, window: int = WINDOW) -> DataFrame:
    """(doc_id, span_start, span_end, n_windows) — maximal merged spans of
    duplicated windows per document, EXCLUDING each window-hash's canonical
    first occurrence (min (doc_id, start)): exactly the text a span-dedup
    pass would delete. span bounds are inclusive token positions."""
    w = window_hashes(docs, window)
    firsts = w.groupBy("whash").agg(
        F.min(F.struct("doc_id", "start")).alias("keeper"),
        F.count("*").alias("cnt"),
    )
    dup = (
        w.join(firsts.filter(F.col("cnt") > 1), "whash")
        .filter(
            (F.col("doc_id") != F.col("keeper.doc_id"))
            | (F.col("start") != F.col("keeper.start"))
        )
        .select("doc_id", "start")
    )
    win = Window.partitionBy("doc_id").orderBy("start")
    prev_max = F.max("start").over(
        win.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = dup.withColumn(
        "new_island",
        F.when(
            prev_max.isNull() | (F.col("start") > prev_max + (window - 1)), 1
        ).otherwise(0),
    )
    islands = flagged.withColumn(
        "island",
        F.sum("new_island").over(win.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy("doc_id", "island")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + (window - 1)).alias("span_end"),
            F.count("*").alias("n_windows"),
        )
        .select("doc_id", "span_start", "span_end", "n_windows")
    )


def remove_dup_spans(docs: DataFrame, window: int = WINDOW) -> DataFrame:
    """(doc_id, clean_text, n_removed) — the retained-token reconstruction
    of each document with its duplicated spans deleted (the Lee et al.
    "drop the span, keep the first occurrence" edit, expressed over the
    token stream; exact byte-level splicing would need char offsets, which
    the tokenizer deliberately does not preserve).

    Plan: spans explode to (doc_id, pos) delete-keys; the positional
    relation anti-joins them away; per-doc sort-rebuild via max_by-free
    array_sort on (pos, term) structs — one doc-keyed shuffle."""
    from .positional import build_positional

    spans = dup_spans(docs, window)
    kill = spans.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("span_start"), F.col("span_end"))
        ).alias("pos"),
    )
    pos = build_positional(docs)
    kept = pos.join(kill, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("clean_text")
    )
    n_removed = spans.groupBy("doc_id").agg(
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("n_removed")
    )
    # anchor on the document spine, NOT on `rebuilt`: a doc whose entire
    # token stream was a duplicated span has zero kept rows, so rebuilt
    # has no row for it — it must still come back as clean_text='' with
    # its full removal count, not silently vanish
    spine = pos.select("doc_id").distinct()
    return (
        spine.join(rebuilt, "doc_id", "left")
        .join(n_removed, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_removed", F.lit(0)).cast("long").alias("n_removed"),
        )
    )
