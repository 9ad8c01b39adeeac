"""BPE tokenizer training over the corpus — the pair-count inner loop
and the iterative merge learner.

Training a subword tokenizer is a first-class corpus job in any LLM data
pipeline (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"; the same loop under GPT-2's byte-level BPE
and SentencePiece's BPE mode). The reference engine has no tokenizer
training (its analyzer is dictionary morphology, SURVEY §2.T), so this
is a pipeline-tier addition like dedup/sampling — Spark-first, not a
port.

Why it scales: after ONE corpus pass (the surface-token groupBy), every
further step — including every one of the N merge iterations — operates
on the DISTINCT-WORD frequency table, which is vocabulary-bound
(Heaps' law: ~10^7–10^8 rows at 100 TB, vs 10^13 token occurrences).
This is the classic map-reduce BPE formulation: corpus → word-frequency
table once, then merge steps never touch the corpus again.

  * `word_freqs`   — the one corpus-scale pass (surface tokens, NO
                     lemmatization: tokenizer training wants raw forms).
  * `bpe_pairs`    — weighted adjacent-symbol-pair counts (the argmax
                     candidate table of one merge step); oracle-paired.
  * `bpe_learn`    — N greedy merges; each iteration is one vocab-bound
                     Spark job (explode pairs → count → argmax) plus a
                     codegen'd left-to-right merge rewrite (higher-order
                     aggregate — no UDF, no corpus re-scan, no collect
                     of the vocabulary). Driver state per step: ONE row
                     (the argmax pair).

Determinism: ties on pair count break lexicographically (pair asc) —
both the operator and the pure-Python twin the tests pin against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freqs(docs: DataFrame) -> DataFrame:
    """(word, c) — surface-token frequencies: the single corpus-scale
    pass (map-side-combinable count on the exploded token stream)."""
    from ..functions.text_columns import explode_terms

    return (
        explode_terms(docs, lemmatize=False)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count("*").cast("long").alias("c"))
    )


def _pairs_from_symbols(symbols_col):
    """Explodeable array of adjacent symbol pairs ('a|b' joined — '|'
    cannot occur inside a token, so the join is unambiguous). Guarded
    for single-symbol arrays (fully merged words): Spark's
    sequence(1, 0) auto-infers a DESCENDING step and emits [1, 0], so
    the n >= 2 branch is load-bearing, not cosmetic."""
    n = F.size(symbols_col)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(symbols_col, i),
                F.lit("|"),
                F.element_at(symbols_col, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pairs(docs: DataFrame, k: int = 50) -> DataFrame:
    """(pair, n) — the top-k adjacent CHARACTER pairs by
    occurrence-weighted count over the corpus's surface tokens: the
    candidate table whose argmax is BPE's first merge. pair is the two
    symbols joined with '|' (e.g. 'a|b'); n sums the containing word's
    corpus frequency per adjacent occurrence (a word with 'aa a'
    repeated contributes per occurrence AND per position). Top-k by
    (n desc, pair asc) — the learner's tiebreak, made visible.

    Plan: one corpus pass (word_freqs), then everything is
    vocabulary-bound: chars via split(word, ''), pairs via a codegen'd
    sequence/transform (no UDF), one map-side-combinable sum, top-k as
    TakeOrderedAndProject. Single-character words contribute nothing
    (sequence(1, 0) is empty)."""
    wf = word_freqs(docs).filter(F.length("word") >= 2)
    chars = F.split(F.col("word"), "")
    pairs = wf.select(
        F.explode(_pairs_from_symbols(chars)).alias("pair"),
        F.col("c"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(int(k))
    )


def _merge_expr(symbols_col, a: str, b: str):
    """Left-to-right greedy merge of adjacent (a, b) → a+b inside a
    symbol array, as ONE higher-order aggregate (no UDF): fold the
    symbols, and when the accumulator's last element is `a` and the
    incoming symbol is `b`, replace the last element with the merged
    symbol. Overlaps resolve left-first automatically ('aaa' under
    (a,a) → [aa, a]) because the merged last element no longer equals
    `a`."""
    merged = a + b
    return F.aggregate(
        symbols_col,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == a)
            & (s == b),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def apply_merges(
    wf: DataFrame,
    merges: list[tuple[str, str]],
    checkpoint_every: int = 16,
    reliable_dir: str | None = None,
) -> DataFrame:
    """(syms, c) — the word table with the learned merges applied in
    training order (BPE encoding is replaying merges by priority,
    Sennrich'16 §3). Each merge is one codegen'd fold over the
    vocab-bound frame; every `checkpoint_every` merges the plan is cut
    with an eager checkpoint so the chained-select tree never grows
    past a bounded depth (1000-merge vocabularies would otherwise
    stress codegen with a 1000-deep expression tree).

    Checkpoint flavor (r05 self-review, both directions): the default
    localCheckpoint's blocks are ContextCleaner-released when the
    frame is garbage-collected, so repeated encodes leak nothing — a
    persist() here would pin one vocab-scale frame per call for the
    session's lifetime. The cost is recoverability: localCheckpoint
    blocks have no lineage, so an executor lost mid-encode fails the
    job (Spark documents it unsafe under dynamic allocation). A
    cluster deployment with executor churn passes `reliable_dir` (an
    HDFS/object-store path) to use RELIABLE checkpoints instead —
    survives any executor loss; cleanup follows
    `spark.cleaner.referenceTracking.cleanCheckpoints` or the
    deployment's checkpoint-dir retention."""
    cur = wf.select(F.split(F.col("word"), "").alias("syms"), "c")
    if reliable_dir is not None:
        cur.sparkSession.sparkContext.setCheckpointDir(reliable_dir)
    for i, m in enumerate(merges):
        a, b = m[0], m[1]
        cur = cur.select(
            _merge_expr(F.col("syms"), a, b).alias("syms"), "c"
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < len(merges):
            cur = (
                cur.checkpoint(eager=True)
                if reliable_dir is not None
                else cur.localCheckpoint(eager=True)
            )
    return cur


def bpe_vocab(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(subword, n) — the occurrence-weighted subword histogram of the
    corpus encoded under the learned merges: the tokenizer's effective
    vocabulary usage (what a tokenizer-fertility report draws). All
    vocab-bound after the one corpus pass inherited from word_freqs."""
    enc = apply_merges(word_freqs(docs), merges)
    return (
        enc.select(F.explode("syms").alias("subword"), "c")
        .groupBy("subword")
        .agg(F.sum("c").cast("long").alias("n"))
    )


def bpe_token_counts(
    docs: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(doc_id, n_subwords) — per-document token count under the
    learned BPE vocabulary: the pipeline's cost model for sequence
    packing / token budgeting (operators/export.py consumes exactly
    this shape). The encoded word table is vocabulary-bound, so it
    BROADCASTS into the corpus-scale token stream — the corpus side
    never shuffles."""
    from ..functions.text_columns import explode_terms

    # merges only ever CONCATENATE adjacent symbols, so joining the
    # encoded symbols back with '' reconstructs the original word
    # exactly: the broadcastable (word -> n_sub) map needs no side
    # channel to carry the key through the replay
    word_map = apply_merges(word_freqs(docs), merges).select(
        F.array_join("syms", "").alias("word"),
        F.size("syms").cast("long").alias("n_sub"),
    )
    toks = explode_terms(docs, lemmatize=False)
    return (
        toks.join(F.broadcast(word_map), toks["term"] == word_map["word"])
        .groupBy("doc_id")
        .agg(F.sum("n_sub").cast("long").alias("n_subwords"))
    )


def bpe_learn(docs: DataFrame, n_merges: int = 10) -> list[tuple[str, str, int]]:
    """Learn `n_merges` BPE merges → [(a, b, count), ...] in merge
    order. Greedy argmax per step over the weighted pair counts; ties
    break on the joined 'a|b' pair string ascending (binary UTF-8
    order — identical in Spark and the pure-Python twin).

    Each iteration runs on the persisted vocabulary-bound word table:
    explode pairs → count → ONE collected argmax row → rewrite the
    symbol arrays with the codegen'd merge fold. The corpus is read
    exactly once, the driver holds one row per step, and the rewrite
    is a narrow map — the map-reduce BPE loop, expressed in DataFrame
    ops end to end. Stops early if no pair remains (vocabulary fully
    merged)."""
    wf = (
        word_freqs(docs)
        .filter(F.length("word") >= 2)
        .select(F.split(F.col("word"), "").alias("syms"), "c")
        .persist()
    )
    merges: list[tuple[str, str, int]] = []
    cur = wf
    try:
        for _ in range(int(n_merges)):
            top = (
                cur.select(
                    F.explode(
                        _pairs_from_symbols(F.col("syms"))
                    ).alias("pair"),
                    "c",
                )
                .groupBy("pair")
                .agg(F.sum("c").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair").asc())
                .limit(1)
                .collect()
            )
            if not top:
                break
            a, b = top[0]["pair"].split("|", 1)
            merges.append((a, b, int(top[0]["n"])))
            nxt = cur.select(
                _merge_expr(F.col("syms"), a, b).alias("syms"), "c"
            ).persist()
            nxt.count()  # materialize before dropping the parent cache
            if cur is not wf:
                cur.unpersist()
            cur = nxt
    finally:
        if cur is not wf:
            cur.unpersist()
        wf.unpersist()
    return merges
