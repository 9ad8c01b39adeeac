"""Front-coded term-dictionary blocks — Lucene .tim-style prefix
compression for the dictionary tier.

The term dictionary of a web-scale index is millions of strings that
share long prefixes (inflections, url-ish tokens, numbered entities).
Lucene's BlockTree terms dictionary stores them in sorted blocks with
FRONT CODING (Witten/Moffat/Bell, "Managing Gigabytes" §4.1): the first
term of each block is stored whole; every following term stores only
(lcp, suffix) where lcp is the longest-common-prefix length with its
PREDECESSOR. Lookups binary-search block heads (all heads sorted), then
decode one ≤block_size run — so the dictionary supports point probes and
ordered iteration while paying ~one suffix per term of storage.

Spark shape:

  * global sorted rank WITHOUT a global window: the same distributed
    zip-with-index as reorder.py (range-repartition by term, per-
    partition row_number, driver-side per-partition offsets — bounded by
    partition count, never by vocabulary);
  * encode: one applyInPandas over block_id groups (bounded: block_size
    rows each) — the per-block sequential lcp fold is exactly the shape
    the posting-block codec already uses;
  * decode: fully DECLARATIVE — F.aggregate folds (lcp, suffix) pairs
    back into terms inside codegen, then one explode. Decode carries no
    Python, so query-side consumers (dictionary probes) stay JVM-only.

Pinned by the `dict_blocks_roundtrip` oracle pair (decode∘encode ==
term_dict, verified value-hash-identical against the DuckDB dictionary)
and tests/test_dictionary.py (block layout, lcp correctness, measured
compression on the fixture vocabulary).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BLOCK_SIZE = 16

BLOCKS_SCHEMA = (
    "block_id long, n_terms int, head string, "
    "lcps array<int>, suffixes array<string>, "
    "dfs array<long>, cfs array<long>, "
    "raw_bytes long, coded_bytes long"
)


def front_code(terms: list[str]):
    """Pure front coder for ONE sorted block → (head, lcps, suffixes,
    raw_bytes, coded_bytes). coded_bytes counts head + per-follower
    (1-byte lcp field + utf-8 suffix) — the on-disk layout's size."""
    head = terms[0]
    lcps, suffixes = [], []
    raw = sum(len(t.encode("utf-8")) for t in terms)
    coded = len(head.encode("utf-8"))
    for prev, cur in zip(terms, terms[1:]):
        n = min(len(prev), len(cur))
        lcp = 0
        while lcp < n and prev[lcp] == cur[lcp]:
            lcp += 1
        lcps.append(lcp)
        suffixes.append(cur[lcp:])
        coded += 1 + len(cur[lcp:].encode("utf-8"))
    return head, lcps, suffixes, raw, coded


def front_decode(head: str, lcps: list[int], suffixes: list[str]) -> list[str]:
    """Pure inverse of front_code — the same fold decode_front_blocks
    states declaratively (hypothesis pins the pair on arbitrary input)."""
    out = [head]
    for lcp, suf in zip(lcps, suffixes):
        out.append(out[-1][:lcp] + suf)
    return out


def term_ranks(term_dict: DataFrame, n_parts: int | None = None) -> DataFrame:
    """(term, df, cf, rank) — rank is the 0-based position of the term in
    global lexicographic order, assigned by the distributed zip-with-index
    (range partition → local row_number → per-partition offsets)."""
    spark = term_dict.sparkSession
    if n_parts is None:
        n_parts = spark.sparkContext.defaultParallelism
    ranged = (
        term_dict.repartitionByRange(n_parts, F.col("term"))
        .withColumn("_pid", F.spark_partition_id())
    )
    w = Window.partitionBy("_pid").orderBy(F.col("term"))
    local = ranged.withColumn("_rn", F.row_number().over(w)).persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_col = F.element_at(
        F.create_map(
            *[F.lit(x) for pid in sorted(offsets) for x in (pid, offsets[pid])]
        ),
        F.col("_pid"),
    )
    return local.select(
        "term", "df", "cf",
        (off_col + F.col("_rn") - 1).cast("long").alias("rank"),
    )


def front_code_blocks(
    term_dict: DataFrame, block_size: int = BLOCK_SIZE
) -> DataFrame:
    """term_dict (term, df, cf) → front-coded dictionary blocks."""
    ranked = term_ranks(term_dict).select(
        "term", "df", "cf",
        (F.col("rank") / block_size).cast("long").alias("block_id"),
        (F.col("rank") % block_size).cast("int").alias("slot"),
    )

    def _encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("slot")
        terms = pdf["term"].tolist()
        head, lcps, suffixes, raw, coded = front_code(terms)
        return pd.DataFrame(
            {
                "block_id": [int(pdf["block_id"].iloc[0])],
                "n_terms": [len(terms)],
                "head": [head],
                "lcps": [lcps],
                "suffixes": [suffixes],
                "dfs": [pdf["df"].tolist()],
                "cfs": [pdf["cf"].tolist()],
                "raw_bytes": [raw],
                "coded_bytes": [coded],
            }
        )

    return ranked.groupBy("block_id").applyInPandas(
        _encode, schema=BLOCKS_SCHEMA
    )


def decode_front_blocks(blocks: DataFrame) -> DataFrame:
    """blocks → (term, df, cf): the declarative inverse — an in-codegen
    fold over (lcp, suffix) pairs, then one explode. Bit-exact inverse of
    front_code_blocks (pinned by the roundtrip oracle pair)."""
    pairs = F.arrays_zip(F.col("lcps").alias("l"), F.col("suffixes").alias("s"))
    terms = F.aggregate(
        pairs,
        F.array(F.col("head")),
        lambda acc, x: F.concat(
            acc,
            F.array(
                F.concat(
                    F.element_at(acc, -1).substr(F.lit(1), x["l"]),
                    x["s"],
                )
            ),
        ),
    )
    row = F.explode(
        F.arrays_zip(
            terms.alias("term"),
            F.col("dfs").alias("df"),
            F.col("cfs").alias("cf"),
        )
    ).alias("r")
    return blocks.select(row).select(
        F.col("r.term").alias("term"),
        F.col("r.df").cast("long").alias("df"),
        F.col("r.cf").cast("long").alias("cf"),
    )


# -------------------------------------------------- trigram substring index

def term_trigram_index(term_dict: DataFrame) -> DataFrame:
    """(gram, term, df) — the character-3-gram inverted index over the
    term dictionary: the data structure inside Elasticsearch's
    `wildcard` FIELD type (Lucene: a trigram index accelerates
    leading-wildcard/substring patterns that would otherwise force a
    full dictionary scan). Terms shorter than 3 chars emit their whole
    form as their single gram so they stay findable.

    Scale shape: |term|−2 rows per dictionary term — a few× the
    dictionary, tiny next to postings; persisted gram-bucketed so a
    pattern's gram probe prunes to a handful of buckets instead of
    scanning the 10^9-term web dictionary."""
    grams = F.when(
        F.length("term") < 3, F.array(F.col("term"))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length("term") - 2),
            lambda i: F.col("term").substr(i, F.lit(3)),
        )
    )
    return (
        term_dict.select(
            "term", "df", F.explode(F.array_distinct(grams)).alias("gram")
        )
        .select("gram", "term", "df")
    )


def substring_candidates(
    term_dict: DataFrame, pattern: str, max_expansions: int = 128
) -> DataFrame:
    """Dictionary terms CONTAINING `pattern` → (term, df), term asc,
    capped at max_expansions — the spec is a plain contains() scan; this
    path computes the SAME set through the trigram index (conjunctive
    gram probe → verification), which is the point: the accelerator is
    provably lossless because every term containing the pattern contains
    all of the pattern's trigrams (necessary), and contains() verifies
    the survivors (sufficient). Patterns shorter than 3 chars cannot use
    the index and fall back to the scan."""
    pat = pattern.strip().lower()
    if len(pat) < 3:
        return (
            term_dict.filter(F.col("term").contains(pat))
            .select("term", "df")
            .orderBy(F.col("term").asc())
            .limit(int(max_expansions))
        )
    pgrams = sorted({pat[i : i + 3] for i in range(len(pat) - 2)})
    idx = term_trigram_index(term_dict)
    cand = (
        idx.filter(F.col("gram").isin(pgrams))
        .groupBy("term", "df")
        .agg(F.count_distinct("gram").alias("ng"))
        .filter(F.col("ng") == len(pgrams))
    )
    return (
        cand.filter(F.col("term").contains(pat))
        .select("term", "df")
        .orderBy(F.col("term").asc())
        .limit(int(max_expansions))
    )


def search_substring(
    postings: DataFrame,
    term_dict: DataFrame,
    doc_stats: DataFrame,
    n_docs: int,
    avgdl: float,
    pattern: str,
    k1: float = 1.2,
    b: float = 0.75,
    limit: int = 20,
    max_expansions: int = 128,
) -> DataFrame:
    """Substring ("infix wildcard", `*pat*`) query → BM25 top-k
    (doc_id, score): expand via the trigram-accelerated candidate set,
    then score the expansion disjunctively — identical rewrite shape to
    `search_wildcard`, but the dictionary probe touches only the
    pattern's gram buckets instead of LIKE-scanning the dictionary. The
    DuckDB oracle states the SPEC (plain LIKE '%pat%' scan), so parity
    proves the accelerated path lossless."""
    from .search import search_bm25

    matched = [
        r["term"]
        for r in substring_candidates(
            term_dict, pattern, max_expansions
        ).collect()
    ]
    return search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, matched,
        k1=k1, b=b, limit=limit, conjunctive=False,
    )
