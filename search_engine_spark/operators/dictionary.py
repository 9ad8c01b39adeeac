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
