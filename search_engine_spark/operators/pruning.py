"""Static index pruning — keep only each term's top-N highest-impact
postings (Carmel et al., SIGIR 2001, "Static Index Pruning for
Information Retrieval Systems").

A pruned index answers top-k queries from a fraction of the posting
volume: for k ≪ N the true top-k documents of a term are almost always
within that term's N highest-tf postings, so the pruned index trades
bounded tail error for a hard per-term size cap — the classic
first-tier index in a tiered-serving architecture (tier 1: pruned,
serves most queries; tier 2: full, catches the miss tail).

Impact order pinned here: tf desc, doc_id asc (deterministic; with the
engine's BM25 the per-term score is monotone in tf given dl, so tf is
the standard impact proxy without baking scoring params into the
index).

Skew note — the whole point of the implementation shape: "top-N per
term" over a head-term (df ~ corpus size) cannot be a term-partitioned
window (one straggler partition) nor a naive groupBy(term) collect.
Two-phase selection bounds both sides:

  phase 1  groupBy(term, doc_bucket): per-shard top-N (group size ≤
           term df / n_buckets — the same doc-bucket sharding salt the
           fused index build uses);
  phase 2  groupBy(term): merge the ≤ n_buckets partial lists of ≤ N
           entries each — bounded by n_buckets·N rows per term no
           matter how common the term is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PRUNE_KEEP = 10
N_BUCKETS = 16


def prune_postings(
    postings: DataFrame, keep: int = PRUNE_KEEP, n_buckets: int = N_BUCKETS
) -> DataFrame:
    """(doc_id, term, tf) — the postings relation restricted to each
    term's top-`keep` postings by (tf desc, doc_id asc)."""
    s = F.struct(
        (-F.col("tf")).alias("neg_tf"),
        F.col("doc_id").alias("doc_id"),
        F.col("tf").alias("tf"),
    )
    phase1 = (
        postings.withColumn("doc_bucket", F.pmod(F.col("doc_id"), F.lit(n_buckets)))
        .groupBy("term", "doc_bucket")
        .agg(F.slice(F.array_sort(F.collect_list(s)), 1, keep).alias("part"))
    )
    phase2 = (
        phase1.select("term", F.explode("part").alias("s"))
        .groupBy("term")
        .agg(F.slice(F.array_sort(F.collect_list("s")), 1, keep).alias("top"))
    )
    return phase2.select("term", F.explode("top").alias("s")).select(
        F.col("s.doc_id").alias("doc_id"), "term", F.col("s.tf").alias("tf")
    )
