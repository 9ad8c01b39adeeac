"""Skew-salt A/B: measure the doc_bucket salt's effect on the fused build.

The fused build keys its one wide shuffle by (doc_bucket, term); the
doc_bucket is the salt that bounds every merge group by the bucket's doc
count (fused_build.py module docstring). This script measures the build
with the salt ON (n_buckets = 16) and OFF (n_buckets = 1) on two corpora:

- fixture: the synthetic web corpus (Zipf-ish head terms, vocab >> cores)
- adversarial: every document is the same two retained terms, so the
  UNSALTED build has exactly 2 merge groups — fewer groups than cores,
  the degenerate head-term topology a 10^12-doc crawl presents for terms
  like 'the' (df ~ N).

Usage: python scripts/skew_bench.py [n_docs] [cpus]
Prints one JSON line per (corpus, n_buckets) config.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_once(docs, n_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from search_engine_spark.operators import fused_build as fb

    t0 = time.perf_counter()
    packed = fb.pack_documents(docs, n_buckets).cache()
    packed.count()
    pack_sec = time.perf_counter() - t0

    t1 = time.perf_counter()
    blocks = fb.blocks_from_packed(packed)
    n_blocks = blocks.count()
    merge_sec = time.perf_counter() - t1

    groups = (
        packed.filter(F.col("kind") == "post")
        .groupBy("doc_bucket", "term")
        .agg(F.sum("n").alias("rows"))
    )
    stats = groups.agg(
        F.count("*").alias("n_groups"),
        F.max("rows").alias("max_group_rows"),
    ).collect()[0]
    packed.unpersist()
    return {
        "pack_sec": round(pack_sec, 2),
        "merge_sec": round(merge_sec, 2),
        "total_sec": round(pack_sec + merge_sec, 2),
        "n_blocks": n_blocks,
        "n_groups": stats["n_groups"],
        "max_group_rows": stats["max_group_rows"],
    }


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_560_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from pyspark.sql import functions as F

    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.documents import load_documents

    spark = get_spark(
        app_name=f"skew[{cpus}]", parallelism=cpus, shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")

    mult = max(1, n_docs // 5000)  # sf0.1 = 5000 base docs
    fixture = load_documents(spark, "/root/testdata/sf0.1", multiply=mult)
    adversarial = (
        spark.range(n_docs, numPartitions=cpus * 4)
        .select(
            F.col("id").alias("doc_id"),
            F.lit("data fast data fast data fast data fast").alias("text"),
        )
    )
    for corpus_name, docs in (("fixture", fixture), ("adversarial", adversarial)):
        docs.count()  # warm the source
        for n_buckets in (16, 1):
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                r = build_once(docs, n_buckets)
                if best is None or r["total_sec"] < best["total_sec"]:
                    best = r
            best.update(
                corpus=corpus_name, n_buckets=n_buckets,
                n_docs=docs.count(), cpus=cpus,
            )
            print(json.dumps(best), flush=True)


if __name__ == "__main__":
    main()
