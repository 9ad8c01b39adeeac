#!/usr/bin/env python
"""spark-submit entry point — full (resumable) index build.

    spark-submit --py-files search_engine_spark.zip scripts/build_index.py \
        --input /data/sfX --index-dir /data/index \
        [--n-buckets 4096] [--groups 16] [--multiply 1]

Run locally the same way with plain ``python`` (falls back to local[*]).
Re-running after a failure resumes: committed buckets are skipped via the
manifest (catalog.build_persistent). Exit code 0 only after the dictionary
phase commits.
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="dir with documents.parquet")
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--n-buckets", type=int, default=32)
    ap.add_argument("--groups", type=int, default=1,
                    help="checkpoint granularity: commit units per build")
    ap.add_argument("--multiply", type=int, default=1)
    args = ap.parse_args()

    # under spark-submit the master comes from the launcher; standalone runs
    # fall back to local[*]
    spark = (
        SparkSession.builder.appName("search-engine-build")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark import catalog
    from search_engine_spark.sources.documents import load_documents

    docs = load_documents(spark, args.input, multiply=args.multiply)
    store = catalog.IndexStore(spark, args.index_dir, n_buckets=args.n_buckets)
    t0 = time.perf_counter()
    report = catalog.build_persistent(docs, store, groups=args.groups)
    wall = round(time.perf_counter() - t0, 2)
    stats = store.read_corpus_stats()
    print(json.dumps({**report, "wall_sec": wall, **stats}))


if __name__ == "__main__":
    main()
