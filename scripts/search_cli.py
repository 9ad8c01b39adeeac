#!/usr/bin/env python
"""spark-submit entry point — query a persisted index.

    spark-submit --py-files search_engine_spark.zip scripts/search_cli.py \
        --index-dir /data/index --input /data/sfX \
        --query "fast data" [--mode bm25|compat] [--site site-b]
        [--limit 20] [--offset 0] [--presented]

Prints the reference-shaped JSON envelope {result, count, data[]} when
--presented (title + highlighted snippet per hit), else the raw
(doc_id, score) rows.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index-dir", required=True)
    ap.add_argument("--input", help="documents dir (needed for --presented)")
    ap.add_argument("--query", required=True)
    ap.add_argument("--mode", default="bm25", choices=["bm25", "compat"])
    ap.add_argument("--site")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--offset", type=int, default=0)
    ap.add_argument("--presented", action="store_true")
    args = ap.parse_args()
    if args.presented and not args.input:
        ap.error("--presented requires --input (documents dir for title/snippet)")

    spark = (
        SparkSession.builder.appName("search-engine-query")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    from search_engine_spark.engine import SearchEngine

    eng = SearchEngine.open(spark, args.index_dir, sf_dir=args.input)
    if args.presented:
        page = eng.search_page(
            args.query, mode=args.mode, site_key=args.site,
            limit=args.limit, offset=args.offset,
        )
        print(json.dumps(page, ensure_ascii=False))
    else:
        rows = eng.search(
            args.query, mode=args.mode, site_key=args.site,
            limit=args.limit, offset=args.offset,
        ).collect()
        print(json.dumps([r.asDict() for r in rows]))


if __name__ == "__main__":
    main()
