#!/usr/bin/env python
"""Persisted-index probe latency (r02-verdict item #5).

The warm-cache serving path is measured in bench.py / query_bench.py;
this measures the PERSISTED path a fresh executor takes: no Spark-side
.cache(), every query reads the parquet block table through the pushed
``In(term, …)`` filter (blocks are written sortWithinPartitions(term),
so row-group min/max stats skip non-matching groups) and the engine's
driver-cached dictionary supplies the idf map without a Spark job —
exactly the plan PLANS.md §3 argues probes O(q · blocks_per_term) bytes
on a 10^12-doc index. The reference's instrumented surface is this
interactive search latency (services/SearchServiceImpl.java:96-108).

Usage:
    python scripts/probe_bench.py [n_docs] [cpus] [rounds] [index_dir]

Defaults: 10,240,000 docs (sf0.1 × SPARK_GRAFT_MULTIPLY=2048), 8 cpus,
7 rounds, index at /tmp/spark_graft_probe_idx_<docs> (built on first
run, reused after — the build is the expensive part). Prints one JSON
line: {"p50_1term": …, "p50_2term": …, "p50_3term": …, "cold_first": …,
"build_sec": …} with per-query wall seconds, p50 over rounds.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERIES = {
    "1term": ["data"],
    "2term": ["data", "fast"],
    "3term": ["data", "fast", "join"],
}


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_240_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 7
    base = 5_000  # sf0.1 documents rows; scaled via load_documents multiply
    multiply = max(1, n_docs // base)
    index_dir = (
        sys.argv[4]
        if len(sys.argv) > 4
        else f"/tmp/spark_graft_probe_idx_{base * multiply}"
    )

    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.operators import search as se
    from search_engine_spark.operators import wand
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.documents import load_documents

    spark = get_spark(parallelism=cpus, shuffle_partitions=cpus)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    build_sec = None
    if not os.path.exists(f"{index_dir}/corpus_stats.json"):
        t0 = time.time()
        docs = load_documents(spark, sf_dir, multiply=multiply)
        eng = SearchEngine(spark, docs=docs, n_buckets=32)
        eng.index_dir = index_dir
        eng.build_persistent()
        build_sec = round(time.time() - t0, 2)

    # serve from the persisted store: stats + dictionary load ONCE at
    # open (the engine's normal open-time work), then every query is a
    # pushed-filter parquet probe with zero Spark jobs before the scan
    eng = SearchEngine.open(spark, index_dir, sf_dir=sf_dir)
    stats = eng.store.read_corpus_stats()
    blocks = eng.store.read_blocks()  # NOT .cache(): the probe path

    def probe(terms: list[str]) -> float:
        t0 = time.time()
        dfm = eng._dict_probe(terms)  # driver dict lookup (no job)
        idf = {
            t: se.bm25_idf(float(stats["n_docs"]), float(df))
            for t, df in dfm.items()
        }
        if idf:
            wand.topk_blocks(
                blocks,
                None,
                sorted(idf),
                mode="bm25",
                idf=idf,
                avgdl=float(stats["avgdl"]),
                limit=20,
                conjunctive=True,
            ).collect()
        return time.time() - t0

    cold_first = round(probe(QUERIES["3term"]), 4)  # first-touch footers
    out = {"cold_first": cold_first, "build_sec": build_sec}
    for label, terms in QUERIES.items():
        walls = [probe(terms) for _ in range(rounds)]
        out[f"p50_{label}"] = round(statistics.median(walls), 4)
        out[f"min_{label}"] = round(min(walls), 4)
    out.update(
        {
            "n_docs": stats["n_docs"],
            "cpus": cpus,
            "rounds": rounds,
            "index_dir": index_dir,
            "metric": "persisted_probe_latency",
            "unit": "sec",
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
