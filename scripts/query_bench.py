"""Concurrent-query benchmark: QPS + latency percentiles on a warm index.

The north metric is "BM25 query p50 latency"; single-query walls are in
bench.py. This measures the serving shape: a fixed mixed query set fired
from a thread pool against ONE warm engine (Spark schedules concurrent
jobs from driver threads; the cached, doc_bucket-partitioned index makes
every query a shuffle-free scan, so concurrent queries share executor
cores without queueing on exchanges).

Usage: python scripts/query_bench.py [n_docs] [cpus] [threads] [rounds] [fifo|fair]
`fair` turns on spark.scheduler.mode=FAIR with one pool per client
thread — jobs from different clients share cores instead of queueing in
submission order, trading p50 for tail fairness under load.
Prints one JSON line: {qps, p50, p95, serial_p50, ...}.
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

QUERY_MIX = [
    ("data fast join", {}),
    ("dup scan merge", {}),
    ("data fast", {"mode": "compat"}),
    ("data fast", {"site_key": "site-b"}),
    ("data fast join", {"limit": 10, "offset": 10}),
    ("merge data", {}),
    ("fast table", {}),
    ("dup data", {}),
]


def pctl(xs: list[float], q: float) -> float:
    xs = sorted(xs)
    i = min(len(xs) - 1, max(0, int(round(q * (len(xs) - 1)))))
    return round(xs[i], 4)


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2_560_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    threads = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 8
    sched = sys.argv[5] if len(sys.argv) > 5 else "fifo"

    from search_engine_spark.engine import SearchEngine
    from search_engine_spark.session import get_spark
    from search_engine_spark.sources.documents import load_documents

    extra = (
        {"spark.scheduler.mode": "FAIR"} if sched == "fair" else None
    )
    spark = get_spark(
        app_name=f"qbench[{cpus}]", parallelism=cpus,
        shuffle_partitions=cpus, extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    mult = max(1, n_docs // 5000)
    docs = load_documents(spark, "/root/testdata/sf0.1", multiply=mult)
    eng = SearchEngine(spark, docs=docs, n_buckets=max(cpus, 16))
    eng.build()
    eng.blocks.count()

    def one(args):
        q, kw = args
        if sched == "fair":
            spark.sparkContext.setLocalProperty(
                "spark.scheduler.pool", f"client-{threading.get_ident()}"
            )
        t0 = time.perf_counter()
        eng.search(q, limit=kw.get("limit", 20), **{
            k: v for k, v in kw.items() if k != "limit"
        }).collect()
        return time.perf_counter() - t0

    # warm every query once
    for qa in QUERY_MIX:
        one(qa)

    # serial baseline: p50 over the mix, one at a time
    serial = [one(qa) for qa in QUERY_MIX for _ in range(2)]

    # concurrent: `threads` client threads, `rounds` full mixes each
    work = [qa for _ in range(rounds) for qa in QUERY_MIX]
    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=threads) as ex:
        lat = list(ex.map(one, work))
    wall = time.perf_counter() - t0

    print(json.dumps({
        "metric": "concurrent_query_suite",
        "scheduler": sched,
        "n_docs": n_docs, "cpus": cpus, "threads": threads,
        "n_queries": len(work),
        "qps": round(len(work) / wall, 2),
        "wall_sec": round(wall, 2),
        "p50_sec": pctl(lat, 0.50),
        "p95_sec": pctl(lat, 0.95),
        "serial_p50_sec": pctl(serial, 0.50),
    }), flush=True)


if __name__ == "__main__":
    main()
