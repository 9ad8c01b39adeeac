"""Drift-controlled scaling pairs: interleave the two parallelism levels.

The single-shot 2-core/8-core pairs in BENCH/BASELINE.md run the levels
~25 minutes apart, so slow host-speed drift lands entirely on one level
(the post-EF refresh documented exactly that pathology). This harness
runs ROUNDS of back-to-back (local[2] build, local[8] build) on the same
input — within a round the levels sit minutes apart, so drift slower
than a round cancels in the per-round throughput ratio; the median ratio
over rounds is the reported figure and the per-round spread is the error
bar.

Each level is a fresh pinned JVM (taskset, same core sets as
scripts/scaling_bench.py), ONE build per level per round (pairing
replaces best-of-2).

Usage: python scripts/interleaved_scaling.py [n_docs] [rounds]
Prints one JSON line per level-run, then a summary line.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

LEVELS = ((2, "0-1"), (8, "0-7"))

RUNNER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from search_engine_spark.session import get_spark
from search_engine_spark.sources.documents import load_documents

cpus = int(sys.argv[1]); mult = int(sys.argv[2])
spark = get_spark(app_name=f"il[{{cpus}}]", parallelism=cpus,
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
docs = load_documents(spark, "/root/testdata/sf0.1", multiply=mult)
docs.count()
from search_engine_spark.engine import SearchEngine
# warm-up build at 1/8 input: python workers, codegen, Arrow paths all
# spin up OFF the clock, so the timed build measures warm capability
# (the same thing bench.py's best-of-2 min measures) without paying a
# second full build per level.
warm_docs = load_documents(spark, "/root/testdata/sf0.1",
                           multiply=max(1, mult // 8))
SearchEngine(spark, docs=warm_docs, n_buckets=max(cpus, 16)) \
    .build().blocks.count()
spark.catalog.clearCache()
docs.count()
t0 = time.perf_counter()
eng = SearchEngine(spark, docs=docs, n_buckets=max(cpus, 16))
eng.build()
eng.blocks.count()
dt = time.perf_counter() - t0
print(json.dumps({{"cpus": cpus, "build_sec": round(dt, 2),
                   "docs": eng.n_docs,
                   "docs_per_sec": round(eng.n_docs / dt, 1)}}))
"""


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 5_120_000
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    mult = max(1, n_docs // 5000)
    runner = RUNNER.format(repo=REPO)
    ratios = []
    for rnd in range(rounds):
        tp = {}
        for cpus, cores in LEVELS:
            out = subprocess.run(
                ["taskset", "-c", cores, sys.executable, "-c", runner,
                 str(cpus), str(mult)],
                capture_output=True, text=True, cwd=REPO,
            )
            line = [l for l in out.stdout.splitlines()
                    if l.startswith("{")][-1]
            rec = json.loads(line)
            rec["round"] = rnd
            print(json.dumps(rec), flush=True)
            tp[cpus] = rec["docs_per_sec"]
        ratios.append(tp[8] / tp[2])
        print(json.dumps({"round": rnd,
                          "ratio_8_over_2": round(ratios[-1], 3),
                          "efficiency": round(ratios[-1] / 4.0, 3)}),
              flush=True)
    ratios.sort()
    med = ratios[len(ratios) // 2]
    print(json.dumps({
        "summary": "interleaved_scaling",
        "n_docs": n_docs, "rounds": rounds,
        "median_ratio": round(med, 3),
        "median_efficiency": round(med / 4.0, 3),
        "ratio_spread": [round(ratios[0], 3), round(ratios[-1], 3)],
    }), flush=True)


if __name__ == "__main__":
    main()
