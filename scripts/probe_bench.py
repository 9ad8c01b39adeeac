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
    # --diverse: break the multiply corpus's perfect-copy score ties by
    # deterministically truncating each copy's text to a doc_id-keyed
    # length (40..2271 chars). The stock multiply corpus is thousands of
    # IDENTICAL texts, so per term the whole champion prefix ties at one
    # impact value and certainty can never close (cutoff == max impact)
    # — the adversarial worst case for two-tier serving. The diverse
    # variant restores the score spread a real corpus has, where the
    # certainty algebra is supposed to (and measurably does) settle most
    # buckets without rescope.
    diverse = "--diverse" in sys.argv
    argv = [a for a in sys.argv if a != "--diverse"]
    n_docs = int(argv[1]) if len(argv) > 1 else 10_240_000
    cpus = int(argv[2]) if len(argv) > 2 else 8
    rounds = int(argv[3]) if len(argv) > 3 else 7
    base = 5_000  # sf0.1 documents rows; scaled via load_documents multiply
    multiply = max(1, n_docs // base)
    suffix = "_div" if diverse else ""
    index_dir = (
        argv[4]
        if len(argv) > 4
        else f"/tmp/spark_graft_probe_idx_{base * multiply}{suffix}"
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
        from pyspark.sql import functions as F

        t0 = time.time()
        docs = load_documents(spark, sf_dir, multiply=multiply)
        if diverse:
            docs = docs.withColumn(
                "text",
                F.substring(
                    F.col("text"),
                    1,
                    (40 + F.pmod(F.col("doc_id"), 97) * 23).cast("int"),
                ),
            )
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

    # ---- champion-list serving (Anh-Moffat pruned impact index) ----
    # The head-term probe above is decode-bound on the matched posting
    # mass; the champion table bounds per-query work by |q|·buckets·
    # budget rows regardless of df. Built once at index time, probed
    # with the same pushed-In scan; quality reported as top-k overlap
    # vs the exact blocks path.
    from search_engine_spark.operators import impact as imp

    # Champion build FOLDED onto the persisted index (r03-verdict #3),
    # final form: champion_lists_fused runs ONE applyInPandas pass over
    # the compressed block store (numpy decode + quantize + top-budget
    # select; dl from dl_bytes, df via vocab-scale join). No
    # re-tokenize, no corpus scan, no postings groupBy, no corpus-scale
    # window — the r03 path paid all four and cost 292 s; measured
    # 19-29 s here.
    champ_path = f"{index_dir}/champions"
    champ_build_sec = None
    if not os.path.exists(champ_path + "/_SUCCESS"):
        t0 = time.time()
        (
            imp.champion_lists_fused(
                eng.store.read_blocks(),
                eng.store.read_term_dict(),
                stats["n_docs"],
                float(stats["avgdl"]),
                n_buckets=32,
                store_n_buckets=32,
            )
            .repartition(1)
            .sortWithinPartitions("term", "doc_bucket")
            .write.mode("overwrite")
            .parquet(champ_path)
        )
        champ_build_sec = round(time.time() - t0, 2)
    out["champ_build_sec"] = champ_build_sec
    # NO impacts parquet: the exact tier and the quality reference derive
    # impacts ON DEMAND from the committed block store itself
    # (impacts_from_blocks: pushed In(term) block scan -> decode with dl
    # -> in-plan quantize) -- at 10^12 docs a second postings-sized
    # impacts table is exactly the artifact you do not want to write.
    store_blocks = eng.store.read_blocks()
    store_td = eng.store.read_term_dict()

    def impacts_for(terms):
        return imp.impacts_from_blocks(
            store_blocks, store_td, stats["n_docs"],
            float(stats["avgdl"]), terms=terms,
        )
    champions = spark.read.parquet(champ_path)
    out["champ_rows"] = champions.count()

    def probe_champ(terms: list[str]):
        t0 = time.time()
        rows = imp.search_champions(champions, terms, k=20).collect()
        return time.time() - t0, rows

    # Quality reference: the EXACT integer ranking over the full impact
    # table (same quantization, same tie-break) — isolates the champion
    # PRUNING loss; quantization-vs-float fidelity is pinned separately
    # (tests/test_impact.py::test_search_impact_topk_tracks_exact_bm25).
    # NOTE the multiply corpus is thousands of identical shifted copies,
    # so top-20 ids are pure tie-breaks among equal scores — id overlap
    # understates quality; the score-mass ratio (champion top-20 summed
    # TRUE integer score / exact top-20 summed score) is the honest
    # retrieval-quality number on this input.
    def exact_int_top(terms: list[str]):
        return imp.search_impact(impacts_for(terms), terms, k=20).collect()

    probe_champ(QUERIES["3term"])  # warm footers
    for label, terms in QUERIES.items():
        walls = []
        rows = []
        for _ in range(rounds):
            w, rows = probe_champ(terms)
            walls.append(w)
        out[f"champ_p50_{label}"] = round(statistics.median(walls), 4)
        exact = exact_int_top(terms)
        # true integer scores of the champion-returned ids: one pruned
        # scan filtered to 20 ids (never a sentinel-huge top-k limit —
        # TakeOrdered allocates an O(k) heap per task)
        from pyspark.sql import functions as F

        ids = [r["doc_id"] for r in rows]
        true_rows = (
            impacts_for(terms).filter(
                F.col("term").isin(sorted(set(terms)))
                & F.col("doc_id").isin(ids)
            )
            .groupBy("doc_id")
            .agg(F.sum("impact").cast("bigint").alias("score_q"))
            .collect()
        )
        exact_by_id = {r["doc_id"]: r["score_q"] for r in true_rows}
        out[f"champ_overlap20_{label}"] = len(
            {r["doc_id"] for r in rows} & {r["doc_id"] for r in exact}
        )
        got_mass = sum(exact_by_id.get(r["doc_id"], 0) for r in rows)
        true_mass = sum(r["score_q"] for r in exact)
        out[f"champ_scoremass_{label}"] = (
            round(got_mass / true_mass, 4) if true_mass else 1.0
        )
        out[f"champ_maxerr_{label}"] = max(
            (r["error_ub"] for r in rows), default=0
        )
    # ---- composed two-tier serve (champions + maybe-band rescope) ----
    # The r03-verdict #1 composition: exact-by-construction (pinned by
    # the search_two_tier oracle pair), measured here against the
    # champion-only probe to price the exactness. The rescope set is
    # whatever the certainty algebra leaves open at this corpus/budget.
    def probe_two_tier(terms: list[str]) -> float:
        t0 = time.time()
        imp.search_two_tier(
            impacts_for(terms), champions, terms, k=20, n_buckets=32,
            impacts_bucket_n=32,
        ).collect()
        return time.time() - t0

    probe_two_tier(QUERIES["3term"])  # warm
    for label, terms in QUERIES.items():
        walls = [probe_two_tier(terms) for _ in range(rounds)]
        out[f"twotier_p50_{label}"] = round(statistics.median(walls), 4)
        d: dict = {}  # diag pass OUTSIDE the timed probes (extra jobs)
        imp.search_two_tier(
            impacts_for(terms), champions, terms, k=20, n_buckets=32,
            diag=d, impacts_bucket_n=32,
        ).collect()
        out[f"twotier_rescope_buckets_{label}"] = len(
            d.get("rescope_buckets", [])
        )
        out[f"twotier_maybe_docs_{label}"] = d.get("n_maybe_rescoped", 0)

    out.update(
        {
            "n_docs": stats["n_docs"],
            "cpus": cpus,
            "rounds": rounds,
            "index_dir": index_dir,
            "diverse": diverse,
            "metric": "persisted_probe_latency",
            "unit": "sec",
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
