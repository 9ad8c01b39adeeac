"""Head-term skew bounds (SURVEY §7 step 5 — bucketing IS the salt) and
spark-submit entry-point smoke tests."""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_head_term_skew_bounded_by_bucket(spark):
    """A term occurring in 90% of documents may not produce any
    applyInPandas group larger than its bucket's doc count: the document
    shard is the salt, so the hottest (bucket, term) group is bounded by
    |bucket|, not by the term's global df."""
    n_docs, n_buckets = 1000, 16
    rows = [
        (i, "head common words" if i % 10 else "rare tail words")
        for i in range(n_docs)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from search_engine_spark.operators.blocks import build_posting_blocks
    from search_engine_spark.operators.index_build import build_postings

    postings = build_postings(docs)
    blocks = build_posting_blocks(postings, n_buckets)
    per_group = (
        blocks.groupBy("doc_bucket", "term")
        .agg(F.sum("count").alias("n_postings"))
        .collect()
    )
    bucket_cap = math.ceil(n_docs / n_buckets)
    worst = max(r["n_postings"] for r in per_group)
    assert worst <= bucket_cap
    # the head term exists in (almost) every bucket — spread, not hot-spotted
    head_buckets = {r["doc_bucket"] for r in per_group if r["term"] == "head"}
    assert len(head_buckets) == n_buckets


@pytest.mark.slow
def test_build_and_search_cli_end_to_end(tmp_path):
    """scripts/build_index.py then scripts/search_cli.py in fresh
    interpreters (the spark-submit surface, run with plain python)."""
    idx = str(tmp_path / "cli_idx")
    env = dict(os.environ, PYTHONPATH=REPO)
    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "build_index.py"),
            "--input", "/root/testdata/sf0.001", "--index-dir", idx,
            "--n-buckets", "8", "--groups", "2",
        ],
        capture_output=True, text=True, timeout=600, env=env, check=True,
    )
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 500 and len(report["built_buckets"]) == 8

    out = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "search_cli.py"),
            "--index-dir", idx, "--input", "/root/testdata/sf0.001",
            "--query", "data fast", "--mode", "compat", "--limit", "5",
            "--presented",
        ],
        capture_output=True, text=True, timeout=600, env=env, check=True,
    )
    page = json.loads(out.stdout.strip().splitlines()[-1])
    assert page["result"] is True and page["count"] > 0
    assert 0 < len(page["data"]) <= 5
    hit = page["data"][0]
    assert hit["relevance"] == 1.0
    assert "<b>" in hit["snippet"]


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(tmp_path):
    """The north-rule deployment path, literally: `spark-submit --py-files
    dist/search_engine_spark.zip` for build then query, launched from a
    cwd OUTSIDE the repo with no PYTHONPATH, so every engine import must
    resolve from the shipped zip alone (not the source tree)."""
    import shutil

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
    )
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit launcher not on this host")
    zpath = os.path.join(REPO, "dist", "search_engine_spark.zip")
    idx = str(tmp_path / "ss_idx")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    common = [spark_submit, "--master", "local[8]", "--py-files", zpath]
    out = subprocess.run(
        common
        + [
            os.path.join(REPO, "scripts", "build_index.py"),
            "--input", "/root/testdata/sf0.001", "--index-dir", idx,
            "--n-buckets", "4", "--groups", "2",
        ],
        capture_output=True, text=True, timeout=600, env=env, check=True,
        cwd=str(tmp_path),
    )
    report = json.loads(out.stdout.strip().splitlines()[-1])
    assert report["n_docs"] == 500 and len(report["built_buckets"]) == 4

    out = subprocess.run(
        common
        + [
            os.path.join(REPO, "scripts", "search_cli.py"),
            "--index-dir", idx, "--input", "/root/testdata/sf0.001",
            "--query", "data fast", "--mode", "compat", "--limit", "5",
            "--presented",
        ],
        capture_output=True, text=True, timeout=600, env=env, check=True,
        cwd=str(tmp_path),
    )
    page = json.loads(out.stdout.strip().splitlines()[-1])
    assert page["result"] is True and page["count"] > 0
    assert 0 < len(page["data"]) <= 5 and "<b>" in page["data"][0]["snippet"]


def test_dist_zip_matches_source_tree():
    """ADVICE r01: the committed spark-submit artifact must not go stale —
    every member of dist/search_engine_spark.zip must be byte-identical to
    the tracked source file, and every source .py must be present."""
    import os
    import zipfile

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(root, "dist", "search_engine_spark.zip")
    assert os.path.exists(zpath), "dist artifact missing — run scripts/package.sh"
    with zipfile.ZipFile(zpath) as z:
        members = {n for n in z.namelist() if n.endswith(".py")}
        for name in members:
            src = os.path.join(root, name)
            assert os.path.exists(src), f"{name} in zip but not in tree"
            with open(src, "rb") as f:
                assert f.read() == z.read(name), f"stale zip member: {name}"
    src_files = set()
    for dirpath, _, files in os.walk(os.path.join(root, "search_engine_spark")):
        if "__pycache__" in dirpath:
            continue
        for fn in files:
            if fn.endswith(".py"):
                rel = os.path.relpath(os.path.join(dirpath, fn), root)
                src_files.add(rel.replace(os.sep, "/"))
    assert src_files == members, (
        f"zip out of sync: missing={sorted(src_files - members)} "
        f"extra={sorted(members - src_files)}"
    )


def test_temperature_sample_balances_and_is_deterministic(spark):
    from search_engine_spark.operators.sampling import temperature_sample
    from search_engine_spark.sources.documents import load_documents

    from tests.conftest import SF_TEST

    docs = load_documents(spark, SF_TEST)
    natural = dict(
        (r["lang"], r["count"]) for r in docs.groupBy("lang").count().collect()
    )
    out = temperature_sample(docs, temperature=2.0)
    kept = dict(
        (r["lang"], r["count"]) for r in out.groupBy("lang").count().collect()
    )
    dominant = max(natural, key=natural.get)
    # the dominant language is downsampled; clamped strata keep everything
    assert kept[dominant] < natural[dominant]
    for lang, n in natural.items():
        assert kept.get(lang, 0) <= n
    # rare-language share increases vs natural
    total_n, total_k = sum(natural.values()), sum(kept.values())
    rare = min(natural, key=natural.get)
    assert kept[rare] / total_k > natural[rare] / total_n
    # deterministic: same membership on re-evaluation
    ids1 = {r["doc_id"] for r in out.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in temperature_sample(docs, temperature=2.0)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2


def test_weighted_sample_biases_toward_heavy_docs(spark):
    """A-ES: inclusion is weight-proportional — the heavy half of the
    corpus must dominate the sample; the draw is deterministic."""
    from search_engine_spark.operators.sampling import weighted_sample

    rows = [(i, 1000 if i < 50 else 10) for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = {r["doc_id"] for r in weighted_sample(docs, n=30).collect()}
    heavy = sum(1 for d in got if d < 50)
    assert len(got) == 30
    assert heavy >= 25  # 100:1 weight ratio → overwhelmingly heavy docs
    again = {r["doc_id"] for r in weighted_sample(docs, n=30).collect()}
    assert again == got


def test_small_qty_revenue_equals_naive_correlated(spark):
    """The decorrelated plan must equal the naive per-row correlated
    subquery computed in pandas."""
    from search_engine_spark.operators.relational import small_quantity_revenue
    from tests.conftest import SF_TEST

    got = small_quantity_revenue(spark, SF_TEST).collect()[0]["avg_yearly"]

    li = spark.read.parquet(f"{SF_TEST}/lineitem.parquet").toPandas()
    part = spark.read.parquet(f"{SF_TEST}/part.parquet").toPandas()
    keys = set(part[part.p_brand == "Brand#1"].p_partkey)
    avg = li.groupby("l_partkey")["l_quantity"].mean()
    sel = li[li.l_partkey.isin(keys)
             & (li.l_quantity < 0.2 * li.l_partkey.map(avg))]
    assert got == round(float(sel.l_extendedprice.sum()) / 7.0, 2)
