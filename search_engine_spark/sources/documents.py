"""Documents source — the engine's input table.

BASELINE.json input_hint wants an Iceberg table of Common-Crawl-style pages
``(url, warc_ts, html, text, lang)``. The sandbox testdata provides
``documents.parquet`` with ``(doc_id, text, lang, source, n_chars)``; per
FIXTURES.md §7 the web-page columns are derived **deterministically** from
``doc_id`` + ``text`` so tests/bench need no external data. The same
derivations are emitted as DuckDB SQL (functions/oracle_fragments.py) so
oracle queries see identical values.

Derivations (frozen):
  site_key  = 'site-' || chr(97 + doc_id % 3)          → site-a/b/c
  site      = 'https://' || site_key || '.example'
  path      = '/docs/' || doc_id
  url       = site || path
  raw_url   = un-normalized variant exercising the URL normalizer (S4):
              mixed case '/Docs/', trailing '/' when doc_id%5=0,
              '?ref=track' when doc_id%7=0
  warc_ts   = epoch 1704067200 + 60·doc_id (2024-01-01 UTC + doc_id min;
              built via timestamp_seconds so it is session-TZ-independent)
  html      = deterministic page wrapper around ``text`` (title = 'Doc <id>')
              such that textproc.extract.extract_text(html) == text
              (the byte-identical invariant; golden-tested)

At 100 TB scale ``documents`` would be an Iceberg table bucket-partitioned by
``bucket(url)``; here it is a plain parquet read (catalog.py provides the
Iceberg-style layout for the derived index tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SITES = ("site-a", "site-b", "site-c")


def site_key_col(doc_id="doc_id"):
    return F.concat(F.lit("site-"), F.char(F.col(doc_id) % 3 + 97))


def required_matches_col(doc_id="doc_id"):
    """Per-document minimum-should-match field for the terms_set query
    (Elasticsearch's minimum_should_match_field), derived
    deterministically (FIXTURES pattern): 1 + doc_id % 3 ∈ {1,2,3}.
    Mirrored as REQUIRED_MATCHES_SQL in oracle_fragments.py."""
    return (F.col(doc_id) % 3 + 1).cast("int")


def http_code_col(doc_id="doc_id"):
    """S2 fetch-status classification, derived deterministically (FIXTURES
    pattern): most pages 200; sparse slices model the reference's stored
    error codes — HTTP error (404, PageAnalyzer.java:550-558), unsupported
    MIME (415, :560-567), unknown failure (500, :541-548), and the
    in-flight sentinel (102, :449-456)."""
    d = F.col(doc_id) % 53
    return (
        F.when(d == 13, F.lit(404))
        .when(d == 27, F.lit(415))
        .when(d == 41, F.lit(500))
        .when(d == 50, F.lit(102))
        .otherwise(F.lit(200))
    )


def parseable_documents(docs: DataFrame) -> DataFrame:
    """Reference Page.canBeParsed gate (model/Page.java:62-64: non-blank
    content) composed with the status classification: only fetched-OK,
    non-empty pages feed the analyzer (PageAnalyzer only lemmatizes pages
    whose fetch succeeded — :541-567 stores the code and skips analysis)."""
    return docs.filter(
        (F.col("http_code") == 200) & (F.trim(F.col("text")) != "")
    )


def html_col(doc_id="doc_id", text="text"):
    """Deterministic HTML wrapper (binary). extract_text() inverts it."""
    return F.encode(
        F.concat(
            F.lit("<html><head><title>Doc "),
            F.col(doc_id).cast("string"),
            F.lit("</title><script>var x=1;</script></head><body><p>"),
            F.col(text),
            F.lit("</p></body></html>"),
        ),
        "utf-8",
    )


def load_documents(
    spark: SparkSession, sf_dir: str, multiply: int = 1
) -> DataFrame:
    """Read documents.parquet and attach the derived web-page columns.

    ``multiply`` generates k shifted copies of the corpus (doc_id offset
    by i·10^7 per copy, derived columns recomputed) — the bench harness
    uses it to scale the SAME input generator up until the build is
    compute-bound, which is what the N-vs-4N scaling measurement needs
    (fixed session/scheduling overheads would otherwise dominate). The
    copies come from ONE broadcast cross-join against spark.range(k):
    the base corpus is read and decompressed once and each task emits
    its copies JVM-side, partitioned by the range (a k-branch union plan
    re-scanned the parquet k times — measured ~half the pack-stage wall
    at k=512 — and its giant plan stressed codegen)."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # input normalization, pinned here as the engine's single NULL
    # boundary: a Common-Crawl record with a missing text conversion is
    # an EMPTY page, not a NULL that poisons concat/tokenize downstream
    # (html_col's concat would return NULL html for the whole row).
    # Every derived column and operator may therefore assume text IS NOT
    # NULL; oracle mirrors coalesce identically at view registration.
    df = df.withColumn("text", F.coalesce(F.col("text"), F.lit("")))
    if multiply > 1:
        # the copy stride must exceed every base doc_id or copies collide
        # and duplicate ids silently corrupt index builds (segment ingest
        # requires globally unique ids); the base frame is broadcast-small
        # by construction, so the one-off max() is cheap
        top = df.agg(F.max("doc_id").alias("m")).collect()[0]["m"] or 0
        if top >= 10_000_000:
            raise ValueError(
                f"multiply stride 10_000_000 <= max base doc_id {top}; "
                f"copies would collide"
            )
        n_parts = spark.sparkContext.defaultParallelism * 4
        copies = spark.range(
            0, multiply, numPartitions=min(multiply, n_parts)
        ).withColumnRenamed("id", "_copy")
        df = (
            copies.crossJoin(F.broadcast(df))
            .withColumn("doc_id", F.col("doc_id") + F.col("_copy") * 10_000_000)
            .drop("_copy")
        )
    site_key = site_key_col()
    site = F.concat(F.lit("https://"), site_key, F.lit(".example"))
    path = F.concat(F.lit("/docs/"), F.col("doc_id").cast("string"))
    raw_path = F.concat(
        F.lit("/Docs/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("/")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 7 == 0, F.lit("?ref=track")).otherwise(F.lit("")),
    )
    return (
        df.withColumn("site_key", site_key)
        .withColumn("site", site)
        .withColumn("path", path)
        .withColumn("url", F.concat(site, path))
        .withColumn("raw_url", F.concat(site, raw_path))
        .withColumn(
            # epoch-seconds construction, NOT a string cast: a string
            # literal parses in spark.sql.session.timeZone, which the
            # driver's session may not pin to UTC — the oracle's
            # 1704067200 + 60*doc_id arithmetic must hold regardless.
            "warc_ts",
            F.timestamp_seconds(F.lit(1704067200) + F.col("doc_id") * 60),
        )
        .withColumn("html", html_col())
        .withColumn("http_code", http_code_col())
    )


def load_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")
