"""Adversarial-corpus oracle parity.

The driver fixtures (`/root/testdata/sf*`) are single-line, punctuation-free
ASCII word soup, so fixture-parity alone cannot catch Spark-vs-DuckDB
divergence on the characters real Common-Crawl text is full of (ADVICE r01
flagged exactly this for Unicode whitespace). This test builds a
deterministic corpus of edge-case documents — NBSP/thin/ideographic spaces,
tabs/CRLF, punctuation, apostrophes, Cyrillic (the morphology path), CJK,
accents, empty / whitespace-only / NULL text, a 2400-word document, html-ish
angle brackets — and re-runs a cross-section of the contract's
(queries, oracle_sql) pairs on it. Parity must hold on THIS corpus exactly
as on the fixtures: same three-implementation frozen spec, nastier input.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import compare_frames, make_duckdb

import __spark_entry__ as entrymod

ADV_DOCS = [
    # (doc_id, text, lang) — doc_ids hit every derived-column branch:
    # %3 site spread, %5/%7 raw_url variants, %53 http_code error slices.
    (0, "alpha beta gamma nbsp joined words", "en"),
    (1, "thin space and　ideographic　space tokens", "en"),
    (2, "one\ttwo\nthree\r\nfour  five   six", "en"),
    (3, "Hello, world! It's a test-case; (parens) \"quotes\" end.", "en"),
    (4, "быстрый поиск данных и запросы работают хорошо", "ru"),
    (5, "Spark СПАРК Data ДАННЫЕ Mixed СмЕшАнНыЙ", "ru"),
    (6, "", "en"),
    (7, "   \t   ", "en"),
    (8, "data", "en"),
    (9, "data data data data data", "en"),
    (10, "abc123 456 7x 99.5 v2.0 x_y __dunder__", "en"),
    (11, " ".join(["data fast query"] * 800), "en"),
    (12, "<b>bold</b> & <i>ital</i> five > four < six", "en"),
    (13, "café naïve résumé über façade", "fr"),
    (14, "数据 快速 检索 データ 高速 🚀 검색 엔진", "zh"),
    (15, "it's don't o'clock rock'n'roll 'quoted'", "en"),
    (16, "trailing space ", "en"),
    (17, " leading space", "en"),
    (18, "UPPER CASE SHOUTING WORDS", "en"),
    (19, "hyphen-ated words co-operate re-index", "en"),
    (20, None, "en"),
    (26, "duplicate of doc nine: data data data data data", "en"),
    (27, "dead page content behind an error code", "en"),
    (35, "page at a raw-url with trailing slash", "en"),
    (49, "page at a raw-url with tracking query", "en"),
    (52, "last id of the http_code modulus cycle", "en"),
    (105, "a second 404 slice member (105 % 53 == 52... no, 13-ish)", "en"),
    (9_999_999, "largest doc id below the multiply stride", "en"),
]

# Documents-only contract queries spanning the pipeline: build, dictionary,
# text stats, curation, dedup, URL handling, search (some legitimately
# return 0 rows here — 0-vs-0 with matching schema is still parity).
ADV_QUERIES = [
    "postings",
    "term_dict",
    "term_dict_site",
    "doc_stats",
    "titles",
    "lang_id",
    "token_counts",
    "quality_scores",
    "fingerprints",
    "line_dedup",
    "dedup_exact",
    "minhash",
    "simhash",
    "url_normalize",
    "status_filter",
    "surt_keys",
    "c4_clean",
    "repetition_stats",
    "dl_histogram",
    "search_bm25",
    "search_and2",
    "search_site",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial_sf")
    rows = [
        {
            "doc_id": i,
            "text": t,
            "lang": lang,
            "source": f"adv{i % 4}",
            "n_chars": len(t) if t is not None else 0,
        }
        for i, t, lang in ADV_DOCS
    ]
    table = pa.Table.from_pandas(
        pd.DataFrame(rows),
        schema=pa.schema(
            [
                ("doc_id", pa.int64()),
                ("text", pa.string()),
                ("lang", pa.string()),
                ("source", pa.string()),
                ("n_chars", pa.int64()),
            ]
        ),
        preserve_index=False,
    )
    pq.write_table(table, os.path.join(str(d), "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def adv_oracle(adv_dir):
    con = make_duckdb(adv_dir)
    # mirror the engine's input normalization (sources/documents.py::
    # load_documents coalesces NULL text to '' at its single NULL
    # boundary): shadow the raw parquet view with the normalized one.
    con.execute("DROP VIEW documents")
    con.execute(
        "CREATE VIEW documents AS SELECT doc_id, coalesce(text, '') AS text,"
        " lang, source, n_chars FROM"
        f" '{os.path.join(adv_dir, 'documents.parquet')}'"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_adversarial_parity(name, spark, adv_dir, adv_oracle):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    compare_frames(q(spark, adv_dir), adv_oracle.sql(sql))
