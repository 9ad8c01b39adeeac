"""Deterministic adversarial corpus shared by tests and scripts/oracle_sweep.

The driver fixtures are single-line punctuation-free ASCII word soup;
this corpus is what real Common-Crawl text looks like on a bad day —
Unicode whitespace (NBSP, thin, ideographic), CRLF/tabs, punctuation,
apostrophes, Cyrillic (the ru morphology path), CJK + emoji, accents,
empty / whitespace-only / NULL text, a 2400-word document, html-ish angle
brackets, and a doc_id at the multiply-stride boundary.

`build_adversarial_dir` stages a full sf-style directory: the adversarial
documents.parquet plus symlinks to every other sf0.001 table, so ANY
contract query (including embeddings/TPC-H-backed ones) can run against it.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF_BASE = "/root/testdata/sf0.001"

ADV_DOCS = [
    # (doc_id, text, lang) — doc_ids hit every derived-column branch:
    # %3 site spread, %5/%7 raw_url variants, %53 http_code error slices.
    (0, "alpha beta gamma nbsp joined words", "en"),
    (1, "thin space and　ideographic　space tokens", "en"),
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
    (105, "another error-slice member for the status queries", "en"),
    (9_999_999, "largest doc id below the multiply stride", "en"),
    # gopher_rules probes (width-4 derived lines): bullet-led chunks,
    # ellipsis-ended chunks, symbol dumps, numeric gibberish
    (21, "- item one here - item two too - item three ok", "en"),
    (22, "these words trail off... and then resume again later…", "en"),
    (23, "### #tag # hash # dump # everywhere # now", "en"),
    (24, "12345 67890 11111 22222 33333 44444 55555 66666", "en"),
]

DOCUMENTS_VIEW_SQL = (
    "CREATE OR REPLACE VIEW documents AS SELECT doc_id,"
    " coalesce(text, '') AS text, lang, source, n_chars FROM '{path}'"
)


def build_adversarial_dir(d: str, sf_base: str = SF_BASE) -> str:
    """Write documents.parquet from ADV_DOCS into `d` and symlink every
    other table from `sf_base` so the full contract surface runs."""
    os.makedirs(d, exist_ok=True)
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
    pq.write_table(table, os.path.join(d, "documents.parquet"))
    for fn in os.listdir(sf_base):
        if fn.endswith(".parquet") and fn != "documents.parquet":
            dst = os.path.join(d, fn)
            if not os.path.exists(dst):
                os.symlink(os.path.join(sf_base, fn), dst)
    return d


def register_oracle_views(con, d: str) -> None:
    """Re-point the `documents` view at the normalized adversarial parquet
    (mirrors sources/documents.py::load_documents' NULL-text coalesce —
    the engine's single NULL boundary)."""
    con.execute(
        DOCUMENTS_VIEW_SQL.format(path=os.path.join(d, "documents.parquet"))
    )
