"""Result presentation — reference Q7 (title) + Q8 (snippet) as a final
mapInPandas stage over the ≤limit top-k rows.

The reference re-parses stored HTML per result row on the request thread
(services/SearchServiceImpl.java:216-231). Here presentation is a narrow
Arrow-batched stage appended AFTER pagination: the scorer reduces the
corpus to ≤limit rows, those join back to ``documents`` (broadcast of the
tiny hit set — never a shuffle of the corpus), and one mapInPandas pass
computes title + highlighted snippet per row. At 100 TB scale this stage
touches k rows, not the corpus, so its cost is O(k · doc length).

Output mirrors the reference SearchData DTO
(dto/search/SearchData.java:6-13): site, site_name, uri, title, snippet,
relevance.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..textproc.extract import extract_block_text, extract_title
from ..textproc.snippet import WORDS_RANGE_DEFAULT, build_snippet

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("site", T.StringType(), True),
        T.StructField("site_name", T.StringType(), True),
        T.StructField("uri", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("snippet", T.StringType(), True),
        T.StructField("relevance", T.DoubleType(), True),
    ]
)


def present_results(
    docs: DataFrame,
    hits: DataFrame,
    query_lemmas: set[str],
    relevance_col: str = "score",
    words_range: int = WORDS_RANGE_DEFAULT,
) -> DataFrame:
    """hits (doc_id, <relevance_col>) → SearchData rows.

    ``hits`` must already be the paginated top-k (small); it broadcasts into
    the docs join so only matching document rows are read (parquet row-group
    pruning via the join filter under AQE; no corpus shuffle).
    """
    lemmas = frozenset(query_lemmas)
    joined = docs.select(
        "doc_id", "site", "site_key", "path", "html"
    ).join(F.broadcast(hits.select("doc_id", relevance_col)), "doc_id")

    def _present(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue  # mapInPandas declares the schema; yield nothing
            titles, snippets = [], []
            for html in pdf["html"]:
                titles.append(extract_title(html))
                snippets.append(
                    build_snippet(extract_block_text(html), lemmas, words_range)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "site": pdf["site"],
                    "site_name": pdf["site_key"],
                    "uri": pdf["path"],
                    "title": titles,
                    "snippet": snippets,
                    "relevance": pdf[relevance_col].astype("float64"),
                }
            )

    return joined.mapInPandas(_present, schema=RESULT_SCHEMA)


def titles_series(html: pd.Series) -> pd.Series:
    """Vectorized extract_title over a Series of html bytes — pandas .str
    ops end-to-end (no per-row Python loop; this is the corpus-wide path,
    unlike the ≤k presentation rows). Byte-identical to
    textproc.extract.extract_title (pinned by tests + the titles oracle)."""
    from ..textproc.extract import _COMMENT_RE, _ENTITIES, _HWS_RE, _TITLE_RE

    s = html.str.decode("utf-8", errors="replace").fillna("")
    s = s.str.replace(_COMMENT_RE, "", regex=True)
    t = s.str.extract(_TITLE_RE, expand=False).fillna("")
    # SEQUENTIAL replaces in _ENTITIES order, exactly like the scalar
    # _entities: '&amp;' unescapes first, so cascaded entities
    # ('&amp;lt;' -> '&lt;' -> '<') resolve fully. A single-pass regex
    # alternation consumes '&amp;' and never re-matches the '&lt;' it
    # produced — byte-identity with extract_title would break on any
    # double-escaped corpus.
    for k, v in _ENTITIES.items():
        t = t.str.replace(k, v, regex=False)
    return t.str.replace(_HWS_RE, " ", regex=True).str.strip()


def titles(docs: DataFrame) -> DataFrame:
    """Q7 title extraction for every document — (doc_id, title).

    Batch variant used by build-time materialization (the engine stores the
    title at extraction time instead of re-parsing per query, SURVEY §2.D Q7).
    """

    def _titles(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "title": titles_series(pdf["html"]),
                }
            )

    return docs.select("doc_id", "html").mapInPandas(
        _titles, schema="doc_id long, title string"
    )
