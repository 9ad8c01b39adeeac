"""Frozen lemma dictionary — the engine's T4/T5 morphology surface.

The reference lemmatizes with Lucene-morphology (Russian + English analyzers,
pom.xml:60-84): a word is looked up, Russian first then English
(services/LemmasFinder.java:350-358), and the FIRST normal form wins
(``normalForms.get(0)``, services/LemmasFinder.java:327-342) — e.g.
``tested -> test`` but ``testing -> testing`` (first of [testing, test]).

Per SURVEY.md §7 step 1 this engine ships its own frozen, versioned
dictionary instead of a morphology library: a finite ``{inflected: normal}``
map with identity fallback for unknown words. The same mapping is emitted
three ways so all engines agree bit-for-bit:

  * ``lemma()``           — pure Python (unit tests, driver-side query analysis,
                            snippet highlighting)
  * ``lemma_col()``       — Spark column expression (literal map lookup; stays
                            inside whole-stage codegen — at cluster scale a
                            larger dictionary would become a broadcast join
                            against a dictionary table instead)
  * ``lemma_case_sql()``  — DuckDB oracle fragment (CASE/VALUES join)

Stop-POS filtering (PARTICLES, services/LemmasFinder.java:19) is modeled by
the frozen stopword list (textproc/stopwords.py): those words are "not
fitting" and never lemmatize, matching isFittingWord=false semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DICT_VERSION = 1

# inflected (lowercase) -> first normal form (lowercase). Both sides must be
# valid tokens of the tokenizer (letters + interior hyphens only).
LEMMA_MAP: dict[str, str] = {
    # --- English: plural nouns ---
    "tables": "table",
    "rows": "row",
    "columns": "column",
    "keys": "key",
    "values": "value",
    "parts": "part",
    "queries": "query",
    "joins": "join",
    "scans": "scan",
    "merges": "merge",
    "batches": "batch",
    "streams": "stream",
    "windows": "window",
    "groups": "group",
    "filters": "filter",
    "sorts": "sort",
    "lines": "line",
    "customers": "customer",
    "orders": "order",
    "hashes": "hash",
    "indexes": "index",
    "indices": "index",
    "engines": "engine",
    "pages": "page",
    "sites": "site",
    "words": "word",
    "tests": "test",
    # --- English: verb forms (first-normal-form rule: the inflected form
    # itself is kept when it is also a lemma, e.g. testing) ---
    "tested": "test",
    "testing": "testing",  # first normal form of 'testing' is 'testing'
    "scanned": "scan",
    "scanning": "scanning",
    "merged": "merge",
    "merging": "merging",
    "joined": "join",
    "sorted": "sort",
    "filtered": "filter",
    "grouped": "group",
    "hashed": "hash",
    "indexed": "index",
    "searched": "search",
    "searches": "search",
    # --- English: comparatives / misc ---
    "faster": "fast",
    "fastest": "fast",
    "bigger": "big",
    "biggest": "big",
    "smaller": "small",
    "smallest": "small",
    "slower": "slow",
    "slowest": "slow",
    # --- Russian: nouns ---
    "тесты": "тест",
    "теста": "тест",
    "тестов": "тест",
    "таблицы": "таблица",
    "таблиц": "таблица",
    "страницы": "страница",
    "страниц": "страница",
    "запросы": "запрос",
    "запросов": "запрос",
    "слова": "слово",
    "слов": "слово",
    "данные": "данный",
    "данных": "данный",
    # --- Russian: verbs ---
    "ищет": "искать",
    "ищут": "искать",
    "искали": "искать",
}


def lemma(word: str) -> str:
    """First-normal-form lookup with identity fallback (lowercase in/out)."""
    return LEMMA_MAP.get(word, word)


_SORTED_ITEMS = sorted(LEMMA_MAP.items())


def lemma_col(col: Column) -> Column:
    """Spark literal-map lookup: coalesce(map[term], term)."""
    m = F.create_map(*[F.lit(x) for kv in _SORTED_ITEMS for x in kv])
    return F.coalesce(F.element_at(m, col), col)


def lemma_case_sql(expr: str) -> str:
    """DuckDB fragment: same mapping as a scalar CASE expression."""
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in _SORTED_ITEMS
    )
    return f"(CASE {expr} {whens} ELSE {expr} END)"
