"""Lemma dictionary — the engine's T4/T5 morphology surface.

The reference lemmatizes with Lucene-morphology (Russian + English analyzers,
pom.xml:60-84): a word is looked up, Russian first then English
(services/LemmasFinder.java:350-358), and the FIRST normal form wins
(``normalForms.get(0)``, services/LemmasFinder.java:327-342) — e.g.
``tested -> test`` but ``testing -> testing`` (first of [testing, test]).

Two layers, merged into one active table (``FULL_LEMMA_MAP``):

  * the GENERATED dictionary (textproc/morphology.py): thousands of ru/en
    inflected forms expanded from a frozen base lexicon through
    deterministic inflection paradigms — the morphology surface proper;
  * ``LEMMA_MAP`` below: a small hand-frozen overlay that pins specific
    first-normal-form choices (e.g. ``testing -> testing``) and wins on
    conflict, so goldens written against it stay stable across dictionary
    regenerations.

The merged mapping is emitted four ways so all engines agree bit-for-bit:

  * ``lemma()``          — pure Python (unit tests, driver-side query
                           analysis, snippet highlighting)
  * ``Series.map(FULL_LEMMA_MAP)`` — Arrow tokenizers
                           (operators/index_build.py, fused_build.py,
                           functions/udfs.py)
  * ``lemma_dict_df()``  — broadcast dictionary DataFrame joined after the
                           explode in functions/text_columns.py (a literal
                           in-expression map would bloat codegen at this
                           size; a broadcast join is the classic
                           dictionary-at-scale design)
  * ``lemma_items()``    — frozen (word, normal) list the DuckDB oracle
                           embeds as a VALUES join
                           (functions/oracle_fragments.py)

Stop-POS filtering (PARTICLES, services/LemmasFinder.java:19) is the
particle-classed section of the morphology lexicon, which equals the frozen
stopword list (textproc/stopwords.py) by construction; see
morphology.is_fitting for the faithful reference filter.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession

from .morphology import build_lemma_table, lexicon_lemmas
from .ruletier import rule_lemma

DICT_VERSION = 3

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


# The active table: identity rows for every KNOWN LEMMA (a word that is
# its own first normal form must never reach the rule tier — 'слово'
# would otherwise suffix-strip), then the generated dictionary, then the
# hand-frozen overlay (overlay wins — it pins reference-observed
# first-normal-form choices). The identity layer is behaviorally inert
# for lookup (identity in, identity out) — it exists to mark lemmas as
# dictionary HITS now that misses fall through to ruletier.
_GENERATED = build_lemma_table()
from .morphology_ext import PROTECTED_TOKENS
from .tokenize import WORD_RE as _WORD_RE

# only tokenizer-valid protected tokens join the dictionary (café et al.
# never survive tokenization, and every dict entry must be a valid token)
_PROTECTED = {w for w in PROTECTED_TOKENS if _WORD_RE.match(w)}

from .irregulars import IRREGULAR_MAP

# the closed-class suppletive/irregular overlay (textproc/irregulars.py,
# r04-verdict missing #1): protected tokens keep identity (same
# carve-out as the rule tier — their analysis is load-bearing for
# committed goldens), LEMMA_MAP still wins on conflict
_IRREGULAR: dict[str, str] = {
    k: v for k, v in IRREGULAR_MAP.items() if k not in _PROTECTED
}

_IDENTITY: dict[str, str] = {
    w: w
    for w in sorted(
        lexicon_lemmas()
        | set(_GENERATED.values())
        | set(LEMMA_MAP.values())
        # every irregular's lemma is itself a dictionary hit (e.g. 'go',
        # 'идти') — absence would send it to the rule tier
        | set(_IRREGULAR.values())
        # the frozen contract vocabulary: contractually identity — real
        # words the reference's full Lucene dictionaries recognize too,
        # so marking them dictionary HITS (not OOV) is the faithful call
        | _PROTECTED
    )
}
FULL_LEMMA_MAP: dict[str, str] = {
    **_IDENTITY,
    **_GENERATED,
    **_IRREGULAR,
    **LEMMA_MAP,
}

_SORTED_ITEMS = sorted(FULL_LEMMA_MAP.items())


def lemma(word: str) -> str:
    """First-normal-form lookup; dictionary misses fall through to the
    rule tier (ruletier.rule_lemma: suffix-stripping conflation for
    regular unseen inflections, identity for everything else —
    lowercase in/out)."""
    got = FULL_LEMMA_MAP.get(word)
    return got if got is not None else rule_lemma(word)


def lemma_items() -> list[tuple[str, str]]:
    """Frozen sorted (inflected, normal) pairs — the oracle-SQL emitter."""
    return _SORTED_ITEMS


# weak keys, not id(spark): CPython reuses freed ids, so an id-keyed dict
# could hand a NEW session a DataFrame bound to a stopped one (and never
# evicts dead entries); weak keys drop the entry with the session
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, DataFrame]" = (
    weakref.WeakKeyDictionary()
)


def lemma_dict_df(spark: SparkSession) -> DataFrame:
    """The dictionary as a (word, normal) DataFrame, cached per session.
    Small (thousands of rows) — callers broadcast it into the post-explode
    join (functions/text_columns.py::explode_terms)."""
    if spark not in _DF_CACHE:
        _DF_CACHE[spark] = spark.createDataFrame(
            _SORTED_ITEMS, "word string, normal string"
        )
    return _DF_CACHE[spark]
