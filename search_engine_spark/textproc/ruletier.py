"""Rule-based OOV lemma fallback — the analyzer's third tier.

The reference's Lucene-morphology analyzers carry full ru/en dictionaries
(reference pom.xml:60-84), so regular inflections of words outside OUR
generated 34k-form lexicon still conflate there. This module closes that
gap the way production analyzers do for out-of-dictionary words: a
deterministic suffix-stripping rule tier (Lovins/Porter-style "light"
stemming; cf. Lucene's EnglishMinimalStemFilter and RussianLightStemFilter,
which are public-domain algorithms re-derived here from their published
descriptions, not ported code) applied ONLY when the dictionary has no
entry:

    lemma(w) = FULL_LEMMA_MAP[w]        if w in dictionary   (tier 1+2)
             = rule_lemma(w)            otherwise            (tier 3)

`rule_lemma` is identity for PROTECTED_TOKENS (the frozen test-corpus /
contract-query vocabulary — their identity analysis is load-bearing for
committed goldens), for hyphenated/mixed-script tokens, and for any word
no rule matches — so the engine's documented keep-OOV-with-identity
policy (textproc/morphology.py module docstring) is unchanged; the rule
tier only CONFLATES regular unseen inflections that previously indexed
as distinct terms.

Four emitters, pinned bit-equal by tests/test_ruletier.py:

  * `rule_lemma`        — pure Python (lemmas.lemma, query analysis,
                          snippet highlighting)
  * `rule_series`       — masked pandas map for the Arrow tokenizers
  * `rule_lemma_col`    — chained-when Column expression (the broadcast-
                          join fallback in functions/text_columns.py)
  * `rule_lemma_sql`    — CASE expression for the DuckDB oracle
                          (functions/oracle_fragments.terms_cte)

The English branch is the -s/-es/-ies plural family plus the -ed/-ing
verb family with consonant undoubling; the Russian branch strips ONE
ending from a frozen longest-first declension/conjugation list with a
3-char stem floor. Both branches are FIRST-MATCH-WINS over an ordered
rule list, so the Column/SQL forms are literal CASE translations of the
Python loop — same order, same guards. The spec is frozen at
RULE_TIER_VERSION; any change must regenerate tests/golden_rule_lemmas
and bump the version.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from . import morphology_ext as ext

RULE_TIER_VERSION = 1

# English branch fires only for pure ASCII-lowercase words; Russian for
# pure Cyrillic (matching the analyzer's script routing). Hyphenated /
# mixed-script / digit-bearing tokens take identity.
_EN_RE = re.compile(r"^[a-z]+$")
_RU_RE = re.compile(r"^[а-яё]+$")

# -es forms whose stem keeps a trailing sibilant/o: strip 'es'
_EN_ES_SUFFIXES = ("ches", "shes", "sses", "xes", "zes", "oes")

# Russian endings, ONE stripped per word, stem floor 3 chars. Ordered
# longest-first (ties keep list order) — the first-match-wins contract
# shared by all four emitters. A compact light-stemmer set: noun case
# endings, adjective agreement, productive verb endings.
RU_SUFFIXES = (
    # 4-char
    "иями",
    # 3-char
    "ями", "ами", "иях", "иям", "ией",
    "ого", "его", "ому", "ему", "ыми", "ими",
    "ешь", "ишь", "ете", "ите", "ует", "уют",
    # 2-char
    "ах", "ях", "ам", "ям", "ов", "ев", "ей", "ой",
    "ий", "ый", "ая", "яя", "ое", "ее", "ые", "ие",
    "ом", "ем", "ут", "ют", "ат", "ят", "ит", "ет",
    # 1-char
    "ы", "и", "а", "я", "у", "ю", "е", "о", "ь",
)

_RU_STEM_MIN = 3
# consonants that keep their doubling when -ed/-ing strips ("tell",
# "class", "buzz" stems stay intact; "running" → "run")
_EN_KEEP_DOUBLE = ("l", "s", "z")


def _en_undouble(stem: str) -> str:
    if (
        len(stem) >= 2
        and stem[-1] == stem[-2]
        and stem[-1] not in _EN_KEEP_DOUBLE
    ):
        return stem[:-1]
    return stem


def rule_lemma(w: str) -> str:
    """Tier-3 fallback for a single dictionary-miss token (lowercase
    in/out). Identity unless a rule fires."""
    if w in ext.PROTECTED_TOKENS:
        return w
    if _EN_RE.match(w):
        n = len(w)
        if w.endswith("ies") and n >= 5:
            return w[:-3] + "y"
        if w.endswith(_EN_ES_SUFFIXES) and n >= 5:
            return w[:-2]
        if (
            w.endswith("s")
            and not w.endswith(("ss", "us", "is"))
            and n >= 4
        ):
            return w[:-1]
        if w.endswith("ing") and n >= 6:
            return _en_undouble(w[:-3])
        if w.endswith("ed") and n >= 5:
            return _en_undouble(w[:-2])
        return w
    if _RU_RE.match(w):
        n = len(w)
        for suf in RU_SUFFIXES:
            if w.endswith(suf) and n - len(suf) >= _RU_STEM_MIN:
                return w[: -len(suf)]
        return w
    return w


def rule_series(s: pd.Series) -> pd.Series:
    """`rule_lemma` over a Series (object/string dtype, already
    lowercase). Callers apply it ONLY to the dictionary-miss mask, so
    the per-row Python cost lands on the (unique-token) OOV slice."""
    return s.map(rule_lemma)


def _protected_sorted() -> list[str]:
    return sorted(ext.PROTECTED_TOKENS)


def rule_lemma_col(c: Column) -> Column:
    """Column-expression emitter: a literal CASE translation of
    `rule_lemma` (same rule order, same guards) for the broadcast-join
    identity fallback. Stays inside whole-stage codegen — no UDF."""
    ln = F.length(c)

    def strip(k: int) -> Column:
        return c.substr(F.lit(1), ln - k)

    def last(i: int) -> Column:  # i chars from the end, length 1
        return c.substr(ln - (i - 1), F.lit(1))

    en_undoubled_ing = F.when(
        (last(4) == last(5)) & ~last(4).isin(*_EN_KEEP_DOUBLE), strip(4)
    ).otherwise(strip(3))
    en_undoubled_ed = F.when(
        (last(3) == last(4)) & ~last(3).isin(*_EN_KEEP_DOUBLE), strip(3)
    ).otherwise(strip(2))

    en = (
        F.when(c.endswith("ies") & (ln >= 5), F.concat(strip(3), F.lit("y")))
        .when(
            (ln >= 5)
            & (
                c.endswith("ches") | c.endswith("shes") | c.endswith("sses")
                | c.endswith("xes") | c.endswith("zes") | c.endswith("oes")
            ),
            strip(2),
        )
        .when(
            c.endswith("s")
            & ~(c.endswith("ss") | c.endswith("us") | c.endswith("is"))
            & (ln >= 4),
            strip(1),
        )
        .when(c.endswith("ing") & (ln >= 6), en_undoubled_ing)
        .when(c.endswith("ed") & (ln >= 5), en_undoubled_ed)
        .otherwise(c)
    )

    ru = c
    # build the when-chain in reverse so the FIRST suffix in RU_SUFFIXES
    # ends up the outermost (first-checked) branch
    for suf in reversed(RU_SUFFIXES):
        ru = F.when(
            c.endswith(suf) & (ln >= _RU_STEM_MIN + len(suf)),
            strip(len(suf)),
        ).otherwise(ru)

    return (
        F.when(c.isin(*_protected_sorted()), c)
        .when(c.rlike("^[a-z]+$"), en)
        .when(c.rlike("^[а-яё]+$"), ru)
        .otherwise(c)
    )


def rule_lemma_sql(expr: str) -> str:
    """DuckDB CASE emitter over the SQL expression `expr` (a lowercase
    token column) — the oracle twin of `rule_lemma`, generated from the
    same frozen rule data so the branches cannot drift."""
    w = expr
    ln = f"length({w})"

    # greatest() floors: DuckDB's vectorized CASE may evaluate a branch
    # expression over the whole vector (including rows its guard
    # excludes), and substr() errors on negative lengths — the floor
    # keeps excluded rows harmless without changing any taken branch
    def strip(k: int) -> str:
        return f"substr({w}, 1, greatest({ln} - {k}, 0))"

    def last(i: int) -> str:
        return f"substr({w}, greatest({ln} - {i - 1}, 1), 1)"

    keep = ", ".join(f"'{ch}'" for ch in _EN_KEEP_DOUBLE)
    en_ing = (
        f"CASE WHEN {last(4)} = {last(5)} AND {last(4)} NOT IN ({keep}) "
        f"THEN {strip(4)} ELSE {strip(3)} END"
    )
    en_ed = (
        f"CASE WHEN {last(3)} = {last(4)} AND {last(3)} NOT IN ({keep}) "
        f"THEN {strip(3)} ELSE {strip(2)} END"
    )
    es_any = " OR ".join(f"ends_with({w}, '{s}')" for s in _EN_ES_SUFFIXES)
    en = f"""CASE
      WHEN ends_with({w}, 'ies') AND {ln} >= 5 THEN {strip(3)} || 'y'
      WHEN ({es_any}) AND {ln} >= 5 THEN {strip(2)}
      WHEN ends_with({w}, 's') AND NOT (ends_with({w}, 'ss') OR ends_with({w}, 'us') OR ends_with({w}, 'is')) AND {ln} >= 4 THEN {strip(1)}
      WHEN ends_with({w}, 'ing') AND {ln} >= 6 THEN {en_ing}
      WHEN ends_with({w}, 'ed') AND {ln} >= 5 THEN {en_ed}
      ELSE {w} END"""
    ru_whens = "\n      ".join(
        f"WHEN ends_with({w}, '{s}') AND {ln} >= {_RU_STEM_MIN + len(s)} "
        f"THEN {strip(len(s))}"
        for s in RU_SUFFIXES
    )
    ru = f"CASE\n      {ru_whens}\n      ELSE {w} END"
    protected = ", ".join(f"'{t}'" for t in _protected_sorted())
    return f"""CASE
      WHEN {w} IN ({protected}) THEN {w}
      WHEN regexp_matches({w}, '^[a-z]+$') THEN {en}
      WHEN regexp_matches({w}, '^[а-яё]+$') THEN {ru}
      ELSE {w} END"""
