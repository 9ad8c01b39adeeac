"""Tokenizer — the engine's T2/T3 surface (fast analyzer).

Semantics mirror the reference (services/LemmasFinder.java:260-290):

1. lowercase the text (``:262``)
2. split on whitespace (``text.split("\\s+")``, ``:264``)
3. strip leading/trailing non-letter symbols from each token
   (clearUnnecessarySymbols, ``:275-290``)
4. keep only tokens that are pure letter-words — Latin or Cyrillic, with
   interior hyphens allowed (``кто-то``); tokens containing digits are
   rejected entirely (README.md:5 — "цифры игнорируются")
5. drop frozen stopwords (fast-analyzer stand-in for the reference's
   POS-tag PARTICLES filter, LemmasFinder.java:19)

The exact same five rules are emitted as Spark column expressions
(functions/text_columns.py) and as DuckDB SQL (functions/oracle_fragments.py).
This module is the pure-Python reference implementation used by unit tests
and the driver-side query analyzer.
"""

from __future__ import annotations

import re

from .stopwords import STOPWORDS

# Letter classes: Latin a-z + Cyrillic а-я + ё (text is lowercased first).
LETTER = "a-zа-яё"
# Digits are deliberately NOT strippable at token boundaries (reference
# clearUnnecessarySymbols excludes digits from the trimmable classes,
# LemmasFinder.java:275-290) — so "abc123" keeps its digits and the whole
# token is rejected by WORD_RE, matching "цифры игнорируются" (README.md:5).
BOUNDARY_STRIP = f"^[^{LETTER}0-9]+|[^{LETTER}0-9]+$"
WORD_PATTERN = f"^[{LETTER}]+(-[{LETTER}]+)*$"
BOUNDARY_STRIP_RE = re.compile(BOUNDARY_STRIP)
WORD_RE = re.compile(WORD_PATTERN)

# Whitespace spec shared by EVERY tokenizer emitter. Python's str-mode \s
# is Unicode-aware (NBSP, thin spaces, NEL) while Java's \s (Spark F.split)
# and RE2's \s (DuckDB) are ASCII-only — a bare r"\s+" therefore tokenizes
# U+00A0 etc. differently per engine. This class writes out Python's str \s
# set explicitly (ASCII controls + \x85 + \x1c-\x1f + Unicode Zs/Zl/Zp) as
# LITERAL characters, which mean the same thing in Python re, pandas, Java
# regex and RE2. Golden-tested with Unicode whitespace in
# tests/test_textproc.py.
WS_CHARS = (
    " \t\n\r\f\v\x1c\x1d\x1e\x1f\x85\xa0\u1680"
    "\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007\u2008\u2009\u200a"
    "\u2028\u2029\u202f\u205f\u3000"
)
WS_SPLIT = f"[{WS_CHARS}]+"
WS_RE = re.compile(WS_SPLIT)


def clean_token(tok: str) -> str:
    """Rule 3: strip boundary non-letters (digits are NOT strippable —
    a token like ``abc123`` keeps its digits and fails rule 4, matching the
    reference where digit-words never lemmatize)."""
    return BOUNDARY_STRIP_RE.sub("", tok)


def raw_tokens(text: str) -> list[str]:
    """Rules 1-2: lowercase + whitespace split."""
    if not text:
        return []
    return [t for t in WS_RE.split(text.lower().strip()) if t]


def tokenize(
    text: str, *, drop_stopwords: bool = True, lemmatize: bool = True
) -> list[str]:
    """Full analyzer pipeline (rules 1-5 + normal-form lookup, T5).
    Order-preserving with duplicates — term frequency is computed
    downstream. ``lemmatize=False`` gives the raw surface tokens (rules
    1-5 only)."""
    from .lemmas import lemma  # local import: avoid cycle at module load

    out: list[str] = []
    for tok in raw_tokens(text):
        tok = clean_token(tok)
        if not tok or not WORD_RE.match(tok):
            continue
        if drop_stopwords and tok in STOPWORDS:
            continue
        out.append(lemma(tok) if lemmatize else tok)
    return out


def term_frequencies(text: str, *, lemmatize: bool = True) -> dict[str, int]:
    """Reference findLemmas() analogue (LemmasFinder.java:31-46):
    normal-form term → occurrence count within one document."""
    tf: dict[str, int] = {}
    for t in tokenize(text, lemmatize=lemmatize):
        tf[t] = tf.get(t, 0) + 1
    return tf
