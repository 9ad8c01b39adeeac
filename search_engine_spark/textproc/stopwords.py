"""Frozen stopword lists (function-word filter).

The reference drops interjections, conjunctions, prepositions and particles
via morphology POS tags (PARTICLES list, reference
services/LemmasFinder.java:19 and isFittingWord at :299-316). This engine's
frozen function-word list IS the particle-classed section of the morphology
lexicon: textproc/morphology.py builds its particle lexicon from these
exact tuples (asserted in tests/test_morphology.py), so the analyzer's
stopword drop and the POS-tag filter are the same frozen decision —
deterministic, versioned, and embeddable in the DuckDB oracle SQL.
morphology.is_fitting exposes the faithful reference filter (recognized
AND no PARTICLES tag) for callers that want reference-exact semantics.

Do NOT edit casually: golden tests and oracle SQL embed this list.
"""

from __future__ import annotations

STOPWORDS_EN: tuple[str, ...] = (
    # articles / determiners
    "a", "an", "the", "this", "that", "these", "those",
    # conjunctions
    "and", "or", "but", "if", "then", "else", "so", "nor", "yet",
    # prepositions
    "of", "in", "on", "at", "to", "by", "for", "from", "with", "as",
    "into", "onto", "over", "under", "about", "after", "before",
    "between", "through", "during", "without", "within", "upon",
    # pronouns
    "i", "we", "you", "he", "she", "it", "they", "them", "his", "her",
    "its", "our", "your", "their", "me", "him", "us", "my", "mine",
    "yours", "ours", "theirs", "who", "whom", "which", "what",
    # auxiliaries / copulas
    "is", "are", "was", "were", "be", "been", "being", "am",
    "do", "does", "did", "will", "would", "can", "could", "shall",
    "should", "may", "might", "must", "have", "has", "had",
    # negation / particles
    "not", "no",
)

STOPWORDS_RU: tuple[str, ...] = (
    # conjunctions / particles / prepositions (reference PARTICLES classes:
    # МЕЖД, СОЮЗ, ПРЕДЛ, ЧАСТ)
    "и", "в", "во", "не", "на", "с", "со", "как", "а", "то", "но", "да",
    "к", "у", "же", "за", "бы", "по", "только", "вот", "от", "еще", "ещё",
    "нет", "о", "об", "из", "ну", "ли", "если", "уже", "или", "ни", "до",
    "ведь", "там", "тут", "где", "для", "чем", "чтоб", "чтобы", "без",
    "будто", "чего", "раз", "тоже", "себе", "под", "ж", "тогда", "кто",
    "этот", "эта", "это", "при", "над", "про", "перед", "через", "между",
    "ах", "ох", "эх", "ой", "увы",
)

STOPWORDS: frozenset[str] = frozenset(STOPWORDS_EN) | frozenset(STOPWORDS_RU)


def sql_not_in_list() -> str:
    """DuckDB/ANSI `NOT IN (...)` literal list for the oracle SQL."""
    quoted = ", ".join(f"'{w}'" for w in sorted(STOPWORDS))
    return f"({quoted})"
