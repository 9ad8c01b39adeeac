"""Frozen synonym groups for query-time expansion.

The reference has no synonym surface (its dictionary is exact-lemma only,
model/LemmaRepository.java:10-12); query-side synonym expansion is the
standard search extension (Lucene SynonymQuery / SynonymGraphFilter at
query time). The map is configuration, exactly like the stopword list and
lemma dictionary: a frozen, versioned asset the query analyzer consults
driver-side — at 100 TB it is a few-KB broadcast literal, never a join.

Groups are keyed on POST-morphology lemmas (expansion runs after
analyze_query), so "joins" → lemma "join" → group {"join", "merge"}.
"""

from __future__ import annotations

# lemma → its synonym set (symmetric closure applied in expand_terms;
# entries chosen over the public corpus vocabulary so tests exercise
# multi-member groups, absent members contribute nothing by construction)
SYNONYMS: dict[str, tuple[str, ...]] = {
    "join": ("join", "merge"),
    "merge": ("join", "merge"),
    "fast": ("fast", "quick", "rapid"),
    "quick": ("fast", "quick", "rapid"),
    "rapid": ("fast", "quick", "rapid"),
    "big": ("big", "large", "huge"),
    "large": ("big", "large", "huge"),
    "huge": ("big", "large", "huge"),
    "data": ("data", "dataset"),
    "dataset": ("data", "dataset"),
}


def expand_terms(terms: list[str]) -> list[list[str]]:
    """Analyzed query terms → disjoint synonym groups (driver-side).

    Each term maps to its synonym group (singleton if unmapped); groups
    that share any member are merged (two query terms from the same group
    are ONE conjunct — Lucene SynonymQuery semantics, and required for the
    literal member→group map in operators/search.py::search_synonyms to be
    well-defined). Deterministic: groups ordered by first appearance,
    members sorted."""
    groups: list[set[str]] = []
    for t in terms:
        g = set(SYNONYMS.get(t, (t,)))
        g.add(t)
        merged = None
        for existing in groups:
            if existing & g:
                existing |= g
                merged = existing
                break
        if merged is None:
            groups.append(g)
    # transitive re-merge (a later group may bridge two earlier ones)
    out: list[set[str]] = []
    for g in groups:
        hit = None
        for e in out:
            if e & g:
                e |= g
                hit = e
                break
        if hit is None:
            out.append(g)
    return [sorted(g) for g in out]


# --------------------------------------------------- multi-word synonyms

# Variant groups for the synonym GRAPH (Lucene SynonymGraphFilter): each
# group is a set of token-sequence variants treated as ONE pseudo-term at
# query time — a document matches the group if ANY variant occurs as an
# exact phrase, and the group's tf is the sum over variant phrase
# occurrences. Frozen config like SYNONYMS above; sequences are
# POST-morphology lemma tuples.
MULTIWORD_SYNONYMS: tuple[tuple[tuple[str, ...], ...], ...] = (
    (("fast", "table"), ("sort", "table")),
    (("hash", "join"), ("merge",)),
)


def expand_phrase_groups(
    groups: tuple[tuple[tuple[str, ...], ...], ...] = MULTIWORD_SYNONYMS,
) -> list[list[list[str]]]:
    """Frozen config → deterministic [[variant tokens, ...], ...] with
    variants sorted (driver-side, a few-entry literal at any scale)."""
    return [sorted([list(v) for v in g]) for g in groups]
