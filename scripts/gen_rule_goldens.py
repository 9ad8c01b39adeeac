#!/usr/bin/env python
"""Regenerate tests/golden_rule_lemmas.json — the rule-tier drift pin.

Pairs are (form → lemma(form)) for DICTIONARY-MISS forms synthesized
deterministically: English pseudo-stems crossed with the -s/-es/-ies/
-ed/-ing families, Russian pseudo-stems crossed with the frozen
RU_SUFFIXES list, plus rule-inert controls. md5(form) ordering keeps the
sample stable across regenerations (same scheme as the v3 dictionary
goldens). Any rule change shows up as a diff here and must bump
RULE_TIER_VERSION.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from search_engine_spark.textproc import ruletier as R  # noqa: E402
from search_engine_spark.textproc.lemmas import (  # noqa: E402
    FULL_LEMMA_MAP,
    lemma,
)

EN_STEMS = [
    "wug", "blork", "gleeb", "snarf", "plim", "trock", "vand", "quix",
    "zorp", "flan", "grend", "mab", "chiv", "drup", "skell", "twan",
    "yilb", "prend", "stog", "clem", "brox", "fash", "nid", "grop",
    "hilt", "jasp", "kren", "lom", "mird", "nulb", "ostr", "pevv",
]
EN_TEMPLATES = [
    "{s}s", "{s}es", "{s}ies", "{s}ed", "{s}ing", "{s}ning", "{s}ted",
    "{s}", "{s}ches", "{s}shes", "{s}xes",
]
RU_STEMS = [
    "вагон", "шурп", "клорт", "бзум", "гленд", "фарш", "тряк", "вольц",
    "жерд", "зыбр", "кмет", "лурд", "мявк", "нюрб", "опт", "прюк",
    "ремз", "свол", "тюльп", "улькр", "фенд", "хряб", "цорк", "чужб",
    "шмыг", "щерб", "эльм", "юрд", "ярлг", "бруск", "вепрь", "гнырк",
]


def main() -> None:
    forms: set[str] = set()
    for s in EN_STEMS:
        for t in EN_TEMPLATES:
            forms.add(t.format(s=s))
    for s in RU_STEMS:
        forms.add(s)
        for suf in R.RU_SUFFIXES:
            forms.add(s + suf)
    # controls the rule must leave alone
    forms.update(["qqqzzz", "x", "gas", "kiss", "virus", "basis", "еды"])
    # only dictionary MISSES belong in the rule pin
    forms = {f for f in forms if f not in FULL_LEMMA_MAP}
    ordered = sorted(
        forms, key=lambda w: hashlib.md5(w.encode("utf-8")).hexdigest()
    )
    pairs = [[w, lemma(w)] for w in ordered]
    path = os.path.join(REPO, "tests", "golden_rule_lemmas.json")
    with open(path, "w", encoding="utf-8") as fh:
        json.dump(pairs, fh, ensure_ascii=False, indent=0)
    print(f"wrote {len(pairs)} pairs to {path}")


if __name__ == "__main__":
    main()
