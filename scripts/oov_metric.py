#!/usr/bin/env python
"""Morphology coverage metric — the SURVEY §5 OOV numbers, reproducibly.

For a corpus (an sf dir's documents.parquet, or --adversarial for the
edge-case corpus) tokenizes with the engine's frozen analyzer rules and
classifies every retained token occurrence:

  dictionary  — in FULL_LEMMA_MAP (generated forms + identity lemmas +
                overlay + the contract vocabulary)
  rule        — dictionary miss that the ruletier conflates (output
                differs from the token: a regular unseen inflection)
  oov         — neither: kept with identity lemma (the engine's
                documented divergence from the reference's drop rule)

Usage: python scripts/oov_metric.py [sf_dir | --adversarial]
Prints one JSON line with distinct and by-occurrence shares.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from search_engine_spark.textproc.lemmas import FULL_LEMMA_MAP  # noqa: E402
from search_engine_spark.textproc.ruletier import rule_lemma  # noqa: E402
from search_engine_spark.textproc.stopwords import STOPWORDS  # noqa: E402
from search_engine_spark.textproc.tokenize import (  # noqa: E402
    BOUNDARY_STRIP,
    WORD_PATTERN,
    WS_SPLIT,
)


def vocab_counts(sf_dir: str | None) -> dict[str, int]:
    con = duckdb.connect()
    if sf_dir is None:
        from tests.adversarial_corpus import ADV_DOCS

        con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            [(i, t or "") for i, t, _l in ADV_DOCS],
        )
        src = "documents"
    else:
        src = f"'{sf_dir}/documents.parquet'"
    rows = con.sql(
        f"""SELECT regexp_replace(t.tok, '{BOUNDARY_STRIP}', '', 'g') AS term,
                   count(*) AS c
        FROM {src} d,
        unnest(string_split_regex(lower(trim(coalesce(d.text,''))), '{WS_SPLIT}')) AS t(tok)
        GROUP BY 1"""
    ).fetchall()
    con.close()
    word_re = re.compile(WORD_PATTERN)
    return {
        w: c
        for w, c in rows
        if w and word_re.match(w) and w not in STOPWORDS
    }


def main() -> None:
    arg = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sf_dir = None if arg == "--adversarial" else arg
    vocab = vocab_counts(sf_dir)
    total_occ = sum(vocab.values()) or 1
    buckets = {"dictionary": [0, 0], "rule": [0, 0], "oov": [0, 0]}
    for w, c in vocab.items():
        if w in FULL_LEMMA_MAP:
            b = "dictionary"
        elif rule_lemma(w) != w:
            b = "rule"
        else:
            b = "oov"
        buckets[b][0] += 1
        buckets[b][1] += c
    out = {
        "corpus": arg,
        "distinct": len(vocab),
        "occurrences": total_occ,
    }
    for b, (d, o) in buckets.items():
        out[f"{b}_distinct"] = d
        out[f"{b}_occ_pct"] = round(100.0 * o / total_occ, 2)
    print(json.dumps(out, ensure_ascii=False))


if __name__ == "__main__":
    main()
