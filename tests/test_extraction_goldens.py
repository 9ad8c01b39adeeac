"""Byte-identical extraction invariant (BASELINE.json input_hint): for a
given url/html the extractor output is FROZEN — goldens committed as
sha256(text) + title per url (tests/golden_extraction.json, SURVEY §5
item 2). Any change to textproc/extract.py that alters output for these
pages fails here and must be a deliberate, versioned decision."""

from __future__ import annotations

import hashlib
import json
import os

from search_engine_spark.sources.documents import load_documents
from search_engine_spark.textproc.extract import extract_text, extract_title

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_extraction.json")


def test_extraction_matches_committed_goldens(spark):
    with open(GOLDEN_PATH) as f:
        goldens = json.load(f)
    rows = (
        load_documents(spark, "/root/testdata/sf0.001")
        .select("url", "html", "text")
        .orderBy("doc_id")
        .limit(len(goldens))
        .collect()
    )
    assert len(rows) == len(goldens)
    for r in rows:
        g = goldens[r["url"]]
        extracted = extract_text(bytes(r["html"]))
        # invariant 1: extractor inverts the html wrapper exactly
        assert extracted == r["text"]
        # invariant 2: bytes frozen against the committed golden
        assert hashlib.sha256(extracted.encode()).hexdigest() == g["text_sha256"]
        assert extract_title(bytes(r["html"])) == g["title"]
