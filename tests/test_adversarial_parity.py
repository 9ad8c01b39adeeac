"""Adversarial-corpus oracle parity.

The driver fixtures (`/root/testdata/sf*`) are single-line, punctuation-free
ASCII word soup, so fixture-parity alone cannot catch Spark-vs-DuckDB
divergence on the characters real Common-Crawl text is full of (ADVICE r01
flagged exactly this for Unicode whitespace). tests/adversarial_corpus.py
defines a deterministic corpus of edge-case documents; this test re-runs a
broad cross-section of the contract's (queries, oracle_sql) pairs on it.
Parity must hold on THIS corpus exactly as on the fixtures: same
three-implementation frozen spec, nastier input.

It already earned its keep: the NULL-text document exposed an unpinned
NULL boundary (three queries diverged three different ways) now fixed in
sources/documents.py::load_documents.

The full 160-pair gate can be run against this corpus ad hoc with
`python scripts/oracle_sweep.py --adversarial`.
"""

from __future__ import annotations

import pytest

from tests.adversarial_corpus import build_adversarial_dir, register_oracle_views
from tests.conftest import compare_frames, make_duckdb

import __spark_entry__ as entrymod

# Doc-centric contract queries spanning the pipeline: build, dictionary,
# text stats, curation, dedup, URL/link handling, search and suggesters
# (some legitimately return 0 rows here — 0-vs-0 with matching schema is
# still parity). Heavy iterative composites (curation funnels, MMR) are
# exercised at fixture scale and by the ad-hoc sweep instead.
ADV_QUERIES = [
    "postings",
    "postings_positional",
    "term_dict",
    "term_dict_site",
    "doc_stats",
    "titles",
    "lang_id",
    "token_counts",
    "quality_scores",
    "quality_model",
    "fingerprints",
    "line_dedup",
    "dedup_exact",
    "dedup_lsh_pairs",
    "dedup_jaccard",
    "dedup_clusters",
    "minhash",
    "simhash",
    "simhash_pairs",
    "pii_redact",
    "url_normalize",
    "url_reorder",
    "surt_keys",
    "status_filter",
    "geo_distance",
    "geo_bbox",
    "geotile_grid",
    "geo_rings",
    "link_extract",
    "mirror_hosts",
    "latest_revisions",
    "c4_clean",
    "gopher_rules",
    "string_stats",
    "weighted_avg",
    "extended_stats",
    "matrix_stats",
    "range_agg",
    "repetition_stats",
    "lm_scores",
    "dl_histogram",
    "length_quantiles",
    "hll_vocab",
    "cm_heavy_hitters",
    "induced_stopwords",
    "collocations",
    "next_word",
    "doc_keywords",
    "significant_terms",
    "related_terms",
    "term_vectors",
    "sample_split",
    "sample_stratified",
    "temperature_sample",
    "search_bm25",
    "search_bm25_or",
    "search_and2",
    "search_site",
    "search_phrase",
    "search_proximity",
    "search_fuzzy",
    "search_wildcard",
    "search_boolean",
    "search_qstring",
    "search_regexp",
    "spell_suggest",
    "prefix_suggest",
    "term_suggester",
    "terms_set",
    "datehist_pipeline2",
    "auto_datehist",
    "top_metrics",
    "more_like_this",
    "explain_score",
    "best_passage",
    "warc_roundtrip",
]


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory):
    return build_adversarial_dir(str(tmp_path_factory.mktemp("adversarial_sf")))


@pytest.fixture(scope="module")
def adv_oracle(adv_dir):
    con = make_duckdb(adv_dir)
    register_oracle_views(con, adv_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_adversarial_parity(name, spark, adv_dir, adv_oracle):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    compare_frames(q(spark, adv_dir), adv_oracle.sql(sql))
