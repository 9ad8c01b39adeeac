"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Every implemented operator from SURVEY.md §2 gets a (queries, oracle_sql)
pair here. Column names/aliases are identical between the Spark plan and the
oracle SQL; float outputs are rounded to 4 dp in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from search_engine_spark.functions import oracle_fragments as ora
from search_engine_spark.functions import oracle_pipeline as pipe
from search_engine_spark.functions.text_columns import normalized_path_col
from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators import search as se
from search_engine_spark.operators.positional import analyze_phrase
from search_engine_spark.plans.statistics import per_site_statistics
from search_engine_spark.sources.documents import load_documents

SF0001 = "/root/testdata/sf0.001"

# Frozen query-term sets (drawn from the synthetic corpus vocabulary;
# 'dup' is the rare injected near-duplicate marker, 'the' is a stopword).
Q_AND2 = ["data", "fast"]
Q_AND3 = ["dup", "scan", "merge"]
Q_BM25 = ["dup", "data", "fast"]
Q_OR = ["dup", "merge", "zzabsent"]  # absent term drops out in OR mode
Q_BM25_COMMON = ["data", "fast", "join"]
Q_GATE = ["dup", "data"]
Q_RELAXED = ["data", "quantumflux"]  # absent term → AND empty → OR fallback
Q_PHRASE_TYPO = ["fst", "sow", "dat"]  # → fast × {slow,row} × data
Q_BM25F = ["data", "merge", "query"]
SITE_B = "site-b"
HYBRID_QUERY_VEC = 0  # embeddings fixture keys vec_id ≡ doc_id


# Per-session context cache: most contract queries share the same
# tokenize→postings→stats pipeline over one sf_dir. Re-deriving it per
# query made the 248-query gate re-run the Arrow tokenizer ~250×; a
# cached, persisted frame set makes the full sweep (and the grading
# driver's CORRECTNESS pass, which reuses one session) pay for the
# corpus scan once. Weak keys so a stopped session's cache dies with it
# (same rationale as lemmas.lemma_dict_df).
import weakref as _weakref

_CTX_CACHE: "_weakref.WeakKeyDictionary[SparkSession, dict]" = (
    _weakref.WeakKeyDictionary()
)


def evict_ctx(spark: SparkSession, sf_dir: str | None = None) -> int:
    """Unpersist and drop this session's cached context frames — all of
    them, or only the ones keyed to `sf_dir`. The weak-key cache frees
    itself only on session GC, so a long-lived session sweeping several
    sf_dirs would otherwise accumulate persisted postings/term_dict/
    doc_stats per directory (r03 ADVICE). Returns the number of cache
    entries evicted. The single-sf driver sweeps never need this."""
    per = _CTX_CACHE.get(spark)
    if not per:
        return 0
    victims = [k for k in per if sf_dir is None or k[1] == sf_dir]
    for k in victims:
        entry = per.pop(k)
        items = entry if isinstance(entry, tuple) else (entry,)
        for item in items:
            if isinstance(item, DataFrame):
                try:
                    item.unpersist()
                except Exception:
                    pass
    return len(victims)


def _search_ctx(spark: SparkSession, sf_dir: str):
    per = _CTX_CACHE.setdefault(spark, {})
    key = ("search", sf_dir)
    if key not in per:
        docs = load_documents(spark, sf_dir)
        postings = ib.build_postings(docs).persist()
        per[key] = (docs, postings)
    return per[key]


def _bm25_ctx(spark: SparkSession, sf_dir: str):
    per = _CTX_CACHE.setdefault(spark, {})
    key = ("bm25", sf_dir)
    if key not in per:
        docs, postings = _search_ctx(spark, sf_dir)
        term_dict = ib.build_term_dict(postings).persist()
        doc_stats = ib.build_doc_stats(docs, postings).persist()
        n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
        per[key] = (docs, postings, term_dict, doc_stats, n_docs, avgdl)
    return per[key]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 conjunctive top-20 on sf0.001."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, SF0001)
    return se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )


# --------------------------------------------------------------------------
# queries(): (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------

def _q_postings(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    return ib.build_postings(docs)


def _q_term_dict(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    return ib.build_term_dict(ib.build_postings(docs))


def _q_term_dict_site(spark, sf_dir):
    return ib.build_term_dict_site(load_documents(spark, sf_dir))


def _q_composite_buckets(spark, sf_dir):
    """ES composite aggregation: page 2 of the (site_key, term) bucket
    walk, after_key = ('site-b', 'merge')."""
    td = ib.build_term_dict_site(load_documents(spark, sf_dir))
    return se.composite_buckets(td, size=10, after=("site-b", "merge"))


def _q_doc_stats(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    return ib.build_doc_stats(docs)


def _q_search_and2(spark, sf_dir):
    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_compat(docs, postings, Q_AND2)


def _q_search_and3(spark, sf_dir):
    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_compat(docs, postings, Q_AND3)


def _q_search_site(spark, sf_dir):
    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_compat(docs, postings, Q_AND2, site_key=SITE_B)


def _q_search_paginated(spark, sf_dir):
    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_compat(docs, postings, Q_AND2, limit=10, offset=10)


def _q_search_stopword_only(spark, sf_dir):
    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_compat(docs, postings, se.analyze_query("the a of"))


def _q_search_bm25(spark, sf_dir):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25(postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25)


def _q_search_bm25_common(spark, sf_dir):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )


def _q_search_bm25_or(spark, sf_dir):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_OR, conjunctive=False
    )


def _q_search_recency(spark, sf_dir):
    """Freshness-damped rerank of the BM25 top-50 (exponential crawl-age
    decay anchored at the corpus max warc_ts)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    hits = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON, limit=50
    )
    return se.blend_recency(hits, docs)


def _q_site_gate(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    return se.site_gate(docs, Q_GATE)


RELATED_PROBE = "data"
TV_DOC_IDS = [1, 2, 3, 7, 11]
WILDCARD_PAT = "?a*"       # general route: LIKE '_a%'
WILDCARD_REV_PAT = "*ge"   # leading wildcard: reversed-term route
REGEXP_PAT = "[bd]at[ae].*|j[ou]in"  # classes + alternation + star
QSTRING = "(data OR dup) AND fast AND NOT (slow scan)"  # nested grammar probe
FILTER_EPOCH = 1704067200 + 60 * 240  # crawl-window cutoff: doc_id >= 240
SPELL_PROBE = "dataa"  # misspelling: one insertion away from "data"


def _q_spell_suggest(spark, sf_dir):
    """"Did you mean" — SymSpell deletion-neighborhood join + exact
    levenshtein==1 filter over the term dictionary."""
    docs = load_documents(spark, sf_dir)
    td = ib.build_term_dict(ib.build_postings(docs))
    return se.spell_suggest(td, SPELL_PROBE)


def _q_related_terms(spark, sf_dir):
    """Related-terms suggestion (doc-level co-occurrence, lift-scored) —
    the query-expansion signal computable from the postings relation."""
    docs = load_documents(spark, sf_dir)
    return se.related_terms(ib.build_postings(docs), RELATED_PROBE)


PREFIX_PROBE = "s"
PHRASE = "fast table"
BOOLEAN_QUERY = "data fast -merge"  # AND(data, fast) NOT merge
PROX_PHRASE = "fast table"
PROX_SLOP = 2
Q_SDM = ["fast", "table", "data"]  # ordered — SDM pairs are sequential
MLT_SEED_DOC = 42
SYN_QUERY = ["join", "fast", "data"]  # expands via textproc/synonyms.py


def _q_more_like_this(spark, sf_dir):
    """Similar-document retrieval: seed doc's top-m tf·idf terms as a
    disjunctive query (Lucene MoreLikeThis shape)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.more_like_this(postings, term_dict, n_docs, MLT_SEED_DOC)


def _q_collocations(spark, sf_dir):
    """PMI-scored adjacent-bigram collocations over the positional
    postings relation (phrase mining for training-data pipelines)."""
    from search_engine_spark.operators.positional import build_positional
    from search_engine_spark.operators.textstats import collocations

    return collocations(build_positional(load_documents(spark, sf_dir)))


def _q_search_synonyms(spark, sf_dir):
    """Synonym-expanded conjunctive search (SynonymQuery semantics: per
    group Σ member tf; groups AND together)."""
    from search_engine_spark.textproc.synonyms import expand_terms

    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_synonyms(postings, expand_terms(SYN_QUERY))


def _q_prefix_suggest(spark, sf_dir):
    """Autocomplete: dictionary terms starting with the probe prefix,
    ranked by df (sargable startswith — scan-prunable on a sorted
    persisted dictionary)."""
    docs = load_documents(spark, sf_dir)
    td = ib.build_term_dict(ib.build_postings(docs))
    return se.prefix_suggest(td, PREFIX_PROBE)


def _q_next_word(spark, sf_dir):
    """Context-aware typeahead: bigram continuations of 'data', ranked
    by corpus adjacency count."""
    from search_engine_spark.operators.positional import build_positional

    pos = build_positional(load_documents(spark, sf_dir))
    return se.next_word_suggest(pos, "data")


def _q_phrase_suggest(spark, sf_dir):
    """ES phrase suggester: 3-word typo phrase 'fst sow dat' → candidate
    phrases (fast × {slow,row} × data) ranked by the stupid-backoff
    bigram LM."""
    from search_engine_spark.operators.positional import build_positional

    pos = build_positional(load_documents(spark, sf_dir))
    return se.phrase_suggest(pos, Q_PHRASE_TYPO)


def _q_postings_positional(spark, sf_dir):
    """Positional postings relation (doc_id, term, pos): one row per
    retained token occurrence, pos = 0-based index in the doc's
    retained-token stream (operators/positional.py)."""
    from search_engine_spark.operators.positional import build_positional

    return build_positional(load_documents(spark, sf_dir))


def _folded_query_terms() -> list[str]:
    """The folded-analyzer query used by search_folded, analyzed once —
    shared by the Spark path and the oracle so they cannot drift."""
    from search_engine_spark.textproc.folding import fold_py
    from search_engine_spark.textproc.tokenize import tokenize

    return tokenize(fold_py("café data fast".lower()))


def _q_search_bool_prefix(spark, sf_dir):
    """ES match_bool_prefix ('data fa' mid-keystroke): 'data' exact OR
    + 'fa*' dictionary prefix expansion, no position constraint."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bool_prefix(
        postings, term_dict, doc_stats, n_docs, avgdl, ["data"], "fa"
    )


def _q_trigram_index(spark, sf_dir):
    """The character-3-gram dictionary index inside ES's wildcard field
    type — the accelerator behind search_substring."""
    from search_engine_spark.operators.dictionary import term_trigram_index

    docs = load_documents(spark, sf_dir)
    return term_trigram_index(ib.build_term_dict(ib.build_postings(docs)))


def _q_search_substring(spark, sf_dir):
    """Infix wildcard via the trigram index; the oracle states the SPEC
    (plain LIKE '%ast%' dictionary scan + disjunctive BM25), so parity
    proves the accelerated path lossless."""
    from search_engine_spark.operators.dictionary import search_substring

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return search_substring(
        postings, term_dict, doc_stats, n_docs, avgdl, "ast"
    )


def _q_search_common_terms(spark, sf_dir):
    """Lucene CommonTermsQuery: rare 'dup' selects (required), common
    'data'/'fast' only boost the selected docs' scores."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_common_terms(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25
    )


def _q_search_most_fields(spark, sf_dir):
    """ES multi_match most_fields: per-field BM25 scores SUM (the
    dis_max tie_breaker=1.0 degenerate — Lucene's documented identity),
    completing the multi-field quartet."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_most_fields,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    anchor = anchor_postings(anchored_html(docs))
    return search_most_fields(
        postings, anchor, doc_stats, n_docs, avgdl, Q_BM25F
    )


def _q_has_child(spark, sf_dir):
    """ES has_child over the anchor join-field: parents ranked by the
    sum of their matching inbound-anchor children's scores."""
    from search_engine_spark.operators.anchors import has_child

    return has_child(load_documents(spark, sf_dir), Q_AND2)


def _q_has_parent(spark, sf_dir):
    """ES has_parent: anchor children of parents whose body matches the
    conjunctive term set (constant-score children, pinned order)."""
    from search_engine_spark.operators.anchors import has_parent

    return has_parent(load_documents(spark, sf_dir), Q_AND2)


def _q_search_nested(spark, sf_dir):
    """ES `nested` conjunctive query: all terms must co-occur INSIDE one
    chunk-object; parent score = avg of matching chunks."""
    from search_engine_spark.operators.nested import nested_match

    return nested_match(load_documents(spark, sf_dir), Q_AND2)


def _q_nested_vs_flat(spark, sf_dir):
    """The cross-object false-positive diagnostic: flat bool match vs
    nested per-chunk match over the same chunked corpus."""
    from search_engine_spark.operators.nested import flat_vs_nested

    return flat_vs_nested(load_documents(spark, sf_dir), Q_AND2)


def _q_postings_folded(spark, sf_dir):
    """ES asciifolding analyzer variant: accented Latin words index as
    their ASCII base forms instead of being dropped by the letter-word
    filter."""
    return ib.build_postings_folded(load_documents(spark, sf_dir))


def _q_search_folded(spark, sf_dir):
    """Disjunctive BM25 over the folded chain; the query runs through
    the SAME folding, so 'café' finds 'cafe' and vice versa."""
    docs = load_documents(spark, sf_dir)
    postings = ib.build_postings_folded(docs)
    term_dict = ib.build_term_dict(postings)
    doc_stats = ib.build_doc_stats(docs, postings)
    n_docs, avgdl = ib.corpus_stats(docs, doc_stats)
    terms = _folded_query_terms()
    return se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, terms,
        conjunctive=False,
    )


def _q_nextword_postings(spark, sf_dir):
    """Nextword auxiliary index (Bahle-Williams-Zobel SIGIR'02): one row
    per adjacent retained-token pair per doc."""
    from search_engine_spark.operators.positional import build_nextword

    return build_nextword(load_documents(spark, sf_dir))


def _q_search_phrase_nextword(spark, sf_dir):
    """Two-word phrase served from the nextword index — held to the
    positional phrase oracle, so the auxiliary index can never disagree
    with the main one."""
    from search_engine_spark.operators.positional import (
        search_phrase_nextword,
    )

    return search_phrase_nextword(load_documents(spark, sf_dir), PHRASE)


def _q_search_sharded(spark, sf_dir):
    """ES query_then_fetch (the DEFAULT search type): each shard scores
    BM25 with its local (N_s, df_s, avgdl_s) — the distributed-scoring
    artifact dfs_query_then_fetch exists to remove."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25_sharded(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )


def _q_search_phrase(spark, sf_dir):
    """Exact-phrase top-k (Lucene PhraseQuery semantics): documents where
    the phrase's lemmas occur at consecutive retained-token positions,
    ranked by phrase occurrence count."""
    from search_engine_spark.operators.positional import search_phrase

    return search_phrase(load_documents(spark, sf_dir), PHRASE)


def _q_facet_by_site(spark, sf_dir):
    """Faceted search: per-site hit count + best score for the AND query
    (operators/search.py::facet_by_site)."""
    from search_engine_spark.operators.search import facet_by_site

    docs = load_documents(spark, sf_dir)
    return facet_by_site(docs, ib.build_postings(docs), Q_GATE)


def _synonyms_oracle() -> str:
    from search_engine_spark.textproc.synonyms import expand_terms

    return ora.search_synonyms_sql(expand_terms(SYN_QUERY))


def _boolean_oracle() -> str:
    from search_engine_spark.operators.search import parse_boolean_query

    must, must_not = parse_boolean_query(BOOLEAN_QUERY)
    return ora.search_boolean_sql(must, must_not)


def _q_search_boolean(spark, sf_dir):
    """Boolean AND/NOT: docs with all must-terms and no excluded term,
    Σtf-ranked. Exclusion = left-anti join on an isin-pruned postings
    slice (operators/search.py::search_boolean)."""
    from search_engine_spark.operators.search import (
        parse_boolean_query,
        search_boolean,
    )

    docs = load_documents(spark, sf_dir)
    must, must_not = parse_boolean_query(BOOLEAN_QUERY)
    return search_boolean(ib.build_postings(docs), must, must_not)


def _q_search_proximity(spark, sf_dir):
    """Ordered SpanNear: phrase terms in order within len+slop positions
    (operators/positional.py::search_proximity, slop=2)."""
    from search_engine_spark.operators.positional import search_proximity

    docs = load_documents(spark, sf_dir)
    return search_proximity(docs, PROX_PHRASE, slop=PROX_SLOP)


def _q_positional_blocks_roundtrip(spark, sf_dir):
    """Persisted-phrase-path codec: positional stream → compressed
    positional blocks (Lucene .prx-style: doc-gap + per-doc pos-delta
    payloads) → decode. Oracle = the positional postings relation, so any
    corruption in the positional codec breaks value-hash parity."""
    from search_engine_spark.operators.positional import build_positional
    from search_engine_spark.operators.positional_blocks import (
        build_positional_blocks,
        decode_positional_blocks,
    )

    docs = load_documents(spark, sf_dir)
    blocks = build_positional_blocks(build_positional(docs), n_buckets=16)
    return decode_positional_blocks(blocks)


def _q_search_phrase_blocks(spark, sf_dir):
    """Exact-phrase top-k over the compressed positional block table —
    the serving-index path (term isin prunes the block scan). Same output
    contract (and oracle) as search_phrase."""
    from search_engine_spark.operators.positional import build_positional
    from search_engine_spark.operators.positional_blocks import (
        build_positional_blocks,
        search_phrase_blocks,
    )

    docs = load_documents(spark, sf_dir)
    blocks = build_positional_blocks(build_positional(docs), n_buckets=16)
    return search_phrase_blocks(blocks, PHRASE)


def _q_status_filter(spark, sf_dir):
    """S2 fetch-status classification (PageAnalyzer.java:541-567) +
    canBeParsed gate (model/Page.java:62-64) as columns."""
    docs = load_documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        F.col("http_code").cast("int").alias("http_code"),
        (
            (F.col("http_code") == 200) & (F.trim(F.col("text")) != "")
        ).alias("can_parse"),
    )


def _q_postings_parseable(spark, sf_dir):
    """The index build composed with the S2 gate: postings over
    fetched-OK, non-blank pages only (what the reference analyzes)."""
    from search_engine_spark.sources.documents import parseable_documents

    docs = parseable_documents(load_documents(spark, sf_dir))
    return ib.build_postings(docs)


def _q_warc_roundtrip(spark, sf_dir):
    """WARC source round-trip: serialize the corpus into concatenated-
    record WARC blobs, parse them back, recover (url, ts, html) — the
    Common-Crawl ingestion path."""
    from search_engine_spark.operators.graph import resolve_doc_url
    from search_engine_spark.sources.warc import parse_warc, to_warc_files

    parsed = parse_warc(to_warc_files(load_documents(spark, sf_dir)))
    return parsed.select(
        resolve_doc_url(F.col("url")).alias("doc_id"),
        "url",
        F.col("warc_ts").cast("long").alias("warc_epoch"),
        F.md5(F.encode("html", "utf-8")).alias("content_md5"),
        "n_bytes",
    )


def _q_url_normalize(spark, sf_dir):
    docs = load_documents(spark, sf_dir)
    return docs.select(
        "doc_id",
        "raw_url",
        normalized_path_col(F.col("site"), F.col("raw_url")).alias("norm_path"),
    )


def _q_url_reorder(spark, sf_dir):
    """URL-order doc-id reassignment (compression-oriented document
    reordering; operators/reorder.py)."""
    from search_engine_spark.operators.reorder import url_ordered_ids

    return url_ordered_ids(load_documents(spark, sf_dir))


def _q_statistics(spark, sf_dir):
    return per_site_statistics(load_documents(spark, sf_dir))


def _q_postings_roundtrip(spark, sf_dir):
    """Compressed block codec round-trip: postings → delta+varbyte blocks →
    decode. Oracle = the plain postings relation, so any codec corruption
    breaks value-hash parity."""
    from search_engine_spark.operators.blocks import (
        build_posting_blocks,
        decode_blocks,
    )

    docs = load_documents(spark, sf_dir)
    blocks = build_posting_blocks(ib.build_postings(docs), 16)
    return decode_blocks(blocks).drop("doc_bucket")


def _q_segment_merge(spark, sf_dir):
    """Lucene-style segment compaction (operators/segments.py): build two
    delta indexes over disjoint doc slices, merge their block tables, decode
    back to logical postings. Oracle = the postings relation over the whole
    corpus — the merge must converge to the from-scratch build."""
    from search_engine_spark.operators.fused_build import (
        blocks_from_packed,
        pack_documents,
    )
    from search_engine_spark.operators.blocks import decode_blocks
    from search_engine_spark.operators.segments import merge_segments

    docs = load_documents(spark, sf_dir)
    base = docs.filter("doc_id % 3 != 0")
    delta = docs.filter("doc_id % 3 = 0")
    merged = merge_segments(
        blocks_from_packed(pack_documents(base, 16)),
        blocks_from_packed(pack_documents(delta, 16)),
    )
    return decode_blocks(merged).select("doc_id", "term", "tf")


def _q_segment_merge_deletes(spark, sf_dir):
    """Merge-time tombstone purge: segments merged with a deleted-doc set
    decode to exactly the postings of the live docs (Lucene .liv model:
    logical deletes become physical at compaction)."""
    import numpy as np

    from search_engine_spark.operators.fused_build import (
        blocks_from_packed,
        pack_documents,
    )
    from search_engine_spark.operators.blocks import decode_blocks
    from search_engine_spark.operators.segments import merge_segments

    docs = load_documents(spark, sf_dir)
    base = docs.filter("doc_id % 3 != 0")
    delta = docs.filter("doc_id % 3 = 0")
    dead = np.array(
        [r.doc_id for r in docs.filter("doc_id % 5 = 0").select("doc_id").collect()],
        dtype=np.int64,
    )
    merged = merge_segments(
        blocks_from_packed(pack_documents(base, 16)),
        blocks_from_packed(pack_documents(delta, 16)),
        deleted=dead,
    )
    return decode_blocks(merged).select("doc_id", "term", "tf")


def _q_term_dict_blocks(spark, sf_dir):
    """(term, df, cf) derived from block METADATA alone (resume path) —
    must equal the relational term_dict."""
    from search_engine_spark.operators.blocks import (
        build_posting_blocks,
        term_dict_from_blocks,
    )

    docs = load_documents(spark, sf_dir)
    blocks = build_posting_blocks(ib.build_postings(docs), 16)
    return term_dict_from_blocks(blocks)


def _q_block_meta(spark, sf_dir):
    """Per-block zone-map / block-max metadata (block_id, first/last doc,
    max_tf, sum_tf, min_dl) — pins the 128-posting block segmentation and
    every stat the query-time pruners rely on (operators/wand.py) against
    a pure-SQL re-derivation via row_number."""
    from search_engine_spark.operators.blocks import build_posting_blocks

    docs = load_documents(spark, sf_dir)
    blocks = build_posting_blocks(ib.build_postings(docs), 16)
    return blocks.select(
        "doc_bucket",
        "term",
        "block_id",
        F.col("count").alias("n_postings"),
        "first_doc",
        "last_doc",
        "max_tf",
        "sum_tf",
        "min_dl",
    )


def _q_titles(spark, sf_dir):
    from search_engine_spark.operators.presentation import titles

    return titles(load_documents(spark, sf_dir))


def _q_search_results(spark, sf_dir):
    """Presented top-k (Q7 title + Q8 snippet). Snippet generation is not
    SQL-expressible — rows-only driver check; semantics pinned by
    tests/test_snippet.py goldens."""
    from search_engine_spark.engine import SearchEngine

    eng = SearchEngine(spark, sf_dir).build()
    return eng.search_results("data fast", mode="compat", limit=10)


# ---------------------------------------------------------------- pipeline
# Training-data pipeline operators (textstats / dedup / similarity /
# multimodal) — each Spark plan mirrored by a DuckDB oracle fragment in
# functions/oracle_pipeline.py.

ANN_QUERY_IDS = [0, 1, 2, 3, 4]
EMB_NEAR_THRESHOLD = 0.4
# within-IVF-cell SemDeDup bar: the synthetic fixture's same-cell cosine
# q90 is ~0.23, so 0.3 drops a real (but minority) slice — both branches
# of the keep verdict are exercised at gate scale
SEMDEDUP_THRESHOLD = 0.3
JACCARD_THRESHOLD = 0.5
SAMPLE_FRACTIONS = {"en": 0.5, "de": 0.25, "fr": 0.1}  # zh/es dropped
HOLDOUT_FRACTION = 0.1


def _q_search_collapsed(spark, sf_dir):
    """Site-collapsed BM25 (one result per domain): max_by collapse over
    the full scored candidate set, pinned (score desc, doc_id asc)."""
    from search_engine_spark.sources.documents import site_key_col

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    hits = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        limit=1_000_000,
    )
    return se.collapse_hits(hits.withColumn("site_key", site_key_col()))


def _q_link_extract(spark, sf_dir):
    """S3 href extraction: decode html, regexp_extract_all every anchor,
    resolve same-engine doc URLs back to doc ids."""
    from search_engine_spark.operators.graph import extract_links, linked_html

    return extract_links(linked_html(load_documents(spark, sf_dir)))


def _q_hits(spark, sf_dir):
    """Kleinberg HITS hubs & authorities over the link graph (fixed
    2-iteration power method, sum-normalized half-steps)."""
    from search_engine_spark.operators.graph import (
        extract_links,
        hits,
        linked_html,
        resolved_edges,
    )

    docs = load_documents(spark, sf_dir)
    edges = resolved_edges(docs, extract_links(linked_html(docs)))
    return hits(docs, edges)


def _q_surt_keys(spark, sf_dir):
    """SURT canonical URL keys (CDX index key) over the raw url."""
    from search_engine_spark.functions.text_columns import surt_key_col

    return load_documents(spark, sf_dir).select(
        "doc_id", surt_key_col().alias("surt")
    )


def _q_robots_rules(spark, sf_dir):
    """robots.txt parsing (RFC 9309 pinned subset): recover the wildcard
    group's Disallow rules from realistic multi-group files."""
    from search_engine_spark.operators.graph import (
        parse_robots,
        robots_fixture_texts,
    )

    return parse_robots(robots_fixture_texts(spark))


def _q_postings_pruned(spark, sf_dir):
    """Static index pruning (Carmel): top-N impact postings per term via
    the two-phase skew-safe selection."""
    from search_engine_spark.operators.pruning import prune_postings

    return prune_postings(ib.build_postings(load_documents(spark, sf_dir)))


Q_PASSAGE = ["data", "fast", "merge"]


def _q_best_passage(spark, sf_dir):
    """Best-passage selection: the 30-token window densest in query
    terms per doc, top-20 docs (match-anchored exact enumeration)."""
    from search_engine_spark.operators.positional import (
        best_passage,
        build_positional,
    )

    return best_passage(
        build_positional(load_documents(spark, sf_dir)), Q_PASSAGE
    )


def _q_coupling(spark, sf_dir):
    """Bibliographic coupling: pages citing the same targets (shared
    out-neighbor counts; the dual of cocitation)."""
    from search_engine_spark.operators.graph import (
        coupling,
        extract_links,
        linked_html,
        resolved_edges,
    )

    docs = load_documents(spark, sf_dir)
    return coupling(
        resolved_edges(docs, extract_links(linked_html(docs))), min_common=1
    )


def _q_percolate(spark, sf_dir):
    """Reverse search: stored conjunctive queries matched against the
    corpus in ONE plan (broadcast query table + relational division)."""
    from search_engine_spark.operators.search import percolate

    return percolate(ib.build_postings(load_documents(spark, sf_dir)))


def _q_cocitation(spark, sf_dir):
    """Co-citation related-pages pairs over the link graph (shared
    in-neighbor counts; threshold 1 on the synthetic tree+chain graph)."""
    from search_engine_spark.operators.graph import (
        cocitation,
        extract_links,
        linked_html,
        resolved_edges,
    )

    docs = load_documents(spark, sf_dir)
    return cocitation(
        resolved_edges(docs, extract_links(linked_html(docs))), min_common=1
    )


def _q_doc_signatures(spark, sf_dir):
    """Signature files: 63-bit superimposed term-set Bloom signature per
    doc (conjunctive pre-filter gate, Faloutsos-Christodoulakis)."""
    from search_engine_spark.operators.signatures import doc_signatures

    return doc_signatures(ib.build_postings(load_documents(spark, sf_dir)))


def _q_induced_stopwords(spark, sf_dir):
    """Corpus-induced stopwords: dictionary terms with df/N above the
    cutoff (the dynamic counterpart of the frozen stoplist)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return se.induced_stopwords(term_dict.select("term", "df"), n_docs)


def _q_crawl_delays(spark, sf_dir):
    """robots.txt Crawl-delay extraction for the wildcard group."""
    from search_engine_spark.operators.graph import (
        crawl_delays,
        robots_fixture_texts,
    )

    return crawl_delays(robots_fixture_texts(spark))


def _q_anchor_terms(spark, sf_dir):
    """Anchor-field postings: inbound anchor text harvested per target
    doc (regexp pair-extract + resolve join + shared tokenize path)."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
    )

    return anchor_postings(anchored_html(load_documents(spark, sf_dir)))


def _q_search_bm25f(spark, sf_dir):
    """BM25F fielded ranking: body + inbound-anchor fields, weighted
    length-normalized tf summed before saturation (Zaragoza et al.)."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_bm25f,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    anchor = anchor_postings(anchored_html(docs))
    return search_bm25f(
        postings, anchor, doc_stats, n_docs, avgdl, Q_BM25F
    )


def _q_query_clarity(spark, sf_dir):
    """Query-performance prediction (Cronen-Townsend clarity): KL
    contributions of the hit-set language model vs the collection
    model for the standard 2-term query."""
    from search_engine_spark.operators.textstats import clarity_score

    docs, postings = _search_ctx(spark, sf_dir)
    return clarity_score(postings, Q_AND2)


def _q_search_synonym_graph(spark, sf_dir):
    """Multi-word synonym graph (Lucene SynonymGraphFilter): phrase
    variants form one pseudo-term per group — (fast table | sort table)
    AND (hash join | merge), Σ-variant-tf scoring."""
    from search_engine_spark.operators.positional import (
        build_positional,
        search_synonym_graph,
    )
    from search_engine_spark.textproc.synonyms import expand_phrase_groups

    return search_synonym_graph(
        build_positional(load_documents(spark, sf_dir)),
        expand_phrase_groups(),
    )


def _q_search_combined_fields(spark, sf_dir):
    """ES combined_fields: body+anchor merge into ONE synthetic field
    (weighted tf and length addition) before a single BM25 — the fourth
    multi-field model beside BM25F / dis_max / cross_fields."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_combined_fields,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    anchor = anchor_postings(anchored_html(docs))
    return search_combined_fields(
        postings, anchor, doc_stats, n_docs, avgdl, Q_BM25F
    )


def _q_web_ranking(spark, sf_dir):
    """The composed web-search ranking stack, one plan end-to-end:
    BM25F over body+inbound-anchor fields -> PageRank authority blend ->
    one-result-per-site collapse (SERP diversification)."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_bm25f,
    )
    from search_engine_spark.operators.graph import (
        blend_authority,
        extract_links,
        pagerank,
        resolved_edges,
    )
    from search_engine_spark.sources.documents import site_key_col

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    da = anchored_html(docs)
    hits = search_bm25f(
        postings, anchor_postings(da), doc_stats, n_docs, avgdl, Q_BM25F,
        limit=1_000_000,
    )
    pr = pagerank(docs, resolved_edges(docs, extract_links(da)))
    blended = blend_authority(hits, pr, limit=1_000_000)
    return se.collapse_hits(blended.withColumn("site_key", site_key_col()))


def _q_pagerank(spark, sf_dir):
    """Fixed-iteration PageRank over the extracted link graph (authority
    prior for curation); N-scaled, 4 dp."""
    from search_engine_spark.operators.graph import (
        extract_links,
        linked_html,
        pagerank,
        resolved_edges,
    )

    docs = load_documents(spark, sf_dir)
    edges = resolved_edges(docs, extract_links(linked_html(docs)))
    return pagerank(docs, edges)


Q_FUZZY = ["dat", "fast"]  # 'dat' is a typo; distance-1 correction → 'data'
SUGGEST_TOKEN = "dta"      # term-suggester probe: transposition typo of 'data'
Q_BATCH = {
    "q_rare": Q_BM25,
    "q_common": Q_BM25_COMMON,
    "q_pair": Q_AND2,
    "q_dead": Q_OR,  # contains an absent term → conjunctively empty
}


def _q_search_bm25_batch(spark, sf_dir):
    """Whole query workload scored in one postings pass; per-query top-k
    via WindowGroupLimit."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25_batch(
        spark, postings, term_dict, doc_stats, n_docs, avgdl, Q_BATCH
    )


def _q_search_fuzzy(spark, sf_dir):
    """Query-time spell correction: unknown terms replaced by their top
    distance-1 dictionary suggestion before the conjunctive BM25 runs."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_fuzzy(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_FUZZY
    )


def _q_search_authority(spark, sf_dir):
    """Web ranking: BM25 relevance blended with PageRank authority —
    score' = bm25 · (0.5 + 0.5·pr) over the full candidate set."""
    from search_engine_spark.operators.graph import (
        blend_authority,
        extract_links,
        linked_html,
        pagerank,
        resolved_edges,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    hits = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        limit=1_000_000,
    )
    pr = pagerank(docs, resolved_edges(docs, extract_links(linked_html(docs))))
    return blend_authority(hits, pr)


TRUST_SEED_MOD = 50  # fixture trusted-seed set: doc_id % 50 == 0


def _q_trustrank(spark, sf_dir):
    """Personalized PageRank from a trusted seed set (spam-demotion
    prior); teleport mass concentrated on doc_id % 50 == 0."""
    from search_engine_spark.operators.graph import (
        extract_links,
        linked_html,
        resolved_edges,
        trustrank,
    )

    docs = load_documents(spark, sf_dir)
    edges = resolved_edges(docs, extract_links(linked_html(docs)))
    seeds = docs.filter(F.col("doc_id") % TRUST_SEED_MOD == 0).select("doc_id")
    return trustrank(docs, edges, seeds)


def _q_domain_authority(spark, sf_dir):
    """Host-level authority rollup over the PageRank table."""
    from search_engine_spark.operators.graph import (
        domain_authority,
        extract_links,
        linked_html,
        pagerank,
        resolved_edges,
    )

    docs = load_documents(spark, sf_dir)
    pr = pagerank(docs, resolved_edges(docs, extract_links(linked_html(docs))))
    return domain_authority(pr)


def _q_curation_funnel(spark, sf_dir):
    """The whole preprocessing funnel as one plan: status gate → line
    dedup → exact dedup → quality floor → lang filter → temperature
    sample, reporting rows kept per stage."""
    from search_engine_spark.operators.curation import curation_funnel

    return curation_funnel(load_documents(spark, sf_dir))


def _q_pq_codes(spark, sf_dir):
    """Product quantization: 64-dim float32 → 8 four-bit codes (the
    compression that fits 10^9 vectors in memory)."""
    from search_engine_spark.operators.similarity import pq_encode
    from search_engine_spark.sources.documents import load_embeddings

    return pq_encode(spark, load_embeddings(spark, sf_dir))


def _q_ann_pq(spark, sf_dir):
    """ADC top-k over PQ codes: the scan touches 4-byte codes, never raw
    vectors."""
    from search_engine_spark.operators.similarity import ann_pq
    from search_engine_spark.sources.documents import load_embeddings

    return ann_pq(spark, load_embeddings(spark, sf_dir), ANN_QUERY_IDS)


def _q_sq8_codes(spark, sf_dir):
    """int8 scalar quantization: per-dim min/max bounds, floor-scaled
    0..255 codes (Lucene/ES int8 dense-vector quantization) — exploded to
    (vec_id, dim, code) for the oracle compare."""
    from search_engine_spark.operators.similarity import sq8_bounds, sq8_encode
    from search_engine_spark.sources.documents import load_embeddings

    emb = load_embeddings(spark, sf_dir)
    codes = sq8_encode(emb, sq8_bounds(emb))
    return codes.select("vec_id", F.posexplode("codes").alias("dim", "code"))


def _q_ann_sq8(spark, sf_dir):
    """Two-stage quantized ANN: int8-code scan → top-20 per query →
    exact-cosine rescoring to top-k (the ES int8_hnsw quantize+rescore
    shape)."""
    from search_engine_spark.operators.similarity import ann_sq8
    from search_engine_spark.sources.documents import load_embeddings

    return ann_sq8(load_embeddings(spark, sf_dir), ANN_QUERY_IDS)


def _q_temperature_sample(spark, sf_dir):
    """mC4-style temperature-balanced language sampling (T=2):
    low-resource languages upweighted, membership pure-h60 deterministic."""
    from search_engine_spark.operators.sampling import temperature_sample

    return temperature_sample(load_documents(spark, sf_dir)).select(
        "doc_id", "lang"
    )


def _q_crawl_frontier_robots(spark, sf_dir):
    """Frontier with robots Disallow rules filtering the harvested links
    before scoring and the per-host budget."""
    from search_engine_spark.operators.graph import (
        ROBOTS_RULES,
        crawl_frontier,
        extract_links,
        frontier_html,
        robots_filter,
    )

    docs = load_documents(spark, sf_dir)
    rules = spark.createDataFrame(
        ROBOTS_RULES, "host string, path_prefix string"
    )
    links = robots_filter(extract_links(frontier_html(docs)), rules)
    return crawl_frontier(docs, links)


def _q_length_quantiles(spark, sf_dir):
    """Exact per-language token-length quantiles (curation thresholds)."""
    from search_engine_spark.operators.textstats import length_quantiles

    return length_quantiles(load_documents(spark, sf_dir))


def _q_dl_histogram(spark, sf_dir):
    """Doc-length histogram with corpus share per fixed-width bucket."""
    from search_engine_spark.operators.textstats import dl_histogram

    return dl_histogram(load_documents(spark, sf_dir))


def _q_crawl_frontier(spark, sf_dir):
    """I1/I2 batch-inverted: next crawl batch = harvested outlinks
    anti-joined against the crawled set, per-host politeness top-k."""
    from search_engine_spark.operators.graph import (
        crawl_frontier,
        extract_links,
        frontier_html,
    )

    docs = load_documents(spark, sf_dir)
    return crawl_frontier(docs, extract_links(frontier_html(docs)))


def _q_latest_revisions(spark, sf_dir):
    """Crawl-snapshot reconciliation: newest revision per logical page
    (max_by agg, not a window — one shuffle, no sort)."""
    from search_engine_spark.operators.curation import (
        latest_revisions,
        with_page_key,
    )

    out = latest_revisions(with_page_key(load_documents(spark, sf_dir)))
    return out.withColumn("warc_epoch", F.unix_timestamp("warc_ts")).drop(
        "warc_ts"
    )


def _q_line_dedup(spark, sf_dir):
    """CCNet-style corpus-wide duplicated-line removal, first occurrence
    wins; document text reassembled from surviving lines."""
    from search_engine_spark.operators.curation import (
        doc_lines,
        remove_duplicated_lines,
    )

    return remove_duplicated_lines(doc_lines(load_documents(spark, sf_dir)))


def _q_pii_redact(spark, sf_dir):
    """Vectorized email/IPv4/phone scrubbing with per-class counts over
    deterministically injected PII slices."""
    from search_engine_spark.operators.curation import pii_augment, redact_pii

    return redact_pii(pii_augment(load_documents(spark, sf_dir)))


def _q_c4_clean(spark, sf_dir):
    """C4 line rules + page-level drops over deterministically poisoned
    slices (lorem-ipsum / curly-brace injections)."""
    from search_engine_spark.operators.curation import c4_augment, c4_clean

    return c4_clean(c4_augment(load_documents(spark, sf_dir)))


def _q_snapshot_delta(spark, sf_dir):
    """Crawl-snapshot diff: added/removed/changed/unchanged per logical
    page between the cutoff crawl cut and now."""
    from search_engine_spark.operators.curation import snapshot_delta

    return snapshot_delta(load_documents(spark, sf_dir))


def _q_dsir_weights(spark, sf_dir):
    """DSIR importance log-weights (Xie et al. 2023): hashed
    unigram+bigram bucket models, target = English docs vs raw corpus."""
    from search_engine_spark.operators.curation import dsir_weights

    return dsir_weights(load_documents(spark, sf_dir))


def _q_domain_stats(spark, sf_dir):
    """Per-site curation rollup (the domain-level filter table)."""
    from search_engine_spark.operators.curation import domain_stats

    return domain_stats(load_documents(spark, sf_dir))


def _q_lang_id(spark, sf_dir):
    from search_engine_spark.operators.textstats import language_id

    return language_id(load_documents(spark, sf_dir))


def _q_token_counts(spark, sf_dir):
    from search_engine_spark.operators.textstats import token_counts

    return token_counts(load_documents(spark, sf_dir))


def _q_quality_scores(spark, sf_dir):
    from search_engine_spark.operators.textstats import quality_scores

    return quality_scores(load_documents(spark, sf_dir))


def _q_string_stats(spark, sf_dir):
    from search_engine_spark.operators.textstats import string_stats

    return string_stats(load_documents(spark, sf_dir))


def _q_weighted_avg(spark, sf_dir):
    from search_engine_spark.operators.textstats import weighted_avg_quality

    return weighted_avg_quality(load_documents(spark, sf_dir))


def _q_gopher_rules(spark, sf_dir):
    from search_engine_spark.operators.curation import gopher_rules

    return gopher_rules(load_documents(spark, sf_dir))


def _q_extended_stats(spark, sf_dir):
    from search_engine_spark.operators.textstats import extended_stats

    return extended_stats(load_documents(spark, sf_dir))


def _q_matrix_stats(spark, sf_dir):
    from search_engine_spark.operators.textstats import matrix_stats

    return matrix_stats(load_documents(spark, sf_dir))


def _q_range_agg(spark, sf_dir):
    from search_engine_spark.operators.textstats import range_agg

    return range_agg(load_documents(spark, sf_dir))


def _q_quality_model(spark, sf_dir):
    """Frozen-weight logistic quality classifier (LR filter) over the
    rounded quality-feature frame."""
    from search_engine_spark.operators.textstats import quality_model_scores

    return quality_model_scores(load_documents(spark, sf_dir))


def _q_fingerprints(spark, sf_dir):
    from search_engine_spark.operators.textstats import fingerprints

    return fingerprints(load_documents(spark, sf_dir))


def _q_lm_scores(spark, sf_dir):
    """Unigram-LM perplexity-proxy quality filter over the shared
    postings relation."""
    from search_engine_spark.operators.textstats import unigram_lm_scores

    return unigram_lm_scores(ib.build_postings(load_documents(spark, sf_dir)))


def _q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail: per-language perplexity terciles over the
    unigram-LM scores."""
    from search_engine_spark.operators.textstats import ccnet_buckets

    docs = load_documents(spark, sf_dir)
    return ccnet_buckets(docs, ib.build_postings(docs))


def _q_doc_keywords(spark, sf_dir):
    """Per-doc top-3 tf-idf keyword extraction (curation tagging)."""
    from search_engine_spark.operators.textstats import doc_keywords

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return doc_keywords(postings, term_dict, n_docs)


def _q_repetition_stats(spark, sf_dir):
    """Gopher-style token/bigram repetition signals (quality filtering)."""
    from search_engine_spark.operators.textstats import repetition_stats

    return repetition_stats(load_documents(spark, sf_dir))


def _q_contamination(spark, sf_dir):
    """Benchmark decontamination: word 8-gram overlap of the train split
    against the deterministic holdout (benchmark stand-in) split."""
    from search_engine_spark.operators.dedup import contamination

    return contamination(load_documents(spark, sf_dir))


def _q_dedup_exact(spark, sf_dir):
    from search_engine_spark.operators.dedup import exact_duplicates

    return exact_duplicates(load_documents(spark, sf_dir))


def _q_minhash(spark, sf_dir):
    from search_engine_spark.operators.dedup import minhash_signatures

    return minhash_signatures(load_documents(spark, sf_dir))


def _q_dedup_lsh_pairs(spark, sf_dir):
    from search_engine_spark.operators.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(load_documents(spark, sf_dir))


def _q_dedup_jaccard(spark, sf_dir):
    """Candidate-DRIVEN Jaccard verification (the scale default): exact
    intersection counts only for LSH band-collision pairs, never the
    corpus-wide quadratic shingle self-join."""
    from search_engine_spark.operators.dedup import (
        jaccard_pairs,
        lsh_candidate_pairs,
    )

    docs = load_documents(spark, sf_dir)
    return jaccard_pairs(
        docs, JACCARD_THRESHOLD, candidates=lsh_candidate_pairs(docs)
    )


def _q_dedup_clusters(spark, sf_dir):
    """Full near-dup pipeline: LSH candidates → candidate-driven Jaccard
    → connected components (min-label propagation; oracle = recursive-CTE
    transitive closure)."""
    from search_engine_spark.operators.dedup import dedup_clusters

    return dedup_clusters(load_documents(spark, sf_dir), JACCARD_THRESHOLD)


def _q_dedup_clusters_star(spark, sf_dir):
    """Same pipeline via alternating large/small-star CC (Kiveris et al.
    SoCC'14) — O(log n) rounds regardless of component diameter; must
    match the same recursive-CTE oracle as the propagation variant."""
    from search_engine_spark.operators.dedup import dedup_clusters

    return dedup_clusters(
        load_documents(spark, sf_dir), JACCARD_THRESHOLD, algorithm="star"
    )


def _q_dedup_canonical(spark, sf_dir):
    """Near-dup cluster representative election (keep-longest policy)."""
    from search_engine_spark.operators.dedup import cluster_representatives

    return cluster_representatives(
        load_documents(spark, sf_dir), JACCARD_THRESHOLD
    )


def _q_dup_spans(spark, sf_dir):
    """ExactSubstr span dedup (Lee et al. 2022, distributed window-
    fingerprint reformulation): maximal duplicated-token spans per doc."""
    from search_engine_spark.operators.spans import dup_spans

    return dup_spans(load_documents(spark, sf_dir))


def _q_mirror_hosts(spark, sf_dir):
    """Mirror-site detection: host pairs sharing cross-host near-dup
    documents (Bharat-Broder), from the LSH->Jaccard pair relation."""
    from search_engine_spark.operators.dedup import mirror_hosts

    return mirror_hosts(load_documents(spark, sf_dir), JACCARD_THRESHOLD)


def _q_curation_funnel2(spark, sf_dir):
    """Second curation funnel composing the round's new primitives:
    status gate -> near-dup cluster canonicalization -> LR quality
    model -> weighted sampling (stage, n_rows audit table)."""
    from search_engine_spark.operators.curation import curation_funnel_v2

    return curation_funnel_v2(
        load_documents(spark, sf_dir), JACCARD_THRESHOLD
    )


def _q_sample_stratified(spark, sf_dir):
    """Deterministic per-language mixing-ratio sample (pure h60 membership
    function — reproducible across engines/cluster sizes)."""
    from search_engine_spark.operators.sampling import stratified_sample

    return stratified_sample(
        load_documents(spark, sf_dir), SAMPLE_FRACTIONS
    ).select("doc_id", "lang")


def _q_sample_split(spark, sf_dir):
    """Disjoint deterministic train/holdout assignment."""
    from search_engine_spark.operators.sampling import split_train_holdout

    return split_train_holdout(
        load_documents(spark, sf_dir), HOLDOUT_FRACTION
    ).select("doc_id", "split")


def _q_sample_weighted(spark, sf_dir):
    """Efraimidis-Spirakis weighted sampling without replacement
    (length-proportional, deterministic h60 draw)."""
    from search_engine_spark.operators.sampling import weighted_sample

    return weighted_sample(load_documents(spark, sf_dir))


def _q_simhash(spark, sf_dir):
    from search_engine_spark.operators.dedup import simhash_signatures

    return simhash_signatures(load_documents(spark, sf_dir))


def _q_simhash_pairs(spark, sf_dir):
    from search_engine_spark.operators.dedup import simhash_near_pairs

    return simhash_near_pairs(load_documents(spark, sf_dir))


def _q_embedding_neardup(spark, sf_dir):
    """Exact all-pairs baseline — oracle/verification scale only."""
    from search_engine_spark.operators.dedup import embedding_near_pairs
    from search_engine_spark.sources.documents import load_embeddings

    return embedding_near_pairs(
        load_embeddings(spark, sf_dir), EMB_NEAR_THRESHOLD
    )


def _q_embedding_neardup_lsh(spark, sf_dir):
    """The scale default: near-dup pairs restricted to LSH buckets."""
    from search_engine_spark.operators.dedup import embedding_near_pairs_lsh
    from search_engine_spark.sources.documents import load_embeddings

    return embedding_near_pairs_lsh(
        load_embeddings(spark, sf_dir), EMB_NEAR_THRESHOLD
    )


def _q_knn_graph(spark, sf_dir):
    """Per-vector top-k neighbors inside IVF cells — the SemDeDup/curation
    backbone artifact; cell restriction bounds the quadratic term."""
    from search_engine_spark.operators.similarity import knn_graph
    from search_engine_spark.sources.documents import load_embeddings

    return knn_graph(load_embeddings(spark, sf_dir), k=5)


def _q_semdedup(spark, sf_dir):
    """SemDeDup keep/drop verdicts (Abbas et al. 2023): min-id
    representative per same-cell near-dup group."""
    from search_engine_spark.operators.similarity import semdedup
    from search_engine_spark.sources.documents import load_embeddings

    return semdedup(load_embeddings(spark, sf_dir), SEMDEDUP_THRESHOLD)


def _q_ann_bruteforce(spark, sf_dir):
    from search_engine_spark.operators.similarity import ann_bruteforce
    from search_engine_spark.sources.documents import load_embeddings

    return ann_bruteforce(load_embeddings(spark, sf_dir), ANN_QUERY_IDS)


def _q_ann_lsh_buckets(spark, sf_dir):
    from search_engine_spark.operators.similarity import lsh_buckets
    from search_engine_spark.sources.documents import load_embeddings

    return lsh_buckets(load_embeddings(spark, sf_dir))


def _q_ann_lsh(spark, sf_dir):
    from search_engine_spark.operators.similarity import ann_lsh
    from search_engine_spark.sources.documents import load_embeddings

    return ann_lsh(load_embeddings(spark, sf_dir), ANN_QUERY_IDS)


def _q_ivf_assign(spark, sf_dir):
    """IVF inverted-list assignment: nearest deterministic-sample centroid
    per vector, computed as one codegen argmax projection (no shuffle)."""
    from search_engine_spark.operators.similarity import (
        ivf_assign,
        ivf_centroid_rows,
    )
    from search_engine_spark.sources.documents import load_embeddings

    emb = load_embeddings(spark, sf_dir)
    return ivf_assign(emb, ivf_centroid_rows(emb))


def _q_ann_ivf(spark, sf_dir):
    """IVF-flat ANN: probe the nprobe nearest inverted lists, exact-cosine
    re-rank (the FAISS-style scale path beside hyperplane LSH)."""
    from search_engine_spark.operators.similarity import ann_ivf
    from search_engine_spark.sources.documents import load_embeddings

    return ann_ivf(load_embeddings(spark, sf_dir), ANN_QUERY_IDS)


def _load_events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _q_events_windowed(spark, sf_dir):
    from search_engine_spark.operators.events import windowed_counts

    return windowed_counts(_load_events(spark, sf_dir))


def _q_events_attribution(spark, sf_dir):
    """Per-user view→click interval join (the batch twin of the
    watermarked stream-stream join)."""
    from search_engine_spark.operators.events import attribution_pairs

    return attribution_pairs(_load_events(spark, sf_dir))


def _q_events_last_touch(spark, sf_dir):
    """Last-touch attribution: each click credited to its latest
    qualifying view (max_by, no per-click window sort)."""
    from search_engine_spark.operators.events import last_touch_attribution

    return last_touch_attribution(_load_events(spark, sf_dir))


def _q_events_sessionize(spark, sf_dir):
    from search_engine_spark.operators.events import sessionize

    return sessionize(_load_events(spark, sf_dir))


def _q_events_props(spark, sf_dir):
    from search_engine_spark.operators.events import props_extract

    return props_extract(_load_events(spark, sf_dir))


def _q_events_transitions(spark, sf_dir):
    """Query-flow-graph edges (Boldi et al. CIKM'08): consecutive
    same-user views within the session gap, self-loops dropped."""
    from search_engine_spark.operators.events import item_transitions

    return item_transitions(_load_events(spark, sf_dir))


def _q_events_abandonment(spark, sf_dir):
    """SERP-abandonment analytics: per day, sessions with views but no
    clicks vs engaged sessions."""
    from search_engine_spark.operators.events import session_abandonment

    return session_abandonment(_load_events(spark, sf_dir))


def _q_events_coec(spark, sf_dir):
    """COEC position-bias-corrected CTR over the click log (Zhang &
    Jones 2007): clicks / expected clicks under the global position
    prior — the relevance-feedback miner."""
    from search_engine_spark.operators.events import coec_scores

    return coec_scores(_load_events(spark, sf_dir))


def _q_events_rollup(spark, sf_dir):
    from search_engine_spark.operators.events import type_rollup

    return type_rollup(_load_events(spark, sf_dir))


def _q_rel_pricing(spark, sf_dir):
    from search_engine_spark.operators.relational import pricing_summary

    return pricing_summary(spark, sf_dir)


def _q_rel_revenue(spark, sf_dir):
    from search_engine_spark.operators.relational import revenue_by_nation

    return revenue_by_nation(spark, sf_dir)


def _q_rel_semi(spark, sf_dir):
    from search_engine_spark.operators.relational import customers_with_orders

    return customers_with_orders(spark, sf_dir)


def _q_rel_anti(spark, sf_dir):
    from search_engine_spark.operators.relational import customers_without_orders

    return customers_without_orders(spark, sf_dir)


def _q_rel_window(spark, sf_dir):
    from search_engine_spark.operators.relational import order_ranks

    return order_ranks(spark, sf_dir)


def _q_rel_rollup(spark, sf_dir):
    from search_engine_spark.operators.relational import status_rollup

    return status_rollup(spark, sf_dir)


def _q_rel_topk_group(spark, sf_dir):
    from search_engine_spark.operators.relational import top_parts_by_size

    return top_parts_by_size(spark, sf_dir)


def _q_rel_small_qty(spark, sf_dir):
    """TPC-H Q17 shape: correlated scalar subquery decorrelated into a
    per-part aggregate with a division-free predicate."""
    from search_engine_spark.operators.relational import small_quantity_revenue

    return small_quantity_revenue(spark, sf_dir)


def _q_kmeans_assign(spark, sf_dir):
    """One Lloyd k-means round over the embedding corpus (assign ->
    6dp-rounded mean update -> reassign; topic clustering)."""
    from search_engine_spark.operators.similarity import kmeans_refine
    from search_engine_spark.sources.documents import load_embeddings

    return kmeans_refine(load_embeddings(spark, sf_dir))


def _q_media_stats(spark, sf_dir):
    from search_engine_spark.operators.multimodal import media_stats

    return media_stats(load_documents(spark, sf_dir))


def _q_media_features(spark, sf_dir):
    from search_engine_spark.operators.multimodal import media_features

    return media_features(load_documents(spark, sf_dir))


def _q_image_features(spark, sf_dir):
    """REAL image decode: deterministic grayscale PNGs are synthesized
    per document (shared pixel law), then pixel stats are computed from
    a full dependency-free PNG decode (zlib inflate + all five scanline
    unfilters — operators/png_codec.py). The oracle computes the same
    stats directly from the law, so value-hash parity proves the codec
    round-trip bit-exact."""
    from search_engine_spark.operators.multimodal import (
        image_pixel_features,
        synth_png_images,
    )

    return image_pixel_features(synth_png_images(load_documents(spark, sf_dir)))


def _q_media_frames(spark, sf_dir):
    """Uniform frame sampling over the opaque media payload — real byte
    offsets/slices/hashes, stubbed codec (multimodal.frame_sample)."""
    from search_engine_spark.operators.multimodal import frame_sample

    return frame_sample(load_documents(spark, sf_dir))


def _q_search_keyset(spark, sf_dir):
    """Keyset ('search_after') page 2: cursor = last row of page 1; the
    oracle states the page as OFFSET/LIMIT — equality proves the keyset
    predicate reproduces offset paging under the pinned total order."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    page1_df = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON, limit=10
    )
    page1 = page1_df.collect()
    if not page1:
        # no page 1 (query terms absent from this corpus) → the page
        # after it is empty too, matching the oracle's OFFSET past-end
        return page1_df.limit(0)
    last = page1[-1]
    return se.search_bm25_after(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        after_score=last["score"], after_doc_id=last["doc_id"], limit=10,
    )


def _q_term_vectors(spark, sf_dir):
    from search_engine_spark.operators.positional import (
        build_positional,
        term_vectors,
    )

    return term_vectors(
        build_positional(load_documents(spark, sf_dir)), TV_DOC_IDS
    )


def _q_facet_datehist(spark, sf_dir):
    docs, postings = _search_ctx(spark, sf_dir)
    return se.facet_date_histogram(docs, postings, Q_AND2, bucket_secs=3600)


def _q_stats_bucket(spark, sf_dir):
    """ES sibling pipeline agg stats_bucket: one summary row over the
    query's hourly hit histogram — the sibling-family complement of the
    per-bucket parent pipeline aggs."""
    from search_engine_spark.operators.bucket_aggs import stats_bucket

    docs, postings = _search_ctx(spark, sf_dir)
    return stats_bucket(docs, postings, Q_AND2, bucket_secs=3600)


def _q_significant_terms(spark, sf_dir):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.significant_terms(postings, term_dict, n_docs, Q_AND2)


def _q_search_wildcard(spark, sf_dir):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_wildcard(
        postings, term_dict, doc_stats, n_docs, avgdl, WILDCARD_PAT
    )


def _q_search_qstring(spark, sf_dir):
    """Nested boolean grammar (parens, OR, NOT): one parse evaluated as
    doc-set algebra on both engines."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_query_string(docs, postings, QSTRING)


def _q_search_regexp(spark, sf_dir):
    """Regexp query (Lucene RegexpQuery rewrite): full-term anchored
    dictionary expansion, disjunctive BM25 over the matched terms."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_regexp(
        postings, term_dict, doc_stats, n_docs, avgdl, REGEXP_PAT
    )


def _q_search_wildcard_rev(spark, sf_dir):
    """Leading wildcard — exercises the reversed-term sargable route."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_wildcard(
        postings, term_dict, doc_stats, n_docs, avgdl, WILDCARD_REV_PAT
    )


def _q_explain_score(spark, sf_dir):
    """Score breakdown of the query's top-1 hit (ES _explain shape)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    top = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON, limit=1
    ).collect()
    # No conjunctive hit (possible on adversarial corpora): the oracle's
    # top1 CTE is empty, so mirror with an impossible doc_id — same
    # schema, zero rows.
    doc_id = top[0]["doc_id"] if top else -1
    return se.explain_score(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        doc_id=doc_id,
    )


def _q_search_msm(spark, sf_dir):
    """minimum_should_match=2 over a 3-term query — the AND/OR middle."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25_msm(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25,
        min_should_match=2,
    )


def _q_ltr_features(spark, sf_dir):
    """LTR feature logging: one (bm25, coordination, length, tf, idf)
    feature row per candidate of the 3-term query, single-pass."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.ltr_features(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )


def _q_search_rm3(spark, sf_dir):
    """RM3 pseudo-relevance feedback: conjunctive top-5 as silent
    judgments, 3 expansion terms, weighted disjunctive re-score."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_rm3(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_AND2
    )


def _q_search_relaxed(spark, sf_dir):
    """AND→OR relaxation where the AND rung is empty ('quantumflux' is
    corpus-absent), so the result is the OR fallback over 'data'."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25_relaxed(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_RELAXED
    )


def _q_search_relaxed_and(spark, sf_dir):
    """Relaxation ladder where the strict rung HITS — must equal plain
    conjunctive search_bm25 with matched_mode='and'."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25_relaxed(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25
    )


def _q_search_per_lang(spark, sf_dir):
    """Per-language collection statistics: conjunctive BM25 top-5 inside
    each lang slice (idf/avgdl/N all lang-scoped)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25_per_lang(
        docs, postings, doc_stats, Q_BM25_COMMON, k_per_lang=5
    )


def _q_search_diversified(spark, sf_dir):
    """MMR re-rank of the BM25 top-20: 5 greedy picks trading relevance
    against embedding-cosine similarity to the already-picked set, the
    whole greedy trace unrolled into one declarative plan."""
    from search_engine_spark.sources.documents import load_embeddings

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_diversified(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        load_embeddings(spark, sf_dir),
    )


def _q_search_hybrid(spark, sf_dir):
    """Hybrid lexical×vector RRF fusion (ES 8.x rrf retriever shape)."""
    from search_engine_spark.sources.documents import load_embeddings

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_hybrid_rrf(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        load_embeddings(spark, sf_dir), query_vec_id=HYBRID_QUERY_VEC,
    )


def _q_facet_stats(spark, sf_dir):
    """ES stats aggregation of n_chars over the conjunctive hit set."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.facet_stats(docs, postings, Q_AND2)


def _q_search_sorted(spark, sf_dir):
    """Sort-by-field search: conjunctive matches ordered by crawl time
    (newest first) instead of relevance."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.search_sorted_by_time(docs, postings, Q_AND2)


def _q_facet_top_hits(spark, sf_dir):
    """ES top_hits: best 3 hits inside every site facet bucket."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.facet_top_hits(docs, postings, Q_AND2)


def _q_search_filtered(spark, sf_dir):
    """BM25 in filter context: non-scoring metadata gate (lang='en' AND
    inside the crawl window) over the disjunctive common-term query —
    scores stay identical to the unfiltered ranking."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    allowed = docs.filter(
        (F.col("lang") == "en")
        & (F.col("warc_ts") >= F.timestamp_seconds(F.lit(FILTER_EPOCH)))
    ).select("doc_id")
    return se.search_bm25_filtered(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON, allowed
    )


def _q_search_lmd(spark, sf_dir):
    """Dirichlet query-likelihood ranking (Lucene LMDirichletSimilarity)
    — the pluggable alternative similarity over the same postings."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_lmd(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )


def _q_search_lmjm(spark, sf_dir):
    """Jelinek-Mercer query likelihood (Lucene LMJelinekMercerSimilarity)
    — fixed-interpolation smoothing beside LMD's Dirichlet prior."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_lmjm(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25
    )


def _q_search_dfr(spark, sf_dir):
    """Divergence-from-randomness I(n)L2 (Lucene DFRSimilarity) — the
    third pluggable similarity family over the same postings."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_dfr(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )


def _q_search_ib(spark, sf_dir):
    """Information-based log-logistic/TTF/H2 (Lucene IBSimilarity) — the
    Clinchant-Gaussier family; absent query terms drop out (OR set)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_ib(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_OR
    )


def _q_search_bm25_plus(spark, sf_dir):
    """BM25+ (Lv & Zhai CIKM'11): δ-lower-bounded tf normalization —
    long docs can't score below a short doc's single occurrence."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_bm25_plus(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )


GEO_PARIS = (48.8566, 2.3522)
GEO_NYC = (40.7128, -74.006)
GEO_RADIUS_M = 3_000_000.0
GEO_RING_EDGES = [2_000_000.0, 5_000_000.0, 10_000_000.0]


def _q_geo_centroid(spark, sf_dir):
    """ES geo_centroid per site — exact integer-micro-degree sums, one
    combinable groupBy."""
    from search_engine_spark.operators.geo import geo_centroid

    return geo_centroid(load_documents(spark, sf_dir))


def _q_bp_reorder(spark, sf_dir):
    """Recursive-graph-bisection doc-id reordering (Dhulipala et al.
    KDD'16; Lucene 9 BPIndexReorderer) — the compression-optimal
    upgrade of url_reorder. NO ORACLE by design: the mapping is an
    iterative local optimization (per-shard bisection with gain-ranked
    swaps), not SQL-expressible; correctness is pinned by
    tests/test_reorder.py (permutation validity, determinism,
    spark==pure-python per shard, measured index shrinkage with the
    real codec, and the committed sf0.001 golden permutation
    tests/golden_bp_reorder_sf001.json that catches silent drift)."""
    from search_engine_spark.operators.reorder import bp_ordered_ids

    docs = load_documents(spark, sf_dir)
    return bp_ordered_ids(docs, ib.build_postings(docs), n_shards=4)


def _q_geo_distance(spark, sf_dir):
    """ES geo_distance query + _geo_distance sort: closest docs within
    3,000 km of Paris over the derived deterministic geo_point."""
    from search_engine_spark.operators.geo import geo_distance_search

    docs = load_documents(spark, sf_dir)
    return geo_distance_search(docs, *GEO_PARIS, GEO_RADIUS_M)


def _q_geo_bbox(spark, sf_dir):
    """ES geo_bounding_box with ANTIMERIDIAN WRAP (min_lon > max_lon):
    the Pacific band ±30° lat, 150°E → 150°W — integer-exact edges."""
    from search_engine_spark.operators.geo import geo_bounding_box

    docs = load_documents(spark, sf_dir)
    return geo_bounding_box(docs, -30.0, 30.0, 150.0, -150.0)


def _q_geotile_grid(spark, sf_dir):
    """ES geotile_grid aggregation at zoom 4: web-mercator z/x/y tile
    doc counts, top 15 buckets (pinned tiebreak: tile key asc)."""
    from search_engine_spark.operators.geo import geotile_grid

    docs = load_documents(spark, sf_dir)
    return geotile_grid(docs, zoom=4, size=15)


def _q_geo_rings(spark, sf_dir):
    """ES geo_distance aggregation: concentric half-open rings around
    NYC with min/max distance sub-metrics."""
    from search_engine_spark.operators.geo import geo_distance_rings

    docs = load_documents(spark, sf_dir)
    return geo_distance_rings(docs, *GEO_NYC, GEO_RING_EDGES)


def _q_search_span_not(spark, sf_dir):
    """Lucene SpanNotQuery: 'data' occurrences NOT adjacent (±1) to a
    'fast' occurrence — negative positional filtering, ranked by
    surviving-occurrence count."""
    from search_engine_spark.operators.positional import search_span_not

    return search_span_not(load_documents(spark, sf_dir), "data", "fast")


def _q_distance_feature(spark, sf_dir):
    """ES distance_feature query: saturating proximity ranker
    boost·pivot/(pivot+distance) from Paris, pivot 1,000 km — every doc
    scores (no radius filter), top-20."""
    from search_engine_spark.operators.geo import distance_feature

    docs = load_documents(spark, sf_dir)
    return distance_feature(docs, *GEO_PARIS, pivot_m=1_000_000.0)


def _q_boxplot(spark, sf_dir):
    """ES boxplot aggregation over the token count — exact interpolated
    quartiles (ES uses TDigest; this engine upgrades to exact)."""
    from search_engine_spark.operators.bucket_aggs import boxplot_agg

    return boxplot_agg(load_documents(spark, sf_dir))


def _q_t_test(spark, sf_dir):
    """ES t_test (Welch / heteroscedastic) between lang='en' docs and
    the rest over token counts — exact integer moments."""
    from search_engine_spark.operators.bucket_aggs import t_test_agg

    return t_test_agg(load_documents(spark, sf_dir))


def _q_search_rerank(spark, sf_dir):
    """Retrieve-then-rerank: BM25 top-50 candidates re-ordered by
    embedding cosine (the bi-encoder rerank stage of a RAG stack)."""
    from search_engine_spark.sources.documents import load_embeddings

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return se.search_semantic_rerank(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        load_embeddings(spark, sf_dir), query_vec_id=HYBRID_QUERY_VEC,
    )


def _q_datehist_pipeline(spark, sf_dir):
    """Derivative + trailing moving average stacked on the date histogram."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.datehist_pipeline(docs, postings, Q_AND2, bucket_secs=3600)


def _q_datehist_pipeline2(spark, sf_dir):
    """cumulative_sum + serial_diff + bucket_script + bucket_selector."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.datehist_pipeline2(docs, postings, Q_AND2, bucket_secs=3600)


def _q_auto_datehist(spark, sf_dir):
    """Pick a bucket interval from the ladder to hit ~20 bars, then bucket."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.auto_date_histogram(docs, postings, Q_AND2, target_buckets=20)


def _q_top_metrics(spark, sf_dir):
    """Per-site argmax: the newest crawl's metrics via ONE struct-max agg."""
    return se.top_metrics(load_documents(spark, sf_dir))


def _q_terms_set(spark, sf_dir):
    """Per-doc dynamic minimum-should-match (minimum_should_match_field)."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.terms_set_query(docs, postings, Q_BM25)


def _q_term_suggester(spark, sf_dir):
    """'Did you mean' — Levenshtein ≤ 2 dictionary candidates for a typo."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.term_suggester(ib.build_term_dict(postings), SUGGEST_TOKEN)


def _q_rank_eval(spark, sf_dir):
    """NDCG@10 / MRR / P@10 of disjunctive BM25 vs tf-derived qrels."""
    from search_engine_spark.operators.evaluation import rank_eval

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(spark, sf_dir)
    return rank_eval(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON, k=10
    )


def _q_hll_vocab(spark, sf_dir):
    """Per-site HLL vocabulary-size estimate (deterministic registers)."""
    from search_engine_spark.operators.sketches import hll_distinct
    from search_engine_spark.sources.documents import site_key_col

    docs, postings = _search_ctx(spark, sf_dir)
    keyed = postings.withColumn("site_key", site_key_col())
    return hll_distinct(keyed, "term", ["site_key"])


def _q_cm_heavy_hitters(spark, sf_dir):
    """Top-20 terms by count-min estimated collection frequency."""
    from search_engine_spark.operators.sketches import cm_heavy_hitters

    docs, postings = _search_ctx(spark, sf_dir)
    return cm_heavy_hitters(postings, ib.build_term_dict(postings), k=20)


def _q_export_shards(spark, sf_dir):
    """Token-balanced training-export shard assignment (hierarchical
    prefix sum — no global window; operators/export.py)."""
    from search_engine_spark.operators.export import token_balanced_shards

    return token_balanced_shards(load_documents(spark, sf_dir), n_shards=16)


def _q_export_manifest(spark, sf_dir):
    from search_engine_spark.operators.export import (
        shard_manifest,
        token_balanced_shards,
    )

    return shard_manifest(
        token_balanced_shards(load_documents(spark, sf_dir), n_shards=16)
    )


def _q_pack_sequences(spark, sf_dir):
    """Greedy sequence packing into ≤512-token training examples."""
    from search_engine_spark.operators.export import pack_sequences

    return pack_sequences(load_documents(spark, sf_dir), cap=512,
                          buckets=64)


def _q_chunk_docs(spark, sf_dir):
    """Sliding token-window chunking (32-token windows, 8 overlap) — the
    RAG/embedding-indexing twin of pack_sequences; zero-shuffle codegen."""
    from search_engine_spark.operators.export import chunk_documents

    return chunk_documents(load_documents(spark, sf_dir), chunk_size=32,
                           overlap=8)


CONTAIN_THRESHOLD = 0.6
ANN_FILTER_LABELS = [0, 2, 4, 6, 8]


def _q_search_dismax(spark, sf_dir):
    """ES multi_match best_fields (dis_max + tie_breaker) over the body
    and inbound-anchor fields, each scored as its own BM25 index."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_dismax,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    anchor = anchor_postings(anchored_html(docs))
    return search_dismax(
        postings, anchor, doc_stats, n_docs, avgdl, Q_BM25F
    )


def _q_search_sdm(spark, sf_dir):
    """Sequential dependence model (Metzler-Croft MRF): Dirichlet LM
    over unigram + ordered-bigram + unordered-uw8 features from the
    positional stream."""
    from search_engine_spark.operators.positional import (
        build_positional,
        search_sdm,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return search_sdm(build_positional(docs), doc_stats, Q_SDM)


def _q_search_prox_boost(spark, sf_dir):
    """Tao-Zhai MinDist proximity-boosted conjunctive BM25."""
    from search_engine_spark.operators.positional import (
        build_positional,
        search_prox_boost,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return search_prox_boost(
        build_positional(docs), postings, term_dict, doc_stats,
        n_docs, avgdl, Q_AND2,
    )


def _q_search_vsm(spark, sf_dir):
    """SMART lnc.ltc vector-space cosine ranking (the third classical
    similarity family beside BM25 and LM-Dirichlet)."""
    from search_engine_spark.operators.search import search_vsm

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return search_vsm(postings, term_dict, n_docs, Q_BM25)


def _q_impact_postings(spark, sf_dir):
    """Anh-Moffat 8-bit quantized impact postings (index-time scores)."""
    from search_engine_spark.operators.impact import quantized_impacts

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return quantized_impacts(
        postings, term_dict, doc_stats, n_docs, avgdl
    )


def _q_search_impact(spark, sf_dir):
    """Integer-add disjunctive top-k over the quantized impact index."""
    from search_engine_spark.operators.impact import (
        quantized_impacts,
        search_impact,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    return search_impact(imp, Q_BM25)


def _q_search_champions(spark, sf_dir):
    """Bounded-error top-k from PERSISTED champion lists (Anh-Moffat
    pruned impact index): per-(doc_bucket, term) top-8 impact prefix
    with stored tail cutoffs; error_ub is the exact tail bound. The
    serving surface that makes head-term latency prefix-bound instead
    of posting-mass-bound (BENCH/QUERIES.md)."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        quantized_impacts,
        search_champions,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    return search_champions(champion_lists(imp, budget_per_bucket=8), Q_BM25)


def _q_search_champions_and(spark, sf_dir):
    """Conjunctive (engine-default AND) serving from the persisted
    champion lists, with per-doc certainty: complete runs make absence
    definitive (eliminate), truncated runs leave a bounded maybe band."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        quantized_impacts,
        search_champions_and,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    return search_champions_and(
        champion_lists(imp, budget_per_bucket=8), Q_BM25
    )


def _q_search_champions_fused(spark, sf_dir):
    """search_champions served from the ONE-PASS block-level champion
    build (champion_lists_fused: numpy quantize+select inside
    applyInPandas over the compressed block store, dl from dl_bytes, df
    via vocab-scale join — zero corpus-scale shuffles). Shares
    search_champions' oracle mirror, so the driver hash-verifies the
    fused builder emits the identical table."""
    import hashlib
    import os
    import tempfile

    from search_engine_spark import catalog
    from search_engine_spark.operators.impact import (
        champion_lists_fused,
        search_champions,
    )

    docs = load_documents(spark, sf_dir)
    per = _CTX_CACHE.setdefault(spark, {})
    key = ("champ_fused_store", sf_dir)
    if key not in per:
        # deterministic, REUSABLE location (not mkdtemp): repeated gate
        # runs resume the committed store via its fingerprint instead of
        # leaking one full index per process (r04 review finding)
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:12]
        d = os.path.join(
            tempfile.gettempdir(), f"champ_fused_idx_{tag}"
        )
        store = catalog.IndexStore(spark, d, n_buckets=16)
        catalog.build_persistent(docs, store)
        per[key] = store
    store = per[key]
    stats = store.read_corpus_stats()
    champs = champion_lists_fused(
        store.read_blocks(),
        store.read_term_dict(),
        stats["n_docs"],
        float(stats["avgdl"]),
        budget_per_bucket=8,
        store_n_buckets=16,
    )
    return search_champions(champs, Q_BM25)


BATCH_CHAMP_QUERIES = {
    "q_common": ["data", "fast", "join"],
    "q_mixed": ["dup", "data", "fast"],
    "q_single": ["data"],
}


def _q_search_champions_batch(spark, sf_dir):
    """Whole query workload served from the champion table in one pass
    (the batch twin of search_bm25_batch on the pruned tier): shared
    champion rows across queries, per-query bounded-error top-k."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        quantized_impacts,
        search_champions_batch,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    return search_champions_batch(
        spark, champion_lists(imp, budget_per_bucket=8), BATCH_CHAMP_QUERIES
    )


def _q_search_impact_and(spark, sf_dir):
    """EXACT conjunctive top-k over the full quantized impact table —
    the ground-truth ranking the two-tier serve is pinned against."""
    from search_engine_spark.operators.impact import (
        quantized_impacts,
        search_impact_and,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    return search_impact_and(imp, Q_BM25)


def _q_search_two_tier(spark, sf_dir):
    """COMPOSED two-tier serve (r03-verdict item #1): champion tier
    (budget-8 pruned index) scores and certifies; only the maybe band
    — uncertain candidates whose upper bound crosses the k-th certain
    score, plus all-runs-truncated buckets that could hide docs — is
    rescoped through the exact impact path. The oracle mirror is the
    EXACT conjunctive ranking (search_impact_and_sql), so the driver
    hash-verifies two-tier == exact, not merely 'close'."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        quantized_impacts,
        search_two_tier,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    return search_two_tier(
        imp, champion_lists(imp, budget_per_bucket=8), Q_BM25
    )


def _q_search_two_tier_or(spark, sf_dir):
    """Disjunctive two-tier serve (OR certainty algebra: error_ub==0 is
    certain, hidden docs bounded by the bucket's truncated-run cutoff
    sum). Oracle mirror is the EXACT disjunctive impact ranking, so the
    driver hash proves OR-two-tier == exact."""
    from search_engine_spark.operators.impact import (
        champion_lists,
        quantized_impacts,
        search_two_tier_or,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    imp = quantized_impacts(postings, term_dict, doc_stats, n_docs, avgdl)
    return search_two_tier_or(
        imp, champion_lists(imp, budget_per_bucket=8), Q_BM25
    )


def _q_rate_agg(spark, sf_dir):
    """ES rate agg in a daily date_histogram: per-hour-normalized
    counts and DECIMAL-exact value sums."""
    from search_engine_spark.operators.events import rate_agg

    return rate_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_variable_width_histogram(spark, sf_dir):
    """ES variable_width_histogram: equal-frequency clusters at exact
    interpolated quantiles of integer cents (deterministic spec for
    ES's streaming clustering heuristic)."""
    from search_engine_spark.operators.events import (
        variable_width_histogram,
    )

    return variable_width_histogram(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _q_change_point(spark, sf_dir):
    """ES change_point (ML): deterministic argmax mean-shift split of
    the daily count series."""
    from search_engine_spark.operators.events import change_point

    return change_point(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_cumulative_cardinality(spark, sf_dir):
    """ES x-pack cumulative_cardinality pipeline agg: exact
    distinct-users-to-date via per-user first-seen day (no HLL)."""
    from search_engine_spark.operators.events import (
        cumulative_cardinality,
    )

    return cumulative_cardinality(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _q_events_retention(spark, sf_dir):
    """Cohort retention triangle: (cohort_day, day_offset, n_users)
    over distinct (user, day) activity."""
    from search_engine_spark.operators.events import events_retention

    return events_retention(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _q_normalize_agg(spark, sf_dir):
    """ES normalize pipeline agg: percent_of_sum + rescale_0_100 over
    the daily count histogram."""
    from search_engine_spark.operators.events import normalize_agg

    return normalize_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_significant_text(spark, sf_dir):
    """ES significant_text (JLH heuristic), exact full-foreground spec
    over the conjunctive hit set."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return se.significant_text(postings, term_dict, n_docs, Q_AND2)


def _q_mojibake_stats(spark, sf_dir):
    """Encoding-corruption signal: frozen mojibake marker-char counts
    per page, per-1k-chars rate."""
    from search_engine_spark.operators.curation import mojibake_stats
    from search_engine_spark.sources.documents import load_documents

    return mojibake_stats(load_documents(spark, sf_dir))


def _q_boilerplate_lines(spark, sf_dir):
    """Per-site boilerplate detector: lines on >=2 pages and >=2% of
    the site's pages (Kohlschütter-style shallow text features;
    min_frac=0.02 is the gate-scale parameterization — the synthetic
    corpus repeats template chunks far more sparsely than real site
    chrome, where production uses 0.5)."""
    from search_engine_spark.operators.curation import boilerplate_lines
    from search_engine_spark.sources.documents import load_documents

    return boilerplate_lines(load_documents(spark, sf_dir), min_frac=0.02)


def _q_remove_boilerplate(spark, sf_dir):
    """Pages reassembled with their site's boilerplate lines dropped
    (same gate-scale min_frac=0.02 as boilerplate_lines, so the gate
    actually exercises the removal path)."""
    from search_engine_spark.operators.curation import remove_boilerplate
    from search_engine_spark.sources.documents import load_documents

    return remove_boilerplate(load_documents(spark, sf_dir), min_frac=0.02)


def _q_bpe_pairs(spark, sf_dir):
    """BPE tokenizer-training pair counts: occurrence-weighted adjacent
    character pairs over surface tokens, top-50."""
    from search_engine_spark.operators.bpe import bpe_pairs
    from search_engine_spark.sources.documents import load_documents

    return bpe_pairs(load_documents(spark, sf_dir))


def _q_categorize_text(spark, sf_dir):
    """ES categorize_text (ML log categorization): digit-collapsed
    templates, top-k by doc count."""
    from search_engine_spark.operators.textstats import categorize_text

    return categorize_text(load_documents(spark, sf_dir))


def _q_frequent_item_sets(spark, sf_dir):
    """ES frequent_item_sets (pairwise tier): term-pair co-occurrence
    support over per-doc distinct retained terms."""
    from search_engine_spark.operators.textstats import frequent_item_sets

    return frequent_item_sets(load_documents(spark, sf_dir))


def _q_containment(spark, sf_dir):
    """Broder containment pairs (asymmetric near-dup: quoted-inside
    detection), candidate-driven from LSH band collisions."""
    from search_engine_spark.operators.dedup import (
        containment_pairs,
        lsh_candidate_pairs,
    )

    docs = load_documents(spark, sf_dir)
    return containment_pairs(
        docs, CONTAIN_THRESHOLD, candidates=lsh_candidate_pairs(docs)
    )


def _q_ann_filtered(spark, sf_dir):
    """Filtered vector search: exact cosine top-k among label-allowed
    candidates (ES knn.filter pre-filter semantics)."""
    from search_engine_spark.operators.similarity import ann_filtered
    from search_engine_spark.sources.documents import load_embeddings

    return ann_filtered(
        load_embeddings(spark, sf_dir), ANN_QUERY_IDS, ANN_FILTER_LABELS
    )


def _q_cdx_lines(spark, sf_dir):
    """CDXJ capture-index lines (SURT key + ts14 + pinned JSON block)."""
    from search_engine_spark.sources.warc import cdx_lines

    return cdx_lines(load_documents(spark, sf_dir))


def _q_search_near(spark, sf_dir):
    """Unordered SpanNear: both terms within a window of 2+slop
    positions in any order (minimal-cover reduction)."""
    from search_engine_spark.operators.positional import (
        search_near_unordered,
    )

    return search_near_unordered(
        load_documents(spark, sf_dir), "data fast", slop=2
    )


def _q_dict_blocks_roundtrip(spark, sf_dir):
    """Front-coded dictionary blocks: decode∘encode must reproduce the
    term dictionary exactly (Lucene .tim-style prefix compression)."""
    from search_engine_spark.operators.dictionary import (
        decode_front_blocks,
        front_code_blocks,
    )

    docs, postings = _search_ctx(spark, sf_dir)
    term_dict = ib.build_term_dict(postings)
    return decode_front_blocks(front_code_blocks(term_dict))


def _q_terms_agg(spark, sf_dir):
    """ES sharded terms aggregation: per-shard top-N cut, coordinator
    merge, honest doc_count_error_upper_bound per bucket."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.terms_agg_sharded(postings, size=10, shard_size=5)


def _q_index_stats(spark, sf_dir):
    """One-row index introspection over the compressed block metadata
    (posting-tier _stats)."""
    from search_engine_spark.operators.blocks import build_posting_blocks
    from search_engine_spark.plans.statistics import index_stats

    docs, postings = _search_ctx(spark, sf_dir)
    return index_stats(build_posting_blocks(postings, 16))


def _q_rare_terms(spark, sf_dir):
    """ES rare_terms aggregation: exact long-tail terms (df ≤ cap)."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.rare_terms_agg(postings, max_doc_count=300, k=50)


def _q_search_boosting(spark, sf_dir):
    """ES boosting query: positive BM25 ranking with negative-term
    demotion (score × 0.5), never exclusion."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return se.search_boosting(
        postings, term_dict, doc_stats, n_docs, avgdl,
        positive=Q_BM25, negative=["merge"],
    )


def _q_search_phrase_prefix(spark, sf_dir):
    """match_phrase_prefix: exact body + term-asc capped prefix expansion
    at the final position (search-as-you-type phrase)."""
    from search_engine_spark.operators.positional import (
        search_phrase_prefix,
    )

    return search_phrase_prefix(load_documents(spark, sf_dir), "merge da")


def _q_search_span_first(spark, sf_dir):
    """SpanFirstQuery: first occurrence of the word within the first 10
    retained positions (lead-paragraph matching)."""
    from search_engine_spark.operators.positional import search_span_first

    return search_span_first(load_documents(spark, sf_dir), "data", n=10)


def _q_search_intervals(spark, sf_dir):
    """Lucene intervals query: minimal ordered intervals of
    data..fast within 8 gaps, dropping intervals that contain an
    occurrence of 'join' (not_containing combinator), ranked by
    surviving-interval count."""
    from search_engine_spark.operators.intervals import search_intervals

    return search_intervals(
        load_documents(spark, sf_dir),
        ["data", "fast"],
        max_gaps=8,
        not_containing="join",
    )


def _q_search_intervals_containing(spark, sf_dir):
    """Lucene intervals query, unordered source + containing
    combinator: minimal unordered covers of {data, merge} within 10
    gaps that contain an occurrence of 'fast', ranked by
    surviving-interval count."""
    from search_engine_spark.operators.intervals import (
        intervals_containing,
        rank_intervals,
        term_intervals,
        unordered_intervals,
    )
    from search_engine_spark.operators.positional import build_positional

    positional = build_positional(load_documents(spark, sf_dir))
    iv = unordered_intervals(positional, ["data", "merge"], max_gaps=10)
    kept = intervals_containing(iv, term_intervals(positional, "fast"))
    return rank_intervals(kept, k=20)


def _q_decontaminate_bloom(spark, sf_dir):
    """Bloom-filter decontamination: membership probe of every doc's
    normalized text against a 1024-bit filter built over the
    deterministic holdout slice (doc_id % 97 == 0) — bloom_hit including
    its false positives is bit-reproducible vs the oracle."""
    from search_engine_spark.operators.bloom import decontaminate

    return decontaminate(load_documents(spark, sf_dir))


def _q_dedup_incremental(spark, sf_dir):
    """Incremental near-dup gate: the doc_id % 13 == 0 slice plays the
    new crawl batch, its bands probe the corpus band table, collisions
    verify with candidate-driven exact Jaccard — the daily-increment
    complement of the corpus-wide LSH self-join."""
    from search_engine_spark.operators.dedup import dedup_incremental

    return dedup_incremental(load_documents(spark, sf_dir), JACCARD_THRESHOLD)


def _q_ngram_contamination(spark, sf_dir):
    """Fuzzy decontamination tier: per-doc word-shingle overlap ratio
    vs the holdout's shingle Bloom filter (join-free at corpus scale,
    FP-inflated upper bound — the safe drop-gate direction)."""
    from search_engine_spark.operators.bloom import ngram_contamination

    return ngram_contamination(load_documents(spark, sf_dir))


def _q_search_rescore(spark, sf_dir):
    """ES rescore: disjunctive BM25 first pass, top-100 window, exact
    phrase 'fast table' second pass at rescore_weight 2.0."""
    from search_engine_spark.operators.positional import build_positional
    from search_engine_spark.operators.scoring_boosts import search_rescore

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return search_rescore(
        postings, term_dict, doc_stats, n_docs, avgdl,
        build_positional(docs), Q_BM25_COMMON, ["fast", "table"],
    )


def _q_search_cross_fields(spark, sf_dir):
    """ES multi_match cross_fields: per-term best-field contribution,
    blended (max-of-fields) document frequency — completes the
    multi-field trilogy with search_bm25f and search_dismax."""
    from search_engine_spark.operators.anchors import (
        anchor_postings,
        anchored_html,
        search_cross_fields,
    )

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    anchor = anchor_postings(anchored_html(docs))
    return search_cross_fields(
        postings, anchor, doc_stats, n_docs, avgdl, Q_BM25F
    )


def _q_trending_terms(spark, sf_dir):
    """Per-crawl-window top-k terms (the trending board; streaming twin
    in streaming/stream_trends.py)."""
    from search_engine_spark.operators.textstats import trending_terms

    return trending_terms(load_documents(spark, sf_dir))


PINNED_IDS = [7, 3]


def _q_search_ltr(spark, sf_dir):
    """LTR inference: frozen linear model over the single-pass feature
    matrix (serving half of the ES-LTR loop; ltr_features logs)."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return se.search_ltr(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25
    )


def _q_search_pinned(spark, sf_dir):
    """ES pinned query: editorial promotions first (given order),
    organic BM25 after, position explicit in the value."""
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    return se.search_pinned(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25, PINNED_IDS
    )


def _decay_ctx(spark, sf_dir):
    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    hits = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON, limit=50
    )
    return docs, hits


def _q_search_decay_gauss(spark, sf_dir):
    """ES function_score gauss date decay over the BM25 top-50."""
    from search_engine_spark.operators import scoring_boosts as sb

    docs, hits = _decay_ctx(spark, sf_dir)
    return sb.decay_function_score(hits, docs, mode="gauss")


def _q_search_decay_exp(spark, sf_dir):
    """ES function_score exp date decay over the BM25 top-50."""
    from search_engine_spark.operators import scoring_boosts as sb

    docs, hits = _decay_ctx(spark, sf_dir)
    return sb.decay_function_score(hits, docs, mode="exp")


def _q_search_decay_linear(spark, sf_dir):
    """ES function_score linear date decay over the BM25 top-50 (docs
    past offset + scale/(1-decay) days drop to exactly 0)."""
    from search_engine_spark.operators import scoring_boosts as sb

    docs, hits = _decay_ctx(spark, sf_dir)
    return sb.decay_function_score(hits, docs, mode="linear")


def _q_search_rank_feature(spark, sf_dir):
    """ES rank_feature (saturation) — additive bounded boost from the
    frozen per-doc quality score over the BM25 top-50."""
    from search_engine_spark.operators import scoring_boosts as sb
    from search_engine_spark.operators import textstats as ts

    docs, hits = _decay_ctx(spark, sf_dir)
    return sb.rank_feature_boost(hits, ts.quality_scores(docs))


def _q_search_rank_feature_log(spark, sf_dir):
    """ES rank_feature (log function) over the same feature."""
    from search_engine_spark.operators import scoring_boosts as sb
    from search_engine_spark.operators import textstats as ts

    docs, hits = _decay_ctx(spark, sf_dir)
    return sb.rank_feature_boost(hits, ts.quality_scores(docs), fn="log")


def _q_multi_terms(spark, sf_dir):
    """ES multi_terms: compound-key (site, lang) terms agg ranked by
    combined doc_count."""
    from search_engine_spark.operators import bucket_aggs as ba

    return ba.multi_terms_agg(load_documents(spark, sf_dir))


def _q_filters_agg(spark, sf_dir):
    """ES filters: non-exclusive named predicate buckets, one corpus pass
    of conditional sums unpivoted with stack()."""
    from search_engine_spark.operators import bucket_aggs as ba

    return ba.filters_agg(load_documents(spark, sf_dir))


def _q_date_range_agg(spark, sf_dir):
    """ES date_range: overlapping half-open [from, to) warc_ts buckets,
    open ends; same single-pass conditional-sum shape."""
    from search_engine_spark.operators import bucket_aggs as ba

    return ba.date_range_agg(load_documents(spark, sf_dir))


def _q_percentile_ranks(spark, sf_dir):
    """ES percentile_ranks: exact inverse quantiles of the token count
    (one conditional-sum aggregate — no sort)."""
    from search_engine_spark.operators import bucket_aggs as ba

    return ba.percentile_ranks(load_documents(spark, sf_dir))


def _q_dl_histogram_dense(spark, sf_dir):
    """ES histogram with min_doc_count=0: zero-filled buckets between the
    observed min and max (sequence-spine left join)."""
    from search_engine_spark.operators import bucket_aggs as ba

    return ba.dl_histogram_dense(load_documents(spark, sf_dir))


def _q_sampler_terms(spark, sf_dir):
    """ES sampler agg: lang facet over only the 30 best-scoring hits."""
    from search_engine_spark.operators import bucket_aggs as ba

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    hits = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        limit=200,
    )
    return ba.sampler_agg(hits, docs)


def _q_diversified_sampler(spark, sf_dir):
    """ES diversified_sampler: the same facet with at most 5 docs per
    site admitted to the sample."""
    from search_engine_spark.operators import bucket_aggs as ba

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    hits = se.search_bm25(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON,
        limit=200,
    )
    return ba.diversified_sampler_agg(hits, docs)


def _q_random_score(spark, sf_dir):
    """ES function_score random_score: deterministic seeded per-doc
    uniform draw (h60-keyed — stable across engines and cluster sizes)."""
    from search_engine_spark.operators import scoring_boosts as sb

    docs = load_documents(spark, sf_dir)
    return sb.random_score(docs)


ADJ_FILTERS = {"d": "data", "f": "fast", "m": "merge"}


def _q_adjacency_matrix(spark, sf_dir):
    """ES adjacency_matrix: named term-filter co-occurrence counts
    (singles + pairwise intersections)."""
    docs, postings = _search_ctx(spark, sf_dir)
    return se.adjacency_matrix(postings, ADJ_FILTERS)


def _q_winnowing(spark, sf_dir):
    """Winnowing (MOSS) positioned substring fingerprints: leftmost
    minimal shingle hash per sliding window."""
    from search_engine_spark.operators.textstats import winnowing_fingerprints

    return winnowing_fingerprints(load_documents(spark, sf_dir))


def _q_mad_agg(spark, sf_dir):
    """ES median_absolute_deviation (exact tier): per-language median +
    MAD of token counts."""
    from search_engine_spark.operators.textstats import mad_agg

    return mad_agg(load_documents(spark, sf_dir))


def _q_ip_prefix(spark, sf_dir):
    """ES ip_prefix aggregation over the h60-derived synthetic client
    IPv4 (/16 networks: events + distinct users)."""
    from search_engine_spark.operators.events import ip_prefix_agg

    return ip_prefix_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_redirect_resolve(spark, sf_dir):
    """Redirect-chain resolution by pointer doubling (the crawl
    canonicalization pass; oracle walks the same chains recursively)."""
    from search_engine_spark.operators.graph import redirect_resolve

    return redirect_resolve(load_documents(spark, sf_dir))


def _q_search_span_or(spark, sf_dir):
    """Lucene SpanNear[anchor, SpanOr(alts)]: anchor occurrences with
    any alternative within ±slop positions."""
    from search_engine_spark.operators.positional import search_span_or

    return search_span_or(
        load_documents(spark, sf_dir), "data", ["fast", "merge"], slop=3
    )


def _q_geohash_grid(spark, sf_dir):
    """ES geohash_grid: base32 cells over the derived geo_point."""
    from search_engine_spark.operators.geo import geohash_grid

    return geohash_grid(load_documents(spark, sf_dir))


def _q_meta_robots(spark, sf_dir):
    """Page-level robots META directive parsed from the html bytes
    (noindex/nofollow compliance gate)."""
    from search_engine_spark.operators.graph import meta_robots

    return meta_robots(load_documents(spark, sf_dir))


def _q_sitemap_extract(spark, sf_dir):
    """Sitemap-protocol roundtrip: build per-site XML, parse back the
    (site, url, lastmod) crawl-seed relation."""
    from search_engine_spark.operators.graph import sitemap_extract

    return sitemap_extract(load_documents(spark, sf_dir))


def _q_geo_bounds(spark, sf_dir):
    """ES geo_bounds: per-site enclosing box from integer micro-degree
    min/max."""
    from search_engine_spark.operators.geo import geo_bounds

    return geo_bounds(load_documents(spark, sf_dir))


def _q_moving_percentiles(spark, sf_dir):
    """ES moving_percentiles: exact interpolated p50/p90 of the trailing
    4-day daily counts."""
    from search_engine_spark.operators.events import moving_percentiles

    return moving_percentiles(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _q_ip_range(spark, sf_dir):
    """ES ip_range: explicit half-open address ranges over the synthetic
    client IPv4."""
    from search_engine_spark.operators.events import ip_range_agg

    return ip_range_agg(spark.read.parquet(f"{sf_dir}/events.parquet"))


def _q_geo_line(spark, sf_dir):
    """ES geo_line: first 10 track points per site by (warc_ts, doc_id),
    exploded with seq."""
    from search_engine_spark.operators.geo import geo_line

    return geo_line(load_documents(spark, sf_dir))


def _q_search_collapsed_inner(spark, sf_dir):
    """ES field collapse with inner_hits: rank-1 heads joined to their
    group's top-3."""
    from search_engine_spark.sources.documents import site_key_col

    docs, postings, term_dict, doc_stats, n_docs, avgdl = _bm25_ctx(
        spark, sf_dir
    )
    # bm25_scored = the UNPAGINATED scored set — no TakeOrdered heap or
    # global sort that the collapse window would immediately re-shuffle
    # (r05 review; the oracle's LIMIT 1e6 twin is value-identical since
    # the scored set is corpus-bounded)
    hits = se.bm25_scored(
        postings, term_dict, doc_stats, n_docs, avgdl, Q_BM25_COMMON
    )
    return se.search_collapsed_inner(
        hits.withColumn("site_key", site_key_col())
    )


def _q_percentiles_bucket(spark, sf_dir):
    """ES percentiles_bucket: exact interpolated p25/p50/p75 over the
    daily-count bucket series."""
    from search_engine_spark.operators.events import percentiles_bucket

    return percentiles_bucket(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    )


def _q_reverse_nested(spark, sf_dir):
    """ES reverse_nested: matching chunks stepped back to parent scope,
    bucketed by site."""
    from search_engine_spark.operators.nested import reverse_nested_agg

    return reverse_nested_agg(load_documents(spark, sf_dir), Q_AND2)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "postings": _q_postings,
        "term_dict": _q_term_dict,
        "term_dict_site": _q_term_dict_site,
        "composite_buckets": _q_composite_buckets,
        "doc_stats": _q_doc_stats,
        "search_and2": _q_search_and2,
        "search_and3": _q_search_and3,
        "search_site": _q_search_site,
        "search_paginated": _q_search_paginated,
        "search_stopword_only": _q_search_stopword_only,
        "search_bm25": _q_search_bm25,
        "search_bm25_common": _q_search_bm25_common,
        "search_bm25_or": _q_search_bm25_or,
        "site_gate": _q_site_gate,
        "related_terms": _q_related_terms,
        "spell_suggest": _q_spell_suggest,
        "prefix_suggest": _q_prefix_suggest,
        "next_word": _q_next_word,
        "phrase_suggest": _q_phrase_suggest,
        "postings_positional": _q_postings_positional,
        "search_bool_prefix": _q_search_bool_prefix,
        "trigram_index": _q_trigram_index,
        "search_substring": _q_search_substring,
        "search_common_terms": _q_search_common_terms,
        "search_most_fields": _q_search_most_fields,
        "has_child": _q_has_child,
        "has_parent": _q_has_parent,
        "search_nested": _q_search_nested,
        "nested_vs_flat": _q_nested_vs_flat,
        "postings_folded": _q_postings_folded,
        "search_folded": _q_search_folded,
        "nextword_postings": _q_nextword_postings,
        "search_phrase_nextword": _q_search_phrase_nextword,
        "search_sharded": _q_search_sharded,
        "search_phrase": _q_search_phrase,
        "positional_blocks_roundtrip": _q_positional_blocks_roundtrip,
        "search_phrase_blocks": _q_search_phrase_blocks,
        "search_boolean": _q_search_boolean,
        "facet_by_site": _q_facet_by_site,
        "search_proximity": _q_search_proximity,
        "best_passage": _q_best_passage,
        "more_like_this": _q_more_like_this,
        "search_synonyms": _q_search_synonyms,
        "collocations": _q_collocations,
        "status_filter": _q_status_filter,
        "warc_roundtrip": _q_warc_roundtrip,
        "postings_parseable": _q_postings_parseable,
        "url_normalize": _q_url_normalize,
        "url_reorder": _q_url_reorder,
        "search_dismax": _q_search_dismax,
        "search_prox_boost": _q_search_prox_boost,
        "search_sdm": _q_search_sdm,
        "search_vsm": _q_search_vsm,
        "impact_postings": _q_impact_postings,
        "search_impact": _q_search_impact,
        "search_champions": _q_search_champions,
        "search_champions_and": _q_search_champions_and,
        "search_impact_and": _q_search_impact_and,
        "search_champions_fused": _q_search_champions_fused,
        "search_champions_batch": _q_search_champions_batch,
        "rate_agg": _q_rate_agg,
        "variable_width_histogram": _q_variable_width_histogram,
        "change_point": _q_change_point,
        "cumulative_cardinality": _q_cumulative_cardinality,
        "events_retention": _q_events_retention,
        "normalize_agg": _q_normalize_agg,
        "significant_text": _q_significant_text,
        "bpe_pairs": _q_bpe_pairs,
        "mojibake_stats": _q_mojibake_stats,
        "boilerplate_lines": _q_boilerplate_lines,
        "remove_boilerplate": _q_remove_boilerplate,
        "categorize_text": _q_categorize_text,
        "frequent_item_sets": _q_frequent_item_sets,
        "search_two_tier": _q_search_two_tier,
        "search_two_tier_or": _q_search_two_tier_or,
        "containment": _q_containment,
        "ann_filtered": _q_ann_filtered,
        "cdx_lines": _q_cdx_lines,
        "search_near": _q_search_near,
        "dict_blocks_roundtrip": _q_dict_blocks_roundtrip,
        "terms_agg": _q_terms_agg,
        "index_stats": _q_index_stats,
        "rare_terms": _q_rare_terms,
        "search_boosting": _q_search_boosting,
        "search_phrase_prefix": _q_search_phrase_prefix,
        "search_span_first": _q_search_span_first,
        "search_span_not": _q_search_span_not,
        "search_intervals": _q_search_intervals,
        "search_rescore": _q_search_rescore,
        "decontaminate_bloom": _q_decontaminate_bloom,
        "ngram_contamination": _q_ngram_contamination,
        "dedup_incremental": _q_dedup_incremental,
        "search_intervals_containing": _q_search_intervals_containing,
        "search_cross_fields": _q_search_cross_fields,
        "trending_terms": _q_trending_terms,
        "search_ltr": _q_search_ltr,
        "search_pinned": _q_search_pinned,
        "adjacency_matrix": _q_adjacency_matrix,
        "winnowing": _q_winnowing,
        "mad_agg": _q_mad_agg,
        "ip_prefix": _q_ip_prefix,
        "redirect_resolve": _q_redirect_resolve,
        "search_span_or": _q_search_span_or,
        "geohash_grid": _q_geohash_grid,
        "meta_robots": _q_meta_robots,
        "sitemap_extract": _q_sitemap_extract,
        "geo_bounds": _q_geo_bounds,
        "moving_percentiles": _q_moving_percentiles,
        "ip_range": _q_ip_range,
        "geo_line": _q_geo_line,
        "search_collapsed_inner": _q_search_collapsed_inner,
        "percentiles_bucket": _q_percentiles_bucket,
        "reverse_nested": _q_reverse_nested,
        "statistics": _q_statistics,
        "titles": _q_titles,
        "search_results": _q_search_results,
        "postings_roundtrip": _q_postings_roundtrip,
        "postings_pruned": _q_postings_pruned,
        "doc_signatures": _q_doc_signatures,
        "segment_merge": _q_segment_merge,
        "segment_merge_deletes": _q_segment_merge_deletes,
        "term_dict_blocks": _q_term_dict_blocks,
        "block_meta": _q_block_meta,
        "search_collapsed": _q_search_collapsed,
        "anchor_terms": _q_anchor_terms,
        "search_bm25f": _q_search_bm25f,
        "search_combined_fields": _q_search_combined_fields,
        "search_synonym_graph": _q_search_synonym_graph,
        "query_clarity": _q_query_clarity,
        "web_ranking": _q_web_ranking,
        "link_extract": _q_link_extract,
        "pagerank": _q_pagerank,
        "hits": _q_hits,
        "cocitation": _q_cocitation,
        "coupling": _q_coupling,
        "percolate": _q_percolate,
        "surt_keys": _q_surt_keys,
        "crawl_frontier": _q_crawl_frontier,
        "search_fuzzy": _q_search_fuzzy,
        "search_bm25_batch": _q_search_bm25_batch,
        "search_recency": _q_search_recency,
        "search_decay_gauss": _q_search_decay_gauss,
        "search_decay_exp": _q_search_decay_exp,
        "search_decay_linear": _q_search_decay_linear,
        "search_rank_feature": _q_search_rank_feature,
        "search_rank_feature_log": _q_search_rank_feature_log,
        "random_score": _q_random_score,
        "multi_terms": _q_multi_terms,
        "filters_agg": _q_filters_agg,
        "date_range_agg": _q_date_range_agg,
        "percentile_ranks": _q_percentile_ranks,
        "dl_histogram_dense": _q_dl_histogram_dense,
        "sampler_terms": _q_sampler_terms,
        "diversified_sampler": _q_diversified_sampler,
        "search_authority": _q_search_authority,
        "crawl_frontier_robots": _q_crawl_frontier_robots,
        "robots_rules": _q_robots_rules,
        "crawl_delays": _q_crawl_delays,
        "induced_stopwords": _q_induced_stopwords,
        "temperature_sample": _q_temperature_sample,
        "trustrank": _q_trustrank,
        "curation_funnel": _q_curation_funnel,
        "domain_authority": _q_domain_authority,
        "pq_codes": _q_pq_codes,
        "ann_pq": _q_ann_pq,
        "sq8_codes": _q_sq8_codes,
        "ann_sq8": _q_ann_sq8,
        "length_quantiles": _q_length_quantiles,
        "dl_histogram": _q_dl_histogram,
        "latest_revisions": _q_latest_revisions,
        "line_dedup": _q_line_dedup,
        "pii_redact": _q_pii_redact,
        "dsir_weights": _q_dsir_weights,
        "snapshot_delta": _q_snapshot_delta,
        "c4_clean": _q_c4_clean,
        "domain_stats": _q_domain_stats,
        "lang_id": _q_lang_id,
        "token_counts": _q_token_counts,
        "quality_scores": _q_quality_scores,
        "gopher_rules": _q_gopher_rules,
        "string_stats": _q_string_stats,
        "weighted_avg": _q_weighted_avg,
        "extended_stats": _q_extended_stats,
        "matrix_stats": _q_matrix_stats,
        "range_agg": _q_range_agg,
        "quality_model": _q_quality_model,
        "fingerprints": _q_fingerprints,
        "lm_scores": _q_lm_scores,
        "ccnet_buckets": _q_ccnet_buckets,
        "doc_keywords": _q_doc_keywords,
        "repetition_stats": _q_repetition_stats,
        "contamination": _q_contamination,
        "dedup_exact": _q_dedup_exact,
        "minhash": _q_minhash,
        "dedup_lsh_pairs": _q_dedup_lsh_pairs,
        "dedup_jaccard": _q_dedup_jaccard,
        "dedup_clusters": _q_dedup_clusters,
        "dedup_clusters_star": _q_dedup_clusters_star,
        "dedup_canonical": _q_dedup_canonical,
        "dup_spans": _q_dup_spans,
        "mirror_hosts": _q_mirror_hosts,
        "curation_funnel2": _q_curation_funnel2,
        "sample_stratified": _q_sample_stratified,
        "sample_split": _q_sample_split,
        "sample_weighted": _q_sample_weighted,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "embedding_neardup": _q_embedding_neardup,
        "embedding_neardup_lsh": _q_embedding_neardup_lsh,
        "ann_bruteforce": _q_ann_bruteforce,
        "ann_lsh_buckets": _q_ann_lsh_buckets,
        "ann_lsh": _q_ann_lsh,
        "ivf_assign": _q_ivf_assign,
        "ann_ivf": _q_ann_ivf,
        "kmeans_assign": _q_kmeans_assign,
        "knn_graph": _q_knn_graph,
        "semdedup": _q_semdedup,
        "media_stats": _q_media_stats,
        "media_features": _q_media_features,
        "image_features": _q_image_features,
        "media_frames": _q_media_frames,
        "rel_pricing_summary": _q_rel_pricing,
        "rel_revenue_by_nation": _q_rel_revenue,
        "rel_semi_join": _q_rel_semi,
        "rel_anti_join": _q_rel_anti,
        "rel_window_running": _q_rel_window,
        "rel_rollup": _q_rel_rollup,
        "rel_topk_per_group": _q_rel_topk_group,
        "rel_small_qty": _q_rel_small_qty,
        "events_windowed": _q_events_windowed,
        "events_attribution": _q_events_attribution,
        "events_last_touch": _q_events_last_touch,
        "events_sessionize": _q_events_sessionize,
        "events_transitions": _q_events_transitions,
        "events_abandonment": _q_events_abandonment,
        "events_props": _q_events_props,
        "events_coec": _q_events_coec,
        "events_rollup": _q_events_rollup,
        "search_keyset": _q_search_keyset,
        "term_vectors": _q_term_vectors,
        "facet_datehist": _q_facet_datehist,
        "stats_bucket": _q_stats_bucket,
        "significant_terms": _q_significant_terms,
        "search_wildcard": _q_search_wildcard,
        "search_regexp": _q_search_regexp,
        "search_qstring": _q_search_qstring,
        "search_wildcard_rev": _q_search_wildcard_rev,
        "explain_score": _q_explain_score,
        "search_msm": _q_search_msm,
        "search_relaxed": _q_search_relaxed,
        "search_rm3": _q_search_rm3,
        "ltr_features": _q_ltr_features,
        "search_relaxed_and": _q_search_relaxed_and,
        "search_per_lang": _q_search_per_lang,
        "search_diversified": _q_search_diversified,
        "search_lmd": _q_search_lmd,
        "search_lmjm": _q_search_lmjm,
        "search_dfr": _q_search_dfr,
        "search_ib": _q_search_ib,
        "search_bm25_plus": _q_search_bm25_plus,
        "bp_reorder": _q_bp_reorder,
        "geo_distance": _q_geo_distance,
        "geo_bbox": _q_geo_bbox,
        "geotile_grid": _q_geotile_grid,
        "geo_rings": _q_geo_rings,
        "distance_feature": _q_distance_feature,
        "boxplot": _q_boxplot,
        "t_test": _q_t_test,
        "geo_centroid": _q_geo_centroid,
        "search_filtered": _q_search_filtered,
        "facet_stats": _q_facet_stats,
        "facet_top_hits": _q_facet_top_hits,
        "search_sorted": _q_search_sorted,
        "search_hybrid": _q_search_hybrid,
        "search_rerank": _q_search_rerank,
        "datehist_pipeline": _q_datehist_pipeline,
        "datehist_pipeline2": _q_datehist_pipeline2,
        "terms_set": _q_terms_set,
        "term_suggester": _q_term_suggester,
        "auto_datehist": _q_auto_datehist,
        "top_metrics": _q_top_metrics,
        "rank_eval": _q_rank_eval,
        "hll_vocab": _q_hll_vocab,
        "cm_heavy_hitters": _q_cm_heavy_hitters,
        "export_shards": _q_export_shards,
        "export_manifest": _q_export_manifest,
        "pack_sequences": _q_pack_sequences,
        "chunk_docs": _q_chunk_docs,
    }


def oracle_sql() -> dict[str, str]:
    from search_engine_spark.textproc.synonyms import expand_phrase_groups

    empty_search = (
        "SELECT doc_id, '' AS url, 0::BIGINT AS score_abs, 0.0::DOUBLE AS rel "
        "FROM documents WHERE FALSE"
    )
    return {
        "postings": ora.postings_sql(),
        "term_dict": ora.term_dict_sql(),
        "term_dict_site": ora.term_dict_site_sql(),
        "composite_buckets": ora.composite_buckets_sql(
            size=10, after=("site-b", "merge")
        ),
        "doc_stats": ora.doc_stats_sql(),
        "search_and2": ora.search_compat_sql(Q_AND2),
        "search_and3": ora.search_compat_sql(Q_AND3),
        "search_site": ora.search_compat_sql(Q_AND2, site_key=SITE_B),
        "search_paginated": ora.search_compat_sql(Q_AND2, limit=10, offset=10),
        "search_stopword_only": empty_search,
        "search_bm25": ora.search_bm25_sql(Q_BM25),
        "search_bm25_common": ora.search_bm25_sql(Q_BM25_COMMON),
        "search_bm25_or": ora.search_bm25_sql(Q_OR, conjunctive=False),
        "site_gate": ora.site_gate_sql(Q_GATE),
        "related_terms": ora.related_terms_sql(RELATED_PROBE),
        "spell_suggest": ora.spell_suggest_sql(SPELL_PROBE),
        "prefix_suggest": ora.prefix_suggest_sql(PREFIX_PROBE),
        "next_word": ora.next_word_suggest_sql("data"),
        "phrase_suggest": ora.phrase_suggest_sql(Q_PHRASE_TYPO),
        "postings_positional": ora.positional_postings_sql(),
        "search_bool_prefix": ora.search_bool_prefix_sql(["data"], "fa"),
        "trigram_index": ora.trigram_index_sql(),
        "search_substring": ora.search_wildcard_sql("*ast*"),
        "search_common_terms": ora.search_common_terms_sql(Q_BM25),
        "search_most_fields": pipe.search_dismax_sql(
            Q_BM25F, tie_breaker=1.0
        ),
        "has_child": pipe.has_child_sql(Q_AND2),
        "has_parent": pipe.has_parent_sql(Q_AND2),
        "search_nested": pipe.nested_match_sql(Q_AND2),
        "nested_vs_flat": pipe.flat_vs_nested_sql(Q_AND2),
        "postings_folded": ora.postings_folded_sql(),
        "search_folded": ora.search_bm25_folded_sql(_folded_query_terms()),
        "nextword_postings": ora.nextword_postings_sql(),
        "search_phrase_nextword": ora.search_phrase_sql(
            analyze_phrase(PHRASE)
        ),
        "search_sharded": ora.search_bm25_sharded_sql(Q_BM25_COMMON),
        "search_phrase": ora.search_phrase_sql(analyze_phrase(PHRASE)),
        "positional_blocks_roundtrip": ora.positional_postings_sql(),
        "search_phrase_blocks": ora.search_phrase_sql(analyze_phrase(PHRASE)),
        "search_boolean": _boolean_oracle(),
        "facet_by_site": ora.facet_by_site_sql(Q_GATE),
        "facet_stats": ora.facet_stats_sql(Q_AND2),
        "facet_top_hits": ora.facet_top_hits_sql(Q_AND2),
        "search_sorted": ora.search_sorted_by_time_sql(Q_AND2),
        "more_like_this": ora.more_like_this_sql(MLT_SEED_DOC),
        "search_synonyms": _synonyms_oracle(),
        "collocations": ora.collocations_sql(),
        "search_proximity": ora.search_proximity_sql(
            analyze_phrase(PROX_PHRASE), slop=PROX_SLOP
        ),
        "best_passage": ora.best_passage_sql(Q_PASSAGE),
        "status_filter": ora.status_filter_sql(),
        "postings_parseable": ora.postings_sql(
            table=f"(SELECT * FROM documents WHERE {ora.PARSEABLE_SQL})"
        ),
        "warc_roundtrip": pipe.warc_roundtrip_sql(),
        "url_normalize": ora.url_normalize_sql(),
        "url_reorder": ora.url_reorder_sql(),
        "search_dismax": pipe.search_dismax_sql(Q_BM25F),
        "search_prox_boost": ora.search_prox_boost_sql(Q_AND2),
        "search_sdm": ora.search_sdm_sql(Q_SDM),
        "search_vsm": ora.search_vsm_sql(Q_BM25),
        "impact_postings": ora.impact_postings_sql(),
        "search_impact": ora.search_impact_sql(Q_BM25),
        "search_champions": ora.search_champions_sql(Q_BM25, budget=8),
        "search_champions_and": ora.search_champions_and_sql(Q_BM25, budget=8),
        "search_impact_and": ora.search_impact_and_sql(Q_BM25),
        # fused block-level champion build, pinned to the SAME mirror
        "search_champions_fused": ora.search_champions_sql(Q_BM25, budget=8),
        "search_champions_batch": ora.search_champions_batch_sql(
            BATCH_CHAMP_QUERIES, budget=8
        ),
        "rate_agg": pipe.rate_agg_sql(),
        "cumulative_cardinality": pipe.cumulative_cardinality_sql(),
        "events_retention": pipe.events_retention_sql(),
        "normalize_agg": pipe.normalize_agg_sql(),
        "significant_text": ora.significant_text_sql(Q_AND2),
        "bpe_pairs": ora.bpe_pairs_sql(),
        "mojibake_stats": pipe.mojibake_stats_sql(),
        "boilerplate_lines": pipe.boilerplate_lines_sql(min_frac=0.02),
        "remove_boilerplate": pipe.remove_boilerplate_sql(min_frac=0.02),
        "variable_width_histogram": pipe.variable_width_histogram_sql(),
        "change_point": pipe.change_point_sql(),
        "categorize_text": ora.categorize_text_sql(),
        "frequent_item_sets": ora.frequent_item_sets_sql(),
        # two-tier is pinned against the EXACT conjunctive ranking
        "search_two_tier": ora.search_impact_and_sql(Q_BM25),
        # OR two-tier is pinned against the EXACT disjunctive ranking
        "search_two_tier_or": ora.search_impact_sql(Q_BM25),
        "containment": pipe.containment_pairs_sql(
            threshold=CONTAIN_THRESHOLD, lsh_candidates=True
        ),
        "ann_filtered": pipe.ann_filtered_sql(
            ANN_QUERY_IDS, ANN_FILTER_LABELS
        ),
        "cdx_lines": pipe.cdx_lines_sql(),
        "search_near": ora.search_near_unordered_sql(Q_AND2, slop=2),
        "dict_blocks_roundtrip": ora.term_dict_sql(),
        "terms_agg": ora.terms_agg_sharded_sql(size=10, shard_size=5),
        "index_stats": ora.index_stats_sql(),
        "rare_terms": ora.rare_terms_sql(max_doc_count=300, k=50),
        "search_boosting": ora.search_boosting_sql(Q_BM25, ["merge"]),
        "search_phrase_prefix": ora.search_phrase_prefix_sql(
            ["merge"], "da"
        ),
        "search_span_first": ora.search_span_first_sql("data", n=10),
        "search_span_not": ora.search_span_not_sql("data", "fast"),
        "decontaminate_bloom": ora.decontaminate_bloom_sql(),
        "ngram_contamination": pipe.ngram_contamination_sql(),
        "dedup_incremental": pipe.dedup_incremental_sql(
            threshold=JACCARD_THRESHOLD
        ),
        "search_rescore": ora.search_rescore_sql(
            Q_BM25_COMMON, ["fast", "table"]
        ),
        "search_intervals": ora.search_intervals_sql(
            ["data", "fast"], max_gaps=8, not_containing="join"
        ),
        "search_intervals_containing": ora.search_intervals_containing_sql(
            ["data", "merge"], max_gaps=10, containing="fast"
        ),
        "search_cross_fields": pipe.search_cross_fields_sql(Q_BM25F),
        "trending_terms": ora.trending_terms_sql(),
        "search_ltr": ora.search_ltr_sql(Q_BM25),
        "search_pinned": ora.search_pinned_sql(Q_BM25, PINNED_IDS),
        "adjacency_matrix": ora.adjacency_matrix_sql(ADJ_FILTERS),
        "winnowing": pipe.winnowing_sql(),
        "mad_agg": pipe.mad_agg_sql(),
        "ip_prefix": pipe.ip_prefix_sql(),
        "redirect_resolve": pipe.redirect_resolve_sql(),
        "search_span_or": ora.search_span_or_sql(
            "data", ["fast", "merge"], slop=3
        ),
        "geohash_grid": ora.geohash_grid_sql(),
        "meta_robots": pipe.meta_robots_sql(),
        "sitemap_extract": pipe.sitemap_extract_sql(),
        "geo_bounds": ora.geo_bounds_sql(),
        "moving_percentiles": pipe.moving_percentiles_sql(),
        "ip_range": pipe.ip_range_sql(),
        "geo_line": ora.geo_line_sql(),
        "search_collapsed_inner": ora.search_collapsed_inner_sql(
            Q_BM25_COMMON
        ),
        "percentiles_bucket": pipe.percentiles_bucket_sql(),
        "reverse_nested": pipe.reverse_nested_sql(Q_AND2),
        "statistics": ora.statistics_sql(),
        # title extraction runs the real regex extractor over html; the
        # oracle knows the fixture titles are 'Doc <id>' by construction
        "titles": "SELECT doc_id, 'Doc ' || doc_id AS title FROM documents",
        "postings_roundtrip": ora.postings_sql(),
        "postings_pruned": ora.pruned_postings_sql(),
        "doc_signatures": ora.doc_signatures_sql(),
        "segment_merge": ora.postings_sql(),
        "segment_merge_deletes": ora.postings_sql(
            table="(SELECT * FROM documents WHERE doc_id % 5 != 0)"
        ),
        "term_dict_blocks": ora.term_dict_sql(),
        "block_meta": ora.block_meta_sql(),
        "search_collapsed": ora.search_collapsed_sql(Q_BM25_COMMON),
        "anchor_terms": pipe.anchor_postings_sql(),
        "search_bm25f": pipe.search_bm25f_sql(Q_BM25F),
        "search_combined_fields": pipe.search_combined_fields_bm25_sql(
            Q_BM25F
        ),
        "search_synonym_graph": ora.search_synonym_graph_sql(
            expand_phrase_groups()
        ),
        "query_clarity": ora.clarity_score_sql(Q_AND2),
        "web_ranking": pipe.web_ranking_sql(Q_BM25F),
        "link_extract": pipe.link_extract_sql(),
        "pagerank": pipe.pagerank_sql(),
        "hits": pipe.hits_sql(),
        "cocitation": pipe.cocitation_sql(),
        "coupling": pipe.coupling_sql(),
        "percolate": ora.percolate_sql(se.PERCOLATE_QUERIES),
        "surt_keys": ora.surt_keys_sql(),
        "crawl_frontier": pipe.crawl_frontier_sql(),
        "search_fuzzy": ora.search_fuzzy_sql(Q_FUZZY),
        "search_bm25_batch": ora.search_bm25_batch_sql(Q_BATCH),
        "search_recency": pipe.search_recency_sql(Q_BM25_COMMON),
        "search_decay_gauss": pipe.search_decay_sql(Q_BM25_COMMON, "gauss"),
        "search_decay_exp": pipe.search_decay_sql(Q_BM25_COMMON, "exp"),
        "search_decay_linear": pipe.search_decay_sql(Q_BM25_COMMON, "linear"),
        "search_rank_feature": pipe.search_rank_feature_sql(Q_BM25_COMMON),
        "search_rank_feature_log": pipe.search_rank_feature_sql(
            Q_BM25_COMMON, fn="log"
        ),
        "random_score": pipe.random_score_sql(),
        "multi_terms": pipe.multi_terms_sql(),
        "filters_agg": pipe.filters_agg_sql(),
        "date_range_agg": pipe.date_range_agg_sql(),
        "percentile_ranks": pipe.percentile_ranks_sql(),
        "dl_histogram_dense": pipe.dl_histogram_dense_sql(),
        "sampler_terms": pipe.sampler_agg_sql(Q_BM25_COMMON),
        "diversified_sampler": pipe.diversified_sampler_sql(Q_BM25_COMMON),
        "search_authority": pipe.search_authority_sql(Q_BM25_COMMON),
        "crawl_frontier_robots": pipe.crawl_frontier_robots_sql(),
        "robots_rules": pipe.robots_rules_sql(),
        "crawl_delays": pipe.crawl_delays_sql(),
        "induced_stopwords": ora.induced_stopwords_sql(),
        "temperature_sample": pipe.temperature_sample_sql(),
        "trustrank": pipe.trustrank_sql(TRUST_SEED_MOD),
        "curation_funnel": pipe.curation_funnel_sql(),
        "domain_authority": pipe.domain_authority_sql(),
        "pq_codes": pipe.pq_codes_sql(),
        "ann_pq": pipe.ann_pq_sql(ANN_QUERY_IDS),
        "sq8_codes": pipe.sq8_codes_sql(),
        "ann_sq8": pipe.ann_sq8_sql(ANN_QUERY_IDS),
        "length_quantiles": pipe.length_quantiles_sql(),
        "dl_histogram": pipe.dl_histogram_sql(),
        "latest_revisions": pipe.latest_revisions_sql(),
        "line_dedup": pipe.line_dedup_sql(),
        "pii_redact": pipe.pii_redact_sql(),
        "dsir_weights": pipe.dsir_weights_sql(),
        "snapshot_delta": pipe.snapshot_delta_sql(),
        "c4_clean": pipe.c4_clean_sql(),
        "domain_stats": pipe.domain_stats_sql(),
        "lang_id": pipe.language_id_sql(),
        "token_counts": pipe.token_counts_sql(),
        "quality_scores": pipe.quality_scores_sql(),
        "gopher_rules": pipe.gopher_rules_sql(),
        "string_stats": pipe.string_stats_sql(),
        "weighted_avg": pipe.weighted_avg_quality_sql(),
        "extended_stats": pipe.extended_stats_sql(),
        "matrix_stats": pipe.matrix_stats_sql(),
        "range_agg": pipe.range_agg_sql(),
        "quality_model": pipe.quality_model_sql(),
        "fingerprints": pipe.fingerprints_sql(),
        "lm_scores": pipe.unigram_lm_scores_sql(),
        "ccnet_buckets": pipe.ccnet_buckets_sql(),
        "doc_keywords": pipe.doc_keywords_sql(),
        "repetition_stats": pipe.repetition_stats_sql(),
        "contamination": pipe.contamination_sql(),
        "dedup_exact": pipe.exact_duplicates_sql(),
        "minhash": pipe.minhash_sql(),
        "dedup_lsh_pairs": pipe.lsh_pairs_sql(),
        "dedup_jaccard": pipe.jaccard_pairs_sql(
            threshold=JACCARD_THRESHOLD, lsh_candidates=True
        ),
        "dedup_clusters": pipe.dedup_clusters_sql(
            threshold=JACCARD_THRESHOLD
        ),
        # the star variant must agree with the SAME transitive-closure
        # oracle — two independent Spark algorithms, one ground truth
        "dedup_clusters_star": pipe.dedup_clusters_sql(
            threshold=JACCARD_THRESHOLD
        ),
        "dedup_canonical": pipe.cluster_representatives_sql(
            threshold=JACCARD_THRESHOLD
        ),
        "dup_spans": pipe.dup_spans_sql(),
        "mirror_hosts": pipe.mirror_hosts_sql(
            threshold=JACCARD_THRESHOLD
        ),
        "curation_funnel2": pipe.curation_funnel_v2_sql(
            jaccard_threshold=JACCARD_THRESHOLD
        ),
        "sample_stratified": pipe.stratified_sample_sql(SAMPLE_FRACTIONS),
        "sample_weighted": pipe.weighted_sample_sql(),
        "sample_split": pipe.split_train_holdout_sql(HOLDOUT_FRACTION),
        "simhash": pipe.simhash_sql(),
        "simhash_pairs": pipe.simhash_near_pairs_sql(),
        "embedding_neardup": pipe.embedding_near_pairs_sql(
            threshold=EMB_NEAR_THRESHOLD
        ),
        "embedding_neardup_lsh": pipe.embedding_near_pairs_lsh_sql(
            threshold=EMB_NEAR_THRESHOLD
        ),
        "ann_bruteforce": pipe.ann_bruteforce_sql(ANN_QUERY_IDS),
        "ann_lsh_buckets": pipe.lsh_buckets_sql(),
        "ann_lsh": pipe.ann_lsh_sql(ANN_QUERY_IDS),
        "ivf_assign": pipe.ivf_assign_sql(),
        "kmeans_assign": pipe.kmeans_assign_sql(),
        "knn_graph": pipe.knn_graph_sql(k=5),
        "semdedup": pipe.semdedup_sql(threshold=SEMDEDUP_THRESHOLD),
        "ann_ivf": pipe.ann_ivf_sql(ANN_QUERY_IDS),
        "media_stats": pipe.media_stats_sql(),
        "media_features": pipe.media_features_sql(),
        "image_features": pipe.image_features_sql(),
        "media_frames": pipe.frame_sample_sql(),
        "rel_pricing_summary": pipe.pricing_summary_sql(),
        "rel_revenue_by_nation": pipe.revenue_by_nation_sql(),
        "rel_semi_join": pipe.customers_with_orders_sql(),
        "rel_anti_join": pipe.customers_without_orders_sql(),
        "rel_window_running": pipe.order_ranks_sql(),
        "rel_rollup": pipe.status_rollup_sql(),
        "rel_topk_per_group": pipe.top_parts_sql(),
        "rel_small_qty": pipe.small_quantity_revenue_sql(),
        "events_windowed": pipe.events_windowed_sql(),
        "events_attribution": pipe.attribution_pairs_sql(),
        "events_last_touch": pipe.last_touch_attribution_sql(),
        "events_sessionize": pipe.events_sessionize_sql(),
        "events_transitions": pipe.item_transitions_sql(),
        "events_abandonment": pipe.session_abandonment_sql(),
        "events_props": pipe.events_props_sql(),
        "events_coec": pipe.coec_sql(),
        "events_rollup": pipe.events_rollup_sql(),
        "search_keyset": ora.search_bm25_sql(Q_BM25_COMMON, limit=10, offset=10),
        "term_vectors": ora.term_vectors_sql(TV_DOC_IDS),
        "facet_datehist": ora.facet_date_histogram_sql(Q_AND2, bucket_secs=3600),
        "stats_bucket": ora.stats_bucket_sql(Q_AND2, bucket_secs=3600),
        "significant_terms": ora.significant_terms_sql(Q_AND2),
        "search_wildcard": ora.search_wildcard_sql(WILDCARD_PAT),
        "search_regexp": ora.search_regexp_sql(REGEXP_PAT),
        "search_qstring": ora.search_query_string_sql(QSTRING),
        "search_wildcard_rev": ora.search_wildcard_sql(WILDCARD_REV_PAT),
        "explain_score": ora.explain_score_sql(Q_BM25_COMMON),
        "search_msm": ora.search_bm25_msm_sql(Q_BM25, min_should_match=2),
        "search_relaxed": ora.search_bm25_relaxed_sql(Q_RELAXED),
        "search_rm3": ora.search_rm3_sql(Q_AND2),
        "ltr_features": ora.ltr_features_sql(Q_BM25_COMMON),
        "search_relaxed_and": ora.search_bm25_relaxed_sql(Q_BM25),
        "search_per_lang": ora.search_bm25_per_lang_sql(
            Q_BM25_COMMON, k_per_lang=5
        ),
        "search_diversified": ora.search_diversified_sql(Q_BM25_COMMON),
        "search_lmd": ora.search_lmd_sql(Q_BM25_COMMON),
        "search_lmjm": ora.search_lmjm_sql(Q_BM25),
        "search_dfr": ora.search_dfr_sql(Q_BM25_COMMON),
        "search_ib": ora.search_ib_sql(Q_OR),
        "search_bm25_plus": ora.search_bm25_plus_sql(Q_BM25_COMMON),
        "geo_distance": ora.geo_distance_sql(*GEO_PARIS, GEO_RADIUS_M),
        "geo_bbox": ora.geo_bbox_sql(-30.0, 30.0, 150.0, -150.0),
        "geotile_grid": ora.geotile_grid_sql(zoom=4, size=15),
        "geo_rings": ora.geo_rings_sql(*GEO_NYC, GEO_RING_EDGES),
        "distance_feature": ora.distance_feature_sql(
            *GEO_PARIS, pivot_m=1_000_000.0
        ),
        "boxplot": pipe.boxplot_sql(),
        "t_test": pipe.t_test_sql(),
        "geo_centroid": ora.geo_centroid_sql(),
        "search_filtered": ora.search_bm25_filtered_sql(
            Q_BM25_COMMON,
            f"d.lang = 'en' AND (1704067200 + 60 * d.doc_id) >= {FILTER_EPOCH}",
        ),
        "search_hybrid": pipe.search_hybrid_rrf_sql(
            Q_BM25_COMMON, HYBRID_QUERY_VEC
        ),
        "search_rerank": pipe.search_semantic_rerank_sql(
            Q_BM25_COMMON, HYBRID_QUERY_VEC
        ),
        "datehist_pipeline": ora.datehist_pipeline_sql(Q_AND2,
                                                       bucket_secs=3600),
        "datehist_pipeline2": ora.datehist_pipeline2_sql(Q_AND2,
                                                         bucket_secs=3600),
        "terms_set": ora.terms_set_sql(Q_BM25),
        "term_suggester": ora.term_suggester_sql(SUGGEST_TOKEN),
        "auto_datehist": ora.auto_date_histogram_sql(Q_AND2,
                                                     target_buckets=20),
        "top_metrics": ora.top_metrics_sql(),
        "rank_eval": ora.rank_eval_sql(Q_BM25_COMMON, k=10),
        "hll_vocab": pipe.hll_vocab_sql(),
        "cm_heavy_hitters": pipe.cm_heavy_hitters_sql(k=20),
        "export_shards": pipe.export_shards_sql(n_shards=16),
        "export_manifest": pipe.export_manifest_sql(n_shards=16),
        "pack_sequences": pipe.pack_sequences_sql(cap=512, buckets=64),
        "chunk_docs": pipe.chunk_documents_sql(chunk_size=32, overlap=8),
        # search_results intentionally has no oracle (snippet strings are
        # pinned by pure-Python goldens in tests/test_snippet.py)
    }
