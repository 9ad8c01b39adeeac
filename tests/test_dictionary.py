"""Unit tests for operators/dictionary.py — front-coded term-dictionary
blocks (oracle parity at fixture scale: dict_blocks_roundtrip)."""

import __spark_entry__ as entrymod
from search_engine_spark.operators import index_build as ib
from search_engine_spark.operators.dictionary import (
    BLOCK_SIZE,
    decode_front_blocks,
    front_code_blocks,
    term_ranks,
)
from tests.conftest import SF_TEST


def _term_dict(spark):
    docs, postings = entrymod._search_ctx(spark, SF_TEST)
    return ib.build_term_dict(postings)


def test_ranks_are_dense_lexicographic(spark):
    td = _term_dict(spark)
    rows = term_ranks(td).orderBy("rank").collect()
    assert [r["rank"] for r in rows] == list(range(len(rows)))
    terms = [r["term"] for r in rows]
    assert terms == sorted(terms)


def test_block_layout_and_lcp_fields(spark):
    td = _term_dict(spark)
    blocks = front_code_blocks(td).collect()
    n_terms = td.count()
    assert sum(b["n_terms"] for b in blocks) == n_terms
    full = (n_terms // BLOCK_SIZE) if n_terms % BLOCK_SIZE else n_terms // BLOCK_SIZE
    for b in blocks:
        assert 1 <= b["n_terms"] <= BLOCK_SIZE
        assert len(b["lcps"]) == b["n_terms"] - 1
        assert len(b["suffixes"]) == b["n_terms"] - 1
        assert len(b["dfs"]) == b["n_terms"]
        # lcp is a true common-prefix length: decode by hand
        prev = b["head"]
        for lcp, suf in zip(b["lcps"], b["suffixes"]):
            cur = prev[:lcp] + suf
            assert cur > prev  # sorted within block
            assert cur[:lcp] == prev[:lcp]
            prev = cur


def test_roundtrip_on_fixture(spark):
    td = _term_dict(spark)
    back = decode_front_blocks(front_code_blocks(td))
    a = sorted(map(tuple, td.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_compression_on_prefix_rich_vocabulary(spark):
    """Front coding wins exactly when neighbors share prefixes — a
    realistic inflection-heavy vocabulary (the fixture's 29 unrelated
    short words is the anti-case and rightly does NOT shrink)."""
    words = [
        f"{stem}{suffix}"
        for stem in ("compress", "connect", "construct", "distribut",
                     "internation", "transform")
        for suffix in ("", "ed", "er", "ers", "ing", "ion", "ions", "ive",
                       "ivity", "or", "ors", "s")
    ]
    td = spark.createDataFrame(
        [(w, 1, 2) for w in sorted(set(words))],
        "term string, df long, cf long",
    )
    blocks = front_code_blocks(td).persist()
    back = decode_front_blocks(blocks)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, td.collect())
    )
    size = blocks.groupBy().sum("raw_bytes", "coded_bytes").collect()[0]
    raw, coded = size[0], size[1]
    assert coded < raw * 0.66, (raw, coded)
    blocks.unpersist()


def test_heads_sorted_across_blocks(spark):
    """The property block-level binary search needs: block heads ascend
    with block_id."""
    td = _term_dict(spark)
    rows = front_code_blocks(td).orderBy("block_id").collect()
    heads = [r["head"] for r in rows]
    assert heads == sorted(heads)


# ----------------------------------------------------------- property suite

from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.dictionary import front_code, front_decode

_term = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=0x2FFF),
    min_size=1,
    max_size=24,
)


@given(st.lists(_term, min_size=1, max_size=40, unique=True))
@settings(max_examples=300, deadline=None)
def test_front_code_roundtrip_arbitrary_terms(terms):
    block = sorted(terms)
    head, lcps, suffixes, raw, coded = front_code(block)
    assert front_decode(head, lcps, suffixes) == block
    # every lcp really is a common prefix with the predecessor
    for prev, cur, lcp in zip(block, block[1:], lcps):
        assert prev[:lcp] == cur[:lcp]
        assert lcp == len(cur) or lcp == len(prev) or prev[lcp] != cur[lcp]


@given(st.lists(_term, min_size=2, max_size=40, unique=True))
@settings(max_examples=100, deadline=None)
def test_front_decode_matches_spark_fold_semantics(terms):
    """The pure decoder and the declarative F.aggregate fold state the
    same recurrence: out[i] = out[i-1][:lcp] + suffix. Checked by
    recomputing the fold by hand."""
    block = sorted(terms)
    head, lcps, suffixes, _, _ = front_code(block)
    acc = [head]
    for lcp, suf in zip(lcps, suffixes):
        acc.append(acc[-1][:lcp] + suf)
    assert acc == front_decode(head, lcps, suffixes) == block


# -------------------------------------------------- trigram substring index

def test_trigram_candidates_equal_bruteforce_contains(spark):
    """The accelerator is lossless: for every pattern, the trigram-probe
    candidate set equals the plain contains() dictionary scan."""
    from pyspark.sql import functions as F

    from search_engine_spark.operators.dictionary import (
        substring_candidates,
    )
    from search_engine_spark.operators.index_build import (
        build_postings,
        build_term_dict,
    )
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    td = build_term_dict(build_postings(load_documents(spark, SF_TEST)))
    for pat in ("ast", "erg", "que", "xyz", "at", "data"):
        got = [(r["term"], r["df"])
               for r in substring_candidates(td, pat).collect()]
        want = [(r["term"], r["df"]) for r in td.filter(
            F.col("term").contains(pat)).orderBy("term").limit(128).collect()]
        assert got == want, pat


def test_trigram_index_covers_every_term(spark):
    """Every dictionary term appears in the gram index (short terms via
    their whole form), and each gram really occurs in its term."""
    from search_engine_spark.operators.dictionary import term_trigram_index
    from search_engine_spark.operators.index_build import (
        build_postings,
        build_term_dict,
    )
    from search_engine_spark.sources.documents import load_documents
    from tests.conftest import SF_TEST

    td = build_term_dict(build_postings(load_documents(spark, SF_TEST)))
    idx = term_trigram_index(td).collect()
    terms = {r["term"] for r in td.collect()}
    assert {r["term"] for r in idx} == terms
    for r in idx:
        assert r["gram"] in r["term"]
        assert len(r["gram"]) == 3 or r["gram"] == r["term"]
