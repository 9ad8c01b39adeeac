"""Positional block codec + phrase-over-blocks (operators/positional_blocks.py)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.operators.positional import (
    build_positional,
    search_phrase,
)
from search_engine_spark.operators.positional_blocks import (
    build_positional_blocks,
    decode_pos_block,
    decode_positional_blocks,
    encode_pos_blocks_columns,
    search_phrase_blocks,
)
from search_engine_spark.sources.documents import load_documents

from tests.conftest import SF_TEST

# ------------------------------------------------------------- codec level


@st.composite
def occurrences(draw):
    """Sorted (doc_id, pos) occurrence lists: a few docs, each with a
    sorted position list (duplicates impossible by construction)."""
    n_docs = draw(st.integers(1, 6))
    ids, poss = [], []
    doc = 0
    for _ in range(n_docs):
        doc += draw(st.integers(1, 1 << 40))
        plist = sorted(
            draw(
                st.sets(st.integers(0, 1 << 20), min_size=1, max_size=300)
            )
        )
        ids.extend([doc] * len(plist))
        poss.extend(plist)
    return np.array(ids, dtype=np.int64), np.array(poss, dtype=np.int64)


@settings(max_examples=60, deadline=None)
@given(occurrences())
def test_codec_roundtrip(occ):
    ids, poss = occ
    cols = encode_pos_blocks_columns(ids, poss)
    got_ids, got_poss = [], []
    for b in range(len(cols["doc_bytes"])):
        i, p = decode_pos_block(
            cols["doc_bytes"][b], cols["pos_bytes"][b], int(cols["count"][b])
        )
        got_ids.append(i)
        got_poss.append(p)
    assert np.array_equal(np.concatenate(got_ids), ids)
    assert np.array_equal(np.concatenate(got_poss), poss)


def test_codec_empty():
    cols = encode_pos_blocks_columns(
        np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    )
    assert cols["doc_bytes"] == [] and len(cols["count"]) == 0


def test_zone_map_metadata():
    ids = np.array([5, 5, 5, 9, 200], dtype=np.int64)
    poss = np.array([0, 3, 7, 1, 2], dtype=np.int64)
    cols = encode_pos_blocks_columns(ids, poss)
    assert cols["first_doc"][0] == 5 and cols["last_doc"][0] == 200


# --------------------------------------------------------- DataFrame level


@pytest.fixture(scope="module")
def docs(spark):
    return load_documents(spark, SF_TEST).cache()


def test_blocks_roundtrip_matches_positional(spark, docs):
    pos = build_positional(docs)
    blocks = build_positional_blocks(pos, n_buckets=8)
    back = decode_positional_blocks(blocks)
    a = sorted(map(tuple, pos.collect()))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def test_phrase_over_blocks_matches_direct(spark, docs):
    blocks = build_positional_blocks(build_positional(docs), n_buckets=8).cache()
    for phrase in ("fast table", "the", "nosuchterm fast"):
        direct = search_phrase(docs, phrase).collect()
        via_blocks = search_phrase_blocks(blocks, phrase).collect()
        assert sorted(map(tuple, direct)) == sorted(map(tuple, via_blocks))
    blocks.unpersist()
