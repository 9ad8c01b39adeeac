"""Rank-identity goldens (SURVEY §5 item 4): hand-computed expected
rankings over a crafted corpus — compat (Σtf/max, the reference scoring)
and BM25 — exercised through the full block-index engine.

Corpus design (doc_id: text):
  0: data data data           → tf(data)=3
  1: data data fast           → tf(data)=2, tf(fast)=1
  2: data fast fast           → tf(data)=1, tf(fast)=2
  3: fast fast fast           → no 'data'
  4: data fast                → tf=1,1 (tie partner of 5)
  5: fast data                → tf=1,1 — same scores as 4: doc_id tiebreak
  6: Tables were tested fast data   → inflected: tables→table, tested→test
  7: большие таблицы и данные        → ru; таблицы→таблица, данные→данный
  8: (empty)
  9: the of and in            → stopwords only
"""

from __future__ import annotations

import pytest

from search_engine_spark.engine import SearchEngine

DOCS = [
    (0, "data data data"),
    (1, "data data fast"),
    (2, "data fast fast"),
    (3, "fast fast fast"),
    (4, "data fast"),
    (5, "fast data"),
    (6, "Tables were tested fast data"),
    (7, "большие таблицы и данные"),
    (8, ""),
    (9, "the of and in"),
]


@pytest.fixture(scope="module")
def eng(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return SearchEngine(spark, docs=docs, n_buckets=4).build()


def compat(eng, q, **kw):
    return [
        (r["doc_id"], r["score_abs"], r["rel"])
        for r in eng.search(q, mode="compat", **kw).collect()
    ]


def test_compat_single_term_ranking(eng):
    # score = tf(data); docs 1 has 2; docs 2,4,5,6 have 1 → doc_id asc ties
    assert compat(eng, "data") == [
        (0, 3, 1.0),
        (1, 2, round(2 / 3, 4)),
        (2, 1, round(1 / 3, 4)),
        (4, 1, round(1 / 3, 4)),
        (5, 1, round(1 / 3, 4)),
        (6, 1, round(1 / 3, 4)),
    ]


def test_compat_conjunctive_sum(eng):
    # AND 'data fast': scores = tf(data)+tf(fast):
    # doc1: 3, doc2: 3, doc4: 2, doc5: 2, doc6: 2; doc0/3 excluded (AND)
    assert compat(eng, "data fast") == [
        (1, 3, 1.0),
        (2, 3, 1.0),
        (4, 2, round(2 / 3, 4)),
        (5, 2, round(2 / 3, 4)),
        (6, 2, round(2 / 3, 4)),
    ]


def test_tie_break_is_doc_id_asc(eng):
    rows = compat(eng, "data fast")
    scores = [r[1] for r in rows]
    ids = [r[0] for r in rows]
    for i in range(len(rows) - 1):
        if scores[i] == scores[i + 1]:
            assert ids[i] < ids[i + 1]


def test_inflected_query_matches_base_forms(eng):
    # 'tables' lemmatizes to 'table'; only doc 6 (Tables) and 7 (таблицы →
    # таблица ≠ table) — ru word maps to its own lemma, so only doc 6
    assert [r[0] for r in compat(eng, "tables")] == [6]
    assert [r[0] for r in compat(eng, "table")] == [6]
    # 'tested' and 'test' both hit doc 6 (tested→test)
    assert [r[0] for r in compat(eng, "tested")] == [6]


def test_russian_lemmatized_query(eng):
    # 'таблиц' → 'таблица' matches doc 7's 'таблицы' (same normal form);
    # stopword 'и' is dropped, not required
    assert [r[0] for r in compat(eng, "таблиц и")] == [7]
    assert [r[0] for r in compat(eng, "данных таблицы")] == [7]


def test_stopword_only_and_empty(eng):
    assert compat(eng, "the of and") == []
    assert compat(eng, "") == []


def test_absent_term_conjunctive_gate(eng):
    assert compat(eng, "data zzznope") == []


def test_pagination_window(eng):
    full = compat(eng, "data")
    page = compat(eng, "data", limit=2, offset=2)
    assert page == full[2:4]
    beyond = compat(eng, "data", limit=5, offset=100)
    assert beyond == []


def test_bm25_idf_orders_rare_above_common(eng):
    # 'fast' (df=6) vs a doc-set where 'data' (df=6)… craft instead:
    # single-term query scores ∝ idf·saturating tf: doc0 (tf=3) must beat
    # doc1 (tf=2) but by LESS than linear (saturation)
    rows = [(r["doc_id"], r["score"]) for r in eng.search("data").collect()]
    assert rows[0][0] == 0 and rows[1][0] == 1
    assert rows[0][1] < rows[1][1] * 3 / 2  # sub-linear in tf
    # equal-tf docs order by length normalization: shorter dl wins
    # (docs 4,5: dl=2 tie; doc 2: dl=3; doc 6: dl=4)
    assert [d for d, _ in rows[2:]] == [4, 5, 2, 6]
    s = dict(rows)
    assert s[4] == s[5] > s[2] > s[6]
