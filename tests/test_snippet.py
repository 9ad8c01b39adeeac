"""Q7/Q8 goldens — snippet builder + title extraction + lemmatizer.

Expected strings are hand-derived from the reference algorithm
(services/LemmasFinder.java:72-252) with words_range=2 (the default,
config/SearchSettings.java:13). Every structural rule gets a case:
context windows, '...' separators, <b> merge, prefix/suffix punctuation,
270-char <details> spoiler, line boundaries, stop-POS skipping.
"""

from __future__ import annotations

import pytest

from search_engine_spark.textproc.extract import extract_title
from search_engine_spark.textproc.lemmas import lemma
from search_engine_spark.textproc.snippet import build_snippet
from search_engine_spark.textproc.tokenize import tokenize


# --------------------------------------------------------------- lemmatizer

def test_lemma_first_normal_form():
    # reference rule: FIRST normal form wins (LemmasFinder.java:327-342)
    assert lemma("tested") == "test"
    assert lemma("testing") == "testing"  # 'testing' is itself a lemma
    assert lemma("tables") == "table"
    assert lemma("тесты") == "тест"
    assert lemma("unknownword") == "unknownword"


def test_tokenize_lemmatizes_by_default():
    assert tokenize("Tables were tested") == ["table", "test"]
    assert tokenize("Tables were tested", lemmatize=False) == ["tables", "tested"]


# ----------------------------------------------------------------- snippets

def test_empty_text():
    assert build_snippet("", {"data"}) == ""
    assert build_snippet("   \n  ", {"data"}) == ""


def test_no_match_line_emits_nothing():
    assert build_snippet("alpha beta gamma", {"data"}) == ""


def test_single_match_with_context():
    # words: alpha beta gamma data delta epsilon zeta (all significant)
    # left context = 2 significant words (beta gamma), preceded by '...';
    # right context = 2 words (delta epsilon) then ' ...'
    out = build_snippet("alpha beta gamma data delta epsilon zeta", {"data"})
    assert out == "... beta gamma <b>data</b> delta epsilon ..."


def test_match_at_line_start():
    out = build_snippet("data delta epsilon zeta", {"data"})
    assert out == "<b>data</b> delta epsilon ..."


def test_match_at_line_end():
    out = build_snippet("alpha beta gamma data", {"data"})
    assert out == "... beta gamma <b>data</b>"


def test_adjacent_matches_merge_into_one_tag():
    # 'big data big data' with both lemmas searched: consecutive matched
    # words join inside one <b> (LemmasFinder.java:161-167)
    out = build_snippet("alpha big data gamma", {"big", "data"})
    assert out == "... alpha <b>big data</b> gamma"


def test_nonadjacent_matches_two_tags():
    out = build_snippet("data alpha data", {"data"})
    assert out == "<b>data</b> alpha <b>data</b>"


def test_punctuation_kept_outside_tag():
    # cleanup strips boundary symbols for matching; the original
    # prefix/suffix re-emit outside the <b> tag (LemmasFinder.java:157-175)
    out = build_snippet("alpha (data). beta", {"data"})
    assert out == "... alpha (<b>data</b>). beta"


def test_case_preserved_in_highlight():
    out = build_snippet("alpha Data beta", {"data"})
    assert out == "... alpha <b>Data</b> beta"


def test_stopwords_not_significant_but_emitted_in_context():
    # 'the' is a stop-POS word: never counted as significant context, but
    # plain words between boundaries are emitted verbatim
    out = build_snippet("alpha beta the gamma data delta", {"data"})
    # significant left context = beta, gamma (the 2 nearest significant),
    # and the emission range starts at 'beta' original index → includes 'the'
    assert out == "... beta the gamma <b>data</b> delta"


def test_far_apart_matches_get_ellipsis_separator():
    out = build_snippet("data alpha beta gamma delta epsilon zeta data", {"data"})
    assert out == (
        "<b>data</b> alpha beta ... epsilon zeta <b>data</b>"
    )


def test_multiline_fragments_never_cross_lines():
    out = build_snippet("alpha data beta\ngamma data delta", {"data"})
    # the cross-line separator "..." appends with no space (reference
    # StringBuilder append, LemmasFinder.java:196-199)
    assert out == "... alpha <b>data</b> beta... gamma <b>data</b> delta"


def test_no_match_after_matched_line_appends_ellipsis_once():
    out = build_snippet("alpha data beta gamma delta epsilon\nzeta eta", {"data"})
    assert out == "... alpha <b>data</b> beta gamma ..."


def test_spoiler_after_270_chars():
    # enough matches to exceed 270 chars, then <details> wraps remainder
    line = " ".join(["data alpha beta gamma delta"] * 12)
    out = build_snippet(line, {"data"})
    assert "<details>" in out
    assert out.endswith("</details>")
    head = out.split("<details>")[0]
    assert len(head) > 270 - 30  # spoiler starts near the threshold


def test_inflected_word_matches_base_lemma():
    # query lemma 'table' highlights the surface form 'Tables'
    out = build_snippet("alpha Tables beta", {"table"})
    assert out == "... alpha <b>Tables</b> beta"


# -------------------------------------------------------------------- title

def test_extract_title():
    assert extract_title(b"<html><head><title>Doc 7</title></head></html>") == "Doc 7"
    assert extract_title(b"<html><body>x</body></html>") == ""
    assert extract_title("<title> A &amp; B </title>") == "A & B"
