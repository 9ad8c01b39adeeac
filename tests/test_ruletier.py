"""Rule-tier OOV fallback (textproc/ruletier.py) — spec pins + the
four-emitter equality contract (Python / pandas / Spark Column / DuckDB
CASE must agree byte-for-byte on every token)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from search_engine_spark.textproc import morphology_ext as ext
from search_engine_spark.textproc import ruletier as R
from search_engine_spark.textproc.lemmas import FULL_LEMMA_MAP, lemma


class TestSpec:
    @pytest.mark.parametrize(
        "w,want",
        [
            # EN plural family
            ("wugs", "wug"),
            ("studies", "study"),
            ("classes", "class"),
            ("churches", "church"),
            ("bushes", "bush"),
            ("foxes", "fox"),
            ("quizzes", "quizz"),
            ("heroes", "hero"),
            ("gas", "gas"),       # len<4 → identity
            ("kiss", "kiss"),     # -ss exempt
            ("virus", "virus"),   # -us exempt
            ("basis", "basis"),   # -is exempt
            # EN verb family with undoubling
            ("walked", "walk"),
            ("planned", "plan"),
            ("telling", "tell"),  # ll keeps its doubling
            ("hissing", "hiss"),  # ss keeps
            ("buzzing", "buzz"),  # zz keeps
            ("running", "run"),
            ("sing", "sing"),     # len<6 → identity
            ("used", "used"),     # len<5 → identity
            # RU declension/conjugation (OOV stems)
            ("вагонами", "вагон"),
            ("вагоны", "вагон"),
            ("вагонах", "вагон"),
            ("вагонов", "вагон"),
            ("синего", "син"),
            ("бегут", "бег"),
            ("дом", "дом"),       # no suffix → identity
            ("сок", "сок"),       # stem floor blocks 1-char strip? 'сок' has no listed suffix match with stem>=3
            # guards
            ("qqqzzz", "qqqzzz"),
            ("a-b", "a-b"),           # hyphenated → identity
            ("mixedслово", "mixedслово"),  # mixed script → identity
        ],
    )
    def test_examples(self, w, want):
        assert R.rule_lemma(w) == want

    def test_protected_exempt(self):
        for w in sorted(ext.PROTECTED_TOKENS):
            assert R.rule_lemma(w) == w
        # 'orders' would strip to 'order' were it not... it IS protected? no:
        # 'order' is protected, 'orders' is not necessarily — the guard is
        # only about the frozen tokens themselves
        assert R.rule_lemma("data") == "data"
        assert R.rule_lemma("merges") != "merges" or "merges" in FULL_LEMMA_MAP

    def test_suffix_order_longest_first(self):
        lens = [len(s) for s in R.RU_SUFFIXES]
        assert lens == sorted(lens, reverse=True)
        assert len(set(R.RU_SUFFIXES)) == len(R.RU_SUFFIXES)

    def test_ru_one_suffix_only_and_stem_floor(self):
        # one strip, not iterated: 'вагонами' loses only 'ами'
        assert R.rule_lemma("вагонами") == "вагон"
        # stem floor 3: 'еды' (stem would be 2) stays
        assert R.rule_lemma("еды") == "еды"

    def test_gate_corpus_untouched(self):
        """No sf0.001/sf0.01 corpus token is rule-conflated (they are all
        in-dictionary, PROTECTED, or rule-inert) — committed goldens and
        oracle pairs are provably unchanged by the tier. Mirrors the
        pre-merge audit; guards future corpus/rule drift."""
        import re

        from search_engine_spark.textproc.stopwords import STOPWORDS
        from search_engine_spark.textproc.tokenize import (
            BOUNDARY_STRIP,
            WORD_PATTERN,
            WS_SPLIT,
        )
        from tests.conftest import SF_TEST

        con = duckdb.connect()
        toks = con.sql(
            f"""SELECT DISTINCT regexp_replace(t.tok, '{BOUNDARY_STRIP}', '', 'g') AS term
            FROM '{SF_TEST}/documents.parquet' d,
            unnest(string_split_regex(lower(trim(coalesce(d.text,''))), '{WS_SPLIT}')) AS t(tok)"""
        ).fetchall()
        con.close()
        word_re = re.compile(WORD_PATTERN)
        for (w,) in toks:
            if not w or not word_re.match(w) or w in STOPWORDS:
                continue
            if w in FULL_LEMMA_MAP:
                continue
            assert R.rule_lemma(w) == w, w


def _probe_words() -> list[str]:
    """A broad deterministic probe set: crafted spec words, adversarial
    corpus tokens, dictionary forms (rule must be a no-op THROUGH lemma()
    for them — they hit tier 1), protected tokens, and edge shapes."""
    words = [
        "wugs", "studies", "classes", "churches", "foxes", "heroes",
        "walked", "planned", "telling", "running", "used", "sing",
        "gas", "kiss", "virus", "basis", "s", "es", "ed", "ing",
        "ss", "ssss", "iiies", "aies", "oes", "does", "shoes",
        "вагонами", "вагоны", "вагонах", "синего", "бегут", "еды",
        "ь", "ы", "ами", "вами", "трёхэтажного", "привет",
        "a-b", "data-set", "qqqzzz", "x", "",
    ]
    words += sorted(ext.PROTECTED_TOKENS)
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "golden_lemma_pairs_v3.json"
    )
    with open(path, encoding="utf-8") as fh:
        words += [f for f, _ in json.load(fh)][:400]
    from tests.adversarial_corpus import ADV_DOCS

    for _id, text, _lang in ADV_DOCS:
        if text:
            words += str(text).lower().split()
    # tokens must be cleaned (the rule tier sits after the cleaners);
    # keep raw ones anyway — all emitters must still agree on junk
    return sorted({w for w in words if "'" not in w and "|" not in w})


def test_pandas_emitter_matches_python():
    words = _probe_words()
    s = pd.Series(words, dtype=object)
    assert list(R.rule_series(s)) == [R.rule_lemma(w) for w in words]


def test_duckdb_emitter_matches_python():
    words = _probe_words()
    con = duckdb.connect()
    con.execute("CREATE TABLE w(t VARCHAR)")
    con.executemany("INSERT INTO w VALUES (?)", [(w,) for w in words])
    got = dict(
        con.sql(f"SELECT t, {R.rule_lemma_sql('t')} FROM w").fetchall()
    )
    con.close()
    for w in words:
        assert got[w] == R.rule_lemma(w), w


def test_spark_emitter_matches_python(spark):
    from pyspark.sql import functions as F

    words = _probe_words()
    df = spark.createDataFrame([(w,) for w in words], "t string")
    got = {
        r["t"]: r["r"]
        for r in df.select(
            "t", R.rule_lemma_col(F.col("t")).alias("r")
        ).collect()
    }
    for w in words:
        assert got[w] == R.rule_lemma(w), w


@settings(max_examples=300, deadline=None)
@given(
    st.text(
        alphabet=st.sampled_from(
            list("abcdefgstuvxyz") + list("абвгдеиклмнопрстуыьэюяё")
        ),
        min_size=0,
        max_size=12,
    )
)
def test_duckdb_emitter_matches_python_random(w):
    con = duckdb.connect()
    got = con.sql(
        f"SELECT {R.rule_lemma_sql('t')} FROM (VALUES (?)) v(t)",
        params=[w],
    ).fetchone()[0]
    con.close()
    assert got == R.rule_lemma(w), w


def test_lemma_integration_dictionary_wins():
    """Tier order: dictionary beats rule ('машинами' is a dictionary
    form → 'машина', not the rule strip 'машин'); misses take the rule
    ('вагонами' → 'вагон'); rule-inert misses keep identity."""
    assert lemma("машинами") == "машина"
    assert lemma("вагонами") == "вагон"
    assert lemma("qqqzzz") == "qqqzzz"


def test_rule_golden_pairs():
    """Committed (form → rule lemma) pairs — regeneration drift pin for
    the rule tier (scripts/gen_rule_goldens.py)."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(__file__), "golden_rule_lemmas.json"
    )
    with open(path, encoding="utf-8") as fh:
        golden = json.load(fh)
    assert len(golden) >= 1500
    for form, want in golden:
        assert lemma(form) == want, (form, want)
