"""Closed-class irregular/suppletive overlay (textproc/irregulars.py).

The table rides the dictionary path, so the four-emitter bit-equality
is inherited from the lemma-dictionary tests (test_morphology.py
TestEmitters + the DuckDB VALUES join pin); what this file pins is the
overlay's own contract: the mappings themselves, the merge rules
(protected carve-out, values-are-hits, LEMMA_MAP precedence), and its
provable inertness on the frozen gate corpora.
"""

import duckdb
import pytest

from search_engine_spark.textproc import lemmas
from search_engine_spark.textproc.irregulars import IRREGULAR_MAP
from search_engine_spark.textproc.lemmas import FULL_LEMMA_MAP, lemma
from search_engine_spark.textproc.morphology_ext import PROTECTED_TOKENS


class TestMappings:
    @pytest.mark.parametrize(
        "form,normal",
        [
            ("said", "say"),
            ("laid", "lay"),
            ("woke", "wake"),
            ("torn", "tear"),
            ("swept", "sweep"),
            ("struck", "strike"),
            ("withdrew", "withdraw"),
            ("better", "good"),
            ("worst", "bad"),
            ("selves", "self"),
            ("люди", "человек"),
            ("людьми", "человек"),
            ("дети", "ребёнок"),
            ("шёл", "идти"),
            ("шла", "идти"),
            ("идут", "идти"),
            ("был", "быть"),
            ("будет", "быть"),
            ("хочет", "хотеть"),
            ("может", "мочь"),
            ("мог", "мочь"),
            ("нашли", "найти"),
            ("скажут", "сказать"),
            ("взяла", "взять"),
            ("умер", "умереть"),
        ],
    )
    def test_suppletive_lookup(self, form, normal):
        assert lemma(form) == normal
        assert FULL_LEMMA_MAP[form] == normal

    def test_values_are_dictionary_hits(self):
        """Every irregular's lemma is itself a dictionary entry (identity
        row) — it must never fall through to the rule tier, which would
        suffix-strip e.g. 'идти' or 'мочь'."""
        for v in set(IRREGULAR_MAP.values()):
            assert FULL_LEMMA_MAP.get(v) == v, v

    def test_ambiguous_forms_stay_out(self):
        """Curation rule: surface forms that also read as another
        word's case form are excluded — the generated dictionary's (or
        identity) reading stands."""
        for w in ("дали", "дам", "ели", "сели", "села", "начало"):
            assert IRREGULAR_MAP.get(w) is None, w
        # and the pre-existing generated readings were not overridden
        assert FULL_LEMMA_MAP["рос"] == "роса"
        assert FULL_LEMMA_MAP["сел"] == "село"

    def test_protected_carve_out_and_overlay_precedence(self):
        """Protected tokens keep their frozen analysis even if listed
        in IRREGULAR_MAP (same carve-out as the rule tier), and the
        hand-frozen LEMMA_MAP overlay still wins on any conflict."""
        for w in PROTECTED_TOKENS & set(IRREGULAR_MAP):
            assert lemma(w) == w, w
        for k, v in lemmas.LEMMA_MAP.items():
            assert FULL_LEMMA_MAP[k] == v, k

    def test_no_stopword_keys(self):
        from search_engine_spark.textproc.stopwords import STOPWORDS

        assert not set(IRREGULAR_MAP) & STOPWORDS


class TestInertOnGateCorpora:
    def test_absent_from_sf_and_adversarial_vocab(self):
        """The overlay is provably inert on the frozen correctness
        corpora: no irregular FORM occurs in the sf0.001/sf0.01
        documents or the adversarial corpus, so every committed golden
        and driver hash is unaffected by construction (the same
        inertness argument the rule tier shipped with)."""
        # keys AND analysis-changing values (r05 self-review — the
        # original scan proved only half the inertness claim): the
        # overlay also promotes each irregular's LEMMA to an identity
        # dictionary hit, which changes a corpus word's analysis
        # exactly when the rule tier used to strip it (быть→быт,
        # string→str, …). Rule-neutral values (e.g. 'stride', which
        # does occur in the adversarial corpus) emit the same lemma
        # either way and are excluded by construction.
        from search_engine_spark.textproc.ruletier import rule_lemma

        keys = sorted(
            set(IRREGULAR_MAP)
            | {
                v
                for v in IRREGULAR_MAP.values()
                if rule_lemma(v) != v
            }
        )
        inlist = ",".join(f"'{k}'" for k in keys)
        con = duckdb.connect()
        for sf in ("sf0.001", "sf0.01"):
            n = con.sql(
                f"""SELECT count(*) FROM
                '/root/testdata/{sf}/documents.parquet' d,
                unnest(string_split_regex(lower(coalesce(d.text,'')),
                       '\\s+')) AS t(tok)
                WHERE trim(t.tok, '.,!?()\"''') IN ({inlist})"""
            ).fetchone()[0]
            assert n == 0, sf
        con.close()
        from tests.adversarial_corpus import ADV_DOCS

        ks = set(keys)
        for _i, text, _l in ADV_DOCS:
            for w in str(text or "").lower().split():
                assert w.strip(".,!?()\"'") not in ks, w


class TestEndToEnd:
    def test_postings_conflate_through_all_emitters(self, spark):
        """A micro-corpus of irregular forms indexes under the base
        lemmas through the real Arrow tokenize path, and the DuckDB
        oracle's terms CTE (VALUES-join dictionary) agrees exactly."""
        from search_engine_spark.functions.oracle_fragments import (
            terms_cte,
        )
        from search_engine_spark.operators.index_build import (
            build_postings,
        )

        rows = [
            (1, "went said people better", "u1", 200, "s"),
            (2, "шёл люди хочет может", "u2", 200, "s"),
            (3, "go say человек идти", "u3", 200, "s"),
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, url string, "
            "status int, site string"
        )
        got = sorted(
            (r["doc_id"], r["term"], r["tf"])
            for r in build_postings(docs).collect()
        )
        # suppletive conflation: doc 1/2 share terms with doc 3
        terms1 = {t for d, t, _ in got if d == 1}
        terms3 = {t for d, t, _ in got if d == 3}
        assert {"go", "say", "good"} <= terms1
        assert {"go", "say"} <= terms3
        terms2 = {t for d, t, _ in got if d == 2}
        assert {"идти", "человек", "хотеть", "мочь"} <= terms2
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, "
            "url VARCHAR, status INT, site VARCHAR)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?,?,?,?,?)", rows
        )
        want = sorted(
            con.sql(
                f"""WITH {terms_cte('documents')}
                SELECT doc_id, term, count(*)::INT AS tf
                FROM terms GROUP BY 1, 2"""
            ).fetchall()
        )
        con.close()
        assert got == want
