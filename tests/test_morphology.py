"""Morphology-dictionary goldens (reference T4/T5 semantics, VERDICT r01 #1).

240 frozen (inflected → first-normal-form) pairs pin the GENERATED
dictionary (textproc/morphology.py) across regenerations; further tests pin
the reference-semantics contract: PARTICLES filter == frozen stopwords,
ru-before-en (script) routing, first-normal-form identity rule, overlay
precedence, and the emitter equivalences (Python / Arrow UDF / broadcast
join / DuckDB VALUES join all read the same table).
"""

import pandas as pd
import pytest

from search_engine_spark.textproc import morphology as M
from search_engine_spark.textproc.lemmas import (
    FULL_LEMMA_MAP,
    LEMMA_MAP,
    lemma,
    lemma_items,
)
from search_engine_spark.textproc.stopwords import STOPWORDS

DICT_SIZE_MIN = 3000

GOLDEN_PAIRS = [
    ("accepted", "accept"),
    ("addresses", "address"),
    ("allocates", "allocate"),
    ("arguments", "argument"),
    ("assistants", "assistant"),
    ("batched", "batch"),
    ("beginning", "begin"),
    ("bits", "bit"),
    ("bodies", "body"),
    ("boxes", "box"),
    ("broadcasted", "broadcast"),
    ("bucketing", "bucket"),
    ("buys", "buy"),
    ("cameras", "camera"),
    ("catching", "catch"),
    ("checkpoints", "checkpoint"),
    ("classes", "class"),
    ("closest", "close"),
    ("colleges", "college"),
    ("companies", "company"),
    ("considering", "consider"),
    ("coolest", "cool"),
    ("countries", "country"),
    ("creating", "create"),
    ("dancers", "dancer"),
    ("decodes", "decode"),
    ("delivering", "deliver"),
    ("died", "die"),
    ("disks", "disk"),
    ("drank", "drink"),
    ("driven", "drive"),
    ("eating", "eat"),
    ("encouraged", "encourage"),
    ("establishing", "establish"),
    ("expected", "expect"),
    ("faces", "face"),
    ("fastest", "fast"),
    ("fetches", "fetch"),
    ("filters", "filter"),
    ("floors", "floor"),
    ("forgetting", "forget"),
    ("fridges", "fridge"),
    ("gave", "give"),
    ("going", "go"),
    ("grouped", "group"),
    ("hairs", "hair"),
    ("hashing", "hash"),
    ("heavier", "heavy"),
    ("hiding", "hide"),
    ("hottest", "hot"),
    ("including", "include"),
    ("interpreters", "interpreter"),
    ("journals", "journal"),
    ("kills", "kill"),
    ("knows", "know"),
    ("leaves", "leaf"),
    ("letting", "let"),
    ("listeners", "listener"),
    ("longest", "long"),
    ("lower", "low"),
    ("makes", "make"),
    ("markets", "market"),
    ("meaning", "mean"),
    ("memories", "memory"),
    ("mice", "mouse"),
    ("mouths", "mouth"),
    ("narrowest", "narrow"),
    ("newest", "new"),
    ("notes", "note"),
    ("offsets", "offset"),
    ("ordered", "order"),
    ("papers", "paper"),
    ("partners", "partner"),
    ("persisting", "persist"),
    ("places", "place"),
    ("pointed", "point"),
    ("prepared", "prepare"),
    ("produces", "produce"),
    ("provided", "provide"),
    ("pushing", "push"),
    ("rang", "ring"),
    ("reducing", "reduce"),
    ("remained", "remain"),
    ("reports", "report"),
    ("returning", "return"),
    ("ringing", "ring"),
    ("rollbacking", "rollback"),
    ("runners", "runner"),
    ("sampled", "sample"),
    ("scanned", "scan"),
    ("scientists", "scientist"),
    ("seeking", "seek"),
    ("selecting", "select"),
    ("serialized", "serialize"),
    ("shakes", "shake"),
    ("sharper", "sharp"),
    ("showed", "show"),
    ("sings", "sing"),
    ("slept", "sleep"),
    ("snapshots", "snapshot"),
    ("sorting", "sort"),
    ("spent", "spend"),
    ("started", "start"),
    ("stealing", "steal"),
    ("stops", "stop"),
    ("streets", "street"),
    ("sung", "sing"),
    ("tablets", "tablet"),
    ("tasks", "task"),
    ("tensors", "tensor"),
    ("thinks", "think"),
    ("tighter", "tight"),
    ("tools", "tool"),
    ("tried", "try"),
    ("understood", "understand"),
    ("validates", "validate"),
    ("versions", "version"),
    ("walkers", "walker"),
    ("wars", "war"),
    ("wears", "wear"),
    ("автора", "автор"),
    ("белая", "белый"),
    ("близкая", "близкий"),
    ("богатая", "богатый"),
    ("большую", "большой"),
    ("быстрое", "быстрый"),
    ("важное", "важный"),
    ("верной", "верный"),
    ("ветрах", "ветер"),
    ("вещью", "вещь"),
    ("возможности", "возможность"),
    ("встречи", "встреча"),
    ("выражением", "выражение"),
    ("главного", "главный"),
    ("глубокую", "глубокий"),
    ("говорю", "говорить"),
    ("горам", "гора"),
    ("государствах", "государство"),
    ("группировали", "группировать"),
    ("грязными", "грязный"),
    ("дачу", "дача"),
    ("делаешь", "делать"),
    ("дешёвые", "дешёвый"),
    ("диском", "диск"),
    ("днях", "день"),
    ("доктора", "доктор"),
    ("домами", "дом"),
    ("дорогом", "дорогой"),
    ("другу", "друг"),
    ("журналами", "журнал"),
    ("загружал", "загружать"),
    ("задачи", "задача"),
    ("зелёной", "зелёный"),
    ("знал", "знать"),
    ("значишь", "значить"),
    ("индексировала", "индексировать"),
    ("инженеру", "инженер"),
    ("историям", "история"),
    ("камне", "камень"),
    ("картину", "картина"),
    ("класса", "класс"),
    ("книгами", "книга"),
    ("количестве", "количество"),
    ("копировала", "копировать"),
    ("коротким", "короткий"),
    ("красная", "красный"),
    ("левыми", "левый"),
    ("лицам", "лицо"),
    ("любили", "любить"),
    ("любыми", "любой"),
    ("магазином", "магазин"),
    ("массивом", "массив"),
    ("медленная", "медленный"),
    ("мелкому", "мелкий"),
    ("минутам", "минута"),
    ("моделями", "модель"),
    ("мокрыми", "мокрый"),
    ("народами", "народ"),
    ("недель", "неделя"),
    ("новом", "новый"),
    ("ногу", "нога"),
    ("областями", "область"),
    ("обработк", "обработка"),
    ("обществом", "общество"),
    ("объёме", "объём"),
    ("окном", "окно"),
    ("отвечаете", "отвечать"),
    ("отчёте", "отчёт"),
    ("пакету", "пакет"),
    ("писала", "писать"),
    ("планах", "план"),
    ("поиске", "поиск"),
    ("получаете", "получать"),
    ("помнишь", "помнить"),
    ("последними", "последний"),
    ("правого", "правый"),
    ("примерам", "пример"),
    ("проверял", "проверять"),
    ("пространства", "пространство"),
    ("процессы", "процесс"),
    ("пустых", "пустой"),
    ("работами", "работа"),
    ("размерам", "размер"),
    ("результатам", "результат"),
    ("решило", "решить"),
    ("рублём", "рубль"),
    ("сайтами", "сайт"),
    ("светлому", "светлый"),
    ("секцией", "секция"),
    ("сериям", "серия"),
    ("сильном", "сильный"),
    ("синему", "синий"),
    ("скоростях", "скорость"),
    ("словаря", "словарь"),
    ("служат", "служить"),
    ("смотрела", "смотреть"),
    ("солдатам", "солдат"),
    ("состояний", "состояние"),
    ("спешило", "спешить"),
    ("сравнениям", "сравнение"),
    ("средством", "средство"),
    ("старых", "старый"),
    ("строили", "строить"),
    ("студенте", "студент"),
    ("схемой", "схема"),
    ("счёту", "счёт"),
    ("текстам", "текст"),
    ("тестировал", "тестировать"),
    ("толстую", "толстый"),
    ("точном", "точный"),
    ("тёмное", "тёмный"),
    ("удалением", "удаление"),
    ("узким", "узкий"),
    ("умное", "умный"),
    ("уроках", "урок"),
    ("файле", "файл"),
    ("фильтруете", "фильтровать"),
    ("формы", "форма"),
    ("ходило", "ходить"),
    ("хорошее", "хороший"),
]


class TestGoldens:
    @pytest.mark.parametrize("form,normal", GOLDEN_PAIRS)
    def test_golden(self, form, normal):
        assert lemma(form) == normal

    def test_sample_size(self):
        assert len(GOLDEN_PAIRS) >= 200
        assert sum(1 for f, _ in GOLDEN_PAIRS if M.is_cyrillic(f)) >= 100
        assert sum(1 for f, _ in GOLDEN_PAIRS if not M.is_cyrillic(f)) >= 100


class TestExpansion:
    """Round-3 breadth growth (morphology_ext): ≥30k forms, v3 ⊇ v2."""

    def test_v3_is_strict_superset_of_v2_core(self):
        core = M._core_table()
        table = M.build_lemma_table()
        assert len(core) == 3649  # the frozen v2 table, bit-for-bit
        for form, normal in core.items():
            assert table[form] == normal
        assert len(table) > len(core)

    def test_breadth_target(self):
        table = M.build_lemma_table()
        assert len(table) >= 30000
        cyr = sum(1 for f in table if M.is_cyrillic(f))
        assert cyr >= 10000 and len(table) - cyr >= 4000

    def test_protected_tokens_never_gain_mappings(self):
        """The full test-corpus vocabulary + frozen query terms keep
        their v2 analysis — committed goldens and oracle pairs built on
        that vocabulary are provably untouched by the expansion."""
        from search_engine_spark.textproc.morphology_ext import (
            PROTECTED_TOKENS,
        )

        core = M._core_table()
        table = M.build_lemma_table()
        for w in PROTECTED_TOKENS:
            assert (w in table) == (w in core)
            if w in core:
                assert table[w] == core[w]

    def test_expansion_goldens(self):
        """2,500 committed (form → lemma) pairs (1,250 per script),
        deterministically sampled by md5(form) — the regeneration drift
        pin the verdict asked to grow from 240 to ≥2,000."""
        import json
        import os

        path = os.path.join(
            os.path.dirname(__file__), "golden_lemma_pairs_v3.json"
        )
        with open(path, encoding="utf-8") as f:
            golden = json.load(f)
        assert len(golden) >= 2000
        for form, normal in golden:
            assert lemma(form) == normal, (form, normal)

    def test_spelling_derived_russian_classes(self):
        # gender/paradigm derivation spot pins
        assert M.ru_ext_class("станция") == "fja"
        assert M.ru_ext_class("здание") == "ne"
        assert M.ru_ext_class("газета") == "fa"
        assert M.ru_ext_class("зеркало") == "no"
        assert M.ru_ext_class("ночь") == "fs"  # hushing + ь = feminine
        assert M.ru_ext_class("скорость") == "fs"
        assert M.ru_ext_class("гвоздь") == "ms"
        assert M.ru_ext_class("рынок") == "mh:рынк"  # fleeting vowel
        assert M.ru_ext_class("урок") == "mh"  # exception list
        assert M.ru_ext_class("боец") == "mh:бойц"

    def test_reflexive_and_imperative_verb_forms(self):
        t = M.build_lemma_table()
        assert t["надеюсь"] == "надеяться"
        assert t["надеялась"] == "надеяться"
        assert t["анализируйте"] == "анализировать"


class TestContract:
    def test_size(self):
        assert len(M.build_lemma_table()) >= DICT_SIZE_MIN

    def test_deterministic(self):
        t = dict(M.build_lemma_table())
        M.build_lemma_table.cache_clear()
        assert M.build_lemma_table() == t

    def test_first_normal_form_identity(self):
        # a form that is itself a base lemma never remaps
        t = M.build_lemma_table()
        lex = M._base_lexicon()
        assert not (set(t) & set(lex))
        assert lemma("testing") == "testing"  # overlay-pinned choice
        assert lemma("tested") == "test"

    def test_overlay_wins(self):
        for k, v in LEMMA_MAP.items():
            assert FULL_LEMMA_MAP[k] == v

    def test_particles_are_stopwords(self):
        assert set(M._particle_lexicon()) == set(STOPWORDS)
        for w in ("и", "в", "of", "the"):
            assert not M.is_fitting(w)

    def test_fitting(self):
        assert M.is_fitting("таблицы")
        assert M.is_fitting("tables")
        assert not M.is_fitting("qqqzzz")  # unknown → not fitting (reference)
        # ...but the engine analyzer keeps unknowns with identity lemma
        assert lemma("qqqzzz") == "qqqzzz"

    def test_script_routing(self):
        # Cyrillic forms resolve in the Russian lexicon only
        norm, pos = M.analyze("тесты")
        assert norm == "тест" and pos == M.NOUN
        norm, pos = M.analyze("tables")
        assert norm == "table" and pos == M.NOUN

    def test_tokens_valid(self):
        import re

        from search_engine_spark.textproc.tokenize import WORD_PATTERN

        word_re = re.compile(WORD_PATTERN)
        for k, v in lemma_items():
            assert word_re.match(k), k
            assert word_re.match(v), v


class TestEmitters:
    def test_udfs_match_python(self):
        from search_engine_spark.functions.udfs import (
            fitting_mask,
            lemmatize_series,
        )

        words = [f for f, _ in GOLDEN_PAIRS] + ["и", "of", "qqqzzz", "data"]
        s = pd.Series(words)
        assert list(lemmatize_series(s)) == [lemma(w) for w in words]
        assert list(fitting_mask(s)) == [M.is_fitting(w) for w in words]

    def test_broadcast_join_matches_python(self, spark):
        from pyspark.sql import functions as F

        from search_engine_spark.functions.text_columns import explode_terms

        words = sorted({f for f, _ in GOLDEN_PAIRS[:50]})
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: r["term"]
            for r in explode_terms(df).collect()
        }
        assert got == {i: lemma(w) for i, w in enumerate(words)}

    def test_duckdb_join_matches_python(self):
        import duckdb

        from search_engine_spark.functions.oracle_fragments import terms_cte

        words = sorted({f for f, _ in GOLDEN_PAIRS})
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents AS SELECT * FROM (VALUES "
            + ",".join(f"({i}, '{w}')" for i, w in enumerate(words))
            + ") v(doc_id, text)"
        )
        got = dict(
            con.sql(
                f"WITH {terms_cte()} SELECT doc_id, term FROM terms"
            ).fetchall()
        )
        con.close()
        assert got == {i: lemma(w) for i, w in enumerate(words)}


def test_oracle_lemma_embedding():
    """The string-literal dictionary embedding (one string_split parse
    instead of 34k VALUES tuples — the v3-size parse-time fix) yields
    exactly lemma_items() when DuckDB evaluates it."""
    import duckdb

    from search_engine_spark.functions.oracle_fragments import (
        lemma_dict_values,
    )

    con = duckdb.connect()  # keep alive: the relation closes with it
    df = con.sql(lemma_dict_values()).df()
    got = list(map(tuple, df.itertuples(index=False)))
    assert got == [tuple(p) for p in lemma_items()]
    # delimiter safety: every token is letters (+ interior hyphen) only
    for w, n in lemma_items():
        assert " " not in w + n and "|" not in w + n and "'" not in w + n
