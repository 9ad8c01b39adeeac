"""Morphology analyzer — the engine's full T4/T5 surface.

The reference lemmatizes with Lucene-morphology (Russian + English
analyzers, reference pom.xml:60-84). The behavioral contract replicated
here, with citations:

* **ru-before-en routing** — a word is offered to the Russian analyzer
  first, English second (services/LemmasFinder.java:350-358). Our frozen
  equivalent: script routing — Cyrillic words consult the Russian lexicon,
  Latin words the English one (the Lucene analyzers accept exactly their
  own alphabet, so script routing is observationally identical).
* **stop-POS filter** — a word is "fitting" only if morphology recognizes
  it AND none of its tags is in PARTICLES = [МЕЖД, СОЮЗ, ПРЕДЛ, ЧАСТ,
  PREP, VBE] (services/LemmasFinder.java:19, isFittingWord :299-316).
* **first normal form** — ``normalForms.get(0)``, lowercased
  (services/LemmasFinder.java:327-342): when an inflected form is itself a
  dictionary lemma, the form wins (``testing`` → ``testing``, first of
  [testing, test]).

Instead of shipping a third-party morphology runtime, the engine GENERATES
its dictionary: a frozen base lexicon (lemma + POS + paradigm class) is
expanded through deterministic inflection paradigms — English noun
plurals / verb forms / comparatives with an irregular table, Russian
noun declensions / adjective agreement / verb conjugations. The result is
a versioned ``{inflected_form: first_normal_form}`` table (v3: 34k+
entries — the frozen v2 core plus the morphology_ext expansion layer,
v3 ⊇ v2 bit-exactly; see tests/test_morphology.py::TestExpansion) that
every emitter shares:

  * Python:  ``lemmas.lemma()`` (driver-side query analysis, snippets)
  * Arrow:   ``Series.map`` in the pandas tokenizers
             (operators/index_build.py, operators/fused_build.py) and the
             pandas-UDF wrappers in functions/udfs.py
  * Spark:   broadcast dictionary join in functions/text_columns.py
  * DuckDB:  VALUES-join CTE in functions/oracle_fragments.py

Unknown words: the reference DROPS words neither analyzer recognizes
(isFittingWord returns false). This engine's frozen analyzer instead keeps
them with identity lemma — a deliberate, documented divergence: a web-scale
corpus is mostly out-of-vocabulary (names, codes, other languages) and an
index that drops OOV terms cannot serve navigational queries. The faithful
reference behavior is still available via ``is_fitting`` /
``fitting_filter`` for callers that want it.

The PARTICLES-classed entries of this lexicon are, by construction, exactly
``stopwords.STOPWORDS`` (asserted in tests): the fast analyzer's frozen
stopword drop IS the POS filter.
"""

from __future__ import annotations

from functools import lru_cache

from . import morphology_ext as ext
from .stopwords import STOPWORDS_EN, STOPWORDS_RU

DICT_VERSION = 3

# Reference PARTICLES tag set verbatim (services/LemmasFinder.java:19).
PARTICLES = ("МЕЖД", "СОЮЗ", "ПРЕДЛ", "ЧАСТ", "PREP", "VBE")

# Coarse POS tags for content words (frozen; the filter only needs the
# particle/non-particle distinction, reference isFittingWord :299-316).
NOUN, VERB, ADJ = "СУЩ", "ГЛ", "ПРИЛ"  # ru-style tags, used for en too

_CYR = set("абвгдежзийклмнопрстуфхцчшщъыьэюяё")


def is_cyrillic(word: str) -> bool:
    return bool(word) and word[0] in _CYR


# ---------------------------------------------------------------------------
# English lexicon — base lemmas per POS. Inflections are GENERATED below.
# Includes the corpus/query vocabulary as lemmas so the first-normal-form
# identity rule protects them (a form that is itself a lemma never remaps).
# ---------------------------------------------------------------------------

EN_NOUNS = """
table row column key value part query join scan merge batch stream window
group filter sort line customer order hash index engine page site word test
system file user server cluster node shard partition segment block record
field schema database disk memory cache thread process task job stage plan
graph tree list map set array string number byte bit code token term
document corpus result search link host domain protocol request response
error status message log event metric counter build release version feature
branch commit snapshot checkpoint manifest bucket store shelf score rank
weight model layer vector matrix tensor sample label class method function
object type interface module package library tool script command option
flag argument parameter variable constant loop branch case statement
expression operator operand buffer queue stack heap pointer reference
address offset length size count total sum average limit range bound
boundary edge vertex path cycle road city town country state region area
zone place home house room door wall floor roof window garden street
market shop price cost profit loss trade deal contract company firm
business office worker manager team member leader player game match round
goal point rule law right duty power force energy light sound color shape
form image picture photo video film music song book paper letter note
card board sheet title name author reader writer editor speaker listener
teacher student lesson course school college degree exam question answer
problem solution idea thought mind brain heart hand arm leg foot head eye
ear face mouth nose hair body skin bone blood child parent mother father
brother sister family friend guest visitor owner driver rider runner
walker seller buyer maker baker farmer doctor nurse patient lawyer judge
witness artist singer dancer actor agent client vendor partner sponsor
investor analyst expert advisor consultant engineer scientist researcher
developer designer architect operator administrator moderator translator
interpreter assistant secretary director president minister officer
soldier captain pilot sailor guard police thief crime court prison camp
army navy weapon battle war peace treaty border nation people crowd
public society culture history story news report article journal magazine
website browser screen display keyboard mouse laptop computer phone tablet
camera sensor device machine robot motor wheel gear tool kit box bag
bottle glass cup plate bowl spoon fork knife pan pot oven stove fridge
testing scanning merging
""".split()

EN_VERBS_REGULAR = """
filter sort merge scan hash index search join group order test store load
save fetch parse push pull move copy name list mark check open close start
stop play work look want need use call try ask turn follow change help
talk walk wait watch seem stay point count add share offer remember
consider expect suggest deliver cover create produce provide include
continue happen remain appear serve die kill decide return explain
develop carry achieve involve accept reduce establish prepare improve
discuss maintain reflect manage encourage attend insert update delete
select project restrict partition replicate compress encode decode
tokenize normalize aggregate compute execute schedule allocate release
commit rollback validate verify measure sample shuffle broadcast collect
persist evict materialize serialize stream batch pipeline bucket salt
""".split()

# irregular verbs: lemma -> extra inflected forms (past, participle, etc.)
EN_VERBS_IRREGULAR: dict[str, tuple[str, ...]] = {
    "be": ("was", "were", "been"),
    "have": ("had",),
    "do": ("did", "done"),
    "go": ("went", "gone"),
    "make": ("made",),
    "take": ("took", "taken"),
    "get": ("got", "gotten"),
    "come": ("came",),
    "see": ("saw", "seen"),
    "know": ("knew", "known"),
    "think": ("thought",),
    "find": ("found",),
    "give": ("gave", "given"),
    "tell": ("told",),
    "become": ("became",),
    "show": ("showed", "shown"),
    "leave": ("left",),
    "feel": ("felt",),
    "put": (),
    "bring": ("brought",),
    "begin": ("began", "begun"),
    "keep": ("kept",),
    "hold": ("held",),
    "write": ("wrote", "written"),
    "stand": ("stood",),
    "hear": ("heard",),
    "let": (),
    "mean": ("meant",),
    "meet": ("met",),
    "run": ("ran",),
    "pay": ("paid",),
    "sit": ("sat",),
    "speak": ("spoke", "spoken"),
    "lead": ("led",),
    "read": (),
    "grow": ("grew", "grown"),
    "lose": ("lost",),
    "fall": ("fell", "fallen"),
    "send": ("sent",),
    "build": ("built",),
    "understand": ("understood",),
    "draw": ("drew", "drawn"),
    "break": ("broke", "broken"),
    "spend": ("spent",),
    "cut": (),
    "rise": ("rose", "risen"),
    "drive": ("drove", "driven"),
    "buy": ("bought",),
    "wear": ("wore", "worn"),
    "choose": ("chose", "chosen"),
    "catch": ("caught",),
    "teach": ("taught",),
    "sell": ("sold",),
    "fight": ("fought",),
    "throw": ("threw", "thrown"),
    "fly": ("flew", "flown"),
    "sleep": ("slept",),
    "win": ("won",),
    "forget": ("forgot", "forgotten"),
    "eat": ("ate", "eaten"),
    "drink": ("drank", "drunk"),
    "swim": ("swam", "swum"),
    "sing": ("sang", "sung"),
    "ring": ("rang", "rung"),
    "shake": ("shook", "shaken"),
    "steal": ("stole", "stolen"),
    "hide": ("hid", "hidden"),
    "bite": ("bit", "bitten"),
    "blow": ("blew", "blown"),
    "freeze": ("froze", "frozen"),
    "ride": ("rode", "ridden"),
    "seek": ("sought",),
}

EN_ADJECTIVES = """
fast slow big small tall short long high low wide narrow deep shallow
old young new cold warm hot cool dark light hard soft strong weak rich
poor clean dirty dry wet full empty heavy near far close great nice fine
kind safe brave calm clear cheap quick thick thin smart plain proud
sharp smooth steep sweet tight tough wild wise
""".split()

# irregular noun plurals: form -> lemma
EN_IRREGULAR_PLURALS = {
    "indices": "index",
    "matrices": "matrix",
    "vertices": "vertex",
    "children": "child",
    "people": "person",
    "men": "man",
    "women": "woman",
    "feet": "foot",
    "teeth": "tooth",
    "mice": "mouse",
    "leaves": "leaf",
    "knives": "knife",
    "shelves": "shelf",
    "wives": "wife",
    "lives": "life",
    "schemata": "schema",
}

_VOWELS = set("aeiou")


def en_plural(noun: str) -> str:
    if noun.endswith(("s", "x", "z", "ch", "sh")):
        return noun + "es"
    if noun.endswith("y") and len(noun) > 1 and noun[-2] not in _VOWELS:
        return noun[:-1] + "ies"
    return noun + "s"


# final-syllable-stressed polysyllables that double (beginning, committed)
EN_DOUBLING = frozenset(
    "begin commit forget submit admit permit refer occur prefer transmit".split()
)


def _en_double_final(stem: str) -> bool:
    """CVC doubling rule (stop→stopped). Frozen approximation: monosyllabic
    CVC stems double; longer stems only when listed in EN_DOUBLING (final
    stress) — unstressed -er/-on/-it stems (order, offer, visit) do not."""
    if len(stem) < 3:
        return False
    a, b, c = stem[-3], stem[-2], stem[-1]
    cvc = (
        c not in _VOWELS
        and c not in "wxy"
        and b in _VOWELS
        and a not in _VOWELS
    )
    return cvc and (len(stem) <= 4 or stem in EN_DOUBLING)


def en_verb_forms(verb: str) -> list[str]:
    """-s / -ed / -ing forms of a regular verb."""
    forms = [en_plural(verb)]  # 3sg = same spelling rules as plural
    if verb.endswith("e") and not verb.endswith("ee"):
        forms += [verb + "d", verb[:-1] + "ing"]
    elif verb.endswith("y") and len(verb) > 1 and verb[-2] not in _VOWELS:
        forms += [verb[:-1] + "ied", verb + "ing"]
    elif _en_double_final(verb):
        forms += [verb + verb[-1] + "ed", verb + verb[-1] + "ing"]
    else:
        forms += [verb + "ed", verb + "ing"]
    return forms


def en_adj_forms(adj: str) -> list[str]:
    if adj.endswith("e"):
        return [adj + "r", adj + "st"]
    if adj.endswith("y") and len(adj) > 1 and adj[-2] not in _VOWELS:
        return [adj[:-1] + "ier", adj[:-1] + "iest"]
    if _en_double_final(adj):
        return [adj + adj[-1] + "er", adj + adj[-1] + "est"]
    return [adj + "er", adj + "est"]


# ---------------------------------------------------------------------------
# Russian lexicon — lemma + paradigm class; declensions GENERATED below.
# Classes: mh = masculine hard (стол), ms = masculine soft -ь (словарь),
# fa = feminine -а (таблица), fja = feminine -я (неделя),
# fs = feminine soft -ь (часть), no = neuter -о (слово),
# ne = neuter -е (поле).
# ---------------------------------------------------------------------------

RU_NOUNS: dict[str, str] = {
    # data/engineering vocabulary
    "тест": "mh", "запрос": "mh", "индекс": "mh", "поиск": "mh",
    "результат": "mh", "документ": "mh", "сайт": "mh", "файл": "mh",
    "сервер": "mh", "кластер": "mh", "процесс": "mh", "поток": "mh",
    "блок": "mh", "код": "mh", "текст": "mh", "символ": "mh",
    "номер": "mh", "список": "mh", "массив": "mh", "объект": "mh",
    "класс": "mh", "метод": "mh", "модуль": "mh", "пакет": "mh",
    "формат": "mh", "размер": "mh", "объём": "mh", "счёт": "mh",
    "этап": "mh", "план": "mh", "граф": "mh", "узел": "mh:узл",
    "диск": "mh", "журнал": "mh", "отчёт": "mh", "вопрос": "mh",
    "ответ": "mh", "пример": "mh", "случай": "ms", "словарь": "ms",
    "модель": "fs", "стол": "mh", "дом": "mh", "город": "mh",
    "год": "mh", "день": "ms:дн", "мир": "mh", "человек": "mh",
    "друг": "mh", "брат": "mh", "сад": "mh", "лес": "mh",
    "хлеб": "mh", "чай": "ms", "урок": "mh", "язык": "mh",
    "берег": "mh", "ветер": "mh:ветр", "вечер": "mh", "вагон": "mh",
    "автор": "mh", "доктор": "mh", "директор": "mh", "мастер": "mh",
    "инженер": "mh", "студент": "mh", "солдат": "mh", "народ": "mh",
    "завод": "mh", "магазин": "mh", "музей": "ms", "театр": "mh",
    "фильм": "mh", "камень": "ms:камн", "корень": "ms:корн", "огонь": "ms:огн",
    "путь": "ms", "рубль": "ms", "циркуль": "ms",
    "таблица": "fa", "страница": "fa", "строка": "fa", "колонка": "fa",
    "система": "fa", "программа": "fa", "схема": "fa", "форма": "fa",
    "функция": "fja", "операция": "fja", "секция": "fja", "версия": "fja",
    "сессия": "fja", "линия": "fja", "серия": "fja", "теория": "fja",
    "история": "fja", "категория": "fja", "неделя": "fja", "земля": "fja",
    "книга": "fa", "рука": "fa", "нога": "fa", "голова": "fa",
    "вода": "fa", "гора": "fa", "дорога": "fa", "школа": "fa",
    "работа": "fa", "группа": "fa", "карта": "fa", "буква": "fa",
    "цифра": "fa", "машина": "fa", "картина": "fa", "комната": "fa",
    "минута": "fa", "секунда": "fa", "задача": "fa", "дача": "fa",
    "встреча": "fa", "ошибка": "fa", "ссылка": "fa", "сборка": "fa",
    "выборка": "fa", "проверка": "fa", "загрузка": "fa", "обработка": "fa",
    "часть": "fs", "связь": "fs", "запись": "fs", "область": "fs",
    "возможность": "fs", "скорость": "fs", "память": "fs", "сеть": "fs",
    "цель": "fs", "роль": "fs", "дверь": "fs", "ночь": "fs",
    "вещь": "fs", "жизнь": "fs", "любовь": "fs", "новость": "fs",
    "слово": "no", "число": "no", "место": "no", "дело": "no",
    "окно": "no", "письмо": "no", "лицо": "no", "право": "no",
    "средство": "no", "государство": "no", "общество": "no",
    "качество": "no", "количество": "no", "пространство": "no",
    "поле": "ne", "море": "ne", "предложение": "ne",
    "решение": "ne", "значение": "ne", "выражение": "ne",
    "движение": "ne", "отношение": "ne", "управление": "ne",
    "состояние": "ne", "сравнение": "ne", "обновление": "ne",
    "удаление": "ne", "добавление": "ne", "хранение": "ne",
}

RU_ADJECTIVES = """
быстрый медленный большой маленький новый старый хороший плохой длинный
короткий высокий низкий широкий узкий глубокий мелкий тёплый холодный
светлый тёмный сильный слабый богатый бедный чистый грязный сухой мокрый
полный пустой тяжёлый лёгкий близкий далёкий дорогой дешёвый толстый
тонкий умный глупый красивый главный важный простой сложный точный
общий личный целый разный равный верный прямой левый правый средний
первый последний каждый любой другой белый чёрный красный зелёный синий
""".split()

# verbs: infinitive -> (present stem, conjugation 1|2[, 1sg override]).
# Past forms derive from the infinitive stem.
RU_VERBS: dict[str, tuple] = {
    "искать": ("ищ", 1), "писать": ("пиш", 1), "читать": ("чита", 1),
    "делать": ("дела", 1), "работать": ("работа", 1), "знать": ("зна", 1),
    "думать": ("дума", 1), "считать": ("счита", 1), "играть": ("игра", 1),
    "понимать": ("понима", 1), "начинать": ("начина", 1),
    "отвечать": ("отвеча", 1), "получать": ("получа", 1),
    "добавлять": ("добавля", 1), "удалять": ("удаля", 1),
    "обновлять": ("обновля", 1), "проверять": ("проверя", 1),
    "выполнять": ("выполня", 1), "загружать": ("загружа", 1),
    "сохранять": ("сохраня", 1), "создавать": ("созда", 1),
    "использовать": ("использу", 1), "тестировать": ("тестиру", 1),
    "индексировать": ("индексиру", 1), "сортировать": ("сортиру", 1),
    "фильтровать": ("фильтру", 1), "группировать": ("группиру", 1),
    "копировать": ("копиру", 1),
    "говорить": ("говор", 2), "смотреть": ("смотр", 2),
    "видеть": ("вид", 2, "вижу"), "ходить": ("ход", 2, "хожу"),
    "любить": ("люб", 2, "люблю"),
    "учить": ("уч", 2), "строить": ("стро", 2), "хранить": ("хран", 2),
    "помнить": ("помн", 2), "верить": ("вер", 2), "значить": ("знач", 2),
    "служить": ("служ", 2), "решить": ("реш", 2), "спешить": ("спеш", 2),
}

_RU_HUSH = set("кгхжшщч")


def _ru_i_or_y(stem: str) -> str:
    """Spelling rule: и after к/г/х/ж/ш/щ/ч, else ы."""
    return "и" if stem and stem[-1] in _RU_HUSH else "ы"


def ru_noun_forms(lemma: str, cls: str) -> list[str]:
    """``cls`` may carry an oblique-stem override after ':' for
    fleeting-vowel nouns (день = ms:дн → дня дню ... дней)."""
    cls, _, stem_override = cls.partition(":")
    f: list[str] = []
    if cls == "mh":  # стол: стола столу столом столе столы столов ...
        s = stem_override or lemma
        iy = _ru_i_or_y(s)
        f = [s + "а", s + "у", s + "ом", s + "е", s + iy,
             s + "ов", s + "ам", s + "ами", s + "ах"]
    elif cls == "ms":  # словарь/случай: soft masc
        if lemma.endswith("ь"):
            s = stem_override or lemma[:-1]
            f = [s + "я", s + "ю", s + "ём", s + "е", s + "и",
                 s + "ей", s + "ям", s + "ями", s + "ях"]
        else:  # -й (музей, случай, чай)
            s = stem_override or lemma[:-1]
            f = [s + "я", s + "ю", s + "ем", s + "е", s + "и",
                 s + "ев", s + "ям", s + "ями", s + "ях"]
    elif cls == "fa":  # таблица: таблицы таблице таблицу ...
        s = lemma[:-1]
        iy = _ru_i_or_y(s)
        # spelling rule: unstressed instrumental -ей after ц/sibilants
        inst = s + ("ей" if s and s[-1] in "цжшщч" else "ой")
        f = [s + iy, s + "е", s + "у", inst, s,
             s + "ам", s + "ами", s + "ах"]
    elif cls == "fja":  # функция/неделя
        s = lemma[:-1]
        if lemma.endswith("ия"):
            f = [s + "и", lemma[:-2] + "ии", s + "ю", s + "ей",
                 lemma[:-2] + "ий", s + "ям", s + "ями", s + "ях"]
        else:
            f = [s + "и", s + "е", s + "ю", s + "ей",
                 s + "ь", s + "ям", s + "ями", s + "ях"]
    elif cls == "fs":  # часть: части частью частей частям ...
        s = lemma[:-1]
        # spelling rule: а-endings after sibilants (вещь → вещам/вещах)
        ja, jami, jah = (
            ("ам", "ами", "ах") if s and s[-1] in _RU_HUSH
            else ("ям", "ями", "ях")
        )
        f = [s + "и", s + "ью", s + "ей", s + ja, s + jami, s + jah]
    elif cls == "no":  # слово: слова слову словом слове слов словам ...
        s = lemma[:-1]
        f = [s + "а", s + "у", s + "ом", s + "е", s,
             s + "ам", s + "ами", s + "ах"]
    elif cls == "ne":  # поле/решение
        s = lemma[:-1]
        if lemma.endswith("ие"):
            f = [s + "я", s + "ю", s + "ем", lemma[:-2] + "ии",
                 lemma[:-2] + "ий", s + "ям", s + "ями", s + "ях"]
        else:
            f = [s + "я", s + "ю", s + "ем", s + "е",
                 s + "ей", s + "ям", s + "ями", s + "ях"]
    return f


_RU_VELAR = set("кгх")
_RU_SIB = set("жшщч")


def ru_adj_forms(lemma: str) -> list[str]:
    """Agreement forms of -ый/-ий/-ой adjectives. Three frozen paradigms:
    velar-stem -ий (высокий: hard endings, и-spelling), sibilant-stem -ий
    (хороший: -его style), plain soft -ий (синий); -ый/-ой decline hard."""
    s = lemma[:-2]
    last = s[-1] if s else ""
    if lemma.endswith("ий") and last in _RU_VELAR:  # высокий
        return [s + "ого", s + "ому", s + "им", s + "ом", s + "ая",
                s + "ой", s + "ую", s + "ое", s + "ие", s + "их",
                s + "ими"]
    if lemma.endswith("ий") and last in _RU_SIB:  # хороший
        return [s + "его", s + "ему", s + "им", s + "ем", s + "ая",
                s + "ей", s + "ую", s + "ее", s + "ие", s + "их",
                s + "ими"]
    if lemma.endswith("ий"):  # синий, средний — soft
        return [s + "его", s + "ему", s + "им", s + "ем", s + "яя",
                s + "ей", s + "юю", s + "ее", s + "ие", s + "их",
                s + "ими"]
    iy = "и" if last in (_RU_VELAR | _RU_SIB) else "ы"
    return [s + "ого", s + "ому", s + iy + "м", s + "ом", s + "ая",
            s + "ой", s + "ую", s + "ое", s + iy + "е", s + iy + "х",
            s + iy + "ми"]


def ru_verb_forms(
    inf: str, stem: str, conj: int, first_sg: str | None = None
) -> list[str]:
    """Present/future + past forms. ``first_sg`` overrides the 1sg for
    verbs with consonant mutation / л-epenthesis (видеть→вижу)."""
    hush = stem and stem[-1] in _RU_HUSH
    if conj == 1:
        endings = ["у" if hush else "ю", "ешь", "ет", "ем", "ете",
                   "ут" if hush else "ют"]
    else:
        endings = ["у" if hush else "ю", "ишь", "ит", "им", "ите",
                   "ат" if hush else "ят"]
    present = [stem + e for e in endings]
    if first_sg:
        present[0] = first_sg
    past_stem = inf[:-2]  # искать → иска
    past = [past_stem + "л", past_stem + "ла", past_stem + "ло",
            past_stem + "ли"]
    return present + past


# ---------------------------------------------------------------------------
# Table generation
# ---------------------------------------------------------------------------

def _core_lexicon() -> dict[str, str]:
    """lemma -> POS tag for every CORE (v2) content lemma. The core
    lexicon and its generated table are frozen — the round-3 expansion
    layers on top without touching a single v2 mapping."""
    lex: dict[str, str] = {}
    for n in EN_NOUNS:
        lex[n] = NOUN
    for n in EN_IRREGULAR_PLURALS.values():
        lex.setdefault(n, NOUN)
    for v in EN_VERBS_REGULAR:
        lex.setdefault(v, VERB)
    for v in EN_VERBS_IRREGULAR:
        lex.setdefault(v, VERB)
    for a in EN_ADJECTIVES:
        lex.setdefault(a, ADJ)
    for n in RU_NOUNS:
        lex[n] = NOUN
    for a in RU_ADJECTIVES:
        lex.setdefault(a, ADJ)
    for v in RU_VERBS:
        lex.setdefault(v, VERB)
    return lex


# ---------------------------------------------------------------------------
# Expansion layer (morphology_ext): spelling-derived Russian classes and
# productive-conjugation verb specs, then candidate generation that can only
# ADD forms (core wins every collision; PROTECTED_TOKENS never gain one).
# ---------------------------------------------------------------------------

_RU_VOWELS = set("аеёиоуыэюя")


def ru_ext_class(word: str) -> str:
    """Spelling-derived paradigm class for an expansion noun (the core
    classes of ru_noun_forms). The -ь gender call uses the feminine
    suffix families (-ость/-есть/-знь), orthography (hushing+ь is
    feminine), and the explicit EXT_RU_SOFT_FEM list; -ок/-ец masculines
    get the fleeting-vowel oblique stem unless excepted."""
    w = word
    if w.endswith("ия"):
        return "fja"
    if w.endswith(("ие", "ье")):
        return "ne"
    if w.endswith("я"):
        return "fja"
    if w.endswith("а"):
        return "fa"
    if w.endswith("о"):
        return "no"
    if w.endswith("е"):
        return "ne"
    if w.endswith("й"):
        return "ms"
    if w.endswith("ь"):
        if (
            w in ext.EXT_RU_SOFT_FEM
            or w.endswith(("ость", "есть", "знь"))
            or (len(w) >= 2 and w[-2] in "жшщч")
        ):
            return "fs"
        return "ms"
    if (
        w.endswith("ок")
        and len(w) > 3
        and w not in ext.EXT_RU_NO_FLEETING
        and w[-3] not in _RU_VOWELS
    ):
        return f"mh:{w[:-2]}к"
    if w.endswith("ец") and len(w) > 3 and w not in ext.EXT_RU_NO_FLEETING:
        if w[-3] in _RU_VOWELS:  # боец → бойц-
            return f"mh:{w[:-2]}йц"
        return f"mh:{w[:-2]}ц"
    return "mh"


def ru_ext_verb_spec(inf: str) -> tuple[str, int] | None:
    """(present stem, conjugation) for the productive classes the
    expansion restricts itself to; None = skip (don't guess)."""
    if inf.endswith(("овать", "евать")) and len(inf) > 6:
        return inf[:-5] + ("у" if inf.endswith("овать") else "ю"), 1
    if inf.endswith("еять") and len(inf) > 4:  # надеять(ся) → наде-ю
        return inf[:-3], 1
    if inf.endswith(("ать", "ять")) and len(inf) > 4:
        return inf[:-2], 1
    if inf.endswith(("ить", "еть")) and len(inf) > 4:
        return inf[:-3], 2
    return None


def _ru_ext_verb_forms(inf: str) -> list[str]:
    """Expansion verb forms: the core present+past set plus imperatives;
    reflexive -ся verbs conjugate the base and re-attach -ся/-сь by the
    standard vowel rule (надеюсь / надеешься / надеялась)."""
    refl = inf.endswith("ся")
    base = inf[:-2] if refl else inf
    spec = ru_ext_verb_spec(base)
    if spec is None:
        return []
    stem, conj = spec
    forms = ru_verb_forms(base, stem, conj)
    if stem and stem[-1] in _RU_VOWELS:
        forms += [stem + "й", stem + "йте"]
    else:
        forms += [stem + "и", stem + "ите"]
    if refl:
        forms = [
            f + ("сь" if f[-1] in _RU_VOWELS else "ся") for f in forms
        ]
    return forms


def _ext_lexicon(core_lex: dict[str, str], core_table: dict[str, str]) -> dict[str, str]:
    """Expansion lemma -> POS. A candidate lemma colliding with a core
    lemma OR a core inflected form is dropped (core behavior wins; the
    first-normal-form identity rule stays exact over the merged set)."""
    lex: dict[str, str] = {}

    def add(word: str, pos: str) -> None:
        if word and word not in core_lex and word not in core_table:
            lex.setdefault(word, pos)

    for n in ext.EXT_EN_NOUNS:
        add(n, NOUN)
    for n in ext.EXT_EN_IRREGULAR_PLURALS.values():
        add(n, NOUN)
    for v in ext.EXT_EN_VERBS:
        add(v, VERB)
    for a in ext.EXT_EN_ADJ_GRADABLE:
        add(a, ADJ)
    for a in ext.EXT_EN_ADJ_PLAIN:
        add(a, ADJ)
    for n in ext.EXT_RU_NOUNS:
        add(n, NOUN)
    for a in ext.EXT_RU_ADJECTIVES:
        add(a, ADJ)
    for v in ext.EXT_RU_VERBS:
        add(v, VERB)
    return lex


@lru_cache(maxsize=1)
def _base_lexicon() -> dict[str, str]:
    """lemma -> POS over the MERGED (core + expansion) lexicon — the
    recognition set analyze()/is_fitting consult."""
    lex = dict(_core_lexicon())
    for w, pos in _ext_lexicon(lex, _core_table()).items():
        lex.setdefault(w, pos)
    return lex


@lru_cache(maxsize=1)
def _core_table() -> dict[str, str]:
    """The v2 generated table, byte-identical to the round-2 output —
    built from the core lexicon ONLY, before the expansion layer."""
    lemmas = _core_lexicon()
    candidates: dict[str, list[str]] = {}

    def add(form: str, lemma: str) -> None:
        if form and form != lemma:
            candidates.setdefault(form, []).append(lemma)

    for n in EN_NOUNS:
        add(en_plural(n), n)
    for form, lemma in EN_IRREGULAR_PLURALS.items():
        add(form, lemma)
    for v in EN_VERBS_REGULAR:
        for form in en_verb_forms(v):
            add(form, v)
    for v, extra in EN_VERBS_IRREGULAR.items():
        regular = en_verb_forms(v)
        add(regular[0], v)  # 3sg (spelling rules shared with plurals)
        add(regular[2], v)  # -ing (doubling/e-drop rules shared)
        for form in extra:
            add(form, v)
    for a in EN_ADJECTIVES:
        for form in en_adj_forms(a):
            add(form, a)
    for n, cls in RU_NOUNS.items():
        for form in ru_noun_forms(n, cls):
            add(form, n)
    for a in RU_ADJECTIVES:
        for form in ru_adj_forms(a):
            add(form, a)
    for inf, spec in RU_VERBS.items():
        for form in ru_verb_forms(inf, *spec):
            add(form, inf)

    table: dict[str, str] = {}
    for form in sorted(candidates):
        if form in lemmas:  # the form IS a lemma → identity wins
            continue
        # homograph collision (axes←axe/axis): deterministic winner =
        # alphabetically first lemma (frozen rule; mirrors "first normal
        # form" being a fixed pick among analyses)
        table[form] = sorted(set(candidates[form]))[0]
    return table


@lru_cache(maxsize=1)
def build_lemma_table() -> dict[str, str]:
    """The generated ``{inflected_form: first_normal_form}`` table:
    the frozen v2 core (_core_table, unchanged bit-for-bit) plus the
    round-3 expansion layer (morphology_ext).

    Deterministic: iteration order is frozen (lexicon listing order,
    then alphabetical winner on collisions); identity entries and forms
    that are themselves lemmas are EXCLUDED (first-normal-form rule —
    the form is its own first normal form, reference
    LemmasFinder.java:327-342). Expansion candidates are added ONLY for
    forms the core decided nothing about, are never lemmas of either
    layer, and never touch PROTECTED_TOKENS — so v3 ⊇ v2 exactly
    (pinned by tests/test_morphology.py::TestExpansion)."""
    core_lex = _core_lexicon()
    table = dict(_core_table())
    ext_lex = _ext_lexicon(core_lex, table)

    candidates: dict[str, list[str]] = {}

    def add(form: str, lemma: str) -> None:
        if (
            form
            and form != lemma
            and form not in table
            and form not in core_lex
            and form not in ext_lex
            and form not in ext.PROTECTED_TOKENS
        ):
            candidates.setdefault(form, []).append(lemma)

    for n in ext.EXT_EN_NOUNS:
        if n in ext_lex:
            add(en_plural(n), n)
    for form, lemma in ext.EXT_EN_IRREGULAR_PLURALS.items():
        if lemma in ext_lex or lemma in core_lex:
            add(form, lemma)
    for v in ext.EXT_EN_VERBS:
        if v in ext_lex or (v in core_lex and core_lex[v] != VERB):
            # a core NOUN reused as an expansion verb still inflects
            # (answer → answered); core VERBS are already covered
            for form in en_verb_forms(v):
                add(form, v)
    for a in ext.EXT_EN_ADJ_GRADABLE:
        if a in ext_lex:
            for form in en_adj_forms(a):
                add(form, a)
    for n in ext.EXT_RU_NOUNS:
        if n in ext_lex:
            for form in ru_noun_forms(n, ru_ext_class(n)):
                add(form, n)
    for a in ext.EXT_RU_ADJECTIVES:
        if a in ext_lex:
            for form in ru_adj_forms(a):
                add(form, a)
    for v in ext.EXT_RU_VERBS:
        if v in ext_lex:
            for form in _ru_ext_verb_forms(v):
                add(form, v)

    for form in sorted(candidates):
        table[form] = sorted(set(candidates[form]))[0]
    return table


# ---------------------------------------------------------------------------
# POS analysis / fitting filter (reference isFittingWord semantics)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=1)
def _particle_lexicon() -> dict[str, str]:
    """Particle-classed words — exactly the frozen stopword lists, tagged
    with reference PARTICLES classes (coarse: the filter needs membership,
    not the fine class)."""
    out = {w: "PREP" for w in STOPWORDS_EN}
    out.update({w: "ЧАСТ" for w in STOPWORDS_RU})
    return out


@lru_cache(maxsize=1)
def _form_index() -> dict[str, tuple[str, str]]:
    """form -> (first_normal_form, pos) over lemmas + generated forms."""
    lemmas = _base_lexicon()
    idx = {lemma: (lemma, pos) for lemma, pos in lemmas.items()}
    table = build_lemma_table()
    for form, lemma in table.items():
        idx[form] = (lemma, lemmas[lemma])
    # the frozen contract vocabulary analyzes as invariant nouns: real
    # words the reference's full Lucene dictionaries recognize (their
    # identity lemma is contractual — morphology_ext.PROTECTED_TOKENS)
    for w in sorted(ext.PROTECTED_TOKENS):
        idx.setdefault(w, (w, NOUN))
    return idx


def lexicon_lemmas() -> set[str]:
    """Every base-lexicon lemma (ru + en, both layers) — words that ARE
    their own first normal form. The rule tier must never touch these,
    so lemmas.py materializes them as identity dictionary rows."""
    return set(_base_lexicon())


def analyze(word: str) -> tuple[str, str] | None:
    """(first_normal_form, pos_tag) or None when unrecognized.

    Routing mirrors the reference (LemmasFinder.java:350-358): Cyrillic
    words consult the Russian side first; since the two lexicons are
    script-disjoint, script routing is exact."""
    particles = _particle_lexicon()
    if word in particles:
        return (word, particles[word])
    return _form_index().get(word)


def is_fitting(word: str) -> bool:
    """Reference isFittingWord (LemmasFinder.java:299-316): recognized by
    morphology AND carries no PARTICLES-class tag."""
    got = analyze(word)
    return got is not None and got[1] not in PARTICLES
