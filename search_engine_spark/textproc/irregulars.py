"""Closed-class irregular/suppletive inflections — a dictionary overlay.

The reference's Lucene-morphology analyzers ship FULL ru/en dictionaries
(reference pom.xml:60-84; first-normal-form lookup in
services/LemmasFinder.java:327-342), so suppletive and stem-changing
inflections — en "went -> go"-class, ru "люди -> человек"-class —
conflate there. Our generated paradigm dictionary (textproc/morphology.py)
expands REGULAR inflections and already covers most English irregulars
through its verb tables, and the rule tier (textproc/ruletier.py) closes
regular out-of-vocabulary forms; what neither can reach is exactly this
closed class: forms whose lemma shares no stem with the surface word.
Natural language adds no new suppletive verbs, so a hand-frozen table is
the complete fix, the same way every production analyzer handles it
(cf. Lucene's StemmerOverrideFilter / irregular sections of the AOT and
WordNet-derived dictionaries — public knowledge, re-curated here, not
copied data).

The table rides the DICTIONARY path: lemmas.py merges it under the
hand-frozen LEMMA_MAP overlay, so all four dictionary emitters (pure
Python, Arrow Series map, broadcast-join DataFrame, DuckDB VALUES join)
pick it up with zero new code and stay bit-equal by construction. Keys
in PROTECTED_TOKENS are dropped at merge (their identity analysis is
load-bearing for committed goldens — the same carve-out the rule tier
makes), and every VALUE joins the identity layer so a mapped lemma is
itself a dictionary hit.

Curation rules (why a form is absent is as important as why present):
  * the FORM must be unambiguous — surface words that are also common
    lemmas of another word stay out (en "saw"/"left"/"found"/"rose"/
    "meant"/"felt"; ru "дали" (даль), "ели" (ель), "дам" (дама)), since
    the reference's first-normal-form pick for those is dictionary-order
    dependent and pinning a guess would diverge;
  * stopword-class forms stay out (en be/do/have auxiliaries are in the
    frozen stop list and never index);
  * forms the generated dictionary already covers stay out (went, men,
    children, spoke, frozen, bought ... — asserted by test).
"""

from __future__ import annotations

# en irregular past / past-participle forms -> base verb, limited to
# forms the generated dictionary misses and whose reading is unambiguous
_EN_VERBS: dict[str, str] = {
    "said": "say",
    "laid": "lay",
    "lain": "lie",
    "slain": "slay",
    "woke": "wake",
    "woken": "wake",
    "awoke": "awake",
    "awoken": "awake",
    "tore": "tear",
    "torn": "tear",
    "swore": "swear",
    "sworn": "swear",
    "swept": "sweep",
    "crept": "creep",
    "wept": "weep",
    "knelt": "kneel",
    "leapt": "leap",
    "dealt": "deal",
    "lent": "lend",
    "bent": "bend",
    "borne": "bear",
    "beaten": "beat",
    "arose": "arise",
    "arisen": "arise",
    "clung": "cling",
    "flung": "fling",
    "stung": "sting",
    "strung": "string",
    "swung": "swing",
    "wrung": "wring",
    "sprang": "spring",
    "sprung": "spring",
    "sank": "sink",
    "shrank": "shrink",
    "shrunk": "shrink",
    "spun": "spin",
    "dug": "dig",
    "hung": "hang",
    "fled": "flee",
    "slid": "slide",
    "sped": "speed",
    "strode": "stride",
    "strove": "strive",
    "struck": "strike",
    "trod": "tread",
    "forbade": "forbid",
    "forgave": "forgive",
    "forgiven": "forgive",
    "mistook": "mistake",
    "mistaken": "mistake",
    "overcame": "overcome",
    "overtook": "overtake",
    "undertook": "undertake",
    "withdrew": "withdraw",
    "withdrawn": "withdraw",
}

# en suppletive comparatives/plural (the adjective ladder is irregular
# suppletion, listed in the reference's WordNet-derived English
# dictionary the same way)
_EN_NOMINAL: dict[str, str] = {
    "better": "good",
    "best": "good",
    "worse": "bad",
    "worst": "bad",
    "selves": "self",
}

# ru suppletive plurals (distinct lexeme stems)
_RU_NOUNS: dict[str, str] = {
    "люди": "человек",
    "людей": "человек",
    "людям": "человек",
    "людьми": "человек",
    "людях": "человек",
    "дети": "ребёнок",
    "детей": "ребёнок",
    "детям": "ребёнок",
    "детьми": "ребёнок",
    "детях": "ребёнок",
}

# ru irregular / stem-changing verb forms. The быть and идти families
# are fully suppletive; the rest are stem alternations (хоч-/хот-,
# мож-/мог-, скаж-, шё-/ше-) the paradigm expander cannot derive.
_RU_VERBS: dict[str, str] = {
    # быть: past + future stems share nothing with the infinitive
    "был": "быть",
    "была": "быть",
    "было": "быть",
    "были": "быть",
    "буду": "быть",
    "будешь": "быть",
    "будет": "быть",
    "будем": "быть",
    "будете": "быть",
    "будут": "быть",
    # идти and its prefixed perfectives: present ид-, past шё-/ш-
    "иду": "идти",
    "идёшь": "идти",
    "идёт": "идти",
    "идём": "идти",
    "идёте": "идти",
    "идут": "идти",
    "шёл": "идти",
    "шла": "идти",
    "шло": "идти",
    "шли": "идти",
    "пошёл": "пойти",
    "пошла": "пойти",
    "пошло": "пойти",
    "пошли": "пойти",
    "нашёл": "найти",
    "нашла": "найти",
    "нашло": "найти",
    "нашли": "найти",
    "пришёл": "прийти",
    "пришла": "прийти",
    "пришло": "прийти",
    "пришли": "прийти",
    "ушёл": "уйти",
    "ушла": "уйти",
    "ушло": "уйти",
    "ушли": "уйти",
    "вошёл": "войти",
    "вошла": "войти",
    "вошли": "войти",
    "вышел": "выйти",
    "вышла": "выйти",
    "вышло": "выйти",
    "вышли": "выйти",
    "перешёл": "перейти",
    "перешла": "перейти",
    "перешли": "перейти",
    "подошёл": "подойти",
    "подошла": "подойти",
    "подошли": "подойти",
    # хотеть: хоч-/хот- alternation with mixed conjugation
    "хочу": "хотеть",
    "хочешь": "хотеть",
    "хочет": "хотеть",
    "хотим": "хотеть",
    "хотите": "хотеть",
    "хотят": "хотеть",
    "хотел": "хотеть",
    "хотела": "хотеть",
    "хотело": "хотеть",
    "хотели": "хотеть",
    # мочь: мож-/мог- alternation
    "могу": "мочь",
    "можешь": "мочь",
    "может": "мочь",
    "можем": "мочь",
    "можете": "мочь",
    "могут": "мочь",
    "мог": "мочь",
    "могла": "мочь",
    "могло": "мочь",
    "могли": "мочь",
    # дать: irregular athematic future (дали/дам excluded — they also
    # read as даль gen.pl / дама gen.pl)
    "дал": "дать",
    "дала": "дать",
    "дало": "дать",
    "дашь": "дать",
    "даст": "дать",
    "дадим": "дать",
    "дадите": "дать",
    "дадут": "дать",
    # взять: возьм- future stem
    "взял": "взять",
    "взяла": "взять",
    "взяло": "взять",
    "взяли": "взять",
    "возьму": "взять",
    "возьмёшь": "взять",
    "возьмёт": "взять",
    "возьмём": "взять",
    "возьмёте": "взять",
    "возьмут": "взять",
    # сказать: скаж- future stem
    "скажу": "сказать",
    "скажешь": "сказать",
    "скажет": "сказать",
    "скажем": "сказать",
    "скажете": "сказать",
    "скажут": "сказать",
    # есть (to eat): athematic present (ел/ела fine; ели excluded — ель)
    "ем": "есть",
    "ешь": "есть",
    "ест": "есть",
    "едим": "есть",
    "едите": "есть",
    "едят": "есть",
    "ел": "есть",
    "ела": "есть",
    "ело": "есть",
    # consonant-stem pasts the expander cannot reach
    "нёс": "нести",
    "несла": "нести",
    "несло": "нести",
    "несли": "нести",
    # вести (to lead) omitted: the infinitive itself reads as весть
    # nom.pl and the generated dictionary already claims it
    "вёз": "везти",
    "везла": "везти",
    "везли": "везти",
    # расти: рос excluded (роса gen.pl, already in the generated dict)
    "росла": "расти",
    "росло": "расти",
    "росли": "расти",
    # сесть: omitted entirely — сел/села/сели all collide with the
    # noun readings (село forms, сель pl.) the generated dict holds
    "лёг": "лечь",
    "легла": "лечь",
    "легло": "лечь",
    "легли": "лечь",
    "умер": "умереть",
    "умерла": "умереть",
    "умерли": "умереть",
    # начать: only the unambiguous plural (начал/начала/начало also
    # read as case forms of the noun начало)
    "начали": "начать",
    "понял": "понять",
    "поняла": "понять",
    "поняли": "понять",
    "принял": "принять",
    "приняла": "принять",
    "приняли": "принять",
}

IRREGULAR_MAP: dict[str, str] = {
    **_EN_VERBS,
    **_EN_NOMINAL,
    **_RU_NOUNS,
    **_RU_VERBS,
}
