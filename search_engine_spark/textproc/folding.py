"""ASCII folding — the Elasticsearch/Lucene `asciifolding` token filter.

The reference's analyzer accepts only Russian/English letters
(services/LemmasFinder.java:275-290 word pattern): an accented Latin word
like "café" fails the full-match and is silently DROPPED from the index.
Real web text is full of such words; Lucene's ASCIIFoldingFilter maps
Latin-1/Latin-A accents to their ASCII base so "café" indexes (and is
searchable) as "cafe". This module is that filter, as one frozen spec with
three pinned implementations (pure Python here, a Spark column expression,
and a DuckDB fragment in oracle_fragments.FOLD_SQL) — the repo's standard
correctness model.

Folding = lowercase first (the analyzer lowercases anyway), then the
multi-char expansions (ß→ss, æ→ae, œ→oe — translate() is 1:1, so these go
through replace), then one translate() over the 1:1 accent table. The
table covers the Latin-1 Supplement + the Latin-Extended-A letters common
in European web text; it is intentionally a FROZEN subset of Lucene's
full table (which spans dozens of blocks) — extend FOLD_1TO1/FOLD_MULTI
and the three implementations stay in lockstep by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 1:1 accent → ASCII (lowercase only; folding runs after lower())
FOLD_1TO1 = {
    "à": "a", "á": "a", "â": "a", "ã": "a", "ä": "a", "å": "a",
    "ā": "a", "ă": "a", "ą": "a",
    "ç": "c", "ć": "c", "č": "c",
    "ď": "d", "đ": "d",
    "è": "e", "é": "e", "ê": "e", "ë": "e", "ē": "e", "ė": "e",
    "ę": "e", "ě": "e",
    "ğ": "g", "ģ": "g",
    "ì": "i", "í": "i", "î": "i", "ï": "i", "ī": "i", "į": "i",
    "ķ": "k",
    "ĺ": "l", "ļ": "l", "ľ": "l", "ł": "l",
    "ñ": "n", "ń": "n", "ņ": "n", "ň": "n",
    "ò": "o", "ó": "o", "ô": "o", "õ": "o", "ö": "o", "ø": "o",
    "ō": "o", "ő": "o",
    "ŕ": "r", "ř": "r",
    "ś": "s", "ş": "s", "š": "s",
    "ť": "t", "ţ": "t",
    "ù": "u", "ú": "u", "û": "u", "ü": "u", "ū": "u", "ů": "u",
    "ű": "u", "ų": "u",
    "ý": "y", "ÿ": "y",
    "ź": "z", "ż": "z", "ž": "z",
}
# multi-char expansions (translate cannot express these)
FOLD_MULTI = {"ß": "ss", "æ": "ae", "œ": "oe"}

FOLD_SRC = "".join(FOLD_1TO1)
FOLD_DST = "".join(FOLD_1TO1.values())


def fold_py(s: str) -> str:
    """Pure-Python folding (applied AFTER lowercasing)."""
    for k, v in FOLD_MULTI.items():
        s = s.replace(k, v)
    return s.translate(str.maketrans(FOLD_1TO1))


def fold_col(col: Column) -> Column:
    """Spark column folding — regexp-free single-char replaces for the
    multi-char expansions, then one translate (all JVM-side codegen)."""
    out = col
    for k, v in FOLD_MULTI.items():
        out = F.replace(out, F.lit(k), F.lit(v))
    return F.translate(out, FOLD_SRC, FOLD_DST)


def fold_sql(expr: str) -> str:
    """DuckDB fragment computing the same folding."""
    out = expr
    for k, v in FOLD_MULTI.items():
        out = f"replace({out}, '{k}', '{v}')"
    return f"translate({out}, '{FOLD_SRC}', '{FOLD_DST}')"
