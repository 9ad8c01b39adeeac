"""Spark column-expression tokenization pipeline (the hot path).

The reference lemmatizes row-at-a-time in Java (services/LemmasFinder.java).
Here the fast analyzer runs entirely JVM-side inside whole-stage codegen —
``lower``/``split``/``explode``/``regexp_replace``/``rlike``/``isin`` — no
Python in the loop at all, which beats even an Arrow UDF at 100 TB scale.
The Arrow pandas-UDF morphology analyzer (functions/udfs.py) is the slow
path used only when lemmatization is enabled.

Semantics are pinned by textproc/tokenize.py (pure-Python reference impl)
and mirrored by functions/oracle_fragments.py (DuckDB oracle SQL).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..textproc.stopwords import STOPWORDS
from ..textproc.tokenize import BOUNDARY_STRIP, WORD_PATTERN

# sorted so broadcast literal sets are deterministic across runs
_STOPWORD_LIST = sorted(STOPWORDS)


def explode_terms(
    df: DataFrame,
    text_col: str = "text",
    keep: list[str] | None = None,
    lemmatize: bool = True,
) -> DataFrame:
    """documents → one row per retained term occurrence: (*keep, term).

    keep defaults to ["doc_id"]. Duplicate occurrences are preserved (tf is
    aggregated downstream). ``lemmatize`` applies the frozen normal-form
    dictionary (T5) as a literal-map lookup — still whole-stage codegen."""
    from ..textproc.lemmas import lemma_col

    keep = keep or ["doc_id"]
    tok = F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok")
    out = df.select(*keep, tok)
    term = F.regexp_replace(F.col("tok"), BOUNDARY_STRIP, "")
    out = out.withColumn("term", term).drop("tok")
    out = out.filter(
        (F.col("term") != "")
        & F.col("term").rlike(WORD_PATTERN)
        & ~F.col("term").isin(_STOPWORD_LIST)
    )
    if lemmatize:
        out = out.withColumn("term", lemma_col(F.col("term")))
    return out


def normalized_path_col(site_col: Column, url_col: Column) -> Column:
    """S4 URL normalizer as column expressions (see textproc/urls.py):
    lowercase → strip ?query/#fragment → strip site root → default '/' →
    drop trailing '/'. Cross-site handling is the caller's filter."""
    u = F.regexp_replace(F.lower(F.trim(url_col)), r"[?#].*$", "")
    root = F.regexp_replace(F.lower(F.trim(site_col)), "/+$", "")
    path = u.substr(F.length(root) + 1, F.length(u))
    path = F.when(F.length(path) > 1, F.regexp_replace(path, "/+$", "")).otherwise(path)
    return F.when(path == "", F.lit("/")).otherwise(path)
