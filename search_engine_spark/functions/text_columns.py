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
from ..textproc.tokenize import BOUNDARY_STRIP, WORD_PATTERN, WS_SPLIT

# sorted so broadcast literal sets are deterministic across runs
_STOPWORD_LIST = sorted(STOPWORDS)


def terms_array_col(text_col=None, lemmatize: bool = True):
    """Array column of retained (optionally lemmatized) terms for one text.

    The whole tokenizer runs at ARRAY level (transform/filter lambdas)
    before the explode: with the naive explode-then-filter formulation,
    Catalyst's projection collapse inlines the regexp_replace into every
    downstream reference (filter predicates + aggregate key), evaluating
    the regex 4-5× per token — measured 2.3× slower end-to-end at
    sf0.1×32. Array lambdas evaluate each token exactly once and stay in
    whole-stage codegen."""
    from ..textproc.lemmas import lemma_col

    col = F.col("text") if text_col is None else (
        F.col(text_col) if isinstance(text_col, str) else text_col
    )
    # WS_SPLIT: the shared explicit whitespace class (Java \s is ASCII-only;
    # see textproc/tokenize.py) — all emitters split identically on Unicode ws
    arr = F.split(F.lower(F.trim(col)), WS_SPLIT)
    cleaned = F.transform(arr, lambda t: F.regexp_replace(t, BOUNDARY_STRIP, ""))
    kept = F.filter(
        cleaned,
        lambda t: (t != "")
        & t.rlike(WORD_PATTERN)
        & ~t.isin(_STOPWORD_LIST),
    )
    if lemmatize:
        kept = F.transform(kept, lambda t: lemma_col(t))
    return kept


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
    keep = keep or ["doc_id"]
    return df.select(
        *keep, F.explode(terms_array_col(text_col, lemmatize)).alias("term")
    )


def normalized_path_col(site_col: Column, url_col: Column) -> Column:
    """S4 URL normalizer as column expressions (see textproc/urls.py):
    lowercase → strip ?query/#fragment → strip site root → default '/' →
    drop trailing '/'. Cross-site handling is the caller's filter."""
    u = F.regexp_replace(F.lower(F.trim(url_col)), r"[?#].*$", "")
    root = F.regexp_replace(F.lower(F.trim(site_col)), "/+$", "")
    path = u.substr(F.length(root) + 1, F.length(u))
    path = F.when(F.length(path) > 1, F.regexp_replace(path, "/+$", "")).otherwise(path)
    return F.when(path == "", F.lit("/")).otherwise(path)
