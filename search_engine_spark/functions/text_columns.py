"""Spark column-expression tokenization pipeline (the hot path).

The reference lemmatizes row-at-a-time in Java (services/LemmasFinder.java).
Here the analyzer runs JVM-side — ``lower``/``split``/``explode``/
``regexp_replace``/``rlike``/``isin`` in whole-stage codegen, plus one
broadcast join against the generated lemma dictionary
(textproc/morphology.py) — no Python in the loop at all. The equivalent
Arrow pandas-UDF wrappers (functions/udfs.py) serve callers that are
already inside a pandas stage.

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


def terms_array_col(text_col=None):
    """Array column of retained SURFACE tokens for one text (rules 1-4 +
    stopword drop; lemmatization happens post-explode in explode_terms).

    The tokenizer runs at ARRAY level (transform/filter lambdas) before the
    explode: with the naive explode-then-filter formulation, Catalyst's
    projection collapse inlines the regexp_replace into every downstream
    reference (filter predicates + aggregate key), evaluating the regex
    4-5× per token — measured 2.3× slower end-to-end at sf0.1×32. Array
    lambdas evaluate each token exactly once and stay in whole-stage
    codegen."""
    col = F.col("text") if text_col is None else (
        F.col(text_col) if isinstance(text_col, str) else text_col
    )
    # WS_SPLIT: the shared explicit whitespace class (Java \s is ASCII-only;
    # see textproc/tokenize.py) — all emitters split identically on Unicode ws
    arr = F.split(F.lower(F.trim(col)), WS_SPLIT)
    cleaned = F.transform(arr, lambda t: F.regexp_replace(t, BOUNDARY_STRIP, ""))
    return F.filter(
        cleaned,
        lambda t: (t != "")
        & t.rlike(WORD_PATTERN)
        & ~t.isin(_STOPWORD_LIST),
    )


def explode_terms(
    df: DataFrame,
    text_col: str = "text",
    keep: list[str] | None = None,
    lemmatize: bool = True,
) -> DataFrame:
    """documents → one row per retained term occurrence: (*keep, term).

    keep defaults to ["doc_id"]. Duplicate occurrences are preserved (tf is
    aggregated downstream). ``lemmatize`` applies the full generated
    dictionary (T5, textproc/morphology.py) as a BROADCAST join against
    the (word, normal) frame — the dictionary ships once per executor and
    the exploded term stream probes a hash table; a thousands-of-entries
    literal map would bloat the codegen'd plan instead."""
    keep = keep or ["doc_id"]
    out = df.select(
        *keep, F.explode(terms_array_col(text_col)).alias("term")
    )
    if lemmatize:
        from ..textproc.lemmas import lemma_dict_df

        from ..textproc.ruletier import rule_lemma_col

        ld = lemma_dict_df(df.sparkSession)
        out = out.join(
            F.broadcast(ld), out["term"] == ld["word"], "left"
        ).select(
            *keep,
            F.coalesce(
                F.col("normal"), rule_lemma_col(F.col("term"))
            ).alias("term"),
        )
    return out


def normalized_path_col(site_col: Column, url_col: Column) -> Column:
    """S4 URL normalizer as column expressions — the exact column twin of
    textproc/urls.py::normalize_path: lowercase → strip ?query/#fragment
    → strip site root (site-relative '/...' URLs pass through; anything
    else is NULL, never a garbage suffix) → default '/' → drop trailing
    '/'."""
    u = F.regexp_replace(F.lower(F.trim(url_col)), r"[?#].*$", "")
    root = F.regexp_replace(F.lower(F.trim(site_col)), "/+$", "")
    path = F.when(
        u.startswith(root), u.substr(F.length(root) + 1, F.length(u))
    ).when(u.startswith("/"), u)
    path = F.when(
        F.length(path) > 1, F.regexp_replace(path, "/+$", "")
    ).otherwise(path)
    return F.when(path == "", F.lit("/")).when(
        path.startswith("/"), path
    )


def surt_key_col(url_col="raw_url") -> Column:
    """SURT canonical key (Sort-friendly URI Reordering Transform — the
    Internet Archive / Common Crawl CDX index key): lowercase, scheme and
    leading "www." dropped, host components REVERSED and comma-joined,
    ")" separator, path with query/fragment and trailing slash stripped —
    e.g. ``https://www.a.example/Docs/5/?x=1`` → ``example,a)/docs/5``.

    Host reversal is what makes the key sort-friendly: all pages of a
    registrable domain become one contiguous key range, so a CDX-style
    index range-prunes by domain prefix. Pure codegen string ops."""
    u = F.lower(F.col(url_col) if isinstance(url_col, str) else url_col)
    rest = F.regexp_replace(u, r"^[a-z]+://", "")
    host = F.regexp_replace(
        F.regexp_extract(rest, r"^([^/?#]+)", 1), r"^www\.", ""
    )
    # '/+$' (not '/$'): repeated trailing slashes are the same resource —
    # normalized_path_col above already strips them all, and two keys for
    # one page would defeat CDX-style dedup/range lookups
    path = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(rest, r"^[^/?#]+", ""), r"[?#].*$", ""
        ),
        r"/+$",
        "",
    )
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), path)
