"""Arrow pandas-UDF wrappers for the morphology analyzer.

These are the vectorized Python-side counterparts of the JVM tokenization
pipeline in functions/text_columns.py — for callers that are already inside
a pandas stage (the Arrow tokenizers in operators/index_build.py and
operators/fused_build.py inline the same Series ops directly) or that want
the analyzer as a standalone column function.

All of them are Series-in/Series-out over Arrow batches (never per-row
Python), per the north rule's "vectorized pandas/Arrow UDFs (no per-row
Python)". Semantics are pinned by textproc/tokenize.py +
textproc/morphology.py and shared with the DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..textproc.lemmas import FULL_LEMMA_MAP
from ..textproc.ruletier import rule_series
from ..textproc.morphology import PARTICLES, _form_index, _particle_lexicon


def lemmatize_series(s: pd.Series) -> pd.Series:
    """First-normal-form lookup (T5), vectorized; dictionary misses take
    the rule tier (applied only to the miss slice)."""
    m = s.map(FULL_LEMMA_MAP)
    miss = m.isna()
    if miss.any():
        m[miss] = rule_series(s[miss])
    return m


def fitting_mask(s: pd.Series) -> pd.Series:
    """Reference isFittingWord (LemmasFinder.java:299-316) over a Series:
    True iff morphology recognizes the word and none of its tags is a
    PARTICLES class. Vectorized via two frozen membership sets."""
    idx = _form_index()
    particles = _particle_lexicon()
    recognized = {
        w for w, (_, pos) in idx.items() if pos not in PARTICLES
    } - set(particles)
    return s.isin(recognized)


@F.pandas_udf(T.StringType())
def lemmatize_udf(s: pd.Series) -> pd.Series:
    """Column form of lemmatize_series (Arrow-batched)."""
    return lemmatize_series(s)


@F.pandas_udf(T.BooleanType())
def is_fitting_udf(s: pd.Series) -> pd.Series:
    """Column form of fitting_mask (Arrow-batched)."""
    return fitting_mask(s)
