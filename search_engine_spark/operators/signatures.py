"""Signature files — per-document term-set Bloom signatures for
conjunctive pre-filtering (Faloutsos & Christodoulakis, TOIS 1984; the
"signature file" IR architecture, reborn in modern engines as per-block
Bloom gating).

Each document carries one 63-bit superimposed-coding signature: bit
h60("sig:"+term) mod 63 set for every distinct term (k=1 Bloom; bit 63
stays clear so the mask never touches the sign bit in either engine's
BIGINT). A conjunctive query precomputes its mask driver-side; docs
with ``sig & mask != mask`` provably cannot contain all query terms and
are skipped WITHOUT touching postings. False positives pass through to
the exact postings check — the classic two-step: cheap sound gate, exact
verify.

Where this earns its keep at scale: the signature column is 8 bytes/doc
and lives beside doc_stats — the gate is a codegen scan-filter with NO
join, shrinking the candidate set before any posting list is decoded.
(The block store's zone maps gate by doc-id range; signatures gate by
CONTENT — orthogonal prunes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import h60_col, h60_py

SIG_BITS = 63


def term_bit_col(term_col) -> "F.Column":
    return (
        h60_col(F.concat(F.lit("sig:"), term_col)) % SIG_BITS
    ).cast("int")


def term_bit(term: str) -> int:
    """Driver-side mirror of term_bit_col."""
    return h60_py(f"sig:{term}") % SIG_BITS


def doc_signatures(postings: DataFrame) -> DataFrame:
    """(doc_id, sig) — 63-bit superimposed term-set signature per doc.
    One groupBy(doc_id) bit_or — algebraic, map-side combinable."""
    return (
        postings.select(
            "doc_id", term_bit_col(F.col("term")).alias("bit")
        )
        .select(
            "doc_id",
            F.expr("shiftleft(CAST(1 AS BIGINT), bit)").alias("b"),
        )
        .groupBy("doc_id")
        .agg(F.bit_or("b").alias("sig"))
    )


def query_mask(terms: list[str]) -> int:
    m = 0
    for t in set(terms):
        m |= 1 << term_bit(t)
    return m


def signature_candidates(sigs: DataFrame, terms: list[str]) -> DataFrame:
    """(doc_id) — docs whose signature admits ALL query terms (sound
    superset of the conjunctive match set; false positives possible,
    false negatives impossible). Pure codegen filter, no join."""
    mask = query_mask(terms)
    return sigs.filter(
        F.col("sig").bitwiseAND(F.lit(mask)) == F.lit(mask)
    ).select("doc_id")
