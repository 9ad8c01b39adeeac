"""Portable 64-bit string hash used by dedup / LSH / MinHash operators.

Defined once, implemented three ways (Spark column expression, DuckDB SQL
fragment, pure Python) so the driver's DuckDB oracle and pytest oracles can
reproduce the engine bit-for-bit:

    h60(s) = int(md5(s)[:15 hex digits], 16)        # 60 bits, fits in int64

MinHash permutations are the classic universal-hash family
``(a_i * h60(s) + b_i) mod P`` with a fixed Mersenne prime P = 2^61 - 1 and
deterministic (a_i, b_i) constants — the same arithmetic is expressible in
Spark SQL and DuckDB (both have exact 128-bit-free paths because all operands
stay < 2^62 after ``%``; we keep a*h in Python-oracle only, and in SQL use
floating-free modular arithmetic via the identity below).

To stay exactly representable in 64-bit signed integer SQL arithmetic we use
small multipliers (a < 2^2) — NOT cryptographically strong, but this is a
similarity sketch, not a security primitive. Instead of a*h+b we therefore use
re-hashing: ``h_i(s) = h60(str(i) + ':' + s)`` — one md5 per permutation,
identical in all three implementations and free of overflow concerns.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX_DIGITS = 15  # 60 bits < 2^63


def h60_py(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:HEX_DIGITS], 16)


def h60_col(col: Column) -> Column:
    """Spark: conv() parses hex → decimal string → long."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, HEX_DIGITS), 16, 10).cast(
        "long"
    )


def h60_sql(expr: str) -> str:
    """DuckDB fragment computing the same hash for a string expression."""
    return f"(('0x' || substr(md5({expr}), 1, {HEX_DIGITS}))::BIGINT)"


def perm_key(i: int, expr_is_sql: bool = False):
    """Prefix used for the i-th MinHash 'permutation' re-hash."""
    return f"{i}:"


def minhash_py(tokens: set[str], n_perm: int) -> list[int]:
    out = []
    for i in range(n_perm):
        pre = perm_key(i)
        out.append(min(h60_py(pre + t) for t in tokens) if tokens else -1)
    return out
