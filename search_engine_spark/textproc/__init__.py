"""Pure-Python text processing — the per-row invariant surface.

These functions are the single source of truth for tokenization, extraction,
URL normalization, morphology and snippets; the Spark layer wraps them in
column expressions / Arrow UDFs without changing semantics, and the DuckDB
oracle SQL re-expresses the same rules (see functions/oracle_fragments.py).
"""
