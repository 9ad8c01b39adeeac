"""Probabilistic sketches, pinned deterministic — HyperLogLog distinct
counting (Flajolet et al. 2007) and count-min frequency estimation
(Cormode & Muthukrishnan 2005), the two sketches every large-scale
analytics engine ships (Spark's own `approx_count_distinct` is HLL++;
ES `cardinality` aggs are HLL; frequency caps in crawl/curation pipelines
are CM). The reference has no approximate machinery at all — statistics
are exact groupBy counts (services/StatisticsServiceImpl.java:37-43) —
but at 100 TB the exact per-group distinct (`count_distinct`) is a full
shuffle of every key; the sketch is one map-side-combinable aggregate of
BOUNDED state (256 registers / 4×1024 counters per group).

Built-in `approx_count_distinct` is NOT used on purpose: its HLL++ register
layout is engine-internal, so the DuckDB oracle could never reproduce it.
Instead both engines compute the SAME registers from the portable h60 hash
(hashing.py), making the sketches value-hash verifiable — and mergeable
across segments/streams by plain `max`/`sum`, which engine-internal sketch
binaries are not (across engines).

Pinned HLL spec (b=8):
  h = h60(key)                        # 60 bits, identical in all engines
  idx = h & 255                       # register index, m=256 registers
  w   = h >> 8                        # remaining 52 bits
  rho = 53 - bit_length(w)            # leading-zero rank; w=0 → 53
  M_j = max rho per (group, idx)
  sum = Σ_j 2^(53-M_j)  (empty registers contribute 2^53) — EXACT int64
        (≤ 256·2^53 = 2^61), so summation order cannot perturb the value
  E   = alpha_256 · m² · 2^53 / sum;  alpha_256 = 0.7213/(1+1.079/256)
  if E ≤ 2.5·m and V>0 (V = empty registers): E = m·ln(m/V)   # linear cnt
  rounded 4 dp.

Pinned CM spec: d=4 rows × w=1024 columns; row hashes are the re-hash
family h60(f"{j}:" + key) (hashing.py::perm_key convention); cell =
Σ tf of colliding keys; estimate(key) = min_j cell[j][h_j(key)] — never
an underestimate, a property the tests pin.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..hashing import h60_col, h60_py

HLL_M = 256
HLL_W1 = 53  # w-bit width + 1 (h60 is 60 bits: 8 index + 52 payload)
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
HLL_SCALE = 1 << HLL_W1  # fixed-point scale: register 0 contributes 2^53

CM_D = 4
CM_W = 1024


# ------------------------------------------------------------------ HLL

def hll_registers(df: DataFrame, key_col: str,
                  group_cols: list[str]) -> DataFrame:
    """Register maxima → (group_cols..., idx, m_j). ONE map-side-combinable
    max aggregate; per-group state is ≤ 256 rows regardless of input size.
    Mergeable: `max` over unions of register frames IS the merged sketch."""
    h = h60_col(F.col(key_col))
    # NULL keys are not elements: h60(NULL) yields a (idx=NULL, m_j=NULL)
    # register row that n_present counts but sum_present skips — one
    # empty-register 2^53 term vanishes from the denominator and the
    # estimate silently inflates. Filter them before hashing.
    reg = df.filter(F.col(key_col).isNotNull()).select(
        *group_cols,
        h.bitwiseAND(F.lit(HLL_M - 1)).alias("idx"),
        F.shiftright(h, 8).alias("w"),
    ).withColumn(
        "rho",
        F.when(F.col("w") == 0, F.lit(HLL_W1)).otherwise(
            F.lit(HLL_W1) - F.length(F.bin(F.col("w")))
        ).cast("int"),
    )
    return reg.groupBy(*group_cols, "idx").agg(F.max("rho").alias("m_j"))


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Merge per-segment register frames into one sketch: union + max.
    Lossless by the HLL merge theorem (register-wise max of the segment
    sketches EQUALS the sketch of the concatenated input), so segment
    builds never rescan old data to refresh corpus-wide distinct counts —
    the 256-row-per-group register frame is the only state carried
    forward. Exactness (not ≈) is pinned by tests/test_sketches.py."""
    it = iter(register_frames)
    merged = next(it)
    for regs in it:
        merged = merged.unionByName(regs)
    group_cols = [c for c in merged.columns if c not in ("idx", "m_j")]
    return merged.groupBy(*group_cols, "idx").agg(F.max("m_j").alias("m_j"))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """Registers → (group_cols..., est_distinct rounded 4 dp). Standard
    error ≈ 1.04/√256 = 6.5%."""
    group_cols = [c for c in regs.columns if c not in ("idx", "m_j")]
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W1} - m_j)"))
        .alias("sum_present"),
        F.count("*").alias("n_present"),
    )
    sum_int = (
        F.col("sum_present")
        + (F.lit(HLL_M) - F.col("n_present")) * F.lit(HLL_SCALE)
    )
    v = (F.lit(HLL_M) - F.col("n_present")).cast("double")
    e_raw = F.lit(HLL_ALPHA * HLL_M * HLL_M * float(HLL_SCALE)) / sum_int.cast(
        "double"
    )
    est = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols, F.round(est, 4).alias("est_distinct")
    )


def hll_distinct(df: DataFrame, key_col: str,
                 group_cols: list[str]) -> DataFrame:
    """Approximate per-group distinct count → (group_cols...,
    est_distinct rounded 4 dp). One-shot build + estimate."""
    return hll_estimate(hll_registers(df, key_col, group_cols))


def cm_merge(*counter_frames: DataFrame) -> DataFrame:
    """Merge per-segment count-min tables: union + sum per cell. Lossless
    (counters are linear), output stays ≤ d·w = 4,096 rows."""
    it = iter(counter_frames)
    merged = next(it)
    for c in it:
        merged = merged.unionByName(c)
    return merged.groupBy("j", "col").agg(F.sum("cnt").alias("cnt"))


def hll_py(keys, m: int = HLL_M) -> float:
    """Pure-Python mirror of the pinned estimator (test oracle)."""
    regs = [0] * m
    for k in keys:
        h = h60_py(k)
        idx, w = h & (m - 1), h >> 8
        rho = HLL_W1 - w.bit_length() if w else HLL_W1
        regs[idx] = max(regs[idx], rho)
    s = sum(1 << (HLL_W1 - r) for r in regs)
    e = HLL_ALPHA * m * m * float(HLL_SCALE) / s
    v = regs.count(0)
    if e <= 2.5 * m and v > 0:
        e = m * math.log(m / v)
    return round(e, 4)


# ------------------------------------------------------------ count-min

def _cm_cells(term_col) -> list:
    """The d (row, column) pairs for a key — literal row prefixes so the
    hashed strings are identical in Spark / DuckDB / Python."""
    return [
        (j, h60_col(F.concat(F.lit(f"{j}:"), term_col))
            .bitwiseAND(F.lit(CM_W - 1)))
        for j in range(CM_D)
    ]


def cm_counters(postings: DataFrame) -> DataFrame:
    """Count-min table → (j, col, cnt): Σ tf of all terms hashing to the
    cell. Bounded output (≤ d·w = 4096 rows) from one exploded map-side-
    combinable sum — the sketch build never shuffles more than d× the
    DICTIONARY, not the corpus (postings are pre-aggregated per doc)."""
    cells = postings.select(
        "tf",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), col.alias("col"))
            for j, col in _cm_cells(F.col("term"))
        ])).alias("cell"),
    )
    return cells.groupBy(
        F.col("cell.j").alias("j"), F.col("cell.col").alias("col")
    ).agg(F.sum("tf").alias("cnt"))


def cm_estimates(counters: DataFrame, term_dict: DataFrame) -> DataFrame:
    """Point estimates for every dictionary term → (term, cm_est =
    min over ALL d cells, an empty cell counting as 0 — the sketch's
    defining guarantee is est ≥ true count with est = 0 possible for a
    never-seen key; an inner join would instead report the smallest
    COLLIDING count for absent keys, or drop them entirely). The 4096-row
    counter table broadcasts; the probe is one scan of the dictionary +
    a bounded min aggregate."""
    probes = term_dict.select(
        "term",
        F.explode(F.array(*[
            F.struct(F.lit(j).alias("j"), col.alias("col"))
            for j, col in _cm_cells(F.col("term"))
        ])).alias("cell"),
    ).select("term", F.col("cell.j").alias("j"), F.col("cell.col").alias("col"))
    return (
        probes.join(F.broadcast(counters), ["j", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cm_est"))
    )


def cm_heavy_hitters(postings: DataFrame, term_dict: DataFrame,
                     k: int = 20) -> DataFrame:
    """Top-k terms by count-min estimated collection frequency →
    (term, cm_est), est desc / term asc. The practical heavy-hitter query:
    at stream/merge time only the 4096-cell table is kept, and candidates
    are whatever dictionary (or monitored list) is probed against it."""
    est = cm_estimates(cm_counters(postings), term_dict)
    return est.orderBy(F.col("cm_est").desc(), F.col("term").asc()).limit(k)


def cm_estimate_py(freqs: dict[str, int], key: str) -> int:
    """Pure-Python mirror (test oracle)."""
    cells: list[dict[int, int]] = [dict() for _ in range(CM_D)]
    for t, f in freqs.items():
        for j in range(CM_D):
            c = h60_py(f"{j}:{t}") & (CM_W - 1)
            cells[j][c] = cells[j].get(c, 0) + f
    return min(
        cells[j].get(h60_py(f"{j}:{key}") & (CM_W - 1), 0)
        for j in range(CM_D)
    )
