"""Deterministic mergeable HyperLogLog sketch for distinct counts.

The north star calls for "distinct-lang sketches" in rollup tiers. At test
scale the engine asserts *exact* distinct sets (operators/rollup.py carries
``lang_set``); this module provides the scale path: a fixed-hash, fixed-width
HLL whose results are bit-reproducible at any parallelism AND whose merge is
exact — sketch(A ∪ B) == merge(sketch(A), sketch(B)) by construction, because
registers combine with ``max``. That is the property the 1m→1h→1d cascade
needs (same shape as the histogram merge).

Spark-first construction — the per-row work is all JVM expressions:

- hash: ``xxhash64`` (Spark's documented stable 64-bit hash)
- register index: low ``p`` bits; remaining 64-p bits -> rank
- rank = #leading-zeros + 1 computed EXACTLY via string length of ``bin(w)``
  (``floor(log2(w)) + 1 == length(bin(w))`` for w > 0 — no float log2, which
  loses precision above 2^53 and would make ranks nondeterministic)
- per (group, register): ``max(rank)`` — a two-stage groupBy with full
  map-side combine; sparse registers collected per group (bounded by m)

Only the final estimator (harmonic mean + small/large-range corrections,
Flajolet et al. 2007) runs in a vectorized Arrow UDF over *group* rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

DEFAULT_P = 12  # 4096 registers, ~1.6% standard error


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_register_columns(col: str | Column, p: int = DEFAULT_P) -> tuple[Column, Column]:
    """(register_index, rank) columns for one value — pure JVM expressions."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.xxhash64(c)
    m = 1 << p
    reg = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftrightunsigned(h, p)
    nbits = 64 - p
    # rank = leading zeros of w (in nbits) + 1 = nbits - bitlength(w) + 1
    rank = F.when(w == 0, F.lit(nbits + 1)).otherwise(
        F.lit(nbits + 1) - F.length(F.bin(w))
    ).cast("int")
    return reg, rank


def hll_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    p: int = DEFAULT_P,
    out_col: str = "hll",
) -> DataFrame:
    """Sparse HLL per key group: ``out_col`` = sorted array<struct<reg,rank>>.

    Two-stage: groupBy(keys, reg) max(rank) — map-side combinable, the reg
    key spreads hot groups — then groupBy(keys) collecting the (bounded-by-m)
    sparse register list.
    """
    reg, rank = hll_register_columns(value_col, p)
    return (
        df.select(*keys, reg.alias("_reg"), rank.alias("_rank"))
        .groupBy(*keys, "_reg")
        .agg(F.max("_rank").alias("_rank"))
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list(F.struct(F.col("_reg").alias("reg"), F.col("_rank").alias("rank")))).alias(out_col))
    )


def hll_merge(child: DataFrame, keys: list[str], in_col: str = "hll", out_col: str = "hll") -> DataFrame:
    """Merge sketches across groups (e.g. 1m -> 1h): explode registers,
    max per register, re-collect. Exact: max is associative/commutative."""
    return (
        child.select(*keys, F.explode(in_col).alias("_e"))
        .select(*keys, F.col("_e.reg").alias("_reg"), F.col("_e.rank").alias("_rank"))
        .groupBy(*keys, "_reg")
        .agg(F.max("_rank").alias("_rank"))
        .groupBy(*keys)
        .agg(F.array_sort(F.collect_list(F.struct(F.col("_reg").alias("reg"), F.col("_rank").alias("rank")))).alias(out_col))
    )


def hll_estimate_udf(p: int = DEFAULT_P):
    """Vectorized estimator over sparse register arrays (rows = groups)."""
    m = 1 << p
    alpha = _alpha(m)

    @pandas_udf(DoubleType())
    def estimate(sketches: pd.Series) -> pd.Series:
        out = np.empty(len(sketches), dtype=np.float64)
        for i, sk in enumerate(sketches):
            regs = np.zeros(m, dtype=np.int64)
            for e in sk:
                regs[e["reg"]] = e["rank"]
            est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
            zeros = int(np.count_nonzero(regs == 0))
            if est <= 2.5 * m and zeros:
                est = m * np.log(m / zeros)  # small-range correction
            # no large-range correction: that branch is the 32-bit-hash
            # formula (Flajolet et al. 2007 §4); this sketch hashes with
            # 64-bit xxhash64, where collisions are negligible below 2^64
            # and applying the 2^32 correction would corrupt estimates
            # above ~143M (and NaN above 2^32)
            out[i] = est
        return pd.Series(out)

    return estimate


def with_hll_estimate(df: DataFrame, in_col: str = "hll", out_col: str = "distinct_est", p: int = DEFAULT_P) -> DataFrame:
    return df.withColumn(out_col, hll_estimate_udf(p)(F.col(in_col)))
