"""DDSketch-style quantile sketch: bounded state, relative-error guarantee.

The exact rollup percentiles (operators/rollup.py, metric_rollup.py) carry a
(value -> count) histogram whose state is O(#distinct values per window) —
exactly right for prices/lengths with bounded domains, but a wide-domain
metric (latency microseconds, byte sizes) can make per-window state grow
with the data. This module is the scale path: log-boundary buckets à la
DDSketch (Masson, Rim, Lee — VLDB 2019, "DDSketch: A Fast and
Fully-Mergeable Quantile Sketch with Relative-Error Guarantees"):

- bucket(v) = ceil(log_gamma(v)) for v > 0 (zeros tracked separately), a
  pure JVM expression;
- per-group state = sparse sorted (bucket -> count) array, bounded by
  O(log_gamma(max/min)) buckets regardless of row count — for gamma=1.02
  and values spanning 1 cent .. 10^12 cents that is ~1,400 buckets, ever;
- merge = per-bucket integer count sum — exact, associative, commutative:
  the 1m -> 1h -> 1d cascade is bit-identical to from-raw by construction
  (same mergeable-state shape as the histogram and HLL cascades);
- quantile estimate = bucket midpoint 2·gamma^b / (gamma+1), with
  guaranteed relative error (gamma-1)/(gamma+1) (~0.99% at gamma=1.02)
  against the exact rank value.

Everything per-row is JVM expressions; only the final per-window quantile
extraction runs in a vectorized Arrow kernel over window rows.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

DEFAULT_GAMMA = 1.02


def relative_error_bound(gamma: float = DEFAULT_GAMMA) -> float:
    """Guaranteed relative error of quantile estimates."""
    return (gamma - 1.0) / (gamma + 1.0)


def dd_bucket(col: str | Column, gamma: float = DEFAULT_GAMMA) -> Column:
    """Bucket index of a positive value: ceil(ln(v) / ln(gamma)); 0 maps to
    the reserved bucket MIN_INT+0 handled as index null -> zero-count slot.

    Values must be >= 0 (metric semantics); negatives would need a mirrored
    sketch (not required by any engine metric)."""
    c = F.col(col) if isinstance(col, str) else col
    lg = math.log(gamma)
    return F.when(c <= 0, F.lit(None)).otherwise(
        F.ceil(F.log(c.cast("double")) / F.lit(lg)).cast("int")
    )


def dd_sketch(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    gamma: float = DEFAULT_GAMMA,
    out_col: str = "dd",
    zero_col: str = "dd_zeros",
) -> DataFrame:
    """Sparse DDSketch per key group: sorted array<struct<b,cnt>> + a zero
    count. Two-stage groupBy (keys, bucket) -> (keys): map-side combinable,
    the bucket key spreads hot groups (built-in salting)."""
    b = dd_bucket(value_col, gamma)
    return (
        df.select(*keys, b.alias("_b"))
        .groupBy(*keys, "_b")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_b").isNotNull(),
                        F.struct(F.col("_b").alias("b"), F.col("_cnt").alias("cnt")),
                    )
                )
            ).alias(out_col),
            F.coalesce(
                F.sum(F.when(F.col("_b").isNull(), F.col("_cnt"))), F.lit(0)
            ).alias(zero_col),
        )
    )


def dd_merge(
    child: DataFrame,
    keys: list[str],
    in_col: str = "dd",
    zero_col: str = "dd_zeros",
) -> DataFrame:
    """Merge sketches across groups (1m -> 1h): explode buckets, sum counts
    per bucket, re-collect. Exact integer merge — cascaded == from-raw."""
    zeros = child.groupBy(*keys).agg(F.sum(zero_col).alias(zero_col))
    buckets = (
        child.select(*keys, F.explode_outer(in_col).alias("_e"))
        .where(F.col("_e").isNotNull())
        .groupBy(*keys, F.col("_e.b").alias("_b"))
        .agg(F.sum("_e.cnt").alias("_cnt"))
        .groupBy(*keys)
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("_b").alias("b"), F.col("_cnt").alias("cnt")))
            ).alias(in_col)
        )
    )
    return zeros.join(buckets, keys, "left").withColumn(
        in_col, F.coalesce(in_col, F.array().cast(f"array<struct<b:int,cnt:bigint>>"))
    )


def dd_quantiles_udf(qs: tuple[float, ...], gamma: float = DEFAULT_GAMMA):
    """Vectorized estimator over sketch rows (rows = windows): for each q,
    walk the cumulative counts to the target rank, return the bucket
    midpoint (zeros occupy the lowest ranks at value 0.0)."""
    mid_base = 2.0 / (gamma + 1.0)
    lg = math.log(gamma)

    @pandas_udf(ArrayType(DoubleType()))
    def estimate(sketches: pd.Series, zeros: pd.Series) -> pd.Series:
        out = []
        for sk, z in zip(sketches, zeros):
            z = int(z or 0)
            bs = np.array([e["b"] for e in sk], dtype=np.int64)
            cs = np.array([e["cnt"] for e in sk], dtype=np.int64)
            n = z + int(cs.sum())
            if n == 0:
                out.append([float("nan")] * len(qs))
                continue
            cum = z + np.cumsum(cs) if len(cs) else np.array([], dtype=np.int64)
            vals = []
            for q in qs:
                # rank in [1, n]: the ceil((n-1)*q)+1-th smallest (DDSketch's
                # 0-indexed floor(q*(n-1)) position)
                rank = int(math.floor(q * (n - 1))) + 1
                if rank <= z:
                    vals.append(0.0)
                    continue
                i = int(np.searchsorted(cum, rank, side="left"))
                vals.append(mid_base * math.exp(bs[i] * lg))
            out.append(vals)
        return pd.Series(out)

    return estimate


def with_dd_quantiles(
    df: DataFrame,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
    gamma: float = DEFAULT_GAMMA,
    in_col: str = "dd",
    zero_col: str = "dd_zeros",
    out_col: str = "dd_q",
) -> DataFrame:
    return df.withColumn(
        out_col, dd_quantiles_udf(qs, gamma)(F.col(in_col), F.col(zero_col))
    )
