"""Holt double exponential smoothing (level + trend) per series.

The forecasting baseline one step up from EWMA (operators/rolling.py): EWMA
tracks a level only, so it lags any trending series by a constant; Holt
carries an explicit trend state, so the h-step-ahead forecast
``level + h*trend`` extrapolates. This is the classic capacity-planning /
traffic-projection primitive over the rollup tiers.

The recursion (Holt 1957, standard init l0 = x0, b0 = 0):

    l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
    b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}

is inherently sequential, so it runs as a JVM higher-order ``aggregate``
fold over each series' time-sorted value array — one shuffle to the series
key, k doubles of state, no Python (the funnel/lm.py pattern). Because the
fold visits values in ONE fixed order with ONE fixed expression per step,
the resulting doubles are bit-identical at any parallelism AND across
engines: :func:`holt_oracle_sql` emits the SAME arithmetic as a DuckDB
``list_reduce`` struct fold, and the gate hash-checks the raw doubles
(the engine's oracle-float discipline — no rounding of near-ties).

Smoothing factors are passed as decimal STRINGS (e.g. "0.5") and spliced
into both engines' SQL as ``CAST(.. AS DOUBLE)`` literals — correctly
rounded parses are identical everywhere (the sax.py breakpoint discipline).

Scale notes (100 TB): input should be a ROLLUP TIER (window-grain rows,
e.g. domain x 1h), not raw events — per-series state must fit an array.
The collect_list per key is bounded by the series length; at 1h grain a
year is 8 760 points. Guard: series longer than ``max_points`` raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "CAST({} AS DOUBLE)"


def _core(alpha: str, beta: str, l: str, b: str, x: str) -> tuple[str, str]:
    """The per-step (new_level, new_trend) arithmetic with the state
    accessors spliced in (engines differ: Spark arrays index 0-based
    ``acc[0]``, DuckDB 1-based ``acc[1]``). The state is an ARRAY, not a
    struct, deliberately: DuckDB 1.0's struct-literal lambda evaluates
    fields sequentially and later fields see EARLIER FIELDS' RESULTS in
    ``acc`` (measured: a ``'b': acc.l`` field returned the new level) —
    array literals do not mutate."""
    a = _D.format(alpha)
    be = _D.format(beta)
    one = _D.format(1)
    lvl = f"{a} * {x} + ({one} - {a}) * ({l} + {b})"
    trd = f"{be} * (({lvl}) - {l}) + ({one} - {be}) * {b}"
    return lvl, trd


def holt_fit(
    df: DataFrame,
    key_col: str = "id",
    time_col: str = "ts",
    value_col: str = "value",
    alpha: str = "0.5",
    beta: str = "0.3",
    horizon: int = 1,
    tiebreak_cols: list[str] | None = None,
    max_points: int = 1_000_000,
) -> DataFrame:
    """Fit Holt level+trend per key over the time-sorted cents series and
    forecast ``horizon`` steps ahead.

    Output: (key, n_points long, level double, trend double,
    forecast double = level + horizon*trend). NULL values are excluded
    (they carry no observation); keys whose every value is NULL vanish.
    ``tiebreak_cols`` must make the per-key order total.
    """
    float(alpha), float(beta)  # loud on non-numeric strings
    if not (0 < float(alpha) <= 1 and 0 <= float(beta) <= 1):
        raise ValueError(f"need 0 < alpha <= 1 and 0 <= beta <= 1, got {alpha}, {beta}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    ties = [F.col(c) for c in (tiebreak_cols or [])]
    cents = F.round(F.col(value_col) * 100).cast("long")
    rows = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("_key"),
        F.struct(F.col(time_col).alias("t"), *ties, cents.alias("c")).alias("_e"),
    )
    per_key = rows.groupBy("_key").agg(
        F.array_sort(F.collect_list("_e")).alias("_vals"),
        F.count(F.lit(1)).alias("n_points"),
    )
    guarded = per_key.withColumn(
        "_vals",
        F.when(F.col("n_points") <= max_points, F.col("_vals")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(f"holt_fit: series exceeds max_points={max_points} at key "),
                    F.col("_key").cast("string"),
                )
            )
        ),
    )
    lvl, trd = _core(alpha, beta, l="acc[0]", b="acc[1]", x="e[0]")
    hundred = _D.format(100)
    zero = _D.format(0)
    fold = f"""
        aggregate(
          slice(_xs, 2, greatest(size(_xs) - 1, 0)),
          element_at(_xs, 1),
          (acc, e) -> array({lvl}, {trd})
        )
    """
    out = (
        guarded.withColumn(
            "_xs",
            F.expr(
                f"transform(_vals, v -> array("
                f"CAST(v.c AS DOUBLE) / {hundred}, {zero}))"
            ),
        )
        .withColumn("_fit", F.expr(fold))
    )
    h = _D.format(horizon)
    return out.select(
        F.col("_key").alias(key_col),
        "n_points",
        F.expr("_fit[0]").alias("level"),
        F.expr("_fit[1]").alias("trend"),
        F.expr(f"_fit[0] + {h} * _fit[1]").alias("forecast"),
    )


def holt_oracle_sql(
    table: str,
    key_col: str,
    time_col: str,
    value_col: str,
    alpha: str = "0.5",
    beta: str = "0.3",
    horizon: int = 1,
    tiebreak_cols: list[str] | None = None,
    key_alias: str | None = None,
) -> str:
    """DuckDB twin of :func:`holt_fit`: ``list(... ORDER BY ...)`` +
    ``list_reduce`` struct fold with the SAME per-step arithmetic from
    :func:`_core` — the two engines cannot drift."""
    lvl, trd = _core(alpha, beta, l="acc[1]", b="acc[2]", x="e[1]")
    hundred = _D.format(100)
    zero = _D.format(0)
    h = _D.format(horizon)
    order = ", ".join([time_col, *(tiebreak_cols or [])])
    ka = key_alias or key_col
    return f"""
        WITH s AS (
            SELECT {key_col} AS k,
                   list(CAST(round({value_col} * 100) AS BIGINT)
                        ORDER BY {order}) AS cs,
                   count(*) AS n_points
            FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1),
        f AS (
            SELECT k, n_points,
                   list_reduce(
                     list_transform(cs, c ->
                       [CAST(c AS DOUBLE) / {hundred}, {zero}]),
                     (acc, e) -> [{lvl}, {trd}]
                   ) AS fit
            FROM s)
        SELECT k AS {ka}, CAST(n_points AS BIGINT) AS n_points,
               fit[1] AS level, fit[2] AS trend,
               fit[1] + {h} * fit[2] AS forecast
        FROM f
    """
