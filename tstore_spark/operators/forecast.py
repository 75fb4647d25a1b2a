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


def _hw_core(
    alpha: str, beta: str, gamma: str, l: str, b: str, s_prev: str, x: str
) -> tuple[str, str, str]:
    """Holt-Winters additive per-step (level, trend, season) arithmetic
    with engine-specific state accessors spliced in (the :func:`_core`
    convention — array state, never struct)::

        l_t = α(x_t − s_{t−m}) + (1−α)(l_{t−1} + b_{t−1})
        b_t = β(l_t − l_{t−1}) + (1−β) b_{t−1}
        s_t = γ(x_t − l_t) + (1−γ) s_{t−m}
    """
    a = _D.format(alpha)
    be = _D.format(beta)
    g = _D.format(gamma)
    one = _D.format(1)
    lvl = f"{a} * ({x} - {s_prev}) + ({one} - {a}) * ({l} + {b})"
    trd = f"{be} * (({lvl}) - {l}) + ({one} - {be}) * {b}"
    ssn = f"{g} * ({x} - ({lvl})) + ({one} - {g}) * {s_prev}"
    return lvl, trd, ssn


def holt_winters_fit(
    df: DataFrame,
    key_col: str = "id",
    time_col: str = "ts",
    value_col: str = "value",
    period: int = 24,
    alpha: str = "0.5",
    beta: str = "0.3",
    gamma: str = "0.3",
    horizon: int = 1,
    tiebreak_cols: list[str] | None = None,
    max_points: int = 1_000_000,
) -> DataFrame:
    """Holt-Winters ADDITIVE triple exponential smoothing per key — the
    seasonal step up from :func:`holt_fit` (level + trend + a length-
    ``period`` seasonal profile), the classic capacity-forecast for
    daily/weekly-cyclic traffic.

    State is a flat double array ``[l, b, s_0..s_{m-1}]`` folded over the
    time-sorted series by ONE fixed expression per step (JVM higher-order
    ``aggregate``; the seasonal slot rebuild iterates a generated index
    sequence, so both engines express the identical in-place update).
    Deterministic init: ``l_0`` = fixed-order mean of the first period,
    ``b_0 = 0``, ``s_i = x_i − l_0``; the fold starts at element m+1.
    Same exactness contract as Holt: integer cents in, one arithmetic
    core shared verbatim with :func:`holt_winters_oracle_sql`, raw double
    bits hash-match across engines and parallelism.

    Output: (key, n_points, level, trend, season, forecast) where
    ``season`` is the fitted seasonal component at the forecast's phase
    ``(n−1+horizon) mod m`` and ``forecast = level + horizon·trend +
    season``. Keys need ``n >= 2·period`` points (one period to
    initialize, at least one to smooth a full cycle) — shorter series
    raise in-plan. Scale note: input should be a rollup TIER (window-grain
    rows), the holt_fit rule.
    """
    float(alpha), float(beta), float(gamma)
    if not (
        0 < float(alpha) <= 1 and 0 <= float(beta) <= 1 and 0 <= float(gamma) <= 1
    ):
        raise ValueError(
            f"need 0 < alpha <= 1, 0 <= beta/gamma <= 1, got {alpha}, {beta}, {gamma}"
        )
    if period < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    if horizon < 0:
        raise ValueError(f"horizon must be >= 0, got {horizon}")
    m = int(period)
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
    hundred = _D.format(100)
    zero = _D.format(0)
    guarded = per_key.withColumn(
        "_cs",
        F.when(
            (F.col("n_points") >= 2 * m) & (F.col("n_points") <= max_points),
            F.expr(f"transform(_vals, v -> CAST(v.c AS DOUBLE) / {hundred})"),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"holt_winters_fit: series needs 2*period={2*m} to "
                        f"{max_points} points at key "
                    ),
                    F.col("_key").cast("string"),
                )
            )
        ),
    )
    # l0 HOISTED into its own column: referencing it inside the init array
    # m+1 times would re-run the fold per reference (the dedup.py lesson)
    staged = guarded.withColumn(
        "_l0",
        F.expr(
            f"aggregate(slice(_cs, 1, {m}), {zero}, (acc, x) -> acc + x)"
            f" / {_D.format(m)}"
        ),
    ).withColumn(
        "_init",
        F.expr(
            f"concat(array(_l0, {zero}), "
            f"transform(slice(_cs, 1, {m}), x -> x - _l0))"
        ),
    )
    lvl, trd, ssn = _hw_core(
        alpha, beta, gamma,
        l="acc[0]", b="acc[1]",
        s_prev="acc[2 + CAST(e[1] AS INT)]", x="e[0]",
    )
    fold = f"""
        aggregate(
          transform(sequence({m}, size(_cs) - 1),
                    i -> array(_cs[i], CAST(i % {m} AS DOUBLE))),
          _init,
          (acc, e) -> concat(
            array({lvl}, {trd}),
            transform(sequence(0, {m - 1}),
                      i -> IF(i = CAST(e[1] AS INT), {ssn}, acc[i + 2])))
        )
    """
    h = _D.format(horizon)
    out = staged.withColumn("_fit", F.expr(fold))
    season = f"_fit[2 + CAST((n_points - 1 + {horizon}) % {m} AS INT)]"
    return out.select(
        F.col("_key").alias(key_col),
        "n_points",
        F.expr("_fit[0]").alias("level"),
        F.expr("_fit[1]").alias("trend"),
        F.expr(season).alias("season"),
        F.expr(f"_fit[0] + {h} * _fit[1] + {season}").alias("forecast"),
    )


def holt_winters_oracle_sql(
    table: str,
    key_col: str,
    time_col: str,
    value_col: str,
    period: int = 24,
    alpha: str = "0.5",
    beta: str = "0.3",
    gamma: str = "0.3",
    horizon: int = 1,
    tiebreak_cols: list[str] | None = None,
    key_alias: str | None = None,
) -> str:
    """DuckDB twin of :func:`holt_winters_fit` — the same
    :func:`_hw_core` arithmetic over a ``list_reduce`` with the init state
    prepended as the first accumulator (1-based accessors)."""
    m = int(period)
    lvl, trd, ssn = _hw_core(
        alpha, beta, gamma,
        l="acc[1]", b="acc[2]",
        s_prev="acc[3 + CAST(e[2] AS INT)]", x="e[1]",
    )
    hundred = _D.format(100)
    zero = _D.format(0)
    h = _D.format(horizon)
    order = ", ".join([time_col, *(tiebreak_cols or [])])
    ka = key_alias or key_col
    return f"""
        WITH s AS (
            SELECT {key_col} AS k,
                   list_transform(
                     list(CAST(round({value_col} * 100) AS BIGINT)
                          ORDER BY {order}),
                     c -> CAST(c AS DOUBLE) / {hundred}) AS cs,
                   count(*) AS n_points
            FROM {table} WHERE {value_col} IS NOT NULL GROUP BY 1),
        i AS (
            SELECT k, cs, n_points,
                   list_reduce(list_concat([{zero}], cs[1:{m}]),
                               (acc, x) -> acc + x) / {_D.format(m)} AS l0
            FROM s),
        f AS (
            SELECT k, n_points,
                   list_reduce(
                     list_concat(
                       [list_concat([l0, {zero}],
                                    list_transform(cs[1:{m}], x -> x - l0))],
                       list_transform(
                         generate_series({m + 1}, len(cs)),
                         i -> [cs[i], CAST((i - 1) % {m} AS DOUBLE)])),
                     (acc, e) -> list_concat(
                       [{lvl}, {trd}],
                       list_transform(generate_series(0, {m - 1}),
                                      i -> CASE WHEN i = CAST(e[2] AS INT)
                                           THEN {ssn} ELSE acc[i + 3] END))
                   ) AS fit
            FROM i)
        SELECT k AS {ka}, CAST(n_points AS BIGINT) AS n_points,
               fit[1] AS level, fit[2] AS trend,
               fit[3 + CAST((n_points - 1 + {horizon}) % {m} AS INT)] AS season,
               fit[1] + {h} * fit[2]
                 + fit[3 + CAST((n_points - 1 + {horizon}) % {m} AS INT)]
                 AS forecast
        FROM f
    """


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
