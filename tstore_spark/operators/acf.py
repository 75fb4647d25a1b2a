"""Per-key autocorrelation function — "does this metric remember itself,
and at what period" (the lag-k ACF every seasonality / anomaly detector
starts from; statsmodels ``acf``, TimescaleDB gap-happy equivalents).

For each key's series x_1..x_n (ordered by time) and each lag ℓ ≤
``max_lag``::

    acf(ℓ) = Σ_{t=ℓ+1..n} (x_t − μ)(x_{t−ℓ} − μ)  /  Σ_t (x_t − μ)²

with μ the series mean — the standard biased-denominator estimator
(n·variance), so acf(0) ≡ 1 and |acf(ℓ)| ≤ 1 numerically.

Exactness discipline (the trend_fit pattern, CLAUDE.md):

* values enter as integer cents; every sufficient statistic — per (key,
  lag): pair count ``m``, Σx_t·x_{t−ℓ} (``sxy``), head/tail sums ``sh``/
  ``stl``; per key: ``n``, Σx (``s``), Σx² (``q``) — is an exact integer
  sum: order-independent, bit-identical at any parallelism, reproducible
  by any engine.
* ``acf`` itself is derived from those integers with ONE fixed double
  expression (expanding the centered products around μ = s/n)::

      num = sxy − (s/n)·(sh + stl) + m·(s/n)·(s/n)
      den = q − s·(s/n)
      acf = num / den            (NULL when den ≤ 0: constant series)

  Two engines evaluating the same expression over the same integers
  produce identical bits (IEEE ±,×,÷ are correctly rounded).

Plan shape: one window pass per key (the ℓ lag columns share ONE sort),
an explode of a cheap lag/value struct array (scalars — never an
expensive array COLUMN), one map-side-combined groupBy on (key, lag),
and a per-key window to spread the lag-0 totals (no join, no second
shuffle of the input). At 100 TB the input is a rolled-up TIER
(operators/metric_rollup.py), not raw events — per-key row counts are
minutes/hours-grain, the same headroom note as trend_fit.

A total order is REQUIRED for exactness: pass ``tiebreak_cols`` whenever
(key, time) is not unique (the sax_words rule), else lag pairing is
partition-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def acf(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    max_lag: int = 5,
    cents: bool = True,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Autocorrelation per key at lags 0..``max_lag``; see module
    docstring. Returns one row per (key, lag) with at least one pair:
    ``(key, lag int, m, sxy, sh, stl, n, s, q  — exact longs —, acf
    double)``. NULL values are skipped before pairing (the trend_fit
    convention: the ACF is over the observed sequence)."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    order = [F.col("_ts").asc()] + [F.col(c).asc() for c in (tiebreak_cols or [])]
    w = Window.partitionBy("key").orderBy(*order)
    v = F.col(value_col)
    v = F.round(v * 100).cast("long") if cents else v.cast("long")
    pts = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"), *[F.col(c) for c in (tiebreak_cols or [])],
        F.col(time_col).alias("_ts"), v.alias("_c"),
    )
    # windows first (generators can't host window expressions), all ℓ lag
    # columns sharing ONE sort; then explode the cheap scalar structs
    lagged = pts.select(
        "key",
        "_c",
        *[F.lag("_c", lag).over(w).alias(f"_l{lag}") for lag in range(0, max_lag + 1)],
    )
    entries = [
        F.struct(F.lit(lag).alias("lag"), F.col(f"_l{lag}").alias("_cl"))
        for lag in range(0, max_lag + 1)
    ]
    # lag 0 pairs _c with itself, so its aggregates ARE the per-key totals:
    # m=n, sxy=Σx², sh=stl=Σx — no separate totals pass
    pairs = (
        lagged.select("key", "_c", F.explode(F.array(*entries)).alias("_e"))
        .select("key", "_c", F.col("_e.lag").alias("lag"), F.col("_e._cl").alias("_cl"))
        .where(F.col("_cl").isNotNull())
    )
    agged = pairs.groupBy("key", "lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("_c") * F.col("_cl")).alias("sxy"),
        F.sum("_cl").alias("sh"),
        F.sum("_c").alias("stl"),
    )
    kw = Window.partitionBy("key")
    totals = agged.select(
        "*",
        F.max(F.when(F.col("lag") == 0, F.col("m"))).over(kw).alias("n"),
        F.max(F.when(F.col("lag") == 0, F.col("sh"))).over(kw).alias("s"),
        F.max(F.when(F.col("lag") == 0, F.col("sxy"))).over(kw).alias("q"),
    )
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    q = F.col("q").cast("double")
    m = F.col("m").cast("double")
    sxy = F.col("sxy").cast("double")
    sh = F.col("sh").cast("double")
    stl = F.col("stl").cast("double")
    num = sxy - (s / n) * (sh + stl) + m * (s / n) * (s / n)
    den = q - s * (s / n)
    return totals.select(
        "key",
        F.col("lag").cast("int").alias("lag"),
        "m", "sxy", "sh", "stl", "n", "s", "q",
        F.when(den > 0, num / den).otherwise(F.lit(None).cast("double")).alias("acf"),
    )


def acf_oracle_sql(
    pts_sql: str,
    max_lag: int = 5,
    order_sql: str = "ts",
) -> str:
    """DuckDB twin of :func:`acf`, generated from the same lag range so the
    two formulations cannot drift. ``pts_sql`` must yield (key, ts, c)
    rows (plus any tiebreak columns named by ``order_sql``) with ``c``
    already the exact integer (cents) and (key, ``order_sql``) a total
    order; HUGEINT sums cast back to BIGINT per the repo's oracle
    discipline. LAG requires a constant offset, so lags materialize as a
    generated UNION ALL — the same 0..max_lag list the Spark side
    explodes."""
    branches = " UNION ALL ".join(
        f"SELECT key, c, {lag} AS lag, "
        f"LAG(c, {lag}) OVER (PARTITION BY key ORDER BY {order_sql}) AS cl FROM pts"
        for lag in range(0, max_lag + 1)
    )
    return f"""
        WITH pts AS ({pts_sql}),
        pairs AS (SELECT * FROM ({branches}) WHERE cl IS NOT NULL),
        agged AS (
            SELECT key, lag,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(c * cl) AS BIGINT) AS sxy,
                   CAST(SUM(cl) AS BIGINT) AS sh,
                   CAST(SUM(c) AS BIGINT) AS stl
            FROM pairs GROUP BY key, lag),
        totals AS (
            SELECT *,
                   MAX(CASE WHEN lag = 0 THEN m END)
                       OVER (PARTITION BY key) AS n,
                   MAX(CASE WHEN lag = 0 THEN sh END)
                       OVER (PARTITION BY key) AS s,
                   MAX(CASE WHEN lag = 0 THEN sxy END)
                       OVER (PARTITION BY key) AS q
            FROM agged)
        SELECT key, CAST(lag AS INT) AS lag, m, sxy, sh, stl, n, s, q,
               CASE WHEN CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                          * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) > 0
               THEN (CAST(sxy AS DOUBLE)
                       - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(sh AS DOUBLE) + CAST(stl AS DOUBLE))
                       + CAST(m AS DOUBLE)
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                    / (CAST(q AS DOUBLE) - CAST(s AS DOUBLE)
                         * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
               END AS acf
        FROM totals
    """


def ccf(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    key_a,
    key_b,
    max_lag: int = 5,
    step_minutes: int = 1,
    cents: bool = True,
) -> DataFrame:
    """Dense cross-correlation sweep between two keys' series (statsmodels
    ``ccf``): Pearson r of (a(t), b(t + ℓ·step)) for EVERY ℓ in
    −max_lag..+max_lag, aligned by TIMESTAMP, not by row position.
    Positive ℓ with high r means ``key_a`` LEADS ``key_b`` by ℓ steps.

    Thin sweep front-end over :func:`seriescorr.lead_lag_correlation`
    (one implementation of the exact-integer Pearson core in the repo):
    the lag range expands to seconds, NULL values are dropped so the pair
    count ``m`` counts real pairs, and the output is re-keyed to the lag
    INDEX. Plan shape therefore matches lead_lag_correlation: explode of
    2·max_lag+1 scalar lags, one timestamp equi-join, one map-side-combined
    groupBy — no window, no global sort; sparse grids pair only where both
    sides exist."""
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    if step_minutes < 1:
        raise ValueError(f"step_minutes must be >= 1, got {step_minutes}")
    from tstore_spark.operators.seriescorr import lead_lag_correlation

    step_s = step_minutes * 60
    out = lead_lag_correlation(
        df.where(F.col(value_col).isNotNull()),
        key_col,
        time_col,
        value_col,
        key_a,
        key_b,
        [lag * step_s for lag in range(-max_lag, max_lag + 1)],
        cents=cents,
    )
    return out.select(
        (F.col("lag_seconds") / step_s).cast("int").alias("lag"),
        F.col("n").alias("m"),
        "sx", "sy", "sxy", "sxx", "syy", "r",
    )


def ccf_oracle_sql(
    pts_sql: str,
    key_a_sql: str,
    key_b_sql: str,
    max_lag: int = 5,
    step_minutes: int = 1,
) -> str:
    """DuckDB twin of :func:`ccf`, generated from the same lag range and
    step. ``pts_sql`` must yield (key, ts, c) with ``c`` the exact integer
    cents; ``key_a_sql``/``key_b_sql`` are SQL literals/expressions for the
    two keys. Interval arithmetic on TIMESTAMP (ntz) is plain wall-clock in
    both engines, and the r derivation replays seriescorr's integer-product
    formula (num and the two variance terms computed in BIGINT, cast to
    DOUBLE once) in the same op order — identical bits."""
    lags = ", ".join(f"({lag})" for lag in range(-max_lag, max_lag + 1))
    return f"""
        WITH pts AS ({pts_sql}),
        a AS (SELECT ts, c AS x FROM pts WHERE key = {key_a_sql}),
        b AS (SELECT ts, c AS y FROM pts WHERE key = {key_b_sql}),
        lags(lag) AS (VALUES {lags}),
        shifted AS (
            SELECT l.lag, b.ts - TO_MINUTES(l.lag * {step_minutes}) AS ts, b.y
            FROM b CROSS JOIN lags l),
        agged AS (
            SELECT s.lag,
                   CAST(COUNT(*) AS BIGINT) AS m,
                   CAST(SUM(a.x) AS BIGINT) AS sx,
                   CAST(SUM(s.y) AS BIGINT) AS sy,
                   CAST(SUM(a.x * s.y) AS BIGINT) AS sxy,
                   CAST(SUM(a.x * a.x) AS BIGINT) AS sxx,
                   CAST(SUM(s.y * s.y) AS BIGINT) AS syy
            FROM a JOIN shifted s ON a.ts = s.ts
            GROUP BY s.lag)
        SELECT CAST(lag AS INT) AS lag, m, sx, sy, sxy, sxx, syy,
               CASE WHEN sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                              * CAST(m * syy - sy * sy AS DOUBLE)) > 0
               THEN CAST(m * sxy - sx * sy AS DOUBLE)
                    / sqrt(CAST(m * sxx - sx * sx AS DOUBLE)
                           * CAST(m * syy - sy * sy AS DOUBLE))
               END AS r
        FROM agged
    """
