"""Kleinberg-style burst detection over windowed counts.

The webtext x timeseries signal the changepoint/CUSUM operators don't give
you: a GLOBALLY OPTIMAL two-state labeling of a count series into base vs
burst episodes. ``rolling_zscore`` flags single outlier windows,
``best_changepoint`` finds the one best level shift; Kleinberg's burst
automaton (Kleinberg, "Bursty and hierarchical structure in streams",
KDD 2002) instead charges a cost for EVERY window against a base rate or
an elevated rate plus a price for ENTERING burst, and takes the cheapest
state path — short noise spikes don't pay for the entry toll, sustained
elevations do. The canonical crawl/query-log question: which hours was
this term/domain genuinely bursting, as episodes rather than points.

Variant implemented (exactness first, the repo rule): Kleinberg's two
states and entry-toll transition structure, with his Poisson
log-likelihood emission cost replaced by an INTEGER quadratic cost

    e(t, s) = (n_t - r_s)^2 ,   r_0 = sum(n) div T ,  r_1 = mult*r_0 + 1

and toll ``gamma = gamma_factor * (r_1 - r_0)^2``. Log-likelihoods are
floats whose bits the repo's oracle discipline can't carry across engines
(ln() is implementation-defined IEEE; see the BM25 lesson); a quadratic
cost keeps every DP cell a 64-bit integer, so the optimal labeling is
bit-identical at any parallelism AND in the DuckDB twin.

Labeling semantics — min-plus forward/backward marginals, not backtrack:
with f/g the forward/backward Viterbi tables, window t is labeled burst
iff ``f_t(1)+g_t(1)-e(t,1) < f_t(0)+g_t(0)-e(t,0)`` (the cheapest path
CONSTRAINED through burst-at-t beats the cheapest through base-at-t;
ties -> base). When the optimum is unique this IS the Viterbi path; under
ties it is a deterministic per-window rule both engines compute
identically, where backtrack tie-breaking would be order-fragile.

Scale shape (100 TB): input must be a ROLLUP TIER (window-grain rows,
e.g. term x hour), never raw events — the forecast.py rule. The DP is
inherently sequential per key, so each key's windows collect to one Arrow
batch (``applyInPandas``; state = O(T) ints, a year of hours is 8 760
cells) and the kernel is a tight per-key integer loop — Python, but over
window-grain rows, the rollup-kernel budget. Keys parallelize freely;
``max_points`` guards runaway series, and the int64 envelope
``max_e * (T+1) + gamma < 2^62`` raises loudly instead of wrapping.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def burst_label(
    df: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    n_col: str = "n",
    burst_mult: int = 3,
    gamma_factor: int = 2,
    max_points: int = 1_000_000,
) -> DataFrame:
    """Label each (key, window) row 0=base / 1=burst by the optimal
    two-state path. Output: the three input columns (count cast to long)
    plus ``burst`` (long 0/1). Times must be unique per key (the rows ARE
    the per-key series; duplicates would make the sequence ambiguous —
    they raise). NULL counts are rejected for the same reason."""
    if burst_mult < 2:
        raise ValueError(f"burst_mult must be >= 2, got {burst_mult}")
    if gamma_factor < 1:
        raise ValueError(f"gamma_factor must be >= 1, got {gamma_factor}")
    fields = {f.name: f for f in df.schema.fields}
    schema = StructType(
        [
            fields[key_col],
            fields[time_col],
            StructField(n_col, LongType()),
            StructField("burst", LongType()),
        ]
    )
    mult, gf, cap = int(burst_mult), int(gamma_factor), int(max_points)

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort").reset_index(drop=True)
        t_n = len(pdf)
        if t_n > cap:
            raise ValueError(f"burst_label: series exceeds max_points={cap}")
        if pdf[time_col].duplicated().any():
            raise ValueError("burst_label: duplicate window per key (ambiguous order)")
        if pdf[n_col].isna().any():
            raise ValueError("burst_label: NULL count (gap-fill the grid first)")
        ns = [int(x) for x in pdf[n_col]]
        base = sum(ns) // t_n
        r1 = mult * base + 1
        gamma = gf * (r1 - base) ** 2
        e0 = [(x - base) ** 2 for x in ns]
        e1 = [(x - r1) ** 2 for x in ns]
        # int64 envelope for the SQL twin (Python ints never wrap; BIGINT would)
        if max(max(e0), max(e1)) * (t_n + 1) + gamma > 2**62:
            raise ValueError("burst_label: counts too large for the int64 DP envelope")
        f0, f1 = [0] * t_n, [0] * t_n
        f0[0], f1[0] = e0[0], e1[0] + gamma  # path starts in base before t=0
        for i in range(1, t_n):
            f0[i] = e0[i] + min(f0[i - 1], f1[i - 1])
            f1[i] = e1[i] + min(f0[i - 1] + gamma, f1[i - 1])
        g0, g1 = [0] * t_n, [0] * t_n
        g0[t_n - 1], g1[t_n - 1] = e0[t_n - 1], e1[t_n - 1]
        for i in range(t_n - 2, -1, -1):
            g0[i] = e0[i] + min(g0[i + 1], g1[i + 1] + gamma)
            g1[i] = e1[i] + min(g0[i + 1], g1[i + 1])
        burst = [
            1 if f1[i] + g1[i] - e1[i] < f0[i] + g0[i] - e0[i] else 0
            for i in range(t_n)
        ]
        out = pdf[[key_col, time_col]].copy()
        out[n_col] = pd.Series(ns, dtype="int64")
        out["burst"] = pd.Series(burst, dtype="int64")
        return out

    rows = df.select(key_col, time_col, F.col(n_col).cast("long").alias(n_col))
    return rows.groupBy(key_col).applyInPandas(_kernel, schema=schema)


def burst_intervals(
    labeled: DataFrame,
    key_col: str = "key",
    time_col: str = "ts",
    n_col: str = "n",
) -> DataFrame:
    """Collapse a :func:`burst_label` output into burst EPISODES: one row
    per maximal run of CONSECUTIVE burst=1 windows — ``(key, start, end,
    n_windows, total_n)``. Gaps-and-islands: rank every window of the key,
    rank the burst windows among themselves; the difference is constant
    exactly within a run (consecutive-by-position, type-agnostic over the
    time column). Two window functions over window-grain rows, no
    self-join."""
    from pyspark.sql import Window

    allw = Window.partitionBy(key_col).orderBy(time_col)
    pos = labeled.select(
        key_col, time_col, n_col, "burst", F.row_number().over(allw).alias("_pos")
    )
    w = Window.partitionBy(key_col).orderBy(time_col)
    isl = (
        pos.where(F.col("burst") == 1)
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_island", F.col("_pos") - F.col("_rn"))
    )
    return (
        isl.groupBy(key_col, "_island")
        .agg(
            F.min(time_col).alias("start"),
            F.max(time_col).alias("end"),
            F.count(F.lit(1)).alias("n_windows"),
            F.sum(n_col).alias("total_n"),
        )
        .drop("_island")
    )


def burst_oracle_sql(
    counts_sql: str,
    burst_mult: int = 3,
    gamma_factor: int = 2,
    key_alias: str = "key",
    time_alias: str = "t",
    n_alias: str = "n",
) -> str:
    """DuckDB twin of :func:`burst_label`, generated from the same
    constants: the identical integer DP as two recursive CTEs (forward
    from rn=1, backward from rn=T) joined into the same marginal rule.
    ``counts_sql`` must yield ``(key, t, n)`` with one row per window."""
    mult, gf = int(burst_mult), int(gamma_factor)
    return f"""
        WITH RECURSIVE counts AS MATERIALIZED ({counts_sql}),
        rates AS (
            SELECT key, COUNT(*) AS tt,
                   CAST(CAST(SUM(n) AS BIGINT) // COUNT(*) AS BIGINT) AS b
            FROM counts GROUP BY key),
        grid AS MATERIALIZED (
            SELECT c.key, c.t, CAST(c.n AS BIGINT) AS n,
                   CAST(row_number() OVER (PARTITION BY c.key ORDER BY c.t)
                        AS BIGINT) AS rn,
                   r.tt,
                   (c.n - r.b) * (c.n - r.b) AS e0,
                   (c.n - ({mult} * r.b + 1)) * (c.n - ({mult} * r.b + 1)) AS e1,
                   CAST({gf} AS BIGINT) * ({mult} * r.b + 1 - r.b)
                     * ({mult} * r.b + 1 - r.b) AS gam
            FROM counts c JOIN rates r USING (key)),
        fwd AS (
            SELECT key, rn, e0 AS f0, e1 + gam AS f1 FROM grid WHERE rn = 1
            UNION ALL
            SELECT g.key, g.rn,
                   g.e0 + LEAST(f.f0, f.f1) AS f0,
                   g.e1 + LEAST(f.f0 + g.gam, f.f1) AS f1
            FROM fwd f JOIN grid g ON g.key = f.key AND g.rn = f.rn + 1),
        bwd AS (
            SELECT key, rn, e0 AS g0, e1 AS g1 FROM grid WHERE rn = tt
            UNION ALL
            SELECT g.key, g.rn,
                   g.e0 + LEAST(b.g0, b.g1 + g.gam) AS g0,
                   g.e1 + LEAST(b.g0, b.g1) AS g1
            FROM bwd b JOIN grid g ON g.key = b.key AND g.rn = b.rn - 1)
        SELECT g.key AS {key_alias}, g.t AS {time_alias}, g.n AS {n_alias},
               CAST(CASE WHEN f.f1 + b.g1 - g.e1 < f.f0 + b.g0 - g.e0
                         THEN 1 ELSE 0 END AS BIGINT) AS burst
        FROM grid g
        JOIN fwd f ON f.key = g.key AND f.rn = g.rn
        JOIN bwd b ON b.key = g.key AND b.rn = g.rn
    """
