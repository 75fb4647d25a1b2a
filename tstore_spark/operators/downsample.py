"""Visual downsampling of per-key value series: parallel fixed-anchor LTTB.

The reference archives full-resolution series and the rollup tiers give
calendar-window aggregates; what neither provides is a SHAPE-preserving
downsample — "give me ~500 points that still look like this year of data" —
the job LTTB (Steinarsson, "Downsampling Time Series for Visual
Representation", 2013) was designed for.

Classic LTTB is inherently sequential: each bucket's pick depends on the
previously *selected* point. This module implements the standard parallel
variant (fixed anchors): every interior bucket picks the point maximizing
the triangle area against its NEIGHBOR BUCKETS' anchor points, where the
anchor is the bucket's mid-rank point. That decouples all buckets, so the
whole computation is window functions + one bucket-stats groupBy + one
equi-join — no Python, no sequential scan, and (because anchors are chosen
by integer rank, not by averaging floats) results are bit-identical at any
parallelism, which an order-dependent double mean could not guarantee.

Scale notes (100 TB): work is proportional to the input points; shuffles
are (a) the per-key rank window and (b) the bucket join — both keyed on
(key[, bucket]), skew-bounded by the largest single series, the same
documented constraint as the as-of join (split hot keys by time bucket
upstream if one series outgrows a task). The anchor/bucket-stats tables
have target_points rows per key — negligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros


def lttb_downsample(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    target_points: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Downsample each key's (time, value) series to ``target_points``
    shape-preserving points (first and last always kept). Series with at
    most ``target_points`` rows pass through untouched.

    ``tiebreak_col`` orders points that share a timestamp (and breaks exact
    area ties) — required for determinism when timestamps can repeat.
    Returns the selected input rows: (key_col, time_col, value_col).
    """
    if target_points < 3:
        raise ValueError("target_points must be >= 3 (endpoints + 1 interior)")

    m = target_points
    t = ntz_epoch_micros(time_col).cast("double")
    order = [F.col(time_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    wk = Window.partitionBy(key_col).orderBy(*order)
    wk_all = wk.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    pts = df.select(
        key_col,
        time_col,
        F.col(value_col).cast("double").alias(value_col),
        t.alias("_t"),
        F.row_number().over(wk).alias("_rank"),
        F.count(F.lit(1)).over(wk_all).alias("_n"),
    )

    small = pts.where(F.col("_n") <= m)

    big = pts.where(F.col("_n") > m)
    # interior ranks 2..n-1 spread over buckets 0..m-3 by exact integer
    # division — every bucket non-empty when n > m, same formula the oracle
    # runs, so bucket boundaries are bit-identical across engines
    interior = big.where((F.col("_rank") > 1) & (F.col("_rank") < F.col("_n"))).withColumn(
        "_bkt", F.expr(f"(_rank - 2) * {m - 2} div (_n - 2)")
    )
    endpoints = big.where((F.col("_rank") == 1) | (F.col("_rank") == F.col("_n")))

    # anchor of a bucket = its mid-rank point (integer choice, never a
    # float mean: a double mean's bits would depend on aggregation order)
    wb = Window.partitionBy(key_col, "_bkt").orderBy("_rank")
    wb_all = wb.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    anchors = (
        interior.select(
            key_col,
            "_bkt",
            "_t",
            value_col,
            F.row_number().over(wb).alias("_rn"),
            F.count(F.lit(1)).over(wb_all).alias("_cnt"),
        )
        .where(F.col("_rn") == F.expr("(_cnt + 1) div 2"))
        .select(key_col, "_bkt", F.col("_t").alias("_at"), F.col(value_col).alias("_av"))
    )
    # pseudo-anchors so bucket 0 sees the series head and the last interior
    # bucket sees the series tail (classic LTTB endpoint handling)
    head = endpoints.where(F.col("_rank") == 1).select(
        key_col, F.lit(-1).alias("_bkt"), F.col("_t").alias("_at"), F.col(value_col).alias("_av")
    )
    tail = endpoints.where(F.col("_rank") == F.col("_n")).select(
        key_col, F.lit(m - 2).alias("_bkt"), F.col("_t").alias("_at"), F.col(value_col).alias("_av")
    )

    wa = Window.partitionBy(key_col).orderBy("_bkt")
    neigh = (
        anchors.unionByName(head)
        .unionByName(tail)
        .select(
            key_col,
            "_bkt",
            F.lag("_at").over(wa).alias("_pt"),
            F.lag("_av").over(wa).alias("_pv"),
            F.lead("_at").over(wa).alias("_nt"),
            F.lead("_av").over(wa).alias("_nv"),
        )
        .where((F.col("_bkt") >= 0) & (F.col("_bkt") <= m - 3))
    )

    # twice the triangle area — the /2 is rank-invariant, dropping it keeps
    # the expression identical to the oracle's
    area = F.abs(
        (F.col("_pt") - F.col("_nt")) * (F.col(value_col) - F.col("_pv"))
        - (F.col("_pt") - F.col("_t")) * (F.col("_nv") - F.col("_pv"))
    )
    ws = Window.partitionBy(key_col, "_bkt").orderBy(F.col("_area").desc(), F.col("_rank"))
    picked = (
        interior.join(neigh, [key_col, "_bkt"])
        .withColumn("_area", area)
        .withColumn("_sel", F.row_number().over(ws))
        .where(F.col("_sel") == 1)
    )

    out = [key_col, time_col, value_col]
    return small.select(*out).unionByName(endpoints.select(*out)).unionByName(picked.select(*out))


def heatmap_downsample(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    t_buckets: int,
    v_buckets: int,
) -> DataFrame:
    """Density heatmap: exact point counts on a ``t_buckets`` x
    ``v_buckets`` pixel grid per key — the standard render when series
    count or point density makes line charts unreadable (M4's own paper
    positions density tiles as the line chart's high-cardinality sibling).

    Same execution shape and exactness discipline as :func:`m4_downsample`:
    ONE map-side-combined groupBy over two pure-Catalyst integer bucket
    ids — no window, no join, no Python. Time buckets use exact integer
    micros math; value buckets use exact integer CENTS (``round(v*100)``),
    so cell assignment is integer arithmetic end-to-end and counts are
    bit-identical at any parallelism and engine-reproducible. Bucket
    domains are GLOBAL (the data's own [min, max], one tiny agg action) so
    tiles align across keys. NULL values are skipped. Cell edges ``t_start``
    / ``v_lo`` are derived from the same integers (inclusive lower edges;
    the max point lands in the last bucket via the span+1 trick).

    Output: (key, t_bucket, v_bucket, t_start, v_lo, n_points).
    """
    if t_buckets < 1 or v_buckets < 1:
        raise ValueError("t_buckets and v_buckets must be >= 1")
    from tstore_spark.functions.timeparts import ntz_from_epoch_micros

    pts = df.where(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        ntz_epoch_micros(time_col).alias("_e"),
        F.round(F.col(value_col) * 100).cast("long").alias("_c"),
    )
    row = pts.agg(F.min("_e"), F.max("_e"), F.min("_c"), F.max("_c")).head()
    t_lo, t_hi = (0, 0) if row[0] is None else (int(row[0]), int(row[1]))
    v_lo, v_hi = (0, 0) if row[2] is None else (int(row[2]), int(row[3]))
    t_span, v_span = t_hi - t_lo + 1, v_hi - v_lo + 1
    cells = pts.groupBy(
        "key",
        F.expr(f"((_e - {t_lo}) * {t_buckets}) div {t_span}").alias("t_bucket"),
        F.expr(f"((_c - {v_lo}) * {v_buckets}) div {v_span}").alias("v_bucket"),
    ).agg(F.count(F.lit(1)).alias("n_points"))
    # inclusive lower edge = the FIRST epoch that lands in the bucket: ceil
    # (floor can emit a label that belongs to the previous bucket); positive
    # operands make (x + n - 1) div n identical in Spark (trunc) and SQL (floor)
    t_start = F.lit(t_lo) + F.expr(f"(t_bucket * {t_span} + {t_buckets - 1}) div {t_buckets}")
    v_edge = (F.lit(v_lo) + F.expr(f"(v_bucket * {v_span} + {v_buckets - 1}) div {v_buckets}")).cast(
        "double"
    ) / F.lit(100.0)
    return cells.select(
        "key",
        "t_bucket",
        "v_bucket",
        ntz_from_epoch_micros(t_start).alias("t_start"),
        v_edge.alias("v_lo"),
        "n_points",
    )


def m4_downsample(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    n_buckets: int,
    t_range: tuple | None = None,
) -> DataFrame:
    """M4 visual aggregation (Jugel et al., "M4: A Visualization-Oriented
    Time Series Data Aggregation", VLDB 2014): split the chart's time domain
    into ``n_buckets`` pixel-column buckets and keep, per (key, bucket), the
    four extremal values — first/last by time plus min/max — which is exactly
    the point set an anti-aliased line render needs. Complements LTTB: M4 is
    error-free for line charts at one row per pixel column x key, LTTB is
    shape-preserving at arbitrary budgets.

    Spark shape: ONE map-side-combinable groupBy over a pure-Catalyst integer
    bucket id — no windows, no join, no Python; at 100 TB this is the same
    plan as the rollup tiers. Every output is a SELECTION of an input value
    (never arithmetic over floats): first/last ride min/max over a
    (epoch_micros, value) struct — lexicographic, so duplicate timestamps
    tie-break on value deterministically — making results bit-identical at
    any parallelism and engine-reproducible for the oracle. Bucket bounds
    use exact integer micros arithmetic (``div``); ``t_range=(lo, hi)``
    timestamps clip the domain (rows outside are dropped, like a chart
    viewport), default = the data's own [min, max]. NULL values are ignored
    (a line chart has nothing to draw).

    Output: (key, bucket, bucket_start, t_first, v_first, v_min, v_max,
    t_last, v_last, n_points) with NTZ times.
    """
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    from tstore_spark.functions.timeparts import ntz_from_epoch_micros

    e = ntz_epoch_micros(time_col)
    pts = df.where(F.col(value_col).isNotNull()).withColumn("_e", e)
    if t_range is not None:
        import pandas as pd

        lo = int(pd.Timestamp(t_range[0]).value // 1000)
        hi = int(pd.Timestamp(t_range[1]).value // 1000)
        if hi < lo:
            raise ValueError(f"t_range start {t_range[0]} is after end {t_range[1]}")
    else:
        row = pts.agg(F.min("_e"), F.max("_e")).head()
        # all-null/empty input: any bounds work — the filtered plan below
        # yields zero rows with the correct schema (key type preserved)
        lo, hi = (0, 0) if row[0] is None else (int(row[0]), int(row[1]))
    span = hi - lo + 1  # +1 keeps e == hi inside the last bucket
    pts = pts.where((F.col("_e") >= lo) & (F.col("_e") <= hi)).withColumn(
        "_b", F.expr(f"(( _e - {lo} ) * {n_buckets}) div {span}")
    )
    v = F.col(value_col).cast("double")
    agg = pts.groupBy(F.col(key_col), F.col("_b").alias("bucket")).agg(
        F.min(F.struct(F.col("_e"), v.alias("v"))).alias("_f"),
        F.max(F.struct(F.col("_e"), v.alias("v"))).alias("_l"),
        F.min(v).alias("v_min"),
        F.max(v).alias("v_max"),
        F.count(F.lit(1)).alias("n_points"),
    )
    # ceil, not floor: the label must be the first epoch INSIDE the bucket
    bucket_start = F.lit(lo) + F.expr(f"(bucket * {span} + {n_buckets - 1}) div {n_buckets}")
    return agg.select(
        key_col,
        "bucket",
        ntz_from_epoch_micros(bucket_start).alias("bucket_start"),
        ntz_from_epoch_micros(F.col("_f._e")).alias("t_first"),
        F.col("_f.v").alias("v_first"),
        "v_min",
        "v_max",
        ntz_from_epoch_micros(F.col("_l._e")).alias("t_last"),
        F.col("_l.v").alias("v_last"),
        "n_points",
    )


def swinging_door(
    df: DataFrame,
    key_col: str,
    time_col: str,
    cents_col,
    epsilon_cents: int,
) -> DataFrame:
    """Error-bounded lossy compression (swinging-door-trending family,
    the PI-historian algorithm; greedy corridor PLA variant): per key,
    keep the minimal greedy subset of ORIGINAL points such that linear
    interpolation between consecutive kept points deviates from every
    dropped point by at most ``epsilon_cents`` — guaranteed by
    construction, because a segment is only extended while the line to
    its candidate endpoint stays inside the intersection of every
    intermediate point's ±ε slope corridor.

    This completes the repo's tiering menu: Gorilla (lossless bits), SDT
    (lossy with a hard error bound), LTTB (visual shape), M4 (pixel
    min/max), SAX (symbolic). Values are integer cents (the oracle
    discipline; pass e.g. ``F.round(F.col("v")*100).cast("long")``) and
    corridor comparisons run in EXACT rational arithmetic (Python-int
    cross-multiplication — no float slope can mis-accept a borderline
    segment), so output is bit-identical at any parallelism.

    Output: the kept rows ``(key, ts, cents, pt_index)`` (pt_index =
    0-based rank of the point in its key's series; first and last always
    kept). Scale: one shuffle on the key + a sequential per-key kernel
    (``applyInPandas``), the gorilla codec's documented shape — a key's
    series must fit a task.
    """
    import pandas as pd

    from tstore_spark.functions.timeparts import ntz_epoch_micros

    if epsilon_cents < 0:
        raise ValueError(f"epsilon_cents must be >= 0, got {epsilon_cents}")
    eps = int(epsilon_cents)
    c = cents_col if not isinstance(cents_col, str) else F.col(cents_col)
    prepped = df.select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        ntz_epoch_micros(time_col).alias("_t"),
        c.cast("long").alias("cents"),
    )

    def _compress(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_t", "cents"]).reset_index(drop=True)
        t = [int(x) for x in pdf["_t"]]
        v = [int(x) for x in pdf["cents"]]
        n = len(t)
        if n <= 2:
            keep = list(range(n))
        else:
            keep = [0]
            a = 0
            # corridor = intersection of ±eps slope constraints, kept as
            # exact rationals (num, den), den > 0
            up_n, up_d = None, None  # min upper slope
            dn_n, dn_d = None, None  # max lower slope
            for i in range(1, n):
                dt = t[i] - t[a]
                if dt == 0:
                    # duplicate timestamp on the anchor: must keep (no
                    # line can represent two values at one instant)
                    keep.append(i)
                    a = i
                    up_n = dn_n = None
                    continue
                sn, sd = v[i] - v[a], dt  # candidate line slope
                ok = True
                if up_n is not None and sn * up_d > up_n * sd:
                    ok = False
                if ok and dn_n is not None and sn * dn_d < dn_n * sd:
                    ok = False
                if not ok:
                    # close the segment at the previous point, restart
                    keep.append(i - 1)
                    a = i - 1
                    dt = t[i] - t[a]
                    if dt == 0:
                        keep.append(i)
                        a = i
                        up_n = dn_n = None
                        continue
                    up_n, up_d = v[i] + eps - v[a], dt
                    dn_n, dn_d = v[i] - eps - v[a], dt
                    continue
                # accept i; tighten the corridor with i's own constraint
                cu_n, cu_d = v[i] + eps - v[a], dt
                cd_n, cd_d = v[i] - eps - v[a], dt
                if up_n is None or cu_n * up_d < up_n * cu_d:
                    up_n, up_d = cu_n, cu_d
                if dn_n is None or cd_n * dn_d > dn_n * cd_d:
                    dn_n, dn_d = cd_n, cd_d
            if keep[-1] != n - 1:
                keep.append(n - 1)
        out = pdf.iloc[sorted(set(keep))][["key", "ts", "cents"]].copy()
        out["pt_index"] = sorted(set(keep))
        return out

    schema = "key string, ts timestamp_ntz, cents long, pt_index long"
    kt = dict(prepped.dtypes)
    schema = schema.replace("key string", f"key {kt['key']}").replace(
        "ts timestamp_ntz", f"ts {kt['ts']}"
    )
    return prepped.groupBy("key").applyInPandas(_compress, schema=schema)


def sdt_bound_check(
    raw: DataFrame,
    kept: DataFrame,
    epsilon_cents: int,
) -> DataFrame:
    """EXACT reconstruction-error audit of a :func:`swinging_door` result:
    per key, ``(key, n_raw, n_kept, within_bound)`` where within_bound
    verifies ``|interp(t) − v(t)| <= ε`` for every raw point via integer
    cross-multiplication (cents × micros — no float interpolation can
    blur the boundary). ``raw``/``kept`` carry (key, ts, cents) columns.

    Linear, never the per-key raw×segments join (measured 59 s at sf0.1
    minute grain — quadratic in series length): kept and raw rows UNION
    into one key-ordered stream, a forward running ``last`` brackets each
    raw point with its preceding kept point and a reverse pass with its
    following one — two window passes over n_raw + n_kept rows, one
    shuffle. Assumes strictly increasing timestamps per key (aggregated
    series; duplicate-timestamp behavior is covered at the operator
    level, where both duplicates are always kept)."""
    from pyspark.sql import Window

    from tstore_spark.functions.timeparts import ntz_epoch_micros

    k = kept.select(
        "key",
        ntz_epoch_micros("ts").alias("t"),
        F.col("cents").alias("v"),
        F.lit(1).alias("is_k"),
    )
    r = raw.select(
        "key",
        ntz_epoch_micros("ts").alias("t"),
        F.col("cents").alias("v"),
        F.lit(0).alias("is_k"),
    )
    u = r.unionByName(k)
    kt = F.when(F.col("is_k") == 1, F.col("t"))
    kv = F.when(F.col("is_k") == 1, F.col("v"))
    asc = Window.partitionBy("key").orderBy("t", F.col("is_k").desc())
    dsc = Window.partitionBy("key").orderBy(F.col("t").desc(), F.col("is_k").desc())
    run_a = asc.rowsBetween(Window.unboundedPreceding, 0)
    run_d = dsc.rowsBetween(Window.unboundedPreceding, 0)
    b = (
        u.withColumn("t1", F.last(kt, ignorenulls=True).over(run_a))
        .withColumn("v1", F.last(kv, ignorenulls=True).over(run_a))
        .withColumn("t2", F.last(kt, ignorenulls=True).over(run_d))
        .withColumn("v2", F.last(kv, ignorenulls=True).over(run_d))
    )
    checks = b.where(F.col("is_k") == 0)
    # |(v - v1)(t2 - t1) - (v2 - v1)(t - t1)| <= eps (t2 - t1), all longs;
    # a raw point that coincides with a kept point yields lhs = 0
    lhs = F.abs(
        (F.col("v") - F.col("v1")) * (F.col("t2") - F.col("t1"))
        - (F.col("v2") - F.col("v1")) * (F.col("t") - F.col("t1"))
    )
    # A safety audit must fail LOUDLY on malformed input: a raw point with a
    # missing bracket endpoint (NULL t1/t2 — no kept point on that side)
    # verdicts FALSE, never NULL-skipped; a key with zero kept rows stays in
    # the output with n_kept=0 / within_bound=FALSE instead of vanishing
    # through an inner join.
    ok = F.coalesce(
        lhs <= F.lit(int(epsilon_cents)) * (F.col("t2") - F.col("t1")),
        F.lit(False),
    )
    per_key = checks.groupBy("key").agg(F.min(ok.cast("int")).alias("_allok"))
    counts = r.groupBy("key").agg(F.count(F.lit(1)).alias("n_raw")).join(
        kept.groupBy("key").agg(F.count(F.lit(1)).alias("n_kept")),
        "key",
        "left",
    )
    return counts.join(per_key, "key", "left").select(
        "key",
        "n_raw",
        F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        (
            (F.coalesce(F.col("n_kept"), F.lit(0)) > 0)
            & F.coalesce(F.col("_allok") == 1, F.lit(False))
        ).alias("within_bound"),
    )
