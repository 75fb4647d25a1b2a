"""Multi-dimensional grouping-set rollups — the OLAP cube over corpus
dimensions ("docs and bytes by lang × source × day, plus every margin")
computed in ONE pass instead of one scan per breakdown.

Spark plans cube/rollup/grouping-sets as a single Expand + hash aggregate:
each input row is replicated once per grouping set, then map-side partial
aggregation collapses the replicas before the (only) shuffle. That is
already one scan, but at 100 TB the Expand multiplies the aggregation
input by |sets| — so this operator PRE-AGGREGATES on the finest grain
first (one ordinary groupBy shuffle over distinct dim combos, typically
orders of magnitude smaller than the input) and runs the Expand over that
compact frame. The expand cost becomes |distinct combos| × |sets| rows —
independent of input size — at the price of requiring re-aggregable
measures (sum/count/min/max; count re-aggregates as the SUM of partial
counts).

Exactness: measures follow the integer discipline (counts, cent/byte
sums) so every margin is an exact integer at any parallelism; the
grouping-set id (``gid``) is Spark's ``grouping_id()`` bitmask — leftmost
dim = most significant bit, bit set ⇔ the dim is rolled up in that row —
which matches DuckDB's ``GROUPING(...)`` bit order, making whole-cube
results hash-comparable across engines. ``gid`` also disambiguates a
rolled-up dim (NULL, bit set) from a genuine NULL dim value (NULL, bit
clear), the classic cube-consumer trap.

Reference scope note: the reference engine (ltelab/tstore) has no
multi-dimensional margins; this is part of the grafted web-scale layer
(SURVEY §2b) feeding dashboards over the corpus tiers.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: re-aggregation functions usable over the finest-grain pre-aggregate
_REAGG = {"sum": F.sum, "min": F.min, "max": F.max}


def cube_rollup(
    df: DataFrame,
    dims: Sequence[str],
    measures: dict[str, Column],
    grouping: str | Sequence[Sequence[str]] = "cube",
    reagg: dict[str, str] | None = None,
    pre_aggregate: bool = True,
) -> DataFrame:
    """All requested grouping-set margins of ``measures`` over ``dims`` in
    one job: ``(dims..., gid, measures...)``.

    ``grouping`` is ``"cube"`` (every subset), ``"rollup"`` (prefix
    hierarchy), or an explicit list of grouping sets (each a list of dim
    names, e.g. ``[["lang", "source"], ["lang"], []]``).

    ``measures`` maps output name → aggregate expression over the RAW
    rows. With ``pre_aggregate`` (default, the scale path) each measure is
    re-aggregated across pre-aggregated cells with ``reagg[name]``
    (``"sum"`` default — correct for counts and sums; pass ``"min"`` /
    ``"max"`` for those). Measures that do not decompose (exact distincts,
    percentiles) need ``pre_aggregate=False`` — full Expand over the raw
    rows — or a mergeable sketch column instead.
    """
    dims = list(dims)
    if not dims:
        raise ValueError("cube_rollup needs at least one dim")
    if not measures:
        raise ValueError("cube_rollup needs at least one measure")
    bad = set(measures) & set(dims)
    if bad:
        raise ValueError(f"measure names collide with dims: {sorted(bad)}")
    reagg = dict(reagg or {})
    unknown = set(reagg) - set(measures)
    if unknown:
        raise ValueError(f"reagg names not in measures: {sorted(unknown)}")
    sets = grouping
    if isinstance(grouping, str):
        if grouping not in ("cube", "rollup"):
            raise ValueError(
                f"grouping must be 'cube', 'rollup' or explicit sets, got {grouping!r}"
            )
    else:
        sets = [list(s) for s in grouping]
        for s in sets:
            extra = set(s) - set(dims)
            if extra:
                raise ValueError(f"grouping set {s} has non-dim columns: {sorted(extra)}")

    if pre_aggregate:
        base = df.groupBy(*dims).agg(
            *[expr.alias(name) for name, expr in measures.items()]
        )
        aggs = [
            _reagg_fn(reagg.get(name, "sum"))(name).alias(name) for name in measures
        ]
    else:
        base = df
        aggs = [expr.alias(name) for name, expr in measures.items()]

    if sets == "cube":
        grouped = base.cube(*dims)
    elif sets == "rollup":
        grouped = base.rollup(*dims)
    else:
        grouped = base.groupingSets([[F.col(c) for c in s] for s in sets], *dims)
    out = grouped.agg(F.grouping_id().cast("int").alias("gid"), *aggs)
    return out.select(*dims, "gid", *measures)


def _reagg_fn(name: str):
    try:
        return _REAGG[name]
    except KeyError:
        raise ValueError(
            f"reagg must be one of {sorted(_REAGG)}, got {name!r}"
        ) from None


def cube_oracle_sql(
    src_sql: str,
    dims: Sequence[str],
    measure_sql: dict[str, str],
    grouping: str | Sequence[Sequence[str]] = "cube",
) -> str:
    """DuckDB twin of :func:`cube_rollup`, generated from the same dims and
    grouping spec. ``src_sql`` yields the raw rows; ``measure_sql`` maps
    each output name to its aggregate SQL (exact integers). DuckDB's
    ``GROUPING()`` bitmask uses the same leftmost-is-MSB order as Spark's
    ``grouping_id()``, so whole-cube outputs hash-match."""
    dims = list(dims)
    dim_list = ", ".join(dims)
    if isinstance(grouping, str):
        by = f"{grouping.upper()} ({dim_list})"
    else:
        sets = ", ".join("(" + ", ".join(s) + ")" for s in grouping)
        by = f"GROUPING SETS ({sets})"
    meas = ",\n               ".join(
        f"{expr} AS {name}" for name, expr in measure_sql.items()
    )
    return f"""
        SELECT {dim_list},
               CAST(GROUPING({dim_list}) AS INT) AS gid,
               {meas}
        FROM ({src_sql})
        GROUP BY {by}
    """


def windowed_topk(
    df: DataFrame,
    time_col: str,
    key_col: str,
    k: int,
    width: str = "1 hour",
    weight_cents=None,
) -> DataFrame:
    """Exact per-window leaders — "top k domains per hour by traffic", the
    dashboard companion to the rollup tiers (tiers aggregate; this
    ranks): ``(window_start, key, cnt, cents, rnk)`` for the k heaviest
    keys of every tumbling window, ranked by integer cents (ties: count
    desc, then key asc — a total order, so the cut is deterministic).

    ``width``: '1 hour', '1 day', or '1 minute' (wall-clock NTZ-safe
    date_trunc, cast back — the CLAUDE.md rule). ``weight_cents``
    defaults to row count ranking.

    Scale shape: one map-side-combined groupBy to (window, key) partials,
    then the rank filter directly above row_number plans as
    WindowGroupLimit — per-partition top-k heaps BEFORE the second
    shuffle, so the exchange carries at most k rows per window per map
    partition (the priority_sample_per_group mechanics, applied to the
    aggregate table)."""
    unit = {"1 minute": "minute", "1 hour": "hour", "1 day": "day"}.get(width)
    if unit is None:
        raise ValueError(f"width must be 1 minute/1 hour/1 day, got {width!r}")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.date_trunc(unit, F.col(time_col)).cast("timestamp_ntz")
    cents = (
        F.lit(1).cast("long")
        if weight_cents is None
        else (F.col(weight_cents) if isinstance(weight_cents, str) else weight_cents)
        .cast("long")
    )
    agg = df.groupBy(w.alias("window_start"), F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("cnt"), F.sum(cents).alias("cents")
    )
    from pyspark.sql import Window

    rnk = F.row_number().over(
        Window.partitionBy("window_start").orderBy(
            F.desc("cents"), F.desc("cnt"), F.asc("key")
        )
    )
    return agg.withColumn("rnk", rnk).where(F.col("rnk") <= k)
