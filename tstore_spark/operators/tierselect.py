"""Tiered range reads: answer [t0, t1) range aggregates from the MINIMAL
tile cover of the rollup tiers instead of re-scanning raw.

The continuous-aggregate tiers (operators/metric_rollup.py) carry mergeable
exact state (integer sums, id sets, value histograms — or HLL/DDSketch
registers), so any instant range that is minute-aligned can be answered
exactly by merging whole tiles: 1d tiles for the interior, 1h tiles at the
day edges, 1m tiles at the hour edges. This is the classic tiered-storage
read path (coarse interior + fine edges): a month-long dashboard range
touches ~30 day-rows + ≤46 hour-rows + ≤118 minute-rows per key, instead of
re-aggregating millions of raw events — and the tile predicates are plain
``window_start`` range comparisons, so partition/row-group pruning applies
to each tier scan.

Exactness: the greedy cover is a disjoint partition of [t0, t1), each event
lands in exactly one selected tile, and the merge is the same cascade kernel
the tiers were built with — so the result is bit-identical to aggregating
raw over the range (the gate query's oracle states exactly that).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.filters import check_start_end_time, time_range_filter

_STEP = {
    "1m": dt.timedelta(minutes=1),
    "1h": dt.timedelta(hours=1),
    "1d": dt.timedelta(days=1),
}


def _aligned(t: dt.datetime, tier: str) -> bool:
    if t.second or t.microsecond:
        return False
    if tier == "1m":
        return True
    if tier == "1h":
        return t.minute == 0
    return t.minute == 0 and t.hour == 0


def tile_cover(t0: dt.datetime, t1: dt.datetime) -> dict[str, list[tuple[dt.datetime, dt.datetime]]]:
    """Greedy minimal tile cover of [t0, t1) as contiguous half-open runs per
    tier: take the coarsest tile that starts here and fits. Driver-side and
    O(edge minutes + interior days) — bounded, never data-dependent."""
    runs: dict[str, list[list[dt.datetime]]] = {"1m": [], "1h": [], "1d": []}
    cur = t0
    while cur < t1:
        for tier in ("1d", "1h", "1m"):
            step = _STEP[tier]
            if _aligned(cur, tier) and cur + step <= t1:
                nxt = cur + step
                if runs[tier] and runs[tier][-1][1] == cur:
                    runs[tier][-1][1] = nxt  # extend the contiguous run
                else:
                    runs[tier].append([cur, nxt])
                cur = nxt
                break
        else:  # pragma: no cover — unreachable for minute-aligned bounds
            raise AssertionError(f"no tile fits at {cur}")
    return {k: [(a, b) for a, b in v] for k, v in runs.items()}


def range_aggregate(
    tiers: dict[str, DataFrame],
    start,
    end,
    key: str = "event_type",
) -> DataFrame:
    """One mergeable state row per key for the instant range [start, end).

    ``tiers`` is the dict from :func:`metric_rollup_all_tiers` (any state
    flavor — exact sets/histograms, HLL, DDSketch — merges with its own
    kernel via the cascade). Bounds must be minute-aligned (the finest tier);
    feed :func:`metric_rollup.finalize` to present. ``window_start`` on the
    output is the range start."""
    from tstore_spark.operators.metric_rollup import metric_rollup_cascade

    t0, t1 = check_start_end_time(start, end)
    if t0 is None or t1 is None:
        raise ValueError("start and end are both required")
    for t in (t0, t1):
        if not _aligned(t, "1m"):
            raise ValueError(f"range bounds must be minute-aligned, got {t}")
    if t0 == t1:
        raise ValueError("empty range")

    cover = tile_cover(t0, t1)
    picked: list[DataFrame] = []
    for tier, runs in cover.items():
        if not runs:
            continue
        df = tiers[tier]
        ntz = dict(df.dtypes).get("window_start") == "timestamp_ntz"
        pred = None
        for a, b in runs:
            p = time_range_filter("window_start", a, b, inclusive="left", ntz=ntz)
            pred = p if pred is None else (pred | p)
        picked.append(df.where(pred))

    tiles = picked[0]
    for p in picked[1:]:
        tiles = tiles.unionByName(p)

    # constant-window trick: collapsing window_start to the range start makes
    # the 1d cascade merge ALL selected tiles into one row per key with the
    # very kernel (histogram/set/sketch merge) the tiers were built with
    lit_start = F.lit(t0)
    if dict(tiles.dtypes).get("window_start") == "timestamp_ntz":
        lit_start = F.to_timestamp_ntz(F.lit(t0.strftime("%Y-%m-%d %H:%M:%S.%f")))
    collapsed = tiles.withColumn("window_start", lit_start)
    merged = metric_rollup_cascade(collapsed, "1d", key)
    return merged.withColumn("window_start", lit_start)
