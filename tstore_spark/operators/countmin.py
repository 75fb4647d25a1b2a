"""Count-min sketch — mergeable bounded-state frequency estimation.

Complements the HLL distinct sketch (sketches.py) on the frequency axis:
where exact token counting holds one counter per DISTINCT item (unbounded —
a web corpus has billions of distinct tokens/urls), a CMS holds a fixed
``d x w`` integer matrix per group with the classic guarantees
(Cormode & Muthukrishnan 2005):

* estimate(x) >= true_count(x)           — always (no deletions), and
* estimate(x) <= true_count(x) + eps*N   — w.h.p., eps ~ e/w.

Spark-first shape: the sketch IS a DataFrame of ``(keys..., cms_row,
cms_pos, cms_cnt)`` cells — at most ``d*w`` rows per group regardless of
corpus size. Updates are INTEGER SUMS into fixed cells, so the sketch is

* order-independent  — bit-identical at any parallelism (parcheck-style), and
* mergeable          — per-day sketches sum cell-wise into exactly the
                       sketch of the union (register-exact, not approximate
                       merge), the same cascade contract as the HLL/rollup
                       tiers.

The expensive half (one counter per distinct item) is collapsed BEFORE the
scatter: items are exact-counted first (two-stage hash aggregate with
map-side combine), then each DISTINCT item's total fans out to its ``d``
cells — the d-fold blow-up applies to distinct items, never to raw
occurrences.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_D = 4
DEFAULT_W = 8192

_CELL = ["cms_row", "cms_pos"]


def _cells(item_col, d: int, w: int):
    """Explode an item to its d (row, pos) cells; xxhash64(item, row) plays
    the d pairwise-independent hash functions (JVM-side, codegen)."""
    row = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("cms_row")
    pos = F.pmod(F.xxhash64(item_col, F.col("cms_row")), F.lit(w)).alias("cms_pos")
    return row, pos


def cms_from_counts(
    counts: DataFrame,
    item_col: str,
    count_col: str,
    keys: list[str] | None = None,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Sketch from a pre-aggregated (item, count) table (<= d*w rows/group)."""
    keys = keys or []
    staged = counts.select(
        *keys,
        F.col(item_col).alias("_item"),
        F.col(count_col).alias("_cnt"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("cms_row"),
    ).withColumn(
        "cms_pos", F.pmod(F.xxhash64(F.col("_item"), F.col("cms_row")), F.lit(w))
    )
    return staged.groupBy(*keys, *_CELL).agg(
        F.sum("_cnt").cast("long").alias("cms_cnt")
    )


def cms_from_items(
    df: DataFrame,
    item_col,
    keys: list[str] | None = None,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
) -> DataFrame:
    """Sketch from raw occurrences: exact-count first (map-side combine
    collapses each partition to its distinct items before the only
    shuffle), then scatter the distinct items' totals into cells."""
    keys = keys or []
    counts = df.groupBy(*keys, F.col(item_col).alias("_item")).agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return cms_from_counts(counts, "_item", "_cnt", keys=keys, d=d, w=w)


def cms_merge(parts: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Cell-wise sum of unioned sketch tables — exactly the sketch of the
    unioned inputs (integer sums commute; register-exact merge)."""
    return parts.groupBy(*(keys or []), *_CELL).agg(
        F.sum("cms_cnt").cast("long").alias("cms_cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    item_col: str,
    keys: list[str] | None = None,
    d: int = DEFAULT_D,
    w: int = DEFAULT_W,
    broadcast_sketch: bool = True,
) -> DataFrame:
    """min over the probe's d cells (absent cell = 0). The sketch side is
    broadcast by default — it is bounded by d*w rows per group — so the
    probe table never shuffles; pass broadcast_sketch=False when d*w*groups
    outgrows the broadcast budget."""
    keys = keys or []
    row, pos = _cells(F.col(item_col), d, w)
    p = probes.select(*keys, item_col, row).select(*keys, item_col, "cms_row", pos)
    s = F.broadcast(sketch) if broadcast_sketch else sketch
    j = p.join(s, [*keys, *_CELL], "left")
    return j.groupBy(*keys, item_col).agg(
        F.min(F.coalesce("cms_cnt", F.lit(0))).alias("cms_est")
    )
