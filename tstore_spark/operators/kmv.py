"""KMV (k-minimum-values / bottom-k) distinct sketch with set operations.

The sketch family so far: HLL (distinct counts, union-mergeable),
DDSketch (quantiles), count-min (frequencies), Bloom (membership). None of
them can estimate the INTERSECTION of two sets — "how many users did both
A and B see", "what fraction of this crawl's urls were already in the
last one" — because HLL registers only merge by max (union). KMV closes
that gap (Bar-Yossef et al. 2002; Beyer et al., "On Synopses for
Distinct-Value Estimation Under Multiset Operations", SIGMOD 2007): keep
the k smallest ``xxhash64`` values of the set; the k-th smallest hash
estimates density (distinct ≈ (k-1)/u_k), and because bottom-k(A ∪ B) ==
bottom-k(bottom-k(A) ∪ bottom-k(B)), sketches merge EXACTLY, while the
overlap of two sketches inside their merged sketch estimates Jaccard.

Repo discipline (same as the HLL module):

- **Deterministic**: the state is a pure function of the value SET —
  a sorted array of the k smallest signed hashes (signed ascending ==
  unsigned ascending after the monotone +2^63 shift the estimator uses).
  Bit-identical at any parallelism, any insertion order.
- **Exact small-set regime**: fewer than k distinct hashes means the
  sketch IS the hash set — estimates (count, union, intersection) are
  exact, so tier boundaries can assert equality, not just tolerance.
- **Bounded state**: ≤ k longs per group, mergeable by a pure Catalyst
  expression (concat → array_distinct → array_sort → slice) — usable
  as-is in the streaming cascade's chained window aggs.

Scale shape: one (keys, hash) distinct, then the stratified_sample
prefilter (per-group count sets a hash cutoff admitting ~margin*k + 24
rows) so the per-group window sorts O(k) rows regardless of group size —
never a full per-group sort. A prefilter shortfall raises in-plan rather
than silently producing a biased sketch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_K = 256  # ~1/sqrt(k) ≈ 6% relative standard error

_TWO64 = float(2**64)


def _bottom_k(hashed: DataFrame, keys: list[str], k: int, prefilter_margin: float, out_col: str) -> DataFrame:
    """Bottom-k of the `_h` column per key group -> sorted array column."""
    counts = hashed.groupBy(*keys).agg(F.count(F.lit(1)).alias("_cnt"))
    u = (F.col("_h").cast("double") / F.lit(_TWO64)) + F.lit(0.5)
    staged = hashed.join(counts, keys).where(
        (F.col("_cnt") <= F.lit(k))
        | (u < (F.lit(float(prefilter_margin) * k) + F.lit(24.0)) / F.col("_cnt"))
    )
    w = Window.partitionBy(*keys).orderBy(F.col("_h").asc())
    picked = staged.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    got = picked.groupBy(*keys).agg(
        F.array_sort(F.collect_list("_h")).alias(out_col),
        F.max("_cnt").alias("_cnt"),
    )
    # in-plan shortfall guard riding the RETURNED sketch column (a dropped
    # helper column would be pruned away and never evaluate)
    short = F.size(out_col) < F.least(F.lit(k).cast("long"), F.col("_cnt")).cast("int")
    checked = F.when(
        short,
        F.array(
            F.raise_error(
                F.format_string(
                    "kmv_sketch prefilter shortfall (%d of %d hashes); "
                    "raise prefilter_margin",
                    F.size(out_col),
                    F.least(F.lit(k).cast("long"), F.col("_cnt")),
                )
            ).cast("long")
        ),
    ).otherwise(F.col(out_col))
    return got.select(*keys, checked.alias(out_col))


def kmv_sketch(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    k: int = DEFAULT_K,
    seed: int = 0,
    out_col: str = "kmv",
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Per-group KMV sketch of ``item_col``: ``keys + (out_col:
    array<long>)``, the sorted k smallest distinct signed xxhash64 values."""
    if k < 2:
        raise ValueError("k must be >= 2 (the estimator uses the k-th minimum)")
    hashed = df.select(
        *keys, F.xxhash64(F.col(item_col), F.lit(seed)).alias("_h")
    ).distinct()
    return _bottom_k(hashed, keys, k, prefilter_margin, out_col)


def kmv_merge(
    child: DataFrame,
    keys: list[str],
    k: int = DEFAULT_K,
    in_col: str = "kmv",
    out_col: str = "kmv",
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Merge many per-group sketches into one per key group — EXACT:
    bottom-k of a union equals bottom-k of the unioned bottom-k's, so
    merge(sketch(A), sketch(B)) == sketch(A ∪ B) bit-for-bit."""
    ex = child.select(*keys, F.explode(in_col).alias("_h")).distinct()
    return _bottom_k(ex, keys, k, prefilter_margin, out_col)


def kmv_merge_expr(a: Column | str, b: Column | str, k: int = DEFAULT_K) -> Column:
    """Two-sketch merge as a pure Catalyst expression (streaming-safe)."""
    a, b = F.col(a) if isinstance(a, str) else a, F.col(b) if isinstance(b, str) else b
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def kmv_estimate(col: Column | str, k: int = DEFAULT_K) -> Column:
    """Distinct-count estimate: exact size when the sketch is not full,
    else (k-1)/u_k with u_k the k-th smallest hash mapped to (0,1)."""
    c = F.col(col) if isinstance(col, str) else col
    u_k = (F.element_at(c, k).cast("double") / F.lit(_TWO64)) + F.lit(0.5)
    return F.when(F.size(c) < k, F.size(c).cast("double")).otherwise(
        F.lit(float(k - 1)) / u_k
    )


def kmv_intersection_estimate(
    a: Column | str, b: Column | str, k: int = DEFAULT_K
) -> Column:
    """|A ∩ B| estimate: the merged sketch X estimates |A ∪ B|; the
    fraction of X's hashes present in BOTH input sketches estimates
    Jaccard; their product estimates the intersection (Beyer et al. 2007).
    Exact whenever both sketches are below capacity."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    x = kmv_merge_expr(a, b, k)
    in_both = F.size(F.array_intersect(F.array_intersect(x, a), b))
    denom = F.least(F.lit(k), F.size(x))
    return F.when(
        denom > 0, in_both.cast("double") / denom.cast("double") * kmv_estimate(x, k)
    ).otherwise(F.lit(0.0))


def kmins_cells(
    df: DataFrame,
    keys: list[str],
    item_col: str,
    k: int = 64,
    seed: int = 0,
) -> DataFrame:
    """k-mins sketch as a CELL TABLE: ``keys + (kmins_bucket int, min_hash
    long)`` — the minimum signed xxhash64 within each of k hash-range
    buckets (one-permutation MinHash, Li et al. 2012).

    Why a second sketch shape next to :func:`kmv_sketch`: bottom-k is not a
    partial aggregate (a chained stateful stage cannot prune a hash until
    the window closes), but per-bucket ``min`` IS — so this is the form
    that chains through the streaming tier cascade unchanged
    (``stream_rollup.stream_rollup_cascade_kmins``), exactly as HLL
    registers chain by ``max``. State: ≤ k rows per group; merge =
    element-wise min — register-exact, order-independent, deterministic.
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    h = F.xxhash64(F.col(item_col), F.lit(seed))
    u = (h.cast("double") / F.lit(_TWO64)) + F.lit(0.5)
    bucket = F.floor(u * k).cast("int")
    return df.groupBy(*keys, bucket.alias("kmins_bucket")).agg(
        F.min(h).alias("min_hash")
    )


def kmins_estimate(cells: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate per key group from the cell table:
    stochastic averaging over the k bucket minima (Flajolet/k-mins) —
    each bucket's normalized min v_i estimates its sub-stream density,
    empty buckets contribute v_i = 1, and n̂ = k²/Σv − k."""
    u = (F.col("min_hash").cast("double") / F.lit(_TWO64)) + F.lit(0.5)
    v = (u - F.col("kmins_bucket").cast("double") / k) * k
    agg = cells.groupBy(*keys).agg(
        F.sum(v).alias("_sv"), F.count(F.lit(1)).alias("_nb")
    )
    total_v = F.col("_sv") + (F.lit(float(k)) - F.col("_nb"))  # empty buckets
    return agg.select(
        *keys, (F.lit(float(k * k)) / total_v - F.lit(float(k))).alias("distinct_est")
    )


def kmins_jaccard(
    cells_a: DataFrame, cells_b: DataFrame, keys: list[str], k: int = 64
) -> DataFrame:
    """Jaccard estimate per key group: the fraction of mutually non-empty
    buckets whose minima COLLIDE (the classic MinHash estimator, one
    permutation per bucket)."""
    a = cells_a.select(*keys, "kmins_bucket", F.col("min_hash").alias("_ma"))
    b = cells_b.select(*keys, "kmins_bucket", F.col("min_hash").alias("_mb"))
    j = a.join(b, [*keys, "kmins_bucket"])
    return j.groupBy(*keys).agg(
        (
            F.sum((F.col("_ma") == F.col("_mb")).cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("jaccard_est")
    )


def kmv_jaccard_estimate(a: Column | str, b: Column | str, k: int = DEFAULT_K) -> Column:
    """Jaccard similarity estimate of the two underlying sets."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    x = kmv_merge_expr(a, b, k)
    in_both = F.size(F.array_intersect(F.array_intersect(x, a), b))
    denom = F.least(F.lit(k), F.size(x))
    return F.when(denom > 0, in_both.cast("double") / denom.cast("double")).otherwise(
        F.lit(0.0)
    )


def kmv_difference_estimate(
    a: Column | str, b: Column | str, k: int = DEFAULT_K
) -> Column:
    """|A \\ B| estimate — churn, not overlap: the day-over-day "users we
    LOST" / "new docs only in this crawl" number. Same Beyer et al.
    machinery as the intersection: the merged sketch X estimates |A ∪ B|,
    the fraction of X's hashes in A but NOT in B estimates
    |A \\ B| / |A ∪ B|, and the product estimates the difference. Exact
    whenever both sketches are below capacity (then X = A ∪ B literally).
    Note A \\ B and B \\ A come from the same two sketches — sketch once,
    derive every set-algebra estimate."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    x = kmv_merge_expr(a, b, k)
    only_a = F.size(F.array_except(F.array_intersect(x, a), b))
    denom = F.least(F.lit(k), F.size(x))
    return F.when(
        denom > 0, only_a.cast("double") / denom.cast("double") * kmv_estimate(x, k)
    ).otherwise(F.lit(0.0))
