"""Explicit skew handling: salted two-stage aggregation + salted repartition.

The north rule demands explicit hot-domain skew handling (Zipf-skewed domains
mean one domain can carry ~30% of all rows — a single reducer at 100 TB).
AQE skew-join splitting is enabled as backstop (session.py), but the rollup
groupBy needs the classic two-stage pattern:

  stage 1: groupBy(key, salt)  — the hot key spreads over S reducers
  stage 2: groupBy(key)        — merges S partials (tiny)

The salt is derived deterministically from a uniformizing column (xxhash64 of
the time column) — never from random(), so results are reproducible and
partial-agg content does not depend on scheduling.

For exact-state rollups (histograms, lang sets) the two-stage shape is already
built into rollup.py (the (key, window, len) pre-aggregation is itself a
salt); this module provides the generic helper for simple metric aggs and the
salted repartition used before archive writes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def salt_column(uniformizer: str | Column, num_salts: int) -> Column:
    c = F.col(uniformizer) if isinstance(uniformizer, str) else uniformizer
    return F.pmod(F.xxhash64(c), F.lit(num_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple],
    uniformizer: str,
    num_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for re-aggregatable metrics.

    aggs: output_name -> (partial_fn, merge_fn, input_col), e.g.
      {"doc_count": (F.count, F.sum, F.lit(1)),
       "bytes_total": (F.sum, F.sum, "bytes")}
    """
    salted = df.withColumn("_salt", salt_column(uniformizer, num_salts))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[p(c).alias(name) for name, (p, _, c) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m(name).alias(name) for name, (_, m, _) in aggs.items()]
    )


def salted_repartition(
    df: DataFrame,
    keys: list[str],
    uniformizer: str,
    num_salts: int = 16,
    num_partitions: int | None = None,
) -> DataFrame:
    """Repartition on (keys..., salt) so a hot key's rows spread over
    num_salts tasks — used before per-partition writes of skewed data.

    Without ``num_partitions`` the shuffle is advisory and AQE may coalesce
    small outputs (fine at scale, where partitions are large); pass an
    explicit count to pin the layout (e.g. for bucketed writes)."""
    cols = [F.col(k) for k in keys] + [salt_column(uniformizer, num_salts)]
    if num_partitions is not None:
        return df.repartition(num_partitions, *cols)
    return df.repartition(*cols)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    uniformizer: str,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-proof equi-join: the classic salt-replication trick for a hot
    join key that AQE's skew split can't always reach (e.g. when the
    skewed side feeds from an already-aggregated exchange).

    The FACT side gets a deterministic salt (hash of ``uniformizer``, a
    row-unique or near-unique column — never Spark's ``rand()``, which is
    layout-dependent and breaks retry idempotence); the DIM side is
    replicated ``num_salts``× via one ``explode(sequence(...))``. Joining
    on ``on + [salt]`` spreads each hot key over ``num_salts`` reducers;
    the result is row-for-row IDENTICAL to the plain join (the gate
    hash-checks exactly that). Replication costs ``num_salts × |dim|``
    shuffle rows — the regime between "small enough to broadcast" and
    "both sides huge" where skew actually bites.

    ``how``: ``inner`` or ``left`` only. Each fact row carries exactly ONE
    salt, so fact-side semantics are unchanged; ``right``/``full`` would
    emit one unmatched copy PER SALT of a dim row and are refused.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left' only")
    if num_salts <= 0:
        raise ValueError("num_salts must be positive")
    f = fact.withColumn("__salt", salt_column(uniformizer, num_salts))
    d = dim.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(int(num_salts) - 1))),
    )
    return f.join(d, on + ["__salt"], how).drop("__salt")


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_n: int = 20,
) -> DataFrame:
    """Diagnose key skew BEFORE a shuffle melts on it: the top-N heaviest
    keys with exact counts, share of total, and the whole-table skew ratio
    (max key count / mean key count — 1.0 means uniform; a Zipf-1.2 domain
    column lands in the tens).

    Everything is exact integer counts; shares/ratio are single fixed-order
    divisions of those integers, so the output is engine-identical (the
    oracle discipline) and bit-identical at any parallelism. Cost: one
    map-side-combined groupBy over the key plus two 1-row aggregates —
    the cheap probe you run before choosing ``salted_agg``'s salt count
    (rule of thumb: num_salts >= skew_ratio keeps the hottest reducer near
    the mean).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("key_count")
    )
    totals = counts.agg(
        F.sum("key_count").alias("_total"),
        F.count(F.lit(1)).alias("_n_keys"),
        F.max("key_count").alias("_max"),
    )
    # top-N via orderBy().limit() — plans as a distributed TakeOrdered, not
    # a global row_number window (which would sort EVERY key's count in one
    # task: the exact hot-reducer shape this probe exists to diagnose). The
    # rank window then runs over <= top_n rows, which is harmless.
    top = counts.orderBy(F.desc("key_count"), F.asc("key")).limit(top_n)
    w = Window.orderBy(F.desc("key_count"), F.asc("key"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(totals)
        .select(
            "key",
            "key_count",
            F.col("rank").cast("int").alias("rank"),
            (F.col("key_count") / F.col("_total")).alias("share"),
            (F.col("_max") * F.col("_n_keys") / F.col("_total")).alias("skew_ratio"),
        )
    )
