"""Z-order clustering — interleaved-bit multi-column layout for data skipping.

``compact_archive(cluster_by=[a, b])`` range-clusters LEXICOGRAPHICALLY:
file boundaries slice tightly on ``a``, but every file spans the full
range of ``b`` (unless ``a`` is near-constant per file), so zone-map
pruning (sources/zonemaps.py) only bites on the prefix column. Delta's
``OPTIMIZE ZORDER BY`` and Iceberg's z-order rewrite solve exactly this:
map each row to a point on the Z-space-filling curve — interleave the
bits of the (scaled) column values — and range-partition on that single
key. Nearby z-values are nearby in EVERY dimension, so each output file
covers a tight [min,max] tile of every clustered column at once, and a
range predicate on ANY of them prunes files.

Pieces (all deterministic — the z key is a pure per-row expression):

* ``column_bounds``      — one exact min/max aggregate per column (the only
  extra pass; order-independent, so bit-stable at any parallelism).
* ``with_zorder_key``    — scale each column to a ``bits``-wide integer
  grid cell with the classic ``floor((v - lo) / (hi - lo) * (2^bits - 1))``
  map, then interleave bits JVM-side: the key is a pure Catalyst
  expression (shift/and/or terms, whole-stage codegen), never a UDF.
  Timestamp columns ride through wall-clock NTZ epochs
  (functions/timeparts.ntz_epoch_micros) — session-TZ-proof.
* ``zorder_write``       — ``repartitionByRange`` on the z key +
  ``sortWithinPartitions`` so every output file is one contiguous z-range
  (Spark's range sampling moves file SPLIT POINTS only, never content).

Scale: the z key adds ~``bits * n_cols`` integer ALU ops per row inside
codegen — no shuffle beyond the single range-repartition the rewrite
needs anyway. Linear min/max scaling (not equi-depth quantiles) keeps the
key deterministic and sample-free; heavily skewed columns get coarser
effective grids at the dense end, which weakens (never breaks) pruning —
zone maps always re-check real file stats, so correctness is untouched.
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros

DEFAULT_BITS = 16
BOUNDS_FILE = "_zorder_bounds.json"


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric columns cast straight to double; timestamps via wall-clock
    NTZ epoch micros (a cast through the session zone would make the key
    TZ-dependent — the repo's timezone hard constraint)."""
    dtype = dict(df.dtypes)[col]
    if dtype.startswith("timestamp"):
        return ntz_epoch_micros(col).cast("double")
    return F.col(col).cast("double")


def column_bounds(df: DataFrame, cols: list[str]) -> dict[str, tuple[float, float]]:
    """Exact per-column (min, max) in the double domain the z key uses.
    One aggregate scan; min/max are order-independent so the resulting key
    is bit-identical at any parallelism."""
    aggs = []
    for c in cols:
        v = _as_double(df, c)
        aggs += [F.min(v).alias(f"{c}__lo"), F.max(v).alias(f"{c}__hi")]
    row = df.agg(*aggs).collect()[0]
    bounds = {}
    for c in cols:
        lo, hi = row[f"{c}__lo"], row[f"{c}__hi"]
        if lo is None:
            raise ValueError(f"z-order column {c!r} has no non-null values")
        bounds[c] = (float(lo), float(hi))
    return bounds


def _scaled_cell(v: Column, lo: float, hi: float, bits: int) -> Column:
    """``floor((v - lo) / (hi - lo) * (2^bits - 1))`` clamped to the grid;
    constant columns and NULLs land on cell 0 (NULLS FIRST, like Delta)."""
    top = (1 << bits) - 1
    if hi <= lo:
        return F.lit(0).cast("long")
    cell = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(top)))
    cell = F.least(F.greatest(cell, F.lit(0)), F.lit(top))
    return F.coalesce(cell, F.lit(0)).cast("long")


def zorder_key_expr(cells: list[Column], bits: int) -> Column:
    """Interleave ``bits`` bits from each of k grid cells into one long:
    bit i of column j lands at position ``i * k + j`` (column 0 = least
    significant — first column varies fastest, all columns equal weight)."""
    k = len(cells)
    if k * bits > 63:
        raise ValueError(f"{k} cols x {bits} bits = {k * bits} > 63 key bits")
    terms = [
        F.shiftleft(F.shiftright(cell, i).bitwiseAND(F.lit(1)), i * k + j)
        for i in range(bits)
        for j, cell in enumerate(cells)
    ]
    return reduce(Column.bitwiseOR, terms)


def with_zorder_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
    out_col: str = "_z",
) -> DataFrame:
    """Attach the interleaved z key as ``out_col``. ``bounds`` (from
    ``column_bounds``) may be precomputed — e.g. once per table, reused
    across incremental rewrites so old and new files share one grid."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use cluster_by for one")
    if bounds is None:
        bounds = column_bounds(df, cols)
    cells = [_scaled_cell(_as_double(df, c), *bounds[c], bits) for c in cols]
    return df.withColumn(out_col, zorder_key_expr(cells, bits))


def save_bounds(
    path: str, cols: list[str], bits: int, bounds: dict[str, tuple[float, float]]
) -> None:
    """Persist the z grid next to the layout (``_zorder_bounds.json``) so
    later incremental rewrites reuse ONE grid — old and new files then tile
    the same z space and their zone-map ranges stay comparable. Metadata
    only; zone maps re-check real file stats, so a stale grid can weaken
    pruning but never correctness."""
    with open(os.path.join(path, BOUNDS_FILE), "w") as f:
        json.dump({"cols": cols, "bits": bits, "bounds": bounds}, f, indent=1)


def load_bounds(path: str) -> dict | None:
    """The persisted grid from ``save_bounds`` (cols/bits/bounds), or None."""
    p = os.path.join(path, BOUNDS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        spec = json.load(f)
    spec["bounds"] = {c: tuple(v) for c, v in spec["bounds"].items()}
    return spec


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
) -> None:
    """One z-clustered Parquet rewrite: every output file is a contiguous
    z-range, i.e. a tight [min,max] tile of EVERY ``cols`` member — the
    layout ``zone_maps`` + ``prune_paths`` need for multi-column skipping.
    In-file rows are z-sorted too, so Parquet row-group stats nest the
    same way for free.

    The grid (cols/bits/bounds) is persisted via ``save_bounds``; pass
    ``bounds=load_bounds(path)["bounds"]`` on an incremental rewrite of a
    sibling partition to keep every file on one shared grid."""
    if bounds is None:
        bounds = column_bounds(df, cols)
    staged = with_zorder_key(df, cols, bits=bits, bounds=bounds)
    (
        staged.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    save_bounds(path, cols, bits, bounds)
