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
needs anyway. Two grid flavors, both deterministic:

* **linear** (default): min/max scaling — one cheap aggregate, sample-free.
  Heavily skewed columns get coarser effective grids at the dense end,
  which weakens (never breaks) pruning — zone maps always re-check real
  file stats, so correctness is untouched.
* **equi-depth** (``equi_depth_cuts`` / ``zorder_write(equi_depth=True)``):
  cell boundaries = EXACT percentiles (Spark's sort-based ``percentile``,
  not ``approx_percentile`` — no sampling, bit-stable at any parallelism),
  so every cell holds ~the same row count and dense-end probes prune too
  (the round-2 BENCH.md caveat). The value->cell map compiles to a balanced
  CASE-WHEN binary-search tree over the cut literals — ``bits`` comparisons
  per row, still pure Catalyst. Equi-depth grids cap at ``MAX_EQ_BITS``
  cells per dimension (the cut list is plan-embedded metadata; 2^8 cells
  per dimension already bounds file counts far below that at any scale).
"""

from __future__ import annotations

import json
import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros

DEFAULT_BITS = 16
#: equi-depth grids carry their cut lists inside the plan (one literal per
#: cell boundary) — 8 bits = 256 cells/dim keeps that bounded while already
#: equalizing file populations; >10 would bloat the expression tree
MAX_EQ_BITS = 10
DEFAULT_EQ_BITS = 8
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


def equi_depth_cuts(
    df: DataFrame, cols: list[str], bits: int = DEFAULT_EQ_BITS
) -> dict[str, list[float]]:
    """Exact-percentile cell boundaries per column: up to ``2^bits - 1``
    cuts from Spark's sort-based ``percentile`` (NOT approx_percentile — no
    sampling), deduplicated (a heavy value may own several quantiles). One
    aggregate job for all columns; exact percentiles are a pure function of
    the multiset, so the resulting grid — and therefore the z key — is
    bit-identical at any parallelism. Maintenance-time cost: a sort-based
    aggregate over the rewrite's input, the price the round-2 verdict
    accepted for closing the dense-end pruning gap."""
    if bits > MAX_EQ_BITS:
        raise ValueError(f"equi-depth bits must be <= {MAX_EQ_BITS}, got {bits}")
    cells = 1 << bits
    qs = [i / cells for i in range(1, cells)]
    aggs = [F.percentile(_as_double(df, c), qs).alias(c) for c in cols]
    row = df.agg(*aggs).collect()[0]
    out: dict[str, list[float]] = {}
    for c in cols:
        vals = row[c]
        if vals is None:
            raise ValueError(f"z-order column {c!r} has no non-null values")
        out[c] = sorted({float(v) for v in vals})
    return out


def _cut_cell(v: Column, cuts: list[float]) -> Column:
    """Cell index = #cuts <= v, via a balanced CASE-WHEN binary-search tree
    over the cut literals — ceil(log2(len(cuts)+1)) comparisons per row,
    pure Catalyst. NULLs land on cell 0 (NULL >= cut is NULL -> the
    otherwise/left branch all the way down), matching the linear grid."""
    def tree(lo: int, hi: int, base: int) -> Column:
        if lo >= hi:
            return F.lit(base).cast("long")
        mid = (lo + hi) // 2
        return F.when(
            v >= F.lit(cuts[mid]), tree(mid + 1, hi, base + (mid - lo + 1))
        ).otherwise(tree(lo, mid, base))

    if not cuts:
        return F.lit(0).cast("long")
    return tree(0, len(cuts), 0)


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
    cuts: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Attach the interleaved z key as ``out_col``. ``bounds`` (from
    ``column_bounds``) may be precomputed — e.g. once per table, reused
    across incremental rewrites so old and new files share one grid.
    Columns present in ``cuts`` (from ``equi_depth_cuts``) use equi-depth
    cells instead of the linear grid; the two flavors mix freely (e.g. an
    equi-depth text-length dimension interleaved with a linear timestamp)."""
    if len(cols) < 2:
        raise ValueError("z-ordering needs >= 2 columns; use cluster_by for one")
    cuts = cuts or {}
    for c, cl in cuts.items():
        if len(cl) >= (1 << bits):
            raise ValueError(
                f"{len(cl)} cuts for {c!r} exceed the {bits}-bit grid "
                f"({(1 << bits) - 1} max); raise bits or lower the cut count"
            )
    linear = [c for c in cols if c not in cuts]
    if bounds is None and linear:
        bounds = column_bounds(df, linear)
    cells = [
        _cut_cell(_as_double(df, c), cuts[c])
        if c in cuts
        else _scaled_cell(_as_double(df, c), *bounds[c], bits)
        for c in cols
    ]
    return df.withColumn(out_col, zorder_key_expr(cells, bits))


def save_bounds(
    path: str,
    cols: list[str],
    bits: int,
    bounds: dict[str, tuple[float, float]],
    cuts: dict[str, list[float]] | None = None,
) -> None:
    """Persist the z grid next to the layout (``_zorder_bounds.json``) so
    later incremental rewrites reuse ONE grid — old and new files then tile
    the same z space and their zone-map ranges stay comparable. Metadata
    only; zone maps re-check real file stats, so a stale grid can weaken
    pruning but never correctness."""
    spec = {"cols": cols, "bits": bits, "bounds": bounds}
    if cuts:
        spec["cuts"] = cuts
    with open(os.path.join(path, BOUNDS_FILE), "w") as f:
        json.dump(spec, f, indent=1)


def load_bounds(path: str) -> dict | None:
    """The persisted grid from ``save_bounds`` (cols/bits/bounds), or None."""
    p = os.path.join(path, BOUNDS_FILE)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        spec = json.load(f)
    spec["bounds"] = {c: tuple(v) for c, v in spec["bounds"].items()}
    spec.setdefault("cuts", {})
    return spec


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
    equi_depth: bool | list[str] = False,
    cuts: dict[str, list[float]] | None = None,
) -> None:
    """One z-clustered Parquet rewrite: every output file is a contiguous
    z-range, i.e. a tight [min,max] tile of EVERY ``cols`` member — the
    layout ``zone_maps`` + ``prune_paths`` need for multi-column skipping.
    In-file rows are z-sorted too, so Parquet row-group stats nest the
    same way for free.

    ``equi_depth``: True (all columns) or a column subset — those dimensions
    get exact-percentile cell boundaries (``equi_depth_cuts``) so skewed
    value distributions still tile evenly and dense-end probes prune;
    ``bits`` is capped at ``MAX_EQ_BITS`` then. The grid (cols/bits/bounds/
    cuts) is persisted via ``save_bounds``; pass the ``load_bounds(path)``
    pieces on an incremental rewrite of a sibling partition to keep every
    file on one shared grid."""
    if equi_depth and cuts is None:
        eq_cols = cols if equi_depth is True else list(equi_depth)
        bits = min(bits, DEFAULT_EQ_BITS)
        cuts = equi_depth_cuts(df, eq_cols, bits=bits)
    if bounds is None:
        linear = [c for c in cols if c not in (cuts or {})]
        bounds = column_bounds(df, linear) if linear else {}
    staged = with_zorder_key(df, cols, bits=bits, bounds=bounds, cuts=cuts)
    (
        staged.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
    save_bounds(path, cols, bits, bounds, cuts=cuts)
