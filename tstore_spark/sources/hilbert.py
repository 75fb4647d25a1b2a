"""Hilbert-curve clustering — the locality upgrade over the Z curve.

``sources/zorder.py`` interleaves bits; the Z curve it traces jumps
across the whole space at every power-of-two boundary (the "Z" seams),
so an occasional output file tiles a wide rectangle in one dimension.
The Hilbert curve visits every grid cell through ADJACENT cells only —
consecutive keys are always one step apart in exactly one dimension —
which is why Iceberg/Delta offer it as the premium clustering order:
contiguous key ranges are provably compact tiles (no seam-straddling
files), so zone-map pruning gets strictly tighter boxes than Z on the
same file count.

The price is that the key is a per-bit-level RECURSION (quadrant
rotations carry state down the levels), not a closed-form bit shuffle —
it cannot be a flat Catalyst expression like ``zorder_key_expr``
(chained projections would blow up exponentially under projection
collapse). It runs as a vectorized Arrow kernel over the two GRID CELL
columns, which are still computed JVM-side by zorder's scaling (linear
min/max or exact equi-depth cuts). That keeps Python in the one-time
LAYOUT REWRITE only — reads prune via zone maps and never touch the
curve — and the kernel is integer numpy on a whole batch per call,
``bits`` vectorized passes regardless of row count.

Determinism: pure integer recursion on exact cells — keys are
bit-identical at any parallelism, and the identical recursion runs as a
recursive CTE in the DuckDB oracle (gate row ``hilbert_key``), so the
curve itself is hash-gated, not trusted.

Algorithm: the classic xy→d quadrant walk (Wikipedia "Hilbert curve",
public domain): at each scale s the quadrant index ``(3·rx) XOR ry``
prepends to d, then the subsquare is rotated/reflected (when ry=0: flip
both coordinates if rx=1, then swap x/y) so the child quadrant's frame
is canonical. 2-D only by design — at k>2 the rotation group grows and
the win over Z shrinks; cluster the two highest-selectivity dimensions
and leave the rest to file sorting, as the big lakehouses do.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from tstore_spark.sources.zorder import (
    DEFAULT_BITS,
    _as_double,
    _cut_cell,
    _scaled_cell,
    column_bounds,
    save_bounds,
)


def hilbert_key_kernel(x: np.ndarray, y: np.ndarray, bits: int) -> np.ndarray:
    """Vectorized xy→d for one batch of grid cells in ``[0, 2^bits)``."""
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    mask = (1 << bits) - 1
    if len(x) and (
        int(x.min()) < 0 or int(y.min()) < 0
        or int(x.max()) > mask or int(y.max()) > mask
    ):
        raise ValueError(
            f"hilbert cells out of [0, 2^{bits}) — scale/clamp first "
            "(with_hilbert_key does; hilbert_cell_key trusts its input)"
        )
    d = np.zeros_like(x)
    s = 1 << (bits - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate/reflect the subsquare: when ry==0, optionally flip (rx==1)
        # then swap x and y. Flip uses the full-grid mask — bits >= s are
        # already consumed and never re-read, so flipping them is harmless
        # (and matches the classic formulation the SQL twin replays).
        flip = (ry == 0) & (rx == 1)
        xf = np.where(flip, mask - x, x)
        yf = np.where(flip, mask - y, y)
        swap = ry == 0
        x, y = np.where(swap, yf, xf), np.where(swap, xf, yf)
        s >>= 1
    return d


def hilbert_key_ref(x: int, y: int, bits: int) -> int:
    """Straight-line scalar reference (test oracle)."""
    return int(hilbert_key_kernel(np.array([x]), np.array([y]), bits)[0])


def _hilbert_udf(bits: int):
    @pandas_udf("long")
    def h(cx: pd.Series, cy: pd.Series) -> pd.Series:
        return pd.Series(
            hilbert_key_kernel(cx.to_numpy(np.int64), cy.to_numpy(np.int64), bits)
        )

    return h


def hilbert_cell_key(cx: Column, cy: Column, bits: int) -> Column:
    """Hilbert key column from two INTEGER grid-cell columns already in
    ``[0, 2^bits)`` (Arrow-batched kernel)."""
    if bits < 1 or 2 * bits > 62:
        raise ValueError("bits must be in [1, 31]")
    return _hilbert_udf(bits)(cx.cast("long"), cy.cast("long"))


def with_hilbert_key(
    df: DataFrame,
    cols: list[str],
    bits: int = DEFAULT_BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
    out_col: str = "_h",
    cuts: dict[str, list[float]] | None = None,
) -> DataFrame:
    """Attach the Hilbert key over exactly two columns. Grid mapping —
    linear min/max scaling or equi-depth ``cuts`` — is shared with
    zorder (same cells, different curve), so the two layouts are
    directly comparable on one grid."""
    if len(cols) != 2:
        raise ValueError("hilbert clustering is 2-D: pass exactly 2 columns")
    cuts = cuts or {}
    linear = [c for c in cols if c not in cuts]
    if bounds is None and linear:
        bounds = column_bounds(df, linear)
    cells = [
        _cut_cell(_as_double(df, c), cuts[c])
        if c in cuts
        else _scaled_cell(_as_double(df, c), *bounds[c], bits)
        for c in cols
    ]
    return df.withColumn(out_col, hilbert_cell_key(cells[0], cells[1], bits))


def hilbert_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = DEFAULT_BITS,
    bounds: dict[str, tuple[float, float]] | None = None,
    cuts: dict[str, list[float]] | None = None,
) -> None:
    """Hilbert-clustered Parquet rewrite — ``zorder_write``'s API with the
    better curve: range-partition + sort on the Hilbert key, so every
    file is one contiguous curve segment = one compact 2-D tile. Grid
    metadata persists via the shared ``save_bounds`` (cells are
    curve-agnostic; incremental rewrites reuse the grid either way)."""
    if bounds is None:
        linear = [c for c in cols if c not in (cuts or {})]
        bounds = column_bounds(df, linear) if linear else {}
    staged = with_hilbert_key(df, cols, bits=bits, bounds=bounds, cuts=cuts)
    (
        staged.repartitionByRange(n_files, "_h")
        .sortWithinPartitions("_h")
        .drop("_h")
        .write.mode("overwrite")
        .parquet(path)
    )
    save_bounds(path, cols, bits, bounds, cuts=cuts)
