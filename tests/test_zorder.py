"""Z-order clustering: key correctness vs a straight-line Python reference,
multi-dimension file skipping (where lexicographic range clustering fails),
row fidelity, and parallelism determinism of the key."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.sources.zonemaps import prune_paths, pruned_read, zone_maps
from tstore_spark.sources.zorder import (
    column_bounds,
    load_bounds,
    with_zorder_key,
    zorder_write,
)


def _ref_z(cells: list[int], bits: int) -> int:
    k = len(cells)
    z = 0
    for i in range(bits):
        for j, cell in enumerate(cells):
            z |= ((cell >> i) & 1) << (i * k + j)
    return z


def _ref_cell(v: float, lo: float, hi: float, bits: int) -> int:
    top = (1 << bits) - 1
    if hi <= lo:
        return 0
    import math

    return min(max(math.floor((v - lo) / (hi - lo) * float(top)), 0), top)


def test_zorder_key_matches_python_reference(spark):
    pdf = pd.DataFrame({"x": [0, 3, 7, 15, 9], "y": [0, 12, 7, 15, 2]})
    df = spark.createDataFrame(pdf)
    out = (
        with_zorder_key(df, ["x", "y"], bits=4, bounds={"x": (0, 15), "y": (0, 15)})
        .orderBy("x")
        .collect()
    )
    for r in out:
        assert r["_z"] == _ref_z([int(r["x"]), int(r["y"])], 4)
    # interleaving, not concatenation: (15, 0) and (0, 15) differ
    lone = with_zorder_key(
        spark.createDataFrame(pd.DataFrame({"x": [15, 0], "y": [0, 15]})),
        ["x", "y"],
        bits=4,
        bounds={"x": (0, 15), "y": (0, 15)},
    ).collect()
    zs = {(r["x"], r["y"]): r["_z"] for r in lone}
    assert zs[(15, 0)] == 0b01010101 and zs[(0, 15)] == 0b10101010


def test_zorder_quadrant_locality(spark):
    """Points in the same 2x2 quadrant share the top 2 z bits — the tile
    property that makes every dimension prunable."""
    pdf = pd.DataFrame(
        [(x, y) for x in range(16) for y in range(16)], columns=["x", "y"]
    )
    rows = with_zorder_key(
        spark.createDataFrame(pdf), ["x", "y"], bits=4,
        bounds={"x": (0, 15), "y": (0, 15)},
    ).collect()
    for r in rows:
        quadrant = (int(r["x"]) >= 8, int(r["y"]) >= 8)
        top2 = (r["_z"] >> 6) & 0b11
        assert (bool(top2 & 0b01), bool(top2 & 0b10)) == quadrant


def test_scaling_clamps_nulls_and_constant_columns(spark):
    pdf = pd.DataFrame({"x": [1.0, None, 5.0], "y": [7.0, 7.0, 7.0]})
    rows = with_zorder_key(
        spark.createDataFrame(pdf), ["x", "y"], bits=4,
        bounds={"x": (1.0, 5.0), "y": (7.0, 7.0)},
    ).collect()
    by_x = {r["x"]: r["_z"] for r in rows}
    assert by_x[None] == 0  # NULL -> cell 0 (NULLS FIRST)
    assert by_x[1.0] == 0 and by_x[5.0] == _ref_z([15, 0], 4)


def test_guards(spark, pages_sdf):
    with pytest.raises(ValueError, match=">= 2 columns"):
        with_zorder_key(pages_sdf, ["warc_ts"])
    with pytest.raises(ValueError, match="> 63 key bits"):
        with_zorder_key(
            pages_sdf.select(
                F.length("text").alias("a"), F.length("url").alias("b"),
                F.length("lang").alias("c"), F.length("html").alias("d"),
            ),
            ["a", "b", "c", "d"],
            bits=16,
        )


def test_timestamp_dimension_and_bounds(spark, pages_sdf):
    df = pages_sdf.select("warc_ts", F.length("text").alias("n"))
    b = column_bounds(df, ["warc_ts", "n"])
    assert b["warc_ts"][0] < b["warc_ts"][1]  # epochs in the double domain
    out = with_zorder_key(df, ["warc_ts", "n"], bits=8, bounds=b)
    assert out.where(F.col("_z").isNull()).count() == 0


@pytest.fixture(scope="module")
def grid_roots(spark, tmp_path_factory):
    """The same uniform 2-D table written twice: z-ordered on (x, y) vs
    lexicographically range-clustered on (x, y)."""
    base = tmp_path_factory.mktemp("zorder")
    pdf = pd.DataFrame(
        [(i, (i * 7919) % 4096, i % 4096) for i in range(16384)],
        columns=["rid", "x", "y"],
    )
    df = spark.createDataFrame(pdf)
    z_root, lex_root = str(base / "z"), str(base / "lex")
    zorder_write(df, z_root, ["x", "y"], n_files=16, bits=12)
    (
        df.repartitionByRange(16, "x", "y")
        .sortWithinPartitions("x", "y")
        .write.mode("overwrite")
        .parquet(lex_root)
    )
    return z_root, lex_root


def test_zorder_write_preserves_rows(spark, grid_roots):
    z_root, _ = grid_roots
    got = spark.read.parquet(z_root)
    assert got.count() == 16384
    assert got.select(F.sum("rid"), F.sum("x"), F.sum("y")).collect()[0] == (
        16384 * 16383 // 2,
        sum((i * 7919) % 4096 for i in range(16384)),
        sum(i % 4096 for i in range(16384)),
    )


def test_zorder_prunes_every_dimension(spark, grid_roots):
    """A y-range probe skips files on the z layout but not on the
    lexicographic (x, y) layout — the reason z-order exists."""
    z_root, lex_root = grid_roots
    zm_z = zone_maps(spark, z_root, ["x", "y"])
    zm_lex = zone_maps(spark, lex_root, ["x", "y"])

    x_paths, total = prune_paths(zm_z, {"x": (0, 511)})
    y_paths, _ = prune_paths(zm_z, {"y": (0, 511)})
    assert total == 16
    assert len(x_paths) < 16 and len(y_paths) < 16  # both dims prune

    lex_y, lex_total = prune_paths(zm_lex, {"y": (0, 511)})
    # prefix layout: y (almost) never prunes — ">= 15" because range-split
    # sample seeds shift with the RDD id, and once in a while one boundary
    # file lands with a y range that happens to miss [0, 511]
    assert lex_total == 16 and len(lex_y) >= 15
    assert len(y_paths) < len(lex_y)  # z layout strictly better off-prefix
    # ... and the 2-D box is tighter than either slab on the z layout
    box_paths, _ = prune_paths(zm_z, {"x": (0, 511), "y": (0, 511)})
    assert len(box_paths) <= min(len(x_paths), len(y_paths))


def test_zorder_pruned_read_equals_full_scan(spark, grid_roots):
    z_root, _ = grid_roots
    zm = zone_maps(spark, z_root, ["x", "y"])
    got, report = pruned_read(
        spark, z_root, zm, {"x": (100, 1500), "y": (2000, 3000)}
    )
    exp = spark.read.parquet(z_root).where(
        (F.col("x") >= 100) & (F.col("x") <= 1500)
        & (F.col("y") >= 2000) & (F.col("y") <= 3000)
    )
    assert report["files_read"] < report["files_total"]
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_bounds_persist_for_incremental_rewrites(spark, tmp_path):
    """zorder_write saves its grid as a sidecar; a later batch keyed on the
    LOADED grid gets the same cells as under the original bounds (shared
    tiling), not the cells its own narrower bounds would give — and the
    underscore-prefixed sidecar is invisible to the parquet reader."""
    pdf = pd.DataFrame(
        [(i, (i * 7919) % 4096, i % 4096) for i in range(4096)],
        columns=["rid", "x", "y"],
    )
    df = spark.createDataFrame(pdf)
    root = str(tmp_path / "z1")
    zorder_write(df, root, ["x", "y"], n_files=4, bits=10)
    spec = load_bounds(root)
    assert spec["cols"] == ["x", "y"] and spec["bits"] == 10
    assert spec["bounds"] == column_bounds(df, ["x", "y"])
    assert spark.read.parquet(root).count() == 4096  # sidecar ignored

    batch = df.where((F.col("x") < 100) & (F.col("y") < 100))  # narrow slice
    shared = {
        r["rid"]: r["_z"]
        for r in with_zorder_key(batch, ["x", "y"], bits=10,
                                 bounds=spec["bounds"]).collect()
    }
    original = {
        r["rid"]: r["_z"]
        for r in with_zorder_key(df, ["x", "y"], bits=10,
                                 bounds=spec["bounds"]).collect()
    }
    own = {
        r["rid"]: r["_z"]
        for r in with_zorder_key(batch, ["x", "y"], bits=10).collect()
    }
    assert shared == {k: original[k] for k in shared}  # same grid => same keys
    assert shared != own  # its own bounds would re-tile the narrow slice


def test_zorder_key_deterministic_across_parallelism(spark):
    pdf = pd.DataFrame(
        [(i, (i * 31) % 997, (i * 17) % 997) for i in range(5000)],
        columns=["rid", "x", "y"],
    )
    b = {"x": (0.0, 996.0), "y": (0.0, 996.0)}
    outs = []
    for n in (1, 4):
        df = spark.createDataFrame(pdf).repartition(n)
        z = with_zorder_key(df, ["x", "y"], bits=10, bounds=b)
        outs.append({r["rid"]: r["_z"] for r in z.collect()})
    assert outs[0] == outs[1]


# --------------------------------------------------------------- equi-depth
def test_equi_depth_cuts_exact_and_parallelism_stable(spark):
    """Cuts are exact percentiles (sort-based, no sampling): they match
    numpy's linear-interpolation quantiles and are bit-identical when the
    same multiset arrives at different parallelism."""
    import numpy as np

    from tstore_spark.sources.zorder import equi_depth_cuts

    vals = [float((i * 31) % 97) ** 2 for i in range(2000)]
    pdf = pd.DataFrame({"v": vals, "w": vals})
    got = []
    for n in (1, 4):
        df = spark.createDataFrame(pdf).repartition(n)
        got.append(equi_depth_cuts(df, ["v"], bits=4))
    assert got[0] == got[1]  # determinism incl. the cut computation itself
    qs = [i / 16 for i in range(1, 16)]
    expect = sorted({float(q) for q in np.quantile(np.array(vals), qs)})
    assert got[0]["v"] == pytest.approx(expect)


def test_cut_cell_key_matches_python_reference(spark):
    """Equi-depth cell = bisect_right(cuts, v); the balanced CASE tree must
    agree with the straight-line reference for every row, mixed with a
    linear dimension in one interleaved key."""
    import bisect

    from tstore_spark.sources.zorder import equi_depth_cuts, with_zorder_key

    pdf = pd.DataFrame(
        [(i, (i * 7919) % 256, float((i * 31) % 89) ** 1.5) for i in range(3000)],
        columns=["rid", "x", "y"],
    )
    df = spark.createDataFrame(pdf)
    cuts = equi_depth_cuts(df, ["y"], bits=4)
    bounds = {"x": (0.0, 255.0)}
    out = with_zorder_key(df, ["x", "y"], bits=4, bounds=bounds, cuts=cuts)
    for r in out.collect():
        cx = _ref_cell(float(r["x"]), 0.0, 255.0, 4)
        cy = bisect.bisect_right(cuts["y"], float(r["y"]))
        assert r["_z"] == _ref_z([cx, cy], 4), (r["rid"], r["x"], r["y"])


def test_equi_depth_guards(spark):
    from tstore_spark.sources.zorder import equi_depth_cuts, with_zorder_key

    df = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0], "y": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="bits must be <="):
        equi_depth_cuts(df, ["x"], bits=16)
    with pytest.raises(ValueError, match="exceed the .*grid"):
        with_zorder_key(df, ["x", "y"], bits=2,
                        bounds={"x": (0, 1)}, cuts={"y": [float(i) for i in range(9)]})


def test_equi_depth_dense_end_pruning_beats_linear(spark, tmp_path):
    """The round-2 BENCH.md caveat: on a skewed (text-length-like) dimension
    the linear grid collapses the dense end into one cell, so a dense-end
    probe pruned 0 files. Exact-percentile cells spread the dense mass over
    many cells — the same probe now prunes, and strictly more than linear."""
    import math

    from tstore_spark.sources.zorder import zorder_write

    n = 16384
    rows = []
    for i in range(n):
        u = ((i * 2654435761) % (2**32)) / 2**32
        rows.append((i, (i * 7919) % 4096, int(math.exp(u * 8.0))))  # log-uniform y
    pdf = pd.DataFrame(rows, columns=["rid", "x", "y"])
    df = spark.createDataFrame(pdf)

    lin_root = str(tmp_path / "lin")
    eq_root = str(tmp_path / "eq")
    zorder_write(df, lin_root, ["x", "y"], n_files=16, bits=8)
    zorder_write(df, eq_root, ["x", "y"], n_files=16, bits=8, equi_depth=["y"])

    probe = {"y": (8, 16)}  # dense end: ~9% of mass, inside linear cell 0
    lin_kept, lin_total = prune_paths(zone_maps(spark, lin_root, ["x", "y"]), probe)
    eq_kept, eq_total = prune_paths(zone_maps(spark, eq_root, ["x", "y"]), probe)
    assert lin_total == 16 and eq_total == 16
    assert len(eq_kept) < eq_total  # dense-end probe prunes now
    assert len(eq_kept) < len(lin_kept)  # and strictly beats the linear grid

    # pruned read stays exact on the equi-depth layout
    got, report = pruned_read(
        spark, eq_root, zone_maps(spark, eq_root, ["x", "y"]), probe
    )
    exp = spark.read.parquet(eq_root).where((F.col("y") >= 8) & (F.col("y") <= 16))
    assert report["files_read"] < report["files_total"]
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0

    # the persisted sidecar carries the cuts for incremental rewrites
    spec = load_bounds(eq_root)
    assert spec["cuts"]["y"] and spec["bits"] == 8
