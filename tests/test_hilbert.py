"""Hilbert curve: defining properties, kernel exactness, layout pruning."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from tstore_spark.sources.hilbert import (
    hilbert_cell_key,
    hilbert_key_kernel,
    hilbert_key_ref,
    hilbert_write,
    with_hilbert_key,
)
from tstore_spark.sources.zonemaps import prune_paths, zone_maps


def test_bijective_on_full_grid():
    bits = 4
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_key_kernel(xs.ravel(), ys.ravel(), bits)
    assert sorted(d.tolist()) == list(range(n * n))


def test_adjacency_property():
    """THE Hilbert property: consecutive keys are adjacent cells (one step
    in exactly one dimension) — self-validating, independent of any
    reference implementation."""
    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_key_kernel(xs, ys, bits)
    order = np.argsort(d)
    dx = np.abs(np.diff(xs[order]))
    dy = np.abs(np.diff(ys[order]))
    assert np.all(dx + dy == 1)


def test_kernel_matches_scalar_reference():
    rng = np.random.default_rng(11)
    for bits in (1, 3, 8, 16):
        n = 1 << bits
        x = rng.integers(0, n, 50)
        y = rng.integers(0, n, 50)
        d = hilbert_key_kernel(x, y, bits)
        for xi, yi, di in zip(x.tolist(), y.tolist(), d.tolist()):
            assert hilbert_key_ref(xi, yi, bits) == di


def test_spark_key_deterministic_and_matches_kernel(spark):
    bits = 6
    rows = [(i, (i * 37) % 64, (i * 11) % 64) for i in range(300)]
    df = spark.createDataFrame(rows, "rid long, cx long, cy long")
    got_1 = {
        r["rid"]: r["h"]
        for r in df.repartition(1)
        .select("rid", hilbert_cell_key(F.col("cx"), F.col("cy"), bits).alias("h"))
        .collect()
    }
    got_7 = {
        r["rid"]: r["h"]
        for r in df.repartition(7)
        .select("rid", hilbert_cell_key(F.col("cx"), F.col("cy"), bits).alias("h"))
        .collect()
    }
    assert got_1 == got_7
    exp = hilbert_key_kernel(
        np.array([(i * 37) % 64 for i in range(300)]),
        np.array([(i * 11) % 64 for i in range(300)]),
        bits,
    )
    assert [got_1[i] for i in range(300)] == exp.tolist()


def test_guards(spark):
    df = spark.createDataFrame([(1, 2, 3)], "a long, b long, c long")
    with pytest.raises(ValueError):
        with_hilbert_key(df, ["a"])
    with pytest.raises(ValueError):
        with_hilbert_key(df, ["a", "b", "c"])
    with pytest.raises(ValueError):
        hilbert_cell_key(F.col("a"), F.col("b"), 40)


def test_hilbert_write_prunes_both_dims_and_beats_nothing_lost(spark, tmp_path):
    n = 1 << 12
    df = spark.range(n).select(
        F.col("id").alias("rid"),
        ((F.col("id") * 7919) % 4096).alias("x"),
        (F.col("id") % 4096).alias("y"),
    )
    root = str(tmp_path / "hil")
    hilbert_write(df, root, ["x", "y"], n_files=16, bits=8)

    got = spark.read.parquet(root)
    assert got.count() == n and got.agg(F.sum("rid")).collect()[0][0] == n * (n - 1) // 2

    zm = zone_maps(spark, root, ["x", "y"])
    x_paths, total = prune_paths(zm, {"x": (0, 511)})
    y_paths, _ = prune_paths(zm, {"y": (0, 511)})
    box_paths, _ = prune_paths(zm, {"x": (0, 511), "y": (0, 511)})
    assert total == 16
    # both dimensions prune (the z-order contract), and the 2-D box is at
    # least as tight as either slab (relational assertions only — file
    # split points wobble with the RDD id, never exact layouts)
    assert len(x_paths) < 16 and len(y_paths) < 16
    assert len(box_paths) <= min(len(x_paths), len(y_paths))
    # pruned read equals full scan on the probe box
    kept = spark.read.parquet(*box_paths).where(
        (F.col("x") <= 511) & (F.col("y") <= 511)
    )
    full = got.where((F.col("x") <= 511) & (F.col("y") <= 511))
    assert kept.count() == full.count()


def test_kernel_rejects_out_of_grid_cells():
    with pytest.raises(ValueError):
        hilbert_key_kernel(np.array([16]), np.array([0]), 4)
    with pytest.raises(ValueError):
        hilbert_key_kernel(np.array([0]), np.array([-1]), 4)
