"""Small-file compaction: plan selection, one-job rewrite, row fidelity,
idempotence, and non-selected partitions left untouched."""

import os

import pytest
from pyspark.sql import functions as F

from tstore_spark.datagen import attrs_pandas
from tstore_spark.functions.urls import domain_of
from tstore_spark.model.tslong import TSLong
from tstore_spark.sources.archive import PAGES_DIR, open_archive, write_archive
from tstore_spark.sources.compact import (
    compact_archive,
    compaction_plan,
    partition_stats,
)


@pytest.fixture()
def fragmented_archive(spark, pages_sdf, tmp_path):
    """An archive whose pages table simulates 6 incremental ingest batches:
    every (day, bucket) directory holds ~6 small files."""
    base = str(tmp_path / "archive")
    pages = pages_sdf.withColumn("domain", domain_of("url"))
    tsl = TSLong.wrap(
        pages, id_var="domain", time_var="warc_ts",
        ts_vars={"content": ["url", "html", "text", "lang"]},
    )
    attrs = spark.createDataFrame(attrs_pandas())
    write_archive(tsl, base, attrs=attrs, num_buckets=2)
    root = os.path.join(base, PAGES_DIR)
    frag = spark.read.option("basePath", root).parquet(root).repartition(6)
    frag.write.mode("overwrite").partitionBy("p_day", "p_bucket").parquet(root)
    return base


def _digest(df):
    cols = sorted(df.columns)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))).alias("h"),
    ).head()
    return (row["n"], row["h"])


def test_stats_and_plan_select_fragmented_dirs(fragmented_archive):
    root = os.path.join(fragmented_archive, PAGES_DIR)
    stats = partition_stats(root)
    assert stats and all(s["n_files"] > 1 for s in stats)
    plan = compaction_plan(root, target_file_bytes=1 << 30)
    assert {p["rel_dir"] for p in plan} == {s["rel_dir"] for s in stats}
    assert all(p["n_out"] == 1 for p in plan)


def test_plan_respects_target_size(fragmented_archive):
    # a 1-byte target bin-packs to n_out >= n_files: nothing worth rewriting
    root = os.path.join(fragmented_archive, PAGES_DIR)
    assert compaction_plan(root, target_file_bytes=1) == []


def test_compact_preserves_rows_and_reduces_files(spark, fragmented_archive):
    before = _digest(open_archive(spark, fragmented_archive, with_attributes=False).df)
    summary = compact_archive(spark, fragmented_archive, target_file_bytes=1 << 30)
    assert summary["partitions_compacted"] > 0
    assert summary["files_after"] < summary["files_before"]

    root = os.path.join(fragmented_archive, PAGES_DIR)
    stats = partition_stats(root)
    assert all(s["n_files"] == 1 for s in stats)
    after = _digest(open_archive(spark, fragmented_archive, with_attributes=False).df)
    assert after == before


def test_compact_is_idempotent(spark, fragmented_archive):
    first = compact_archive(spark, fragmented_archive, target_file_bytes=1 << 30)
    assert first["partitions_compacted"] > 0
    second = compact_archive(spark, fragmented_archive, target_file_bytes=1 << 30)
    assert second["partitions_compacted"] == 0
    assert second["files_before"] == 0


def test_compact_zorder_clusters_every_dimension(spark, pages_sdf, tmp_path):
    """zorder_by compaction: row fidelity, and inside a multi-file directory
    a range probe on the SECOND z column prunes files — the property the
    lexicographic cluster_by path cannot deliver off-prefix."""
    from tstore_spark.sources.zonemaps import prune_paths, zone_maps

    base = str(tmp_path / "zarch")
    pages = pages_sdf.withColumn("domain", domain_of("url"))
    tsl = TSLong.wrap(
        pages.select(
            "domain", "warc_ts",
            F.length("text").cast("long").alias("tl"),
            F.xxhash64("url").alias("uh"),
        ),
        id_var="domain", time_var="warc_ts", ts_vars={"m": ["tl", "uh"]},
    )
    write_archive(tsl, base, num_buckets=1)
    root = os.path.join(base, PAGES_DIR)
    frag = spark.read.option("basePath", root).parquet(root).repartition(12)
    frag.write.mode("overwrite").partitionBy("p_day", "p_bucket").parquet(root)

    before = _digest(open_archive(spark, base, with_attributes=False).df)
    with pytest.raises(ValueError, match="mutually exclusive"):
        compact_archive(spark, base, cluster_by=["tl"], zorder_by=["tl", "uh"])
    # target sized so the biggest directory bin-packs to ~4 output files
    target = max(s["bytes"] for s in partition_stats(root)) // 4 + 1
    summary = compact_archive(
        spark, base, target_file_bytes=target, zorder_by=["tl", "uh"], zorder_bits=12
    )
    assert summary["partitions_compacted"] > 0
    assert _digest(open_archive(spark, base, with_attributes=False).df) == before

    for s in partition_stats(root):
        if s["n_files"] >= 4:
            zm = zone_maps(spark, os.path.join(root, s["rel_dir"]), ["tl", "uh"])
            # uh = xxhash64 is uniform, so >= 4 contiguous z slices pigeonhole
            # at least one file wholly into the uh-top-bit half -> it prunes
            kept, total = prune_paths(zm, {"uh": (-(1 << 63), -1)})
            assert total == s["n_files"] and len(kept) < total
            break
    else:
        pytest.fail("no directory with >= 4 files after z-compaction")


def test_compact_sorts_within_files(spark, fragmented_archive):
    """The rewrite restores (id, time) clustering inside each file so
    Parquet min/max row-group skipping keeps working after compaction."""
    compact_archive(spark, fragmented_archive, target_file_bytes=1 << 30)
    root = os.path.join(fragmented_archive, PAGES_DIR)
    import pyarrow.parquet as pq

    for dirpath, _d, files in os.walk(root):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(dirpath, f), columns=["domain", "warc_ts"])
            rows = list(zip(t["domain"].to_pylist(), t["warc_ts"].to_pylist()))
            assert rows == sorted(rows)


def test_compact_null_time_partition(spark, tmp_path):
    """Rows with NULL time land in p_day=__HIVE_DEFAULT_PARTITION__; the
    rewrite's dir-name join key must render NULL as that sentinel (a bare
    cast made the key NULL, the inner join dropped the rows, and the swap
    deleted the only copy before crashing on the missing replacement)."""
    import pandas as pd

    base = str(tmp_path / "nullpart")
    n = 40
    pdf = pd.DataFrame(
        {
            "sensor": [f"s{i % 4}" for i in range(n)],
            "ts": pd.to_datetime(
                ["2024-05-01 10:00:00" if i % 2 == 0 else None for i in range(n)]
            ).astype("datetime64[us]"),
            "value": [float(i) for i in range(n)],
        }
    )
    tsl = TSLong.wrap(
        spark.createDataFrame(pdf), id_var="sensor", time_var="ts",
        ts_vars={"m": ["value"]},
    )
    write_archive(tsl, base, num_buckets=1, check_static_uniqueness=False)
    root = os.path.join(base, PAGES_DIR)
    frag = spark.read.option("basePath", root).parquet(root).repartition(6)
    frag.write.mode("overwrite").partitionBy("p_day", "p_bucket").parquet(root)
    assert any("__HIVE_DEFAULT_PARTITION__" in s["rel_dir"] for s in partition_stats(root))

    before = _digest(open_archive(spark, base, with_attributes=False).df)
    summary = compact_archive(spark, base, target_file_bytes=1 << 30)
    assert summary["partitions_compacted"] > 0
    after_df = open_archive(spark, base, with_attributes=False).df
    assert _digest(after_df) == before
    assert after_df.where(F.col("ts").isNull()).count() == n // 2
