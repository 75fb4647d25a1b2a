"""Positional deletion vectors: DELETE without rewriting data files.

The merge-on-read half of the lakehouse delete story (Iceberg v2
positional delete files / Delta deletion vectors; cf. the Iceberg spec's
``position_deletes`` contract). ``sources/merge.delete_where`` is the
copy-on-write half: it rewrites every touched partition, which at 100 TB
turns a GDPR-style trickle of row deletes into petabytes of write
amplification. Here a delete appends only ``(file_path, row_index)``
tombstones — one predicate scan, zero data rewrite — and readers apply
them with a distributed anti-join on Spark's ``_metadata`` file/position
columns. ``purge_deletes`` is the compaction step that folds pending
tombstones back into data files (copy-on-write, scoped to touched
partitions) and clears the vector.

Contract (the Iceberg sequencing rule, stated bluntly): tombstones
address PHYSICAL files, so any rewrite of a tombstoned file (compact,
merge, copy-on-write delete) must be preceded by ``purge_deletes`` —
otherwise surviving rows migrate into new files the tombstones no longer
match and the deletes silently un-happen. ``has_pending_deletes`` is the
cheap guard; the maintenance CLI purges before compaction.

Snapshot interplay: ``snapshot_commit`` pins the TABLE directory only —
the tombstone sidecar is not versioned, so rolling back to an earlier
snapshot keeps pending deletes applied (they address file paths the
rollback restores). Purge before snapshotting when a version must be
tombstone-free.

Scale shape: the tombstone table is row-proportional to DELETED rows only
(two columns), the read-path anti-join shuffles on (file, position) —
uniform keys — and purge touches exactly the partitions holding
tombstoned files. Stale tombstones (files already gone) no-op by
construction: the anti-join simply finds nothing to subtract.
"""

from __future__ import annotations

import os
import re
import shutil

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from tstore_spark.sources.archive import PAGES_DIR, fact_reader, read_metadata_all

#: sidecar directory holding (file_path, row_index) tombstones.
DV_SUFFIX = "__deletes"


def _dv_dir(base_dir: str, table: str) -> str:
    return os.path.join(base_dir, table + DV_SUFFIX)


def _reader(spark: SparkSession, base_dir: str, table: str):
    _d, _n, meta = read_metadata_all(base_dir)
    r = fact_reader(spark, meta) if table == PAGES_DIR else spark.read
    return r.option("basePath", os.path.join(base_dir, table))


def _with_pos(df: DataFrame) -> DataFrame:
    return df.withColumns(
        {
            "_file_path": F.col("_metadata.file_path"),
            "_row_index": F.col("_metadata.row_index"),
        }
    )


def has_pending_deletes(base_dir: str, table: str = PAGES_DIR) -> bool:
    dv = _dv_dir(base_dir, table)
    return os.path.isdir(dv) and any(
        f.endswith(".parquet") for _r, _d, fs in os.walk(dv) for f in fs
    )


def delete_where_dv(
    spark: SparkSession,
    base_dir: str,
    predicate,
    table: str = PAGES_DIR,
) -> dict:
    """Merge-on-read DELETE WHERE: append positional tombstones for every
    matching row; no data file changes. Returns ``{"rows_deleted": n}``
    (rows newly matched this call — re-deleting the same rows appends
    duplicate tombstones, which the reader's anti-join makes harmless and
    ``purge_deletes`` retires)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    root = os.path.join(base_dir, table)
    stored = _with_pos(_reader(spark, base_dir, table).parquet(root))
    obs = Observation()
    hits = (
        stored.where(pred)
        .select(
            F.col("_file_path").alias("file_path"),
            F.col("_row_index").alias("row_index"),
        )
        .observe(obs, F.count(F.lit(1)).alias("n"))
    )
    hits.write.mode("append").parquet(_dv_dir(base_dir, table))
    return {"rows_deleted": int(obs.get["n"])}


def read_with_deletes(
    spark: SparkSession, base_dir: str, table: str = PAGES_DIR
) -> DataFrame:
    """The table minus every tombstoned row position — the merge-on-read
    scan. Without pending tombstones this is exactly the plain scan."""
    root = os.path.join(base_dir, table)
    df = _reader(spark, base_dir, table).parquet(root)
    if not has_pending_deletes(base_dir, table):
        return df
    dv = spark.read.parquet(_dv_dir(base_dir, table)).select(
        F.col("file_path").alias("_file_path"),
        F.col("row_index").alias("_row_index"),
    )
    cols = df.columns
    return (
        _with_pos(df)
        .join(dv, ["_file_path", "_row_index"], "left_anti")
        .select(*cols)
    )


def purge_deletes(
    spark: SparkSession, base_dir: str, table: str = PAGES_DIR
) -> dict:
    """Fold pending tombstones into the data files (copy-on-write, scoped
    to partitions that contain tombstoned files) and clear the vector —
    the compaction step that must precede any other rewrite of this table.
    """
    if not has_pending_deletes(base_dir, table):
        return {"partitions_touched": 0}
    root = os.path.join(base_dir, table)
    dv_path = _dv_dir(base_dir, table)
    d, _n, _meta = read_metadata_all(base_dir)
    dv = spark.read.parquet(dv_path)
    # touched partitions parsed from the tombstoned file paths — bounded by
    # the number of PARTITIONS holding deletes, the delete_where posture
    part_re = re.compile(r"p_day=([^/]+)/p_bucket=(\d+)/")
    touched = sorted(
        {
            m.group(0)
            for r in dv.select("file_path").distinct().collect()
            if (m := part_re.search(r["file_path"]))
        }
    )
    if not touched:
        shutil.rmtree(dv_path, ignore_errors=True)
        return {"partitions_touched": 0}
    paths = [os.path.join(root, rel.rstrip("/")) for rel in touched]
    base = _reader(spark, base_dir, table).parquet(*paths)
    kept = (
        _with_pos(base)
        .join(
            dv.select(
                F.col("file_path").alias("_file_path"),
                F.col("row_index").alias("_row_index"),
            ),
            ["_file_path", "_row_index"],
            "left_anti",
        )
        .select(*base.columns)
    )
    tmp = root + ".dvpurge__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        kept.repartition("p_day", "p_bucket")
        .sortWithinPartitions("p_day", "p_bucket", d.id_var, d.time_var)
        .write.mode("overwrite")
        .partitionBy("p_day", "p_bucket")
        .parquet(tmp)
    )
    for rel in touched:
        rel = rel.rstrip("/")
        src, dst = os.path.join(tmp, rel), os.path.join(root, rel)
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            os.replace(src, dst)
        # a partition whose every row was tombstoned simply disappears
    shutil.rmtree(tmp, ignore_errors=True)
    shutil.rmtree(dv_path, ignore_errors=True)
    return {"partitions_touched": len(touched)}
