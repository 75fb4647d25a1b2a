"""Small-file compaction — lakehouse OPTIMIZE / bin-packing for the archive.

The reference writes one file per (id, var, year, month) tree and never
revisits it (tstore/archive/io.py:28-48 defines the layout; there is no
maintenance pass). At web scale that model breaks differently: frequent
incremental ingests into the same partition leave hundreds of KB-sized
files per (day, bucket), and scan cost becomes file listing + per-file
footer reads instead of IO bandwidth. Iceberg/Delta solve it with OPTIMIZE
(bin-packing rewrite committed as one snapshot); this module is the same
operation over the plain-Parquet hidden-partition layout:

1. ``partition_stats``   — driver-side METADATA walk (O(#files) listing, no
   data read) of the leaf partition directories.
2. ``compaction_plan``   — pick directories whose file count exceeds the
   bin-packed target ``ceil(bytes / target_file_bytes)``.
3. ``compact_archive``   — rewrite every selected directory in ONE
   distributed job: a broadcast join attaches each row's target file count,
   ``repartition(p_day, p_bucket, _split)`` lines tasks up with output
   files, ``sortWithinPartitions(id, time)`` restores the row-group
   clustering the ingest write produced (Parquet min/max skipping keeps
   working), and the swap of old -> new directories is a metadata-only
   rename done last (with Iceberg this is the atomic snapshot commit; on
   the Parquet fallback it is best-effort per-directory and idempotent —
   rerunning after a crash re-plans only the still-fragmented dirs).

Scale: the rewrite shuffles ONLY the selected partitions' bytes, never the
whole table; the driver holds one small dict per fragmented directory.
"""

from __future__ import annotations

import math
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from tstore_spark.sources.archive import PAGES_DIR, fact_reader, read_metadata_all
from tstore_spark.sources.zorder import DEFAULT_BITS, with_zorder_key

#: Hive's directory name for a null-valued partition column — the string the
#: dir-name join key must render NULL partition values as, or their rows
#: silently fall out of the rewrite's inner join.
HIVE_NULL_PART = "__HIVE_DEFAULT_PARTITION__"

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024


def partition_stats(root: str) -> list[dict]:
    """n_files / bytes per leaf partition directory (dirs with parquet files).

    Pure filesystem metadata — no Spark job, no file opens. On object
    storage this is the same LIST the scan planner already issues.
    """
    stats = []
    for dirpath, _dirnames, filenames in os.walk(root):
        parts = [f for f in filenames if f.endswith(".parquet")]
        if not parts:
            continue
        rel = os.path.relpath(dirpath, root)
        size = sum(os.path.getsize(os.path.join(dirpath, f)) for f in parts)
        stats.append({"rel_dir": rel, "n_files": len(parts), "bytes": size})
    return sorted(stats, key=lambda s: s["rel_dir"])


def compaction_plan(
    root: str, target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES
) -> list[dict]:
    """Directories worth rewriting: bin-packed target ``n_out`` files each.

    A directory is selected iff rewriting strictly reduces its file count —
    which also makes compaction idempotent (after a pass, every selected
    dir has exactly ``n_out`` files and no longer qualifies)."""
    plan = []
    for s in partition_stats(root):
        n_out = max(1, math.ceil(s["bytes"] / target_file_bytes))
        if s["n_files"] > n_out:
            plan.append(s | {"n_out": n_out})
    return plan


def compact_archive(
    spark: SparkSession,
    base_dir: str,
    table: str = PAGES_DIR,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    zorder_bits: int = DEFAULT_BITS,
    zorder_equi_depth: bool | list[str] = False,
) -> dict:
    """Bin-pack every fragmented partition of ``<base_dir>/<table>`` in one
    distributed rewrite job; returns a summary dict (no-op when nothing is
    fragmented). Row content is preserved exactly (the gate query
    ``compaction_roundtrip`` hash-checks it against the source table).

    ``cluster_by``: optional Z-ordering-lite — instead of hash-splitting a
    directory's rows across its output files, ``repartitionByRange`` on
    (partition cols, cluster cols) gives every output file a TIGHT value
    slice of the cluster columns. That is what makes zone-map file
    skipping (sources/zonemaps.py) bite: a point/range predicate on the
    cluster column then prunes to ~1 file per directory instead of
    matching all of them.

    ``zorder_by``: full multi-dimension clustering (sources/zorder.py) —
    files slice the bit-interleaved z curve instead of a lexicographic
    (c1, c2, ...) order, so zone maps prune on EVERY listed column, not
    just the prefix. Costs one extra min/max pass over the selected dirs
    (grid bounds) and trades away the (id, time) in-file ordering the
    default path restores — pick it when multi-column range probes, not
    id/time scans, dominate reads. ``zorder_equi_depth`` (True or a column
    subset) swaps those dimensions onto exact-percentile grids
    (sources/zorder.py equi_depth_cuts) so skewed columns — text lengths,
    byte counts — still tile evenly and dense-end probes prune; costs one
    sort-based percentile pass over the selected dirs."""
    if cluster_by and zorder_by:
        raise ValueError("cluster_by and zorder_by are mutually exclusive")
    d, _num_buckets, meta = read_metadata_all(base_dir)
    root = os.path.join(base_dir, table)
    plan = compaction_plan(root, target_file_bytes)
    summary = {
        "partitions_compacted": len(plan),
        "files_before": sum(p["n_files"] for p in plan),
        "files_after": sum(p["n_out"] for p in plan),
        "bytes_rewritten": sum(p["bytes"] for p in plan),
    }
    if not plan:
        return summary

    # one scan restricted to the fragmented directories; basePath keeps the
    # partition columns in the schema so the rewrite lands in the same dirs.
    # The pages table reads through fact_reader: a footer-inferred schema on
    # a schema-evolved archive could miss evolved columns and the rewrite
    # would destroy them (the swap deletes the originals).
    paths = [os.path.join(root, p["rel_dir"]) for p in plan]
    reader = fact_reader(spark, meta) if table == PAGES_DIR else spark.read
    df = reader.option("basePath", root).parquet(*paths)
    part_cols = [
        seg.split("=", 1)[0] for seg in plan[0]["rel_dir"].split(os.sep) if "=" in seg
    ]

    # broadcast (partition-key -> n_out); the key is the dir-name string form,
    # rebuilt from the typed partition columns (dates render as yyyy-MM-dd,
    # NULL renders as Hive's default-partition dir name — a bare cast would
    # make the whole key NULL and the inner join would DROP those rows)
    key = F.concat_ws(
        "/",
        *[
            F.concat(
                F.lit(f"{c}="),
                F.coalesce(F.col(c).cast("string"), F.lit(HIVE_NULL_PART)),
            )
            for c in part_cols
        ],
    )
    plan_df = spark.createDataFrame(
        [(p["rel_dir"].replace(os.sep, "/"), p["n_out"]) for p in plan],
        "_key string, _n_out int",
    )
    n_total = max(summary["files_after"], 1)
    if zorder_by:
        # z clustering: partition dirs lead the range key so output tasks
        # stay dir-major; within a dir, files are contiguous z slices —
        # tight [min,max] tiles of every zorder_by column at once
        cuts = None
        if zorder_equi_depth:
            from tstore_spark.sources.zorder import DEFAULT_EQ_BITS, equi_depth_cuts

            eq_cols = zorder_by if zorder_equi_depth is True else list(zorder_equi_depth)
            zorder_bits = min(zorder_bits, DEFAULT_EQ_BITS)
            cuts = equi_depth_cuts(df, eq_cols, bits=zorder_bits)
        staged = with_zorder_key(df, zorder_by, bits=zorder_bits, cuts=cuts)
        staged = staged.repartitionByRange(n_total, *part_cols, "_z")
        sort_tail = ["_z"]
    elif cluster_by:
        # range clustering: contiguous (partition, cluster-col) slices per
        # output file; boundaries come from Spark's range sampling, which
        # moves file SPLIT POINTS, never row content
        staged = df.repartitionByRange(n_total, *part_cols, *cluster_by)
        sort_tail = []
        for c in [*cluster_by, d.id_var, d.time_var]:
            if c not in part_cols and c not in sort_tail:
                sort_tail.append(c)
    else:
        staged = (
            df.withColumn("_key", key)
            .join(F.broadcast(plan_df), "_key")
            .withColumn("_split", F.pmod(F.xxhash64(F.col(d.id_var)), F.col("_n_out")))
            .repartition(n_total, *part_cols, "_split")
            .drop("_key", "_n_out", "_split")
        )
        sort_tail = [d.id_var, d.time_var]

    tmp = root + ".compact__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    # partition cols lead the sort so the dynamic-partition writer's
    # required ordering is already satisfied and it does NOT inject its
    # own (id,time)-destroying sort-by-partition-value pass
    sorted_df = staged.sortWithinPartitions(*part_cols, *sort_tail)
    if zorder_by:
        sorted_df = sorted_df.drop("_z")
    sorted_df.write.mode("overwrite").partitionBy(*part_cols).parquet(tmp)

    # metadata-only swap, done last (Iceberg analog: the snapshot commit).
    # Never delete a live directory before its replacement provably exists:
    # if the rewrite produced no output for a selected dir (a bug upstream),
    # aborting here leaves every remaining partition intact.
    for p in plan:
        src = os.path.join(tmp, p["rel_dir"])
        dst = os.path.join(root, p["rel_dir"])
        if not os.path.isdir(src):
            raise RuntimeError(
                f"compaction produced no output for {p['rel_dir']!r}; "
                f"aborting the swap (original data left in place, temp tree kept at {tmp})"
            )
        shutil.rmtree(dst)
        os.replace(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return summary
