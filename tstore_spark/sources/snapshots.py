"""Snapshots — time travel and rollback for the archive (Iceberg analog).

Iceberg's versioning is a chain of manifest files: a snapshot is a list of
data files, commits add a new list, and readers pin one. The maintenance
ops here (compact, merge) physically swap partition directories, which
destroys history. This module restores it without copying data:

* ``snapshot_commit``  — HARDLINK every live data file into
  ``snapshots/<table>/v<N>/`` (same relative layout) and write a JSON
  manifest (file list + sizes + total rows from footers). A hardlink pins
  the inode: when compaction/merge later deletes or replaces the live
  file, the snapshot's bytes survive at zero copy cost — the same
  object-permanence trick Iceberg gets from manifests over immutable
  object-store files. O(#files) metadata work, no data read.
* ``open_snapshot``    — read a pinned version (hive partition columns
  still parse — the snapshot tree preserves ``p_day=…/p_bucket=…``).
* ``rollback``         — make the live tree a hardlink copy of a snapshot:
  metadata-only restore after a bad merge/compaction.
* ``expire_snapshots`` — drop old versions; inodes free once the last
  link disappears (Iceberg's ``expire_snapshots`` file GC).

On a real deployment this layer is the Iceberg/Delta commit log itself
(immutable files + manifests; hardlinks are the single-filesystem stand-in
for immutability — this sandbox has no Iceberg runtime jar, see
sources/archive.py). The semantics exercised by the tests — read-after-
replace isolation, version pinning, rollback, expiry — are the portable
part.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from tstore_spark.sources.archive import PAGES_DIR

SNAP_DIR = "snapshots"


def _snap_root(base_dir: str, table: str) -> str:
    return os.path.join(base_dir, SNAP_DIR, table)


def _live_files(root: str) -> list[str]:
    out = []
    for dirpath, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                out.append(os.path.relpath(os.path.join(dirpath, f), root))
    return sorted(out)


def list_snapshots(base_dir: str, table: str = PAGES_DIR) -> list[int]:
    root = _snap_root(base_dir, table)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(e[1:]) for e in os.listdir(root) if e.startswith("v") and e[1:].isdigit()
    )


def snapshot_commit(base_dir: str, table: str = PAGES_DIR) -> int:
    """Pin the current live file set as the next version; returns it.

    The manifest also pins the archive's unified ``fact_schema`` AS OF the
    commit (when the table has one): schema is part of an Iceberg snapshot,
    and without it a version spanning a schema evolution would read through
    one sampled footer and silently drop the evolved columns (the
    fact_reader hazard, at the snapshot layer)."""
    live = os.path.join(base_dir, table)
    rels = _live_files(live)
    if not rels:
        raise ValueError(f"nothing to snapshot under {live}")
    version = (list_snapshots(base_dir, table) or [0])[-1] + 1
    vdir = os.path.join(_snap_root(base_dir, table), f"v{version}")
    manifest = {"version": version, "table": table}
    # Pin the schema BEFORE touching the filesystem so a failed read leaves
    # no half-built version dir. Non-archive roots (tier outputs) carry no
    # metadata file — that case (FileNotFoundError) legitimately skips
    # pinning. Anything else (corrupt JSON/YAML, transient IO) must fail
    # LOUDLY: silently committing an unpinned snapshot on a real archive
    # reproduces the sampled-footer schema-drop hazard this pinning exists
    # to prevent.
    try:
        from tstore_spark.sources.archive import read_metadata_all

        meta = read_metadata_all(base_dir)[2]
        if table == PAGES_DIR and "fact_schema" in meta:
            manifest["fact_schema"] = meta["fact_schema"]
    except FileNotFoundError:
        pass
    entries = []
    for rel in rels:
        src = os.path.join(live, rel)
        dst = os.path.join(vdir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(src, dst)
        entries.append({"path": rel, "bytes": os.path.getsize(src)})
    manifest["files"] = entries
    with open(os.path.join(vdir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return version


def read_manifest(base_dir: str, table: str, version: int) -> dict:
    vdir = os.path.join(_snap_root(base_dir, table), f"v{version}")
    with open(os.path.join(vdir, "manifest.json")) as f:
        return json.load(f)


def open_snapshot(
    spark: SparkSession, base_dir: str, version: int, table: str = PAGES_DIR
) -> DataFrame:
    """The table exactly as of ``version`` — unaffected by any compaction,
    merge, or retention that ran since."""
    vdir = os.path.join(_snap_root(base_dir, table), f"v{version}")
    manifest = read_manifest(base_dir, table, version)
    paths = [os.path.join(vdir, e["path"]) for e in manifest["files"]]
    reader = spark.read
    if "fact_schema" in manifest:
        from pyspark.sql.types import StructType

        reader = reader.schema(StructType.fromJson(json.loads(manifest["fact_schema"])))
    return reader.option("basePath", vdir).parquet(*paths)


def rollback(base_dir: str, version: int, table: str = PAGES_DIR) -> None:
    """Restore the live tree to ``version`` — metadata-only (hardlinks)."""
    live = os.path.join(base_dir, table)
    vdir = os.path.join(_snap_root(base_dir, table), f"v{version}")
    manifest = read_manifest(base_dir, table, version)
    tmp = live + ".rollback__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    for e in manifest["files"]:
        dst = os.path.join(tmp, e["path"])
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.link(os.path.join(vdir, e["path"]), dst)
    old = live + ".rollback__old"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(live, old)
    os.replace(tmp, live)
    shutil.rmtree(old)


def expire_snapshots(base_dir: str, table: str = PAGES_DIR, keep_last: int = 1) -> list[int]:
    """Drop all but the newest ``keep_last`` versions; data files whose last
    link lived in an expired snapshot are freed by the filesystem."""
    versions = list_snapshots(base_dir, table)
    dropped = versions[:-keep_last] if keep_last > 0 else versions
    for v in dropped:
        shutil.rmtree(os.path.join(_snap_root(base_dir, table), f"v{v}"))
    return dropped


def snapshot_diff(
    spark: SparkSession,
    base_dir: str,
    from_version: int,
    to_version: int,
    table: str = PAGES_DIR,
) -> DataFrame:
    """Change-data feed between two pinned versions: every row with a
    ``_change`` column ('insert' = present only in ``to``, 'delete' =
    present only in ``from``; an update appears as its delete + insert,
    multiset semantics — duplicate rows diff by count). Iceberg analog:
    the changelog scan between snapshot ids.

    Plan shape: two manifest-pinned scans + one exceptAll each way — the
    diff shuffles only the two snapshots' rows, and Catalyst prunes both
    scans to the columns the caller selects downstream."""
    from pyspark.sql import functions as F

    a = open_snapshot(spark, base_dir, from_version, table)
    b = open_snapshot(spark, base_dir, to_version, table)
    # schema evolution between versions: null-fill columns the other side
    # lacks (an evolved column reads as NULL on pre-evolution rows — the
    # same contract open_archive gives historical files), so the diff works
    # across an append_archive that added variables
    a_types = dict(zip(a.columns, [f.dataType for f in a.schema.fields]))
    b_types = dict(zip(b.columns, [f.dataType for f in b.schema.fields]))
    for c, t in b_types.items():
        if c not in a_types:
            a = a.withColumn(c, F.lit(None).cast(t))
    for c, t in a_types.items():
        if c not in b_types:
            b = b.withColumn(c, F.lit(None).cast(t))
    cols = list(b_types) + [c for c in a_types if c not in b_types]

    inserted = b.select(*cols).exceptAll(a.select(*cols)).withColumn(
        "_change", F.lit("insert")
    )
    deleted = a.select(*cols).exceptAll(b.select(*cols)).withColumn(
        "_change", F.lit("delete")
    )
    return inserted.unionByName(deleted)
