"""Snapshots: version pinning across destructive maintenance, rollback,
expiry, and zero-copy behavior (hardlinks, not data copies)."""

import os

import pytest
from pyspark.sql import functions as F

from tstore_spark.functions.urls import domain_of
from tstore_spark.model.tslong import TSLong
from tstore_spark.sources.archive import PAGES_DIR, open_archive, write_archive
from tstore_spark.sources.compact import compact_archive
from tstore_spark.sources.merge import merge_upsert
from tstore_spark.sources.snapshots import (
    expire_snapshots,
    list_snapshots,
    open_snapshot,
    rollback,
    snapshot_commit,
)


@pytest.fixture()
def archive(spark, pages_sdf, tmp_path):
    base = str(tmp_path / "archive")
    pages = pages_sdf.withColumn("domain", domain_of("url"))
    tsl = TSLong.wrap(
        pages, id_var="domain", time_var="warc_ts",
        ts_vars={"content": ["url", "html", "text", "lang"]},
    )
    write_archive(tsl, base, num_buckets=2, check_static_uniqueness=False)
    return base


def _digest(df):
    cols = sorted(df.columns)
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in cols]))).alias("h"),
    ).head()
    return (row["n"], row["h"])


def test_snapshot_survives_merge_and_compaction(spark, archive):
    live0 = open_archive(spark, archive, with_attributes=False).df
    d0 = _digest(live0)
    v1 = snapshot_commit(archive)
    assert v1 == 1 and list_snapshots(archive) == [1]

    batch = (
        live0.orderBy("domain", "warc_ts").limit(3)
        .withColumn("lang", F.lit("zz")).localCheckpoint()
    )
    merge_upsert(spark, archive, batch)
    root = os.path.join(archive, PAGES_DIR)
    frag = spark.read.option("basePath", root).parquet(root).repartition(4)
    frag.write.mode("overwrite").partitionBy("p_day", "p_bucket").parquet(root)
    compact_archive(spark, archive, target_file_bytes=1 << 30)

    # pinned version still reads the ORIGINAL rows, live reads the merged ones
    snap = open_snapshot(spark, archive, v1).drop("p_day", "p_bucket")
    assert _digest(snap) == d0
    live1 = open_archive(spark, archive, with_attributes=False).df
    assert _digest(live1) != d0
    assert live1.where(F.col("lang") == "zz").count() == 3


def test_rollback_restores_exactly(spark, archive):
    live0 = open_archive(spark, archive, with_attributes=False).df
    d0 = _digest(live0)
    v1 = snapshot_commit(archive)
    batch = (
        live0.orderBy("domain", "warc_ts").limit(2)
        .withColumn("lang", F.lit("yy")).localCheckpoint()
    )
    merge_upsert(spark, archive, batch)
    rollback(archive, v1)
    assert _digest(open_archive(spark, archive, with_attributes=False).df) == d0


def test_snapshots_are_hardlinks_not_copies(spark, archive):
    root = os.path.join(archive, PAGES_DIR)
    snapshot_commit(archive)
    for dirpath, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                # every live file now has >= 2 links (live + snapshot)
                assert os.stat(os.path.join(dirpath, f)).st_nlink >= 2


def test_expire_snapshots(spark, archive):
    v1 = snapshot_commit(archive)
    v2 = snapshot_commit(archive)
    dropped = expire_snapshots(archive, keep_last=1)
    assert dropped == [v1] and list_snapshots(archive) == [v2]
    # the surviving snapshot still reads
    assert open_snapshot(spark, archive, v2).count() > 0


def test_maintenance_job_smoke(spark, archive, tmp_path):
    """CLI loop: snapshot -> fragment -> compact (auto-snapshots) -> expire."""
    import json
    import subprocess
    import sys

    root = os.path.join(archive, PAGES_DIR)
    frag = spark.read.option("basePath", root).parquet(root).repartition(4)
    frag.write.mode("overwrite").partitionBy("p_day", "p_bucket").parquet(root)

    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    run = lambda *a: json.loads(subprocess.run(
        [sys.executable, "jobs/maintenance_job.py", "--archive", archive, *a],
        capture_output=True, text=True, check=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip().splitlines()[-1])

    s = run("snapshot")
    assert s["version"] == 1
    c = run("compact", "--target-mb", "1024")
    assert c["pre_snapshot"] == 2 and c["summary"]["partitions_compacted"] > 0
    # re-fragment, then the ZORDER BY variant of compact through the CLI
    frag2 = spark.read.option("basePath", root).parquet(root).repartition(4)
    frag2.write.mode("overwrite").partitionBy("p_day", "p_bucket").parquet(root)
    z = run("--no-snapshot", "compact", "--target-mb", "1024",
            "--zorder-by", "warc_ts,p_bucket")
    assert z["summary"]["partitions_compacted"] > 0

    e = run("expire", "--keep-last", "1")
    assert e["dropped_versions"] == [1] and list_snapshots(archive) == [2]


def test_snapshot_diff_is_the_merge_delta(spark, archive):
    from tstore_spark.sources.snapshots import snapshot_diff

    live0 = open_archive(spark, archive, with_attributes=False).df
    v1 = snapshot_commit(archive)
    victims = live0.orderBy("domain", "warc_ts").limit(2).localCheckpoint()
    batch = victims.withColumn("lang", F.lit("zz")).unionByName(
        victims.withColumn("domain", F.concat(F.lit("new-"), "domain"))
    )
    merge_upsert(spark, archive, batch)
    v2 = snapshot_commit(archive)

    diff = snapshot_diff(spark, archive, v1, v2).drop("p_day", "p_bucket")
    ins = diff.where(F.col("_change") == "insert").drop("_change")
    dele = diff.where(F.col("_change") == "delete").drop("_change")
    # inserts == exactly the merge batch; deletes == the pre-merge victims
    assert ins.exceptAll(batch).count() == 0 and batch.exceptAll(ins).count() == 0
    assert dele.exceptAll(victims).count() == 0 and victims.exceptAll(dele).count() == 0


def test_snapshot_diff_across_schema_evolution(spark, archive):
    """CDC between a pre-evolution and post-evolution snapshot: the evolved
    column null-fills on the old side (the open_archive contract) instead
    of crashing the diff with a missing-column error."""
    from tstore_spark.sources.archive import append_archive
    from tstore_spark.sources.snapshots import snapshot_diff

    v1 = snapshot_commit(archive)
    live = open_archive(spark, archive, with_attributes=False).df
    one = live.orderBy("domain", "warc_ts").limit(1).localCheckpoint()
    batch = one.select(
        "domain",
        (F.col("warc_ts") + F.expr("INTERVAL 400 DAYS")).alias("warc_ts"),
        "url", "html", "text", "lang",
        F.lit(0.9).alias("quality"),  # NEW variable -> schema evolution
    )
    append_archive(TSLong.wrap(
        batch, id_var="domain", time_var="warc_ts",
        ts_vars={"content": ["url", "html", "text", "lang", "quality"]},
    ), archive)
    v2 = snapshot_commit(archive)

    diff = snapshot_diff(spark, archive, v1, v2)
    ins = diff.where(F.col("_change") == "insert")
    assert diff.where(F.col("_change") == "delete").count() == 0
    rows = ins.select("quality").collect()
    assert len(rows) == 1 and rows[0]["quality"] == pytest.approx(0.9)


def test_commit_fails_loudly_on_corrupt_metadata(spark, archive):
    """A readable-but-corrupt metadata file must abort the commit, not
    silently produce an unpinned snapshot (which would reproduce the
    sampled-footer schema-drop hazard the pinning exists to prevent).
    Only a genuinely ABSENT metadata file (tier tables) skips pinning."""
    import json as _json

    from tstore_spark.sources.archive import METADATA_FILE

    meta_path = os.path.join(archive, METADATA_FILE)
    good = open(meta_path).read()
    try:
        with open(meta_path, "w") as f:
            f.write("{not json")
        with pytest.raises(_json.JSONDecodeError):
            snapshot_commit(archive)
    finally:
        with open(meta_path, "w") as f:
            f.write(good)
    assert snapshot_commit(archive) >= 1
