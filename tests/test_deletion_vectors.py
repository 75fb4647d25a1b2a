"""Positional deletion vectors: merge-on-read deletes, purge-to-rewrite."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.model.tslong import TSLong
from tstore_spark.sources.archive import open_archive, write_archive
from tstore_spark.sources.deletion_vectors import (
    delete_where_dv,
    has_pending_deletes,
    purge_deletes,
    read_with_deletes,
)


@pytest.fixture()
def archive(spark, tmp_path):
    pdf = pd.DataFrame(
        {
            "id": [str(i) for i in range(100)],
            "ts": pd.to_datetime("2024-03-01") + pd.to_timedelta(range(100), unit="h"),
            "kind": ["err" if i % 5 == 0 else "ok" for i in range(100)],
            "v": [float(i) for i in range(100)],
        }
    )
    tl = TSLong.wrap(
        spark.createDataFrame(pdf), id_var="id", time_var="ts",
        ts_vars={"m": ["kind", "v"]},
    )
    base = str(tmp_path / "arch")
    write_archive(tl, base, num_buckets=2, check_static_uniqueness=False)
    return base


def test_dv_delete_is_merge_on_read(spark, archive):
    assert not has_pending_deletes(archive)
    s = delete_where_dv(spark, archive, F.col("kind") == "err")
    assert s["rows_deleted"] == 20
    assert has_pending_deletes(archive)
    # data files untouched: the raw scan still shows every row
    assert open_archive(spark, archive, with_attributes=False).df.count() == 100
    mor = read_with_deletes(spark, archive)
    assert mor.count() == 80
    assert mor.where("kind = 'err'").count() == 0


def test_dv_duplicate_tombstones_harmless(spark, archive):
    delete_where_dv(spark, archive, F.col("kind") == "err")
    delete_where_dv(spark, archive, F.col("kind") == "err")  # same rows again
    assert read_with_deletes(spark, archive).count() == 80


def test_dv_purge_rewrites_and_clears(spark, archive):
    delete_where_dv(spark, archive, F.col("kind") == "err")
    delete_where_dv(spark, archive, F.col("v") >= 90.0)
    summary = purge_deletes(spark, archive)
    assert summary["partitions_touched"] >= 1
    assert not has_pending_deletes(archive)
    back = open_archive(spark, archive, with_attributes=False).df
    assert back.count() == 100 - 20 - 8  # v in {90..99} minus err overlaps 90,95
    assert back.where("kind = 'err' OR v >= 90.0").count() == 0
    # MoR read over a clean table is the plain scan
    assert read_with_deletes(spark, archive).count() == back.count()


def test_dv_full_partition_delete_disappears(spark, archive):
    # tombstone EVERY row, purge: partitions vanish, table reads empty
    delete_where_dv(spark, archive, F.lit(True))
    assert read_with_deletes(spark, archive).count() == 0
    purge_deletes(spark, archive)
    assert open_archive(spark, archive, with_attributes=False).df.count() == 0


def test_dv_purge_noop_without_tombstones(spark, archive):
    assert purge_deletes(spark, archive) == {"partitions_touched": 0}
    assert open_archive(spark, archive, with_attributes=False).df.count() == 100


def test_dv_matches_cow_delete_semantics(spark, archive):
    # the MoR survivors equal the copy-on-write delete_where survivors
    from tstore_spark.sources.merge import delete_where

    delete_where_dv(spark, archive, F.col("v") % 7 == 0)
    mor = sorted(
        map(tuple, read_with_deletes(spark, archive).select("id", "kind", "v").collect())
    )
    purge_deletes(spark, archive)  # reset to a clean physical table state
    cow_base = archive  # same archive now physically matches MoR view
    cow = sorted(
        map(
            tuple,
            open_archive(spark, cow_base, with_attributes=False)
            .df.select("id", "kind", "v")
            .collect(),
        )
    )
    assert mor == cow
    assert delete_where(spark, cow_base, F.col("v") % 7 == 0)["rows_deleted"] == 0


def test_maintenance_compact_purges_pending_tombstones(spark, archive, capsys):
    # the Iceberg sequencing rule, enforced by the CLI: compaction must fold
    # pending tombstones first or the rewrite would resurrect deleted rows
    import json

    from tstore_spark.jobs.maintenance_job import main

    delete_where_dv(spark, archive, F.col("kind") == "err")
    rc = main(["--archive", archive, "--no-snapshot", "compact", "--target-mb", "1024"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["purged_deletes"]["partitions_touched"] >= 1
    assert not has_pending_deletes(archive)
    back = open_archive(spark, archive, with_attributes=False).df
    assert back.count() == 80 and back.where("kind = 'err'").count() == 0

    # purge-deletes as its own subcommand is a clean no-op when nothing pends
    rc = main(["--archive", archive, "--no-snapshot", "purge-deletes"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["summary"] == {"partitions_touched": 0}
