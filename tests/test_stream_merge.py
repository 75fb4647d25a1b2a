"""Streaming CDC apply (foreachBatch MERGE) vs its batch twin."""

import os

import pytest
from pyspark.sql import functions as F

from tstore_spark.functions.urls import domain_of
from tstore_spark.model.tslong import TSLong
from tstore_spark.sources.archive import open_archive, write_archive
from tstore_spark.streaming.stream_merge import (
    apply_stream_upserts,
    collapse_last_writer,
    upsert_twin,
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


def _change_files(spark, archive, src_dir, n_files=3):
    """Three change files over the archive: updates to existing keys (one
    key updated twice across files, order_col rising) + fresh inserts."""
    before = open_archive(spark, archive, with_attributes=False).df
    fact_cols = before.columns
    victims = (
        before.orderBy("domain", "warc_ts").limit(6).select(*fact_cols)
        .localCheckpoint()
    )
    files = []
    ordered = victims.orderBy("domain", "warc_ts")
    for i in range(n_files):
        upd = ordered.limit(2 + i).withColumn("lang", F.lit(f"v{i}"))
        ins = (
            ordered.limit(1)
            .withColumn("domain", F.concat(F.lit(f"new{i}-"), "domain"))
            .withColumn("lang", F.lit(f"v{i}"))
        )
        batch = upd.unionByName(ins).withColumn("seq", F.lit(i))
        path = os.path.join(src_dir, f"f{i}")
        batch.coalesce(1).write.parquet(path)
        files.append(path)
    return files


def _run(spark, archive, src_dir, schema, checkpoint):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/f*")
    )
    q = apply_stream_upserts(
        stream, archive, order_col="seq", checkpoint=checkpoint
    )
    q.awaitTermination(180)


def test_stream_apply_matches_batch_twin(spark, archive, tmp_path):
    src = str(tmp_path / "changes")
    os.makedirs(src)
    before = open_archive(spark, archive, with_attributes=False).df
    base_snapshot = before.localCheckpoint()
    _change_files(spark, archive, src)
    all_changes = spark.read.option("basePath", src).parquet(src + "/f*")

    _run(spark, archive, src, all_changes.schema, str(tmp_path / "ckpt"))

    after = open_archive(spark, archive, with_attributes=False).df
    want = upsert_twin(
        spark, base_snapshot, all_changes.localCheckpoint(),
        ["domain", "warc_ts"], order_col="seq",
    ).select(*after.columns)
    assert after.count() == want.count()
    assert after.exceptAll(want).count() == 0
    assert want.exceptAll(after).count() == 0
    # the twice-updated key carries the LAST writer's lang
    langs = {r["lang"] for r in after.join(
        base_snapshot.select("domain", "warc_ts"), ["domain", "warc_ts"]
    ).select("lang").distinct().collect()}
    assert "v2" in langs and "v0" not in langs and "v1" not in langs


def _applied_markers(archive):
    out = []
    for dp, _d, fs in os.walk(archive + "/_stream_merge/pages"):
        out += [os.path.join(os.path.basename(dp), f) for f in fs if f.startswith("applied_")]
    return sorted(out)


def test_restart_is_idempotent(spark, archive, tmp_path):
    src = str(tmp_path / "changes")
    os.makedirs(src)
    _change_files(spark, archive, src)
    schema = spark.read.parquet(src + "/f0").schema
    ckpt = str(tmp_path / "ckpt")

    _run(spark, archive, src, schema, ckpt)
    state1 = open_archive(spark, archive, with_attributes=False).df.localCheckpoint()
    ledger = _applied_markers(archive)

    # second availableNow run over the same checkpoint: no new files, table
    # unchanged, ledger unchanged
    _run(spark, archive, src, schema, ckpt)
    state2 = open_archive(spark, archive, with_attributes=False).df
    assert state2.exceptAll(state1).count() == 0
    assert state1.exceptAll(state2).count() == 0
    ledger2 = _applied_markers(archive)
    assert sorted(ledger) == sorted(ledger2)


def test_collapse_last_writer_deterministic(spark):
    df = spark.createDataFrame(
        [("a", 1, 10, "x"), ("a", 1, 20, "y"), ("a", 1, 20, "z"), ("b", 2, 5, "w")],
        "k string, t int, seq int, v string",
    )
    out1 = {(r["k"], r["t"]): r["v"]
            for r in collapse_last_writer(df.repartition(1), ["k", "t"], "seq").collect()}
    out7 = {(r["k"], r["t"]): r["v"]
            for r in collapse_last_writer(df.repartition(7), ["k", "t"], "seq").collect()}
    assert out1 == out7
    assert out1[("b", 2)] == "w"
    assert out1[("a", 1)] in ("y", "z")  # seq tie -> stable hash pick, same both runs


def test_fresh_checkpoint_gets_its_own_ledger(spark, archive, tmp_path):
    """Batch ids restart at 0 in a new checkpoint; markers must not be
    shared across checkpoints or the new stream's batches are skipped."""
    src = str(tmp_path / "changes")
    os.makedirs(src)
    _change_files(spark, archive, src)
    schema = spark.read.parquet(src + "/f0").schema
    _run(spark, archive, src, schema, str(tmp_path / "ckptA"))
    n_a = len(_applied_markers(archive))
    _run(spark, archive, src, schema, str(tmp_path / "ckptB"))
    n_b = len(_applied_markers(archive))
    assert n_a == 3 and n_b == 6  # second checkpoint re-applied (idempotent merge)
