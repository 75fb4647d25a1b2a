"""MERGE/upsert: matched-update + unmatched-insert semantics, partition
scoping (untouched dirs never rewritten), key-uniqueness guard, new-partition
creation, and determinism of the merged rows."""

import os

import pytest
from pyspark.sql import functions as F

from tstore_spark.functions.urls import domain_of
from tstore_spark.model.tslong import TSLong
from tstore_spark.sources.archive import PAGES_DIR, open_archive, write_archive
from tstore_spark.sources.merge import merge_upsert


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


def _mtimes(root):
    out = {}
    for dirpath, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[p] = os.path.getmtime(p)
    return out


def test_update_and_insert(spark, archive):
    before = open_archive(spark, archive, with_attributes=False).df
    fact_cols = before.columns
    n_before = before.count()

    # update: rewrite lang for one (domain, warc_ts) slice; insert: brand-new
    # domain. The batch is MATERIALIZED (localCheckpoint) because merge swaps
    # the underlying files — a lazy plan over the old files would fail after.
    victims = before.orderBy("domain", "warc_ts").limit(5).select(*fact_cols)
    updates = victims.withColumn("lang", F.lit("xx"))
    new_rows = victims.withColumn("domain", F.concat(F.lit("new-"), "domain"))
    batch = updates.unionByName(new_rows).localCheckpoint()

    summary = merge_upsert(spark, archive, batch)
    assert summary["rows_updated"] == 5

    after = open_archive(spark, archive, with_attributes=False).df
    assert after.count() == n_before + 5
    got = {
        (r["domain"], r["warc_ts"]): r["lang"]
        for r in after.join(batch.select("domain", "warc_ts"), ["domain", "warc_ts"], "left_semi").collect()
    }
    exp = {(r["domain"], r["warc_ts"]): r["lang"] for r in batch.collect()}
    assert got == exp


def test_untouched_partitions_not_rewritten(spark, archive):
    root = os.path.join(archive, PAGES_DIR)
    before = open_archive(spark, archive, with_attributes=False).df
    one = before.orderBy("domain", "warc_ts").limit(1).localCheckpoint()
    mt_before = _mtimes(root)
    merge_upsert(spark, archive, one.withColumn("lang", F.lit("zz")))
    mt_after = _mtimes(root)
    changed = {p for p in mt_before if mt_before[p] != mt_after.get(p, -1)}
    # exactly one leaf directory rewritten
    dirs = {os.path.dirname(p) for p in changed}
    assert len(dirs) == 1
    untouched = set(mt_before) - changed
    assert untouched and all(mt_after[p] == mt_before[p] for p in untouched)


def test_new_partition_created(spark, archive):
    before = open_archive(spark, archive, with_attributes=False).df
    one = before.orderBy("domain", "warc_ts").limit(1).localCheckpoint()
    moved = one.withColumn("warc_ts", F.expr("timestampadd(DAY, 400, warc_ts)"))
    summary = merge_upsert(spark, archive, moved)
    assert summary["partitions_created"] == 1
    after = open_archive(spark, archive, with_attributes=False).df
    assert after.count() == before.count() + 1


def test_duplicate_key_batch_rejected(spark, archive):
    before = open_archive(spark, archive, with_attributes=False).df
    one = before.orderBy("domain", "warc_ts").limit(1)
    with pytest.raises(ValueError, match="duplicate"):
        merge_upsert(spark, archive, one.unionByName(one))


def test_missing_column_rejected(spark, archive):
    before = open_archive(spark, archive, with_attributes=False).df
    with pytest.raises(ValueError, match="missing fact columns"):
        merge_upsert(spark, archive, before.drop("lang").limit(1))


# -- delete_where --------------------------------------------------------------

def test_delete_where_rows(spark, archive):
    from tstore_spark.sources.merge import delete_where

    before = open_archive(spark, archive, with_attributes=False).df
    n_before = before.count()
    n_match = before.where(F.col("lang") == "en").count()
    assert 0 < n_match < n_before

    summary = delete_where(spark, archive, F.col("lang") == "en")
    assert summary["rows_deleted"] == n_match

    after = open_archive(spark, archive, with_attributes=False).df
    assert after.count() == n_before - n_match
    assert after.where(F.col("lang") == "en").count() == 0


def test_delete_where_untouched_partitions_not_rewritten(spark, archive):
    from tstore_spark.sources.merge import delete_where

    before = open_archive(spark, archive, with_attributes=False).df
    victim = before.orderBy("domain", "warc_ts").head()
    root = os.path.join(archive, PAGES_DIR)
    mt_before = _mtimes(root)
    s = delete_where(
        spark, archive,
        (F.col("domain") == victim["domain"]) & (F.col("warc_ts") == victim["warc_ts"]),
    )
    assert s["rows_deleted"] >= 1 and s["partitions_touched"] == 1
    mt_after = _mtimes(root)
    changed_dirs = {
        os.path.dirname(p) for p in mt_before if mt_before[p] != mt_after.get(p, -1)
    }
    assert len(changed_dirs) == 1


def test_delete_where_no_match_noop(spark, archive):
    from tstore_spark.sources.merge import delete_where

    s = delete_where(spark, archive, F.col("lang") == "nonexistent-lang")
    assert s == {"partitions_touched": 0, "rows_deleted": 0}


def test_delete_where_sql_string_predicate(spark, archive):
    from tstore_spark.sources.merge import delete_where

    before = open_archive(spark, archive, with_attributes=False).df.count()
    s = delete_where(spark, archive, "lang = 'de'")
    after = open_archive(spark, archive, with_attributes=False).df.count()
    assert after == before - s["rows_deleted"]
