"""Schema evolution: append batches with new ts variables; old files
null-fill at read via the metadata schema (no mergeSchema footer sweep)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from tstore_spark.model.tslong import TSLong
from tstore_spark.sources.archive import (
    append_archive,
    open_archive,
    read_metadata,
    write_archive,
)


def _batch(day: str, n=300, with_extra=False) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    df = pd.DataFrame(
        {
            "sensor": (i % 7).astype(np.int64).astype(str),
            "ts": (pd.Timestamp(day) + pd.to_timedelta(i * 97 % 86400, unit="s")).astype(
                "datetime64[us]"
            ),
            "value": np.round((i * 13 % 1000) / 10.0, 2),
        }
    )
    if with_extra:
        df["value2"] = df["value"] * 2.0
    return df


@pytest.fixture()
def evolved_dir(spark, tmp_path):
    base = str(tmp_path / "evo")
    v1 = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-01")),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value"]},
    )
    write_archive(v1, base, num_buckets=2, check_static_uniqueness=False)
    v2 = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-02", with_extra=True)),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value", "value2"]},
    )
    append_archive(v2, base)
    return base


def test_evolved_read_union_schema(spark, evolved_dir):
    tl = open_archive(spark, evolved_dir, with_attributes=False)
    assert "value2" in tl.df.columns
    rows = tl.df.count()
    assert rows == 600
    # old partition null-fills the new column; new partition carries it
    old = tl.df.where(F.to_date("ts") == F.lit("2024-05-01"))
    new = tl.df.where(F.to_date("ts") == F.lit("2024-05-02"))
    assert old.where(F.col("value2").isNotNull()).count() == 0
    assert new.where(F.col("value2").isNull()).count() == 0
    assert new.where(F.col("value2") != F.col("value") * 2.0).count() == 0


def test_evolved_metadata_merged(evolved_dir):
    d, _ = read_metadata(evolved_dir)
    assert d.ts_vars == {"m": ["value", "value2"]}


def test_evolved_time_and_id_filters_still_prune(spark, evolved_dir):
    tl = open_archive(
        spark, evolved_dir, start_time="2024-05-02", end_time="2024-05-03",
        inclusive="left", ids=["3"], with_attributes=False,
    )
    assert tl.df.count() > 0
    assert tl.df.where(F.col("sensor") != "3").count() == 0


def test_append_guards(spark, evolved_dir):
    bad_key = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-03")).withColumnRenamed("sensor", "dev"),
        id_var="dev", time_var="ts", ts_vars={"m": ["value"]},
    )
    with pytest.raises(ValueError, match="id/time vars"):
        append_archive(bad_key, evolved_dir)

    retyped = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-03")).withColumn(
            "value", F.col("value").cast("string")
        ),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value"]},
    )
    with pytest.raises(ValueError, match="type changed"):
        append_archive(retyped, evolved_dir)


def test_rejected_append_leaves_archive_untouched(spark, evolved_dir):
    """A type-conflict append must validate BEFORE writing: no mixed-type
    data files land under pages/ and the archive stays fully readable."""
    retyped = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-09")).withColumn(
            "value", F.col("value").cast("string")
        ),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value"]},
    )
    with pytest.raises(ValueError, match="type changed"):
        append_archive(retyped, evolved_dir)
    tl = open_archive(spark, evolved_dir, with_attributes=False)
    assert tl.df.count() == 600  # the rejected batch's 300 rows never landed
    assert tl.df.where(F.to_date("ts") == F.lit("2024-05-09")).count() == 0
    assert dict(tl.df.dtypes)["value"] == "double"


def test_legacy_append_keeps_historical_columns(spark, tmp_path):
    """Appending to a pre-evolution archive (metadata without fact_schema)
    with a NARROWER batch must not drop historical columns: the unified
    schema is reconstructed from a stored file footer, not the new batch."""
    import json as _json
    import os as _os

    base = str(tmp_path / "legacy")
    v1 = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-01", with_extra=True)),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value", "value2"]},
    )
    write_archive(v1, base, num_buckets=2, check_static_uniqueness=False)
    # simulate a legacy archive: strip fact_schema from the metadata
    meta_path = _os.path.join(base, "tstore_metadata.json")
    with open(meta_path) as f:
        meta = _json.load(f)
    meta.pop("fact_schema")
    with open(meta_path, "w") as f:
        _json.dump(meta, f)

    narrow = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-02")),  # no value2
        id_var="sensor", time_var="ts", ts_vars={"m": ["value"]},
    )
    append_archive(narrow, base)
    tl = open_archive(spark, base, with_attributes=False)
    assert "value2" in tl.df.columns  # historical column survived
    assert tl.df.count() == 600
    old = tl.df.where(F.to_date("ts") == F.lit("2024-05-01"))
    assert old.where(F.col("value2").isNull()).count() == 0
    new = tl.df.where(F.to_date("ts") == F.lit("2024-05-02"))
    assert new.where(F.col("value2").isNotNull()).count() == 0


def test_plain_append_no_evolution(spark, tmp_path):
    base = str(tmp_path / "plain")
    v1 = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-01")),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value"]},
    )
    write_archive(v1, base, num_buckets=2, check_static_uniqueness=False)
    v2 = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-02")),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value"]},
    )
    append_archive(v2, base)
    tl = open_archive(spark, base, with_attributes=False)
    assert tl.df.count() == 600
    assert set(tl.df.columns) == {"sensor", "ts", "value"}


def _frag_evolved(spark, base):
    """Append a second batch per day so both days' dirs are fragmented
    (old-schema files stay old-schema: the rewrite must not need them to
    carry the evolved column)."""
    v1b = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-01").assign(value=lambda d: d.value + 0.5)),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value"]},
    )
    # duplicate (sensor, ts) keys across appends are fine for maintenance tests
    append_archive(v1b, base)
    v2b = TSLong.wrap(
        spark.createDataFrame(_batch("2024-05-02", with_extra=True).assign(value=lambda d: d.value + 0.5)),
        id_var="sensor", time_var="ts", ts_vars={"m": ["value", "value2"]},
    )
    append_archive(v2b, base)


def test_compact_preserves_evolved_columns(spark, evolved_dir):
    """Compaction rewrites then DELETES the originals — on an evolved archive
    a footer-inferred schema (old day sampled) would permanently drop the
    evolved column from the rewritten partitions."""
    import os

    from tstore_spark.sources.compact import compact_archive

    _frag_evolved(spark, evolved_dir)
    summary = compact_archive(spark, evolved_dir, target_file_bytes=1 << 30)
    assert summary["partitions_compacted"] > 0

    tl = open_archive(spark, evolved_dir, with_attributes=False)
    assert "value2" in tl.df.columns
    new = tl.df.where(F.to_date("ts") == F.lit("2024-05-02"))
    assert new.count() == 600
    assert new.where(F.col("value2").isNull()).count() == 0
    old = tl.df.where(F.to_date("ts") == F.lit("2024-05-01"))
    assert old.count() == 600
    assert old.where(F.col("value2").isNotNull()).count() == 0


def test_merge_upsert_preserves_evolved_columns(spark, evolved_dir):
    """Upserting into a pre-evolution partition: the copy-on-write base read
    must carry the evolved column (old files lack it entirely) or the
    union with the update batch fails / drops it."""
    from tstore_spark.sources.merge import merge_upsert

    up = _batch("2024-05-01", n=5, with_extra=True)
    rep = merge_upsert(spark, evolved_dir, spark.createDataFrame(up))
    assert rep["rows_updated"] == 5

    tl = open_archive(spark, evolved_dir, with_attributes=False)
    assert tl.df.count() == 600
    touched = tl.df.where(F.col("value2").isNotNull() & (F.to_date("ts") == F.lit("2024-05-01")))
    assert touched.count() == 5
    bad = touched.where(F.abs(F.col("value2") - F.col("value") * 2.0) > 1e-9)
    assert bad.count() == 0


def test_delete_where_on_evolved_column(spark, evolved_dir):
    """DELETE with a predicate on the evolved column must see it on every
    file (old files null-fill; null predicate rows are keepers)."""
    from tstore_spark.sources.merge import delete_where

    rep = delete_where(spark, evolved_dir, F.col("value2") > 150.0)
    assert rep["rows_deleted"] > 0
    tl = open_archive(spark, evolved_dir, with_attributes=False)
    assert tl.df.where(F.col("value2") > 150.0).count() == 0
    # pre-evolution rows (value2 NULL) are untouched keepers
    assert tl.df.where(F.to_date("ts") == F.lit("2024-05-01")).count() == 300


def test_zonemaps_on_evolved_column(spark, evolved_dir):
    """Zone maps over a column absent from pre-evolution files: NULL stats
    (always keep), never a KeyError in the footer job."""
    import os

    from tstore_spark.sources.archive import PAGES_DIR
    from tstore_spark.sources.zonemaps import prune_paths, zone_maps

    root = os.path.join(evolved_dir, PAGES_DIR)
    zm = zone_maps(spark, root, ["value2"], materialize=False)
    pdf = zm.toPandas()
    old_files = pdf["path"].str.contains("p_day=2024-05-01")
    assert old_files.any() and (~old_files).any()
    assert pdf.loc[old_files, "value2_min"].isna().all()
    assert pdf.loc[~old_files, "value2_min"].notna().all()

    # a range above the real max prunes every NEW file but conservatively
    # keeps every NULL-stat (pre-evolution) file
    keep, total = prune_paths(zm, {"value2": (1000.0, None)})
    assert total == len(pdf)
    assert sorted(keep) == sorted(pdf.loc[old_files, "path"])
