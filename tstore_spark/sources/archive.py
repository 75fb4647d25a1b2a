"""The on-disk archive — tstore's "TStore" layout re-expressed for Spark.

Reference layout (tstore/archive/io.py:28-48):

    <base_dir>/tstore_metadata.yaml     # id_var, ts_variables, partitioning
    <base_dir>/_attributes.parquet      # one row per id: statics
    <base_dir>/<id>/<var>/year=Y/month=M/part-*.parquet

Spark-native layout (this module):

    <base_dir>/tstore_metadata.json     # descriptor + bucket count
    <base_dir>/attributes/              # dimension table (broadcast at read)
    <base_dir>/pages/p_day=D/p_bucket=B/part-*.parquet
    <base_dir>/rollup_1m|1h|1d/p_day=D/...
    <base_dir>/lineage/  metrics/       # small bookkeeping tables

``p_day``/``p_bucket`` emulate Iceberg's hidden ``days(warc_ts)`` /
``bucket(N, url)`` transforms (no Iceberg runtime jar in this sandbox): they
are derived at write, pruned by Catalyst on time/id predicates, and dropped
from the logical schema at read — so queries never see them, exactly like
hidden partitioning. The per-id directory fan-out of the reference (a Python
loop, tstore/tslong/pandas.py:93-139) becomes a single distributed
``repartition(p_day, p_bucket).sortWithinPartitions(time)`` write.

Scale notes: one file set per (day, bucket); choose ``num_buckets`` so a
bucket-day is ~0.5-1 GB at target scale. Sorting within partitions by
(url, warc_ts) gives Parquet min/max stats that make id-range row-group
skipping effective.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tstore_spark.functions.filters import time_range_filter
from tstore_spark.functions.timeparts import bucket_column
from tstore_spark.model.descriptor import TableDescriptor
from tstore_spark.model.tslong import TSLong

METADATA_FILE = "tstore_metadata.json"
PAGES_DIR = "pages"
ATTRS_DIR = "attributes"


# -- metadata (reference tstore/archive/metadata/{writers,readers}.py) -------

def write_metadata(base_dir: str, descriptor: TableDescriptor, num_buckets: int) -> None:
    """Write the descriptor as BOTH json and yaml (same dict) — the yaml
    mirror matches the reference's metadata format family
    (tstore/archive/metadata/writers.py:22-35) so yaml-first tooling can
    introspect a Spark-native archive; read_metadata accepts either."""
    meta = descriptor.to_dict() | {"num_buckets": num_buckets, "tstore_structure": "spark-hidden-partition"}
    os.makedirs(base_dir, exist_ok=True)
    with open(os.path.join(base_dir, METADATA_FILE), "w") as f:
        json.dump(meta, f, indent=2, sort_keys=True)
    import yaml

    with open(os.path.join(base_dir, METADATA_FILE.replace(".json", ".yaml")), "w") as f:
        yaml.dump(meta, f)


def read_metadata(base_dir: str) -> tuple[TableDescriptor, int]:
    json_path = os.path.join(base_dir, METADATA_FILE)
    if os.path.exists(json_path):
        with open(json_path) as f:
            meta = json.load(f)
    else:
        import yaml

        with open(os.path.join(base_dir, METADATA_FILE.replace(".json", ".yaml"))) as f:
            meta = yaml.safe_load(f)
    return TableDescriptor.from_dict(meta), int(meta["num_buckets"])


# -- write path (reference write lifecycle, SURVEY §3.1) ----------------------

def write_archive(
    tslong: TSLong,
    base_dir: str,
    attrs: DataFrame | None = None,
    num_buckets: int = 8,
    mode: str = "overwrite",
    check_static_uniqueness: bool = True,
    stats_columns: dict | None = None,
) -> None:
    """Write the long table + attributes + metadata in one distributed pass.

    stats_columns: name -> Column of ingest-time derived stats (e.g.
    ``{"html_bytes": F.octet_length("html"), "text_len": F.length("text")}``)
    materialized alongside the payloads. Downstream rollups then scan the
    narrow stat columns and Parquet prunes the payloads entirely — the
    difference between a payload-bandwidth scan and a metadata scan at 100 TB.
    """
    d = tslong.descriptor
    df = tslong.df

    if check_static_uniqueness and d.static_vars:
        tslong.check_static_uniqueness()

    # attributes dimension: distinct (id, statics) — reference tslong/pandas.py:59-81
    if attrs is None and d.static_vars:
        attrs = df.select(d.id_var, *d.static_vars).dropDuplicates([d.id_var])
    if attrs is not None:
        attrs.coalesce(1).write.mode(mode).parquet(os.path.join(base_dir, ATTRS_DIR))

    # fact table: hidden-partition emulation; statics live in the dimension only
    fact_cols = [d.id_var, d.time_var, *d.ts_columns]
    fact = df.select(*fact_cols)
    for name, col in (stats_columns or {}).items():
        fact = fact.withColumn(name, col)
    fact = (
        fact.withColumn("p_day", F.to_date(F.col(d.time_var)))
        .withColumn("p_bucket", bucket_column(d.id_var, num_buckets))
    )
    (
        fact.repartition("p_day", "p_bucket")
        .sortWithinPartitions(d.id_var, d.time_var)
        .write.mode(mode)
        .partitionBy("p_day", "p_bucket")
        .parquet(os.path.join(base_dir, PAGES_DIR))
    )
    write_metadata(base_dir, d, num_buckets)


# -- read path (reference read lifecycle, SURVEY §3.2) ------------------------

def open_archive(
    spark: SparkSession,
    base_dir: str,
    ts_variables: list[str] | None = None,
    start_time=None,
    end_time=None,
    inclusive: str = "both",
    ids: list[str] | None = None,
    columns: list[str] | None = None,
    with_attributes: bool = True,
) -> TSLong:
    """Open the archive as a TSLong; one Catalyst plan does scan + prune +
    filter + broadcast-join (the reference's steps 2-4 collapsed)."""
    d, num_buckets = read_metadata(base_dir)
    df = spark.read.parquet(os.path.join(base_dir, PAGES_DIR))

    # partition pruning: day from the time range, bucket from the id list
    if start_time is not None or end_time is not None:
        is_ntz = dict(df.dtypes).get(d.time_var) == "timestamp_ntz"
        df = df.where(time_range_filter(d.time_var, start_time, end_time, inclusive, ntz=is_ntz))
        if start_time is not None:
            df = df.where(F.col("p_day") >= F.to_date(F.lit(str(start_time))))
        if end_time is not None:
            df = df.where(F.col("p_day") <= F.to_date(F.lit(str(end_time))))
    if ids is not None:
        ids = [str(i) for i in ids]
        df = df.where(F.col(d.id_var).isin(ids))
        buckets = sorted({_bucket_of(spark, i, num_buckets) for i in ids})
        df = df.where(F.col("p_bucket").isin(buckets))

    df = df.drop("p_day", "p_bucket")  # hidden partitioning: logical schema never sees them

    statics: list[str] = []
    if with_attributes and os.path.isdir(os.path.join(base_dir, ATTRS_DIR)):
        attrs = spark.read.parquet(os.path.join(base_dir, ATTRS_DIR))
        statics = [c for c in attrs.columns if c != d.id_var]
        df = df.join(F.broadcast(attrs), d.id_var, "left")

    wrapped = TSLong(
        df,
        TableDescriptor(d.id_var, d.time_var, d.ts_vars, statics, d.partitioning),
    )
    return wrapped.query(ts_variables=ts_variables, columns=columns) if (ts_variables or columns) else wrapped


def _bucket_of(spark: SparkSession, value: str, num_buckets: int) -> int:
    """Driver-side evaluation of the bucket transform for pruning."""
    row = spark.range(1).select(bucket_column(F.lit(value), num_buckets).alias("b")).head()
    return int(row["b"])


# -- retention (north rule: per-tier expiry) ----------------------------------

def apply_retention(base_dir: str, table: str, keep_days_after: str) -> list[str]:
    """Drop partition directories with p_day < cutoff. With Iceberg this is
    ``DELETE WHERE`` + ``expire_snapshots``; on the Parquet fallback it is
    partition-directory removal — an O(#partitions) metadata operation either
    way, never a data rewrite."""
    root = os.path.join(base_dir, table)
    dropped = []
    if not os.path.isdir(root):
        return dropped
    for entry in sorted(os.listdir(root)):
        if entry.startswith("p_day=") and entry.split("=", 1)[1] < keep_days_after:
            shutil.rmtree(os.path.join(root, entry))
            dropped.append(entry)
    return dropped
