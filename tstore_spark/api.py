"""Reference-parity public API.

The reference exports ``tstore.open_tslong / open_tsdf / open_tswide`` with
backend dispatch (tstore/__init__.py:13-23, tstore/tslong/__init__.py:14-27).
Here the one backend is Spark, so the functions take a SparkSession and
return the long wrapper or its derived views; the read-side query parameters
(``ts_variables, start_time, end_time, inclusive, tstore_ids, columns`` —
the reference's entire query language, tstore/tslong/pyarrow.py:45-78) are
honored with identical semantics via sources/archive.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from tstore_spark.model.tslong import TSLong
from tstore_spark.sources import tstore_layout
from tstore_spark.sources.archive import METADATA_FILE, open_archive, write_archive


def open_tslong(
    spark: SparkSession,
    base_dir: str,
    ts_variables: list[str] | None = None,
    start_time=None,
    end_time=None,
    inclusive: str = "both",
    tstore_ids: list[str] | None = None,
    columns: list[str] | None = None,
) -> TSLong:
    """Open an archive as the long-form wrapper (reference ``open_tslong``).

    Layout dispatch: a directory carrying this engine's metadata opens as
    the Spark-native hidden-partition archive; a directory carrying only the
    reference library's ``tstore_metadata.yaml`` (the ``<id>/<var>/year=…``
    tree written by ltelab/tstore itself) opens through
    :mod:`tstore_spark.sources.tstore_layout` — an existing tstore archive
    works unmodified."""
    if (
        not os.path.exists(os.path.join(base_dir, METADATA_FILE))
        and tstore_layout.is_tstore(base_dir)
    ):
        return tstore_layout.open_tstore(
            spark,
            base_dir,
            ts_variables=ts_variables,
            start_time=start_time,
            end_time=end_time,
            inclusive=inclusive,
            tstore_ids=tstore_ids,
            columns=columns,
        )
    return open_archive(
        spark,
        base_dir,
        ts_variables=ts_variables,
        start_time=start_time,
        end_time=end_time,
        inclusive=inclusive,
        ids=tstore_ids,
        columns=columns,
    )


def open_tsdf(spark: SparkSession, base_dir: str, **query):
    """Open an archive as the nested per-id view (reference ``open_tsdf``):
    one row per id, one array<struct> column per ts-variable group, wrapped
    as a :class:`~tstore_spark.model.tsdf.TSDF` (invertible)."""
    return open_tslong(spark, base_dir, **query).to_tsdf()


def open_tswide(spark: SparkSession, base_dir: str, **query):
    """Open an archive as the wide pivot view (reference ``open_tswide``),
    wrapped as a :class:`~tstore_spark.model.tswide.TSWide` (invertible).
    Guarded against unbounded id domains (model/tslong.py)."""
    return open_tslong(spark, base_dir, **query).to_tswide()


def to_tstore(
    tslong: TSLong,
    base_dir: str,
    attrs: DataFrame | None = None,
    num_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write a long table to the archive layout (reference ``to_tstore``)."""
    write_archive(tslong, base_dir, attrs=attrs, num_buckets=num_buckets, mode=mode)


def to_tstore_reference(
    tslong: TSLong,
    base_dir: str,
    partitioning: str | None = "year/month",
    tstore_structure: str = "id-var",
    overwrite: bool = True,
    attrs: DataFrame | None = None,
) -> None:
    """Write the REFERENCE library's on-disk layout (``<id>/<var>/year=…``
    trees + YAML metadata + ``_attributes.parquet``) so the output opens in
    ltelab/tstore itself. Prefer :func:`to_tstore` (hidden-partition layout)
    for Spark-side consumption; this is the reference-facing export."""
    tstore_layout.to_tstore(
        tslong,
        base_dir,
        partitioning=partitioning,
        tstore_structure=tstore_structure,
        overwrite=overwrite,
        attrs=attrs,
    )
