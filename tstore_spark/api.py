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

from pyspark.sql import DataFrame, SparkSession

from tstore_spark.model.tslong import TSLong
from tstore_spark.sources.archive import open_archive, write_archive


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
    """Open an archive as the long-form wrapper (reference ``open_tslong``)."""
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


def open_tsdf(spark: SparkSession, base_dir: str, **query) -> DataFrame:
    """Open an archive as the nested per-id view (reference ``open_tsdf``):
    one row per id, one array<struct> column per ts-variable group."""
    return open_tslong(spark, base_dir, **query).to_tsdf()


def open_tswide(spark: SparkSession, base_dir: str, **query) -> DataFrame:
    """Open an archive as the wide pivot view (reference ``open_tswide``).
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
