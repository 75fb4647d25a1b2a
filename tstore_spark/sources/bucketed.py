"""Bucketed (co-located) tables: shuffle-free equi-joins on a stable key.

The 100 TB join strategy SURVEY §2/§4 calls for: two tables bucketed by the
same key into the same bucket count are join-aligned on disk — Spark plans
the equi-join WITHOUT an Exchange on either side (each task reads matching
bucket files), so the join cost is a co-partitioned merge instead of a
full-table shuffle. The classic use here: the events/pages fact bucketed by
``user_id``/``url`` joined against a per-id dimension or a dedup survivor
list, repeatedly, across many queries — bucket once, join forever.

Bucket metadata lives in the session catalog (``saveAsTable``); a real
deployment points the warehouse at durable storage and a shared metastore.
``bucket_column`` hashing is Spark's own (Murmur3 on the column), so any
DataFrame joined after ``repartition(n, key)`` also aligns with AQE off.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) catalog table.

    ``sort_cols`` additionally sorts within each bucket file — joins on the
    bucket key can then use a sort-merge WITHOUT the sort step, and range
    predicates on the sort column benefit from row-group stats."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, bucket_col)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed catalog tables on the bucket key.

    With both sides bucketed by the join key into the same bucket count,
    the physical plan contains NO Exchange (asserted by
    ``tests/test_bucketed.py`` and ``tools/plan_audit.py``) — each task
    reads one bucket from each side. Broadcast is disabled for this join so
    small test tables exercise the co-located path (at production scale the
    fact sides exceed any broadcast threshold anyway)."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.hint("merge").join(right, on, how)
