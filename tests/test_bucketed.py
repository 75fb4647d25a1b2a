"""Bucketed co-located joins: no Exchange in the plan, results == plain join."""

import io
from contextlib import redirect_stdout

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from tstore_spark.sources.bucketed import bucketed_join, write_bucketed


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events(n=4000) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    h = (i * 2654435761) % (1 << 32)
    return pd.DataFrame(
        {
            "user_id": (h % 97).astype(np.int64),
            "event_id": i,
            "value": np.round(((h % 10000) / 100.0), 2),
        }
    )


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    ev = spark.createDataFrame(_events())
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    write_bucketed(ev, "bkt_events", "user_id", num_buckets=8, sort_cols=["user_id"])
    write_bucketed(dim, "bkt_users", "user_id", num_buckets=8, sort_cols=["user_id"])
    yield "bkt_events", "bkt_users"
    spark.sql("DROP TABLE IF EXISTS bkt_events")
    spark.sql("DROP TABLE IF EXISTS bkt_users")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "user_id")
    p = _plan(joined)
    assert "Exchange" not in p, f"bucketed join should not shuffle:\n{p}"
    assert "SortMergeJoin" in p


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, "user_id").select("event_id", "n_events")
    ev = spark.createDataFrame(_events())
    dim = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    plain = ev.join(dim, "user_id").select("event_id", "n_events")
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))


def test_bucketed_write_sorted_within_buckets(spark, bucketed_tables):
    lt, _ = bucketed_tables
    # every parquet file is one bucket; rows within are sorted by user_id
    df = spark.table(lt).withColumn("_f", F.input_file_name())
    bad = (
        df.withColumn(
            "_prev",
            F.lag("user_id").over(
                Window.partitionBy("_f").orderBy(F.monotonically_increasing_id())
            ),
        )
        .where(F.col("_prev") > F.col("user_id"))
        .count()
    )
    assert bad == 0
