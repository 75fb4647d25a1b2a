"""Skew handling: salted aggregation correctness + spread, deterministic salt."""

import pandas as pd
import numpy as np
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.skew import salt_column, salted_agg, salted_repartition


def _skewed(n=20_000) -> pd.DataFrame:
    # one hot key carrying ~70% of rows (worse than the Zipf fixture)
    i = np.arange(n, dtype=np.int64)
    hot = (i % 10) < 7
    return pd.DataFrame(
        {
            "domain": np.where(hot, "hot.example.com", [f"d{x % 50}.example.com" for x in i]),
            "ts": pd.Timestamp("2024-01-01") + pd.to_timedelta(i % 86_400, unit="s"),
            "v": (i % 1000).astype(np.int64),
        }
    ).astype({"ts": "datetime64[us]"})


@pytest.fixture(scope="module")
def skew_sdf(spark):
    return spark.createDataFrame(_skewed()).cache()


def test_salted_agg_equals_plain(spark, skew_sdf):
    salted = salted_agg(
        skew_sdf,
        keys=["domain"],
        aggs={"n": (F.count, F.sum, F.lit(1)), "v_sum": (F.sum, F.sum, "v")},
        uniformizer="ts",
        num_salts=16,
    )
    plain = skew_sdf.groupBy("domain").agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("v_sum"))
    s = {r["domain"]: (r["n"], r["v_sum"]) for r in salted.collect()}
    p = {r["domain"]: (r["n"], r["v_sum"]) for r in plain.collect()}
    assert s == p


def test_salt_spreads_hot_key(spark, skew_sdf):
    hot = skew_sdf.where(F.col("domain") == "hot.example.com")
    n_salts = 16
    counts = (
        hot.select(salt_column("ts", n_salts).alias("salt"))
        .groupBy("salt").count().collect()
    )
    assert len(counts) == n_salts  # every salt bucket hit
    sizes = [r["count"] for r in counts]
    assert max(sizes) < 2 * min(sizes)  # roughly uniform spread


def test_salt_deterministic(spark, skew_sdf):
    a = skew_sdf.select(salt_column("ts", 16).alias("s")).groupBy("s").count().collect()
    b = skew_sdf.repartition(9).select(salt_column("ts", 16).alias("s")).groupBy("s").count().collect()
    assert sorted((r["s"], r["count"]) for r in a) == sorted((r["s"], r["count"]) for r in b)


def test_salted_repartition_bounds_partition_size(spark, skew_sdf):
    # pin the partition count: at this tiny scale AQE would otherwise
    # (correctly) coalesce the whole shuffle into one partition
    parts = salted_repartition(skew_sdf, ["domain"], uniformizer="ts", num_salts=8, num_partitions=8)
    sizes = parts.rdd.glom().map(len).collect()
    total = sum(sizes)
    # without salting the hot key would put ~70% of rows in one partition
    assert max(sizes) < 0.4 * total


def test_key_skew_profile(spark):
    import pandas as pd

    from tstore_spark.operators.skew import key_skew_profile

    # key 'hot' has 60 rows, 4 other keys 10 each -> total 100, 5 keys
    rows = [("hot", i) for i in range(60)] + [
        (f"k{j}", i) for j in range(4) for i in range(10)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "i"]))
    prof = key_skew_profile(df, "k", top_n=3).orderBy("rank").collect()
    assert [r["key"] for r in prof] == ["hot", "k0", "k1"]
    assert prof[0]["key_count"] == 60
    assert prof[0]["share"] == 0.6
    # max/mean = 60 / (100/5) = 3.0, constant on every row
    assert all(r["skew_ratio"] == 3.0 for r in prof)


def test_key_skew_profile_deterministic(spark):
    import pandas as pd

    from tstore_spark.operators.skew import key_skew_profile

    rows = [(f"k{i % 17}", i) for i in range(500)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["k", "i"]))
    a = [tuple(r) for r in key_skew_profile(df.repartition(8), "k").collect()]
    b = [tuple(r) for r in key_skew_profile(df.coalesce(1), "k").collect()]
    assert a == b


# ---------------------------------------------------------------------------
# salted join
# ---------------------------------------------------------------------------


def test_salted_join_equals_plain_join(spark):
    from tstore_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(1000)],
        "rid long, k string",
    )
    dim = spark.createDataFrame(
        [("hot", 1), ("k0", 2), ("k10", 3), ("nomatch", 4)],
        "k string, label int",
    )
    plain = sorted(map(tuple, fact.join(dim, ["k"]).select("rid", "k", "label").collect()))
    salted = sorted(map(tuple, salted_join(fact, dim, ["k"], "rid", num_salts=8)
                        .select("rid", "k", "label").collect()))
    assert salted == plain and len(plain) == 900 + 1 + 1


def test_salted_join_left_and_guards(spark):
    from tstore_spark.operators.skew import salted_join
    import pytest as _pytest

    fact = spark.createDataFrame([(1, "a"), (2, "zzz")], "rid long, k string")
    dim = spark.createDataFrame([("a", 10)], "k string, label int")
    rows = {r["rid"]: r["label"]
            for r in salted_join(fact, dim, ["k"], "rid", how="left").collect()}
    assert rows == {1: 10, 2: None}
    with _pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], "rid", how="full")
    with _pytest.raises(ValueError):
        salted_join(fact, dim, ["k"], "rid", num_salts=0)


def test_salted_join_spreads_hot_key(spark):
    from tstore_spark.operators.skew import salt_column, salted_join
    from pyspark.sql import functions as F

    fact = spark.createDataFrame(
        [(i, "hot") for i in range(500)], "rid long, k string"
    )
    n_salts = (
        fact.withColumn("s", salt_column("rid", 8)).select("s").distinct().count()
    )
    assert n_salts == 8  # the hot key's rows really land on 8 distinct salts
