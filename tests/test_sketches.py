"""HLL sketch: accuracy, exact mergeability, parallelism invariance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.sketches import hll_merge, hll_sketch, with_hll_estimate

P = 10  # 1024 registers, ~3.2% stderr


def _data(n=30_000) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    return pd.DataFrame(
        {
            "g": np.where(i % 3 == 0, "a", "b"),
            "v": (i * 2654435761 % 7919).astype(str),  # ~7919 distinct values
        }
    )


@pytest.fixture(scope="module")
def sdf(spark):
    return spark.createDataFrame(_data()).cache()


def test_estimate_within_error(spark, sdf):
    sk = with_hll_estimate(hll_sketch(sdf, ["g"], "v", p=P), p=P)
    got = {r["g"]: r["distinct_est"] for r in sk.collect()}
    truth = {r["g"]: r["n"] for r in sdf.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()}
    for g, est in got.items():
        assert abs(est - truth[g]) / truth[g] < 0.15, (g, est, truth[g])


def test_merge_equals_direct(spark, sdf):
    # sketch per (g, shard) then merge across shards == sketch per g directly
    sharded = sdf.withColumn("shard", F.pmod(F.xxhash64("v"), F.lit(7)))
    per_shard = hll_sketch(sharded, ["g", "shard"], "v", p=P)
    merged = hll_merge(per_shard, ["g"])
    direct = hll_sketch(sdf, ["g"], "v", p=P)
    m = {r["g"]: r["hll"] for r in merged.collect()}
    d = {r["g"]: r["hll"] for r in direct.collect()}
    assert m == d  # bit-identical registers, not just close estimates


def test_parallelism_invariance(spark, sdf):
    a = {r["g"]: r["hll"] for r in hll_sketch(sdf, ["g"], "v", p=P).collect()}
    b = {r["g"]: r["hll"] for r in hll_sketch(sdf.repartition(11), ["g"], "v", p=P).collect()}
    assert a == b
