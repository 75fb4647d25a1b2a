"""Bloom filter: no false negatives (theorem), bounded fp rate, register-
exact merge, bounded state, determinism across parallelism."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.bloom import (
    bloom_build,
    bloom_dense,
    bloom_maybe_contains,
    bloom_merge,
)

M, K = 1 << 16, 5  # 64 Kbit filter


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        pd.DataFrame({"item": [f"url-{i}" for i in range(4000)]})
    )


@pytest.fixture(scope="module")
def dense(spark, corpus):
    return bloom_dense(bloom_build(corpus, "item", m_bits=M, k=K), m_bits=M)


def test_no_false_negatives(spark, corpus, dense):
    probed = bloom_maybe_contains(dense, corpus, "item", m_bits=M, k=K)
    assert probed.where(~F.col("bloom_maybe")).count() == 0


def test_fp_rate_bounded(spark, dense):
    fresh = spark.createDataFrame(
        pd.DataFrame({"item": [f"other-{i}" for i in range(4000)]})
    )
    probed = bloom_maybe_contains(dense, fresh, "item", m_bits=M, k=K)
    fp = probed.where(F.col("bloom_maybe")).count()
    # n=4000, m=2^16, k=5 -> theoretical fp ~ 0.22%; assert a loose 2%
    assert fp / 4000 < 0.02


def test_merge_register_exact(spark, corpus):
    a = bloom_build(corpus.where(F.length("item") % 2 == 0), "item", m_bits=M, k=K)
    b = bloom_build(corpus.where(F.length("item") % 2 == 1), "item", m_bits=M, k=K)
    merged = bloom_merge(a.unionByName(b))
    one_shot = bloom_build(corpus, "item", m_bits=M, k=K)
    assert merged.exceptAll(one_shot).count() == 0
    assert one_shot.exceptAll(merged).count() == 0


def test_state_bound(spark, corpus):
    sparse = bloom_build(corpus, "item", m_bits=M, k=K)
    assert sparse.count() <= M // 64


def test_deterministic_across_parallelism(spark, corpus):
    a = bloom_build(corpus.repartition(1), "item", m_bits=M, k=K)
    b = bloom_build(corpus.repartition(16), "item", m_bits=M, k=K)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_streaming_admission_equals_batch(spark, corpus, dense, tmp_path):
    """bloom_maybe_expr is a stateless projection: the streaming admission
    filter (drop maybe-seen items) admits exactly the batch-filtered set."""
    import pandas as pd
    from tstore_spark.operators.bloom import bloom_maybe_expr, bloom_words

    words = bloom_words(dense)
    mixed = pd.DataFrame(
        {"item": [f"url-{i}" for i in range(0, 2000, 2)] + [f"new-{i}" for i in range(1000)]}
    )
    sdf = spark.createDataFrame(mixed)
    src = str(tmp_path / "src")
    sdf.repartition(3).write.parquet(src)

    pred = ~bloom_maybe_expr(words, "item", m_bits=M, k=K)
    batch_admitted = sorted(r["item"] for r in sdf.where(pred).collect())

    stream = spark.readStream.schema(sdf.schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream.where(pred)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["item"] for r in spark.read.parquet(str(tmp_path / "out")).collect())
    assert got == batch_admitted
    # no-false-negative theorem: every admitted item is truly unseen
    assert all(i.startswith("new-") for i in got)
