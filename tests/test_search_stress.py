"""search_stress generator + assertions at toy scale (the 1M-doc probe is
run via `python -m tstore_spark.tools.search_stress`; this keeps its
planted-structure logic honest inside the suite)."""

from pyspark.sql import functions as F

from tstore_spark.tools.search_stress import synth_corpus


def test_planted_counts(spark):
    n = 4000
    docs = synth_corpus(spark, n)
    assert docs.count() == n
    needle = docs.where(F.col("text").contains("kneedle")).count()
    phrase = docs.where(F.col("text").contains("alphax bravox charliex")).count()
    common = docs.where(F.col("text").endswith("charliex") | F.col("text").contains("commonzero")).count()
    assert needle == n // 1000
    assert phrase == n // 500
    assert common == n
    # markers never collide with the w<hash> vocabulary
    assert docs.where(F.col("text").contains("wkneedle")).count() == 0


def test_generator_deterministic(spark):
    a = synth_corpus(spark, 500).orderBy("doc_id").collect()
    b = synth_corpus(spark.range(1).sparkSession, 500).orderBy("doc_id").collect()
    assert a == b
