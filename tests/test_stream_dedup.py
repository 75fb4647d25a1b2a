"""Streaming exact dedup vs the batch operator on the same input."""

import shutil
import tempfile

import pandas as pd
import pytest

from tstore_spark.operators.dedup import exact_dedup
from tstore_spark.streaming.stream_dedup import (
    stream_dedup_exact,
    stream_dedup_exact_global,
)


@pytest.fixture(scope="module")
def doc_stream_dirs(spark):
    base = tempfile.mkdtemp(prefix="ts_sdedup_")
    rows = []
    t0 = pd.Timestamp("2024-01-01 00:00:00")
    texts = ["alpha beta", "gamma delta", "alpha beta", "epsilon", "ALPHA   BETA  ", "gamma delta"]
    for i, tx in enumerate(texts):
        rows.append((i, t0 + pd.Timedelta(minutes=i), tx))
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    sdf = spark.createDataFrame(pdf)
    src = f"{base}/src"
    sdf.repartition(3).write.parquet(src)
    yield base, src, sdf
    shutil.rmtree(base, ignore_errors=True)


def _run_stream(spark, base, src, sdf, dedup_fn, name):
    stream = spark.readStream.schema(sdf.schema).option("maxFilesPerTrigger", 1).parquet(src)
    out = dedup_fn(stream)
    q = (
        out.writeStream.format("parquet")
        .option("path", f"{base}/{name}")
        .option("checkpointLocation", f"{base}/ckpt_{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(f"{base}/{name}")


def test_stream_dedup_global_matches_batch(spark, doc_stream_dirs):
    base, src, sdf = doc_stream_dirs
    got = _run_stream(spark, base, src, sdf, stream_dedup_exact_global, "glob")
    batch = exact_dedup(sdf)
    # one survivor per normalized text; streaming picks A first copy (micro-
    # batch order), batch picks min-id — compare the FINGERPRINT sets, which
    # must agree exactly, and survivor counts
    from tstore_spark.functions.text import fingerprint

    g = {r[0] for r in got.select(fingerprint("text")).collect()}
    b = {r[0] for r in batch.select(fingerprint("text")).collect()}
    assert g == b
    # fingerprint normalizes case + outer whitespace, not inner runs:
    # "ALPHA   BETA" is a distinct doc in BOTH engines
    assert got.count() == batch.count() == 4


def test_stream_dedup_watermark_drops_in_horizon_dups(spark, doc_stream_dirs):
    base, src, sdf = doc_stream_dirs
    got = _run_stream(
        spark, base, src, sdf,
        lambda s: stream_dedup_exact(s, watermark="1 hour"), "wm",
    )
    # all dups are within minutes of the first copy -> inside the horizon
    assert got.count() == 4
    texts = sorted(r["text"].strip().lower().split()[0] for r in got.collect())
    assert texts == ["alpha", "alpha", "epsilon", "gamma"]
