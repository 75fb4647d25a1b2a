"""Stream-stream attribution join vs the identical batch join."""

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.streaming.stream_join import attribution_join
from tstore_spark.streaming.stream_rollup import read_pages_stream, write_stream_tier


def _events(n, kind, start="2024-03-01 08:00:00", step_s=37, user_mod=5):
    t0 = pd.Timestamp(start)
    return pd.DataFrame(
        {
            "user_id": [i % user_mod for i in range(n)],
            "ts": [t0 + pd.Timedelta(seconds=i * step_s) for i in range(n)],
            "event_id": [f"{kind}{i:04d}" for i in range(n)],
        }
    )


@pytest.fixture(scope="module")
def sides(spark):
    # interleaved, deliberately NOT sorted inside files once repartitioned
    imps = spark.createDataFrame(_events(120, "i", step_s=41))
    convs = spark.createDataFrame(_events(150, "c", start="2024-03-01 08:00:20", step_s=33))
    return imps, convs


def _key(rows):
    return sorted(
        (r["user_id"], r["imp_event_id"], r["conv_event_id"]) for r in rows
    )


def test_batch_twin_matches_plain_range_join(spark, sides):
    imps, convs = sides
    got = attribution_join(imps, convs, "user_id", max_delay="3 minutes")
    naive = imps.alias("a").join(
        convs.alias("b"),
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") >= F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 180 SECOND")),
    )
    assert got.count() == naive.count() > 0
    g = _key(got.collect())
    n = sorted(
        (r["user_id"], r["ia"], r["ib"])
        for r in naive.select(
            "a.user_id",
            F.col("a.event_id").alias("ia"),
            F.col("b.event_id").alias("ib"),
        ).collect()
    )
    assert g == n


def test_streaming_inner_matches_batch(spark, sides):
    """Multi-batch streams on both sides (files arrive out of lockstep)
    produce exactly the batch join's row set."""
    imps, convs = sides
    base = tempfile.mkdtemp(prefix="ts_sjoin_")
    try:
        imps.repartition(5).write.parquet(f"{base}/imp")
        convs.repartition(3).write.parquet(f"{base}/conv")
        li = read_pages_stream(spark, f"{base}/imp", imps.schema, max_files_per_trigger=2)
        rc = read_pages_stream(spark, f"{base}/conv", convs.schema, max_files_per_trigger=1)
        joined = attribution_join(
            li, rc, "user_id", max_delay="3 minutes", watermark="24 hours"
        )
        q = write_stream_tier(joined, f"{base}/out", f"{base}/ck")
        q.awaitTermination(180)
        got = _key(spark.read.parquet(f"{base}/out").collect())
        want = _key(
            attribution_join(imps, convs, "user_id", max_delay="3 minutes").collect()
        )
        assert got == want and len(got) > 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_streaming_left_outer_emits_unmatched(spark):
    """leftOuter: impressions with no conversion inside the delay window are
    emitted with NULL conversion columns once the watermark passes their
    match window (a late tail batch advances it past everything)."""
    base = tempfile.mkdtemp(prefix="ts_sjoin_lo_")
    try:
        # the global watermark is the MIN across both streams, so BOTH sides
        # need a day-later tail row to release every outer result; the tails
        # themselves stay withheld (their own windows are still open)
        imps = pd.DataFrame(
            {
                "user_id": [1, 1, 2, 9],
                "ts": pd.to_datetime(
                    [
                        "2024-03-01 08:00:00",
                        "2024-03-01 09:00:00",
                        "2024-03-01 08:00:30",
                        "2024-03-02 13:00:00",
                    ]
                ),
                "event_id": ["i0", "i1", "i2", "i9"],
            }
        )
        convs = pd.DataFrame(
            {
                # matches i0 only; i1/i2 stay unmatched
                "user_id": [1, 8],
                "ts": pd.to_datetime(["2024-03-01 08:01:00", "2024-03-02 12:00:00"]),
                "event_id": ["c0", "c9"],
            }
        )
        si, sc = spark.createDataFrame(imps), spark.createDataFrame(convs)
        si.coalesce(1).write.parquet(f"{base}/imp")
        sc.repartition(2).write.parquet(f"{base}/conv")
        joined = attribution_join(
            read_pages_stream(spark, f"{base}/imp", si.schema),
            read_pages_stream(spark, f"{base}/conv", sc.schema),
            "user_id",
            max_delay="2 minutes",
            watermark="0 seconds",
            how="leftOuter",
        )
        q = write_stream_tier(joined, f"{base}/out", f"{base}/ck")
        q.awaitTermination(180)
        rows = {
            r["imp_event_id"]: r["conv_event_id"]
            for r in spark.read.parquet(f"{base}/out").collect()
        }
        # i9's own match window is still open at the final watermark
        # (min(left 13:00, right 12:00) = 12:00 < 13:02), so it is withheld
        assert rows == {"i0": "c0", "i1": None, "i2": None}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_deterministic_across_parallelism(spark, sides):
    imps, convs = sides
    a = _key(
        attribution_join(imps.repartition(1), convs.coalesce(1), "user_id").collect()
    )
    b = _key(
        attribution_join(imps.repartition(16), convs.repartition(7), "user_id").collect()
    )
    assert a == b


def test_guards(spark, sides):
    imps, convs = sides
    with pytest.raises(ValueError):
        attribution_join(imps, convs, "user_id", how="fullOuter")
    with pytest.raises(ValueError):
        attribution_join(imps, convs, "user_id", max_delay="soonish")
    with pytest.raises(ValueError):
        attribution_join(imps, convs, "no_such_key")
    with pytest.raises(ValueError):
        attribution_join(imps, convs, "user_id", left_prefix="x_", right_prefix="x_")


def test_streaming_inner_resumes_from_checkpoint(spark, sides):
    """Two availableNow runs over the same checkpoint (second run sees files
    that arrived after the first drained) emit exactly the batch join's row
    set — no duplicates, no losses across the restart."""
    imps, convs = sides
    base = tempfile.mkdtemp(prefix="ts_sjoin_rs_")
    try:
        imps.repartition(4).write.parquet(f"{base}/imp")
        # first run: only part of the conversions exist yet
        c1 = convs.where(F.col("event_id") < "c0100")
        c2 = convs.where(F.col("event_id") >= "c0100")
        c1.repartition(2).write.parquet(f"{base}/conv")

        def run():
            joined = attribution_join(
                read_pages_stream(spark, f"{base}/imp", imps.schema),
                read_pages_stream(spark, f"{base}/conv", convs.schema, max_files_per_trigger=1),
                "user_id",
                max_delay="3 minutes",
                watermark="24 hours",
            )
            q = write_stream_tier(joined, f"{base}/out", f"{base}/ck")
            q.awaitTermination(180)

        run()
        first = len(spark.read.parquet(f"{base}/out").collect())
        c2.repartition(2).write.parquet(f"{base}/conv", mode="append")
        run()  # resume from the same checkpoint
        got = _key(spark.read.parquet(f"{base}/out").collect())
        want = _key(
            attribution_join(imps, convs, "user_id", max_delay="3 minutes").collect()
        )
        assert got == want and 0 < first < len(got)
    finally:
        shutil.rmtree(base, ignore_errors=True)
