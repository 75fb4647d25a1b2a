"""Gorilla codec: round-trip exactness + Spark chunk surface."""

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.gorilla import compress_tier, decode, decompress_chunks, encode
from tstore_spark.operators.rollup import rollup_from_raw


@pytest.mark.parametrize(
    "ts,vals",
    [
        (np.array([], np.int64), np.array([], np.float64)),
        (np.array([1_700_000_000_000_000], np.int64), np.array([42.0])),
        (np.arange(100, dtype=np.int64) * 60_000_000, np.arange(100, dtype=np.float64)),
        (np.array([0, 1, 2, 100, 101], np.int64), np.array([np.nan, np.inf, -np.inf, 0.0, -0.0])),
        (np.array([-10, -5, 0], np.int64), np.array([1e308, -1e308, 5e-324])),
    ],
)
def test_roundtrip_known_vectors(ts, vals):
    ts2, v2 = decode(encode(ts, vals))
    assert np.array_equal(ts, ts2)
    assert np.array_equal(vals.view(np.uint64) if len(vals) else vals, v2.view(np.uint64) if len(v2) else v2)


def test_roundtrip_randomized():
    rng = np.random.default_rng(123)
    for _ in range(30):
        n = int(rng.integers(1, 500))
        ts = np.cumsum(rng.integers(1, 10_000_000, n)).astype(np.int64)
        vals = rng.choice([0.0, 1.5, rng.normal() * 1e6, float(rng.integers(0, 100))], n)
        ts2, v2 = decode(encode(ts, vals))
        assert np.array_equal(ts, ts2)
        assert np.array_equal(vals.view(np.uint64), v2.view(np.uint64))


def test_compression_ratio_regular_series():
    n = 1440  # one day of 1m windows
    ts = np.arange(n, dtype=np.int64) * 60_000_000
    vals = (np.arange(n) % 17).astype(np.float64)
    blob = encode(ts, vals)
    assert len(blob) < n * 16 / 4  # at least 4x vs raw (ts+val)


def test_spark_chunk_roundtrip(pages_sdf):
    tier = rollup_from_raw(pages_sdf, "1h")
    chunks = compress_tier(tier, value_col="doc_count")
    back = decompress_chunks(chunks, value_col="doc_count").toPandas()
    exp = tier.select("domain", "window_start", "doc_count").toPandas()
    key = ["domain", "window_start"]
    back = back.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    exp["doc_count"] = exp["doc_count"].astype(float)
    pd.testing.assert_frame_equal(back, exp, check_dtype=False)


def test_spark_chunks_deterministic(pages_sdf):
    tier = rollup_from_raw(pages_sdf, "1h")
    a = compress_tier(tier).toPandas().sort_values(["domain", "p_day"]).reset_index(drop=True)
    b = compress_tier(tier.repartition(13)).toPandas().sort_values(["domain", "p_day"]).reset_index(drop=True)
    assert (a["chunk"].map(bytes) == b["chunk"].map(bytes)).all()


# --- property-based: arbitrary bit patterns and pathological deltas ---------

from hypothesis import given, settings, strategies as st


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=60),
    st.data(),
)
def test_roundtrip_hypothesis(ts_deltas, data):
    # timestamps: cumulative arbitrary deltas (monotonicity NOT required by
    # the codec, only by callers); values: any float64 bit pattern incl.
    # NaN/inf/denormals — XOR encoding must preserve exact bits
    ts = np.cumsum(np.asarray(ts_deltas, dtype=np.int64) % 10**12)
    vals_bits = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=2**64 - 1),
            min_size=len(ts), max_size=len(ts),
        )
    )
    vals = np.asarray(vals_bits, dtype=np.uint64).view(np.float64)
    chunk = encode(ts, vals)
    ts2, vals2 = decode(chunk)
    assert (ts2 == ts).all()
    assert (vals2.view(np.uint64) == vals.view(np.uint64)).all()


def test_chunk_stats_accounting(spark):
    """Stats are pure arithmetic over (n_points, octet_length); a smooth
    regular series compresses well (ratio >> 1)."""
    import pandas as pd

    from tstore_spark.operators.gorilla import (
        chunk_stats,
        chunk_stats_summary,
        compress_tier,
    )

    t = pd.date_range("2024-01-01", periods=1440, freq="1min")
    pdf = pd.DataFrame({
        "domain": "d", "window_start": t,
        "doc_count": (100 + (pd.Series(range(1440)) % 3)).astype("float64"),
    })
    chunks = compress_tier(spark.createDataFrame(pdf))
    rows = chunk_stats(chunks).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["raw_bytes"] == r["n_points"] * 16 == 1440 * 16
    assert r["encoded_bytes"] > 0 and r["ratio"] > 4  # smooth series packs tight
    s = chunk_stats_summary(chunks)
    assert s["points"] == 1440 and s["ratio"] == pytest.approx(r["ratio"])
