"""SAX symbolization: straight-line reference, known shapes, determinism."""

import math

import numpy as np
import pandas as pd
import pytest

from tstore_spark.operators.sax import BREAKPOINTS, sax_segments, sax_words

ALPHABET = "abcdefghij"


def _series(n_ids=12, n=400) -> pd.DataFrame:
    i = np.arange(n_ids * n, dtype=np.int64)
    h = (i * 2654435761) % (1 << 32)
    sid = i // n
    pos = i % n
    # per-id shape: ramps, sines, noise — varied enough to hit all letters
    val = (
        np.where(sid % 3 == 0, pos * 0.37, 0)
        + np.where(sid % 3 == 1, 50 * np.sin(pos / 17.0), 0)
        + np.where(sid % 3 == 2, (h % 1000) * 0.05, 0)
    )
    return pd.DataFrame(
        {
            "id": np.char.add("s", sid.astype(str)),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(pos * 60, unit="s").astype("timedelta64[us]"),
            "value": np.round(val, 2),
            "event_id": i,
        }
    )


def _ref_words(pdf: pd.DataFrame, word_len: int, alphabet_size: int) -> dict:
    """Straight-line SAX with the module's exact integer discipline."""
    cuts = [float(c) for c in BREAKPOINTS[alphabet_size]]
    out = {}
    for sid, g in pdf.sort_values(["id", "ts", "event_id"]).groupby("id"):
        c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        n = len(c)
        s, ss = int(c.sum()), int((c * c).sum())
        mean = s / n
        var = ss / n - (s / n) * (s / n)
        if var <= 0:
            out[sid] = (n, None)
            continue
        std = math.sqrt(var)
        word = []
        for k in range(word_len):
            seg_mask = (np.arange(n) * word_len) // n == k
            if not seg_mask.any():
                continue
            paa = int(c[seg_mask].sum()) / int(seg_mask.sum())
            z = (paa - mean) / std
            sym = ALPHABET[sum(1 for cut in cuts if z >= cut)]
            word.append(sym)
        out[sid] = (n, "".join(word))
    return out


@pytest.fixture(scope="module")
def sax_sdf(spark):
    return spark.createDataFrame(_series()).cache()


def test_sax_words_match_reference(spark, sax_sdf):
    got = {
        r["id"]: (r["n_points"], r["sax_word"])
        for r in sax_words(
            sax_sdf, "id", "ts", "value", word_len=8, alphabet_size=4,
            tiebreak_cols=["event_id"],
        ).collect()
    }
    want = _ref_words(_series(), 8, 4)
    assert got == want


def test_sax_words_alphabet8(spark, sax_sdf):
    got = {
        r["id"]: r["sax_word"]
        for r in sax_words(
            sax_sdf, "id", "ts", "value", word_len=6, alphabet_size=8,
            tiebreak_cols=["event_id"],
        ).collect()
    }
    want = {k: w for k, (_, w) in _ref_words(_series(), 6, 8).items()}
    assert got == want


def test_sax_known_shapes(spark):
    # a pure up-ramp must be monotonically non-decreasing letters; its
    # mirror must be the reverse word
    n = 64
    pdf = pd.DataFrame(
        {
            "id": ["up"] * n + ["down"] * n,
            "ts": list(pd.date_range("2024-01-01", periods=n, freq="1min")) * 2,
            "value": [float(i) for i in range(n)] + [float(n - i) for i in range(n)],
            "event_id": range(2 * n),
        }
    )
    got = {
        r["id"]: r["sax_word"]
        for r in sax_words(
            spark.createDataFrame(pdf), "id", "ts", "value",
            word_len=4, alphabet_size=4, tiebreak_cols=["event_id"],
        ).collect()
    }
    assert got["up"] == "".join(sorted(got["up"]))
    assert got["down"] == got["up"][::-1]
    assert got["up"][0] == "a" and got["up"][-1] == "d"


def test_sax_flat_series_null_word(spark):
    pdf = pd.DataFrame(
        {
            "id": ["flat"] * 10,
            "ts": pd.date_range("2024-01-01", periods=10, freq="1min"),
            "value": [7.0] * 10,
            "event_id": range(10),
        }
    )
    rows = sax_words(
        spark.createDataFrame(pdf), "id", "ts", "value", tiebreak_cols=["event_id"]
    ).collect()
    assert len(rows) == 1 and rows[0]["sax_word"] is None


def test_sax_short_series(spark):
    # fewer points than word_len: still symbolizes, shorter word
    pdf = pd.DataFrame(
        {
            "id": ["s"] * 3,
            "ts": pd.date_range("2024-01-01", periods=3, freq="1min"),
            "value": [1.0, 2.0, 9.0],
            "event_id": range(3),
        }
    )
    rows = sax_words(
        spark.createDataFrame(pdf), "id", "ts", "value",
        word_len=8, alphabet_size=4, tiebreak_cols=["event_id"],
    ).collect()
    assert rows[0]["n_points"] == 3
    assert rows[0]["sax_word"] is not None and len(rows[0]["sax_word"]) == 3


def test_sax_guards(spark, sax_sdf):
    with pytest.raises(ValueError, match="alphabet_size"):
        sax_words(sax_sdf, "id", "ts", "value", alphabet_size=7)
    with pytest.raises(ValueError, match="word_len"):
        sax_words(sax_sdf, "id", "ts", "value", word_len=0)


def test_sax_deterministic_across_parallelism(spark, sax_sdf):
    kw = dict(word_len=8, alphabet_size=4, tiebreak_cols=["event_id"])
    a = sorted(map(tuple, sax_words(sax_sdf, "id", "ts", "value", **kw).collect()))
    b = sorted(
        map(
            tuple,
            sax_words(sax_sdf.repartition(13), "id", "ts", "value", **kw).collect(),
        )
    )
    assert a == b


def test_sax_segments_integers_reconcile(spark, sax_sdf):
    segs = sax_segments(
        sax_sdf, "id", "ts", "value", word_len=8, alphabet_size=4,
        tiebreak_cols=["event_id"],
    )
    pdf = _series()
    per_id = segs.groupBy("id").agg(
        {"seg_n": "sum", "seg_sum": "sum", "n_points": "max"}
    ).collect()
    want_n = pdf.groupby("id").size().to_dict()
    want_sum = {
        k: int(np.round(g["value"].to_numpy() * 100).astype(np.int64).sum())
        for k, g in pdf.groupby("id")
    }
    for r in per_id:
        assert r["sum(seg_n)"] == want_n[r["id"]] == r["max(n_points)"]
        assert r["sum(seg_sum)"] == want_sum[r["id"]]
