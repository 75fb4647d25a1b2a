"""Rollup tiers: exact equality vs the straight-line pandas oracle, cascade
exactness, and parallelism invariance (the determinism half of the north
rule's two-cluster-size criterion)."""

import pandas as pd
import pytest

from tstore_spark.operators.rollup import (
    TIER_ORDER,
    rollup_all_tiers,
    rollup_cascade,
    rollup_from_raw,
    rollup_oracle_pandas,
)

KEY = ["domain", "window_start"]


def _norm(pdf):
    pdf = pdf.sort_values(KEY, kind="mergesort").reset_index(drop=True)
    pdf["window_start"] = pd.to_datetime(pdf["window_start"])
    return pdf


@pytest.fixture(scope="module")
def tiers(pages_sdf):
    t = rollup_all_tiers(pages_sdf)
    return {k: _norm(v.toPandas()) for k, v in t.items()}


@pytest.mark.parametrize("tier", TIER_ORDER)
def test_tier_matches_pandas_oracle(tiers, pages_pdf, tier):
    exp = _norm(rollup_oracle_pandas(pages_pdf, tier))
    got = tiers[tier]
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)


@pytest.mark.parametrize("tier", ["1h", "1d"])
def test_cascade_equals_from_raw(pages_sdf, tier):
    """Re-aggregating the tier below == recomputing from raw, exactly."""
    from_raw = _norm(rollup_from_raw(pages_sdf, tier).toPandas())
    child = rollup_from_raw(pages_sdf, "1m") if tier == "1h" else rollup_cascade(
        rollup_from_raw(pages_sdf, "1m"), "1h"
    )
    cascaded = _norm(rollup_cascade(child, tier).toPandas())
    pd.testing.assert_frame_equal(cascaded, from_raw, check_dtype=False)


def test_parallelism_invariance():
    """Same job at local[2] and local[8] -> byte-identical rollup digest.

    Each level runs in its own process (fresh SparkContext per master) via
    tstore_spark.tools.parcheck — the determinism half of the north rule's
    two-cluster-size criterion.
    """
    import json
    import subprocess
    import sys

    digests = {}
    for master in ["local[2]", "local[8]"]:
        out = subprocess.run(
            [sys.executable, "-m", "tstore_spark.tools.parcheck", master, "2000", "1h"],
            capture_output=True, text=True, check=True, cwd="/root/repo",
        )
        digests[master] = json.loads(out.stdout.strip().splitlines()[-1])["digest"]
    assert digests["local[2]"] == digests["local[8]"]


def test_doc_count_conservation(tiers, pages_pdf):
    for tier in TIER_ORDER:
        assert tiers[tier]["doc_count"].sum() == len(pages_pdf)


def test_bytes_total_exact(tiers, pages_pdf):
    assert tiers["1d"]["bytes_total"].sum() == int(pages_pdf["html"].map(len).sum())


def test_batch_percentiles_equal_scalar():
    """The vectorized batch kernel must reproduce the scalar reference
    bit-for-bit (including duplicate values, single-point windows, heavy
    skew)."""
    import numpy as np

    from tstore_spark.operators.rollup import _pcts_from_hist, _pcts_from_hist_batch

    rng = np.random.default_rng(11)
    lens_list, cnts_list = [], []
    for _ in range(500):
        k = int(rng.integers(1, 40))
        lens = np.sort(rng.choice(np.arange(10, 5000), size=k, replace=False)).astype(np.int64)
        cnts = rng.integers(1, 50, size=k).astype(np.int64)
        lens_list.append(lens)
        cnts_list.append(cnts)
    batch = _pcts_from_hist_batch(lens_list, cnts_list)
    for i, (ls, cs) in enumerate(zip(lens_list, cnts_list)):
        assert batch[i] == _pcts_from_hist(ls, cs), i


def test_jvm_percentiles_equal_arrow(pages_sdf):
    """JVM aggregate-expression percentiles == Arrow kernel, bit-for-bit."""
    from tstore_spark.operators.rollup import _attach_percentiles

    base = rollup_from_raw(pages_sdf, "1h")  # built with the default (JVM) path
    state = base.select("domain", "window_start", "hist_lens", "hist_cnts",
                        "doc_count", "bytes_total", "lang_set", "lang_distinct")
    arrow = _attach_percentiles(state, use_jvm=False)
    jvm = _attach_percentiles(state, use_jvm=True)
    cols = ["domain", "window_start", "text_len_p50", "text_len_p90", "text_len_p99"]
    a = sorted(tuple(r) for r in arrow.select(*cols).collect())
    j = sorted(tuple(r) for r in jvm.select(*cols).collect())
    assert a == j


def test_hist_kernels_empty_and_null_rows():
    """Empty/NULL histograms get NaN percentiles WITHOUT corrupting their
    batch neighbors (a zero-length first segment used to make seg_base pick
    up the global total), and the merge kernel must not crash on them."""
    import numpy as np

    from tstore_spark.operators.rollup import (
        _merge_hists_batch,
        _pcts_from_hist,
        _pcts_from_hist_batch,
    )

    lens = [[], [5, 10], None, [7]]
    cnts = [[], [1, 3], None, [2]]
    out = _pcts_from_hist_batch(lens, cnts)
    assert np.isnan(out[0]).all() and np.isnan(out[2]).all()
    assert out[1] == _pcts_from_hist(np.array([5.0, 10.0]), np.array([1, 3]))
    assert out[3] == [7.0, 7.0, 7.0]

    # all-empty batch used to IndexError at new[0]
    l, c, p = _merge_hists_batch([[], None], [[], None])
    assert l == [[], []] and c == [[], []]
    assert np.isnan(np.asarray(p, dtype=np.float64)).all()

    # mixed batch: empty rows merge to empty, non-empty rows merge normally
    l, c, p = _merge_hists_batch([[3, 3, 9], []], [[1, 2, 4], []])
    assert l[0] == [3, 9] and c[0] == [3, 4]
    assert l[1] == [] and c[1] == []
    assert not np.isnan(p[0]).any() and np.isnan(p[1]).all()


def test_rollup_null_text_rows(spark):
    """NULL text/lang rows stay in doc_count but out of the histogram (a None
    array element used to NaN-poison percentiles and crash the cascade)."""
    pdf = pd.DataFrame(
        {
            "url": ["https://a.com/x"] * 4,
            "warc_ts": pd.to_datetime(["2024-05-01 10:00:00"] * 4).astype("datetime64[us]"),
            "html": ["<p>hi</p>"] * 4,
            "text": ["hello", None, "worlds!", None],
            "lang": ["en", "en", "de", None],
        }
    )
    tier = rollup_from_raw(spark.createDataFrame(pdf), "1m")
    out = tier.toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["doc_count"] == 4
    assert list(r["hist_lens"]) == [5, 7] and list(r["hist_cnts"]) == [1, 1]
    assert r["text_len_p50"] == 6.0
    assert list(r["lang_set"]) == ["de", "en"]

    up = rollup_cascade(tier, "1h").toPandas()
    assert up.iloc[0]["doc_count"] == 4
    assert list(up.iloc[0]["hist_lens"]) == [5, 7]


def test_cascade_over_gap_filled_tier(spark, pages_sdf):
    """Cascading a gap-filled tier (synthesized rows carry EMPTY histogram
    arrays) must neither crash the merge kernel nor skew real windows."""
    import numpy as np

    from tstore_spark.operators.gapfill import gap_fill

    tier_1m = rollup_from_raw(pages_sdf.limit(400), "1m")
    filled = gap_fill(tier_1m, "1m", interpolate=False)
    up = rollup_cascade(filled, "1h").toPandas()
    ref = rollup_cascade(tier_1m, "1h").toPandas()
    key = ["domain", "window_start"]
    merged = up.merge(ref, on=key, suffixes=("_f", "_r"))
    # every real hour's stats are unchanged by the zero-count filler rows
    assert (merged["doc_count_f"] == merged["doc_count_r"]).all()
    assert (merged["text_len_p50_f"] == merged["text_len_p50_r"]).all()
    # hours made ONLY of filler rows (if any) carry NaN percentiles, not garbage
    only_fill = up[up["doc_count"] == 0]
    if len(only_fill):
        assert only_fill["text_len_p50"].isna().all()
