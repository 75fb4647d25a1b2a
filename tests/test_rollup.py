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
