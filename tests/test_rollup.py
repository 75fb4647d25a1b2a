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
