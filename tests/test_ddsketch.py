"""DDSketch quantiles: relative-error guarantee, exact cascade merge,
parallelism determinism, bounded state."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators import ddsketch as DD


@pytest.fixture(scope="module")
def values_sdf(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in ("a", "b"):
        # wide-domain positive values (lognormal) + zeros
        vals = np.exp(rng.normal(5, 2, 4000))
        vals[:25] = 0.0
        for i, v in enumerate(vals):
            rows.append((g, i % 60, float(v)))
    pdf = pd.DataFrame(rows, columns=["g", "minute", "v"])
    return spark.createDataFrame(pdf), pdf


def test_relative_error_guarantee(values_sdf):
    sdf, pdf = values_sdf
    sk = DD.dd_sketch(sdf, ["g"], "v")
    est = {r["g"]: r["dd_q"] for r in DD.with_dd_quantiles(sk).collect()}
    tol = DD.relative_error_bound() + 1e-9
    for g, grp in pdf.groupby("g"):
        vals = np.sort(grp["v"].to_numpy())
        for q, e in zip((0.5, 0.9, 0.99), est[g]):
            exact = vals[int(np.floor(q * (len(vals) - 1)))]  # rank value
            assert abs(e - exact) <= tol * exact, (g, q, e, exact)


def test_cascade_merge_bit_identical(values_sdf):
    sdf, _ = values_sdf
    fine = DD.dd_sketch(sdf, ["g", "minute"], "v")
    cascaded = DD.dd_merge(fine, ["g"])
    direct = DD.dd_sketch(sdf, ["g"], "v")
    a = {r["g"]: (list(map(tuple, r["dd"])), r["dd_zeros"]) for r in cascaded.collect()}
    b = {r["g"]: (list(map(tuple, r["dd"])), r["dd_zeros"]) for r in direct.collect()}
    assert a == b


def test_parallelism_determinism(values_sdf):
    sdf, _ = values_sdf
    a = DD.with_dd_quantiles(DD.dd_sketch(sdf, ["g"], "v")).orderBy("g").collect()
    b = (
        DD.with_dd_quantiles(DD.dd_sketch(sdf.repartition(13), ["g"], "v"))
        .orderBy("g")
        .collect()
    )
    assert [tuple(r["dd_q"]) for r in a] == [tuple(r["dd_q"]) for r in b]


def test_state_bounded(values_sdf):
    sdf, pdf = values_sdf
    sk = DD.dd_sketch(sdf, ["g"], "v").collect()
    for r in sk:
        # 4000 values -> state bounded by the log-range, far under the count
        assert len(r["dd"]) < 1500
        assert r["dd_zeros"] == 25


def test_zero_only_group(spark):
    pdf = pd.DataFrame({"g": ["z"] * 4, "v": [0.0] * 4})
    sk = DD.dd_sketch(spark.createDataFrame(pdf), ["g"], "v")
    row = DD.with_dd_quantiles(sk).collect()[0]
    assert row["dd_zeros"] == 4
    assert row["dd_q"] == [0.0, 0.0, 0.0]
