"""Gap-fill: synthesized windows, zero-fill, linear interpolation."""

import pandas as pd

from tstore_spark.operators.gapfill import gap_fill
from tstore_spark.operators.rollup import rollup_from_raw

_COLS = [
    "domain", "window_start", "doc_count", "bytes_total", "lang_distinct",
    "lang_set", "hist_lens", "hist_cnts",
    "text_len_p50", "text_len_p90", "text_len_p99", "gap_filled",
]


def _tier_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=_COLS)
    pdf["window_start"] = pd.to_datetime(pdf["window_start"]).astype("datetime64[us]")
    schema = (
        "domain string, window_start timestamp, doc_count long, bytes_total long, "
        "lang_distinct long, lang_set array<string>, hist_lens array<int>, "
        "hist_cnts array<long>, text_len_p50 double, text_len_p90 double, "
        "text_len_p99 double, gap_filled boolean"
    )
    return spark.createDataFrame(pdf, schema=schema)


def test_gapfill_grid_complete(pages_sdf):
    tier = rollup_from_raw(pages_sdf, "1h")
    filled = gap_fill(tier, "1h").toPandas()
    for dom, g in filled.groupby("domain"):
        g = g.sort_values("window_start")
        diffs = g["window_start"].diff().dropna()
        assert (diffs == pd.Timedelta(hours=1)).all(), f"grid gap for {dom}"


def test_gapfill_zero_and_interp(spark):
    tier = _tier_df(spark, [
        ("d", "2024-01-01 00:00", 10, 100, 2, ["en"], [5], [10], 5.0, 5.0, 5.0, False),
        ("d", "2024-01-01 03:00", 4, 40, 1, ["de"], [8], [4], 11.0, 11.0, 11.0, False),
    ])
    got = gap_fill(tier, "1h").toPandas().sort_values("window_start").reset_index(drop=True)
    assert len(got) == 4
    assert got["gap_filled"].tolist() == [False, True, True, False]
    assert got["doc_count"].tolist() == [10, 0, 0, 4]
    # linear interpolation between 5.0 (t=0h) and 11.0 (t=3h): 7.0, 9.0
    assert got["text_len_p50"].tolist() == [5.0, 7.0, 9.0, 11.0]


def test_gapfill_explicit_range(spark):
    tier = _tier_df(spark, [
        ("d", "2024-01-01 01:00", 1, 1, 1, ["en"], [5], [1], 5.0, 5.0, 5.0, False),
    ])
    got = gap_fill(
        tier, "1h", start=pd.Timestamp("2024-01-01 00:00"), end=pd.Timestamp("2024-01-01 04:00")
    ).toPandas()
    assert len(got) == 5
    # edges extend with nearest value (ffill/bfill beyond observed range)
    got = got.sort_values("window_start")
    assert got["text_len_p50"].tolist() == [5.0] * 5


def test_interpolation_across_dst_boundary_non_utc_session(spark):
    """Regression (round-2 advice): NTZ interpolation epochs must not route
    through the session-zoned TIMESTAMP cast — in a DST-observing session
    the offset jumps at the transition and skews the ratio. Gap spans the
    US spring-forward instant (2024-03-10 02:00 America/New_York)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from tstore_spark.operators.gapfill import gap_fill

    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        # build the NTZ column from STRINGS via to_timestamp_ntz —
        # createDataFrame from naive pandas timestamps would interpret them
        # in the (non-UTC) session zone, and 02:00 does not exist that night
        pdf = pd.DataFrame(
            {
                "domain": ["a"] * 2,
                "ws": ["2024-03-10 00:00:00", "2024-03-10 04:00:00"],
                "doc_count": [1, 1],
                "text_len_p50": [0.0, 400.0],
            }
        )
        tier = (
            spark.createDataFrame(pdf)
            .withColumn("window_start", F.to_timestamp_ntz("ws"))
            .drop("ws")
        )
        out = gap_fill(
            tier, "1h",
            zero_fill=["doc_count"], interp_cols=["text_len_p50"], array_fill={},
        )
        vals = {r["window_start"].hour: r["text_len_p50"] for r in out.collect()}
        # pure wall-clock linearity: 0,100,200,300,400 — a DST-skewed epoch
        # would interpolate 80/160/240/320 (5h of real time over 4 wall hours)
        assert vals == {0: 0.0, 1: 100.0, 2: 200.0, 3: 300.0, 4: 400.0}
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)


def test_explicit_range_ntz_bounds_on_dst_spring_forward(spark):
    """Explicit NTZ grid bounds at a wall hour that does not EXIST in the
    session zone (2024-03-10 02:00 America/New_York): parsing via
    session-zoned to_timestamp collapsed it onto 03:00, shifting the whole
    grid; to_timestamp_ntz keeps the wall clock."""
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        pdf = pd.DataFrame(
            {
                "domain": ["d"],
                "window_start": [pd.Timestamp("2024-03-10 04:00")],
                "doc_count": [1],
                "text_len_p50": [5.0],
            }
        )
        tier = spark.createDataFrame(
            pdf,
            schema="domain string, window_start timestamp_ntz, "
            "doc_count long, text_len_p50 double",
        )
        got = gap_fill(
            tier, "1h",
            start=pd.Timestamp("2024-03-10 02:00"),
            end=pd.Timestamp("2024-03-10 05:00"),
        ).toPandas().sort_values("window_start")
        assert [str(t) for t in got["window_start"]] == [
            "2024-03-10 02:00:00",
            "2024-03-10 03:00:00",
            "2024-03-10 04:00:00",
            "2024-03-10 05:00:00",
        ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
