"""Retention cohorts + funnel: known-answer, brute-force, and parallelism tests."""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.behavior import funnel, funnel_counts, retention_cohorts

DAY_US = 86400 * 1_000_000


def _events(n=3000) -> pd.DataFrame:
    i = np.arange(n, dtype=np.int64)
    h = (i * 2654435761) % (1 << 32)
    ts = pd.Timestamp("2024-03-01") + pd.to_timedelta(
        (h % (20 * 86400)).astype(np.int64), unit="s"
    )
    return pd.DataFrame(
        {
            "event_type": np.array(["click", "view", "error", "signup", "purchase"])[i % 5],
            "ts": ts.astype("datetime64[us]"),
            "user_id": (h % 40).astype(np.int64),
        }
    )


@pytest.fixture(scope="module")
def ev_sdf(spark):
    return spark.createDataFrame(_events()).cache()


# ---------------------------------------------------------------------------
# retention cohorts
# ---------------------------------------------------------------------------


def test_retention_cohorts_brute_force(spark, ev_sdf):
    got = {
        (r["cohort"], r["day_offset"]): r["active_users"]
        for r in retention_cohorts(ev_sdf).collect()
    }
    pdf = _events()
    pdf["day"] = pdf["ts"].dt.date
    active = pdf[["user_id", "day"]].drop_duplicates()
    cohort = active.groupby("user_id")["day"].min().rename("cohort")
    j = active.join(cohort, on="user_id")
    j["off"] = (pd.to_datetime(j["day"]) - pd.to_datetime(j["cohort"])).dt.days
    want = j.groupby(["cohort", "off"]).size()
    assert len(got) == len(want)
    for (c, off), n in want.items():
        assert got[(c, int(off))] == n


def test_retention_day0_totals_match_user_count(spark, ev_sdf):
    out = retention_cohorts(ev_sdf)
    day0 = out.where("day_offset = 0").agg({"active_users": "sum"}).collect()[0][0]
    assert day0 == ev_sdf.select("user_id").distinct().count()


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------


def _mk(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]).astype(
            {"user_id": "int64", "ts": "datetime64[us]"}
        )
    )


def test_funnel_known_answer(spark):
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    df = _mk(
        spark,
        [
            # u1 completes in order
            (1, "view", at(0)),
            (1, "click", at(10)),
            (1, "purchase", at(20)),
            # u2: click BEFORE the first view must not count; no purchase
            (2, "click", at(0)),
            (2, "view", at(5)),
            (2, "click", at(9)),
            # u3: purchase before click -> depth 2 only after a later purchase is absent
            (3, "view", at(0)),
            (3, "purchase", at(1)),
            (3, "click", at(2)),
            # u4: only non-step events are filtered out entirely
            (4, "error", at(0)),
        ],
    )
    got = {r["user_id"]: r for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1]["depth"] == 3 and got[1]["t2_us"] - got[1]["t0_us"] == 20 * 1_000_000
    assert got[2]["depth"] == 2 and got[2]["t1_us"] - got[2]["t0_us"] == 4 * 1_000_000
    assert got[3]["depth"] == 2  # purchase at t1 precedes click at t2 -> not counted
    assert got[3]["t2_us"] is None


def test_funnel_within_window(spark):
    t0 = dt.datetime(2024, 1, 1)
    df = _mk(
        spark,
        [
            (1, "view", t0),
            (1, "click", t0 + dt.timedelta(days=2)),  # outside 1-day window
            (2, "view", t0),
            (2, "click", t0 + dt.timedelta(hours=12)),
        ],
    )
    got = {r["user_id"]: r["depth"] for r in funnel(df, ["view", "click"], within_us=DAY_US).collect()}
    assert got == {1: 1, 2: 2}
    # without the window both convert
    got2 = {r["user_id"]: r["depth"] for r in funnel(df, ["view", "click"]).collect()}
    assert got2 == {1: 2, 2: 2}


def _brute_funnel(pdf, steps, within_us=None):
    """Chained-min reference: step i = min t of step-i events strictly after
    step i-1 (and within the window of step 0)."""
    out = {}
    ep = pdf.assign(t=pdf["ts"].astype("int64"))
    for uid, grp in ep[ep["event_type"].isin(steps)].groupby("user_id"):
        times = [None] * len(steps)
        for i, s in enumerate(steps):
            cand = grp[grp["event_type"] == s]["t"]
            if i > 0:
                if times[i - 1] is None:
                    break
                cand = cand[cand > times[i - 1]]
                if within_us is not None:
                    cand = cand[cand - times[0] <= within_us]
            if len(cand) == 0:
                break
            times[i] = int(cand.min())
        out[uid] = times
    return out


def test_funnel_brute_force_random(spark, ev_sdf):
    steps = ["view", "click", "purchase"]
    got = {
        r["user_id"]: [r["t0_us"], r["t1_us"], r["t2_us"]]
        for r in funnel(ev_sdf, steps, within_us=3 * DAY_US).collect()
    }
    want = _brute_funnel(_events(), steps, within_us=3 * DAY_US)
    assert got == want


def test_funnel_deterministic_across_parallelism(spark, ev_sdf):
    steps = ["view", "click", "purchase"]
    a = sorted(map(tuple, funnel(ev_sdf, steps).collect()))
    b = sorted(map(tuple, funnel(ev_sdf.repartition(13), steps).collect()))
    assert a == b


def test_funnel_counts(spark, ev_sdf):
    steps = ["view", "click", "purchase"]
    f = funnel(ev_sdf, steps)
    counts = {r["step"]: r["users_reached"] for r in funnel_counts(f, 3).collect()}
    depths = [r["depth"] for r in f.collect()]
    for s in (1, 2, 3):
        assert counts[s] == sum(1 for d in depths if d >= s)
    assert counts[1] >= counts[2] >= counts[3]


# ---------------------------------------------------------------------------
# transitions (first-order Markov matrix)
# ---------------------------------------------------------------------------


def _events_with_ids(n=3000) -> pd.DataFrame:
    pdf = _events(n)
    pdf["event_id"] = np.arange(n, dtype=np.int64)
    return pdf


@pytest.fixture(scope="module")
def evid_sdf(spark):
    return spark.createDataFrame(_events_with_ids()).cache()


def _brute_transitions(pdf: pd.DataFrame) -> dict:
    pdf = pdf.sort_values(["user_id", "ts", "event_id"])
    pairs = {}
    for _, g in pdf.groupby("user_id"):
        states = g["event_type"].tolist()
        for a, b in zip(states, states[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    return pairs


def test_transitions_brute_force(spark, evid_sdf):
    from tstore_spark.operators.behavior import transitions

    got = {
        (r["from_state"], r["to_state"]): (r["n_transitions"], r["n_from"], r["p"])
        for r in transitions(evid_sdf, tiebreak_cols=["event_id"]).collect()
    }
    want = _brute_transitions(_events_with_ids())
    assert set(got) == set(want)
    from_totals = {}
    for (a, _), n in want.items():
        from_totals[a] = from_totals.get(a, 0) + n
    for (a, b), n in want.items():
        nt, nf, p = got[(a, b)]
        assert nt == n
        assert nf == from_totals[a]
        assert p == n / from_totals[a]  # one fixed division — exact bits


def test_transitions_excludes_last_event(spark, evid_sdf):
    from tstore_spark.operators.behavior import transitions

    out = transitions(evid_sdf, tiebreak_cols=["event_id"])
    total = out.agg(F.sum("n_transitions")).collect()[0][0]
    n_events = evid_sdf.count()
    n_users = evid_sdf.select("user_id").distinct().count()
    assert total == n_events - n_users


def test_transitions_probabilities_sum_to_one(spark, evid_sdf):
    from tstore_spark.operators.behavior import transitions

    rows = transitions(evid_sdf, tiebreak_cols=["event_id"]).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_state"], []).append(r["p"])
    for ps in by_from.values():
        assert abs(sum(ps) - 1.0) < 1e-9


def test_transitions_deterministic_across_parallelism(spark, evid_sdf):
    from tstore_spark.operators.behavior import transitions

    a = sorted(map(tuple, transitions(evid_sdf, tiebreak_cols=["event_id"]).collect()))
    b = sorted(
        map(
            tuple,
            transitions(evid_sdf.repartition(17), tiebreak_cols=["event_id"]).collect(),
        )
    )
    assert a == b


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------


def _att_frames(spark):
    t0 = pd.Timestamp("2024-01-01")
    touches = pd.DataFrame({
        "user_id": [1, 1, 1, 2, 2, 3],
        "event_id": [10, 11, 12, 20, 21, 30],
        "ts": [t0, t0 + pd.Timedelta(minutes=5), t0 + pd.Timedelta(minutes=90),
               t0, t0 + pd.Timedelta(minutes=1), t0 - pd.Timedelta(days=8)],
    })
    convs = pd.DataFrame({
        "user_id": [1, 2, 3],
        "event_id": [100, 200, 300],
        "ts": [t0 + pd.Timedelta(minutes=10), t0 + pd.Timedelta(minutes=1), t0],
        "cents": [1001, 500, 300],
    })
    return (spark.createDataFrame(touches.astype({"ts": "datetime64[us]"})),
            spark.createDataFrame(convs.astype({"ts": "datetime64[us]"})))


def test_attribution_linear_largest_remainder(spark):
    from tstore_spark.operators.behavior import attribute_conversions

    t, c = _att_frames(spark)
    out = attribute_conversions(t, c, "linear", value_cents_col="cents").collect()
    by_conv = {}
    for r in out:
        by_conv.setdefault(r["conv_id"], {})[r["touch_id"]] = (
            r["credit_cents"], r["n_touches"])
    # user 1: touches 10, 11 in window (12 is after conv): 1001 = 501 + 500
    assert by_conv[100] == {10: (501, 2), 11: (500, 2)}
    # user 2: both touches eligible (one AT the conversion instant): 250 each
    assert by_conv[200] == {20: (250, 2), 21: (250, 2)}
    # user 3: touch 8 days old — outside the 7-day lookback: no rows
    assert 300 not in by_conv
    # credits sum exactly to conversion value
    sums = {cid: sum(v for v, _ in m.values()) for cid, m in by_conv.items()}
    assert sums == {100: 1001, 200: 500}


def test_attribution_first_and_last(spark):
    from tstore_spark.operators.behavior import attribute_conversions

    t, c = _att_frames(spark)
    first = {(r["conv_id"], r["touch_id"]): r["credit_cents"]
             for r in attribute_conversions(t, c, "first",
                                            value_cents_col="cents").collect()}
    last = {(r["conv_id"], r["touch_id"]): r["credit_cents"]
            for r in attribute_conversions(t, c, "last",
                                           value_cents_col="cents").collect()}
    assert first[(100, 10)] == 1001 and first[(100, 11)] == 0
    assert last[(100, 10)] == 0 and last[(100, 11)] == 1001


def test_attribution_guards_and_default_value(spark):
    import pytest as _pt

    from tstore_spark.operators.behavior import attribute_conversions

    t, c = _att_frames(spark)
    with _pt.raises(ValueError, match="model"):
        attribute_conversions(t, c, "u_shape")
    with _pt.raises(ValueError, match="lookback"):
        attribute_conversions(t, c, lookback_us=0)
    out = attribute_conversions(t, c).collect()  # default: 100 cents each
    per_conv = {}
    for r in out:
        per_conv[r["conv_id"]] = per_conv.get(r["conv_id"], 0) + r["credit_cents"]
    assert all(v == 100 for v in per_conv.values())


def test_attribution_deterministic_across_parallelism(spark):
    from tstore_spark.operators.behavior import attribute_conversions

    t, c = _att_frames(spark)
    a = sorted(map(tuple, attribute_conversions(
        t.repartition(1), c.repartition(1), "linear",
        value_cents_col="cents").collect()))
    b = sorted(map(tuple, attribute_conversions(
        t.repartition(7), c.repartition(5), "linear",
        value_cents_col="cents").collect()))
    assert a == b


def test_conversion_paths_matches_brute_force(spark):
    from tstore_spark.operators.behavior import conversion_paths

    t0 = pd.Timestamp("2024-01-01")
    touches = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 2, 3],
        "event_id": [10, 11, 12, 13, 20, 30],
        "event_type": ["view", "click", "view", "click", "view", "click"],
        "ts": [t0, t0 + pd.Timedelta(minutes=1), t0 + pd.Timedelta(minutes=2),
               t0 + pd.Timedelta(minutes=3), t0, t0 - pd.Timedelta(days=9)],
    })
    convs = pd.DataFrame({
        "user_id": [1, 2, 3, 4],
        "event_id": [100, 200, 300, 400],
        "event_type": ["purchase"] * 4,
        "ts": [t0 + pd.Timedelta(minutes=10), t0 + pd.Timedelta(minutes=1),
               t0, t0],
    })
    tdf = spark.createDataFrame(touches.astype({"ts": "datetime64[us]"}))
    cdf = spark.createDataFrame(convs.astype({"ts": "datetime64[us]"}))
    got = {r["path"]: r["n_conversions"]
           for r in conversion_paths(tdf, cdf, steps=3).collect()}
    # user 1: last 3 of view,click,view,click -> click>view>click
    # user 2: single view; user 3: touch expired (9d); user 4: no touches
    assert got == {"click>view>click": 1, "view": 1, "": 2}

    got2 = {r["path"]: r["n_conversions"]
            for r in conversion_paths(tdf, cdf, steps=2).collect()}
    assert got2 == {"view>click": 1, "view": 1, "": 2}


def test_conversion_paths_guards_and_determinism(spark):
    import pytest as _pt

    from tstore_spark.operators.behavior import conversion_paths

    t0 = pd.Timestamp("2024-01-01")
    t = spark.createDataFrame(pd.DataFrame({
        "user_id": [i % 7 for i in range(300)],
        "event_id": range(300),
        "event_type": [["view", "click", "signup"][i % 3] for i in range(300)],
        "ts": [t0 + pd.Timedelta(minutes=i) for i in range(300)],
    }).astype({"ts": "datetime64[us]"}))
    c = spark.createDataFrame(pd.DataFrame({
        "user_id": [i % 7 for i in range(40)],
        "event_id": [1000 + i for i in range(40)],
        "event_type": ["purchase"] * 40,
        "ts": [t0 + pd.Timedelta(minutes=7 * i + 3) for i in range(40)],
    }).astype({"ts": "datetime64[us]"}))
    with _pt.raises(ValueError, match="steps"):
        conversion_paths(t, c, steps=0)
    a = sorted(map(tuple, conversion_paths(
        t.repartition(1), c.repartition(1)).collect()))
    b = sorted(map(tuple, conversion_paths(
        t.repartition(13), c.repartition(5)).collect()))
    assert a == b
    assert sum(n for _, n in a) == 40  # every conversion lands in a bucket
