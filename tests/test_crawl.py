"""Crawl scheduling: politeness slots, budgets, fetcher ownership."""

import pytest

from pyspark.sql import functions as F

from tstore_spark.operators.crawl import crawl_schedule, fetcher_load


@pytest.fixture(scope="module")
def frontier(spark):
    rows = [
        (f"https://a.example/{i}", "a.example", i % 3) for i in range(6)
    ] + [(f"https://b.example/{i}", "b.example", 0) for i in range(2)]
    return spark.createDataFrame(rows, "url string, host string, prio int")


def test_slots_follow_priority_then_url(spark, frontier):
    sched = crawl_schedule(frontier, priority_col="prio", delay_ms=500)
    a = [
        (r["slot"], r["url"], r["fetch_offset_ms"])
        for r in sched.where(F.col("host") == "a.example").orderBy("slot").collect()
    ]
    # prio 2 first (urls /2, /5), then prio 1 (/1, /4), then prio 0 (/0, /3)
    assert [u for _, u, _ in a] == [
        f"https://a.example/{i}" for i in (2, 5, 1, 4, 0, 3)
    ]
    assert [o for s, _, o in a] == [0, 500, 1000, 1500, 2000, 2500]


def test_one_fetcher_owns_each_host(spark, frontier):
    sched = crawl_schedule(frontier, priority_col="prio")
    per_host = (
        sched.groupBy("host").agg(F.countDistinct("fetcher").alias("nf")).collect()
    )
    assert all(r["nf"] == 1 for r in per_host)
    assert all(0 <= r["fetcher"] < 64 for r in sched.collect())


def test_budget_caps_per_host(spark, frontier):
    sched = crawl_schedule(frontier, priority_col="prio", max_per_host=2)
    counts = {r["host"]: r["n"] for r in
              sched.groupBy("host").agg(F.count("*").alias("n")).collect()}
    assert counts == {"a.example": 2, "b.example": 2}


def test_schedule_deterministic_across_parallelism(spark, frontier):
    one = sorted(map(tuple, crawl_schedule(frontier.repartition(1), priority_col="prio").collect()))
    many = sorted(map(tuple, crawl_schedule(frontier.repartition(7), priority_col="prio").collect()))
    assert one == many


def test_fetcher_load_accounting(spark, frontier):
    load = fetcher_load(crawl_schedule(frontier, priority_col="prio", delay_ms=1000))
    total_urls = sum(r["n_urls"] for r in load.collect())
    assert total_urls == 8
    mk = {r["fetcher"]: r["makespan_ms"] for r in load.collect()}
    assert max(mk.values()) == 5000  # a.example's 6th url at slot 5


def test_bad_args_raise(spark, frontier):
    for kwargs in ({"delay_ms": 0}, {"n_fetchers": 0}, {"max_per_host": 0}):
        with pytest.raises(ValueError):
            crawl_schedule(frontier, **kwargs)


def test_plan_crawl_round_end_to_end(spark):
    from tstore_spark.operators.crawl import plan_crawl_round
    from tstore_spark.operators.robots import parse_robots

    pages = spark.createDataFrame(
        [
            ("https://a.ex/p1",
             '<a href="https://b.ex/new1">x</a><a href="https://b.ex/seen">y</a>'
             '<a href="https://b.ex/private/s">z</a>'),
            ("https://a.ex/p2", '<a href="https://b.ex/new1">again</a>'),
            ("https://a.ex/p3", "no links here"),
        ],
        "url string, html string",
    )
    seen = spark.createDataFrame([("https://b.ex/seen",)], "url string")
    robots = spark.createDataFrame(
        [("b.ex", "User-agent: *\nDisallow: /private/")],
        "host string, robots_txt string",
    )
    rules = parse_robots(robots)
    sched = plan_crawl_round(pages, seen, robots_rules=rules, delay_ms=100)
    rows = {r["url"]: r for r in sched.collect()}
    # seen url dropped, disallowed url dropped, duplicate discovery deduped
    assert set(rows) == {"https://b.ex/new1"}
    assert rows["https://b.ex/new1"]["slot"] == 0
    assert rows["https://b.ex/new1"]["host"] == "b.ex"


def test_plan_crawl_round_no_robots(spark):
    from tstore_spark.operators.crawl import plan_crawl_round

    pages = spark.createDataFrame(
        [("https://a.ex/p", '<a href="https://c.ex/1">l</a><a href="https://c.ex/2">m</a>')],
        "url string, html string",
    )
    seen = spark.createDataFrame([], "url string")
    sched = plan_crawl_round(pages, seen, delay_ms=50)
    got = sorted((r["url"], r["slot"], r["fetch_offset_ms"]) for r in sched.collect())
    assert got == [("https://c.ex/1", 0, 0), ("https://c.ex/2", 1, 50)]


# ------------------------------------------------------------- recrawl


def _obs_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, crawl_round long, content_sig string"
    )


def test_recrawl_interval_matches_observed_change_rate(spark):
    from tstore_spark.operators.crawl import recrawl_intervals

    rows = []
    # hot: changes every observation (10 obs, 9 changes) -> interval 1
    rows += [(f"https://h/hot", r, f"v{r}") for r in range(10)]
    # slow: changes every 3rd observation (9 obs, sig flips at 3,6)
    rows += [("https://h/slow", r, f"v{r // 3}") for r in range(9)]
    # static: never changes -> clamps to max_interval
    rows += [("https://h/static", r, "same") for r in range(10)]
    # single observation -> explore at min_interval
    rows += [("https://h/new", 7, "x")]
    got = {
        r["url"]: r
        for r in recrawl_intervals(_obs_df(spark, rows), max_interval=5).collect()
    }
    hot = got["https://h/hot"]
    assert (hot["n_obs"], hot["n_changes"], hot["revisit_every"], hot["next_round"]) == (10, 9, 1, 10)
    slow = got["https://h/slow"]
    assert (slow["n_changes"], slow["revisit_every"]) == (2, 4)  # (9-1) div 2
    static = got["https://h/static"]
    assert (static["n_changes"], static["revisit_every"], static["next_round"]) == (0, 5, 14)
    new = got["https://h/new"]
    assert (new["n_obs"], new["revisit_every"], new["next_round"]) == (1, 1, 8)


def test_recrawl_gap_counts_one_change(spark):
    from tstore_spark.operators.crawl import recrawl_intervals

    # rounds 0 and 5 observed with different sigs: ONE change, not five
    rows = [("https://h/g", 0, "a"), ("https://h/g", 5, "b")]
    [r] = recrawl_intervals(_obs_df(spark, rows)).collect()
    assert (r["n_obs"], r["n_changes"], r["revisit_every"]) == (2, 1, 1)


def test_recrawl_single_shuffle_and_determinism(spark):
    from tstore_spark.operators.crawl import recrawl_intervals

    rows = [
        (f"https://h/{i % 37}", r, f"v{(i * r) % 5}")
        for i in range(200)
        for r in range(4)
    ]
    df = _obs_df(spark, rows)
    out = recrawl_intervals(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    a = recrawl_intervals(df.repartition(1)).collect()
    b = recrawl_intervals(df.repartition(13)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_recrawl_bad_args(spark):
    from tstore_spark.operators.crawl import recrawl_intervals

    df = _obs_df(spark, [("u", 0, "x")])
    with pytest.raises(ValueError):
        recrawl_intervals(df, min_interval=0)
    with pytest.raises(ValueError):
        recrawl_intervals(df, min_interval=5, max_interval=2)
