"""robots.txt layer: RFC 9309 subset — groups, precedence, wildcards."""

import pandas as pd
import pytest

from tstore_spark.operators.robots import parse_robots, robots_allowed

ROBOTS = {
    "a.com": "User-agent: *\nDisallow: /private/\nAllow: /private/public*\n"
             "Disallow: /tmp$\n",
    "b.com": "User-agent: googlebot\nDisallow: /\n\nUser-agent: *\nAllow: /\n",
    "c.com": "# comments only\nUser-agent: *\nDisallow:\n",
    "d.com": "User-agent: x\nUser-agent: *\nDisallow: /shared/\n",
    "e.com": "User-agent: *\nDisallow: /a_b/\n",  # LIKE metachar '_' literal
}


@pytest.fixture(scope="module")
def rules_star(spark):
    rdf = spark.createDataFrame(
        pd.DataFrame({"host": list(ROBOTS), "robots_txt": list(ROBOTS.values())})
    )
    return parse_robots(rdf, agent="*")


def _decide(spark, rules, urls):
    u = spark.createDataFrame(pd.DataFrame({"url": urls}))
    return {
        r["url"]: (r["allowed"], r["matched_pattern"])
        for r in robots_allowed(u, rules).collect()
    }


def test_precedence_wildcard_anchor_default(spark, rules_star):
    got = _decide(spark, rules_star, [
        "http://a.com/private/x",
        "http://a.com/private/public/y",
        "http://a.com/tmp",
        "http://a.com/tmpX",
        "http://a.com/",
        "http://nobots.com/x",
    ])
    assert got["http://a.com/private/x"] == (False, "/private/")
    assert got["http://a.com/private/public/y"] == (True, "/private/public*")
    assert got["http://a.com/tmp"] == (False, "/tmp$")       # end anchor
    assert got["http://a.com/tmpX"] == (True, None)          # anchor no-match
    assert got["http://a.com/"] == (True, None)
    assert got["http://nobots.com/x"] == (True, None)        # no robots at all


def test_agent_tiering_and_group_sharing(spark, rules_star):
    # star tier: b.com allows everything; googlebot tier: its own group wins
    got = _decide(spark, rules_star, ["http://b.com/anything"])
    assert got["http://b.com/anything"] == (True, "/")
    rdf = spark.createDataFrame(
        pd.DataFrame({"host": list(ROBOTS), "robots_txt": list(ROBOTS.values())})
    )
    g = parse_robots(rdf, agent="GoogleBot")  # case-insensitive agent
    got_g = _decide(spark, g, ["http://b.com/anything"])
    assert got_g["http://b.com/anything"] == (False, "/")
    # consecutive User-agent lines share one rule group
    got_d = _decide(spark, rules_star, ["http://d.com/shared/z"])
    assert got_d["http://d.com/shared/z"] == (False, "/shared/")


def test_empty_disallow_and_like_metachars(spark, rules_star):
    got = _decide(spark, rules_star, [
        "http://c.com/x",          # empty Disallow matches nothing
        "http://e.com/a_b/f",      # '_' in the pattern is literal
        "http://e.com/aXb/f",      # '_' must NOT behave as a LIKE wildcard
    ])
    assert got["http://c.com/x"] == (True, None)
    assert got["http://e.com/a_b/f"][0] is False
    assert got["http://e.com/aXb/f"][0] is True


def test_like_translation_unit(spark):
    # the pattern->LIKE chain, evaluated directly: % _ \ escape, * and $
    from tstore_spark.operators.robots import _like_expr

    pdf = pd.DataFrame({"pattern": ["/a*b$", "/p_q%r\\s", "/plain"]})
    got = dict(
        (r["pattern"], r["_like"])
        for r in spark.createDataFrame(pdf)
        .select("pattern", _like_expr("pattern").alias("_like"))
        .collect()
    )
    assert got["/a*b$"] == "/a%b"             # * -> %, trailing $ anchors
    assert got["/p_q%r\\s"] == "/p\\_q\\%r\\\\s%"  # metachars escaped, prefix %
    assert got["/plain"] == "/plain%"


def test_malformed_url_defaults_allowed(spark, rules_star):
    got = _decide(spark, rules_star, ["http://a.com/private/x", "not a url"])
    assert got["not a url"] == (True, None)
    assert got["http://a.com/private/x"][0] is False


def test_rules_table_shape(rules_star):
    rows = {(r["host"], r["rule"], r["pattern"]) for r in rules_star.collect()}
    assert ("a.com", "disallow", "/private/") in rows
    assert ("a.com", "allow", "/private/public*") in rows
    assert not any(h == "c.com" for h, _, _ in rows)  # empty pattern dropped
    # googlebot-specific group excluded from the star tier for b.com
    assert ("b.com", "allow", "/") in rows
    assert ("b.com", "disallow", "/") not in rows


def test_deterministic_across_parallelism(spark):
    rdf = spark.createDataFrame(
        pd.DataFrame({"host": list(ROBOTS), "robots_txt": list(ROBOTS.values())})
    )
    urls = [f"http://a.com/private/{i}" for i in range(50)] + [
        f"http://d.com/shared/{i}" for i in range(50)
    ]
    u = spark.createDataFrame(pd.DataFrame({"url": urls}))
    a = robots_allowed(u.repartition(1), parse_robots(rdf.repartition(1))).collect()
    b = robots_allowed(u.repartition(16), parse_robots(rdf.repartition(16))).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
