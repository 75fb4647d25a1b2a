"""robots.txt evaluation: parse Robots Exclusion Protocol files and filter
URL tables by crawlability — the compliance gate every crawl-derived
corpus pipeline needs (RFC 9309; the Common-Crawl robots dataset shape).

Implemented subset (the RFC core, documented bluntly):

* **Groups**: consecutive ``User-agent`` lines open a group sharing the
  rules that follow; a host's effective group set is the exact-agent
  groups when any exist, else the ``*`` groups (the RFC's two-tier
  fallback; no partial-token agent matching).
* **Rules**: ``Allow`` / ``Disallow`` with path patterns — literal prefix,
  ``*`` wildcard, trailing ``$`` end anchor. Empty ``Disallow:`` matches
  nothing (RFC: an empty pattern permits everything).
* **Decision**: among rules whose pattern matches the URL path, the
  LONGEST pattern wins; on equal length ``Allow`` wins; no matching rule
  means allowed. Deterministic final tie-break on the pattern text.

Everything is Catalyst expressions — line splitting, gaps-and-islands
group ids (one window over line numbers per host), pattern→LIKE
translation, and the longest-match argmax — so the whole pipeline is
whole-stage-codegen'd, engine-portable (the DuckDB oracle replays the
same expressions), and bit-deterministic. Scale shape: robots files are
KB-sized and one per host — the rules table is host-proportional, the
URL join an equi-join on host.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _like_expr(pattern_col: str) -> Column:
    """Robots path pattern → SQL LIKE pattern: escape ``\\ % _``, ``*`` →
    ``%``, trailing ``$`` anchors the end, otherwise a trailing ``%``
    keeps prefix semantics. One fixed expression chain — mirror it
    verbatim in SQL oracles."""
    p = F.col(pattern_col)
    esc = F.regexp_replace(p, r"([\\%_])", r"\\$1")
    star = F.regexp_replace(esc, r"\*", "%")
    return F.when(
        star.endswith("$"), star.substr(F.lit(1), F.length(star) - 1)
    ).otherwise(F.concat(star, F.lit("%")))


def parse_robots(
    robots: DataFrame,
    host_col: str = "host",
    content_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse one robots.txt per host into the effective rule table for
    ``agent``: ``(host, rule 'allow'|'disallow', pattern, pattern_len)``.
    """
    w = Window.partitionBy("_h").orderBy("_pos")
    lines = robots.select(
        F.col(host_col).alias("_h"),
        F.posexplode(F.split(F.col(content_col), "\n")).alias("_pos", "_raw"),
    ).select(
        "_h",
        "_pos",
        F.trim(F.regexp_replace("_raw", "#.*$", "")).alias("_line"),
    )
    parsed = (
        lines.where(F.col("_line").contains(":"))
        .select(
            "_h",
            "_pos",
            F.lower(F.trim(F.regexp_extract("_line", "^([^:]+):", 1))).alias("_key"),
            F.trim(F.regexp_extract("_line", "^[^:]+:(.*)$", 1)).alias("_val"),
        )
        .withColumn("_is_ua", F.col("_key") == "user-agent")
        .withColumn(
            "_grp",
            F.sum(
                F.when(
                    F.col("_is_ua") & ~F.lag("_is_ua", 1, False).over(w), 1
                ).otherwise(0)
            ).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
        )
    )
    agents = parsed.where("_is_ua").select(
        "_h", "_grp", F.lower(F.col("_val")).alias("_agent")
    )
    g_exact = (
        agents.where(F.col("_agent") == agent.lower()).select("_h", "_grp").distinct()
    )
    g_star = agents.where(F.col("_agent") == "*").select("_h", "_grp").distinct()
    hosts_exact = g_exact.select("_h").distinct()
    chosen = g_exact.unionByName(
        g_star.join(hosts_exact, "_h", "left_anti")
    )
    rules = parsed.where(
        F.col("_key").isin("allow", "disallow") & (F.col("_val") != "")
    ).join(chosen, ["_h", "_grp"])
    return rules.select(
        F.col("_h").alias("host"),
        F.col("_key").alias("rule"),
        F.col("_val").alias("pattern"),
        F.length("_val").alias("pattern_len"),
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Every input row with ``allowed`` (boolean) and ``matched_pattern``
    (NULL when no rule matched → allowed by default). ``rules`` is
    :func:`parse_robots` output; hosts absent from it are fully allowed.
    """
    # try_parse_url: a malformed URL gets NULL host, never joins a rule, and
    # falls through to the default-allowed branch (flag it upstream with the
    # expectations layer if malformed rows should quarantine instead)
    u = urls.withColumns(
        {
            "_uhost": F.try_parse_url(F.col(url_col), F.lit("HOST")),
            "_upath": F.coalesce(
                F.nullif(F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("")),
                F.lit("/"),
            ),
        }
    )
    r = rules.select(
        F.col("host").alias("_uhost"),
        "rule",
        "pattern",
        "pattern_len",
        _like_expr("pattern").alias("_like"),
    )
    hits = (
        u.select(url_col, "_uhost", "_upath")
        .join(r, "_uhost")
        .where(F.expr("_upath LIKE _like ESCAPE '\\\\'"))
    )
    pick = Window.partitionBy(url_col).orderBy(
        F.desc("pattern_len"), F.asc("rule"), F.asc("pattern")
    )
    best = (
        hits.withColumn("_rk", F.row_number().over(pick))
        .where(F.col("_rk") == 1)
        .select(
            url_col,
            (F.col("rule") == "allow").alias("_allowed"),
            F.col("pattern").alias("matched_pattern"),
        )
    )
    return (
        u.join(best, url_col, "left")
        .select(
            *urls.columns,
            F.coalesce("_allowed", F.lit(True)).alias("allowed"),
            "matched_pattern",
        )
    )
