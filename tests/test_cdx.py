"""CDX index source: line grammar, typed fields, strict/lenient modes,
gz reading, latest-capture dedup; SURT urlkey derivation."""

import gzip
import json

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.sources.cdx import latest_captures, open_cdx, parse_cdx_lines


def _line(urlkey, ts, **attrs):
    return f"{urlkey} {ts} {json.dumps(attrs)}"


LINES = [
    _line(
        "com,example)/page", "20240301120000",
        url="https://example.com/page", mime="text/html", status="200",
        digest="AAA", length="1234", offset="0", filename="crawl-0.warc.gz",
    ),
    _line(
        "com,example)/page", "20240401130000",
        url="https://example.com/page", mime="text/html", status="200",
        digest="BBB", length="1300", offset="900", filename="crawl-1.warc.gz",
    ),
    # revisit record: '-' status
    _line(
        "org,other)/x", "20240102030405",
        url="https://other.org/x", mime="warc/revisit", status="-",
        digest="CCC", length="88", offset="5", filename="crawl-1.warc.gz",
    ),
    "",
]


def _df(spark, lines):
    return spark.createDataFrame(pd.DataFrame({"value": lines}))


def test_parse_typed_fields(spark):
    rows = {
        (r["urlkey"], r["digest"]): r
        for r in parse_cdx_lines(_df(spark, LINES)).collect()
    }
    assert len(rows) == 3  # blank line ignored
    a = rows[("com,example)/page", "AAA")]
    assert str(a["fetch_ts"]) == "2024-03-01 12:00:00"
    assert (a["mime"], a["status"], a["length"], a["offset"], a["filename"]) == (
        "text/html", 200, 1234, 0, "crawl-0.warc.gz",
    )
    rv = rows[("org,other)/x", "CCC")]
    assert rv["status"] is None and rv["mime"] == "warc/revisit"


def test_strict_raises_lenient_drops(spark):
    bad = LINES + ["not a cdx line"]
    with pytest.raises(Exception, match="malformed CDX line"):
        parse_cdx_lines(_df(spark, bad)).count()
    assert parse_cdx_lines(_df(spark, bad), strict=False).count() == 3


def test_open_cdx_reads_gz(spark, tmp_path):
    p = tmp_path / "index.cdx.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("\n".join(LINES) + "\n")
    got = open_cdx(spark, str(p))
    assert got.count() == 3
    assert got.schema["fetch_ts"].dataType.typeName() == "timestamp_ntz"


def test_latest_captures_survivor(spark):
    got = latest_captures(parse_cdx_lines(_df(spark, LINES)))
    rows = {r["urlkey"]: r for r in got.collect()}
    assert len(rows) == 2
    assert rows["com,example)/page"]["digest"] == "BBB"
    assert rows["com,example)/page"]["offset"] == 900
    # deterministic across parallelism
    src = parse_cdx_lines(_df(spark, LINES * 10), strict=False)
    a = latest_captures(src.repartition(1)).collect()
    b = latest_captures(src.repartition(7)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_surt_key(spark):
    from tstore_spark.functions.urls import surt_key

    cases = {
        "https://www.Example.COM/Path/A?b=2&a=1": "com,example)/path/a?a=1&b=2",
        "http://sub.site.org/x": "org,site,sub)/x",
        "https://example.com": "com,example)",
        "https://example.com/?": "com,example)/",
        "not a url": None,
    }
    df = spark.createDataFrame(pd.DataFrame({"u": list(cases)}))
    got = {r["u"]: r["k"] for r in df.select("u", surt_key("u").alias("k")).collect()}
    assert got == cases
