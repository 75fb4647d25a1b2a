"""WARC source: spec framing round trip, gzip members, HTTP envelope,
malformed-record refusal, distributed read."""

from datetime import datetime

import pandas as pd
import pytest

from tstore_spark.sources.warc import parse_warc, read_warc, warc_bytes

RECS = [
    {"url": "http://a.com/1", "ts": datetime(2024, 3, 1, 12, 0, 0),
     "payload": b"<html>alpha</html>"},
    {"url": "http://b.com/2", "ts": datetime(2024, 3, 1, 12, 5, 0),
     "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html>beta</html>"},
    {"url": "http://c.com/3", "ts": datetime(2024, 3, 2, 1, 0, 0),
     "payload": b"metadata-not-a-page", "type": "metadata"},
    {"url": "http://d.com/4", "ts": datetime(2024, 3, 2, 2, 30, 0),
     "payload": b"<html>\r\n\r\ndelta with embedded CRLFCRLF</html>"},
]


def test_parse_roundtrip_plain_and_gzip():
    for compress in (False, True):
        got = parse_warc(warc_bytes(RECS, compress=compress))
        # metadata record filtered; HTTP envelope stripped; binary-safe body
        assert [(u, t) for u, t, _, _ in got] == [
            ("http://a.com/1", datetime(2024, 3, 1, 12, 0)),
            ("http://b.com/2", datetime(2024, 3, 1, 12, 5)),
            ("http://d.com/4", datetime(2024, 3, 2, 2, 30)),
        ]
        assert got[0][3] == b"<html>alpha</html>"
        assert got[1][3] == b"<html>beta</html>"
        assert got[2][3] == b"<html>\r\n\r\ndelta with embedded CRLFCRLF</html>"


def test_parse_keep_types_and_malformed():
    all_types = parse_warc(warc_bytes(RECS), keep_types=("response", "metadata"))
    assert len(all_types) == 4  # a, b, d (responses) + c (metadata)
    assert {t for _, _, t, _ in all_types} == {"response", "metadata"}
    with pytest.raises(ValueError, match="malformed WARC framing"):
        parse_warc(b"NOT A WARC FILE")
    data = warc_bytes(RECS[:1])
    with pytest.raises(ValueError, match="truncated"):
        parse_warc(data[:-6])  # cut into the payload


def test_read_warc_distributed(spark, tmp_path):
    (tmp_path / "a.warc").write_bytes(warc_bytes(RECS[:2]))
    (tmp_path / "b.warc.gz").write_bytes(warc_bytes(RECS[2:], compress=True))
    (tmp_path / "ignore.txt").write_bytes(b"not a warc")
    df = read_warc(spark, str(tmp_path))
    rows = {r["url"]: r for r in df.collect()}
    assert set(rows) == {"http://a.com/1", "http://b.com/2", "http://d.com/4"}
    assert rows["http://b.com/2"]["html"] == b"<html>beta</html>"
    assert rows["http://a.com/1"]["warc_ts"] == datetime(2024, 3, 1, 12, 0)
    assert dict(df.dtypes)["warc_ts"] == "timestamp_ntz"
    assert dict(df.dtypes)["html"] == "binary"
    # the parsed pages feed the existing engine directly
    from tstore_spark.operators.rollup import rollup_all_tiers

    from pyspark.sql import functions as F

    pages = df.select("url", df.warc_ts.cast("timestamp").alias("warc_ts"),
                      "html", df.html.cast("string").alias("text"),
                      F.lit("en").alias("lang"))
    assert rollup_all_tiers(pages)["1d"].count() >= 1


def test_read_warc_no_matching_files(spark, tmp_path):
    (tmp_path / "only.txt").write_bytes(b"x")
    # pathGlobFilter excludes it -> zero files, an empty typed frame
    df = read_warc(spark, str(tmp_path))
    assert df.count() == 0
    assert dict(df.dtypes)["html"] == "binary"
