"""Ingest-time stat columns: rollup over narrow stats == rollup over payloads."""

import pytest
from pyspark.sql import functions as F

from tstore_spark import TSLong
from tstore_spark.operators.rollup import rollup_all_tiers
from tstore_spark.sources.archive import open_archive, write_archive


def _collect(df):
    return sorted(
        (r["domain"], r["window_start"], r["doc_count"], r["bytes_total"],
         r["text_len_p50"], r["text_len_p99"])
        for r in df.collect()
    )


def test_narrow_rollup_equals_payload_rollup(spark, pages_sdf):
    with_stats = pages_sdf.withColumn("html_bytes", F.octet_length("html")).withColumn(
        "text_len", F.length("text")
    )
    full = rollup_all_tiers(pages_sdf)
    narrow = rollup_all_tiers(with_stats, bytes_col="html_bytes", len_col="text_len")
    for tier in ("1m", "1h", "1d"):
        assert _collect(full[tier]) == _collect(narrow[tier]), tier


def test_archive_stats_columns_written_and_prunable(spark, pages_sdf, tmp_path):
    base = str(tmp_path / "arch")
    tl = TSLong.wrap(
        pages_sdf, id_var="url", time_var="warc_ts", ts_vars={"content": ["html", "text", "lang"]}
    )
    write_archive(
        tl,
        base,
        stats_columns={"html_bytes": F.octet_length("html"), "text_len": F.length("text")},
    )
    back = open_archive(spark, base, with_attributes=False)
    assert "html_bytes" in back.df.columns and "text_len" in back.df.columns
    row = back.df.select("html_bytes", F.octet_length("html").alias("chk")).head()
    assert row["html_bytes"] == row["chk"]
    # the narrow projection must not carry payload columns in its ReadSchema
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        back.df.select("url", "warc_ts", "html_bytes", "text_len", "lang").explain("formatted")
    plan = buf.getvalue()
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "html_bytes" in read_schema
    assert "html:" not in read_schema and "text:" not in read_schema
