"""CDX(J) index source: parse Common-Crawl-style URL-index lines.

A crawl archive ships two artifact families: the WARC payloads
(:mod:`sources.warc`) and the CDX index that locates every capture inside
them — one text line per capture, ``<urlkey> <timestamp> <json>`` (the
CDXJ shape served by the CC index and by pywb). The index is the entry
point for selective corpus builds: find captures by url/host/mime/status
FIRST, then range-read only the needed WARC segments — at 10^12 documents
nobody scans payloads to discover them.

Parsing is one codegen projection per line: two ``split_part``-style
regexp extracts for the key fields and ``get_json_object`` for the JSON
attributes (the jsonflat discipline: fixed paths, no schema sampling).
The capture timestamp is the 14-digit ``yyyyMMddHHmmss`` UTC convention
parsed as TIMESTAMP_NTZ (wall-clock, session-zone-proof — the
filters.py NTZ rule). ``length``/``offset`` stay BIGINT, ``status`` INT
(CDX uses '-' for missing status on revisit records -> NULL).

Malformed lines: ``strict=True`` (default) raises in-plan via a guard
riding the RETURNED urlkey column (the column-pruning lesson — a guard
in a dropped helper column never evaluates); ``strict=False`` drops
them, counted by the caller via an Observation if needed.

Scale notes: CDX files are line-splittable text (spark.read.text
parallelizes per file split; .gz falls back to whole-file tasks exactly
as WARC does — prefer many moderate .gz members, the CC layout). The
parse is shuffle-free; downstream joins key on urlkey, which is SORTED
within real CDX files — range-partitioned layouts stay range-prunable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: urlkey + 14-digit timestamp + the JSON blob (CDXJ line grammar)
_LINE_RE = r"^(\S+) (\d{14}) (\{.*\})$"

#: JSON attributes lifted to typed columns (fixed paths, jsonflat rule)
_FIELDS = ("url", "mime", "status", "digest", "length", "offset", "filename")


def parse_cdx_lines(
    df: DataFrame, line_col: str = "value", strict: bool = True
) -> DataFrame:
    """Typed capture rows from raw CDX(J) lines.

    Output: (urlkey, fetch_ts TIMESTAMP_NTZ, url, mime, status INT,
    digest, length BIGINT, offset BIGINT, filename). Blank lines are
    ignored; anything else non-conforming raises (strict) or drops."""
    line = F.col(line_col)
    key = F.regexp_extract(line, _LINE_RE, 1)
    ts = F.regexp_extract(line, _LINE_RE, 2)
    js = F.regexp_extract(line, _LINE_RE, 3)
    bad = (F.trim(line) != "") & (key == "")
    if strict:
        urlkey = F.when(
            bad,
            F.raise_error(
                F.concat(F.lit("parse_cdx_lines: malformed CDX line: "), line)
            ),
        ).otherwise(key)
    else:
        urlkey = key
    j = {f: F.get_json_object(js, f"$.{f}") for f in _FIELDS}
    out = (
        df.where(F.trim(line) != "")
        .select(
            urlkey.alias("urlkey"),
            # the parse rides behind a WHEN so a malformed line (ts extracts
            # to '') reaches the strict guard instead of tripping the ANSI
            # DateTimeException first — CASE branches evaluate lazily
            F.when(ts != "", F.to_timestamp_ntz(ts, F.lit("yyyyMMddHHmmss")))
            .alias("fetch_ts"),
            j["url"].alias("url"),
            j["mime"].alias("mime"),
            # CDX writes '-' for statusless (revisit) records
            F.when(j["status"] != "-", j["status"]).cast("int").alias("status"),
            j["digest"].alias("digest"),
            j["length"].cast("long").alias("length"),
            j["offset"].cast("long").alias("offset"),
            j["filename"].alias("filename"),
        )
    )
    if not strict:
        out = out.where(F.col("urlkey") != "")
    return out


def open_cdx(
    spark: SparkSession, path: str, strict: bool = True
) -> DataFrame:
    """Read CDX(J) index files (text or .gz) into typed capture rows."""
    return parse_cdx_lines(spark.read.text(path), "value", strict=strict)


def latest_captures(captures: DataFrame) -> DataFrame:
    """One row per urlkey: the most recent capture (max fetch_ts, ties to
    the lexically-largest digest then filename/offset — a total order, so
    the survivor is engine-portable). The crawl-over-crawl dedup step a
    selective corpus build runs before touching any WARC bytes: ONE
    min/max-struct groupBy (the dedup_paragraphs idiom), never a window
    over the full index."""
    cols = [c for c in captures.columns if c != "urlkey"]
    best = captures.groupBy("urlkey").agg(
        F.max(F.struct("fetch_ts", "digest", "filename", "offset", *[
            c for c in cols if c not in ("fetch_ts", "digest", "filename", "offset")
        ])).alias("_b")
    )
    return best.select("urlkey", *[F.col(f"_b.{c}").alias(c) for c in cols])
