"""WARC ingestion: read Common-Crawl-style web archive files into the
pages schema.

The corpus side of the engine consumes ``(url, warc_ts, html, ...)``
tables; real crawls arrive as WARC files (ISO 28500 — the format Common
Crawl publishes). This module parses the honest subset a training-data
pipeline needs: ``response``/``resource`` records, plain or gzip
(per-member gzip concatenation, the CC layout), HTTP envelope stripped
when present. No third-party warcio — the parser is ~80 lines of stdlib
over the spec's framing rule (headers terminated by CRLFCRLF, payload
length = Content-Length, records separated by CRLFCRLF).

Scale shape: files land via Spark's ``binaryFile`` source — one task per
WARC file (CC files are ~1 GB; the natural parallel unit — finer splits
are impossible anyway because gzip members aren't seekable without an
index). Parsing is one Arrow kernel per file batch; the output is a plain
DataFrame, so everything downstream (archive write, rollup, dedup) is the
existing engine. ``warc_bytes`` is the writer used by tests and the gate
fixture — a round trip through the real framing, not a mock of it.
"""

from __future__ import annotations

import gzip
import io
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

#: output schema of read_warc.
WARC_SCHEMA = (
    "warc_file string, url string, warc_ts timestamp_ntz, "
    "warc_type string, html binary"
)

_CRLF = b"\r\n"


def warc_bytes(records: list[dict], compress: bool = False) -> bytes:
    """Serialize records (dicts with url, ts (datetime), payload (bytes),
    optional type) into one WARC file's bytes — per-record gzip members
    when ``compress`` (the Common Crawl layout)."""
    out = io.BytesIO()
    for r in records:
        payload = r["payload"]
        ts = r["ts"]
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=timezone.utc)
        head = b"".join(
            [
                b"WARC/1.0\r\n",
                b"WARC-Type: " + r.get("type", "response").encode() + _CRLF,
                b"WARC-Target-URI: " + r["url"].encode() + _CRLF,
                b"WARC-Date: "
                + ts.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ").encode()
                + _CRLF,
                b"Content-Length: " + str(len(payload)).encode() + _CRLF,
                _CRLF,
            ]
        )
        rec = head + payload + _CRLF + _CRLF
        out.write(gzip.compress(rec) if compress else rec)
    return out.getvalue()


def _split_http(payload: bytes) -> bytes:
    """Strip the HTTP response envelope when present (WARC response records
    carry the full HTTP message; the body is what pipelines want)."""
    if payload[:5] in (b"HTTP/", b"http/"):
        sep = payload.find(b"\r\n\r\n")
        if sep >= 0:
            return payload[sep + 4 :]
    return payload


def parse_warc(data: bytes, keep_types: tuple = ("response", "resource")) -> list[tuple]:
    """Parse one WARC file's bytes -> [(url, ts_utc_naive, type, body)].

    Framing per spec: header block ends at CRLFCRLF, payload runs exactly
    Content-Length bytes, two CRLFs separate records. Gzip (including
    concatenated members) is detected by magic and inflated first. A
    record with malformed framing raises — silent resync invents data.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    out: list[tuple] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 5] != b"WARC/":
            raise ValueError(f"malformed WARC framing at byte {pos}: expected version line")
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError(f"malformed WARC record at byte {pos}: unterminated headers")
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError(f"WARC record at byte {pos} lacks a valid Content-Length")
        body_start = head_end + 4
        payload = data[body_start : body_start + length]
        if len(payload) != length:
            raise ValueError(f"truncated WARC record at byte {pos}")
        rtype = headers.get("warc-type", "")
        if rtype in keep_types:
            url = headers.get("warc-target-uri", "")
            ts = datetime.strptime(
                headers.get("warc-date", "1970-01-01T00:00:00Z"), "%Y-%m-%dT%H:%M:%SZ"
            )
            out.append((url, ts, rtype, _split_http(payload)))
        pos = body_start + length
        # consume the two separating CRLFs (tolerate EOF right after payload)
        while data[pos : pos + 2] == _CRLF and pos < n:
            pos += 2
    return out


def read_warc(
    spark: SparkSession,
    path: str,
    keep_types: tuple = ("response", "resource"),
    glob: str = "*.warc*",
) -> DataFrame:
    """All WARC records under ``path`` as a DataFrame (WARC_SCHEMA) — one
    task per file via the binaryFile source, parsing in an Arrow kernel."""
    import pandas as pd

    files = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ).select("path", "content")

    kt = tuple(keep_types)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for url, ts, rtype, body in parse_warc(bytes(content), kt):
                    rows.append((p, url, ts, rtype, body))
            out = pd.DataFrame(
                rows, columns=["warc_file", "url", "warc_ts", "warc_type", "html"]
            )
            if not rows:  # keep Arrow types stable on empty batches
                out = out.astype(
                    {"warc_file": str, "url": str, "warc_type": str}
                ).assign(warc_ts=pd.Series(dtype="datetime64[us]"))
            yield out

    return files.mapInPandas(kernel, schema=WARC_SCHEMA)
