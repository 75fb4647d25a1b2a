"""URL helpers — all JVM-side expressions (no Python in the hot path)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def domain_of(url: str | Column) -> Column:
    """Extract the host from an http(s) URL with a built-in expression.

    ``parse_url`` runs in the JVM inside whole-stage codegen — this is the
    rollup key derivation for every page row, so it must never be Python.
    """
    c = F.col(url) if isinstance(url, str) else url
    return F.parse_url(c, F.lit("HOST")).alias("domain")
