"""Structured-Streaming exact deduplication over a document stream.

The batch engine's exact dedup (operators/dedup.py: hash-groupBy on a
normalized fingerprint) re-expressed for a stream: a crawler emits documents
continuously; the pipeline must pass through the FIRST copy of each distinct
text and drop later re-crawls — without unbounded state.

Two variants, both pure Structured Streaming (no custom state code):

- :func:`stream_dedup_exact` — ``dropDuplicatesWithinWatermark`` on the
  fingerprint: a duplicate arriving within the watermark horizon of the
  first copy is dropped; state for a fingerprint expires once the watermark
  passes its first-seen event time, so state is O(docs per watermark
  window), not O(corpus). This is the correct semantics for re-crawl bursts
  (the overwhelmingly common duplicate pattern: the same page fetched
  seconds-to-hours apart); historical duplicates beyond the horizon are
  handled by the batch pass (`exact_dedup`) over the archive — the standard
  streaming/batch split.
- :func:`stream_dedup_exact_global` — plain ``dropDuplicates`` (unbounded
  state): exact global semantics for bounded test streams; NOT the 100 TB
  path (state grows with distinct fingerprints forever). Kept for
  equivalence testing against the batch operator.

Scale notes: state is keyed by the 32-byte md5 fingerprint — the text itself
never enters state. The stateful operator shuffles on the fingerprint
(uniform by construction, no skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tstore_spark.functions.text import fingerprint


def with_fingerprint(
    stream: DataFrame, text_col: str = "text", out_col: str = "fp"
) -> DataFrame:
    """Append the dedup fingerprint (md5 of normalized text — the exact same
    expression the batch operator groups on, so stream and batch agree on
    what counts as a duplicate)."""
    return stream.withColumn(out_col, fingerprint(text_col))


def stream_dedup_exact(
    stream: DataFrame,
    time_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First-copy-wins dedup within the watermark horizon (bounded state)."""
    return (
        with_fingerprint(stream, text_col)
        .withWatermark(time_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .drop("fp")
    )


def stream_dedup_exact_global(
    stream: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Globally exact streaming dedup (unbounded state — tests/bounded
    streams only; the scale path is :func:`stream_dedup_exact` + the batch
    archive pass)."""
    return with_fingerprint(stream, text_col).dropDuplicates(["fp"]).drop("fp")
