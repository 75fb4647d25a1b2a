"""Corpus filtering — the composed keep/drop decision of a training-data
pipeline, as one declarative operator.

A pretraining corpus pass chains: exact dedup (first copy wins) → language
gate → quality floor → length window. Each piece exists elsewhere in the
engine (operators/dedup.py, functions/text.py); this module composes them
into a single Catalyst plan so the scan happens once, the predicates all
push into it, and the only shuffle is the dedup hash-groupBy.

Scale notes (100 TB): ONE scan, ONE shuffle. The stat predicates
(lang/quality/tokens) are pure codegen expressions evaluated during the scan
— they prune rows before anything shuffles — and the dedup survivor choice
is a ``row_number`` window over the fingerprint, not a groupBy + semi-join
(which would scan the table twice and shuffle twice). Only
(id, fingerprint, two stat columns) ride the shuffle, never text.

Semantics: gates apply PER DOCUMENT before dedup, so the survivor is the
first (min-id) ADMITTED copy of each fingerprint group. The fingerprint
normalizes (trim/lower) but the stat gates see raw text, so copies that
fingerprint-equal yet differ in raw bytes (e.g. trailing whitespace) can
gate differently — a group whose min-id copy fails a gate is still kept via
its first passing copy. The driver oracle encodes the same order
(gate -> min-id), keeping the two engines row-identical by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tstore_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    ws_token_count,
)


def corpus_filter(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang: str | None = "en",
    min_quality: float = 0.3,
    min_tokens: int = 5,
    max_tokens: int = 100_000,
    dedup: bool = True,
) -> DataFrame:
    """Surviving documents with their admission stats:
    (id, ws_tokens, quality). First copy (min id) per fingerprint wins."""
    n = ws_token_count(text_col)
    q = quality_score(text_col)
    stats = df.select(
        F.col(id_col),
        n.alias("ws_tokens"),
        q.alias("quality"),
        *([lang_id(text_col).alias("_lang")] if lang is not None else []),
        *([fingerprint(text_col).alias("_fp")] if dedup else []),
    )
    kept = stats.where(
        (F.col("ws_tokens") >= min_tokens)
        & (F.col("ws_tokens") <= max_tokens)
        & (F.col("quality") >= F.lit(min_quality))
    )
    if lang is not None:
        kept = kept.where(F.col("_lang") == F.lit(lang)).drop("_lang")
    if dedup:
        w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
        kept = (
            kept.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn", "_fp")
        )
    return kept
