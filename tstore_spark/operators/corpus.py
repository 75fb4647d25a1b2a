"""Corpus filtering — the composed keep/drop decision of a training-data
pipeline, as one declarative operator.

A pretraining corpus pass chains: exact dedup (first copy wins) → language
gate → quality floor → length window. Each piece exists elsewhere in the
engine (operators/dedup.py, functions/text.py); this module composes them
into a single Catalyst plan so the scan happens once, the predicates all
push into it, and the only shuffle is the dedup hash-groupBy.

Scale notes (100 TB): the stat predicates (lang/quality/tokens) are pure
codegen expressions evaluated during the scan — they cost no pass of their
own and prune rows BEFORE the dedup shuffle (cheapest possible order: a
dropped row never shuffles). The dedup survivor set shuffles only
(fingerprint, min_id) pairs, never text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.text import (
    lang_id,
    quality_score,
    ws_token_count,
)
from tstore_spark.operators.dedup import exact_dedup_groups


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
    (id, ws_tokens, quality).

    Order of operations: stat predicates first (scan-time, prunes before any
    shuffle), then the exact-dedup survivor semi-join (first copy by min id
    — note the survivor is chosen among ALL copies, then must itself pass
    the stat gates; copies of a surviving doc are identical text, so the
    gates agree across copies by construction).
    """
    n = ws_token_count(text_col)
    q = quality_score(text_col)
    stats = df.select(
        F.col(id_col),
        n.alias("ws_tokens"),
        q.alias("quality"),
        *([lang_id(text_col).alias("_lang")] if lang is not None else []),
    )
    kept = stats.where(
        (F.col("ws_tokens") >= min_tokens)
        & (F.col("ws_tokens") <= max_tokens)
        & (F.col("quality") >= F.lit(min_quality))
    )
    if lang is not None:
        kept = kept.where(F.col("_lang") == F.lit(lang))
    kept = kept.drop("_lang")
    if dedup:
        survivors = exact_dedup_groups(df, id_col, text_col).select(
            F.col("keep_id").alias(id_col)
        )
        kept = kept.join(survivors, id_col, "left_semi")
    return kept
