"""CCNet-style n-gram language-model quality scoring.

Wenzek et al., "CCNet: Extracting High Quality Monolingual Datasets from
Web Crawl Data" (2020) rank web documents by the perplexity of a language
model trained on a trusted corpus — garbled extraction, boilerplate soup
and spam score far from the reference distribution. The heuristic quality
signals already in ``functions/text.py`` (length/punct/repetition ratios)
catch the gross failures; this module adds the distribution-aware tier: an
add-alpha interpolated BIGRAM model whose parameters are plain count
DataFrames, trained and applied entirely with DataFrame ops.

Design:

- **Training is counting.** ``unigram_counts`` / ``bigram_counts`` are one
  explode + one map-side-combined groupBy each over the trusted corpus —
  the same shape as the search index build. Counts are exact integers
  (order-independent, mergeable: counts from two shards ADD).
- **Scoring is a join, not a UDF.** Each document's bigrams join the count
  tables (equi-join on the token keys; AQE broadcasts small models), then
  per-token log-probs fold into the document score with ``F.aggregate``
  over the POSITION-SORTED array — a fixed summation order, so the double
  result is bit-identical at any parallelism (a plain ``sum()`` of doubles
  is not).
- **ln() and the oracle**: IEEE leaves ln implementation-defined, so
  scores are gated by pytest against a straight-line Python reference
  (the BM25 precedent) while the gate row hashes the exact INTEGER bigram
  counts (``lm_bigram_counts``).

Scale notes (100 TB corpus, ~10^9-row model): training shuffles (token)
and (w1, w2) keyed counts — uniform hash keys, two stages each with full
map-side combine. Scoring shuffles the corpus once per join key; the
per-document collect is bounded by document length (the same bound the
search index explode already carries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.operators.search import _tokens

#: add-alpha smoothing mass (CCNet uses KenLM/Kneser-Ney; add-alpha keeps
#: the model a pure count table, which is what makes it a DataFrame)
DEFAULT_ALPHA = 0.1


def unigram_counts(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact unigram counts ``(token, c1)`` over the trusted corpus."""
    return (
        corpus.select(F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("c1"))
    )


def _bigram_pairs(text_col: str):
    """(w1, w2) struct array from adjacent tokens, JVM-side."""
    t = _tokens(text_col)
    return F.arrays_zip(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))).alias("w1"),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))).alias("w2"),
    )


def bigram_counts(corpus: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact bigram counts ``(w1, w2, c2)`` over the trusted corpus."""
    return (
        corpus.select(F.explode(_bigram_pairs(text_col)).alias("_b"))
        .select(F.col("_b.w1").alias("w1"), F.col("_b.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c2"))
    )


def lm_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram cross-entropy under the count model:

    ``p(w2|w1) = (c2 + alpha) / (c1 + alpha * vocab_size)`` — unseen
    bigrams and unseen histories fall back to the smoothed floor, so every
    document scores (no OOV crashes). Returns ``(id_col, n_bigrams,
    logprob_sum, cross_entropy)`` where ``cross_entropy = -logprob_sum /
    n_bigrams`` (lower = closer to the trusted distribution; the CCNet
    head/middle/tail split thresholds this). Documents with fewer than two
    tokens get NULL scores.

    ``vocab_size`` is explicit (the model's |V|) so scoring is a pure
    function of its arguments — pass ``unigrams.count()``.
    """
    if vocab_size <= 0:
        raise ValueError("vocab_size must be positive (use unigrams.count())")
    pairs = docs.select(
        F.col(id_col),
        F.posexplode(_bigram_pairs(text_col)).alias("_i", "_b"),
    ).select(
        id_col,
        "_i",
        F.col("_b.w1").alias("w1"),
        F.col("_b.w2").alias("w2"),
    )
    scored = (
        pairs.join(bigrams, ["w1", "w2"], "left")
        .join(unigrams.select(F.col("token").alias("w1"), "c1"), ["w1"], "left")
        .select(
            id_col,
            "_i",
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(float(alpha)))
                / (
                    F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                    + F.lit(float(alpha) * vocab_size)
                )
            ).alias("_lp"),
        )
    )
    # fixed-order fold over the position-sorted log-probs: bit-identical
    # at any parallelism where a cross-row double sum would not be
    folded = scored.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("_i").alias("i"), F.col("_lp").alias("lp")))
                ),
                lambda s: s["lp"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("logprob_sum"),
        F.count(F.lit(1)).alias("n_bigrams"),
    )
    out = docs.select(id_col).join(folded, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        "logprob_sum",
        (-F.col("logprob_sum") / F.col("n_bigrams")).alias("cross_entropy"),
    )
