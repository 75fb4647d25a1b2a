"""Model-based quality filtering — linear bag-of-words classifier scoring.

The modern corpus-curation pipelines (DCLM, FineWeb-Edu, RefinedWeb) gate
documents on a learned quality classifier. The serving shape of the
classic fastText-style linear model is exactly a Spark join-aggregate:

    score(doc) = bias + Σ_token  tf(doc, token) · weight(token)

* **Weights broadcast** — a trained vocabulary is ≤ millions of rows;
  the corpus side tokenizes once (the hoisted JVM split from
  operators/search.py), explodes, hash-joins the broadcast weight table,
  and ONE map-side-combined sum per doc carries the score. The corpus
  never shuffles by token; the only shuffle is the per-doc aggregate.
* **Integer weights, exact scores** — weights are BIGINT (milli-units or
  whatever the trainer quantized to), tf is a count, so the score is an
  exact integer sum: order-independent under any parallelism and
  hash-checkable against a SQL twin — the repo's oracle float
  discipline. A float-weight model quantizes to integers once at export
  (standard for serving; 1e-3 resolution dwarfs classifier noise).
* Out-of-vocabulary tokens contribute 0 (inner join drops them);
  documents with NO in-vocabulary token still return with score = bias
  (left join on doc ids) — a doc must never vanish from a filter pass.

Training the weights is out of scope by design (a logistic regression at
this scale is one `operators/lm.py`-style count pass + a driver-side
solve on the aggregated gradient — but the curation pipelines train
offline on labeled samples anyway); this module is the exact,
distributed SERVING path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.operators.search import _tokens


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    bias: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
    weight_col: str = "weight",
) -> DataFrame:
    """Score every document with the linear model: ``(id, n_tokens,
    score)`` where score = bias + Σ tf·weight over in-vocabulary tokens.

    ``weights``: ``(token, weight)`` with integral weights (cast enforced
    — float weights must be quantized by the caller so scores stay
    exact).
    """
    w = weights.select(
        F.col(token_col).alias("__wtok"),
        F.col(weight_col).cast("bigint").alias("__w"),
    )
    # explode_OUTER keeps zero-token documents as one NULL-token row, so
    # token count and weight sum fold into a SINGLE per-doc aggregate — no
    # doc_id re-join of two derivations of the corpus scan (that plan
    # sort-merge-joins the corpus with itself; this one shuffles once).
    toks = docs.select(
        F.col(id_col), F.explode_outer(_tokens(text_col)).alias("__tok")
    )
    scored = (
        toks.join(F.broadcast(w), F.col("__tok") == F.col("__wtok"), "left")
        .groupBy(id_col)
        .agg(
            F.count("__tok").alias("n_tokens"),
            F.sum("__w").alias("__s"),
        )
    )
    return scored.select(
        F.col(id_col),
        "n_tokens",
        (F.coalesce(F.col("__s"), F.lit(0)) + F.lit(int(bias)))
        .cast("bigint")
        .alias("score"),
    )


def classifier_filter(
    docs: DataFrame,
    weights: DataFrame,
    min_score: int,
    bias: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    token_col: str = "token",
    weight_col: str = "weight",
) -> DataFrame:
    """Keep documents scoring ≥ ``min_score`` — the quality gate itself.
    Returns the original doc rows (all columns) via a semi join, so the
    text never rides the scoring shuffle."""
    kept = classifier_score(
        docs, weights, bias, text_col, id_col, token_col, weight_col
    ).where(F.col("score") >= F.lit(int(min_score)))
    return docs.join(kept.select(id_col), id_col, "left_semi")
