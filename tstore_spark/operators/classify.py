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


def calibration_report(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Reliability diagram of a probabilistic classifier — is a "0.9" from
    the quality model actually right 90% of the time? Equal-width score
    buckets over [0, 1]; per bucket the row count, positive count, and
    the micro-scaled probability sum, all EXACT integers (the repo's
    oracle discipline — accuracy/confidence are single fixed divisions
    over them): ``(bucket, lo, hi, n, n_pos, conf_micros, accuracy,
    confidence, gap)``.

    Probabilities outside [0, 1] raise in-plan (the guard rides the
    returned bucket column); prob = 1.0 folds into the top bucket.
    Scale: ONE map-side-combined groupBy into at most ``n_buckets``
    rows — calibration of a 10^12-doc corpus is a metadata-sized result.
    Scalar ECE: :func:`expected_calibration_error` (fixed-order fold over
    the bucket rows; cross-engine double equality is not claimed for it,
    the lm.py/BM25 precedent — the INTEGER bucket stats are the
    gate-checkable core)."""
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets}")
    p = F.col(prob_col).cast("double")
    b = F.least(
        F.floor(p * F.lit(int(n_buckets))).cast("int"), F.lit(n_buckets - 1)
    )
    b = F.when(
        (p < 0) | (p > 1) | p.isNull(),
        F.raise_error(
            F.format_string(
                "calibration_report requires prob in [0, 1], got %s",
                p.cast("string"),
            )
        ).cast("int"),
    ).otherwise(b)
    agg = (
        df.select(
            b.alias("bucket"),
            F.col(label_col).cast("long").alias("_y"),
            F.round(p * F.lit(1_000_000.0)).cast("long").alias("_pm"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.sum("_pm").alias("conf_micros"),
        )
    )
    w = 1.0 / n_buckets
    acc = F.col("n_pos") / F.col("n")
    conf = F.col("conf_micros") / F.lit(1_000_000.0) / F.col("n")
    return agg.select(
        "bucket",
        (F.col("bucket") * F.lit(w)).alias("lo"),
        ((F.col("bucket") + 1) * F.lit(w)).alias("hi"),
        "n",
        "n_pos",
        "conf_micros",
        acc.alias("accuracy"),
        conf.alias("confidence"),
        F.abs(acc - conf).alias("gap"),
    )


def expected_calibration_error(report: DataFrame) -> float:
    """ECE = Σ_b (n_b / N) · |acc_b − conf_b| over a
    :func:`calibration_report` — ONE bounded driver row (≤ n_buckets
    summands, folded in bucket order so the double is reproducible)."""
    row = report.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("bucket"),
                        (F.col("n") * F.col("gap")).alias("w"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc_, x: acc_ + x["w"],
        ).alias("_num"),
        F.sum("n").alias("_den"),
    ).first()
    return float(row["_num"]) / float(row["_den"]) if row["_den"] else 0.0
