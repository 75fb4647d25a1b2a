"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023, public paper + reference implementation semantics).

The pretraining-data selection recipe one tier above the CCNet perplexity
filter (operators/lm.py): instead of ranking raw documents by a single
trusted-LM score, DSIR reweights the RAW pool toward a TARGET distribution
(the "looks like Wikipedia/books" set) using hashed n-gram bag features,
then samples without replacement by importance weight. Selection is a pure
function of three count tables — which is what makes it a DataFrame
pipeline, not an ML serving problem.

Pipeline:

1. **Features** (:func:`dsir_features`): per-document counts of unigram +
   bigram features. At corpus scale features hash into ``num_buckets``
   (the paper's 10^4 hashed buckets) so the model table is bounded;
   ``num_buckets=None`` keeps raw gram strings (gate scale / oracle path).
2. **Distributions**: feature totals over the target and raw corpora —
   one explode + map-side-combined groupBy each, exact integers,
   mergeable across shards by addition.
3. **Log importance weights** (:func:`dsir_log_weights`):
   ``log w(d) = sum_feat f_d(feat) * [ln p_t(feat) - ln p_r(feat)]`` with
   add-alpha smoothing over the union vocabulary. Per-document folding
   runs in a FIXED order (feature-sorted, the lm.py discipline) so the
   double is bit-identical at any parallelism; ln() is engine-defined, so
   cross-engine gating covers the exact INTEGER feature/count algebra
   (the lm_bigram_counts precedent) while the double weight is gated by
   pytest against a straight-line reference.
4. **Resampling** (:func:`dsir_resample`): Gumbel-top-k — adding an
   id-hash Gumbel variate to the log weight and taking the global top-k
   draws EXACTLY k documents without replacement with P(d) proportional to
   w(d), deterministically (the md5 variate is a pure function of id and
   seed). Top-k runs as TakeOrderedAndProject: per-partition heaps, no
   global sort.

Scale (100 TB): feature extraction is a projection + explode; count
tables shuffle on uniform hashed keys with full map-side combine and are
bounded by ``num_buckets``; scoring joins the (broadcastable) model table
and folds per document; resampling is one TakeOrdered. The only driver
materialization is the three model scalars (vocab size + two totals), one
row. Reference: /root/reference has no DSIR counterpart — this extends
the graft's training-data layer.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.operators.sampling import hash_uniform
from tstore_spark.operators.search import _tokens

DEFAULT_ALPHA = 0.1


def _feature_expr(text_col: str):
    """Unigram tokens ++ ``'w1 w2'`` bigram strings, one JVM array."""
    t = _tokens(text_col)
    n1 = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, 1, n1),
        F.slice(t, 2, n1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(t, bigrams)


def _with_bucket(ex: DataFrame, num_buckets: int | None) -> DataFrame:
    if num_buckets is None:
        return ex
    if num_buckets < 2:
        raise ValueError(f"num_buckets must be >= 2, got {num_buckets}")
    return ex.withColumn(
        "feat", F.pmod(F.xxhash64("feat"), F.lit(int(num_buckets))).cast("string")
    )


def dsir_features(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-document feature counts ``(id, feat, f)`` — unigrams + bigrams,
    optionally hashed into ``num_buckets`` (the corpus-scale path: model
    size bounded regardless of vocabulary)."""
    ex = docs.select(
        F.col(id_col), F.explode(_feature_expr(text_col)).alias("feat")
    )
    return (
        _with_bucket(ex, num_buckets)
        .groupBy(id_col, "feat")
        .agg(F.count(F.lit(1)).alias("f"))
    )


def feature_distribution(
    corpus: DataFrame,
    text_col: str = "text",
    num_buckets: int | None = None,
    count_col: str = "c",
) -> DataFrame:
    """Exact feature totals ``(feat, c)`` over a corpus — the count table
    IS the distribution (normalizers are derived scalars)."""
    ex = corpus.select(F.explode(_feature_expr(text_col)).alias("feat"))
    return (
        _with_bucket(ex, num_buckets)
        .groupBy("feat")
        .agg(F.count(F.lit(1)).alias(count_col))
    )


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    raw: DataFrame | None = None,
    alpha: float = DEFAULT_ALPHA,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-document log importance weight toward the target distribution:
    ``(id, n_feats, n_grams, log_weight)``.

    ``p(feat) = (c + alpha) / (T + alpha * V)`` on each side, V = union
    vocabulary. ``raw`` defaults to ``docs`` (the pool scores against its
    own distribution, the paper's setup). Documents with no features get
    log_weight 0.0 (an empty product). The three scalars (V, T_t, T_r)
    are one bounded driver row — documented driver-side work, the lm.py
    ``vocab_size`` precedent made implicit."""
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    raw = docs if raw is None else raw
    ft = feature_distribution(target, text_col, num_buckets, "ct")
    fr = feature_distribution(raw, text_col, num_buckets, "cr")
    dist = (
        ft.join(fr, "feat", "full_outer")
        .select(
            "feat",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    v, tt, tr = dist.agg(
        F.count(F.lit(1)), F.sum("ct"), F.sum("cr")
    ).first()
    if not v:
        raise ValueError("empty feature vocabulary (both corpora tokenless)")
    denom_t, denom_r = float(tt) + alpha * v, float(tr) + alpha * v
    llr = dist.select(
        "feat",
        (
            F.log((F.col("ct") + F.lit(float(alpha))) / F.lit(denom_t))
            - F.log((F.col("cr") + F.lit(float(alpha))) / F.lit(denom_r))
        ).alias("_llr"),
    )
    # a doc feature absent from BOTH count tables is impossible when raw
    # defaults to docs; with an external raw pool it falls to the smoothed
    # floor on both sides — a Python-float constant, same formula
    floor = math.log(alpha / denom_t) - math.log(alpha / denom_r)
    fd = dsir_features(docs, id_col, text_col, num_buckets)
    scored = fd.join(llr, "feat", "left").select(
        id_col,
        "feat",
        "f",
        (F.col("f") * F.coalesce("_llr", F.lit(floor))).alias("_w"),
    )
    # fixed-order fold (feature-sorted; feats unique per doc) — the lm.py
    # discipline: bit-identical doubles at any parallelism
    folded = scored.groupBy(id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("feat"), F.col("_w").alias("w")))
                ),
                lambda s: s["w"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("log_weight"),
        F.count(F.lit(1)).alias("n_feats"),
        F.sum("f").alias("n_grams"),
    )
    out = docs.select(id_col).join(folded, id_col, "left")
    return out.select(
        id_col,
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
        F.coalesce("log_weight", F.lit(0.0)).alias("log_weight"),
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    logw_col: str = "log_weight",
    seed: int = 42,
) -> DataFrame:
    """Gumbel-top-k: exactly ``k`` documents without replacement, inclusion
    probability proportional to ``exp(log_weight)``, deterministic (the
    Gumbel variate is an id-hash). ``key = log_weight - ln(-ln(u))``; the
    global top-k runs as TakeOrderedAndProject (per-partition heaps — no
    global sort, the priority_sample precedent)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    # u = (h + 0.5) / 2^32 in (0, 1): the half-step keeps both endpoints
    # clear of -ln(-ln(u))'s poles
    u = hash_uniform(id_col, seed) + F.lit(1.0 / 8589934592.0)
    g = -F.log(-F.log(u))
    keyed = weights.withColumn("_gk", F.col(logw_col) + g)
    return (
        keyed.orderBy(F.desc("_gk"), F.col(id_col))
        .limit(int(k))
        .drop("_gk")
    )
