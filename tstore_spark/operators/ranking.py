"""Rank fusion: combine independent orderings of a corpus into one list.

Web-retrieval pipelines rank the same documents several ways (BM25, link
authority, freshness, quality priors) and need one fused list. Reciprocal
Rank Fusion (Cormack et al., SIGIR'09) is the standard scoreless combiner:

    score(d) = Σ_i 1 / (k + rank_i(d))        (k = 60 classically)

Why it fits this repo's oracle discipline where BM25's float score does
not: ranks are integers (``row_number`` over integer sort keys), each
reciprocal ``1/(k + rank)`` is a single IEEE division (correctly rounded,
engine-identical bits), and the fusion sum is built as a FIXED-ORDER
column expression — never a cross-partition float aggregation — so the
fused score is bit-identical at any parallelism and in any engine that
evaluates the same expression. (BM25 itself needs ``ln``, which IEEE
leaves implementation-defined — its gate stays the pytest reference;
fusion of integer-keyed rankings is the oracle-checkable layer.)

Scale shape: each input ranking is already small (top-N per ranker, N ≪
corpus); fusing r rankings is r−1 full-outer equi-joins on the id — tiny
tables, broadcast by AQE. The expensive work (scoring each ranking)
happens upstream in whatever produced the ranks.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranked_by(df: DataFrame, id_col: str, *order_cols, limit: int | None = None) -> DataFrame:
    """``(id, rank)`` by the given sort columns, rank 1-based, ties broken
    by the id so the ranking is total and deterministic.

    With ``limit`` (the retrieval shape — always pass it on big inputs) the
    top-N is a distributed TakeOrdered and the rank window runs over ≤ N
    rows. Without it, a global contiguous ranking is inherently a
    single-task window sort — fine for ranker outputs and per-key tables,
    NOT for corpus-sized frames."""
    w = Window.orderBy(*order_cols, F.col(id_col))
    if limit is not None:
        top = df.orderBy(*order_cols, F.col(id_col)).limit(limit)
        return top.select(id_col, F.row_number().over(w).alias("rank"))
    return df.select(id_col, F.row_number().over(w).alias("rank"))


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    top: int | None = None,
) -> DataFrame:
    """Fuse ``(id, rank)`` lists into ``(id, rrf_score)``, descending.

    A document absent from a list contributes 0 for that list. The score
    expression adds the per-list reciprocals in input-list order —
    deterministic bits — and the output is ordered (score desc, id asc).
    """
    if not rankings:
        raise ValueError("need at least one ranking")
    renamed = [
        r.select(F.col(id_col), F.col("rank").alias(f"_r{i}"))
        for i, r in enumerate(rankings)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), renamed)
    score = reduce(
        lambda acc, i: acc
        + F.coalesce(F.lit(1.0) / (F.lit(float(k)) + F.col(f"_r{i}")), F.lit(0.0)),
        range(1, len(renamed)),
        F.coalesce(F.lit(1.0) / (F.lit(float(k)) + F.col("_r0")), F.lit(0.0)),
    )
    out = joined.select(id_col, score.alias("rrf_score")).orderBy(
        F.desc("rrf_score"), F.col(id_col)
    )
    return out.limit(top) if top is not None else out
