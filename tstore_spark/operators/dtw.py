"""Banded Dynamic Time Warping — shape similarity between per-key series.

Pearson/lead-lag correlation (``seriescorr.py``) compares series POINTWISE
at fixed offsets; two traffic curves that are the same shape locally
stretched (a slow-news morning, a delayed spike) score poorly. DTW is the
classic elastic measure: the minimum cumulative pointwise cost over all
monotone alignments of the two series, with a Sakoe-Chiba band ``|i-j| <=
band`` bounding how far the alignment may stretch (and cutting the DP from
O(n*m) to O(n*band)).

Exactness discipline: values are INTEGERS (counts, cents — the repo-wide
oracle rule), the local cost is the squared integer difference, and every
DP cell is an integer min-plus fold — so the distance is a single BIGINT,
bit-identical at any parallelism and hash-checkable against a SQL twin.
:func:`dtw_oracle_sql` generates that twin as a recursive CTE over
ANTI-DIAGONALS: cells on diagonal d depend only on diagonals d-1/d-2, so
each step is one ``list_transform`` with no intra-step dependency — the
min-plus recursion SQL can actually express (a row-major fold cannot: DP
rows have a prefix dependency inside the row).

Scale shapes:

* ``series_vectors`` — one groupBy per key; ``sort_array`` of (ts, value)
  structs makes the vector order deterministic under any shuffle.
* ``dtw_distances`` — candidate PAIRS are the input (never all-pairs);
  vectors ride two broadcast-or-shuffle equi-joins, then an Arrow kernel
  computes the banded DP per pair, vectorized over the band row
  (O(n*(2*band+1)) integer numpy per pair). Series are WINDOW-grain
  (hourly/daily points per key), not row-grain — thousands of points, not
  billions.
* ``dtw_sax_pairs`` — the blocking valve: candidates = key pairs whose
  series share an identical SAX word (equal word => similar coarse shape,
  the iSAX-style index primitive), with a block-size guard so a
  degenerate corpus (all-flat series sharing one word) refuses loudly
  instead of going quadratic.

Unreachable alignments (``band < |n - m|``) yield NULL, identically in
both engines. Overflow bound: dtw <= (n+m) * max_cost, so values up to
~10^8 with 10^4-point series stay far inside int64.

Reference: Sakoe & Chiba, "Dynamic programming algorithm optimization for
spoken word recognition" (IEEE TASSP 1978); Lin/Keogh SAX blocking.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_BLOCK = 64


def series_vectors(
    df: DataFrame,
    id_col: str = "id",
    time_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key integer series ``(id, vals array<long>)`` in time order.
    ``sort_array`` over (ts, value) structs — not a window sort — keeps the
    order deterministic at any parallelism, with the value as tiebreak for
    duplicate timestamps."""
    return (
        df.groupBy(F.col(id_col).alias("id"))
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col(time_col).alias("t"),
                        F.col(value_col).cast("long").alias("v"),
                    )
                )
            ).alias("_tv")
        )
        .select("id", F.col("_tv.v").alias("vals"))
    )


def _dtw_kernel(a, b, band: int):
    """Banded integer DTW via numpy, row-vectorized over the band window.
    Returns None when the band cannot reach (n-1, m-1)."""
    import numpy as np

    n, m = len(a), len(b)
    if n == 0 or m == 0 or band < abs(n - m):
        return None
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    INF = np.int64(2**62)
    prev = np.full(m + 1, INF, dtype=np.int64)  # row i-1, 1-based j
    cur = np.full(m + 1, INF, dtype=np.int64)
    prev[1] = 0  # virtual predecessor of (0, 0)
    # row 0 seeds: D[0][j] = cost(0, j) + D[0][j-1] within the band
    lo0, hi0 = 0, min(m - 1, band)
    c0 = (a[0] - b[lo0 : hi0 + 1]) ** 2
    prev[lo0 + 1 : hi0 + 2] = np.cumsum(c0)
    for i in range(1, n):
        lo, hi = max(0, i - band), min(m - 1, i + band)
        cur[:] = INF
        cost = (a[i] - b[lo : hi + 1]) ** 2
        up = prev[lo + 1 : hi + 2]
        diag = prev[lo : hi + 1]
        best = np.minimum(up, diag)
        # left neighbor is a prefix dependency — scalar sweep over the band
        # window only (2*band+1 cells), not the full row
        run = INF
        for k in range(hi - lo + 1):
            run = min(best[k], run)
            if run >= INF:
                cur[lo + 1 + k] = INF
                run = INF
            else:
                run = cost[k] + run
                cur[lo + 1 + k] = run
        prev, cur = cur, prev
    d = int(prev[m])
    return None if d >= INF else d


def dtw_distances(
    series: DataFrame,
    pairs: DataFrame,
    band: int,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """``(id_a, id_b, dtw)`` for each candidate pair — dtw a nullable long
    (NULL = no alignment inside the band). ``series`` is a
    :func:`series_vectors` table; ``pairs`` provides the candidates (from
    :func:`dtw_sax_pairs`, a join, or an explicit list) — this function
    never goes all-pairs on its own."""
    if band < 0:
        raise ValueError("band must be >= 0")
    j = (
        pairs.select(a_col, b_col)
        .join(series.select(F.col("id").alias(a_col), F.col("vals").alias("_va")), a_col)
        .join(series.select(F.col("id").alias(b_col), F.col("vals").alias("_vb")), b_col)
        .select(a_col, b_col, "_va", "_vb")
    )
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in j.select(a_col, b_col).schema.fields
    ) + ", dtw bigint"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dtw = [
                _dtw_kernel(va, vb, band)
                for va, vb in zip(pdf["_va"], pdf["_vb"])
            ]
            out = pdf[[a_col, b_col]].copy()
            out["dtw"] = pd.array(dtw, dtype="Int64")
            yield out

    return j.mapInPandas(compute, out_schema)


def dtw_sax_pairs(
    df: DataFrame,
    id_col: str = "id",
    time_col: str = "ts",
    value_col: str = "value",
    word_len: int = 8,
    alphabet_size: int = 4,
    max_block: int = DEFAULT_MAX_BLOCK,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Candidate pairs ``(id_a, id_b)`` (id_a < id_b) of keys whose series
    symbolize to the SAME SAX word — the iSAX-style blocking that keeps
    DTW off the all-pairs cliff. Blocks larger than ``max_block`` raise
    (the corpus is too uniform for word blocking; raise the alphabet or
    word length, or supply candidates another way) — the same guarded
    refusal as dedup's token-block guard. ``tiebreak_cols`` forwards to
    :func:`sax_words` — REQUIRED for exactness whenever (id, ts) is not
    unique, else segment assignment (and hence the candidate set) is
    partition-dependent."""
    from tstore_spark.operators.sax import sax_words

    words = sax_words(
        df,
        id_col=id_col,
        time_col=time_col,
        value_col=value_col,
        word_len=word_len,
        alphabet_size=alphabet_size,
        tiebreak_cols=tiebreak_cols,
    ).where(F.col("sax_word").isNotNull())
    sizes = words.groupBy("sax_word").agg(F.count(F.lit(1)).alias("_n"))
    oversized = sizes.where(F.col("_n") > max_block).limit(1).collect()
    if oversized:
        raise ValueError(
            f"SAX block {oversized[0]['sax_word']!r} holds {oversized[0]['_n']} series"
            f" (> max_block={max_block}): word blocking would go quadratic"
        )
    a = words.select(F.col("sax_word"), F.col(id_col).alias("id_a"))
    b = words.select(F.col("sax_word"), F.col(id_col).alias("id_b"))
    return (
        a.join(b, "sax_word")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def dtw_oracle_sql(pairs_sql: str, band: int) -> str:
    """DuckDB twin of :func:`dtw_distances`: the same integer min-plus DP
    as a recursive CTE over anti-diagonals (cells on diagonal d depend only
    on d-1/d-2, so each step is one list_transform with no intra-step
    dependency). ``pairs_sql`` must yield ``(id_a, id_b, va BIGINT[],
    vb BIGINT[])`` with non-empty vectors. NULL list_extract = out of band
    or out of range; LEAST ignores NULLs in DuckDB exactly as Spark's
    least does."""
    least3 = (
        "LEAST("
        "list_extract(diag1, (i-1) - GREATEST(0, d-(m-1)) + 1), "
        "list_extract(diag1, i - GREATEST(0, d-(m-1)) + 1), "
        "list_extract(diag2, (i-1) - GREATEST(0, d-1-(m-1)) + 1))"
    )
    return f"""
WITH RECURSIVE dims AS (
    SELECT id_a, id_b, va, vb, len(va) AS n, len(vb) AS m FROM ({pairs_sql})
),
dp AS (
    SELECT id_a, id_b, va, vb, n, m, 0 AS d,
           [(va[1]-vb[1])*(va[1]-vb[1])] AS diag1,
           CAST(NULL AS BIGINT[]) AS diag2
    FROM dims
    UNION ALL
    SELECT id_a, id_b, va, vb, n, m, d+1,
           list_transform(
             generate_series(GREATEST(0, d+1-(m-1)), LEAST(d+1, n-1)),
             i -> CASE WHEN abs(2*i - (d+1)) > {band} THEN CAST(NULL AS BIGINT)
                  WHEN {least3} IS NULL THEN CAST(NULL AS BIGINT)
                  ELSE (va[i+1]-vb[d-i+2])*(va[i+1]-vb[d-i+2]) + {least3}
                  END),
           diag1
    FROM dp WHERE d < n + m - 2
)
SELECT id_a, id_b,
       CASE WHEN {band} < abs(n - m) THEN CAST(NULL AS BIGINT)
            ELSE list_extract(diag1, (n-1) - GREATEST(0, (n+m-2)-(m-1)) + 1)
       END AS dtw
FROM dp WHERE d = n + m - 2
"""
