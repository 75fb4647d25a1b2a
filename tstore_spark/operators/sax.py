"""SAX symbolization (Symbolic Aggregate approXimation) of per-id series.

Lin/Keogh SAX: z-normalize each series, average it into ``word_len`` equal
segments (PAA), then quantize each segment mean against fixed standard-normal
breakpoints into a letter — so every series becomes a short word like
``"accb"``. Words are THE cheap primitive for series motif mining, indexing,
and near-duplicate shape grouping: equal words ⇒ similar shapes, and the
word space is groupBy-able where raw series are not.

Exactness discipline (the engine's oracle rules): every aggregate is an
exact integer (cents sums, counts, integer segment assignment via
``floor((rn-1)·W / n)``), and the doubles (segment mean, series mean/std,
z-score) derive from those integers by ONE fixed expression written
identically in SQL by :func:`sax_oracle_exprs` — identical integers + the
same IEEE op order = identical bits, so symbols (breakpoint comparisons on
those bits) match any engine exactly. Breakpoints are literal decimal
constants (correctly-rounded parses are identical in the JVM and C++).

Scale notes (100 TB): one shuffle keyed on the series id — the row-number /
count / sum windows all share the per-id partition, the (id, segment) PAA
groupBy is map-side combined, and word assembly aggregates ≤ ``word_len``
rows per id. Nothing global, no Python anywhere.

Reference surface: the reference stops at per-id resampling
(tstore/tsdf/ts_dask.py); symbolization is part of the downsample graft
(BASELINE.json north_star: downsampled per-tier value streams).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# standard-normal breakpoints (Lin et al., SAX): alphabet size -> interior
# cut points. Literal decimals shared with the SQL twin.
BREAKPOINTS: dict[int, list[str]] = {
    3: ["-0.4307", "0.4307"],
    4: ["-0.6745", "0.0", "0.6745"],
    5: ["-0.8416", "-0.2533", "0.2533", "0.8416"],
    6: ["-0.9674", "-0.4307", "0.0", "0.4307", "0.9674"],
    8: ["-1.1503", "-0.6745", "-0.3186", "0.0", "0.3186", "0.6745", "1.1503"],
}
_ALPHABET = "abcdefghij"

# the ONE fixed-order derivation of z and variance from the exact integers
# (seg_sum, seg_n, _s, _ss, n_points) — used verbatim by the Spark path AND
# the SQL twin, so the two cannot drift
_Z_SQL = (
    "(CAST(seg_sum AS DOUBLE) / seg_n - CAST(_s AS DOUBLE) / n_points)"
    " / sqrt(CAST(_ss AS DOUBLE) / n_points"
    " - (CAST(_s AS DOUBLE) / n_points) * (CAST(_s AS DOUBLE) / n_points))"
)
_VAR_SQL = (
    "CAST(_ss AS DOUBLE) / n_points"
    " - (CAST(_s AS DOUBLE) / n_points) * (CAST(_s AS DOUBLE) / n_points)"
)


def _symbol_case(z_expr: str, alphabet_size: int) -> str:
    """Shared CASE generator: z-expression -> letter (SQL text, valid in
    both Spark SQL and DuckDB)."""
    cuts = BREAKPOINTS[alphabet_size]
    branches = "".join(
        f" WHEN {z_expr} < {c} THEN '{_ALPHABET[i]}'" for i, c in enumerate(cuts)
    )
    return f"CASE{branches} ELSE '{_ALPHABET[len(cuts)]}' END"


def sax_segments(
    df: DataFrame,
    id_col: str = "id",
    time_col: str = "ts",
    value_col: str = "value",
    word_len: int = 8,
    alphabet_size: int = 4,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Per-(id, segment) PAA + symbol table. Series shorter than
    ``word_len`` points still symbolize (segments simply hold fewer points);
    flat series (zero variance) emit NULL symbols — no division blows up
    under ANSI mode. ``tiebreak_cols`` must make the per-id order total for
    partition-independent segment assignment."""
    if alphabet_size not in BREAKPOINTS:
        raise ValueError(f"alphabet_size must be one of {sorted(BREAKPOINTS)}")
    if word_len < 1:
        raise ValueError("word_len must be >= 1")
    ties = [F.col(c) for c in (tiebreak_cols or [])]

    wo = Window.partitionBy("_id").orderBy(F.col(time_col), *ties)
    wa = Window.partitionBy("_id")
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = df.select(
        F.col(id_col).alias("_id"),
        F.col(time_col),
        *[F.col(c) for c in (tiebreak_cols or [])],
        cents.alias("_c"),
    ).select(
        "_id",
        "_c",
        (F.row_number().over(wo) - 1).alias("_rn"),  # 0-based position
        F.count(F.lit(1)).over(wa).alias("_n"),
        F.sum("_c").over(wa).alias("_s"),
        F.sum(F.col("_c") * F.col("_c")).over(wa).alias("_ss"),
    )
    # EXACT integer floor division (never a double `/` + cast: Spark's
    # double->long cast truncates but DuckDB's rounds — engine-dependent)
    seg = F.expr(f"_rn * {int(word_len)} div _n")
    paa = base.groupBy(F.col("_id"), seg.alias("segment")).agg(
        F.sum("_c").alias("seg_sum"),
        F.count(F.lit(1)).alias("seg_n"),
        F.max("_n").alias("n_points"),
        F.max("_s").alias("_s"),
        F.max("_ss").alias("_ss"),
    )
    sym = f"CASE WHEN {_VAR_SQL} > 0 THEN {_symbol_case(_Z_SQL, alphabet_size)} END"
    return paa.select(
        F.col("_id").alias(id_col),
        "segment",
        "seg_sum",
        "seg_n",
        "n_points",
        F.expr(sym).alias("symbol"),
    )


def sax_words(
    df: DataFrame,
    id_col: str = "id",
    time_col: str = "ts",
    value_col: str = "value",
    word_len: int = 8,
    alphabet_size: int = 4,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """One SAX word per series: (id, n_points long, sax_word string).
    Flat series emit a NULL word (their shape is undefined under
    z-normalization). Word assembly sorts ≤ ``word_len`` segment rows per
    id — trivially bounded state."""
    segs = sax_segments(
        df, id_col, time_col, value_col, word_len, alphabet_size, tiebreak_cols
    )
    ordered = F.array_sort(F.collect_list(F.struct("segment", "symbol")))
    return segs.groupBy(id_col).agg(
        F.max("n_points").alias("n_points"),
        F.when(
            F.count(F.lit(1)) == F.count("symbol"),  # no NULL symbols (flat series)
            F.concat_ws("", F.transform(ordered, lambda s: s["symbol"])),
        ).alias("sax_word"),
    )


def sax_oracle_exprs(word_len: int, alphabet_size: int) -> dict[str, str]:
    """The SQL-twin building blocks (DuckDB + Spark SQL compatible), shared
    with the Spark path above so the two cannot drift: keys ``seg`` (0-based
    segment from a 0-based row index ``rn`` and count ``n``), ``z`` and
    ``symbol`` over columns (seg_sum, seg_n, _s, _ss, n_points)."""
    return {
        "seg": f"(rn * {word_len}) // n",  # DuckDB exact integer division
        "symbol": f"CASE WHEN {_VAR_SQL} > 0 THEN {_symbol_case(_Z_SQL, alphabet_size)} END",
    }
