"""Tumbling-window continuous aggregates at 1m/1h/1d retention tiers.

The graft layer (BASELINE.json north_rule) on top of the reference's archive
semantics. The reference has no rollup at all (SURVEY.md top); this module is
designed Spark-first:

- **Mergeable exact state.** Each tier row carries, besides the final
  metrics, the state needed to re-aggregate the next tier up *exactly*:
  a text-length histogram (``hist_lens``/``hist_cnts`` parallel sorted
  arrays — bounded by #distinct lengths, never by #docs) and the distinct
  language set (bounded by #languages). 1h is computed from 1m, 1d from 1h;
  results are bit-identical to computing from raw, at a fraction of the cost.
- **Every shuffle has map-side combine.** The histogram is built with a
  two-stage groupBy (first over (key, window, len) — partial counts combine
  map-side — then over (key, window)), never with collect_list of raw values.
- **Exact + deterministic under parallelism.** count / byte sums are integer;
  distinct langs is an exact sorted set; percentiles are computed from the
  histogram with numpy linear interpolation (pandas ``quantile`` semantics)
  inside a vectorized Arrow UDF — a pure function of the sorted histogram, so
  identical at local[2] and local[32].

Scale note (100 TB): both groupBys hash-partition on (domain, window) —
domain skew is handled upstream by :mod:`tstore_spark.operators.skew` salting
(the (key, window, len) pre-aggregation itself acts as a salt on the hot
domain since `len` spreads it over the cluster).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, DoubleType

from tstore_spark.functions.urls import domain_of

#: tier name -> date_trunc unit
TIERS = {"1m": "minute", "1h": "hour", "1d": "day"}
#: cascade order: each tier is computed from the previous
TIER_ORDER = ["1m", "1h", "1d"]

PCTS = (0.5, 0.9, 0.99)


# ---------------------------------------------------------------------------
# percentiles from histogram (vectorized Arrow UDF — the only Python here)
# ---------------------------------------------------------------------------

def _pcts_from_hist(lens: np.ndarray, cnts: np.ndarray, qs=PCTS) -> list[float]:
    """Exact linear-interpolation percentiles over a (value, count) histogram.

    Equivalent to ``np.quantile(np.repeat(lens, cnts), q)`` without expanding:
    value at expanded index i is lens[j], j = first index with cumsum > i.
    """
    cum = np.cumsum(cnts)
    n = int(cum[-1])
    out = []
    for q in qs:
        pos = (n - 1) * q
        lo = int(np.floor(pos))
        hi = int(np.ceil(pos))
        v_lo = float(lens[np.searchsorted(cum, lo, side="right")])
        v_hi = float(lens[np.searchsorted(cum, hi, side="right")])
        out.append(v_lo + (v_hi - v_lo) * (pos - lo))
    return out


def _pcts_from_hist_batch(hist_lens, hist_cnts, qs=PCTS, value_scale: float = 1.0) -> list[list[float]]:
    """Vectorized percentiles for a BATCH of histograms — no per-window Python.

    Same arithmetic as :func:`_pcts_from_hist` (asserted equal in tests), but
    computed across all windows at once: concatenate every histogram, take one
    global cumsum (strictly increasing, counts > 0), and resolve each window's
    interpolation indices with a single ``searchsorted`` per quantile —
    per-window targets offset by the running total before that window land
    inside the right segment automatically.
    """
    n_rows = len(hist_lens)
    if n_rows == 0:
        return []
    # empty/NULL histograms (gap-filled tier rows, windows whose every value
    # was NULL) get NaN percentiles and MUST NOT participate in the shared
    # cumsum: a zero-length first segment would make ends[0] = -1, so
    # seg_base would pick up the GLOBAL total and corrupt the neighbors'
    # interpolation indices (silently wrong p50/p90/p99 for non-empty rows).
    hist_lens = [x if x is not None else () for x in hist_lens]
    hist_cnts = [x if x is not None else () for x in hist_cnts]
    if any(len(x) == 0 for x in hist_lens):
        out = np.full((n_rows, len(qs)), np.nan)
        ne = [i for i in range(n_rows) if len(hist_lens[i]) > 0]
        if ne:
            sub = _pcts_from_hist_batch(
                [hist_lens[i] for i in ne],
                [hist_cnts[i] for i in ne],
                qs=qs,
                value_scale=value_scale,
            )
            out[ne] = sub
        return out.tolist()
    lens_flat = np.concatenate([np.asarray(x, dtype=np.float64) for x in hist_lens])
    cnts_flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in hist_cnts])
    if value_scale != 1.0:
        lens_flat = lens_flat / value_scale
    seg_len = np.fromiter((len(x) for x in hist_lens), dtype=np.int64, count=n_rows)
    ends = np.cumsum(seg_len) - 1  # last flat index of each segment
    gc = np.cumsum(cnts_flat)
    seg_base = np.concatenate([[0], gc[ends[:-1]]])  # total count before each segment
    n = gc[ends] - seg_base  # docs per window

    out = np.empty((n_rows, len(qs)), dtype=np.float64)
    for qi, q in enumerate(qs):
        pos = (n - 1) * q
        lo = np.floor(pos)
        hi = np.ceil(pos)
        i_lo = np.searchsorted(gc, seg_base + lo, side="right")
        i_hi = np.searchsorted(gc, seg_base + hi, side="right")
        v_lo = lens_flat[i_lo]
        v_hi = lens_flat[i_hi]
        out[:, qi] = v_lo + (v_hi - v_lo) * (pos - lo)
    return out.tolist()


@pandas_udf(ArrayType(DoubleType()))
def _hist_percentiles(hist_lens: pd.Series, hist_cnts: pd.Series) -> pd.Series:
    """[p50, p90, p99] per row. Rows here are *windows*, not documents —
    the doc-proportional work stayed in the JVM aggregation, and the batch
    percentile kernel is fully vectorized across windows."""
    return pd.Series(_pcts_from_hist_batch(list(hist_lens), list(hist_cnts)))


# ---------------------------------------------------------------------------
# fused histogram merge (the cascade's single Arrow pass)
# ---------------------------------------------------------------------------

def _merge_hists_batch(
    flat_lens_rows, flat_cnts_rows, qs=PCTS, value_scale: float = 1.0, with_pcts: bool = True
):
    """Merge per-window concatenations of child histograms, vectorized.

    Input row i is the positional concat of all child (len, cnt) pairs for
    one parent window (duplicate lens across children allowed). One lexsort
    over (row, len) for the whole batch, one ``reduceat`` to sum duplicate
    lens — no per-row Python beyond the ragged-array flatten. Counts are
    integer sums, so the merged histogram is independent of child order
    (deterministic across parallelism). Percentile arithmetic is the shared
    :func:`_pcts_from_hist_batch` kernel, so cascaded values are bit-identical
    to from-raw values."""
    n_rows = len(flat_lens_rows)
    if n_rows == 0:
        return [], [], []
    # NULL concats (a NULL child array makes flatten() return NULL) and
    # empty concats (parents whose every child is gap-filled) merge to an
    # empty histogram with NaN percentiles; an all-empty batch would
    # otherwise crash at new[0] (zero-length array).
    flat_lens_rows = [x if x is not None else () for x in flat_lens_rows]
    flat_cnts_rows = [x if x is not None else () for x in flat_cnts_rows]
    seg_len = np.fromiter((len(x) for x in flat_lens_rows), dtype=np.int64, count=n_rows)
    if not seg_len.any():
        empty = [[] for _ in range(n_rows)]
        pcts = [[np.nan] * len(qs)] * n_rows if with_pcts else [None] * n_rows
        return empty, list(empty), pcts
    L = np.concatenate([np.asarray(x, dtype=np.int64) for x in flat_lens_rows])
    C = np.concatenate([np.asarray(x, dtype=np.int64) for x in flat_cnts_rows])
    S = np.repeat(np.arange(n_rows, dtype=np.int64), seg_len)
    order = np.lexsort((L, S))
    L, C, S = L[order], C[order], S[order]
    new = np.empty(len(L), dtype=bool)
    new[0] = True
    new[1:] = (S[1:] != S[:-1]) | (L[1:] != L[:-1])
    idx = np.flatnonzero(new)
    mlens, mcnts, msegs = L[idx], np.add.reduceat(C, idx), S[idx]
    rows = np.arange(n_rows)
    starts = np.searchsorted(msegs, rows, side="left")
    ends = np.searchsorted(msegs, rows, side="right")
    lens_rows = [mlens[a:b] for a, b in zip(starts, ends)]
    cnts_rows = [mcnts[a:b] for a, b in zip(starts, ends)]
    pcts = (
        _pcts_from_hist_batch(lens_rows, cnts_rows, qs=qs, value_scale=value_scale)
        if with_pcts
        else [None] * n_rows
    )
    return [x.tolist() for x in lens_rows], [x.tolist() for x in cnts_rows], pcts


def _merged_hist_udf(value_scale: float = 1.0, with_pcts: bool = True):
    """Arrow kernel: (flat child lens, flat child cnts) -> merged histogram
    (+ percentiles). Struct output so the merge and the percentiles share one
    Python round-trip — the cascade then needs exactly one shuffle and one
    Arrow pass instead of the old explode + 3 shuffles + join shape."""
    from pyspark.sql.types import LongType, StructField, StructType

    fields = [
        StructField("lens", ArrayType(LongType())),
        StructField("cnts", ArrayType(LongType())),
    ]
    if with_pcts:
        fields.append(StructField("pcts", ArrayType(DoubleType())))

    @pandas_udf(StructType(fields))
    def f(flat_lens: pd.Series, flat_cnts: pd.Series) -> pd.DataFrame:
        lens, cnts, pcts = _merge_hists_batch(
            list(flat_lens), list(flat_cnts), value_scale=value_scale, with_pcts=with_pcts
        )
        out = {"lens": lens, "cnts": cnts}
        if with_pcts:
            out["pcts"] = pcts
        return pd.DataFrame(out)

    return f


def hist_percentiles_jvm(
    lens_col: str, cnts_col: str, qs=PCTS, value_scale: float = 1.0
):
    """Exact interpolated percentiles from a (value, count) histogram as a
    pure-JVM ``aggregate`` expression — one pass over the (bounded) histogram
    array, no Arrow round-trip of the arrays to Python.

    Bit-identical to the Arrow kernel (:func:`_pcts_from_hist`): same
    first-index-with-cum-greater-than selection, same
    ``v_lo + (v_hi - v_lo) * frac`` IEEE arithmetic (asserted in tests).
    Returns one array<double> column [p_q for q in qs].

    NOTE: measured ~10x slower than the Arrow kernel at 500k windows
    (interpreted HOF evaluation, re-evaluated per referencing column) — see
    :func:`_attach_percentiles`; not used by default.
    """
    cnts = F.col(cnts_col)
    n = F.aggregate(cnts, F.lit(0).cast("long"), lambda a, x: a + x.cast("long"))
    pos = [(n - 1).cast("double") * F.lit(q) for q in qs]
    lo = [F.floor(p).cast("double") for p in pos]
    hi = [F.ceil(p).cast("double") for p in pos]
    pairs = F.arrays_zip(F.col(lens_col).alias("l"), cnts.alias("c"))

    nq = len(qs)
    zero_fields = [F.lit(0).cast("long").alias("cum")] + [
        F.lit(None).cast("double").alias(f"{side}{i}")
        for i in range(nq)
        for side in ("vlo", "vhi")
    ]

    def merge(acc, x):
        newcum = acc["cum"] + x["c"].cast("long")
        val = x["l"].cast("double") / F.lit(value_scale) if value_scale != 1.0 else x["l"].cast("double")
        fields = [newcum.alias("cum")]
        for i in range(nq):
            fields.append(
                F.coalesce(acc[f"vlo{i}"], F.when(newcum.cast("double") > lo[i], val)).alias(f"vlo{i}")
            )
            fields.append(
                F.coalesce(acc[f"vhi{i}"], F.when(newcum.cast("double") > hi[i], val)).alias(f"vhi{i}")
            )
        return F.struct(*fields)

    def finish(acc):
        return F.array(
            *[
                acc[f"vlo{i}"] + (acc[f"vhi{i}"] - acc[f"vlo{i}"]) * (pos[i] - lo[i])
                for i in range(nq)
            ]
        )

    return F.aggregate(pairs, F.struct(*zero_fields), merge, finish)


def _attach_percentiles(df: DataFrame, use_jvm: bool = False) -> DataFrame:
    """Attach p50/p90/p99 from the histogram.

    Default: the vectorized Arrow kernel. The JVM aggregate-expression
    variant (use_jvm=True) produces identical results but measured ~10x
    SLOWER at 500k-window scale — higher-order functions are interpreted
    per-element and the expression tree is re-evaluated once per referencing
    column. Kept as a measured dead end; don't flip the default."""
    if use_jvm:
        p = hist_percentiles_jvm("hist_lens", "hist_cnts")
    else:
        p = _hist_percentiles(F.col("hist_lens"), F.col("hist_cnts"))
    return (
        df.withColumn("_p", p)
        .withColumn("text_len_p50", F.col("_p")[0])
        .withColumn("text_len_p90", F.col("_p")[1])
        .withColumn("text_len_p99", F.col("_p")[2])
        .drop("_p")
    )


_FINAL_COLS = [
    "domain",
    "window_start",
    "doc_count",
    "bytes_total",
    "lang_set",
    "lang_distinct",
    "hist_lens",
    "hist_cnts",
    "text_len_p50",
    "text_len_p90",
    "text_len_p99",
    "gap_filled",
]


def rollup_from_raw(
    pages: DataFrame,
    tier: str,
    key_col=None,
    time_col: str = "warc_ts",
    bytes_col: str | None = None,
    len_col: str | None = None,
) -> DataFrame:
    """Build one rollup tier directly from raw pages.

    Used for the finest tier (1m); coarser tiers should use
    :func:`rollup_cascade` (exact and far cheaper).

    bytes_col/len_col: names of ingest-time stat columns (see
    sources/archive.py ``stats_columns``). When given, the rollup reads two
    narrow int columns instead of decoding the html/text payloads — at 100 TB
    this turns a payload-bandwidth-bound scan into a metadata scan (the
    payload columns are pruned entirely; values are identical by
    construction since the stats were computed from the payloads at write).
    """
    unit = TIERS[tier]
    key = key_col if key_col is not None else domain_of("url")
    ws = F.date_trunc(unit, F.col(time_col))
    if dict(pages.dtypes).get(time_col) == "timestamp_ntz":
        ws = ws.cast("timestamp_ntz")  # wall-clock truncation, session-TZ-proof
    base = pages.select(
        key.alias("domain"),
        ws.alias("window_start"),
        (F.col(bytes_col) if bytes_col else F.octet_length("html")).alias("_bytes"),
        (F.col(len_col) if len_col else F.length("text")).alias("_len"),
        F.col("lang"),
    )

    # Single-scan two-stage aggregation (no join):
    #   stage 1: groupBy(key, window, len, LANG) — the doc-proportional pass.
    #            With lang in the KEY instead of a collect_set state, every
    #            aggregate here is an integer count/sum, so the whole stage is
    #            whole-stage-codegen HashAggregate over fixed-width UnsafeRows
    #            — no object buffers, no 128-key sort-based fallback on the
    #            24M-row path. (The previous collect_set(lang) shape forced
    #            ObjectHashAggregate + sort fallback on BOTH sides of the
    #            doc-proportional exchange; event-log task metrics showed it
    #            as the dominant CPU and the biggest thread-inflation term —
    #            this rewrite cut the cascade's total executor CPU ~35% and
    #            moved 2->8-core scaling efficiency from ~0.66 to ~0.8.)
    #            The extra `len`/`lang` keys double as a salt: a hot
    #            domain-window spreads over the cluster.
    #   stage 2: groupBy(key, window) over pre-aggregated (len, lang)-rows —
    #            input is #windows x #distinct (len, lang), a fraction of the
    #            doc count; collected pairs are bounded by that, never docs.
    #            A len that spans several langs yields duplicate len entries;
    #            the fused Arrow kernel (the cascade's merge) sums them and
    #            computes the percentiles in the same pass, so the emitted
    #            histogram has unique lens — identical content to the old
    #            shape, and the percentile arithmetic is the shared kernel.
    # A previous variant computed metrics and histogram as two groupBys over
    # the raw input joined on (key, window) — 2x the input scan plus a
    # sort-merge join; this shape halved the bench time.
    s1 = base.groupBy("domain", "window_start", "_len", "lang").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum("_bytes").alias("_b"),
    )
    g = (
        s1.groupBy("domain", "window_start")
        .agg(
            F.sum("_cnt").alias("doc_count"),
            F.sum("_b").alias("bytes_total"),
            F.array_sort(F.collect_set("lang")).alias("lang_set"),
            # NULL text keeps its rows in doc_count/bytes_total (the null-len
            # group aggregates like any other) but must not enter the
            # histogram: a None array element NaN-poisons the percentile
            # kernel and crashes the cascade's int64 merge.
            F.array_sort(
                F.filter(
                    F.collect_list(F.struct("_len", "_cnt")),
                    lambda x: x["_len"].isNotNull(),
                )
            ).alias("_h"),
        )
        .select(
            "domain",
            "window_start",
            "doc_count",
            "bytes_total",
            "lang_set",
            F.transform("_h", lambda x: x["_len"]).alias("_fl"),
            F.transform("_h", lambda x: x["_cnt"]).alias("_fc"),
        )
    )
    # keep the emitted element types identical to the pre-kernel columns' (the
    # Arrow kernel computes in int64; the tier schema must not widen)
    lens_t = ArrayType(g.schema["_fl"].dataType.elementType)
    out = (
        g.withColumn("_m", _merged_hist_udf(with_pcts=True)(F.col("_fl"), F.col("_fc")))
        .select(
            "domain",
            "window_start",
            "doc_count",
            "bytes_total",
            "lang_set",
            F.col("_m.lens").cast(lens_t).alias("hist_lens"),
            F.col("_m.cnts").cast(ArrayType(g.schema["_fc"].dataType.elementType)).alias("hist_cnts"),
            F.col("_m.pcts")[0].alias("text_len_p50"),
            F.col("_m.pcts")[1].alias("text_len_p90"),
            F.col("_m.pcts")[2].alias("text_len_p99"),
        )
    )
    out = out.withColumn("lang_distinct", F.size("lang_set").cast("long"))
    out = out.withColumn("gap_filled", F.lit(False))
    return out.select(*_FINAL_COLS)


def rollup_cascade(child: DataFrame, tier: str) -> DataFrame:
    """Re-aggregate the tier below into this tier — exact by construction.

    count/bytes: integer sums. lang_set: distinct of union. Histograms are
    merged (and percentiles recomputed) in ONE fused Arrow kernel over the
    positional concat of each parent's child histograms — the whole cascade
    is a single groupBy shuffle plus one Arrow pass. A previous shape ran
    explode + two regroup shuffles + a join + a separate percentile pass;
    on the tiny upper tiers that was almost pure fixed per-stage cost (it
    alone cost ~4 s of the 17 s scaling job at local[8]). Values are
    bit-identical (integer count sums; the shared percentile kernel), so a
    1d value equals the value you would get from raw.
    """
    unit = TIERS[tier]
    ws = F.date_trunc(unit, F.col("window_start"))
    if dict(child.dtypes).get("window_start") == "timestamp_ntz":
        ws = ws.cast("timestamp_ntz")
    ws = ws.alias("window_start")

    g = (
        child.groupBy("domain", ws)
        .agg(
            F.sum("doc_count").alias("doc_count"),
            F.sum("bytes_total").alias("bytes_total"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("lang_set")))).alias("lang_set"),
            # ONE collect_list of paired structs (not two parallel lists):
            # lens/cnts are then extracted positionally from the same list,
            # so the pairing can never skew across aggregation buffers
            F.collect_list(F.struct("hist_lens", "hist_cnts")).alias("_hs"),
        )
        .select(
            "domain",
            "window_start",
            "doc_count",
            "bytes_total",
            "lang_set",
            F.flatten(F.col("_hs.hist_lens")).alias("_fl"),
            F.flatten(F.col("_hs.hist_cnts")).alias("_fc"),
        )
    )
    # match the child's ELEMENT types (containsNull must stay True — the UDF
    # output container is nullable and Spark refuses nullability-narrowing casts)
    lens_t = ArrayType(child.schema["hist_lens"].dataType.elementType)
    cnts_t = ArrayType(child.schema["hist_cnts"].dataType.elementType)
    out = (
        g.withColumn("_m", _merged_hist_udf(with_pcts=True)(F.col("_fl"), F.col("_fc")))
        .select(
            "domain",
            "window_start",
            "doc_count",
            "bytes_total",
            "lang_set",
            F.col("_m.lens").cast(lens_t).alias("hist_lens"),
            F.col("_m.cnts").cast(cnts_t).alias("hist_cnts"),
            F.col("_m.pcts")[0].alias("text_len_p50"),
            F.col("_m.pcts")[1].alias("text_len_p90"),
            F.col("_m.pcts")[2].alias("text_len_p99"),
        )
        .withColumn("lang_distinct", F.size("lang_set").cast("long"))
        .withColumn("gap_filled", F.lit(False))
    )
    return out.select(*_FINAL_COLS)


def rollup_all_tiers(
    pages: DataFrame,
    key_col=None,
    time_col: str = "warc_ts",
    bytes_col: str | None = None,
    len_col: str | None = None,
) -> dict[str, DataFrame]:
    """The full cascade: raw -> 1m -> 1h -> 1d."""
    tiers: dict[str, DataFrame] = {}
    tiers["1m"] = rollup_from_raw(
        pages, "1m", key_col=key_col, time_col=time_col, bytes_col=bytes_col, len_col=len_col
    )
    tiers["1h"] = rollup_cascade(tiers["1m"], "1h")
    tiers["1d"] = rollup_cascade(tiers["1h"], "1d")
    return tiers


# ---------------------------------------------------------------------------
# pandas oracle (single-threaded, straight-line) — the test-time ground truth
# ---------------------------------------------------------------------------

def rollup_oracle_pandas(pages_pdf: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Straight-line pandas implementation of a tier from raw (FIXTURES.md F4)."""
    unit = {"1m": "min", "1h": "h", "1d": "D"}[tier]
    df = pages_pdf.copy()
    # mirror parse_url(HOST) semantics: host ends at port/path/query/fragment,
    # userinfo excluded, and a path-less URL ("https://x.com") still parses —
    # the old r"https?://([^/]+)/" regex required a trailing slash and kept
    # the port, silently dropping/renaming groups vs the engine key.
    df["domain"] = df["url"].str.extract(
        r"https?://(?:[^/@]*@)?([^/:?#]+)", expand=False
    )
    df["window_start"] = df["warc_ts"].dt.floor(unit)
    df["_bytes"] = df["html"].map(len)
    df["_len"] = df["text"].str.len()

    def per_group(g: pd.DataFrame) -> pd.Series:
        lens = np.sort(g["_len"].to_numpy(np.int64))
        uniq, cnts = np.unique(lens, return_counts=True)
        p50, p90, p99 = _pcts_from_hist(uniq, cnts)
        return pd.Series(
            {
                "doc_count": len(g),
                "bytes_total": int(g["_bytes"].sum()),
                "lang_set": sorted(set(g["lang"])),
                "lang_distinct": g["lang"].nunique(),
                "hist_lens": uniq.tolist(),
                "hist_cnts": cnts.tolist(),
                "text_len_p50": p50,
                "text_len_p90": p90,
                "text_len_p99": p99,
                "gap_filled": False,
            }
        )

    out = (
        df.groupby(["domain", "window_start"], sort=True)
        .apply(per_group, include_groups=False)
        .reset_index()
    )
    return out
