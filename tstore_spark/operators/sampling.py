"""Deterministic sampling and dataset splits — reproducible by construction.

Training pipelines need samples and train/eval splits that are (a) stable
across reruns, cluster sizes, and engines, (b) a pure function of the
record's identity — never of partition layout or RNG state. Spark's
``df.sample`` is seeded per-partition (layout-dependent); this module uses
content hashing instead: a record's uniform variate is
``md5(id || ':' || seed)``'s first 32 bits over 2^32 — the same number in
any engine with md5 (DuckDB: ``('0x' || substr(md5(...), 1, 8))::BIGINT``),
so samples and splits are portable, auditable, and oracle-checkable.

Scale notes: pure codegen expressions (md5 + conv), no shuffle, no state —
sampling is free at any scale, and a split assignment can be recomputed
from the id alone years later.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_DENOM = float(1 << 32)


def hash_uniform(id_col: str | Column, seed: int = 42) -> Column:
    """Deterministic uniform [0, 1) variate from a record id: the first 32
    bits of md5(id || ':' || seed) over 2^32."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(c.cast("string"), F.lit(f":{seed}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") / F.lit(_DENOM)


def deterministic_sample(
    df: DataFrame, id_col: str, fraction: float, seed: int = 42
) -> DataFrame:
    """Keep ~fraction of rows, chosen purely by id hash (stable forever)."""
    return df.where(hash_uniform(id_col, seed) < F.lit(float(fraction)))


def split_column(
    id_col: str | Column,
    fractions: dict[str, float],
    seed: int = 42,
) -> Column:
    """Split label from cumulative hash thresholds (insertion order).

    Fractions must sum to 1 (validated); every record gets exactly one
    label, and a record's label never changes as the corpus grows — the
    property random splits lack."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = hash_uniform(id_col, seed)
    expr = None
    cum = 0.0
    names = list(fractions)
    for name in names[:-1]:
        cum += fractions[name]
        cond_expr = u < F.lit(cum)
        expr = F.when(cond_expr, F.lit(name)) if expr is None else expr.when(cond_expr, F.lit(name))
    last = F.lit(names[-1])
    return last if expr is None else expr.otherwise(last)


def deterministic_split(
    df: DataFrame,
    id_col: str,
    fractions: dict[str, float],
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    return df.withColumn(out_col, split_column(id_col, fractions, seed))


def mixture_sample(
    df: DataFrame,
    id_col: str,
    domain_col: str,
    weights: dict[str, float],
    default_weight: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Domain-weighted corpus mixture: keep each record with its domain's
    retention weight (0..1), decided purely by content hash — the
    training-mixture reweighting step (e.g. up-/down-sampling sources to hit
    a target blend) with the same reproducibility contract as
    :func:`deterministic_sample`: stable across reruns, cluster sizes,
    engines, and corpus growth. Domains missing from ``weights`` fall back
    to ``default_weight`` (0 = drop unknown sources — the safe default for
    a curated blend).

    Scale notes: a pure codegen predicate (md5 + conv + a CASE over the
    weight map), no shuffle, no state; weights live in the plan, so the
    sampled set is recomputable from ids alone."""
    for k, w in weights.items():
        if not (0.0 <= w <= 1.0):
            raise ValueError(f"weight for {k!r} must be in [0, 1], got {w}")
    if not (0.0 <= default_weight <= 1.0):
        raise ValueError(f"default_weight must be in [0, 1], got {default_weight}")
    u = hash_uniform(id_col, seed)
    w_expr = None
    for name, w in weights.items():
        cond = F.col(domain_col) == F.lit(name)
        w_expr = F.when(cond, F.lit(float(w))) if w_expr is None else w_expr.when(cond, F.lit(float(w)))
    w_expr = F.lit(float(default_weight)) if w_expr is None else w_expr.otherwise(F.lit(float(default_weight)))
    return df.where(u < w_expr)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    rate: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Per-ROW weighted retention: keep each record with probability
    ``min(1, rate * weight)``, decided purely by content hash — the
    continuous-weight sibling of :func:`mixture_sample` (whose weights are
    per-DOMAIN constants). The standard quality-weighted corpus sampling
    step: feed a quality score in [0, 1] (or any non-negative per-row
    importance) and scale the whole blend with ``rate``.

    Same reproducibility contract as :func:`deterministic_sample`: a
    record's keep/drop decision is a pure function of (id, seed, its own
    weight) — stable across reruns, cluster sizes, engines, and corpus
    growth, and recomputable from the row alone years later. Records with
    NULL or non-positive weight are dropped (NULL < threshold is NULL —
    falsy — in both engines; documented, not accidental).

    Scale notes: a pure codegen predicate (md5 + conv + one multiply), no
    shuffle, no state. Weights above ``1/rate`` saturate at probability 1
    (kept always) — by design, weighting never duplicates rows; use an
    explode-based upsampler if >1x repetition is wanted."""
    if rate < 0:
        raise ValueError(f"rate must be >= 0, got {rate}")
    u = hash_uniform(id_col, seed)
    prod = F.lit(float(rate)) * F.col(weight_col).cast("double")
    # least() SKIPS nulls in both Spark and DuckDB (least(1.0, NULL) = 1.0),
    # which would silently keep every NULL-weight row — guard explicitly so
    # NULL weight means p = NULL and the row drops
    p = F.when(prod.isNotNull(), F.least(F.lit(1.0), prod))
    return df.where(u < p)


def upsample_mixture(
    df: DataFrame,
    id_col: str,
    factor: str | Column | float,
    seed: int = 42,
    copy_col: str = "copy_idx",
    max_factor: float = 100.0,
) -> DataFrame:
    """Fractional-epoch UPsampling: replicate each row ``factor`` times in
    expectation — the data-mixing recipe that runs high-quality sources for
    e.g. 2.45 epochs while a crawl runs for 0.6 (the >1x direction
    :func:`weighted_sample` deliberately refuses). ``factor`` may be a
    constant, a column name, or any Column expression (a per-domain CASE, a
    quality score); copies = ``floor(f)`` plus one more iff the row's
    deterministic md5 variate falls under ``frac(f)``, so E[copies] == f
    EXACTLY and integer factors replicate exactly — no RNG, no layout
    dependence, the same copy set in any engine with md5.

    Output: the input columns plus ``copy_col`` (0-based copy index). The
    copy index exists so downstream :func:`epoch_shuffle` can reseed per
    copy (hash over ``id || '#' || copy``) and the replicas land in
    different shards / positions instead of training back-to-back.

    Scale notes (100 TB): a pure projection + ``explode(sequence(...))`` —
    zero shuffle, no state; output bytes = sum(factor) x input, which is the
    caller's explicit choice. ``max_factor`` guards the accidental
    ``factor=tokens_col`` mistake (a 10^5-fold explode) with an in-plan
    raise riding the copy column, so a bad factor fails loudly on the first
    executor batch instead of filling the cluster's disks."""
    f = (
        F.col(factor)
        if isinstance(factor, str)
        else F.lit(float(factor))
        if isinstance(factor, (int, float))
        else factor
    ).cast("double")
    u = hash_uniform(id_col, seed)
    n = (
        F.floor(f) + F.when(u < (f - F.floor(f)), F.lit(1)).otherwise(F.lit(0))
    ).cast("long")
    guarded = F.when(
        (f < 0) | (f > F.lit(float(max_factor))),
        F.raise_error(
            F.format_string(
                f"upsample_mixture: factor %s outside [0, {max_factor}] "
                f"(raise max_factor= if the blow-up is intended)",
                f.cast("string"),
            ).cast("long"),
        ),
    ).otherwise(n)
    # sequence(0, n-1) raises for n=0 (descending default step), so gate the
    # explode behind n >= 1; n == 0 rows drop, which IS the semantics
    return (
        df.withColumn("__n_copies", guarded)
        .where(F.col("__n_copies") >= 1)
        .withColumn(
            copy_col,
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement (priority sampling,
    Duffield-Lund-Thorup, JACM 2007): each row gets priority
    ``q = w / u`` from its deterministic md5 variate ``u``; the sample is
    the k highest priorities and every kept row carries the
    Horvitz-Thompson estimator weight ``est_w = max(w, tau)`` where ``tau``
    is the (k+1)-th priority — subset sums of ``est_w`` are unbiased
    estimates of the population's weight sums, within a tight variance
    bound of the optimal k-sample. The missing regime between
    :func:`weighted_sample` (Bernoulli, random size) and
    :func:`stratified_sample` (fixed size, UNweighted): a fixed-budget
    sample where heavy rows must be favored but the budget is hard.

    Deterministic by construction: u is the content-hash variate (never
    RNG), q is one IEEE division, and the total order is (q DESC, id ASC)
    — the same sample and the same tau in any engine with md5.

    Output: (id, weight, priority, est_w), the k sampled rows.

    Scale notes (100 TB): priorities are a pure codegen projection; the
    top-(k+1) selection plans as TakeOrderedAndProject (per-partition
    heaps, one k-sized merge — no global sort, no full shuffle); tau rides
    back as a broadcast 1-row aggregate over those k+1 rows. k is a
    driver-bounded sample budget by definition."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    u = hash_uniform(id_col, seed)
    ranked = (
        df.select(
            F.col(id_col),
            w.alias("weight"),
            (w / u).alias("priority"),
        )
        .where(F.col("weight") > 0)
        .orderBy(F.col("priority").desc(), F.col(id_col).asc())
        .limit(k + 1)
    )
    # rank the <= k+1 survivors with a single-partition window — bounded by
    # the sample budget, never by the population (the unbounded-window shape
    # plan_audit bans is the one over the INPUT; this one is post-limit).
    # The k+1 rows are pinned via localCheckpoint so the tau aggregate and
    # the output branch share ONE input scan instead of re-deriving the
    # TakeOrdered twice (bounded eager action: k+1 rows).
    wnd = Window.orderBy(F.col("priority").desc(), F.col(id_col).asc())
    top = ranked.withColumn("__rn", F.row_number().over(wnd)).localCheckpoint()
    # tau = the (k+1)-th priority; NULL when the population has <= k
    # positive-weight rows (then every row keeps its true weight). A 1-row
    # aggregate riding the plan broadcast — never a driver action.
    tau = top.agg(
        F.min(F.when(F.col("__rn") == k + 1, F.col("priority"))).alias("__tau")
    )
    return (
        top.where(F.col("__rn") <= k)
        .crossJoin(F.broadcast(tau))
        .withColumn(
            "est_w", F.greatest(F.col("weight"), F.coalesce(F.col("__tau"), F.lit(0.0)))
        )
        .drop("__rn", "__tau")
    )


def priority_sample_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 42,
) -> DataFrame:
    """:func:`priority_sample` with a fixed budget of ``k`` rows PER GROUP
    — the "best k documents from every source/domain" regime of a training
    data recipe (a global budget lets one hot source starve the rest).

    Same Duffield-Lund-Thorup estimator per group: priority ``w/u`` from
    the deterministic md5 variate, top-k per group kept, per-group tau =
    the (k+1)-th priority, ``est_w = max(w, tau)`` makes per-group subset
    weight sums unbiased. Output: (group, id, weight, priority, est_w).

    Scale notes (100 TB): the rank filter directly above the row_number
    window plans as WindowGroupLimit (Spark >= 3.5) — per-partition
    top-(k+1) heaps BEFORE the shuffle, so the exchange carries at most
    (k+1) rows per group per map partition, never the population. Both
    windows (rank + tau) share the one group-hash Exchange; tau needs no
    join-back. Group count is unbounded — this is the per-key variant the
    global TakeOrdered cannot express."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = F.col(weight_col).cast("double")
    u = hash_uniform(id_col, seed)
    wnd = Window.partitionBy(group_col).orderBy(
        F.col("priority").desc(), F.col(id_col).asc()
    )
    ranked = (
        df.select(
            F.col(group_col),
            F.col(id_col),
            w.alias("weight"),
            (w / u).alias("priority"),
        )
        .where(F.col("weight") > 0)
        .withColumn("__rn", F.row_number().over(wnd))
        .where(F.col("__rn") <= k + 1)
    )
    # tau via a second window over the SAME partitioning (no new Exchange,
    # no join-back): evaluated over the <= k+1 surviving rows per group
    tau = F.max(
        F.when(F.col("__rn") == k + 1, F.col("priority"))
    ).over(Window.partitionBy(group_col))
    return (
        ranked.withColumn("__tau", tau)
        .where(F.col("__rn") <= k)
        .withColumn(
            "est_w",
            F.greatest(F.col("weight"), F.coalesce(F.col("__tau"), F.lit(0.0))),
        )
        .drop("__rn", "__tau")
    )


def token_pack_offsets(
    df: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    count_col: str = "n_tokens",
    bucket_width: int = 1_000_000,
) -> DataFrame:
    """Assign every document its global token offset and fixed-budget
    training-sample id — the GPT-style concat-then-chunk sharding decision
    (documents concatenated in ``id_col`` order, the token stream cut every
    ``budget`` tokens). Output per document: (id, n_tokens, start_offset,
    sample_id = start_offset div budget, crosses_boundary).

    The naive formulation is ``sum(n) OVER (ORDER BY id)`` — a GLOBAL
    ordered window, which Spark executes as a single task (every row through
    one partition): a non-starter at corpus scale. This operator is the
    distributed prefix sum instead:

    1. coarse MONOTONE buckets of the order key (``id div bucket_width``) —
       (bucket, id) order equals id order;
    2. one narrow aggregation for per-bucket token sums, cumulated
       driver-side (bucket count = id-range / bucket_width — metadata-sized;
       pick ``bucket_width`` so this stays ~1e6 rows at your id range);
    3. per-bucket exclusive-cumsum windows, all running in PARALLEL, each
       offset by its bucket's broadcast base.

    Deterministic by construction (pure function of (id, n) pairs; ids must
    be unique and numeric — the order key). Oracle-checkable: the output
    equals the naive global-window SQL row for row.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    staged = df.select(
        F.col(id_col),
        F.col(count_col).cast("long").alias("n_tokens"),
        F.expr(f"{id_col} div {bucket_width}").alias("_bkt"),
    )
    sums = (
        staged.groupBy("_bkt").agg(F.sum("n_tokens").alias("_s")).orderBy("_bkt").collect()
    )
    bases, acc = [], 0
    for r in sums:
        bases.append((r["_bkt"], acc))
        # a bucket whose token counts are all NULL sums to NULL — NULL rows
        # contribute no tokens (matching SQL's null-skipping sum)
        acc += r["_s"] or 0
    base_df = df.sparkSession.createDataFrame(bases, "_bkt long, _base long")

    from pyspark.sql import Window

    w = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_base") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = (
        staged.join(F.broadcast(base_df), "_bkt")
        .withColumn("start_offset", start)
        .withColumn("sample_id", F.expr(f"start_offset div {budget}"))
        .withColumn(
            "crosses_boundary",
            F.when(
                F.col("n_tokens") > 0,
                F.expr(f"(start_offset + n_tokens - 1) div {budget}")
                != F.col("sample_id"),
            ).otherwise(F.lit(False)),
        )
    )
    return out.select(id_col, "n_tokens", "start_offset", "sample_id", "crosses_boundary")


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    id_col: str,
    n: int,
    seed: int = 42,
    prefilter_margin: float = 4.0,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, chosen as the n
    SMALLEST id-hash variates (ties broken on id) — a deterministic,
    engine-portable "bottom-n by hash" sample: stable across reruns,
    cluster sizes, and engines, and oracle-checkable as a window rank
    over the same md5 arithmetic.

    Scale shape: the naive form is a full per-stratum sort. Here a
    per-stratum count (one cheap pre-aggregation) sets a hash cutoff
    ``(prefilter_margin * n + 24) / count`` so the window only ever sorts
    ~margin*n + 24 rows per stratum regardless of stratum size; strata
    with <= n rows skip the cutoff entirely. The additive +24 keeps the
    shortfall probability negligible at SMALL n too (a bare ``4n/count``
    cutoff leaves ~e^-4 ≈ 1.8% of n=1 strata EMPTY — deterministically,
    for that dataset). Residual shortfall is asserted in-plan: a stratum
    yielding fewer than min(n, count) rows raises at action time instead
    of silently violating the exactness contract."""
    u = hash_uniform(id_col, seed)
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_cnt"))
    staged = (
        df.withColumn("_u", u)
        .join(counts, strata_col)
        .where(
            (F.col("_cnt") <= F.lit(n))
            | (F.col("_u") < (F.lit(float(prefilter_margin) * n) + F.lit(24.0)) / F.col("_cnt"))
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(F.col("_u").asc(), F.col(id_col).asc())
    picked = staged.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n)
    # loud shortfall guard over the already-tiny (<= n rows/stratum) output.
    # It rides INSIDE the returned id column (coverage.py's in-plan pattern):
    # a guard in a dropped helper column would be eliminated by column
    # pruning and never evaluate.
    sel = F.count(F.lit(1)).over(Window.partitionBy(strata_col))
    id_type = dict(df.dtypes)[id_col]
    checked_id = F.when(
        sel < F.least(F.lit(n).cast("long"), F.col("_cnt")),
        F.raise_error(
            F.format_string(
                "stratified_sample prefilter shortfall in stratum %s "
                "(selected %d of %d wanted); raise prefilter_margin",
                F.col(strata_col).cast("string"),
                sel,
                F.least(F.lit(n).cast("long"), F.col("_cnt")),
            )
        ).cast(id_type),
    ).otherwise(F.col(id_col))
    return picked.withColumn(id_col, checked_id).drop("_u", "_cnt", "_rn")


def epoch_shuffle_key(id_col: str | Column, epoch: int = 0, seed: int = 42) -> Column:
    """Deterministic training-order key for one epoch: the full md5 hex of
    ``id || ':' || seed || ':' || epoch``. Hex-string order IS the epoch
    order — portable to any engine with md5 and free of float rounding.
    Different epochs permute independently (the hash reseeds); the same
    (seed, epoch) reproduces the exact order forever."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.md5(F.concat(c.cast("string"), F.lit(f":{seed}:{epoch}")))


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    epoch: int = 0,
    seed: int = 42,
) -> DataFrame:
    """Assign every row a shard and an order key for one training epoch:
    ``(*, shard, sort_key)``. The shard id decodes the key's TAIL (hex
    chars 29-32 as a 16-bit VALUE, mod ``n_shards`` — decoded with
    ``conv``, never via ascii codes of the hex characters, whose residues
    are up to 3x non-uniform) while ordering uses the whole key from its
    head — independent bits, so shard sizes stay multinomial-uniform
    regardless of id distribution and each shard's internal order is
    itself a uniform shuffle. That per-shard order is what training
    loaders consume (each worker streams its shard sequentially); a
    global order across parallel shard readers is not meaningful, so
    none is promised.

    Pure projection — zero shuffle HERE. Materializing is the caller's
    one repartition: :func:`write_epoch_shards`.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = epoch_shuffle_key(id_col, epoch, seed)
    return df.withColumn("sort_key", key).withColumn(
        "shard",
        (
            F.conv(F.substring("sort_key", 29, 4), 16, 10).cast("long")
            % F.lit(int(n_shards))
        ).cast("int"),
    )


def write_epoch_shards(
    df: DataFrame,
    path: str,
    id_col: str,
    n_shards: int,
    epoch: int = 0,
    seed: int = 42,
) -> None:
    """Materialize one epoch's shuffled shards: ONE hash repartition on the
    shard id + a local sort by the epoch key, written as
    ``shard=<k>/part-*.parquet``. Each shard file set read top-to-bottom
    is that worker's epoch stream. Row groups preserve the sorted order
    (parquet writers keep input order), so a loader never re-sorts."""
    shuffled = epoch_shuffle(df, id_col, n_shards, epoch, seed)
    (
        shuffled.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )
