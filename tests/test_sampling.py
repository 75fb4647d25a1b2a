"""Deterministic sampling/splits: stability, portability, proportions."""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tstore_spark.operators.sampling import (
    deterministic_sample,
    deterministic_split,
    hash_uniform,
)


@pytest.fixture(scope="module")
def ids_sdf(spark):
    return spark.createDataFrame(pd.DataFrame({"doc_id": range(2000)}))


def test_uniform_matches_reference_md5(ids_sdf):
    rows = {r["doc_id"]: r["u"] for r in ids_sdf.select("doc_id", hash_uniform("doc_id", 42).alias("u")).limit(2000).collect()}
    for i in (0, 1, 1999):
        expect = int(hashlib.md5(f"{i}:42".encode()).hexdigest()[:8], 16) / float(1 << 32)
        assert rows[i] == expect


def test_split_proportions_and_stability(ids_sdf):
    s = deterministic_split(ids_sdf, "doc_id", {"train": 0.8, "eval": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in s.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 2000 - 0.8) < 0.05
    assert abs(counts["eval"] / 2000 - 0.1) < 0.03
    # growing the corpus never relabels an existing id
    bigger = deterministic_split(
        ids_sdf.sparkSession.createDataFrame(pd.DataFrame({"doc_id": range(4000)})),
        "doc_id", {"train": 0.8, "eval": 0.1, "test": 0.1},
    )
    a = {r["doc_id"]: r["split"] for r in s.collect()}
    b = {r["doc_id"]: r["split"] for r in bigger.collect()}
    assert all(b[k] == v for k, v in a.items())


def test_sample_is_subset_and_stable(ids_sdf):
    s1 = {r["doc_id"] for r in deterministic_sample(ids_sdf, "doc_id", 0.25).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(ids_sdf.repartition(9), "doc_id", 0.25).collect()}
    assert s1 == s2
    assert abs(len(s1) / 2000 - 0.25) < 0.05
    smaller = {r["doc_id"] for r in deterministic_sample(ids_sdf, "doc_id", 0.1).collect()}
    assert smaller <= s1  # nested samples: lower fraction is a subset


def test_bad_fractions_raise(ids_sdf):
    with pytest.raises(ValueError, match="sum to 1"):
        deterministic_split(ids_sdf, "doc_id", {"a": 0.5, "b": 0.2})


def test_token_pack_offsets_matches_straightline(spark):
    """Distributed prefix sum == the naive global cumsum, including exact
    budget fills, boundary crossings, zero-token docs, and id gaps."""
    import numpy as np

    from tstore_spark.operators.sampling import token_pack_offsets

    rng = np.random.default_rng(7)
    ids = sorted(rng.choice(10_000, size=400, replace=False).tolist())
    ns = [int(rng.integers(0, 50)) for _ in ids]
    ns[3] = 0                      # zero-token doc
    budget = 100
    pdf = pd.DataFrame({"doc_id": ids, "n_tokens": ns})
    sdf = spark.createDataFrame(pdf)

    expect = {}
    acc = 0
    for i, n in zip(ids, ns):
        sid = acc // budget
        crosses = n > 0 and (acc + n - 1) // budget != sid
        expect[i] = (n, acc, sid, crosses)
        acc += n

    for bw, parts in ((1_000_000, 1), (100, 7), (1, 32)):
        got = {
            r["doc_id"]: (r["n_tokens"], r["start_offset"], r["sample_id"], r["crosses_boundary"])
            for r in token_pack_offsets(
                sdf.repartition(parts), budget, bucket_width=bw
            ).collect()
        }
        assert got == expect, f"bucket_width={bw}"


def test_token_pack_offsets_guards(spark):
    from tstore_spark.operators.sampling import token_pack_offsets

    sdf = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "n_tokens": [5]}))
    with pytest.raises(ValueError, match="budget"):
        token_pack_offsets(sdf, 0)


def test_mixture_sample(spark):
    from tstore_spark.operators.sampling import deterministic_sample, mixture_sample

    pdf = pd.DataFrame({
        "doc_id": range(3000),
        "source": ["a", "b", "c"][0] * 0,  # placeholder replaced below
    })
    pdf["source"] = [("a", "b", "c")[i % 3] for i in range(3000)]
    sdf = spark.createDataFrame(pdf)
    out = mixture_sample(sdf, "doc_id", "source", {"a": 1.0, "b": 0.3}, default_weight=0.0)
    counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert counts["a"] == 1000          # weight 1 keeps everything
    assert "c" not in counts            # default 0 drops unknown domains
    assert abs(counts["b"] / 1000 - 0.3) < 0.06
    # same variate as deterministic_sample: domain weight w == global sample w
    only_b = sdf.where(F.col("source") == "b")
    expect_b = {r["doc_id"] for r in deterministic_sample(only_b, "doc_id", 0.3).collect()}
    got_b = {r["doc_id"] for r in out.where(F.col("source") == "b").collect()}
    assert got_b == expect_b
    # stability across partitioning
    again = {r["doc_id"] for r in
             mixture_sample(sdf.repartition(11), "doc_id", "source",
                            {"a": 1.0, "b": 0.3}).collect()}
    assert again == {r["doc_id"] for r in out.collect()}
    with pytest.raises(ValueError, match="weight"):
        mixture_sample(sdf, "doc_id", "source", {"a": 1.5})


# -- stratified_sample --------------------------------------------------------

def _strat_naive(spark, df, strata_col, id_col, n, seed=42):
    from pyspark.sql import Window
    from tstore_spark.operators.sampling import hash_uniform

    w = Window.partitionBy(strata_col).orderBy(hash_uniform(id_col, seed), F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= n).drop("_rn")


def test_stratified_exact_n_per_stratum(spark, pages_sdf):
    from tstore_spark.functions.urls import domain_of
    from tstore_spark.operators.sampling import stratified_sample

    pages = pages_sdf.withColumn("domain", domain_of("url"))
    got = stratified_sample(pages, "domain", "url", n=7)
    sizes = {r["domain"]: r["n"] for r in got.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    full = {r["domain"]: r["n"] for r in pages.groupBy("domain").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {d: min(7, c) for d, c in full.items()}


def test_stratified_equals_naive_window(spark, pages_sdf):
    """The prefiltered scale path must return EXACTLY the naive bottom-n-by-
    hash window result (the oracle semantics)."""
    from tstore_spark.functions.urls import domain_of
    from tstore_spark.operators.sampling import stratified_sample

    pages = pages_sdf.withColumn("domain", domain_of("url"))
    got = stratified_sample(pages, "domain", "url", n=5).select("domain", "url")
    exp = _strat_naive(spark, pages, "domain", "url", 5).select("domain", "url")
    assert got.exceptAll(exp).count() == 0 and exp.exceptAll(got).count() == 0


def test_stratified_small_stratum_fully_kept(spark):
    import pandas as pd
    from tstore_spark.operators.sampling import stratified_sample

    pdf = pd.DataFrame({"k": ["a"] * 3 + ["b"] * 50, "id": [str(i) for i in range(53)]})
    got = stratified_sample(spark.createDataFrame(pdf), "k", "id", n=10)
    sizes = {r["k"]: r["n"] for r in got.groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert sizes == {"a": 3, "b": 10}


def test_stratified_deterministic_across_parallelism(spark, pages_sdf):
    from tstore_spark.functions.urls import domain_of
    from tstore_spark.operators.sampling import stratified_sample

    pages = pages_sdf.withColumn("domain", domain_of("url"))
    a = stratified_sample(pages.repartition(1), "domain", "url", n=6).select("domain", "url")
    b = stratified_sample(pages.repartition(16), "domain", "url", n=6).select("domain", "url")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_stratified_small_n_large_stratum_never_short(spark):
    """n=1 over a large stratum: the old 4n/count cutoff left ~1.8% of such
    strata EMPTY (deterministically for the dataset); the additive cutoff
    floor + in-plan guard make shortfall impossible-or-loud. 40 seeds would
    have hit the old failure with P ~ 51%."""
    import pandas as pd

    from tstore_spark.operators.sampling import stratified_sample

    pdf = pd.DataFrame(
        {
            "doc_id": [f"d{i:05d}" for i in range(8000)],
            "lang": [f"g{i % 4}" for i in range(8000)],
        }
    )
    df = spark.createDataFrame(pdf)
    for seed in range(40):
        got = stratified_sample(df, "lang", "doc_id", n=1, seed=seed)
        counts = {r["lang"]: r["c"] for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("c")).collect()}
        assert counts == {f"g{i}": 1 for i in range(4)}, (seed, counts)


# ---------------------------------------------------------------------------
# weighted_sample (per-row continuous-weight retention)
# ---------------------------------------------------------------------------


def _md5_uniform(doc_id, seed=42):
    h = hashlib.md5(f"{doc_id}:{seed}".encode()).hexdigest()
    return int(h[:8], 16) / float(1 << 32)


def test_weighted_sample_matches_md5_reference(spark):
    from tstore_spark.operators.sampling import weighted_sample

    pdf = pd.DataFrame({"doc_id": range(600)})
    pdf["w"] = (pdf["doc_id"] % 10) / 10.0  # weights 0.0 .. 0.9
    df = spark.createDataFrame(pdf)
    got = {r["doc_id"] for r in weighted_sample(df, "doc_id", "w", rate=1.5).collect()}
    want = {
        int(d)
        for d, w in zip(pdf["doc_id"], pdf["w"])
        if _md5_uniform(d) < min(1.0, 1.5 * w)
    }
    assert got == want and 0 < len(got) < 600
    # weight 0 rows never survive; saturated weights (1.5*w >= 1) always do
    assert not any(d % 10 == 0 for d in got)
    assert all(d in got for d in range(600) if 1.5 * ((d % 10) / 10.0) >= 1.0)


def test_weighted_sample_null_weight_drops_and_guard(spark):
    from tstore_spark.operators.sampling import weighted_sample

    pdf = pd.DataFrame({"doc_id": [1, 2, 3], "w": [None, 1.0, -0.5]})
    got = {r["doc_id"] for r in weighted_sample(
        spark.createDataFrame(pdf), "doc_id", "w", rate=1.0).collect()}
    assert got == {2}  # NULL and negative weights drop
    with pytest.raises(ValueError, match="rate"):
        weighted_sample(spark.createDataFrame(pdf), "doc_id", "w", rate=-1)


def test_weighted_sample_is_stable_under_growth(spark):
    """A record's decision never changes as the corpus grows (pure function
    of id, seed, and its own weight)."""
    from tstore_spark.operators.sampling import weighted_sample

    pdf = pd.DataFrame({"doc_id": range(400)})
    pdf["w"] = 0.5
    small = spark.createDataFrame(pdf.iloc[:200])
    big = spark.createDataFrame(pdf)
    kept_small = {r["doc_id"] for r in weighted_sample(small, "doc_id", "w").collect()}
    kept_big = {r["doc_id"] for r in weighted_sample(big, "doc_id", "w").collect()}
    assert kept_small == {d for d in kept_big if d < 200}


# ---------------------------------------------------------------------------
# epoch shuffle
# ---------------------------------------------------------------------------


def test_epoch_shuffle_covers_and_reproduces(spark):
    from tstore_spark.operators.sampling import epoch_shuffle

    docs = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    a = epoch_shuffle(docs, "doc_id", n_shards=4, epoch=0).collect()
    b = epoch_shuffle(docs.repartition(9), "doc_id", n_shards=4, epoch=0).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    assert {r["doc_id"] for r in a} == set(range(500))
    assert {r["shard"] for r in a} == {0, 1, 2, 3}
    # roughly balanced shards (multinomial, n=500, p=1/4)
    from collections import Counter
    sizes = Counter(r["shard"] for r in a)
    assert all(80 < sizes[s] < 175 for s in range(4))


def test_epoch_shuffle_epochs_differ(spark):
    from tstore_spark.operators.sampling import epoch_shuffle

    docs = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    e0 = [r["doc_id"] for r in
          epoch_shuffle(docs, "doc_id", 1, epoch=0).orderBy("sort_key").collect()]
    e1 = [r["doc_id"] for r in
          epoch_shuffle(docs, "doc_id", 1, epoch=1).orderBy("sort_key").collect()]
    assert sorted(e0) == sorted(e1) == list(range(200))
    assert e0 != e1


def test_write_epoch_shards_ordered_files(spark, tmp_path):
    from tstore_spark.operators.sampling import epoch_shuffle, write_epoch_shards

    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(300)], "doc_id long, text string"
    )
    out = str(tmp_path / "epoch0")
    write_epoch_shards(docs, out, "doc_id", n_shards=3, epoch=0)
    back = spark.read.parquet(out)
    assert back.count() == 300
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {0, 1, 2}
    # within each shard file, rows are stored in sort_key order
    import pyarrow.parquet as pq
    import glob as _glob
    for f in _glob.glob(out + "/shard=*/part-*.parquet"):
        keys = pq.read_table(f, columns=["sort_key"])["sort_key"].to_pylist()
        assert keys == sorted(keys)


def test_epoch_shuffle_bad_shards(spark):
    from tstore_spark.operators.sampling import epoch_shuffle
    import pytest as _pytest

    docs = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError):
        epoch_shuffle(docs, "doc_id", 0)


def test_epoch_shuffle_shard_uniform_at_8(spark):
    """Regression: ascii-code sharding gave shard 1 a 3x share of shard 7
    at n_shards=8 (hex-char ascii residues are not uniform); hex-VALUE
    decoding must keep every shard within a tight band of n/8."""
    from tstore_spark.operators.sampling import epoch_shuffle
    from collections import Counter

    docs = spark.createDataFrame([(i,) for i in range(4000)], "doc_id long")
    sizes = Counter(
        r["shard"] for r in epoch_shuffle(docs, "doc_id", 8).collect()
    )
    assert set(sizes) == set(range(8))
    # expected 500/shard; 3-sigma of Binomial(4000, 1/8) is ~±63
    assert all(380 < sizes[s] < 620 for s in range(8)), sizes


# ---------------------------------------------------------------- upsample


def test_upsample_integer_factor_replicates_exactly(spark):
    from tstore_spark.operators.sampling import upsample_mixture

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(300)}))
    up = upsample_mixture(df, "doc_id", 3.0)
    assert up.count() == 900
    per = {r["doc_id"]: r["n"] for r in up.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(per.values()) == {3}
    # copy indices are exactly 0..n-1
    idx = up.groupBy("doc_id").agg(F.sort_array(F.collect_list("copy_idx")).alias("c")).limit(5).collect()
    assert all(r["c"] == [0, 1, 2] for r in idx)


def test_upsample_fractional_matches_md5_reference(spark):
    from tstore_spark.operators.sampling import upsample_mixture

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(2000)}))
    up = upsample_mixture(df, "doc_id", 1.4, seed=7)
    per = {r["doc_id"]: r["n"] for r in up.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    n_extra = 0
    for i in range(2000):
        u = int(hashlib.md5(f"{i}:7".encode()).hexdigest()[:8], 16) / float(1 << 32)
        want = 1 + (1 if u < 0.4 else 0)
        assert per[i] == want, i
        n_extra += want - 1
    # E[copies] = 1.4 exactly; the realized count concentrates around it
    assert abs(n_extra / 2000 - 0.4) < 0.05


def test_upsample_zero_factor_drops_and_guard_raises(spark):
    from tstore_spark.operators.sampling import upsample_mixture

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(100)}))
    fac = F.when(F.col("doc_id") < 50, F.lit(0.0)).otherwise(F.lit(1.0))
    up = upsample_mixture(df, "doc_id", fac)
    assert up.count() == 50
    assert up.agg(F.min("doc_id")).first()[0] == 50
    with pytest.raises(Exception, match="upsample_mixture"):
        upsample_mixture(df, "doc_id", 1000.0).count()
    with pytest.raises(Exception, match="upsample_mixture"):
        upsample_mixture(df, "doc_id", -0.5).count()
    # intended blow-ups opt in
    assert upsample_mixture(df, "doc_id", 200.0, max_factor=200.0).count() == 20000


def test_upsample_deterministic_across_parallelism(spark):
    from tstore_spark.operators.sampling import upsample_mixture

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(1000)}))
    a = upsample_mixture(df.repartition(1), "doc_id", 2.3)
    b = upsample_mixture(df.repartition(13), "doc_id", 2.3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


# ---------------------------------------------------------------- priority


def _priority_reference(weights: dict[int, float], k: int, seed: int = 42):
    """Straight-line Duffield-Lund-Thorup priority sampling."""
    qs = []
    for i, w in weights.items():
        if w <= 0:
            continue
        u = int(hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8], 16) / float(1 << 32)
        qs.append((w / u, i, w))
    qs.sort(key=lambda t: (-t[0], t[1]))
    top = qs[:k]
    tau = qs[k][0] if len(qs) > k else 0.0
    return {i: (w, q, max(w, tau)) for q, i, w in top}


def test_priority_sample_matches_reference(spark):
    from tstore_spark.operators.sampling import priority_sample

    import numpy as np

    rng = np.random.RandomState(3)
    weights = {i: float(w) for i, w in enumerate(rng.randint(1, 1000, size=500))}
    df = spark.createDataFrame(pd.DataFrame({"doc_id": list(weights), "w": list(weights.values())}))
    got = {r["doc_id"]: (r["weight"], r["priority"], r["est_w"]) for r in priority_sample(df, "doc_id", "w", k=40).collect()}
    want = _priority_reference(weights, 40)
    assert set(got) == set(want)
    for i in got:
        assert got[i] == want[i], i


def test_priority_sample_ht_estimator_unbiased_shape(spark):
    from tstore_spark.operators.sampling import priority_sample

    # per Duffield et al., sum(est_w) estimates sum(w); with k = n/2 over a
    # mild weight spread the relative error stays small
    weights = {i: 1.0 + (i % 7) for i in range(400)}
    df = spark.createDataFrame(pd.DataFrame({"doc_id": list(weights), "w": list(weights.values())}))
    est = priority_sample(df, "doc_id", "w", k=200).agg(F.sum("est_w")).first()[0]
    true = sum(weights.values())
    assert abs(est - true) / true < 0.2


def test_priority_sample_small_population_keeps_all(spark):
    from tstore_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(10), "w": [5.0] * 10}))
    rows = priority_sample(df, "doc_id", "w", k=25).collect()
    assert len(rows) == 10
    assert all(r["est_w"] == 5.0 for r in rows)
    # zero/negative weights never sampled
    df2 = spark.createDataFrame(pd.DataFrame({"doc_id": range(4), "w": [1.0, 0.0, -3.0, 2.0]}))
    got = {r["doc_id"] for r in priority_sample(df2, "doc_id", "w", k=10).collect()}
    assert got == {0, 3}
    with pytest.raises(ValueError):
        priority_sample(df, "doc_id", "w", k=0)


def test_priority_sample_deterministic_across_parallelism(spark):
    from tstore_spark.operators.sampling import priority_sample

    df = spark.createDataFrame(pd.DataFrame({"doc_id": range(800), "w": [float(1 + i % 13) for i in range(800)]}))
    a = priority_sample(df.repartition(1), "doc_id", "w", k=50).collect()
    b = priority_sample(df.repartition(17), "doc_id", "w", k=50).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_priority_sample_selection_plans_takeordered(spark):
    # the selection that runs inside priority_sample's checkpoint pin:
    # orderBy + limit over the priority projection plans as a distributed
    # TakeOrderedAndProject (per-partition heaps + one k-sized merge) —
    # never a global Sort/Exchange of the population
    from tstore_spark.operators.sampling import hash_uniform

    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).cast("double").alias("w")
    )
    ranked = (
        df.select("doc_id", (F.col("w") / hash_uniform("doc_id")).alias("priority"))
        .orderBy(F.col("priority").desc(), F.col("doc_id").asc())
        .limit(41)
    )
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Exchange" not in plan, plan


def _priority_group_reference(rows, k, seed=42):
    """Straight-line per-group DLT: rows = [(g, i, w)]."""
    out = {}
    for g in {r[0] for r in rows}:
        weights = {i: w for gg, i, w in rows if gg == g}
        out[g] = _priority_reference(weights, k, seed)
    return out


def test_priority_sample_per_group_matches_reference(spark):
    from tstore_spark.operators.sampling import priority_sample_per_group

    import numpy as np

    rng = np.random.RandomState(7)
    rows = [
        (f"g{i % 5}", i, float(w))
        for i, w in enumerate(rng.randint(1, 500, size=600))
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "doc_id", "w"]))
    got = {}
    for r in priority_sample_per_group(df, "g", "doc_id", "w", k=15).collect():
        got.setdefault(r["g"], {})[r["doc_id"]] = (
            r["weight"], r["priority"], r["est_w"])
    want = _priority_group_reference(rows, 15)
    assert {g: set(v) for g, v in got.items()} == {
        g: set(v) for g, v in want.items()}
    for g in want:
        for i in want[g]:
            assert got[g][i] == want[g][i], (g, i)


def test_priority_sample_per_group_small_groups_keep_all(spark):
    from tstore_spark.operators.sampling import priority_sample_per_group

    rows = [("a", 0, 2.0), ("a", 1, 3.0), ("b", 2, 0.0), ("b", 3, 4.0)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "doc_id", "w"]))
    out = priority_sample_per_group(df, "g", "doc_id", "w", k=10).collect()
    got = {(r["g"], r["doc_id"]): r["est_w"] for r in out}
    # under-budget groups keep every positive row at its true weight
    assert got == {("a", 0): 2.0, ("a", 1): 3.0, ("b", 3): 4.0}
    with pytest.raises(ValueError):
        priority_sample_per_group(df, "g", "doc_id", "w", k=0)


def test_priority_sample_per_group_plans_group_limit(spark):
    from tstore_spark.operators.sampling import priority_sample_per_group

    df = spark.createDataFrame(pd.DataFrame({
        "g": [f"g{i % 4}" for i in range(400)],
        "doc_id": range(400),
        "w": [float(1 + i % 9) for i in range(400)],
    }))
    out = priority_sample_per_group(df, "g", "doc_id", "w", k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # rank-limit pushdown: per-partition heaps bound the exchange payload
    assert "WindowGroupLimit" in plan
    # both windows (row_number + tau) share ONE group-hash Exchange
    import re
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1


def test_priority_sample_per_group_deterministic_across_parallelism(spark):
    from tstore_spark.operators.sampling import priority_sample_per_group

    df = spark.createDataFrame(pd.DataFrame({
        "g": [f"g{i % 3}" for i in range(900)],
        "doc_id": range(900),
        "w": [float(1 + i % 11) for i in range(900)],
    }))
    a = priority_sample_per_group(df.repartition(1), "g", "doc_id", "w", k=25).collect()
    b = priority_sample_per_group(df.repartition(13), "g", "doc_id", "w", k=25).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
