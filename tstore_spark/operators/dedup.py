"""Deduplication operators for web-text corpora: exact, MinHash+LSH, SimHash,
and n-gram/token Jaccard verification.

Four tiers of the standard training-data dedup stack, each Spark-first:

- **exact**: hash-groupBy on a canonical fingerprint (md5 of normalized
  text). One shuffle on the hash, min-id wins — fully distributed.
- **MinHash + LSH**: word-shingles -> k minhashes (xxhash64 with k seeds,
  all JVM-side expressions) -> b bands of r rows -> band-hash equi-self-join
  -> candidate pairs -> exact Jaccard verify on the shingle sets. The classic
  Broder/LSH construction (cf. MMDS ch.3) with zero Python in the signature
  path.
- **SimHash**: 64-bit Charikar signature per document via a vectorized Arrow
  UDF (numpy bit-twiddling over stable blake2b token hashes), near-dup pairs
  by Hamming distance <= k using band-partitioned self-join (pigeonhole: any
  pair within distance k shares at least one of k+1 bands exactly).
- **Jaccard verify**: exact token/shingle Jaccard as a JVM expression
  (array_distinct / array_intersect sizes).

Scale notes (100 TB): the LSH self-join shuffles on (band_idx, band_hash) —
uniform by construction (hashes), so no skew; candidate verification touches
only the bucketed pairs, never the n^2 cross join. Signatures are ~k*8 bytes
per doc — a fraction of the text column. For byte-range dedup across crawls,
run per-day partitions first, then a cross-day pass over surviving pairs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from tstore_spark.functions.text import fingerprint, tokens

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (keep_id = min id, n_copies).

    The survivor set of exact dedup; anti-join the input against it on
    ``keep_id`` to drop duplicates.
    """
    return (
        df.select(F.col(id_col), fingerprint(text_col).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """The deduplicated table itself (first id per fingerprint survives)."""
    w = exact_dedup_groups(df, id_col, text_col).select(F.col("keep_id").alias(id_col))
    return df.join(w, id_col, "left_semi")


# ---------------------------------------------------------------------------
# shingles + exact Jaccard (JVM expressions)
# ---------------------------------------------------------------------------


def word_shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined), as an array column."""
    toks = tokens(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))),
            lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
        )
    )


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard of two (distinct-element) array columns."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return F.when(union == 0, F.lit(0.0)).otherwise(inter / union)


def token_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = "source",
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs token Jaccard within a blocking key (same-source pairs).

    Blocking bounds the quadratic term; for unblocked corpora use
    :func:`minhash_near_dup_pairs` instead.
    """
    # tokens are hashed to int64 once per doc BEFORE the pairwise join:
    # array_intersect/array_union over longs is markedly cheaper than over
    # strings, and the set sizes (hence Jaccard) are unchanged up to xxhash64
    # collisions within a doc pair's union (~10^2 tokens -> P(collision)
    # ~ 1e-14, negligible even at corpus scale since only per-pair unions
    # matter, never the global vocabulary)
    d = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.array_distinct(F.transform(tokens(text_col), lambda t: F.xxhash64(t))).alias("toks"),
    ).withColumn("n_toks", F.size("toks"))
    a = d.alias("a")
    b = d.alias("b")
    cond = F.col(f"a.{id_col}") < F.col(f"b.{id_col}")
    if block_col:
        cond = (F.col(f"a.{block_col}") == F.col(f"b.{block_col}")) & cond
    # length-ratio prefilter (implied by the threshold, so results are
    # unchanged): J(A,B) >= t forces t*|larger| <= |smaller| — evaluated on
    # two ints before the expensive array intersect/union
    cond = cond & (
        F.least(F.col("a.n_toks"), F.col("b.n_toks"))
        >= F.lit(threshold) * F.greatest(F.col("a.n_toks"), F.col("b.n_toks"))
    )
    return (
        a.join(b, cond)
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(jaccard(F.col("a.toks"), F.col("b.toks")), 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """Array of k minhashes: min over xxhash64(shingle, seed_j) per seed.

    xxhash64 is Spark's documented stable 64-bit hash; seeding with the hash
    index gives k independent permutation approximations, all JVM-side.
    """
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, j=j: F.xxhash64(s, F.lit(j))))
            for j in range(num_hashes)
        ]
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    sh = word_shingles(text_col, shingle_n)
    return df.select(
        F.col(id_col), sh.alias("shingles"), minhash_signature(sh, num_hashes).alias("sig")
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH candidate generation + exact Jaccard verification.

    bands*rows = num_hashes; with 8 bands of 4 the S-curve crosses ~0.5 at
    ~ (1/8)^(1/4) ≈ 0.59 — candidates below threshold are filtered by the
    exact verify step, so `threshold` is the real contract, LSH only prunes.
    """
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n).cache()

    # explode into (band_idx, band_hash) — band hash over the slice of the sig
    banded = sigs.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(*[F.col("sig")[bi * rows + r] for r in range(rows)]).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "b.band", "b.bh")

    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )

    sh = sigs.select(F.col(id_col), F.col("shingles"))
    verified = (
        cand.join(sh.withColumnRenamed(id_col, "id_a").withColumnRenamed("shingles", "sh_a"), "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b").withColumnRenamed("shingles", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return verified


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _stable_token_hash64(token: str) -> int:
    """Stable 64-bit token hash (blake2b) — independent of PYTHONHASHSEED."""
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "big")


@pandas_udf(LongType())
def _simhash64(texts: pd.Series) -> pd.Series:
    """64-bit Charikar SimHash per document (vectorized over the Arrow batch;
    per-doc work is a numpy popcount-style accumulation over token hashes)."""
    out = np.empty(len(texts), dtype=np.int64)
    masks = np.uint64(1) << np.arange(64, dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").lower().split()
        if not toks:
            out[i] = 0
            continue
        hs = np.fromiter(
            (_stable_token_hash64(tok) for tok in toks), dtype=np.uint64, count=len(toks)
        )
        # bit matrix: (n_tokens, 64) of {0,1}; weight +1/-1 sum per bit column
        bits = ((hs[:, None] & masks[None, :]) != 0).astype(np.int32)
        votes = bits.sum(axis=0) * 2 - len(toks)
        sig = np.uint64(0)
        for b in np.nonzero(votes > 0)[0]:
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig.astype(np.int64))
    return pd.Series(out)


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash int64) per document."""
    return df.select(F.col(id_col), _simhash64(F.col(text_col)).alias("simhash"))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs with Hamming(simhash) <= max_hamming via band self-join.

    Pigeonhole: split 64 bits into (max_hamming+1) bands; any pair within
    distance k matches at least one band exactly — the join is equi on
    (band_idx, band_bits), so Catalyst plans a hash join, never a cross join.
    """
    nb = max_hamming + 1
    width = 64 // nb
    sigs = simhash(df, id_col, text_col)

    banded = sigs.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), bi * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bits"),
                    )
                    for bi in range(nb)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", "b.band", "b.bits")

    cand = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bits") == F.col("y.bits"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= F.lit(max_hamming)
    )
