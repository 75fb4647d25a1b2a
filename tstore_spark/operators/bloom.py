"""Bloom filter — broadcastable "have we seen this item" membership sketch.

Cross-crawl ingest needs "is this url/fingerprint already in the corpus?"
at a scale where the exact answer is a join against 10^12 rows. A Bloom
filter answers "definitely new" / "maybe seen" from a FIXED m-bit state
with the one-sided guarantee that matters for dedup admission: **no false
negatives** — an item that was inserted always probes "maybe seen", so
"definitely new" is always safe to admit. (False positives only cost a
second-stage exact check on the small "maybe" slice.)

Spark-first shapes:

* build    — each item sets k = ``xxhash64(item, i) mod m`` bits; bits
  aggregate as ``bit_or`` into 64-bit words: an integer, order-independent,
  MERGEABLE reduction (two crawls' filters bit_or into exactly the filter
  of the union) with bounded state (m/64 rows), same contract as the
  HLL/CMS sketches.
* probe    — the sparse word table densifies into ONE ROW holding an
  ``array<long>`` of m/64 words (128 KiB at m = 2^20), cross-joined in as
  a broadcast; the k bit-tests are pure codegen expressions per row —
  zero shuffle, zero explode, the probe side streams.

Classic fp rate ~ (1 - e^{-kn/m})^k; size m ~ 10n bits for ~1% at k=5.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def bloom_build(
    df: DataFrame,
    item_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Sparse word table ``(word_idx long, bits long)`` — <= m/64 rows.
    Mergeable: union two builds and :func:`bloom_merge` them."""
    positions = F.array(
        *[F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(m_bits)) for i in range(k)]
    )
    cells = (
        df.select(F.explode(positions).alias("_pos"))
        .select(
            F.expr("_pos div 64").alias("word_idx"),
            F.expr("shiftleft(1L, CAST(pmod(_pos, 64) AS INT))").alias("_mask"),
        )
    )
    return cells.groupBy("word_idx").agg(F.bit_or("_mask").alias("bits"))


def bloom_merge(parts: DataFrame) -> DataFrame:
    """bit_or of unioned sparse tables == the filter of the unioned inputs
    (bitwise OR commutes; register-exact merge)."""
    return parts.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_dense(sparse: DataFrame, m_bits: int = DEFAULT_M_BITS) -> DataFrame:
    """One row: ``words array<long>`` of length m/64 (absent words = 0),
    ready to broadcast into a probe plan."""
    n_words = m_bits // 64
    m = sparse.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "bits"))).alias("_m")
    )
    return m.select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(F.element_at("_m", i.cast("long")), F.lit(0)),
        ).alias("words")
    )


def bloom_maybe_contains(
    dense: DataFrame,
    df: DataFrame,
    item_col: str,
    out_col: str = "bloom_maybe",
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> DataFrame:
    """``df`` + a boolean: all k probed bits set. Pure codegen over a
    broadcast single-row bitset — the probe side never shuffles.
    ``item_col`` must be a plain column name (it is spliced into a SQL
    bit-shift expression)."""
    probed = df.crossJoin(F.broadcast(dense))
    tests = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(m_bits))
        word = F.element_at("words", (pos / 64).cast("int") + F.lit(1))
        mask = F.expr(
            f"shiftleft(1L, CAST(pmod(pmod(xxhash64({item_col}, {i}), {m_bits}), 64) AS INT))"
        )
        tests.append(word.bitwiseAND(mask) != 0)
    return probed.withColumn(out_col, reduce(lambda a, b: a & b, tests)).drop("words")


def bloom_words(dense: DataFrame) -> list[int]:
    """Collect the dense bitset to the driver (m/64 longs — 128 KiB at
    m = 2^20): the form that embeds into a STREAMING plan, where a
    cross-join against a static DataFrame is not available as a stateless
    projection. Bounded by construction — this is sketch state, not data."""
    return list(dense.head()["words"])


def bloom_maybe_expr(
    words: list[int],
    item_col: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
) -> Column:
    """The k-bit membership test as a pure Column over a LITERAL bitset —
    usable identically in batch and Structured Streaming (stateless, no
    join at all). ``item_col`` must be a plain column name."""
    arr = F.lit(words)
    tests = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(F.col(item_col), F.lit(i)), F.lit(m_bits))
        word = F.element_at(arr, (pos / 64).cast("int") + F.lit(1))
        mask = F.expr(
            f"shiftleft(1L, CAST(pmod(pmod(xxhash64({item_col}, {i}), {m_bits}), 64) AS INT))"
        )
        tests.append(word.bitwiseAND(mask) != 0)
    return reduce(lambda a, b: a & b, tests)
