"""Posting-list varint compression: codec exactness + Spark block surface."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from tstore_spark.operators.postings import (
    compress_postings,
    decode_block,
    decompress_postings,
    encode_block,
    postings_stats,
)
from tstore_spark.operators.search import build_inverted_index


# ---------------------------------------------------------------------------
# byte-level codec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "ids,tfs,base",
    [
        ([], [], 0),
        ([0], [1], 0),
        ([5, 6, 7], [1, 1, 1], 0),
        ([4096, 4097, 8000], [3, 1, 200], 4096),
        ([10**15, 10**15 + 1, 10**15 + 10**9], [1, 2, 3], 10**15 - (10**15 % 4096)),
        ([-8192, -8190, -4097], [1, 5, 1], -8192),
    ],
)
def test_block_roundtrip_vectors(ids, tfs, base):
    chunk = encode_block(np.array(ids, np.int64), np.array(tfs, np.int64), base)
    ids2, tfs2 = decode_block(chunk, base)
    assert ids2.tolist() == ids
    assert tfs2.tolist() == tfs


def test_block_roundtrip_randomized():
    rng = np.random.default_rng(7)
    for _ in range(50):
        n = int(rng.integers(1, 1000))
        ids = np.cumsum(rng.integers(1, 50, n)).astype(np.int64)
        tfs = rng.integers(1, 300, n).astype(np.int64)
        chunk = encode_block(ids, tfs, 0)
        ids2, tfs2 = decode_block(chunk, 0)
        assert np.array_equal(ids, ids2)
        assert np.array_equal(tfs, tfs2)


def test_dense_gap1_block_is_two_bytes_per_posting():
    # gap=1, tf=1 everywhere: 1 id byte + 1 tf byte per posting (+ header).
    n = 1000
    ids = np.arange(n, dtype=np.int64)
    tfs = np.ones(n, dtype=np.int64)
    chunk = encode_block(ids, tfs, 0)
    assert len(chunk) <= 2 * n + 4


def test_block_rejects_bad_input():
    with pytest.raises(ValueError):
        encode_block(np.array([3, 3], np.int64), np.array([1, 1], np.int64), 0)
    with pytest.raises(ValueError):
        encode_block(np.array([5, 4], np.int64), np.array([1, 1], np.int64), 0)
    with pytest.raises(ValueError):
        encode_block(np.array([1], np.int64), np.array([0], np.int64), 0)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def small_index(spark):
    docs = spark.createDataFrame(
        [
            (0, "alpha beta beta"),
            (1, "alpha gamma"),
            (4095, "alpha"),
            (4096, "alpha beta"),
            (9000, "alpha delta delta delta"),
            (-5, "alpha neg"),
        ],
        "doc_id long, text string",
    )
    return build_inverted_index(docs).cache()


def test_spark_roundtrip_exact(spark, small_index):
    chunks = compress_postings(small_index, block_span=4096)
    back = decompress_postings(chunks, block_span=4096)
    orig = {tuple(r) for r in small_index.collect()}
    got = {tuple(r) for r in back.collect()}
    assert got == orig


def test_blocks_split_on_doc_id_ranges(spark, small_index):
    chunks = compress_postings(small_index, block_span=4096)
    alpha = {
        r["block"]: r
        for r in chunks.where(F.col("token") == "alpha").collect()
    }
    # ids -5 | 0,1,4095 | 4096 | 9000 -> blocks -1, 0, 1, 2
    assert set(alpha) == {-1, 0, 1, 2}
    assert alpha[0]["n_docs"] == 3
    assert alpha[0]["min_doc"] == 0 and alpha[0]["max_doc"] == 4095
    assert alpha[-1]["min_doc"] == -5


def test_chunk_bytes_deterministic_across_parallelism(spark, small_index):
    one = (
        compress_postings(small_index.repartition(1), block_span=4096)
        .orderBy("token", "block")
        .collect()
    )
    many = (
        compress_postings(small_index.repartition(7), block_span=4096)
        .orderBy("token", "block")
        .collect()
    )
    assert [bytes(r["chunk"]) for r in one] == [bytes(r["chunk"]) for r in many]
    assert [tuple(r)[:6] for r in one] == [tuple(r)[:6] for r in many]


def test_stats_ratio(spark):
    docs = spark.createDataFrame(
        [(i, "common") for i in range(2000)], "doc_id long, text string"
    )
    idx = build_inverted_index(docs)
    stats = postings_stats(compress_postings(idx)).collect()
    assert len(stats) == 1
    row = stats[0]
    assert row["n_postings"] == 2000
    # dense gap-1 list: ~2 bytes/posting vs 16 raw -> ratio ~8
    assert row["ratio_vs_raw16"] > 6.0


def test_empty_index(spark):
    idx = spark.createDataFrame([], "token string, doc_id long, tf long")
    chunks = compress_postings(idx)
    assert chunks.count() == 0
    assert decompress_postings(chunks).count() == 0
