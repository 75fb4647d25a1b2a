"""Posting-list compression — delta-gap varints in doc-id-range blocks.

The search layer's index (`operators/search.py`) is a flat ``(token,
doc_id, tf)`` table; Gorilla chunks (`operators/gorilla.py`) compress the
rollup tiers. This module closes the symmetric gap: cold posting lists
compress the same way real IR engines store them (Lucene/ES block
postings, the classic delta-gap + variable-byte scheme of Witten/Moffat/
Bell "Managing Gigabytes") — sorted doc ids become small gaps, gaps
become 1-2 byte varints, and a 16-byte (token, doc_id, tf) row shrinks
to ~2 bytes.

Scale shape (the part that must survive 100 TB):

* **Blocks are doc-id RANGES, not ranks** — ``block = floor(doc_id /
  block_span)``. A rank-based split (rows 0..4095 = block 0) needs a
  per-token ordered window, and a stopword's window is corpus-sized in
  ONE task — the exact single-row-bomb `build_inverted_index`'s
  docstring forbids. Range blocks need no window and no extra shuffle:
  the block id is a pure-codegen column, ``groupBy(token, block)`` is
  the module's single shuffle, and a stopword's postings spread over
  ``corpus_span / block_span`` independent tasks. Each block decodes
  independently (its first id is stored relative to the block base), so
  a range predicate on doc_id prunes whole blocks via the (min_doc,
  max_doc) columns without touching bytes — the skip-list read path.
* **Bytes are deterministic at any parallelism**: ids sort ascending
  inside the kernel, gaps and varints are pure functions of the sorted
  list, so chunk bytes are bit-identical however the shuffle lands
  (parcheck discipline).
* **The kernel is Arrow-batched** (`applyInPandas`), looping per posting
  like gorilla's packer — Python touches block-grain groups, never the
  corpus rows outside the kernel.

Encoding, per (token, block):

    varint(n) ·  varint(id[0] - block*span) · varint(gap_i - 1)...
              ·  varint(tf_i - 1)...

Gaps are ≥1 (ids are distinct within a token), tf ≥1, so the ``-1``
shift buys the one-byte encoding for the dominant gap=1 / tf=1 case.
Varints are LEB128 (little-endian 7-bit groups, high bit = continue).

Reference parity: the reference archives per-variable series as
columnar parquet (tstore/archive/partitions.py — layout, not codec);
this codec layer is graft surface with no reference counterpart, like
gorilla.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_BLOCK_SPAN = 4096

CHUNK_SCHEMA = (
    "token string, block bigint, n_docs int, min_doc bigint, "
    "max_doc bigint, n_bytes int, chunk binary"
)


# ---------------------------------------------------------------------------
# byte-level codec (pure functions of the sorted posting list)
# ---------------------------------------------------------------------------


def _varint_encode_into(out: bytearray, values) -> None:
    for v in values:
        v = int(v)
        if v < 0:
            raise ValueError(f"varint value must be non-negative, got {v}")
        while v >= 0x80:
            out.append((v & 0x7F) | 0x80)
            v >>= 7
        out.append(v)


def _varint_decode(data: bytes, pos: int, count: int) -> tuple[np.ndarray, int]:
    vals = np.empty(count, dtype=np.int64)
    for i in range(count):
        shift = 0
        acc = 0
        while True:
            b = data[pos]
            pos += 1
            acc |= (b & 0x7F) << shift
            if b < 0x80:
                break
            shift += 7
        vals[i] = acc
    return vals, pos


def encode_block(doc_ids: np.ndarray, tfs: np.ndarray, base: int) -> bytes:
    """Encode one block's sorted distinct doc ids + parallel tfs.

    ``base`` is the block's range start (``block * block_span``); the
    first id is stored as ``id - base`` so the block decodes without its
    neighbours.
    """
    ids = np.asarray(doc_ids, dtype=np.int64)
    tf = np.asarray(tfs, dtype=np.int64)
    n = len(ids)
    out = bytearray()
    _varint_encode_into(out, (n,))
    if n == 0:
        return bytes(out)
    gaps = np.diff(ids)
    if n > 1 and gaps.min() <= 0:
        raise ValueError("doc ids must be strictly increasing within a block")
    if tf.min() < 1:
        raise ValueError("tf must be >= 1")
    _varint_encode_into(out, (int(ids[0]) - base,))
    _varint_encode_into(out, (gaps - 1).tolist())
    _varint_encode_into(out, (tf - 1).tolist())
    return bytes(out)


def decode_block(data: bytes, base: int) -> tuple[np.ndarray, np.ndarray]:
    """Decode one block back to (doc_ids int64, tfs int64)."""
    (n,), pos = _varint_decode(data, 0, 1)
    n = int(n)
    if n == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    first, pos = _varint_decode(data, pos, 1)
    gaps, pos = _varint_decode(data, pos, n - 1)
    tfs, pos = _varint_decode(data, pos, n)
    ids = np.empty(n, dtype=np.int64)
    ids[0] = first[0] + base
    if n > 1:
        ids[1:] = gaps + 1
        ids = np.cumsum(ids)
    return ids, tfs + 1


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------


def _block_col(id_col: str, span: int):
    # Sign-safe floor to the block grid in pure BIGINT arithmetic: the
    # numerator is an exact multiple of span, so toward-zero `div` == floor
    # (the pmod idiom from operators/resample.py, exact past 2^53 where a
    # double divide is not).
    return F.expr(f"(({id_col} - pmod({id_col}, {span})) div {span})")


def compress_postings(
    index: DataFrame,
    id_col: str = "doc_id",
    tf_col: str = "tf",
    token_col: str = "token",
    block_span: int = DEFAULT_BLOCK_SPAN,
) -> DataFrame:
    """Pack an inverted index into per-(token, block) varint chunks.

    Input: the flat posting table from ``search.build_inverted_index``
    (``id_col`` must be integral — string keys dictionary-encode to a
    dense bigint first, the standard IR doc-id mapping). Output one row
    per (token, block) with decode-free pruning metadata (n_docs,
    min_doc, max_doc) alongside the bytes.
    """
    span = int(block_span)
    if span <= 0:
        raise ValueError("block_span must be positive")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__doc", kind="mergesort")
        ids = pdf["__doc"].to_numpy(dtype=np.int64)
        tfs = pdf["__tf"].to_numpy(dtype=np.int64)
        block = int(pdf["block"].iloc[0])
        chunk = encode_block(ids, tfs, block * span)
        return pd.DataFrame(
            {
                "token": [pdf["token"].iloc[0]],
                "block": [block],
                "n_docs": [len(ids)],
                "min_doc": [int(ids[0])],
                "max_doc": [int(ids[-1])],
                "n_bytes": [len(chunk)],
                "chunk": [chunk],
            }
        )

    flat = index.select(
        F.col(token_col).alias("token"),
        F.col(id_col).cast("bigint").alias("__doc"),
        F.col(tf_col).cast("bigint").alias("__tf"),
        _block_col(id_col, span).alias("block"),
    )
    return flat.groupBy("token", "block").applyInPandas(pack, schema=CHUNK_SCHEMA)


def decompress_postings(
    chunks: DataFrame, block_span: int = DEFAULT_BLOCK_SPAN
) -> DataFrame:
    """Explode chunks back to the flat ``(token, doc_id, tf)`` posting
    table — the lossless-loop proof, and the read path for cold terms."""
    span = int(block_span)

    def unpack(batches):
        for pdf in batches:
            toks: list[str] = []
            ids_parts: list[np.ndarray] = []
            tf_parts: list[np.ndarray] = []
            for token, block, chunk in zip(
                pdf["token"], pdf["block"], pdf["chunk"]
            ):
                ids, tfs = decode_block(bytes(chunk), int(block) * span)
                toks.extend([token] * len(ids))
                ids_parts.append(ids)
                tf_parts.append(tfs)
            if not ids_parts:
                yield pd.DataFrame({"token": [], "doc_id": [], "tf": []})
                continue
            yield pd.DataFrame(
                {
                    "token": toks,
                    "doc_id": np.concatenate(ids_parts),
                    "tf": np.concatenate(tf_parts),
                }
            )

    return chunks.select("token", "block", "chunk").mapInPandas(
        unpack, schema="token string, doc_id bigint, tf bigint"
    )


def postings_stats(chunks: DataFrame) -> DataFrame:
    """Per-token compression accounting from chunk metadata alone (no
    decode): blocks, postings, bytes, and the ratio vs the 16-byte raw
    (doc_id, tf) pair. Pure aggregation — usable at full index scale."""
    return chunks.groupBy("token").agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n_docs").alias("n_postings"),
        F.sum("n_bytes").alias("total_bytes"),
        (F.lit(16.0) * F.sum("n_docs") / F.sum("n_bytes")).alias("ratio_vs_raw16"),
    )
