"""Gorilla compression: delta-of-delta timestamps + XOR float values.

Pure-numpy/bit-level codec (no external deps) implementing the scheme from
Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time Series Database"
(VLDB 2015), §4.1 (timestamps) and §4.1.2 (values):

- timestamps: header t0 (64-bit), then delta-of-delta with variable-length
  codes '0' | '10'+7b | '110'+9b | '1110'+12b | '1111'+64b
- values: first float verbatim (64-bit), then XOR with predecessor:
  '0' if identical; '10' + meaningful bits if they fit the previous
  leading/trailing window; '11' + 5-bit #leading + 6-bit length + bits

The Spark surface (:func:`compress_tier`) packs one chunk per
(domain, p_day) from a rollup tier inside ``applyInPandas`` — groups are
sorted by window_start before encoding, so chunks are byte-identical at any
parallelism. Decode round-trips exactly (asserted in tests).

Scale note: field extraction (deltas, XORs, leading/trailing-zero counts) is
vectorized numpy; only the final bit-packing walks points in Python. Chunks
are bounded (<=1440 points for the 1m tier per day), so per-task cost is flat.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int) -> None:
        self.acc = (self.acc << bits) | (value & ((1 << bits) - 1))
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nbits)) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read(self, bits: int) -> int:
        out = 0
        for _ in range(bits):
            byte = self.data[self.pos >> 3]
            out = (out << 1) | ((byte >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (0 -> 64)."""
    out = np.full(x.shape, 64, dtype=np.int64)
    nz = x != 0
    # float64 mantissa trick is lossy for >53 bits; use bit_length via log2 on parts
    hi = (x >> np.uint64(32)).astype(np.uint32)
    lo = (x & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    bl_hi = np.zeros(x.shape, np.int64)
    bl_lo = np.zeros(x.shape, np.int64)
    m = hi != 0
    bl_hi[m] = np.floor(np.log2(hi[m].astype(np.float64))).astype(np.int64) + 1
    m2 = (~m) & (lo != 0)
    bl_lo[m2] = np.floor(np.log2(lo[m2].astype(np.float64))).astype(np.int64) + 1
    out[nz] = np.where(m[nz], 64 - (bl_hi[nz] + 32), 64 - bl_lo[nz])
    return out


def _ctz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-trailing-zeros for uint64 (0 -> 64)."""
    lsb = x & (~x + np.uint64(1))
    return np.where(x == 0, 64, 64 - 1 - _clz64(lsb))


def encode(timestamps_us: np.ndarray, values: np.ndarray) -> bytes:
    """Encode parallel int64-µs timestamps + float64 values into one chunk."""
    ts = np.asarray(timestamps_us, dtype=np.int64)
    vals = np.asarray(values, dtype=np.float64)
    n = len(ts)
    assert len(vals) == n
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.getvalue()

    # ---- timestamps: vectorized dod computation, looped packing ----
    w.write(int(ts[0]) & ((1 << 64) - 1), 64)
    if n > 1:
        deltas = np.diff(ts)
        dod = np.diff(deltas, prepend=deltas[0] - 0)  # dod[0] = delta0 - 0
        dod[0] = deltas[0]  # first delta stored as dod vs 0
        for d in dod.tolist():
            if d == 0:
                w.write(0, 1)
            elif -63 <= d <= 64:
                w.write(0b10, 2)
                w.write(d + 63, 7)
            elif -255 <= d <= 256:
                w.write(0b110, 3)
                w.write(d + 255, 9)
            elif -2047 <= d <= 2048:
                w.write(0b1110, 4)
                w.write(d + 2047, 12)
            else:
                w.write(0b1111, 4)
                w.write(int(d) & ((1 << 64) - 1), 64)

    # ---- values: vectorized XOR + lz/tz, looped packing ----
    bits = vals.view(np.uint64)
    w.write(int(bits[0]), 64)
    if n > 1:
        xors = bits[1:] ^ bits[:-1]
        lz = np.minimum(_clz64(xors), 31)  # 5-bit field
        tz = _ctz64(xors)
        prev_lz, prev_tz = 65, 65  # invalid -> first nonzero xor uses control '11'
        for x, l, t in zip(xors.tolist(), lz.tolist(), tz.tolist()):
            if x == 0:
                w.write(0, 1)
                continue
            if prev_lz <= 64 and l >= prev_lz and t >= prev_tz:
                w.write(0b10, 2)
                mbits = 64 - prev_lz - prev_tz
                w.write(x >> prev_tz, mbits)
            else:
                w.write(0b11, 2)
                mbits = 64 - l - t
                w.write(l, 5)
                w.write(mbits & 0x3F, 6)  # mbits in 1..64; 64 wraps to 0 (decoded back as 64)
                w.write(x >> t, mbits)
                prev_lz, prev_tz = l, t
    return w.getvalue()


def decode(chunk: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode a chunk back to (timestamps_us int64, values float64)."""
    r = _BitReader(chunk)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.float64)
    if n == 0:
        return ts, vals

    ts[0] = _signed(r.read(64), 64)
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = _signed(r.read(64), 64)
        delta += dod
        ts[i] = ts[i - 1] + delta

    bits = np.empty(n, dtype=np.uint64)
    bits[0] = r.read(64)
    prev_lz = prev_tz = 0
    for i in range(1, n):
        if r.read(1) == 0:
            bits[i] = bits[i - 1]
            continue
        if r.read(1) == 0:  # '10' reuse window
            mbits = 64 - prev_lz - prev_tz
            x = r.read(mbits) << prev_tz
        else:  # '11' new window
            prev_lz = r.read(5)
            mbits = r.read(6) or 64
            prev_tz = 64 - prev_lz - mbits
            x = r.read(mbits) << prev_tz
        bits[i] = bits[i - 1] ^ np.uint64(x)
    vals[:] = bits.view(np.float64)
    return ts, vals


def _signed(v: int, bits: int) -> int:
    return v - (1 << bits) if v >= (1 << (bits - 1)) else v


# ---------------------------------------------------------------------------
# Spark surface: one chunk per (key, day) from a rollup tier
# ---------------------------------------------------------------------------

CHUNK_SCHEMA = "domain string, p_day date, n_points int, chunk binary"


def compress_tier(
    tier_df: DataFrame,
    value_col: str = "doc_count",
    key: str = "domain",
    time_col: str = "window_start",
) -> DataFrame:
    """Pack each (domain, day)'s (window_start, value) series into one Gorilla
    chunk column. Sorts within the group first — deterministic bytes at any
    parallelism."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col, kind="mergesort")
        ts_us = pdf[time_col].astype("datetime64[us]").astype(np.int64).to_numpy()
        vals = pdf[value_col].astype(np.float64).to_numpy()
        return pd.DataFrame(
            {
                "domain": [pdf[key].iloc[0]],
                "p_day": [pdf["p_day"].iloc[0]],
                "n_points": [len(pdf)],
                "chunk": [encode(ts_us, vals)],
            }
        )

    with_day = tier_df.select(key, time_col, value_col).withColumn("p_day", F.to_date(time_col))
    return with_day.groupBy(key, "p_day").applyInPandas(pack, schema=CHUNK_SCHEMA)


def decompress_chunks(
    chunks_df: DataFrame, value_col: str = "doc_count", time_type: str = "timestamp"
) -> DataFrame:
    """Explode chunks back to (domain, window_start, value) rows — the read
    path proof that compression is lossless.

    ``time_type``: the timestamp family to decode into. Chunks store raw
    wall-clock microseconds (whatever :func:`compress_tier` saw in pandas);
    pass ``"timestamp_ntz"`` when the tier was NTZ so the round trip is pure
    wall-clock and independent of the session timezone."""

    def unpack(batches):
        for pdf in batches:
            frames = []
            for dom, blob in zip(pdf["domain"], pdf["chunk"]):
                ts, vals = decode(bytes(blob))
                frames.append(
                    pd.DataFrame(
                        {
                            "domain": dom,
                            "window_start": pd.to_datetime(ts, unit="us"),
                            value_col: vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    schema = f"domain string, window_start {time_type}, {value_col} double"
    return chunks_df.mapInPandas(unpack, schema=schema)


def chunk_stats(chunks_df: DataFrame) -> DataFrame:
    """Storage accounting per chunk, pure Catalyst (no decode): encoded
    bytes from ``octet_length(chunk)``, raw bytes as ``n_points * 16``
    (8 B timestamp + 8 B float64 per point — the columns the chunk
    replaces), and the compression ratio. One scan of chunk METADATA-sized
    columns; the blob itself is only measured, never shipped to Python."""
    enc = F.octet_length("chunk").cast("long")
    raw = (F.col("n_points") * 16).cast("long")
    return chunks_df.select(
        "domain",
        "p_day",
        "n_points",
        enc.alias("encoded_bytes"),
        raw.alias("raw_bytes"),
        (raw.cast("double") / enc).alias("ratio"),
    )


def chunk_stats_summary(chunks_df: DataFrame) -> dict:
    """Whole-table totals: ``{chunks, points, raw_bytes, encoded_bytes,
    ratio}`` — the compression evidence for BENCH.md."""
    r = chunk_stats(chunks_df).agg(
        F.count(F.lit(1)).alias("chunks"),
        F.sum("n_points").alias("points"),
        F.sum("raw_bytes").alias("raw"),
        F.sum("encoded_bytes").alias("enc"),
    ).head()
    return {
        "chunks": int(r["chunks"]),
        "points": int(r["points"]),
        "raw_bytes": int(r["raw"]),
        "encoded_bytes": int(r["enc"]),
        "ratio": float(r["raw"]) / float(r["enc"]),
    }
