"""Deterministic synthetic data generators (FIXTURES.md F1-F3).

Everything is a **counter-based pure function of (seed, index)** — no stateful
RNG — so the same logical row is generated bit-identically regardless of
partitioning, parallelism, or generation order. This is what lets the pandas
oracle, the Spark job at local[2], and the Spark job at local[32] all agree
byte-for-byte.

Two construction paths:
- :func:`pages_pandas` — driver-side pandas frame (tests, oracle input).
- :func:`pages_spark`  — distributed ``spark.range -> mapInPandas`` (bench
  scale; each url index generates its own crawl rows, so generation is
  embarrassingly parallel and shuffle-free).

Reference shape: the ``pages`` schema comes from BASELINE.json ``input_hint``;
the parity table mirrors the reference test fixture
(/root/reference/tstore/tests/conftest.py:24-72, 329-343: 4 ids x 48 hourly
points = 192 rows).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

SEED = 42
N_DOMAINS = 50
DOMAINS = [f"d{i:02d}.example.com" for i in range(N_DOMAINS)]
LANGS = ["en", "de", "fr", "es", "it", "pt", "nl", "ja", "zh", "ru"]
LANG_PROBS = np.array([0.50, 0.10, 0.08, 0.08, 0.06, 0.05, 0.04, 0.03, 0.03, 0.03])
BASE_TS = np.datetime64("2024-01-01T00:00:00", "s")
RANGE_SECONDS = 7 * 24 * 3600  # 2024-01-01 -> 2024-01-08

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"


# ---------------------------------------------------------------------------
# counter-based hashing (splitmix64), vectorized
# ---------------------------------------------------------------------------

def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    with np.errstate(over="ignore"):
        x += np.uint64(0x9E3779B97F4A7C15)
        z = x
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
    return z


def _uniform(idx: np.ndarray, stream: int, seed: int = SEED) -> np.ndarray:
    """Deterministic uniform [0,1) per (seed, stream, index)."""
    key = np.uint64(seed) * np.uint64(0x100000001B3) + np.uint64(stream)
    h = _splitmix64(idx.astype(np.uint64) ^ _splitmix64(np.full(len(idx), key, np.uint64)))
    return (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)


# ---------------------------------------------------------------------------
# shared deterministic pieces
# ---------------------------------------------------------------------------

def _zipf_cdf(s: float = 1.2, n: int = N_DOMAINS) -> np.ndarray:
    w = (np.arange(1, n + 1, dtype=np.float64)) ** (-s)
    w /= w.sum()
    return np.cumsum(w)


_ZIPF_CDF = _zipf_cdf()
_LANG_CDF = np.cumsum(LANG_PROBS / LANG_PROBS.sum())


def _build_corpus(seed: int = SEED) -> str:
    """A fixed ~240k-char corpus; text payloads are slices of it.

    Includes multibyte UTF-8 tokens so the byte-identity invariant is
    exercised on non-ASCII content (FIXTURES.md F1).
    """
    vocab = (
        "the quick brown fox jumps over lazy dog spark rollup window tier "
        "archive parquet iceberg bucket domain crawl page text bytes lang "
        "héllo wörld données naïve façade übermäßig 日本語テキスト 中文网页 "
        "русский текст ελληνικά čeština português ñandú smörgåsbord"
    ).split()
    idx = _splitmix64(np.arange(40_000, dtype=np.uint64) + np.uint64(seed * 7919)) % len(vocab)
    return " ".join(vocab[i] for i in idx)


_CORPUS = _build_corpus()
_CORPUS_LEN = len(_CORPUS)


def _crawl_counts(url_idx: np.ndarray, seed: int = SEED) -> np.ndarray:
    """~10% of urls get 2-5 crawls, the rest 1 (FIXTURES.md F1 invariant)."""
    u = _uniform(url_idx, stream=1, seed=seed)
    extra = _uniform(url_idx, stream=2, seed=seed)
    n = np.ones(len(url_idx), dtype=np.int64)
    hot = u < 0.10
    n[hot] = 2 + np.floor(extra[hot] * 4).astype(np.int64)  # 2..5
    return n


def _rows_for_url_indices(url_idx: np.ndarray, seed: int = SEED) -> pd.DataFrame:
    """Generate all crawl rows for the given url indices (vectorized)."""
    counts = _crawl_counts(url_idx, seed)
    rep_url = np.repeat(url_idx, counts)
    crawl_no = np.concatenate([np.arange(c) for c in counts]) if len(counts) else np.array([], np.int64)
    n_crawls = np.repeat(counts, counts)

    dom_i = np.searchsorted(_ZIPF_CDF, _uniform(rep_url, stream=3, seed=seed), side="right")
    domains = np.array(DOMAINS)[dom_i]
    urls = np.char.add(
        np.char.add(np.char.add("https://", domains), "/p"),
        np.char.mod("%010d", rep_url),
    )

    # j-th crawl lands in the j-th equal slice of the 7-day range -> timestamps
    # are distinct per url by construction (one crawl per slice).
    slice_len = RANGE_SECONDS / n_crawls
    u_ts = _uniform(rep_url * np.int64(7) + crawl_no, stream=4, seed=seed)
    offset = np.floor(crawl_no * slice_len + u_ts * (slice_len - 1)).astype(np.int64)
    warc_ts = BASE_TS + offset.astype("timedelta64[s]")

    # text: log-normal length, slice of the fixed corpus at a hashed offset.
    # Both depend only on rep_url -> byte-identical text per url across crawls.
    z = _uniform(rep_url, stream=5, seed=seed)
    z2 = _uniform(rep_url, stream=6, seed=seed)
    # Box-Muller from two uniforms (deterministic normal)
    normal = np.sqrt(-2.0 * np.log(np.clip(z, 1e-12, None))) * np.cos(2 * np.pi * z2)
    length = np.clip(np.exp(6.0 + 1.0 * normal), 10, 50_000).astype(np.int64)
    max_off = _CORPUS_LEN - np.minimum(length, _CORPUS_LEN - 1) - 1
    off = np.floor(_uniform(rep_url, stream=7, seed=seed) * max_off).astype(np.int64)
    texts = [_CORPUS[o : o + l] for o, l in zip(off.tolist(), length.tolist())]

    lang_i = np.searchsorted(_LANG_CDF, _uniform(rep_url, stream=8, seed=seed), side="right")
    langs = np.array(LANGS)[np.minimum(lang_i, len(LANGS) - 1)]

    html = [b"<html><body>" + t.encode("utf-8") + b"</body></html>" for t in texts]

    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": pd.Series(warc_ts).astype("datetime64[us]"),
            "html": html,
            "text": texts,
            "lang": langs,
        }
    )


# ---------------------------------------------------------------------------
# public generators
# ---------------------------------------------------------------------------

def n_urls_for_rows(rows: int) -> int:
    """Expected crawls/url = 0.9*1 + 0.1*3.5 = 1.25."""
    return max(1, int(rows / 1.25))


def pages_pandas(rows: int = 10_000, seed: int = SEED) -> pd.DataFrame:
    """Driver-side deterministic pages frame (tests + pandas oracle input)."""
    idx = np.arange(n_urls_for_rows(rows), dtype=np.int64)
    df = _rows_for_url_indices(idx, seed)
    return df.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)


def pages_spark(spark, rows: int = 1_000_000, seed: int = SEED, parallelism: int | None = None):
    """Distributed generation: one url-index range, mapInPandas explodes crawls.

    Shuffle-free and order-independent: each url index produces its rows from
    pure hashes, so output content is identical at any parallelism.
    """
    n_urls = n_urls_for_rows(rows)
    parts = parallelism or spark.sparkContext.defaultParallelism
    rng = spark.range(0, n_urls, numPartitions=parts)

    def gen(batches):
        for pdf in batches:
            if len(pdf):
                yield _rows_for_url_indices(pdf["id"].to_numpy(np.int64), seed)

    return rng.mapInPandas(gen, schema=PAGES_SCHEMA)


def attrs_pandas(seed: int = SEED) -> pd.DataFrame:
    """F2 attrs dimension: one row per domain, WKB point geometry slot."""
    idx = np.arange(N_DOMAINS, dtype=np.int64)
    lon = _uniform(idx, stream=20, seed=seed) * 360.0 - 180.0
    lat = _uniform(idx, stream=21, seed=seed) * 180.0 - 90.0
    wkb = [
        struct.pack("<BIdd", 1, 1, lo, la)  # little-endian WKB Point
        for lo, la in zip(lon, lat)
    ]
    return pd.DataFrame(
        {
            "domain": DOMAINS,
            "static_var1": [chr(ord("A") + (i % 26)) for i in range(N_DOMAINS)],
            "static_var2": idx.astype(np.float64),
            "geometry_wkb": wkb,
        }
    )


def tstore_parity_pandas(seed: int = SEED) -> pd.DataFrame:
    """F3: reference-shaped long table — 4 ids x 48 hourly points = 192 rows.

    Mirrors /root/reference/tstore/tests/conftest.py:42-72 semantics
    (var1 str, var2 int, var3/var4 float, statics per id).
    """
    ids = [str(i) for i in range(1, 5)]
    times = pd.date_range("2000-01-01", periods=48, freq="1h")
    rows = []
    for k, i in enumerate(ids):
        gidx = np.arange(48, dtype=np.int64) + k * 48
        var1 = np.array(["x", "y", "z"])[
            (np.searchsorted(np.array([0.33, 0.66, 1.01]), _uniform(gidx, 30, seed)))
        ]
        var2 = np.floor(_uniform(gidx, 31, seed) * 100).astype(np.int64)
        var3 = _uniform(gidx, 32, seed) * 10.0
        var4 = _uniform(gidx, 33, seed) * 100.0
        rows.append(
            pd.DataFrame(
                {
                    "tstore_id": i,
                    "time": times,
                    "var1": var1,
                    "var2": var2,
                    "var3": var3,
                    "var4": var4,
                    "static_var1": chr(ord("A") + k),
                    "static_var2": float(k + 1),
                }
            )
        )
    out = pd.concat(rows, ignore_index=True)
    out["time"] = out["time"].astype("datetime64[us]")
    return out
