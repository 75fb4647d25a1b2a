"""Dedup-stack stress at corpus scale: distributed synthetic docs with
PLANTED duplicates, exact expected answers, wall-clock timings.

    python -m tstore_spark.tools.dedup_stress [local[N]] [n_docs]

Generates n_docs documents entirely JVM-side (no Python in the generator):
each doc is ~100 tokens drawn from a 10k-word vocabulary by seeded hash
arithmetic (shingle universe 10^12 — realistic web-corpus sparsity; a tiny
vocabulary makes random docs share min-shingles and floods the band join
with collision candidates, which is a different, pathological regime).
Planted structure per 100-doc block:

- doc with id % 100 == 1 is a NEAR-dup of id-1 (same text + one extra token
  -> shingle Jaccard ~0.97)
- doc with id % 100 == 2 is an EXACT dup of id-2

So the ground truth is exact and countable: n_docs/100 exact-dup groups of
size 2, and n_docs/100 near-dup pairs (id-1, id) — plus the exact pairs,
which are also Jaccard-1 near-dup pairs. The run asserts:

- exact_dedup survivor count == n_docs - n_docs/100
- minhash near-dup pair count == 2 * (n_docs/100) + n_docs/100
  (pairs (k0,k2) J=1, (k0,k1) and (k1,k2) J~0.97 within each block)
- simhash(max_hamming=3, verify_jaccard=0.99) pair count == n_docs/100
  exactly: the identical-text pairs are hamming-0 candidates and J=1
  survivors; the one-extra-token pairs sit at J~0.97 and are filtered by
  the exact verify whether or not their signatures band-collide; random
  cross-doc pairs can never reach J >= 0.99. This leg drives the
  round-4 salted band self-join (adaptive per-bucket salt counts) at
  corpus scale.

and prints one JSON line with docs/sec per stage.

Round 5 adds the SUBSTRING-dedup leg (duplicate_spans / remove_duplicate_
spans — the one dedup family previously without a corpus-scale planted-truth
probe): a second synthetic corpus where every token is structurally unique
("d<doc>x<i>") EXCEPT a 20-token quote ("q<block>x<j>") planted verbatim in
docs block+10 (token offset 30) and block+11 (offset 50) of each 100-doc
block. Uniqueness-by-construction makes the expectation exact, not
probabilistic: duplicate_spans(n=10) must return EXACTLY one span per block
with coordinates (start_a=30, start_b=50, span_tokens=20), and
remove_duplicate_spans must rewrite EXACTLY the block+11 docs to their
quote-free token sequence (byte-checked) while every other document passes
through byte-identical (the archive invariant).
"""

from __future__ import annotations

import json
import sys
import time


def synth_documents(spark, n_docs: int, vocab_size: int = 10_000, doc_tokens: int = 100):
    """Deterministic planted-duplicate corpus, all Catalyst expressions."""
    from pyspark.sql import functions as F

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    # source id: dup rows re-generate their block head's text
    sid = F.when(F.col("doc_id") % 100 == 1, F.col("doc_id") - 1).when(
        F.col("doc_id") % 100 == 2, F.col("doc_id") - 2
    ).otherwise(F.col("doc_id"))
    body = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(doc_tokens)),
            lambda i: F.concat(
                F.lit("w"), F.pmod(F.xxhash64(sid, i), F.lit(vocab_size)).cast("string")
            ),
        ),
    )
    text = F.when(F.col("doc_id") % 100 == 1, F.concat(body, F.lit(" extratoken"))).otherwise(body)
    return df.select("doc_id", text.alias("text"))


def synth_span_documents(spark, n_docs: int, doc_tokens: int = 100, quote_tokens: int = 20):
    """Planted-quote corpus for the substring-dedup leg: every token unique
    by construction except the per-block quote — exact ground truth."""
    from pyspark.sql import functions as F

    df = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    blk = (F.col("doc_id") / 100).cast("long")
    r = F.col("doc_id") % 100
    is_q = (r == 10) | (r == 11)
    off = F.when(r == 10, F.lit(30)).otherwise(F.lit(50))
    toks = F.transform(
        F.sequence(F.lit(0), F.lit(doc_tokens - 1)),
        lambda i: F.when(
            is_q & (i >= off) & (i < off + quote_tokens),
            F.concat(F.lit("q"), blk.cast("string"), F.lit("x"), (i - off).cast("string")),
        ).otherwise(
            F.concat(F.lit("d"), F.col("doc_id").cast("string"), F.lit("x"), i.cast("string"))
        ),
    )
    return df.select("doc_id", F.concat_ws(" ", toks).alias("text"))


def run_span_leg(spark, n_docs: int) -> dict:
    """duplicate_spans + remove_duplicate_spans over the planted-quote corpus
    with exact coordinate and byte-identity assertions."""
    from pyspark.sql import functions as F

    from tstore_spark.operators.dedup import duplicate_spans, remove_duplicate_spans

    docs = synth_span_documents(spark, n_docs)
    n_blocks = n_docs // 100  # full blocks only; callers pass multiples of 100

    t0 = time.time()
    spans_df = duplicate_spans(docs, n=10)
    # the span set is block-bounded (one per 100-doc block) — collect it and
    # re-create, so the scrub pass cannot replay the posting join lineage
    got = spans_df.collect()
    t_spans = time.time() - t0
    n_exact = sum(
        1
        for r in got
        if r["doc_a"] % 100 == 10
        and r["doc_b"] == r["doc_a"] + 1
        and r["start_a"] == 30
        and r["start_b"] == 50
        and r["span_tokens"] == 20
    )
    assert len(got) == n_blocks and n_exact == n_blocks, (
        len(got), n_exact, n_blocks,
    )
    spans = spark.createDataFrame(got, spans_df.schema)

    t0 = time.time()
    scrubbed = remove_duplicate_spans(docs, spans=spans)
    # expected text per doc, built by the same structural rule: block+11 docs
    # lose tokens [50, 70); everyone else is byte-identical
    blk = (F.col("doc_id") / 100).cast("long")
    r = F.col("doc_id") % 100
    keep = F.filter(
        F.sequence(F.lit(0), F.lit(99)),
        lambda i: (r != 11) | (i < 50) | (i >= 70),
    )
    expect_tok = F.transform(
        keep,
        lambda i: F.when(
            (r == 10) & (i >= 30) & (i < 50),
            F.concat(F.lit("q"), blk.cast("string"), F.lit("x"), (i - 30).cast("string")),
        ).otherwise(
            F.concat(F.lit("d"), F.col("doc_id").cast("string"), F.lit("x"), i.cast("string"))
        ),
    )
    expected = docs.select("doc_id", F.col("text").alias("_orig")).select(
        "doc_id", "_orig", F.concat_ws(" ", expect_tok).alias("_want")
    )
    chk = (
        scrubbed.join(expected, "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("text") == F.col("_want"), 1).otherwise(0)).alias("n_ok"),
            F.sum(F.when(F.col("text") != F.col("_orig"), 1).otherwise(0)).alias("n_rewritten"),
        )
        .head()
    )
    t_scrub = time.time() - t0
    assert chk["n"] == n_docs and chk["n_ok"] == n_docs, (chk["n"], chk["n_ok"], n_docs)
    assert chk["n_rewritten"] == n_blocks, (chk["n_rewritten"], n_blocks)
    return {
        "spans_s": round(t_spans, 1),
        "spans_docs_per_sec": round(n_docs / t_spans),
        "spans_found": len(got),
        "span_scrub_s": round(t_scrub, 1),
        "span_scrub_docs_per_sec": round(n_docs / t_scrub),
        "span_rewritten_docs": int(chk["n_rewritten"]),
        "span_bytes_identical_elsewhere": True,
    }


def main(master: str = "local[16]", n_docs: int = 1_000_000) -> dict:
    from tstore_spark.operators.dedup import (
        exact_dedup,
        minhash_near_dup_pairs,
        simhash_near_dup_pairs,
    )
    from tstore_spark.operators.sampling import deterministic_split
    from tstore_spark.session import get_spark

    spark = get_spark(app_name="dedup-stress", master=master)
    docs = synth_documents(spark, n_docs)

    t0 = time.time()
    survivors = exact_dedup(docs).count()
    t_exact = time.time() - t0
    expect_survivors = n_docs - n_docs // 100
    assert survivors == expect_survivors, (survivors, expect_survivors)

    t0 = time.time()
    pairs = minhash_near_dup_pairs(docs, threshold=0.5, bands=16).count()
    t_minhash = time.time() - t0
    expect_pairs = 3 * (n_docs // 100)
    assert pairs == expect_pairs, (pairs, expect_pairs)

    t0 = time.time()
    sim_pairs = simhash_near_dup_pairs(
        docs, max_hamming=3, verify_jaccard=0.99
    ).count()
    t_simhash = time.time() - t0
    assert sim_pairs == n_docs // 100, (sim_pairs, n_docs // 100)

    t0 = time.time()
    split_counts = dict(
        deterministic_split(docs, "doc_id", {"train": 0.95, "eval": 0.05})
        .groupBy("split")
        .count()
        .collect()
    )
    t_split = time.time() - t0

    span_stats = run_span_leg(spark, n_docs)

    out = {
        "n_docs": n_docs,
        "exact_dedup_s": round(t_exact, 1),
        "exact_docs_per_sec": round(n_docs / t_exact),
        "minhash_s": round(t_minhash, 1),
        "minhash_docs_per_sec": round(n_docs / t_minhash),
        "minhash_pairs": pairs,
        "simhash_s": round(t_simhash, 1),
        "simhash_docs_per_sec": round(n_docs / t_simhash),
        "simhash_pairs": sim_pairs,
        "split_s": round(t_split, 1),
        "split_counts": {k: int(v) for k, v in split_counts.items()},
        **span_stats,
        "all_expected_counts_exact": True,
    }
    spark.stop()
    return out


if __name__ == "__main__":
    master = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    print(json.dumps(main(master, n)))
