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
        "all_expected_counts_exact": True,
    }
    spark.stop()
    return out


if __name__ == "__main__":
    master = sys.argv[1] if len(sys.argv) > 1 else "local[16]"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
    print(json.dumps(main(master, n)))
