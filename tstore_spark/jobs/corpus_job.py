"""spark-submit entrypoint for the training-corpus preparation pipeline.

The end-to-end admission flow a pretraining data team runs over a crawled
documents table:

    1. corpus_filter  — dedup (exact, first copy wins) + language gate +
                        quality floor + length window, one plan
                        (operators/corpus.py)
    2. repetition gate — Gopher-style signals (functions/text.py):
                        dup-line fraction, top-bigram dominance, token runs
    3. near-dup prune — MinHash/LSH pairs above the Jaccard threshold;
                        the higher doc id of each verified pair is dropped
                        (operators/dedup.py)
    4. split          — deterministic content-hash train/eval assignment
                        (operators/sampling.py)
    5. write          — parquet partitioned by split

Cluster launch:

    spark-submit --py-files dist/tstore_spark.zip jobs/corpus_job.py \\
        --input <documents parquet: doc_id, text, ...> --output <dir> \\
        [--min-quality 0.3] [--near-dup-threshold 0.85] [--eval-frac 0.05]

Local smoke:

    python jobs/corpus_job.py --input /root/testdata/sf0.001/documents.parquet \\
        --output /tmp/corpus_out
"""

from __future__ import annotations

import argparse
import json



def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="documents parquet (doc_id, text)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.3)
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=100_000)
    ap.add_argument("--max-dup-line-frac", type=float, default=0.3)
    ap.add_argument("--max-top-bigram-frac", type=float, default=0.2)
    ap.add_argument("--near-dup-threshold", type=float, default=0.85)
    ap.add_argument("--eval-frac", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from tstore_spark.functions import text as TX
    from tstore_spark.operators.corpus import corpus_filter
    from tstore_spark.operators.dedup import minhash_near_dup_pairs
    from tstore_spark.operators.sampling import deterministic_split
    from tstore_spark.session import get_spark

    spark = get_spark(app_name="tstore-corpus")
    docs = spark.read.parquet(args.input)
    n_in = docs.count()

    # 1+2: stat/repetition gates + exact dedup, one scan over text
    admitted_ids = corpus_filter(
        docs,
        min_quality=args.min_quality,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
    ).select("doc_id")
    toks = TX.tokens("text")  # hoisted below: transforms reference it per element
    admitted = (
        docs.join(admitted_ids, "doc_id", "left_semi")
        .withColumn("_toks", toks)
        .where(
            (TX.dup_line_fraction("text") <= args.max_dup_line_frac)
            & (TX.top_bigram_fraction("text", toks=F.col("_toks")) <= args.max_top_bigram_frac)
        )
        .drop("_toks")
    )

    # 3: near-dup prune — verified pairs only; keep the lower doc id
    pairs = minhash_near_dup_pairs(admitted, threshold=args.near_dup_threshold, bands=16)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    pruned = admitted.join(losers, "doc_id", "left_anti")

    # 4+5: deterministic split, partitioned write
    out = deterministic_split(
        pruned, "doc_id", {"train": 1.0 - args.eval_frac, "eval": args.eval_frac},
        seed=args.seed,
    )
    out.write.mode("overwrite").partitionBy("split").parquet(args.output)

    written = spark.read.parquet(args.output)
    summary = {
        "docs_in": n_in,
        "docs_out": written.count(),
        "by_split": {
            r["split"]: r["n"]
            for r in written.groupBy("split").agg(F.count("*").alias("n")).collect()
        },
    }
    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
