"""spark-submit entrypoint for the rollup + retention pipeline.

Cluster launch (the north rule's deployment shape):

    spark-submit --py-files tstore_spark.zip jobs/rollup_job.py \\
        --input  <pages parquet/table path> \\
        --output <archive base dir> \\
        [--retain-after YYYY-MM-DD] [--gorilla] [--run-id ID]

Local smoke:

    python jobs/rollup_job.py --generate 100000 --output /tmp/rollup_out

The job is resumable: rerunning with the same input/output skips days whose
lineage fingerprint is unchanged (plans/lineage.py); a run killed mid-write
is healed by dynamic partition overwrite on retry (plans/pipeline.py).
"""

from __future__ import annotations

import argparse
import json
import sys



def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="pages parquet path (url, warc_ts, html, text, lang)")
    ap.add_argument("--generate", type=int, default=0, help="generate N synthetic rows instead of --input")
    ap.add_argument("--output", required=True, help="archive base dir (tiers + lineage + metrics)")
    ap.add_argument("--retain-after", help="drop tier partitions with p_day < this date (1m tier)")
    ap.add_argument("--gorilla", action="store_true", help="also write Gorilla chunks for the 1m tier")
    ap.add_argument("--run-id", default=None)
    args = ap.parse_args(argv)

    from tstore_spark.datagen import pages_spark
    from tstore_spark.operators.gorilla import compress_tier
    from tstore_spark.plans.pipeline import read_tier, run_rollup_pipeline
    from tstore_spark.session import get_spark
    from tstore_spark.sources.archive import apply_retention

    # under spark-submit the master/conf come from the launcher; get_spark
    # only fills in engine defaults (AQE, Arrow, UTC) it does not override
    spark = get_spark(app_name="tstore-rollup")

    if args.generate:
        pages = pages_spark(spark, rows=args.generate)
    elif args.input:
        pages = spark.read.parquet(args.input)
    else:
        ap.error("one of --input / --generate is required")

    summary = run_rollup_pipeline(spark, pages, args.output, run_id=args.run_id)

    if args.gorilla:
        chunks = compress_tier(read_tier(spark, args.output, "1m"))
        chunks.write.mode("overwrite").parquet(f"{args.output}/gorilla_1m")
        summary["gorilla_chunks"] = chunks.count()

    if args.retain_after:
        summary["retention_dropped"] = apply_retention(args.output, "rollup_1m", args.retain_after)

    print(json.dumps(summary))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
