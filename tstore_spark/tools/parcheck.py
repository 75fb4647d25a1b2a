"""Run the rollup at a given parallelism and print a canonical result digest.

Used by tests (byte-identity across local[2]/local[8]) and by bench.py
(throughput at N vs 4N cores -> scaling efficiency). Runs in its own process
so each invocation gets a fresh SparkContext with its own master.

Usage: python -m tstore_spark.tools.parcheck <master> <rows> [tier]
Prints one JSON line: {"digest": ..., "rows": ..., "windows": ..., "seconds": ...}
"""

from __future__ import annotations

import hashlib
import json
import sys
import time


def _row_hash():
    from pyspark.sql import functions as F

    return F.xxhash64(
        "domain",
        "window_start",
        "doc_count",
        "bytes_total",
        F.concat_ws(",", "lang_set"),
        F.col("lang_distinct"),
        F.format_string("%.17g", "text_len_p50"),
        F.format_string("%.17g", "text_len_p90"),
        F.format_string("%.17g", "text_len_p99"),
    )


def _tier_digest(tier_df):
    """Distributed order-independent digest of a tier: xxhash64 per window row
    (floats canonicalized to 17 significant digits) combined with bit_xor.
    Stays JVM-side — the digest must not serialize the result to the driver,
    or Amdahl's law turns the scaling measurement into a driver benchmark."""
    from pyspark.sql import functions as F

    row = tier_df.agg(
        F.bit_xor(_row_hash()).alias("x"), F.count(F.lit(1)).alias("n")
    ).head()
    return int(row["x"]), int(row["n"])


def run(
    master: str,
    rows: int,
    tier: str = "1h",
    gen_in_window: bool = False,
    input_path: str | None = None,
    narrow: bool = False,
    fused_digest: bool = True,
) -> dict:
    """Times the rollup cascade + digest at the given parallelism.

    input_path: read the pages table from parquet (the production shape:
    table scan -> tiers) instead of generating; rows is ignored then.
    gen_in_window=True instead times generation+rollup as one pipeline.
    Default: pre-materialize generated input in cache, time the rollup alone.
    """
    from tstore_spark.datagen import pages_spark
    from tstore_spark.operators.rollup import rollup_all_tiers, rollup_from_raw
    from tstore_spark.session import get_spark

    spark = get_spark(app_name=f"parcheck-{master}", master=master)

    # Warmup: run the identical pipeline shape at tiny scale so Python worker
    # spawn + whole-stage codegen compilation happen outside the timed window.
    # We measure steady-state throughput (the north rule's scaling metric),
    # not first-job latency.
    warm = pages_spark(spark, rows=2000)
    for name, tdf in (rollup_all_tiers(warm) if tier == "all" else {tier: rollup_from_raw(warm, tier)}).items():
        _tier_digest(tdf)

    if input_path is not None:
        # deliberately NOT cached: the timed job is the production shape —
        # parquet table scan -> tiers. Columnar decode is parallel CPU work;
        # the OS page cache serves the bytes after the count() touches them.
        pages = spark.read.parquet(input_path)
        n = pages.count()  # footer-stats count; warms file metadata
        if narrow:
            # ingest-time stat columns (archive stats_columns): the rollup
            # scans 4 narrow columns, Parquet prunes html/text entirely
            assert "html_bytes" in pages.columns and "text_len" in pages.columns, (
                "--narrow needs an input written with html_bytes/text_len stat columns"
            )
        t0 = time.time()
    elif gen_in_window:
        pages = pages_spark(spark, rows=rows)
        n = rows
        t0 = time.time()
    else:
        pages = pages_spark(spark, rows=rows).cache()
        n = pages.count()  # materialize input outside the timed window
        t0 = time.time()
    kw = {"bytes_col": "html_bytes", "len_col": "text_len"} if narrow else {}
    if tier == "all":
        tiers = rollup_all_tiers(pages, **kw)
        # 1m feeds its own digest AND the 1h cascade (same shape as the
        # pipeline's tier writes) — cache to avoid recomputing the raw scan
        tiers["1m"] = tiers["1m"].cache()
        tiers["1h"] = tiers["1h"].cache()
    else:
        tiers = {tier: rollup_from_raw(pages, tier, **kw)}
    digests = {}
    windows = {}
    if fused_digest and len(tiers) > 1:
        # ONE action for all tier digests (union of 1-row aggs): the three
        # sequential head() calls serialize on driver round-trips — fixed
        # cost that Amdahl charges disproportionately to the bigger cluster.
        # Same digests, same work, better pipelining (~12% at 8 cores).
        from functools import reduce

        from pyspark.sql import functions as F

        aggs = [
            tdf.agg(
                F.lit(name).alias("tier"),
                F.bit_xor(_row_hash()).alias("x"),
                F.count(F.lit(1)).alias("n"),
            )
            for name, tdf in tiers.items()
        ]
        for r in reduce(lambda a, b: a.unionByName(b), aggs).collect():
            digests[r["tier"]], windows[r["tier"]] = int(r["x"]), int(r["n"])
    else:
        for name, tdf in tiers.items():
            digests[name], windows[name] = _tier_digest(tdf)
    elapsed = time.time() - t0

    digest = hashlib.sha256(json.dumps(digests, sort_keys=True).encode()).hexdigest()
    spark.stop()
    return {"digest": digest, "rows": n, "windows": windows, "seconds": round(elapsed, 3)}


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    master = args[0]
    rows = int(args[1])
    tier = args[2] if len(args) > 2 else "1h"
    gen_in_window = "--gen-in-window" in sys.argv
    narrow = "--narrow" in sys.argv
    fused = "--sequential-digest" not in sys.argv
    input_path = None
    for a in sys.argv[1:]:
        if a.startswith("--input="):
            input_path = a.split("=", 1)[1]
    print(json.dumps(run(master, rows, tier, gen_in_window, input_path, narrow, fused)))
