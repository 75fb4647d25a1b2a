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


def run(master: str, rows: int, tier: str = "1h") -> dict:
    from tstore_spark.datagen import pages_spark
    from tstore_spark.operators.rollup import rollup_all_tiers, rollup_from_raw
    from tstore_spark.session import get_spark

    spark = get_spark(app_name=f"parcheck-{master}", master=master)
    pages = pages_spark(spark, rows=rows).cache()
    n = pages.count()  # materialize input outside the timed window

    t0 = time.time()
    if tier == "all":
        tiers = rollup_all_tiers(pages)
        pdfs = {k: v.toPandas() for k, v in tiers.items()}
        elapsed = time.time() - t0
        pdf = pdfs["1m"]
        windows = {k: len(v) for k, v in pdfs.items()}
    else:
        pdf = rollup_from_raw(pages, tier).toPandas()
        elapsed = time.time() - t0
        windows = {tier: len(pdf)}

    pdf = pdf.sort_values(["domain", "window_start"], kind="mergesort").reset_index(drop=True)
    canonical = pdf.drop(columns=["lang_set", "hist_lens", "hist_cnts"]).to_csv(
        index=False, float_format="%.17g"
    )
    digest = hashlib.sha256(canonical.encode("utf-8")).hexdigest()
    spark.stop()
    return {"digest": digest, "rows": n, "windows": windows, "seconds": round(elapsed, 3)}


if __name__ == "__main__":
    master = sys.argv[1]
    rows = int(sys.argv[2])
    tier = sys.argv[3] if len(sys.argv) > 3 else "1h"
    print(json.dumps(run(master, rows, tier)))
