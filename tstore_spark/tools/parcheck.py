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
import os
import sys
import time


def _stage_metrics(log_dir: str, t0_ms: float) -> list[dict]:
    """Per-stage task-metric totals from the Spark event log, stages submitted
    at/after t0_ms only (the timed window — warmup stages excluded).

    Reads SparkListenerStageCompleted accumulables (driver-side totals across
    the stage's tasks), so no per-task summation is needed. Used by bench.py
    to build the N-vs-4N per-stage CPU-inflation table that rides the
    artifact: whether the residual scaling gap is engine overhead or
    memory-path inflation must be checkable from the JSON alone."""
    import glob

    rows: list[dict] = []
    # Spark 4 rolling event log v2: <dir>/eventlog_v2_<appid>/events_*_<appid>
    paths = [
        p
        for p in glob.glob(os.path.join(log_dir, "**", "*"), recursive=True)
        if os.path.isfile(p) and os.path.basename(p).split("_")[0] in ("events", "eventlog", "local", "app")
    ]
    for path in paths:
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                if '"SparkListenerStageCompleted"' not in line:
                    continue
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                si = ev.get("Stage Info", {})
                sub = si.get("Submission Time")
                if sub is None or sub < t0_ms:
                    continue
                acc = {
                    a.get("Name"): a.get("Value")
                    for a in si.get("Accumulables", [])
                }

                def g(name: str) -> int:
                    v = acc.get("internal.metrics." + name, 0)
                    return int(v) if isinstance(v, (int, float)) else 0

                rows.append(
                    {
                        "stage_id": si.get("Stage ID"),
                        "attempt": si.get("Stage Attempt ID", 0),
                        "name": (si.get("Stage Name") or "")[:72],
                        "tasks": si.get("Number of Tasks"),
                        "wall_s": round(
                            (si.get("Completion Time", sub) - sub) / 1e3, 3
                        ),
                        "cpu_s": round(g("executorCpuTime") / 1e9, 3),
                        "run_s": round(g("executorRunTime") / 1e3, 3),
                        "input_mb": round(g("input.bytesRead") / 1e6, 1),
                        "sh_read_mb": round(
                            (
                                g("shuffle.read.localBytesRead")
                                + g("shuffle.read.remoteBytesRead")
                            )
                            / 1e6,
                            1,
                        ),
                        "sh_write_mb": round(g("shuffle.write.bytesWritten") / 1e6, 1),
                        "spill_mb": round(g("memoryBytesSpilled") / 1e6, 1),
                    }
                )
    rows.sort(key=lambda r: (r["stage_id"], r["attempt"]))
    return rows


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
    repeat: int = 1,
    stages: bool = False,
) -> dict:
    """Times the rollup cascade + digest at the given parallelism.

    input_path: read the pages table from parquet (the production shape:
    table scan -> tiers) instead of generating; rows is ignored then.
    gen_in_window=True instead times generation+rollup as one pipeline.
    Default: pre-materialize generated input in cache, time the rollup alone.
    repeat: number of timed samples from the SAME warmed process (bench
    pairs sample i across parallelism levels); "seconds" is the min,
    "samples_sec" carries all of them.
    """
    from tstore_spark.datagen import pages_spark
    from tstore_spark.operators.rollup import rollup_all_tiers, rollup_from_raw
    from tstore_spark.session import get_spark

    log_dir = None
    extra_conf = None
    if stages:
        import tempfile

        log_dir = tempfile.mkdtemp(prefix="parcheck_evlog_")
        extra_conf = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file:{log_dir}",
            "spark.eventLog.compress": "false",
        }
    spark = get_spark(
        app_name=f"parcheck-{master}", master=master, extra_conf=extra_conf
    )

    if tier == "substrate":
        # Scaling SUBSTRATE: a bare payload scan+sum (decompress html+text,
        # aggregate octet lengths — no rollup machinery). This is the floor
        # any scan-shaped job on this host inherits; the cascade's whole-job
        # efficiency should be read against it, not against 1.0.
        import glob

        from pyspark.sql import functions as F

        assert input_path is not None, "--substrate requires --input"
        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        warm = spark.read.parquet(files[0]) if files else pages_spark(spark, rows=2000)
        for _ in range(2):
            warm.agg(F.sum(F.octet_length("html")), F.sum(F.length("text"))).head()
        pages = spark.read.parquet(input_path)
        n = pages.count()
        samples = []
        row = None
        for _ in range(max(1, repeat)):
            t0 = time.time()
            row = pages.agg(
                F.sum(F.octet_length("html")).alias("hb"),
                F.sum(F.length("text")).alias("tl"),
                F.count(F.lit(1)).alias("n"),
            ).head()
            samples.append(round(time.time() - t0, 3))
        digest = hashlib.sha256(
            json.dumps([int(row["hb"]), int(row["tl"]), int(row["n"])]).encode()
        ).hexdigest()
        spark.stop()
        return {
            "digest": digest, "rows": n, "windows": {},
            "seconds": min(samples), "samples_sec": samples,
        }

    kw = {"bytes_col": "html_bytes", "len_col": "text_len"} if narrow else {}

    def build_tiers(src):
        return rollup_all_tiers(src, **kw) if tier == "all" else {tier: rollup_from_raw(src, tier, **kw)}

    # Warmup: run the identical pipeline shape so Python worker spawn +
    # whole-stage codegen + C2 JIT compilation happen outside the timed
    # window. We measure steady-state throughput (the north rule's scaling
    # metric), not first-job latency — at 10^12 docs warmup amortizes to
    # nothing. With a real input, warm on ONE of its files, twice (C2 needs
    # real volume; a tiny generated warmup leaves ~20% JIT residue in the
    # first timed sample — measured on the 24M-doc cascade).
    if input_path is not None:
        import glob

        files = sorted(glob.glob(os.path.join(input_path, "*.parquet")))
        warm, n_warm = (spark.read.parquet(files[0]), 2) if files else (pages_spark(spark, rows=2000), 1)
    else:
        warm, n_warm = pages_spark(spark, rows=2000), 1
    if narrow and "html_bytes" not in warm.columns:
        raise ValueError("--narrow needs an input written with html_bytes/text_len stat columns")
    for _ in range(n_warm):
        for _name, tdf in build_tiers(warm).items():
            _tier_digest(tdf)

    if input_path is not None:
        # deliberately NOT cached: the timed job is the production shape —
        # parquet table scan -> tiers. Columnar decode is parallel CPU work;
        # the OS page cache serves the bytes after the count() touches them.
        pages = spark.read.parquet(input_path)
        n = pages.count()  # footer-stats count; warms file metadata
    elif gen_in_window:
        pages = pages_spark(spark, rows=rows)
        n = rows
    else:
        pages = pages_spark(spark, rows=rows).cache()
        n = pages.count()  # materialize input outside the timed window

    samples: list[float] = []
    digests: dict = {}
    windows: dict = {}
    t_timed0_ms = time.time() * 1000  # stage filter: timed window only
    for _i in range(max(1, repeat)):
        t0 = time.time()
        if tier == "all":
            tiers = build_tiers(pages)
            # 1m feeds its own digest AND the 1h cascade (same shape as the
            # pipeline's tier writes) — cache to avoid recomputing the raw scan
            tiers["1m"] = tiers["1m"].cache()
            tiers["1h"] = tiers["1h"].cache()
        else:
            tiers = build_tiers(pages)
        d_run: dict = {}
        w_run: dict = {}
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
                d_run[r["tier"]], w_run[r["tier"]] = int(r["x"]), int(r["n"])
        else:
            for name, tdf in tiers.items():
                d_run[name], w_run[name] = _tier_digest(tdf)
        samples.append(round(time.time() - t0, 3))
        for tdf in tiers.values():
            tdf.unpersist(False)  # no-op on uncached tiers
        if digests and d_run != digests:
            raise AssertionError(f"digest drift across repeats: {digests} vs {d_run}")
        digests, windows = d_run, w_run

    digest = hashlib.sha256(json.dumps(digests, sort_keys=True).encode()).hexdigest()
    spark.stop()
    out = {
        "digest": digest, "rows": n, "windows": windows,
        "seconds": min(samples), "samples_sec": samples,
    }
    if stages and log_dir:
        import shutil

        out["stages"] = _stage_metrics(log_dir, t_timed0_ms)
        shutil.rmtree(log_dir, ignore_errors=True)
    return out


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    master = args[0]
    rows = int(args[1])
    tier = args[2] if len(args) > 2 else "1h"
    gen_in_window = "--gen-in-window" in sys.argv
    narrow = "--narrow" in sys.argv
    fused = "--sequential-digest" not in sys.argv
    stages = "--stages" in sys.argv
    input_path = None
    repeat = 1
    for a in sys.argv[1:]:
        if a.startswith("--input="):
            input_path = a.split("=", 1)[1]
        elif a.startswith("--repeat="):
            repeat = int(a.split("=", 1)[1])
    print(json.dumps(run(master, rows, tier, gen_in_window, input_path, narrow, fused, repeat, stages)))
