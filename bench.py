"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR + scaling evidence.

Prints ONE JSON line:
  {"metric": "total_bench_seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, "scaling": {...}}

Phase 1 — headline queries from __spark_entry__ (a representative subset of
the operator inventory) on local[$SPARK_GRAFT_CPUS], each forced with the
noop sink (full JVM-side computation, no driver collect). A tiny warmup run
first so Python-worker spawn + codegen compilation are not billed to q1.

Phase 2 — the north rule's two-cluster-size evidence: the identical rollup
job (generate pages -> 1m/1h/1d cascade -> distributed digest) via
tools/parcheck subprocesses at N and 4N cores on the same input;
reports docs/sec at both and efficiency = thr_4N / (4 * thr_N). This host's
throughput cliffs above ~16 threads (shared box), so N=2 / 4N=8 by default.
Interleaved runs with min-time estimator (the host is noisy-neighbor noisy —
single-pair efficiency swings 0.6-0.8; BENCH.md carries the multi-round
evidence and per-phase analysis). Set SPARK_GRAFT_BENCH_SCALING=0 to skip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SCALING = os.environ.get("SPARK_GRAFT_BENCH_SCALING", "1") != "0"
# defaults sized so a full bench stays under ~7 minutes. 8M rows puts the
# measurement in the amortized regime (4M is fixed-cost-dominated and
# under-reads efficiency by ~0.1; see BENCH.md input-size sweep); the 12M/24M
# evidence runs are in BENCH.md (SPARK_GRAFT_BENCH_SCALE_ROWS to reproduce)
SCALE_ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_ROWS", "8000000"))
SCALE_N = int(os.environ.get("SPARK_GRAFT_BENCH_N", "2"))
SCALE_ROUNDS = int(os.environ.get("SPARK_GRAFT_BENCH_SCALE_ROUNDS", "2"))

#: headline subset (name -> callable from __spark_entry__.queries())
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "rollup_1m",
    "rollup_1h",
    "rollup_1d",
    "gap_fill_1h",
    "gorilla_roundtrip",
    "salted_agg_events",
    "dedup_exact",
    "doc_stats",
    "token_jaccard_pairs",
    "minhash_near_dup",
    "incremental_dedup",
    "token_packing",
    "decontaminate",
    "mixture_sample",
    "boilerplate_lines",
    "pii_redaction",
    "simhash_near_dup",
    "media_features",
    "geo_bbox",
    "cosine_topk",
    "ivf_topk",
    "embedding_near_dup",
    "asof_join",
    "hll_distinct_users",
    "binary_meta",
    "realtime_rollup_1h",
    "retention_cohorts",
    "funnel_steps",
    "range_aggregate",
]


def _force(df) -> None:
    """Force full computation without a driver-side collect."""
    df.write.format("noop").mode("overwrite").save()


def run_headline() -> dict[str, float]:
    import __spark_entry__ as E
    from tstore_spark.session import get_spark

    spark = get_spark(app_name="bench", master=f"local[{CPUS}]")
    qs = E.queries()

    # warmup: spin Python workers + compile codegen on a cheap query
    _force(qs["distinct_event_types"](spark, SF_DIR))
    _force(qs["rollup_1h"](spark, SF_DIR))

    out: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _force(qs[name](spark, SF_DIR))
        out[name] = round(time.time() - t0, 3)
    spark.stop()
    return out


def run_scaling() -> dict:
    import shutil
    import tempfile

    # N=2 vs 4N=8 by default: this host's effective throughput cliffs above
    # ~16 threads (shared box), so 2/8 keeps both levels in the linear region
    n = SCALE_N
    n4 = n * 4
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    here = os.path.dirname(os.path.abspath(__file__))

    # generate the shared input ONCE at full host parallelism — every
    # measured run then reads the same parquet (the production shape:
    # table scan -> tiers), so paired runs differ only in core count
    input_dir = tempfile.mkdtemp(prefix="bench_pages_")
    gen_code = (
        "from tstore_spark.session import get_spark\n"
        "from tstore_spark.datagen import pages_spark\n"
        f"s = get_spark('bench-gen', master='local[{CPUS}]')\n"
        f"pages_spark(s, rows={SCALE_ROWS}).repartition({CPUS}).write.mode('overwrite').parquet({input_dir!r})\n"
        "s.stop()\n"
    )
    gen = subprocess.run([sys.executable, "-c", gen_code], capture_output=True, text=True, env=env, cwd=here)
    if gen.returncode != 0:
        raise RuntimeError(f"bench input generation failed:\n{gen.stderr[-2000:]}")

    def one(master: str) -> dict:
        res = subprocess.run(
            [sys.executable, "-m", "tstore_spark.tools.parcheck", master, "0", "all",
             f"--input={input_dir}"],
            capture_output=True, text=True, env=env, cwd=here,
        )
        if res.returncode != 0:
            raise RuntimeError(f"parcheck {master} failed:\n{res.stderr[-2000:]}")
        return json.loads(res.stdout.strip().splitlines()[-1])

    runs: dict[str, list[dict]] = {f"local[{n}]": [], f"local[{n4}]": []}
    try:
        for _ in range(SCALE_ROUNDS):
            for m in (f"local[{n}]", f"local[{n4}]"):
                runs[m].append(one(m))
    finally:
        shutil.rmtree(input_dir, ignore_errors=True)

    best_n = min(r["seconds"] for r in runs[f"local[{n}]"])
    best_n4 = min(r["seconds"] for r in runs[f"local[{n4}]"])
    digests = {r["digest"] for rs in runs.values() for r in rs}
    rows = runs[f"local[{n}]"][0]["rows"]
    windows = runs[f"local[{n}]"][0]["windows"]
    points = sum(windows.values())
    # headline efficiency from PAIRED rounds: the two levels of one round run
    # back-to-back, so they see the same host conditions — pairing controls
    # for this box's noisy-neighbor drift. min-per-level reported alongside.
    pair_effs = [
        round((a["seconds"] / b["seconds"]) / 4, 3)
        for a, b in zip(runs[f"local[{n}]"], runs[f"local[{n4}]"])
    ]
    # headline estimator: MEDIAN of the paired rounds — max would cherry-pick
    # the best round from a noisy-host sample (per-round swings of 0.6-0.8
    # are routine on this box); min-based and per-round kept alongside
    med = sorted(pair_effs)
    median_eff = med[len(med) // 2] if len(med) % 2 else round((med[len(med) // 2 - 1] + med[len(med) // 2]) / 2, 3)
    return {
        "job": f"pages 1m/1h/1d rollup cascade over a {rows}-doc parquet table (tools/parcheck)",
        "n_cores": n,
        "n4_cores": n4,
        "samples_sec": {m: [r["seconds"] for r in rs] for m, rs in runs.items()},
        "seconds_n": best_n,
        "seconds_4n": best_n4,
        "docs_per_sec_n": round(rows / best_n),
        "docs_per_sec_4n": round(rows / best_n4),
        "points_per_sec_4n": round(points / best_n4),
        "efficiency": median_eff,
        "efficiency_max": max(pair_effs),
        "efficiency_per_round": pair_effs,
        "efficiency_min_based": round((rows / best_n4) / (4 * rows / best_n), 3),
        "deterministic_across_parallelism": len(digests) == 1,
        "rollup_points": windows,
    }


def main() -> None:
    t0 = time.time()
    queries = run_headline()
    scaling = run_scaling() if SCALING else None
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result = {
        "metric": "total_bench_seconds",
        "value": round(time.time() - t0, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else SF_DIR,
    }
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
