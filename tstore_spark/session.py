"""SparkSession factory.

Local-mode defaults tuned for the sandbox (local[32], 128 GiB) but every knob
is a parameter so the same factory serves ``spark-submit`` on a real cluster.
Design notes:

- AQE on (runtime re-plan, skew-join splitting) — backstop for the explicit
  salting in :mod:`tstore_spark.operators.skew`.
- Arrow enabled: all Python-side compute goes through vectorized pandas UDFs
  (the engine contains zero per-row Python UDFs).
- ``spark.sql.shuffle.partitions`` sized to cores by default; on a real
  cluster pass e.g. 2-3x total executor cores.
- Session timezone pinned to UTC so window/date_trunc semantics are
  reproducible regardless of host timezone.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "tstore_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    Parameters
    ----------
    master:
        e.g. ``local[8]``; default ``local[$SPARK_GRAFT_CPUS]`` (fallback 32).
        Ignored under spark-submit when a master is already set.
    shuffle_partitions:
        Defaults to the local core count (or 32). At 100 TB scale set this to
        ~2-3x total executor cores, or rely on AQE coalescing (enabled).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] -> 4N; local[*] / cluster masters -> 4*cpus. The 4x-cores
        # multiplier smooths stragglers under skew (Zipf domains: with one
        # task per core the slowest partition stalls its core for the whole
        # stage; finer tasks rebalance) — measured 15-19% faster on the 24M-doc
        # cascade at BOTH 2 and 8 cores, while AQE coalescing collapses the
        # extra partitions for small shuffles so tiny queries pay nothing.
        # 8x measured slower (task overhead beats the balance gain).
        inner = master[master.find("[") + 1 : master.rfind("]")] if "[" in master else ""
        shuffle_partitions = 4 * (int(inner) if inner.isdigit() else cpus)

    # AQE's byte-targeted coalescing can land on task counts just above the
    # core count (measured: the 24M-doc rollup's reduce stage coalesced to 11
    # partitions on 8 cores — a 1.4-wave stage leaves ~35% of the cores idle
    # in the tail wave). Floor the coalesce at 2x the parallelism so reduce
    # stages always pack into even waves; small shuffles still coalesce (the
    # floor is a minimum COUNT, not a minimum size).
    min_coalesced = max(2 * (shuffle_partitions // 4), 1)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(
            "spark.sql.adaptive.coalescePartitions.minPartitionNum",
            str(min_coalesced),
        )
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # benchmark hook: e.g. "-Xms20g -XX:+AlwaysPreTouch" preallocates the heap
    # so first-big-job heap growth isn't billed to a timed run (bench.py sets
    # this for the scaling subprocesses only; unset = Spark defaults)
    java_opts = os.environ.get("SPARK_GRAFT_JAVA_OPTS")
    if java_opts:
        builder = builder.config("spark.driver.extraJavaOptions", java_opts)
    # Iceberg seam: when the runtime jar is on the classpath (a real
    # deployment; never in this sandbox) bind the `tstore` catalog so
    # write_archive/open_archive route through real catalog tables. The
    # probe is filesystem-only — no Spark classes touched before getOrCreate.
    from tstore_spark.sources.iceberg_archive import catalog_conf, iceberg_jar_present

    if iceberg_jar_present():
        for k, v in catalog_conf().items():
            builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def stop_spark() -> None:
    """Stop the active session if any (used between parallelism levels in bench)."""
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
