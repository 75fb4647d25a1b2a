"""Streaming CDC apply: upsert a change stream into the archive.

The last missing streaming shape: continuous INGESTION INTO the lakehouse
(after rollup, dedup, sessionization and the stream-stream join). A change
stream (CDC feed, re-crawl drops) is applied to the pages table with
``foreachBatch`` -> :func:`~tstore_spark.sources.merge.merge_upsert` — the
standard Structured-Streaming MERGE pattern (Spark has no native streaming
sink with upsert semantics; Delta/Iceberg do exactly this under the hood).

Exactly-once effect, twice over:

* ``merge_upsert`` is IDEMPOTENT for a fixed batch (same keys + rows ->
  same table state), so foreachBatch's replay-last-batch-after-restart
  contract is already safe;
* a batch ledger (``<table>/_stream_merge/applied_<id>`` marker files,
  written AFTER the merge commits) additionally skips the replayed batch's
  rewrite work entirely — the Delta ``txn`` app-id pattern on plain files.

Within-batch collapse: a micro-batch may legitimately carry several
versions of one key. ``order_col`` picks last-writer-wins deterministically
(max ``order_col``, ties broken by a stable row hash so the survivor is a
total function of the DATA, never of partition order); without it,
duplicate keys in a batch raise (merge_upsert's posture). Batches apply in
ARRIVAL order — the sequential stream equals the global
:func:`upsert_twin` exactly when ``order_col`` is non-decreasing per key
across batches (the Kafka-compaction contract); an out-of-order feed needs
a conditional merge (compare stored ``order_col``) upstream.

Scale shape: each micro-batch touches only its own (p_day, p_bucket)
partitions via merge_upsert's copy-on-write rewrite; stream state is the
file-source offset log only (no aggregation state), so the query's memory
is O(batch), not O(stream).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tstore_spark.sources.archive import PAGES_DIR


def _ledger_dir(base_dir: str, table: str) -> str:
    # underscore-prefixed: invisible to Spark/Hive file discovery, so the
    # ledger can live inside the archive root without polluting any scan
    return os.path.join(base_dir, "_stream_merge", table)


def collapse_last_writer(
    updates: DataFrame, keys: list[str], order_col: str
) -> DataFrame:
    """One row per key: max ``order_col`` wins; remaining ties fall to the
    largest xxhash64 over every column (stable — a function of row CONTENT,
    so the collapse is bit-identical at any parallelism)."""
    tie = F.xxhash64(*[F.col(c) for c in updates.columns])
    w = Window.partitionBy(*keys).orderBy(
        F.col(order_col).desc(), tie.desc()
    )
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_stream_upserts(
    change_stream: DataFrame,
    base_dir: str,
    table: str = PAGES_DIR,
    checkpoint: str | None = None,
    order_col: str | None = None,
    trigger_available_now: bool = True,
):
    """Start a streaming query applying ``change_stream`` (fact-schema rows)
    to ``<base_dir>/<table>`` one micro-batch MERGE at a time. Returns the
    StreamingQuery; callers ``awaitTermination()``.

    ``checkpoint`` (default ``<base_dir>/<table>_stream_merge/checkpoint``)
    carries the source offsets — restart-resumable; the batch ledger makes
    the replayed batch a no-op. ``order_col`` enables deterministic
    last-writer-wins collapse inside each batch."""
    from tstore_spark.sources.merge import merge_upsert

    root = _ledger_dir(base_dir, table)
    checkpoint = checkpoint or os.path.join(root, "checkpoint")
    # markers are namespaced by the CHECKPOINT identity: batch ids restart
    # at 0 in a fresh checkpoint, and an un-namespaced ledger would then
    # silently skip the new stream's first batches
    import hashlib

    ledger = os.path.join(
        root, "ledger_" + hashlib.md5(os.path.abspath(checkpoint).encode()).hexdigest()[:12]
    )
    os.makedirs(ledger, exist_ok=True)

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(ledger, f"applied_{batch_id}")
        if os.path.exists(marker):
            return
        spark = batch_df.sparkSession
        updates = batch_df
        if order_col is not None:
            from tstore_spark.sources.archive import read_metadata_all

            d = read_metadata_all(base_dir)[0]
            updates = collapse_last_writer(
                updates, [d.id_var, d.time_var], order_col
            ).drop(order_col)
        if not updates.isEmpty():
            merge_upsert(spark, base_dir, updates, table=table)
        # marker AFTER the merge commits: a crash in between replays the
        # batch, which merge_upsert absorbs idempotently
        with open(marker, "w") as f:
            f.write("done")

    writer = change_stream.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def upsert_twin(
    spark: SparkSession,
    base: DataFrame,
    updates: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """The batch twin of the applied stream: final table state after
    last-writer-wins upserts — base rows not overwritten, plus the
    collapsed updates. Pure DataFrame algebra (one anti-join), usable as
    the oracle for any replay of the same changes."""
    if order_col is not None:
        updates = collapse_last_writer(updates, keys, order_col).drop(order_col)
    return base.join(updates.select(*keys), keys, "left_anti").unionByName(
        updates
    )
