"""MERGE INTO / upsert — copy-on-write partition rewrite for the archive.

The reference has no update path at all: an archive is written once per
(id, var) tree and corrections mean regenerating it (tstore/archive/io.py
only ever creates). A web-scale store ingests corrections continuously
(re-crawls, late data, metric restatements), so this module implements the
lakehouse MERGE semantics (Delta/Iceberg ``MERGE INTO t USING u ON key``,
matched -> update, unmatched -> insert) over the plain-Parquet layout:

1. Derive the update rows' partition values with the SAME transforms the
   ingest write uses (``p_day = days(time)``, ``p_bucket = bucket(N, id)``).
2. The affected-partition list is ``distinct (p_day, p_bucket)`` of the
   update batch — the ONLY thing collected to the driver, O(#touched
   partitions), never row data.
3. One distributed job reads ONLY the affected directories, anti-joins out
   rows whose (id, time) key appears in the batch, unions the batch back
   in, restores the (id, time) in-file clustering, and writes to a temp
   tree. Untouched partitions are never read, shuffled, or rewritten —
   merge cost is proportional to the touched slice, not the table.
4. The old -> new directory swap is metadata-only and done last (Iceberg
   analog: the snapshot commit; a crash before the swap leaves the archive
   unchanged, and the temp tree is rebuilt from scratch on retry).

Update batches must be key-unique on (id, time) — enforced, because
"last writer wins" inside one batch is order-dependent and would break
the repo's determinism-under-parallelism contract.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from tstore_spark.sources.archive import PAGES_DIR, fact_reader, read_metadata_all

_PART_COLS = ["p_day", "p_bucket"]


def merge_upsert(
    spark: SparkSession,
    base_dir: str,
    updates: DataFrame,
    table: str = PAGES_DIR,
) -> dict:
    """Upsert ``updates`` (fact-schema rows keyed by (id_var, time_var))
    into ``<base_dir>/<table>``; returns a summary dict."""
    d, num_buckets, meta = read_metadata_all(base_dir)
    root = os.path.join(base_dir, table)

    # normalize the id dtype to the stored one (wrap() casts ids to string).
    # fact_reader: on a schema-evolved archive a footer-inferred schema could
    # miss evolved columns, and the copy-on-write rewrite would then destroy
    # them in every touched partition. (fact_schema describes the pages
    # table only; tier tables keep the plain reader.)
    reader = fact_reader(spark, meta) if table == PAGES_DIR else spark.read
    stored = reader.parquet(root)
    fact_cols = [c for c in stored.columns if c not in _PART_COLS]
    missing = [c for c in fact_cols if c not in updates.columns]
    if missing:
        raise ValueError(f"updates missing fact columns {missing}")
    id_type = dict(stored.dtypes)[d.id_var]
    updates = updates.select(
        *[
            F.col(c).cast(id_type).alias(c) if c == d.id_var else F.col(c)
            for c in fact_cols
        ]
    )

    keys = [d.id_var, d.time_var]
    dup = updates.groupBy(*keys).count().where(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError("update batch has duplicate (id, time) keys — "
                         "last-writer-wins inside a batch is order-dependent; "
                         "pre-aggregate the batch to one row per key")

    from tstore_spark.sources.archive import bucket_expr_for_specs, bucket_specs

    # spec-aware: a row updating a pre-evolution day must target the bucket
    # that day's spec assigned, or the rewrite would miss the stored rows
    staged = updates.withColumn("p_day", F.to_date(F.col(d.time_var))).withColumn(
        "p_bucket", bucket_expr_for_specs(d.id_var, "p_day", bucket_specs(meta))
    )
    staged = staged.persist()
    try:
        affected = [
            (str(r["p_day"]), int(r["p_bucket"]))
            for r in staged.select(*_PART_COLS).distinct().collect()
        ]
        existing = [
            os.path.join(root, f"p_day={day}", f"p_bucket={b}")
            for day, b in affected
            if os.path.isdir(os.path.join(root, f"p_day={day}", f"p_bucket={b}"))
        ]
        obs = n_base = None
        if existing:
            base = reader.option("basePath", root).parquet(*existing)
            # n_updated rides the SINGLE rewrite pass: an Observation on the
            # anti-join output counts keepers during the write action itself
            # (no second scan of the touched partitions); base.count() is a
            # parquet-footer count (empty ReadSchema — no data pages read)
            from pyspark.sql import Observation

            n_base = base.count()
            obs = Observation()
            kept = base.join(staged.select(*keys), keys, "left_anti").observe(
                obs, F.count(F.lit(1)).alias("n_kept")
            )
            merged = kept.unionByName(staged)
        else:
            merged = staged

        tmp = root + ".merge__tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        (
            merged.repartition(*_PART_COLS)
            .sortWithinPartitions(*_PART_COLS, d.id_var, d.time_var)
            .write.mode("overwrite")
            .partitionBy(*_PART_COLS)
            .parquet(tmp)
        )
        n_updated = (n_base - int(obs.get["n_kept"])) if obs is not None else 0
    finally:
        staged.unpersist()

    for day, b in affected:
        rel = os.path.join(f"p_day={day}", f"p_bucket={b}")
        src, dst = os.path.join(tmp, rel), os.path.join(root, rel)
        shutil.rmtree(dst, ignore_errors=True)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        os.replace(src, dst)
    shutil.rmtree(tmp, ignore_errors=True)
    return {
        "partitions_touched": len(affected),
        "partitions_created": len(affected) - len(existing),
        "rows_updated": n_updated,
    }


def delete_where(
    spark: SparkSession,
    base_dir: str,
    predicate,
    table: str = PAGES_DIR,
) -> dict:
    """DELETE FROM <table> WHERE <predicate> — copy-on-write, scoped to the
    partitions that actually contain matches.

    One scan finds the distinct (p_day, p_bucket) values holding matching
    rows (partition columns only ride the aggregation — tiny); only those
    directories are re-read, filtered to the KEEPERS, rewritten, and
    swapped metadata-only. Partitions without matches are never rewritten.
    ``predicate`` is a Column or SQL string over the fact columns. Iceberg
    analog: DELETE WHERE with copy-on-write row filtering; its
    partition-level fast path (drop whole partitions when the predicate
    subsumes them) is apply_retention (sources/archive.py)."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    root = os.path.join(base_dir, table)

    d, _num_buckets, meta = read_metadata_all(base_dir)
    # see merge_upsert: evolved columns must survive the rewrite
    reader = fact_reader(spark, meta) if table == PAGES_DIR else spark.read
    stored = reader.option("basePath", root).parquet(root)
    affected = [
        (str(r["p_day"]), int(r["p_bucket"]))
        for r in stored.where(pred).select(*_PART_COLS).distinct().collect()
    ]
    if not affected:
        return {"partitions_touched": 0, "rows_deleted": 0}

    paths = [
        os.path.join(root, f"p_day={day}", f"p_bucket={b}") for day, b in affected
    ]
    base = reader.option("basePath", root).parquet(*paths)
    # n_deleted rides the single rewrite pass: the Observation counts keepers
    # during the write action (no extra scan); base.count() is a parquet-
    # footer count (empty ReadSchema — no data pages read)
    from pyspark.sql import Observation

    n_base = base.count()
    obs = Observation()
    kept = base.where(~F.coalesce(pred, F.lit(False))).observe(
        obs, F.count(F.lit(1)).alias("n_kept")
    )
    tmp = root + ".delete__tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        kept.repartition(*_PART_COLS)
        .sortWithinPartitions(*_PART_COLS, d.id_var, d.time_var)
        .write.mode("overwrite")
        .partitionBy(*_PART_COLS)
        .parquet(tmp)
    )
    n_deleted = n_base - int(obs.get["n_kept"])

    for day, b in affected:
        rel = os.path.join(f"p_day={day}", f"p_bucket={b}")
        src, dst = os.path.join(tmp, rel), os.path.join(root, rel)
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.isdir(src):
            os.replace(src, dst)
        # a partition whose every row matched has no keeper output: the
        # directory simply disappears (partition-level delete)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"partitions_touched": len(affected), "rows_deleted": n_deleted}
