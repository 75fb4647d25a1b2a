"""spark-submit entrypoint for archive maintenance (lakehouse housekeeping).

One job, four subcommands — the operational loop a production archive runs
nightly (Iceberg analog in parentheses):

    spark-submit --py-files tstore_spark.zip jobs/maintenance_job.py \\
        --archive <base dir> snapshot                  # commit a version
        --archive <base dir> compact [--target-mb 128] [--cluster-by col,..]
                                     [--zorder-by col,col[,..]]
                                                       # OPTIMIZE / bin-pack
                                                       # (ZORDER BY variant)
        --archive <base dir> purge-deletes             # fold deletion
                                                       # vectors into files
        --archive <base dir> retention --keep-after YYYY-MM-DD
                                                       # DELETE + expire
        --archive <base dir> expire --keep-last N      # expire_snapshots

Every destructive step snapshots first (unless --no-snapshot), so any run
can be undone with sources/snapshots.rollback. Prints one JSON summary
line per step.

Local smoke: python jobs/maintenance_job.py --archive <dir> compact
"""

from __future__ import annotations

import argparse
import json
import sys



def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--archive", required=True, help="archive base dir")
    ap.add_argument("--table", default="pages")
    ap.add_argument("--no-snapshot", action="store_true",
                    help="skip the pre-maintenance snapshot commit")
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("snapshot")
    p_c = sub.add_parser("compact")
    p_c.add_argument("--target-mb", type=int, default=128)
    p_c.add_argument("--cluster-by", default=None, help="comma-separated columns")
    p_c.add_argument("--zorder-by", default=None,
                     help="comma-separated columns (>= 2) for z-order clustering")
    p_c.add_argument("--zorder-equi-depth", default=None,
                     help="'all' or a comma-separated subset of --zorder-by to "
                          "put on exact-percentile (equi-depth) grids — use for "
                          "skewed dimensions like text length")
    sub.add_parser("purge-deletes")
    p_r = sub.add_parser("retention")
    p_r.add_argument("--keep-after", required=True)
    p_e = sub.add_parser("expire")
    p_e.add_argument("--keep-last", type=int, default=2)
    args = ap.parse_args(argv)

    from tstore_spark.session import get_spark
    from tstore_spark.sources.archive import apply_retention
    from tstore_spark.sources.compact import compact_archive
    from tstore_spark.sources.deletion_vectors import has_pending_deletes, purge_deletes
    from tstore_spark.sources.snapshots import expire_snapshots, snapshot_commit

    out: dict = {"cmd": args.cmd, "archive": args.archive, "table": args.table}

    # argument-only validation FIRST: a rejected invocation must not leave
    # side effects (the pre-maintenance snapshot commit below)
    if args.cmd == "compact" and args.zorder_equi_depth and not args.zorder_by:
        raise SystemExit(
            "--zorder-equi-depth requires --zorder-by (otherwise the flag "
            "would be silently ignored and the layout unchanged)"
        )

    if args.cmd == "snapshot":
        out["version"] = snapshot_commit(args.archive, args.table)
        print(json.dumps(out))
        return 0

    if args.cmd == "expire":
        out["dropped_versions"] = expire_snapshots(
            args.archive, args.table, keep_last=args.keep_last
        )
        print(json.dumps(out))
        return 0

    if not args.no_snapshot:
        out["pre_snapshot"] = snapshot_commit(args.archive, args.table)

    if args.cmd == "purge-deletes":
        spark = get_spark(app_name="tstore-maintenance")
        out["summary"] = purge_deletes(spark, args.archive, table=args.table)
    elif args.cmd == "compact":
        spark = get_spark(app_name="tstore-maintenance")
        # the Iceberg sequencing rule: compaction rewrites files, so pending
        # positional tombstones MUST be folded in first or their deletes
        # would silently un-happen in the rewritten files
        if has_pending_deletes(args.archive, args.table):
            out["purged_deletes"] = purge_deletes(spark, args.archive, table=args.table)
        cluster = args.cluster_by.split(",") if args.cluster_by else None
        zorder = args.zorder_by.split(",") if args.zorder_by else None
        eq: bool | list[str] = False
        if args.zorder_equi_depth:
            eq = True if args.zorder_equi_depth == "all" else args.zorder_equi_depth.split(",")
        out["summary"] = compact_archive(
            spark,
            args.archive,
            table=args.table,
            target_file_bytes=args.target_mb * 1024 * 1024,
            cluster_by=cluster,
            zorder_by=zorder,
            zorder_equi_depth=eq,
        )
    elif args.cmd == "retention":
        out["dropped_partitions"] = apply_retention(
            args.archive, args.table, args.keep_after
        )
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
