"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` (DuckDB) at the
given sf dir, compares row-count, schema width, and order-insensitive values
(columns sorted by name, rows sorted, values stringified with float rounding
guard). Usage: python tools/verify_entry.py [sf_dir] [--tz=ZONE]

--tz sets the Spark session timezone (e.g. --tz=America/New_York) — CLAUDE.md
requires re-verifying under a DST-observing non-UTC zone after any
time-related change; DuckDB side stays naive (NTZ semantics), so a pass
proves the engine's wall-clock handling is session-TZ independent.
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

import __spark_entry__ as E
from tstore_spark.session import get_spark

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(bool(v)).lower()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(tuple(norm_val(r[i]) for i in order) for r in rows)
    return out, [cols[i] for i in order]


def main(
    sf_dir: str,
    tz: str | None = None,
    only: list[str] | None = None,
    timed: bool = False,
) -> int:
    import time as _time

    spark = get_spark("verify_entry", master="local[8]")
    if tz:
        spark.conf.set("spark.sql.session.timeZone", tz)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = E.queries()
    if only:
        qs = {k: v for k, v in qs.items() if k in only}
    oracles = E.oracle_sql()
    failures = []
    timings: list[tuple[float, str]] = []
    for name, fn in qs.items():
        try:
            t0 = _time.time()
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
            timings.append((_time.time() - t0, name))
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            orc = con.execute(oracles[name])
            orows = orc.fetchall()
            ocols = [d[0] for d in orc.description]
        except Exception as ex:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {ex}")
            continue
        s_can, s_c = canon(srows, scols)
        o_can, o_c = canon(orows, ocols)
        if s_c != o_c:
            failures.append(name)
            print(f"FAIL {name}: columns spark={s_c} duck={o_c}")
            continue
        if len(s_can) != len(o_can):
            failures.append(name)
            print(f"FAIL {name}: rowcount spark={len(s_can)} duck={len(o_can)}")
            continue
        bad = [i for i, (a, b) in enumerate(zip(s_can, o_can)) if a != b]
        if bad:
            failures.append(name)
            print(f"FAIL {name}: {len(bad)}/{len(s_can)} rows differ; first:")
            i = bad[0]
            print(f"  cols : {s_c}")
            print(f"  spark: {s_can[i]}")
            print(f"  duck : {o_can[i]}")
        else:
            print(f"ok   {name}: {len(s_can)} rows match")
    spark.stop()
    if timed and timings:
        print("\nslowest (spark side, includes fixture setup):")
        for secs, name in sorted(timings, reverse=True)[:15]:
            print(f"  {secs:7.2f}s  {name}")
    print(f"\n{len(qs) - len(failures)}/{len(qs)} queries ok")
    return 1 if failures else 0


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    tzs = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--tz=")]
    onlys = [a.split("=", 1)[1] for a in sys.argv[1:] if a.startswith("--only=")]
    sys.exit(
        main(
            args[0] if args else "/root/testdata/sf0.001",
            tz=tzs[0] if tzs else None,
            only=onlys[0].split(",") if onlys else None,
            timed="--time" in sys.argv[1:],
        )
    )
