"""Interop with the reference ltelab/tstore on-disk layout.

The engine's native archive (:mod:`tstore_spark.sources.archive`) uses
Spark-friendly hidden partitioning; THIS module reads and writes the
reference library's own directory contract, so an existing tstore archive
can be opened directly and a Spark-written one opens in the reference:

    <base_dir>/tstore_metadata.yaml        # id_var, ts_variables (list),
                                           # partitioning {var: "year/month"},
                                           # tstore_structure "id-var"|"var-id"
    <base_dir>/_attributes.parquet         # one row per id (statics, geometry)
    <base_dir>/<id>/<var>/year=Y/month=M/part-*.parquet   # id-var
    <base_dir>/<var>/<id>/year=Y/month=M/part-*.parquet   # var-id

Layout spec: tstore/archive/io.py:28-48 (paths), metadata/writers.py:22-35 +
readers.py:13-25 (YAML schema), tslong/pandas.py:80-139 (per-id writer),
tslong/pyarrow.py:45-109 (reader, which hardcodes time_var="time"), golden
shape asserted in tstore/tests/test_tslong.py:286-320.

Spark-first read: ONE ``spark.read.parquet`` per ts variable over a glob of
all id directories — hive ``year=/month=`` partition discovery happens per
directory and the id comes back via ``input_file_name()`` (distributed; no
driver-side per-id loop, unlike the reference's glob+concat). Id filters
prune at the glob level (``{id1,id2}`` alternation → those directories are
never listed); time filters prune year/month partitions via an arithmetic
predicate on the partition columns before the row-level filter.

Spark-first write: one distributed ``partitionBy(id, year, month)`` job per
ts variable into a staging dir, then a driver-side rename pass strips the
hive ``<id_var>=`` prefix from the id level (the reference wants bare id
directory names). The rename is O(#ids) metadata operations — fine for
dimension-sized id domains; at web scale (millions of ids) keep the
engine-native layout and use this writer only for reference-facing exports.
"""

from __future__ import annotations

import os
import re
import shutil

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tstore_spark.functions.filters import time_range_filter
from tstore_spark.model.descriptor import TableDescriptor
from tstore_spark.model.tslong import TSLong

METADATA_YAML = "tstore_metadata.yaml"
ATTRIBUTES_FILE = "_attributes.parquet"
TIME_VAR = "time"  # the reference reader's hardcoded time column name

#: partition components the reference can emit (archive/partitions.py:14-49)
_PART_NAMES = ["year", "month", "day", "doy", "dow", "hh", "mm", "ss"]


# -- metadata (reference tstore/archive/metadata/{writers,readers}.py) --------

def read_reference_metadata(base_dir: str) -> dict:
    with open(os.path.join(base_dir, METADATA_YAML)) as f:
        return yaml.safe_load(f)


def write_reference_metadata(
    base_dir: str,
    id_var: str,
    ts_variables: list[str],
    partitioning: dict[str, str | None],
    tstore_structure: str = "id-var",
) -> None:
    meta = {
        "ts_variables": list(ts_variables),
        "id_var": id_var,
        "tstore_structure": tstore_structure,
        "partitioning": dict(partitioning),
    }
    with open(os.path.join(base_dir, METADATA_YAML), "w") as f:
        yaml.dump(meta, f)


def is_tstore(base_dir: str) -> bool:
    return os.path.isfile(os.path.join(base_dir, METADATA_YAML))


# -- read path ----------------------------------------------------------------

def _ym(t) -> tuple[int, int]:
    t = str(t)
    return int(t[:4]), (int(t[5:7]) if len(t) >= 7 else 1)


def _partition_glob(partitioning: str | None, start_time, end_time) -> list[str]:
    """Glob segments for the partition levels, restricted to the time range
    where enumerable — partition pruning at FILE LISTING time (the same
    effect as the reference reader's partition filters, but done by the
    directory glob so pruned files are never listed, let alone read).

    Spark cannot hive-infer partitions here: the per-id roots diverge above
    the ``year=`` level (CONFLICTING_DIRECTORY_STRUCTURES), so the glob
    reaches down to the leaf directories and the partition VALUES are simply
    dropped — the row-level ``time`` column carries strictly more
    information.
    """
    comps = partitioning.split("/") if partitioning else []
    segs = []
    for i, c in enumerate(comps):
        seg = f"{c}=*"
        if c == "year" and start_time is not None and end_time is not None:
            ys, ye = _ym(start_time)[0], _ym(end_time)[0]
            if 0 <= ye - ys <= 100:
                seg = "year={" + ",".join(str(y) for y in range(ys, ye + 1)) + "}"
        elif c == "month" and start_time is not None and end_time is not None:
            (ys, ms), (ye, me) = _ym(start_time), _ym(end_time)
            if ys == ye and comps[:i] == ["year"]:
                seg = "month={" + ",".join(str(m) for m in range(ms, me + 1)) + "}"
        segs.append(seg)
    return segs


def _ns_long_to_ntz(col: str) -> F.Column:
    """Exact nanosecond-long -> TIMESTAMP_NTZ conversion (integer split into
    day/second/microsecond so every intermediate fits an int and no double
    precision is lost — ns epochs ~1e18 exceed double's 2^53 mantissa)."""
    us = f"(`{col}` div 1000)"
    days = f"({us} div 86400000000)"
    rem = f"({us} % 86400000000)"
    return F.expr(
        f"timestampadd(MICROSECOND, cast({rem} % 1000000 as int), "
        f"timestampadd(SECOND, cast({rem} div 1000000 as int), "
        f"timestampadd(DAY, cast({days} as int), to_timestamp_ntz('1970-01-01'))))"
    )


def _read_ts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Read one ts variable tree, tolerating NANOS timestamps.

    Archives written by the reference come from pandas, whose default
    timestamp unit is ns — a parquet type Spark's reader refuses
    (PARQUET_TYPE_ILLEGAL). Fallback: flip the session's
    ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable), read the
    column as a long, and convert to TIMESTAMP_NTZ exactly (the parquet
    annotation is isAdjustedToUTC=false — wall-clock). The conf stays set
    for the session: it only affects ns-typed columns, which would
    otherwise be unreadable.
    """
    from pyspark.errors.exceptions.captured import AnalysisException

    try:
        df = spark.read.parquet(path)
    except AnalysisException as e:
        if "PARQUET_TYPE_ILLEGAL" not in str(e):
            raise
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
    if dict(df.dtypes).get(TIME_VAR) == "bigint":
        df = df.withColumn(TIME_VAR, _ns_long_to_ntz(TIME_VAR))
    return df


def open_tstore(
    spark: SparkSession,
    base_dir: str,
    ts_variables: list[str] | None = None,
    start_time=None,
    end_time=None,
    inclusive: str = "both",
    tstore_ids: list[str] | None = None,
    columns: list[str] | None = None,
    with_attributes: bool = True,
) -> TSLong:
    """Open a reference-layout TStore archive as a :class:`TSLong`.

    Mirrors ``TSLong.from_tstore`` (tstore/tslong/pyarrow.py:45-109): read
    each ts variable's tree, align on (id, time) with a full-outer join,
    broadcast-join ``_attributes.parquet``. Geometry survives as whatever
    column the attributes file carries (geopandas writes WKB — Spark reads
    it as ``binary``).
    """
    meta = read_reference_metadata(base_dir)
    id_var = meta["id_var"]
    structure = meta.get("tstore_structure", "id-var")
    all_vars = list(meta["ts_variables"])
    if ts_variables is not None:
        bad = [v for v in ts_variables if v not in all_vars]
        if bad:
            raise ValueError(f"unknown ts_variables {bad}; archive has {all_vars}")
        all_vars = list(ts_variables)

    # id filter pruning via glob alternation — but only when every id is free
    # of Hadoop glob metacharacters; otherwise fall back to a full listing
    # plus the row-level isin filter (correct either way, pruned when safe)
    _GLOB_META = set("*?[]{}\\,")
    id_glob = "*"
    row_filter_ids = None
    if tstore_ids is not None:
        ids_s = [str(i) for i in tstore_ids]
        if not ids_s:
            # "filter to these zero ids" = empty result; the empty glob "{}"
            # would crash the read with PATH_NOT_FOUND, but isin([]) folds to
            # constant false so no file is actually scanned
            row_filter_ids = ids_s
        elif all(not (_GLOB_META & set(i)) for i in ids_s):
            id_glob = "{" + ",".join(ids_s) + "}"
        else:
            row_filter_ids = ids_s
    part_map = meta.get("partitioning") or {}

    parts: list[DataFrame] = []
    ts_vars: dict[str, list[str]] = {}
    for var in all_vars:
        part_str = part_map.get(var) if isinstance(part_map, dict) else part_map
        part_segs = _partition_glob(part_str, start_time, end_time)
        if structure == "id-var":
            path = os.path.join(base_dir, id_glob, var, *part_segs)
            pattern = f".*/([^/]+)/{re.escape(var)}/"
        elif structure == "var-id":
            path = os.path.join(base_dir, var, id_glob, *part_segs)
            pattern = f".*/{re.escape(var)}/([^/]+)/"
        else:
            raise ValueError(f"unknown tstore_structure {structure!r}")
        df = _read_ts_parquet(spark, path)
        # input_file_name() returns a URI, so the captured path segment is
        # percent-encoded (space -> %20, % -> %25, ...). url_decode is
        # form-decoding ('+' -> ' '), but '+' is legal and stays UNencoded in
        # a URI path — shield it before decoding so ids containing '+'
        # round-trip.
        seg = F.regexp_extract(F.input_file_name(), pattern, 1)
        df = df.withColumn(
            id_var, F.url_decode(F.replace(seg, F.lit("+"), F.lit("%2B")))
        )
        if row_filter_ids is not None:
            df = df.where(F.col(id_var).isin(row_filter_ids))
        part_cols = [c for c in _PART_NAMES if c in df.columns]
        df = df.drop(*part_cols)  # stray copies inside files (some writers keep them)
        if start_time is not None or end_time is not None:
            is_ntz = dict(df.dtypes).get(TIME_VAR) == "timestamp_ntz"
            df = df.where(
                time_range_filter(TIME_VAR, start_time, end_time, inclusive, ntz=is_ntz)
            )
        var_cols = [c for c in df.columns if c not in (id_var, TIME_VAR)]
        if columns is not None:
            var_cols = [c for c in var_cols if c in columns]
        ts_vars[var] = var_cols
        parts.append(df.select(id_var, TIME_VAR, *var_cols))

    from functools import reduce

    joined = reduce(lambda a, b: a.join(b, [id_var, TIME_VAR], "full_outer"), parts)

    statics: list[str] = []
    attrs_path = os.path.join(base_dir, ATTRIBUTES_FILE)
    if with_attributes and os.path.exists(attrs_path):
        # Spark's file listing ignores "_"-prefixed files (metadata
        # convention), so the reference's single-file dimension table is read
        # driver-side (pyarrow) — it is id-dimension-sized by contract
        import pyarrow.parquet as pq

        pdf = pq.read_table(attrs_path).to_pandas()
        pdf[id_var] = pdf[id_var].astype(str)
        attrs = spark.createDataFrame(pdf)
        if tstore_ids is not None:
            attrs = attrs.where(F.col(id_var).isin([str(i) for i in tstore_ids]))
        statics = [c for c in attrs.columns if c != id_var]
        joined = joined.join(F.broadcast(attrs), id_var, "left")

    ts_vars = {v: cols for v, cols in ts_vars.items() if cols}
    part_map = meta.get("partitioning") or {}
    part_str = part_map.get(next(iter(ts_vars), None)) if isinstance(part_map, dict) else part_map
    return TSLong(
        joined,
        TableDescriptor(id_var, TIME_VAR, ts_vars, statics, part_str),
    )


# -- write path ---------------------------------------------------------------

def _partition_columns(partitioning: str | None):
    """(names, column builders) for a reference partitioning string."""
    if not partitioning:
        return []
    builders = {
        "year": lambda t: F.year(t),
        "month": lambda t: F.month(t),
        "day": lambda t: F.dayofmonth(t),
        "doy": lambda t: F.dayofyear(t),
        "dow": lambda t: (F.dayofweek(t) + 5) % 7,  # pandas Monday=0 (reference)
        "hh": lambda t: F.hour(t),
        "mm": lambda t: F.minute(t),
        "ss": lambda t: F.second(t),
    }
    comps = partitioning.split("/")
    bad = [c for c in comps if c not in builders]
    if bad:
        raise ValueError(f"unknown partitioning components {bad}; valid: {list(builders)}")
    return [(c, builders[c]) for c in comps]


def to_tstore(
    tslong: TSLong,
    base_dir: str,
    partitioning: str | None = "year/month",
    tstore_structure: str = "id-var",
    overwrite: bool = True,
    attrs: DataFrame | None = None,
) -> None:
    """Write a TSLong as a reference-layout TStore archive.

    One distributed write per ts variable (``repartition(id, parts)`` →
    ``partitionBy`` → one file per (id, partition)), then the rename pass
    that strips the hive ``id=`` prefix. The time column is renamed to
    ``"time"`` — the reference reader's contract.
    """
    if tstore_structure not in ("id-var", "var-id"):
        raise ValueError("valid tstore_structure are 'id-var' and 'var-id'")
    bad_ids = [
        r[0]
        for r in tslong.df.select(tslong.descriptor.id_var)
        .where(F.col(tslong.descriptor.id_var).contains("/") | F.col(tslong.descriptor.id_var).contains("\\"))
        .distinct()
        .limit(5)
        .collect()
    ]
    if bad_ids:
        # a directory-per-id layout cannot represent path separators: the
        # unescaped rename would nest directories and the reader's
        # last-segment extraction would silently mis-key the rows
        raise ValueError(
            f"tstore ids must not contain path separators; got {bad_ids}"
        )
    if os.path.exists(base_dir):
        if not overwrite:
            raise ValueError(f"TStore already exists at {base_dir}")
        shutil.rmtree(base_dir)
    os.makedirs(base_dir)

    d = tslong.descriptor
    df = tslong.df
    hive_id = "__tsid"
    part_specs = _partition_columns(partitioning)
    part_names = [name for name, _ in part_specs]

    for var, cols in d.ts_vars.items():
        fact = df.select(
            F.col(d.id_var).cast("string").alias(hive_id),
            F.col(d.time_var).alias(TIME_VAR),
            *cols,
        )
        for name, builder in part_specs:
            fact = fact.withColumn(name, builder(F.col(TIME_VAR)))
        staging = os.path.join(base_dir, f"_staging_{var}")
        (
            fact.repartition(hive_id, *part_names)
            .sortWithinPartitions(TIME_VAR)
            .write.mode("overwrite")
            .partitionBy(hive_id, *part_names)
            .parquet(staging)
        )
        # strip the hive "__tsid=" prefix: <staging>/__tsid=X/... -> layout
        # dir. Hive ESCAPES special chars in partition values (%XX percent
        # encoding: '%', ':', '#', ...), so unescape to get the literal id as
        # the directory name — the reference layout contract (and what the
        # reader's input_file_name() recovery expects after ONE URI decode).
        from urllib.parse import unquote

        for entry in os.listdir(staging):
            if not entry.startswith(f"{hive_id}="):
                continue  # _SUCCESS etc.
            tid = unquote(entry.split("=", 1)[1])
            if tstore_structure == "id-var":
                dest = os.path.join(base_dir, tid, var)
            else:
                dest = os.path.join(base_dir, var, tid)
            os.renames(os.path.join(staging, entry), dest)
        shutil.rmtree(staging, ignore_errors=True)

    # attributes: the reference contract is a single parquet FILE
    if attrs is None and d.static_vars:
        attrs = df.select(d.id_var, *d.static_vars).dropDuplicates([d.id_var])
    if attrs is not None:
        pdf = attrs.toPandas()
        pdf[d.id_var] = pdf[d.id_var].astype(str)
        pdf.to_parquet(os.path.join(base_dir, ATTRIBUTES_FILE), index=False)

    write_reference_metadata(
        base_dir,
        id_var=d.id_var,
        ts_variables=list(d.ts_vars),
        partitioning={v: partitioning for v in d.ts_vars},
        tstore_structure=tstore_structure,
    )
