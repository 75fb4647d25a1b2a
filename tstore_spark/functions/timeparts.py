"""Datetime-component partitioning grammar.

Re-expresses the reference's partitioning grammar — a ``/``-joined string over
components ``year|month|day|doy|dow|hh|mm|ss`` with month/day vs doy mutual
exclusivity (reference: tstore/archive/partitions.py:14-118) — as Spark
built-in column expressions. At scale these hive partition columns give the
same partition pruning Iceberg's hidden ``days()`` transform would; they are
dropped again on read, so the logical schema never sees them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# component -> (partition column name, expression builder)
PARTITION_COMPONENTS: dict[str, callable] = {
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "doy": F.dayofyear,
    "dow": F.dayofweek,
    "hh": F.hour,
    "mm": F.minute,
    "ss": F.second,
}

_EXCLUSIVE = ({"month", "doy"}, {"day", "doy"})


def ntz_epoch_seconds(col: str | Column) -> Column:
    """Wall-clock epoch seconds of a TIMESTAMP_NTZ — via FIELD EXTRACTION
    only (datediff on the date part + time-of-day fields), never timestamp
    casts or ``timestampdiff``: in Spark 4 BOTH route NTZ through the
    session timezone, so in a DST-observing session `02:00` on a
    spring-forward night collapses onto `03:00` (measured; see
    tests/test_gapfill.py DST regression). Field extraction is pure
    wall-clock at any session TZ."""
    c = F.col(col) if isinstance(col, str) else col
    days = F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
    return days * 86400 + F.hour(c).cast("long") * 3600 + F.minute(c).cast("long") * 60 + F.second(c).cast("long")


def ntz_epoch_micros(col: str | Column) -> Column:
    """Wall-clock epoch microseconds of a TIMESTAMP_NTZ (see
    :func:`ntz_epoch_seconds`); the sub-second part comes from
    ``date_part('SECOND')``'s decimal fraction — still field extraction,
    still session-TZ-free."""
    c = F.col(col) if isinstance(col, str) else col
    days = F.datediff(c.cast("date"), F.lit("1970-01-01").cast("date")).cast("long")
    whole_min = days * 1440 + F.hour(c).cast("long") * 60 + F.minute(c).cast("long")
    sec_us = (F.date_part(F.lit("SECOND"), c) * 1_000_000).cast("long")
    return whole_min * 60_000_000 + sec_us


def ntz_from_epoch_micros(col: str | Column) -> Column:
    """Inverse of :func:`ntz_epoch_micros`: wall-clock epoch microseconds
    -> TIMESTAMP_NTZ. Uses ``timestampadd`` on an NTZ base — the ONE
    NTZ arithmetic path that is wall-clock-safe in Spark 4 (long
    quantities accepted; verified to land exactly on nonexistent DST wall
    hours in a DST-observing session, unlike timestamp casts)."""
    c = F.col(col) if isinstance(col, str) else col
    base = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
    return F.timestamp_add("MICROSECOND", c, base)


def check_partitioning(partitioning: str | None) -> list[str]:
    """Validate and split a partitioning string (reference partitions.py:57-100)."""
    if partitioning is None or partitioning == "":
        return []
    if not isinstance(partitioning, str):
        raise TypeError(f"partitioning must be a string, got {type(partitioning)}")
    comps = partitioning.split("/")
    for c in comps:
        if c not in PARTITION_COMPONENTS:
            raise ValueError(
                f"invalid partitioning component {c!r}; valid: {sorted(PARTITION_COMPONENTS)}"
            )
    if len(set(comps)) != len(comps):
        raise ValueError(f"duplicate partitioning components in {partitioning!r}")
    s = set(comps)
    for bad in _EXCLUSIVE:
        if bad <= s:
            raise ValueError(f"components {sorted(bad)} are mutually exclusive")
    return comps


def partition_columns(partitioning: str | None) -> list[str]:
    return [f"p_{c}" for c in check_partitioning(partitioning)]


def add_partitioning_columns(df: DataFrame, time_var: str, partitioning: str | None) -> DataFrame:
    """Materialize partition columns ``p_<component>`` from the time column
    (reference partitions.py:103-118). Readers drop them again."""
    for c in check_partitioning(partitioning):
        df = df.withColumn(f"p_{c}", PARTITION_COMPONENTS[c](F.col(time_var)))
    return df


def bucket_column(col: str | Column, num_buckets: int) -> Column:
    """Emulation of Iceberg's ``bucket(N, col)`` transform: stable hash mod N.

    ``xxhash64`` is a fixed, documented hash — bucket assignment is
    deterministic across runs/parallelism (unlike ``hash`` of floats).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(F.xxhash64(c), F.lit(num_buckets)).cast("int")
