"""Time-range predicates with tstore's ``inclusive`` semantics.

Reference: tstore/archive/ts/utility.py:17-57 builds Parquet filter tuples
honoring ``inclusive in {both, neither, left, right}``; tstore/archive/
checks.py:63-122 normalizes datetime/date/np.datetime64/ISO-str inputs and
enforces start <= end. Here the predicate is a Catalyst Column — pushdown to
Parquet row groups and partition pruning are automatic.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

TimeLike = "dt.datetime | dt.date | np.datetime64 | str | None"

_INCLUSIVE = {"both", "neither", "left", "right"}


def check_time(t) -> dt.datetime | None:
    """Normalize datetime/date/np.datetime64/ISO-string to datetime (µs)."""
    if t is None:
        return None
    if isinstance(t, np.datetime64):
        # round ns -> µs (Spark TimestampType is µs)
        us = t.astype("datetime64[us]").astype(np.int64)
        return dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=int(us))
    if isinstance(t, dt.datetime):
        return t
    if isinstance(t, dt.date):
        return dt.datetime(t.year, t.month, t.day)
    if isinstance(t, str):
        return dt.datetime.fromisoformat(t)
    raise TypeError(f"unsupported time type {type(t)}")


def check_start_end_time(start_time, end_time) -> tuple:
    s, e = check_time(start_time), check_time(end_time)
    if s is not None and e is not None and s > e:
        raise ValueError(f"start_time {s} is after end_time {e}")
    return s, e


def time_range_filter(
    time_var: str,
    start_time=None,
    end_time=None,
    inclusive: str = "both",
) -> Column:
    """Build the Catalyst predicate for a [start, end] range.

    inclusive='both'   -> time >= start AND time <= end
    inclusive='left'   -> time >= start AND time <  end
    inclusive='right'  -> time >  start AND time <= end
    inclusive='neither'-> time >  start AND time <  end
    """
    if inclusive not in _INCLUSIVE:
        raise ValueError(f"inclusive must be one of {sorted(_INCLUSIVE)}, got {inclusive!r}")
    s, e = check_start_end_time(start_time, end_time)
    col = F.col(time_var)
    pred = F.lit(True)
    if s is not None:
        pred = pred & (col >= F.lit(s) if inclusive in ("both", "left") else col > F.lit(s))
    if e is not None:
        pred = pred & (col <= F.lit(e) if inclusive in ("both", "right") else col < F.lit(e))
    return pred
