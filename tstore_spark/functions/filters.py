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
    ntz: bool = False,
) -> Column:
    """Build the Catalyst predicate for a [start, end] range.

    inclusive='both'   -> time >= start AND time <= end
    inclusive='left'   -> time >= start AND time <  end
    inclusive='right'  -> time >  start AND time <= end
    inclusive='neither'-> time >  start AND time <  end

    ntz=True builds TIMESTAMP_NTZ literals (wall-clock comparison, immune to
    the session timezone) — pass it when the column is TIMESTAMP_NTZ, or a
    non-UTC session would shift the bounds during implicit casts.
    """
    if inclusive not in _INCLUSIVE:
        raise ValueError(f"inclusive must be one of {sorted(_INCLUSIVE)}, got {inclusive!r}")
    s, e = check_start_end_time(start_time, end_time)

    def lit_ts(t: dt.datetime) -> Column:
        if ntz:
            # string-parse path: purely wall-clock, no driver/session TZ involved
            return F.to_timestamp_ntz(F.lit(t.strftime("%Y-%m-%d %H:%M:%S.%f")))
        return F.lit(t)

    col = F.col(time_var)
    pred = F.lit(True)
    if s is not None:
        pred = pred & (col >= lit_ts(s) if inclusive in ("both", "left") else col > lit_ts(s))
    if e is not None:
        pred = pred & (col <= lit_ts(e) if inclusive in ("both", "right") else col < lit_ts(e))
    return pred
