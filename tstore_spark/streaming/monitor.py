"""Streaming observability — per-micro-batch metrics without a second job.

The batch-side watermark question is answered by
``coverage.out_of_order_profile`` (max lateness = the minimal lossless
watermark); this module covers the RUNNING side: is the deployed
watermark actually keeping up, how many rows does each micro-batch carry,
and how far behind wall clock has event time fallen — the numbers an
on-call engineer graphs for the streaming tier cascade.

Spark-first: metrics ride the query itself via ``DataFrame.observe``
(aggregates evaluated inside the running plan — zero extra scans, exactly
the AccumulatorV2 contract Structured Streaming exposes for this), and
the progress side reads the engine's own ``StreamingQueryProgress`` —
no log scraping.

- :func:`observe_event_time` attaches ``(rows, et_min_us, et_max_us)``
  observed metrics on the event-time column (NTZ-safe epoch micros).
- :func:`progress_report` parses ``query.recentProgress`` into flat rows:
  batch id, input rows, processed rows/s, batch duration, the engine's
  watermark, and (when the observation is attached) the observed
  event-time envelope with ``watermark_lag_us`` = how far the watermark
  trails the newest observed event time.

Determinism note: progress is about a RUN, not the data — it is
intentionally outside the oracle gate (nothing here touches result
correctness; the drive + pytest assert the metric algebra instead).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.timeparts import ntz_epoch_micros

OBSERVATION_NAME = "tstore_event_time"


def observe_event_time(
    df: DataFrame, time_col: str, name=OBSERVATION_NAME
) -> DataFrame:
    """Attach in-plan observed metrics ``rows / et_min_us / et_max_us``
    to a (streaming or batch) DataFrame — evaluated by the SAME tasks
    that compute the query, never a second scan.  ``name`` is the metric
    name on a streaming query, or a ``pyspark.sql.Observation`` instance
    on a batch DataFrame (read the metrics via ``observation.get``)."""
    t = ntz_epoch_micros(time_col)
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.min(t).alias("et_min_us"),
        F.max(t).alias("et_max_us"),
    )


def _parse_wm_us(wm: str | None) -> int | None:
    """Engine watermark ISO string -> epoch micros (UTC wall clock)."""
    if not wm:
        return None
    import datetime as _dt

    s = wm.replace("Z", "+00:00")
    try:
        d = _dt.datetime.fromisoformat(s)
    except ValueError:
        return None
    if d.tzinfo is not None:
        d = d.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return int((d - _dt.datetime(1970, 1, 1)).total_seconds() * 1_000_000)


def progress_report(query, name: str = OBSERVATION_NAME) -> list[dict]:
    """Flatten ``query.recentProgress`` into one dict per micro-batch:
    ``batch_id, input_rows, rows_per_sec, batch_ms, watermark_us`` plus —
    when :func:`observe_event_time` is attached — ``obs_rows,
    et_min_us, et_max_us, watermark_lag_us`` (engine watermark minus the
    newest observed event time; negative = watermark trails the data, the
    healthy steady state)."""
    out = []
    for p in query.recentProgress:
        row = {
            "batch_id": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "rows_per_sec": p.get("processedRowsPerSecond"),
            "batch_ms": (p.get("durationMs") or {}).get("triggerExecution"),
            "watermark_us": _parse_wm_us((p.get("eventTime") or {}).get("watermark")),
        }
        obs = (p.get("observedMetrics") or {}).get(name)
        if obs is not None:
            # observed metrics surface as a Row (not a dict) in PySpark
            od = obs.asDict() if hasattr(obs, "asDict") else dict(obs)
            row["obs_rows"] = od.get("rows")
            row["et_min_us"] = od.get("et_min_us")
            row["et_max_us"] = od.get("et_max_us")
            if row["watermark_us"] is not None and od.get("et_max_us") is not None:
                row["watermark_lag_us"] = row["watermark_us"] - od["et_max_us"]
        out.append(row)
    return out


def assert_watermark_monotone(report: list[dict]) -> None:
    """Raise if the engine watermark ever regressed across the report —
    the invariant Structured Streaming guarantees and restart bugs break
    (a wrong checkpoint dir shows up here first)."""
    last = None
    for row in report:
        wm = row.get("watermark_us")
        if wm is None:
            continue
        if last is not None and wm < last:
            raise AssertionError(
                f"watermark regressed: {wm} < {last} at batch {row['batch_id']}"
            )
        last = wm
