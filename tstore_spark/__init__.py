"""tstore_spark — a PySpark-native time-series archiving + rollup engine.

Re-expresses the capabilities of ltelab/tstore (see /root/reference) Spark-first:

- Data model: long-form DataFrame + descriptor (TSLong analog), wide/nested views
  (TSWide/TSDF analogs) computed on demand, never stored.
- Archive: hive-partitioned Parquet with derived partition columns
  (days(warc_ts) + bucket(url) emulated as explicit ``p_day``/``p_bucket``
  columns since no Iceberg runtime is present in this sandbox), attributes
  dimension table, JSON metadata — mirroring tstore's on-disk TStore layout
  (reference: tstore/archive/io.py:28-48).
- Rollups: tumbling-window continuous aggregates at 1m/1h/1d retention tiers,
  cascaded (1m -> 1h -> 1d), with gap-fill interpolation and Gorilla
  XOR/delta-of-delta compressed chunk columns.
- Scale posture: broadcast dimension joins, salted two-stage aggregation for
  hot-key skew, AQE on, no per-row Python UDFs anywhere (vectorized
  pandas/Arrow UDFs only).
"""

from tstore_spark.session import get_spark
from tstore_spark.model.descriptor import TableDescriptor
from tstore_spark.model.tslong import TSLong
from tstore_spark.model.tsdf import TSDF
from tstore_spark.model.tswide import TSWide
from tstore_spark.api import (
    open_tslong,
    open_tsdf,
    open_tswide,
    to_tstore,
    to_tstore_reference,
)

__all__ = [
    "get_spark", "TableDescriptor", "TSLong", "TSDF", "TSWide",
    "open_tslong", "open_tsdf", "open_tswide", "to_tstore", "to_tstore_reference",
]
__version__ = "0.2.0"
