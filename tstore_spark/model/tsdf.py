"""TSDF — the nested per-id view as a first-class wrapper with an inverse.

The reference's TSDF is a pandas-only DataFrame of TSArray columns — one row
per entity, each cell a whole timeseries (tstore/tsdf/tsdf.py:30-56). The
Spark-native analog is a nested DataFrame: one row per id, one
``array<struct<time, vars...>>`` column per ts-variable group, statics as
plain columns. This wrapper carries the descriptor so the nested view can
round-trip (``to_tslong`` — reference ``tsdf.py:212-249`` does per-id outer
joins; here each group explodes and full-outer joins on (id, time) in one
Catalyst plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from tstore_spark.model.descriptor import TableDescriptor


class TSDF:
    """Nested view: one row per id; ts groups as sorted array<struct>."""

    def __init__(self, df: DataFrame, descriptor: TableDescriptor):
        object.__setattr__(self, "_df", df)
        object.__setattr__(self, "_descriptor", descriptor)

    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def descriptor(self) -> TableDescriptor:
        return self._descriptor

    def __getattr__(self, name):
        attr = getattr(self._df, name)
        if callable(attr):
            def wrapped(*args, **kwargs):
                out = attr(*args, **kwargs)
                if isinstance(out, DataFrame):
                    return TSDF(out, self._descriptor)
                return out

            return wrapped
        return attr

    def to_tslong(self):
        """Explode back to long form (reference tsdf.py:212-249)."""
        from tstore_spark.model.tslong import TSLong

        d = self._descriptor
        return TSLong.from_tsdf(
            self._df,
            id_var=d.id_var,
            ts_vars=d.ts_vars,
            static_vars=d.static_vars,
            time_var=d.time_var,
        )
