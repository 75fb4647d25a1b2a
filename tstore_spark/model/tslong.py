"""TSLong — the engine's native long-form wrapper, plus wide/nested views.

The reference's TSWrapper proxy (tstore/tswrapper/tswrapper.py:24-155)
delegates attribute access to the wrapped dataframe and re-wraps returned
dataframes so method chains stay wrapped. Same trick here around
``pyspark.sql.DataFrame``.

TSWide (tstore/tswide/tswide.py:23-77) and TSDF (tstore/tsdf/tsdf.py:30-56)
become *views* computed on demand — pivot and nested-struct aggregation —
never a storage format. ``to_tswide`` enforces a key-cardinality guard:
``pivot(id)`` over web-scale id domains is nonsense (the reference itself
left wide->long unimplemented, tstore/tswide/pandas.py:24-26).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tstore_spark.functions.filters import time_range_filter
from tstore_spark.model.descriptor import TableDescriptor

_WIDE_MAX_IDS = 10_000  # guard: a wide view needs a key-reducing filter first


class TSLong:
    """Long-form time-series table: (id, time, ts vars..., statics...)."""

    def __init__(self, df: DataFrame, descriptor: TableDescriptor):
        descriptor.validate(df)
        # id coerced to string at wrap time (reference tslong.py:75)
        if dict(df.dtypes)[descriptor.id_var] != "string":
            df = df.withColumn(descriptor.id_var, F.col(descriptor.id_var).cast("string"))
        object.__setattr__(self, "_df", df)
        object.__setattr__(self, "_descriptor", descriptor)

    # -- wrapper plumbing ---------------------------------------------------
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
                    try:
                        return TSLong(out, self._descriptor)
                    except ValueError:
                        return out  # projection dropped descriptor columns
                return out

            return wrapped
        return attr

    @classmethod
    def wrap(
        cls,
        df: DataFrame,
        id_var: str,
        time_var: str,
        ts_vars=None,
        static_vars=None,
        partitioning: str | None = None,
    ) -> "TSLong":
        return cls(df, TableDescriptor.build(df, id_var, time_var, ts_vars, static_vars, partitioning))

    # -- the reference's query surface (SURVEY §2 #13-#18) -------------------
    def query(
        self,
        ts_variables: list[str] | None = None,
        start_time=None,
        end_time=None,
        inclusive: str = "both",
        ids: list[str] | None = None,
        columns: list[str] | None = None,
    ) -> "TSLong":
        d = self._descriptor
        if ts_variables is not None:
            bad = [v for v in ts_variables if v not in d.ts_vars]
            if bad:
                raise ValueError(f"unknown ts_variables {bad}; available: {sorted(d.ts_vars)}")
            keep_groups = {v: d.ts_vars[v] for v in ts_variables}
        else:
            keep_groups = d.ts_vars

        df = self._df
        if start_time is not None or end_time is not None:
            is_ntz = dict(df.dtypes).get(d.time_var) == "timestamp_ntz"
            df = df.where(time_range_filter(d.time_var, start_time, end_time, inclusive, ntz=is_ntz))
        if ids is not None:
            df = df.where(F.col(d.id_var).isin([str(i) for i in ids]))

        ts_cols = [c for cols in keep_groups.values() for c in cols]
        if columns is not None:
            ts_cols = [c for c in ts_cols if c in columns]
            keep_groups = {g: [c for c in cols if c in columns] for g, cols in keep_groups.items()}
            keep_groups = {g: cols for g, cols in keep_groups.items() if cols}
        df = df.select(d.id_var, d.time_var, *ts_cols, *d.static_vars)
        return TSLong(
            df,
            TableDescriptor(d.id_var, d.time_var, keep_groups, d.static_vars, d.partitioning),
        )

    # -- uniqueness guard (reference tslong/dask.py:108-128) -----------------
    def check_static_uniqueness(self) -> None:
        d = self._descriptor
        if not d.static_vars:
            return
        bad = (
            self._df.groupBy(d.id_var)
            .agg(*[F.countDistinct(c).alias(c) for c in d.static_vars])
            .where(" OR ".join(f"`{c}` > 1" for c in d.static_vars))
            .limit(1)
            .collect()
        )
        if bad:
            raise ValueError(f"static variables not unique per id: {bad[0].asDict()}")

    # -- views ---------------------------------------------------------------
    def to_tswide(self, values: list[str] | None = None, max_ids: int = _WIDE_MAX_IDS):
        """Wide pivot view: rows=time, one ``var(id)`` column per (var, id),
        wrapped as a :class:`~tstore_spark.model.tswide.TSWide` (the
        reference's MultiIndex-column TSWide analog, with a working
        ``to_tslong`` inverse the reference lacks).

        Reference pivots with aggfunc='first' (tstore/tslong/pandas.py:176-180);
        same here. Guarded: refuse unbounded id domains.
        """
        from tstore_spark.model.tswide import TSWide

        d = self._descriptor
        ids = [r[0] for r in self._df.select(d.id_var).distinct().limit(max_ids + 1).collect()]
        if len(ids) > max_ids:
            raise ValueError(
                f"wide view over >{max_ids} ids — filter ids first "
                "(web-scale pivot guard, cf. reference tswide/pandas.py:24-26)"
            )
        ids = sorted(ids)
        vals = values or d.ts_columns
        # Pivot on a HEX encoding of the id. Spark names multi-agg pivot
        # columns "{pivotValue}_{aggAlias}", which is ambiguous for ids
        # containing underscores (ids ['a','a_x'] with vals ['x_b','b'] both
        # yield "a_x_b" — exactly the collision the var(id) convention exists
        # to avoid; Spark then raises AMBIGUOUS_REFERENCE on the rename).
        # Hex contains no underscore and the positional "v{j}" aliases are
        # distinct, so the first "_" always splits value from alias, and the
        # rename to "{var}({id})" is exact for ANY id and variable name.
        hex_of = {i: str(i).encode("utf-8").hex().upper() for i in ids}
        piv = (
            self._df.withColumn("_pid", F.hex(F.col(d.id_var)))
            .groupBy(d.time_var)
            .pivot("_pid", [hex_of[i] for i in ids])
            .agg(*[F.first(c).alias(f"v{j}") for j, c in enumerate(vals)])
            .orderBy(d.time_var)
        )
        renames = {}
        for i in ids:
            if len(vals) == 1:
                renames[hex_of[i]] = TSWide.column_name(vals[0], i)
            else:
                for j, v in enumerate(vals):
                    renames[f"{hex_of[i]}_v{j}"] = TSWide.column_name(v, i)
        piv = piv.select(
            d.time_var,
            *[F.col(old).alias(new) for old, new in renames.items()],
        )
        return TSWide(piv, d.time_var, d.id_var, ids, vals)

    def to_tsdf(self):
        """Nested view (reference TSDF analog, wrapped): one row per id, one
        array<struct> column per ts_vars group (time-sorted), plus statics.

        Reference: tstore/tslong/dask.py:67-128 does this with a per-id Python
        loop; here it is one groupBy with sorted collect_list. Returns a
        :class:`~tstore_spark.model.tsdf.TSDF` carrying the descriptor so
        ``.to_tslong()`` inverts without re-specifying the schema.
        """
        from tstore_spark.model.tsdf import TSDF

        d = self._descriptor
        aggs = [
            F.array_sort(
                F.collect_list(F.struct(F.col(d.time_var).alias("time"), *[F.col(c) for c in cols]))
            ).alias(group)
            for group, cols in d.ts_vars.items()
        ]
        aggs += [F.first(c).alias(c) for c in d.static_vars]
        nested = self._df.groupBy(d.id_var).agg(*aggs)
        return TSDF(
            nested,
            TableDescriptor(d.id_var, "time", d.ts_vars, d.static_vars, d.partitioning),
        )

    @classmethod
    def from_tsdf(
        cls,
        nested: DataFrame,
        id_var: str,
        ts_vars: dict[str, list[str]],
        static_vars: list[str] | None = None,
        time_var: str = "time",
    ) -> "TSLong":
        """Explode the nested view back to long form (reference
        tstore/tsdf/tsdf.py:212-249 — per-id outer joins; here: explode each
        group and full-outer join on (id, time)). Accepts a TSDF wrapper or
        its bare DataFrame."""
        if hasattr(nested, "df") and not isinstance(nested, DataFrame):
            nested = nested.df
        static_vars = list(static_vars or [])
        parts = []
        for group, cols in ts_vars.items():
            parts.append(
                nested.select(
                    id_var,
                    F.explode(group).alias("_e"),
                ).select(id_var, F.col("_e.time").alias(time_var), *[F.col(f"_e.{c}").alias(c) for c in cols])
            )
        from functools import reduce

        df = reduce(lambda a, b: a.join(b, [id_var, time_var], "full_outer"), parts)
        if static_vars:
            statics = nested.select(id_var, *static_vars)
            df = df.join(F.broadcast(statics), id_var, "left")
        return cls.wrap(df, id_var, time_var, ts_vars=ts_vars, static_vars=static_vars)

    # -- attrs join (reference tslong/pyarrow.py:100 — broadcast here) -------
    def with_attributes(self, attrs: DataFrame, how: str = "left") -> "TSLong":
        d = self._descriptor
        new_statics = [c for c in attrs.columns if c != d.id_var]
        df = self._df.join(F.broadcast(attrs), d.id_var, how)
        return TSLong(
            df,
            TableDescriptor(d.id_var, d.time_var, d.ts_vars, d.static_vars + new_statics, d.partitioning),
        )
