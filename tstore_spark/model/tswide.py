"""TSWide — the wide pivot view as a first-class wrapper with an inverse.

The reference's TSWide carries pandas MultiIndex columns keyed (variable,
id) (tstore/tswide/tswide.py:23-77). Spark columns are flat, so the
MultiIndex becomes the naming convention ``variable(id)`` — parseable,
collision-free (ids may contain underscores, so ``{id}_{var}`` would be
ambiguous), and stable across single- and multi-variable pivots.

``to_tslong`` is the inverse melt — which the reference left
``NotImplementedError`` in every backend (tstore/tswide/pandas.py:24-26);
here it is ONE ``stack`` projection (no join, no union-per-id: the plan stays
O(1) in the number of ids, only the row count multiplies).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TSWide:
    """Wide view: one row per time, one ``var(id)`` column per (var, id)."""

    def __init__(
        self,
        df: DataFrame,
        time_var: str,
        id_var: str,
        ids: list[str],
        values: list[str],
    ):
        object.__setattr__(self, "_df", df)
        object.__setattr__(self, "_time_var", time_var)
        object.__setattr__(self, "_id_var", id_var)
        object.__setattr__(self, "_ids", list(ids))
        object.__setattr__(self, "_values", list(values))

    # -- wrapper plumbing -----------------------------------------------------
    @property
    def df(self) -> DataFrame:
        return self._df

    @property
    def ids(self) -> list[str]:
        return list(self._ids)

    @property
    def values(self) -> list[str]:
        return list(self._values)

    @staticmethod
    def column_name(var: str, id_value: str) -> str:
        return f"{var}({id_value})"

    def __getattr__(self, name):
        attr = getattr(self._df, name)
        if callable(attr):
            def wrapped(*args, **kwargs):
                out = attr(*args, **kwargs)
                if isinstance(out, DataFrame):
                    return TSWide(out, self._time_var, self._id_var, self._ids, self._values)
                return out

            return wrapped
        return attr

    # -- inverse --------------------------------------------------------------
    def to_tslong(self, drop_empty: bool = True):
        """Melt back to long form — one ``stack`` projection.

        ``stack(n, id1, var1(id1), var2(id1), id2, …)`` emits one row per
        (time, id); rows where every variable is null (an id absent at that
        time in a sparse pivot) are dropped unless ``drop_empty=False`` —
        matching what the original long table contained.
        """
        from tstore_spark.model.tslong import TSLong

        args: list[str] = []
        for i in self._ids:
            # escape backslashes BEFORE quotes: Spark SQL string literals
            # interpret backslash escapes, so a raw id like "a\b" or "x'y"
            # must round-trip byte-identically through the stack() expr
            s = str(i).replace("\\", "\\\\").replace("'", "\\'")
            args.append("'" + s + "'")
            # backticks inside quoted identifiers are escaped by doubling
            args.extend(
                "`" + self.column_name(v, i).replace("`", "``") + "`"
                for v in self._values
            )
        out_cols = ", ".join([self._id_var, *self._values])
        stacked = self._df.select(
            F.col(self._time_var),
            F.expr(f"stack({len(self._ids)}, {', '.join(args)}) AS ({out_cols})"),
        ).select(self._id_var, self._time_var, *self._values)
        if drop_empty and self._values:
            cond = F.lit(False)
            for v in self._values:
                cond = cond | F.col(v).isNotNull()
            stacked = stacked.where(cond)
        return TSLong.wrap(
            stacked, id_var=self._id_var, time_var=self._time_var,
            ts_vars={v: [v] for v in self._values},
        )
