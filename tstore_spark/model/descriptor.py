"""Table descriptor — the schema metadata the reference carries on wrappers.

Re-expresses TSLong's constructor-time validation (reference:
tstore/tslong/tslong.py:151-253) for a Spark DataFrame:

- id/time column existence
- ts_vars normalization: ``None | list | dict -> dict[group -> [columns]]``
  (tslong.py:199-225; semantics asserted in tests/test_tslong.py:144-212)
- disjointness of id/time/static/ts_vars column sets
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def normalize_ts_vars(
    columns: list[str],
    id_var: str,
    time_var: str,
    ts_vars,
    static_vars: list[str] | None,
) -> dict[str, list[str]]:
    """None -> one group per remaining column, named after the column;
    list -> single group "ts_variable"; dict -> as-is (validated)."""
    static_vars = static_vars or []
    reserved = {id_var, time_var, *static_vars}
    remaining = [c for c in columns if c not in reserved]
    if ts_vars is None:
        return {c: [c] for c in remaining}
    if isinstance(ts_vars, list):
        return {"ts_variable": list(ts_vars)}
    if isinstance(ts_vars, dict):
        return {k: list(v) for k, v in ts_vars.items()}
    raise TypeError(f"ts_vars must be None, list, or dict; got {type(ts_vars)}")


@dataclass(frozen=True)
class TableDescriptor:
    id_var: str
    time_var: str
    ts_vars: dict[str, list[str]] = field(default_factory=dict)
    static_vars: list[str] = field(default_factory=list)
    partitioning: str | None = None

    @property
    def ts_columns(self) -> list[str]:
        return [c for cols in self.ts_vars.values() for c in cols]

    def validate(self, df: DataFrame) -> None:
        cols = set(df.columns)
        for name, what in [(self.id_var, "id_var"), (self.time_var, "time_var")]:
            if name not in cols:
                raise ValueError(f"{what} {name!r} not in DataFrame columns {sorted(cols)}")
        missing = [c for c in self.ts_columns if c not in cols]
        if missing:
            raise ValueError(f"ts_vars columns not in DataFrame: {missing}")
        missing = [c for c in self.static_vars if c not in cols]
        if missing:
            raise ValueError(f"static_vars columns not in DataFrame: {missing}")
        # disjointness (reference tslong.py:227-253)
        seen: dict[str, str] = {}
        for group, group_cols in self.ts_vars.items():
            for c in group_cols:
                if c in (self.id_var, self.time_var):
                    raise ValueError(f"ts_vars column {c!r} collides with id/time var")
                if c in self.static_vars:
                    raise ValueError(f"column {c!r} is in both ts_vars and static_vars")
                if c in seen:
                    raise ValueError(f"column {c!r} appears in ts_vars groups {seen[c]!r} and {group!r}")
                seen[c] = group

    @classmethod
    def build(
        cls,
        df: DataFrame,
        id_var: str,
        time_var: str,
        ts_vars=None,
        static_vars: list[str] | None = None,
        partitioning: str | None = None,
    ) -> "TableDescriptor":
        d = cls(
            id_var=id_var,
            time_var=time_var,
            ts_vars=normalize_ts_vars(df.columns, id_var, time_var, ts_vars, static_vars),
            static_vars=list(static_vars or []),
            partitioning=partitioning,
        )
        d.validate(df)
        return d

    def to_dict(self) -> dict:
        return {
            "id_var": self.id_var,
            "time_var": self.time_var,
            "ts_variables": self.ts_vars,
            "static_vars": self.static_vars,
            "partitioning": self.partitioning,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TableDescriptor":
        return cls(
            id_var=d["id_var"],
            time_var=d["time_var"],
            ts_vars={k: list(v) for k, v in d.get("ts_variables", {}).items()},
            static_vars=list(d.get("static_vars", [])),
            partitioning=d.get("partitioning"),
        )
