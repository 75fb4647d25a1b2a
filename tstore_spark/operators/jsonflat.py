"""JSON flattening: semi-structured sidecar metadata -> typed-ish columns.

Crawl pipelines carry JSON sidecars (fetch metadata, extraction reports,
label payloads) next to the page row. Spark's ``schema_of_json`` needs a
FOLDABLE literal (one sampled row — silently wrong on heterogeneous feeds),
and ``spark.read.json`` re-reads the corpus through an RDD. This module
does it relationally:

* **Discovery** (:func:`json_leaf_paths`): one bounded aggregation per
  depth level — each level asks ``json_object_keys`` of the objects at the
  current frontier paths (pure JVM expressions) and collects the DISTINCT
  (path, key) set, which is schema-sized, never corpus-sized. A path is
  expanded while ANY row holds an object there; everything else is a leaf.
  Deterministic: paths come back sorted.
* **Extraction** (:func:`flatten_json`): one whole-stage-codegen projection
  of ``get_json_object`` per leaf path — no Python, no shuffle, no state.
  Values arrive as strings (JSON scalars verbatim, arrays/objects as JSON
  text); cast downstream where a real type is known. This is the
  engine-portable contract (DuckDB's ``json_extract_string`` twins it).

Scale notes: discovery is ``max_depth`` scans of ONLY the json column
(column-pruned); on 10^12 rows run it on a deterministic sample or a single
crawl batch and pass the result as ``paths=`` — extraction cost does not
depend on how paths were obtained. Keys containing ``.`` ``'`` ``[`` or
``]`` are refused loudly: they would make bracket paths ambiguous and
dotted output names collide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FORBIDDEN = (".", "'", "[", "]")


def _bracket_path(parts: list[str]) -> str:
    return "$" + "".join(f"['{p}']" for p in parts)


def json_leaf_paths(
    df: DataFrame, json_col: str = "meta", max_depth: int = 4
) -> list[str]:
    """Sorted dotted leaf paths present anywhere in ``json_col`` up to
    ``max_depth`` levels (level 1 = top-level keys). A path observed as an
    object in ANY row is expanded (its non-object occurrences elsewhere
    read NULL for the children); at ``max_depth`` remaining objects become
    leaves (their JSON text is the value)."""
    if max_depth < 1:
        raise ValueError(f"max_depth must be >= 1, got {max_depth}")
    j = F.col(json_col)
    frontier: list[list[str]] = [[]]
    leaves: list[list[str]] = []
    for depth in range(max_depth):
        if not frontier:
            break
        # distinct (path, key) pairs of the objects at the frontier paths:
        # explode -> DISTINCT is map-side combined and schema-bounded (a
        # collect_list of per-row key arrays would be corpus-sized state)
        structs = [
            F.struct(
                F.lit(".".join(parts)).alias("path"),
                F.json_object_keys(
                    j if not parts else F.get_json_object(j, _bracket_path(parts))
                ).alias("keys"),
            )
            for parts in frontier
        ]
        pairs = (
            df.select(F.explode(F.array(*structs)).alias("s"))
            .select(F.col("s.path").alias("path"), F.explode("s.keys").alias("key"))
            .distinct()
            .collect()
        )
        key_map: dict[str, list[str]] = {}
        for r in pairs:
            key_map.setdefault(r["path"], []).append(r["key"])
        key_map = {p: sorted(ks) for p, ks in key_map.items()}
        nxt: list[list[str]] = []
        for parts in frontier:
            ks = key_map.get(".".join(parts), [])
            if not ks:
                if parts:
                    leaves.append(parts)  # object nowhere -> leaf
                continue
            for k in ks:
                if any(c in k for c in _FORBIDDEN):
                    raise ValueError(
                        f"json_leaf_paths: key {k!r} under "
                        f"{'.'.join(parts) or '$'} contains a path "
                        "metacharacter — flatten this feed with explicit "
                        "paths= instead"
                    )
                nxt.append(parts + [k])
        frontier = nxt
    leaves.extend(frontier)  # depth budget exhausted: objects become leaves
    return sorted(".".join(p) for p in leaves if p)


def flatten_json(
    df: DataFrame,
    json_col: str = "meta",
    paths: list[str] | None = None,
    max_depth: int = 4,
    prefix: str = "",
    drop: bool = True,
) -> DataFrame:
    """Add one STRING column per leaf path (dotted name, optional
    ``prefix``): scalars verbatim, arrays/objects as JSON text, missing ->
    NULL. ``paths=None`` discovers them (see :func:`json_leaf_paths`);
    pass explicit paths on corpus-scale inputs. Pure projection."""
    if paths is None:
        paths = json_leaf_paths(df, json_col, max_depth)
    if not paths:
        raise ValueError(f"flatten_json: no leaf paths found in {json_col!r}")
    j = F.col(json_col)
    cols = [
        F.get_json_object(j, _bracket_path(p.split("."))).alias(prefix + p)
        for p in paths
    ]
    keep = [c for c in df.columns if c != json_col or not drop]
    return df.select(*keep, *cols)
