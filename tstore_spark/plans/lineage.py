"""Checkpoint/resume with per-partition lineage + metrics tables.

North rule: "resumable from checkpoint with per-partition lineage + metrics".
With Iceberg this would key on snapshot ids; on the Parquet fallback the
checkpoint key is the partition value (p_day) plus an input fingerprint
(count + xxhash of the partition's rows), which is the same idea: work is
skipped iff the partition was already processed from identical input.

Layout under <base_dir>/:
  lineage/part-*.json   — one record per completed (table, p_day):
                          {table, p_day, fingerprint, rows, run_id, completed_utc}
  metrics/part-*.json   — one record per run: rows in/out, seconds, tables

JSON-lines (driver-side, tiny) rather than a Spark write: lineage is
metadata-scale (#partitions), and appending must be atomic per partition —
a rename-into-place of a single small file, which object stores also support.
"""

from __future__ import annotations

import json
import os
import time
import uuid


class LineageLog:
    def __init__(self, base_dir: str):
        self.dir = os.path.join(base_dir, "lineage")
        os.makedirs(self.dir, exist_ok=True)

    def completed(self, table: str) -> dict[str, dict]:
        """p_day -> record for all completed partitions of `table`."""
        out: dict[str, dict] = {}
        for fname in sorted(os.listdir(self.dir)):
            if not fname.endswith(".json"):
                continue
            with open(os.path.join(self.dir, fname)) as f:
                rec = json.load(f)
            if rec["table"] == table:
                out[rec["p_day"]] = rec
        return out

    def mark_complete(self, table: str, p_day: str, fingerprint: str, rows: int, run_id: str) -> None:
        rec = {
            "table": table,
            "p_day": p_day,
            "fingerprint": fingerprint,
            "rows": rows,
            "run_id": run_id,
            "completed_utc": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        final = os.path.join(self.dir, f"{table}__{p_day}.json")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, final)  # atomic per-partition commit


class MetricsLog:
    def __init__(self, base_dir: str):
        self.dir = os.path.join(base_dir, "metrics")
        os.makedirs(self.dir, exist_ok=True)

    def record(self, run_id: str, payload: dict) -> None:
        path = os.path.join(self.dir, f"run-{run_id}.json")
        with open(path, "w") as f:
            json.dump({"run_id": run_id, **payload}, f, indent=2, sort_keys=True)

    def runs(self) -> list[dict]:
        out = []
        for fname in sorted(os.listdir(self.dir)):
            if fname.endswith(".json"):
                with open(os.path.join(self.dir, fname)) as f:
                    out.append(json.load(f))
        return out
