"""Per-partition maintenance lineage: checkpoint + resume (north_rule).

The reference gets resumability from Flink's checkpointed binlog offsets
(FsStateBackend, 60 s interval — MainRunner.java:85-88). Our batch analogue:
every maintenance task appends ONE atomic JSON record (write-temp +
os.replace) under ``<table>/lineage/``; an interrupted run re-plans from the
SAME pinned snapshot, skips tasks whose lineage row is already ``done`` (the
output files are still on disk), and only then commits — so a crash anywhere
before the final commit leaves the table on the old snapshot (isolation) and
a resume never recompacts finished partitions.

Schema per FIXTURES.md §3: run_id, op, partition_id, files_in, files_out,
rows, bytes_in, bytes_out, snapshot_id, status.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass


@dataclass
class LineageRow:
    run_id: str
    op: str  # compact | cluster | rewrite_manifests | expire_snapshots | merge
    partition_id: int
    files_in: int
    files_out: int
    rows: int
    bytes_in: int
    bytes_out: int
    snapshot_id: int  # snapshot the plan was pinned to
    status: str  # done | pending
    output_paths: list[str] | None = None  # engine-internal: resume needs them


class LineageLog:
    def __init__(self, table_location: str):
        self.dir = os.path.join(table_location, "lineage")
        os.makedirs(self.dir, exist_ok=True)

    def _path(self, run_id: str, op: str, partition_id: int) -> str:
        return os.path.join(self.dir, f"{run_id}-{op}-{partition_id:06d}.json")

    def write(self, row: LineageRow) -> None:
        """Atomic single-task checkpoint."""
        final = self._path(row.run_id, row.op, row.partition_id)
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(asdict(row), f)
        os.replace(tmp, final)

    def read(self, run_id: str, op: str, partition_id: int) -> LineageRow | None:
        p = self._path(run_id, op, partition_id)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return LineageRow(**json.load(f))

    def done_tasks(self, run_id: str, op: str) -> dict[int, LineageRow]:
        out: dict[int, LineageRow] = {}
        prefix = f"{run_id}-{op}-"
        for name in os.listdir(self.dir):
            if name.startswith(prefix) and name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    row = LineageRow(**json.load(f))
                if row.status == "done":
                    out[row.partition_id] = row
        return out

    def all_rows(self) -> list[LineageRow]:
        out = []
        for name in sorted(os.listdir(self.dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(LineageRow(**json.load(f)))
        return out
