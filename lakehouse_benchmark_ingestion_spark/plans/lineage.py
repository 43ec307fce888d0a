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


@dataclass
class MetricsRow:
    """One maintenance STAGE of one run — the observability record the
    reference exposes over its REST monitor port (MainRunner.java:145-212)
    and Arctic's optimizer metrics. Lineage rows are per-partition progress
    for RESUME; metrics rows are per-stage walls for OPERATORS."""

    run_id: str
    table: str
    op: str  # compact | cluster | rewrite_manifests | expire_snapshots | ...
    started_ms: int
    wall_ms: int
    files_in: int = 0
    files_out: int = 0
    rows: int = 0
    bytes_in: int = 0
    bytes_out: int = 0
    snapshot_id: int = -1
    extra: dict | None = None  # op-specific (e.g. partial_commits, skipped)


class MetricsLog:
    """Append-only per-table metrics journal under ``<table>/metrics/``.

    One atomic JSON file per (run, op) — same write-temp + os.replace
    protocol as lineage, so a crash can't torn-write an entry. O(runs)
    driver-side reads; never touches data files."""

    def __init__(self, table_location: str):
        self.dir = os.path.join(table_location, "metrics")
        os.makedirs(self.dir, exist_ok=True)

    def write(self, row: MetricsRow) -> None:
        # per-dir sequence breaks started_ms ties (sub-ms stages) so
        # lexicographic filename order == write order
        seq = sum(1 for n in os.listdir(self.dir) if n.endswith(".json"))
        final = os.path.join(
            self.dir, f"{row.started_ms:015d}-{seq:06d}-{row.run_id}-{row.op}.json"
        )
        tmp = final + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(asdict(row), f)
        os.replace(tmp, final)

    def all_rows(self) -> list[MetricsRow]:
        out = []
        for name in sorted(os.listdir(self.dir)):  # sorted = started_ms order
            if name.endswith(".json"):
                with open(os.path.join(self.dir, name)) as f:
                    out.append(MetricsRow(**json.load(f)))
        return out

    def last_run(self) -> list[MetricsRow]:
        rows = self.all_rows()
        if not rows:
            return []
        last = rows[-1].run_id
        return [r for r in rows if r.run_id == last]
