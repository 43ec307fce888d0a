"""Manifest rewrite: compact many small manifests into one (no data movement).

Every append adds one manifest (icelite/table.py) — the metadata twin of the
reference's one-data-file-per-checkpoint cadence (MainRunner.java:86). Plan
time is driver-bound on manifest count, so periodically collapsing N
manifests into one keeps planning O(1) even after thousands of commits.
Pure metadata: data files are untouched, scan results are bit-identical.
"""

from __future__ import annotations

import uuid

from ..icelite import manifest as mf
from ..icelite import metadata as md
from ..icelite.table import IceliteTable
from ..plans.lineage import LineageLog, LineageRow


def rewrite_manifests(
    table: IceliteTable, min_manifests: int = 2, run_id: str | None = None, timestamp_ms: int | None = None
) -> dict:
    run_id = run_id or uuid.uuid4().hex[:12]
    snap = table.current_snapshot()
    if snap is None or len(snap.manifests) < min_manifests:
        return {"manifests_in": 0 if snap is None else len(snap.manifests), "manifests_out": 0}

    files = mf.read_manifests(table.location, snap.manifests)
    merged = mf.write_manifest(table.location, files)
    n_in = len(snap.manifests)

    def mutate(meta: md.TableMetadata) -> md.TableMetadata:
        cur = meta.snapshot()
        sid = md.new_snapshot_id(meta)
        new = md.Snapshot(
            snapshot_id=sid,
            parent_id=meta.current_snapshot_id,
            timestamp_ms=timestamp_ms or md.now_ms(),
            operation="rewrite-manifests",
            manifests=[merged],
            summary={"manifests-in": str(len(cur.manifests)), "manifests-out": "1"},
        )
        meta.snapshots.append(new)
        meta.current_snapshot_id = sid
        meta.last_updated_ms = new.timestamp_ms
        return meta

    new_meta = md.commit(table.location, mutate)
    LineageLog(table.location).write(
        LineageRow(
            run_id=run_id,
            op="rewrite_manifests",
            partition_id=0,
            files_in=n_in,
            files_out=1,
            rows=sum(f.record_count for f in files),
            bytes_in=0,
            bytes_out=0,
            snapshot_id=new_meta.current_snapshot_id,
            status="done",
        )
    )
    return {"manifests_in": n_in, "manifests_out": 1, "snapshot_id": new_meta.current_snapshot_id}
