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
    table: IceliteTable,
    min_manifests: int = 2,
    run_id: str | None = None,
    timestamp_ms: int | None = None,
    by_partition: bool | None = None,
    max_partition_manifests: int = 128,
) -> dict:
    """Collapse the snapshot's manifests.

    ``by_partition`` (default: auto — on iff the table has a partition
    spec) clusters entries into ONE manifest per partition tuple instead of
    one global manifest — Iceberg's RewriteManifests grouping. Each
    manifest's footer summary then carries a single-tuple partition list,
    so a transformed predicate skips whole manifests footer-only
    (plan_data_files): plan cost for a bucket point lookup drops from
    O(files) to O(files in one bucket). Falls back to the single merged
    manifest when tuple cardinality exceeds ``max_partition_manifests``
    (manifest-per-tuple would explode plan I/O the other way)."""
    run_id = run_id or uuid.uuid4().hex[:12]
    snap = table.current_snapshot()
    if snap is None or len(snap.manifests) < min_manifests:
        return {"manifests_in": 0 if snap is None else len(snap.manifests), "manifests_out": 0}

    files = mf.read_manifests(table.location, snap.manifests)
    if by_partition is None:
        by_partition = table.partition_spec is not None
    groups: list[list[mf.DataFile]]
    if by_partition:
        by_tuple: dict[str, list[mf.DataFile]] = {}
        for f in files:
            # delete files ride with the "{}" straggler manifest: they are
            # table-wide (eq-deletes) or path-addressed (pos-deletes), not
            # partition-scoped, so they must never be skipped by a
            # partition-pruned plan
            key = f.partition_json if f.content == mf.CONTENT_DATA else "{}"
            by_tuple.setdefault(key, []).append(f)
        if len(by_tuple) > max_partition_manifests:
            groups = [files]
        else:
            groups = [by_tuple[k] for k in sorted(by_tuple)]
    else:
        groups = [files]
    merged = [mf.write_manifest(table.location, g) for g in groups]
    n_in, n_out = len(snap.manifests), len(merged)

    def mutate(meta: md.TableMetadata) -> md.TableMetadata:
        cur = meta.snapshot()
        sid = md.new_snapshot_id(meta)
        new = md.Snapshot(
            snapshot_id=sid,
            parent_id=meta.current_snapshot_id,
            timestamp_ms=timestamp_ms or md.now_ms(),
            operation="rewrite-manifests",
            manifests=list(merged),
            summary={"manifests-in": str(len(cur.manifests)), "manifests-out": str(n_out)},
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
            files_out=n_out,
            rows=sum(f.record_count for f in files),
            bytes_in=0,
            bytes_out=0,
            snapshot_id=new_meta.current_snapshot_id,
            status="done",
        )
    )
    return {"manifests_in": n_in, "manifests_out": n_out, "snapshot_id": new_meta.current_snapshot_id}
