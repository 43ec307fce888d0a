"""Snapshot expiration + orphan-file GC.

Iceberg-semantics retention: drop snapshots older than a TTL (and/or beyond
keep-last-k), always keeping the current snapshot; then delete data files
and manifests referenced ONLY by expired snapshots. Readers pinned to an
expired snapshot id get a KeyError — the isolation contract the north_rule
tests ("expired snapshots become unreadable", SURVEY.md §5.3).

``as_of_ms`` is injectable so retention tests are deterministic (no
wall-clock in test paths).
"""

from __future__ import annotations

import os
import uuid

from ..icelite import manifest as mf
from ..icelite import metadata as md
from ..icelite.table import IceliteTable
from ..plans.lineage import LineageLog, LineageRow


def expire_snapshots(
    table: IceliteTable,
    older_than_ms: int | None = None,
    keep_last: int = 1,
    as_of_ms: int | None = None,
    delete_files: bool = True,
    run_id: str | None = None,
) -> dict:
    run_id = run_id or uuid.uuid4().hex[:12]
    as_of = as_of_ms if as_of_ms is not None else md.now_ms()
    keep_last = max(1, keep_last)

    # derived-index watermarks pin their snapshots like refs do: an index's
    # CDC catch-up diffs FROM its recorded base snapshot — expiring it makes
    # the index permanently unsyncable (rebuild-only). Computed outside the
    # commit mutate (reads other tables' metadata, not this table's).
    index_watermarks: set[int] = set()
    reg = table.meta.properties.get("derived.indexes")
    if reg:
        import json as _json

        from .index_sync import watermark_of

        for loc in _json.loads(reg):
            try:
                props = IceliteTable.load(loc).meta.properties
            except FileNotFoundError:
                continue  # dead registration — sync GCs it
            wm = watermark_of(props)
            if wm is not None:
                index_watermarks.add(wm)

    expired_ids: list[int] = []

    def mutate(meta: md.TableMetadata) -> md.TableMetadata:
        expired_ids.clear()
        ordered = sorted(meta.snapshots, key=lambda s: s.snapshot_id)
        protected = {s.snapshot_id for s in ordered[-keep_last:]}
        if meta.current_snapshot_id is not None:
            protected.add(meta.current_snapshot_id)
        # named refs pin their snapshots: a tagged or branch-head snapshot
        # never expires (Iceberg ref-aware retention)
        protected.update(int(r["snapshot_id"]) for r in meta.refs.values())
        # ...and so do registered derived-index watermarks (see above)
        protected.update(index_watermarks)
        kept: list[md.Snapshot] = []
        for s in ordered:
            if s.snapshot_id in protected:
                kept.append(s)
            elif older_than_ms is not None and (as_of - s.timestamp_ms) < older_than_ms:
                kept.append(s)
            else:
                expired_ids.append(s.snapshot_id)
        meta.snapshots = kept
        meta.last_updated_ms = as_of
        return meta

    if not expired_snapshot_candidates(table, older_than_ms, keep_last, as_of):
        return {"expired": 0, "deleted_data_files": 0, "deleted_manifests": 0}

    new_meta = md.commit(table.location, mutate)

    deleted_files = 0
    deleted_manifests = 0
    if delete_files and expired_ids:
        # GC: anything referenced by surviving snapshots is protected.
        live_manifests: set[str] = set()
        for s in new_meta.snapshots:
            live_manifests.update(s.manifests)
        live_files = {f.path for f in mf.read_manifests(table.location, list(live_manifests))}

        meta_dir = md.metadata_dir(table.location)
        for name in os.listdir(meta_dir):
            if name.startswith("manifest-") and name not in live_manifests:
                for f in mf.read_manifest(table.location, name):
                    if f.path not in live_files and os.path.exists(f.path):
                        os.remove(f.path)
                        deleted_files += 1
                os.remove(os.path.join(meta_dir, name))
                deleted_manifests += 1

    LineageLog(table.location).write(
        LineageRow(
            run_id=run_id,
            op="expire_snapshots",
            partition_id=0,
            files_in=deleted_files,
            files_out=0,
            rows=0,
            bytes_in=0,
            bytes_out=0,
            snapshot_id=new_meta.current_snapshot_id or -1,
            status="done",
        )
    )
    return {
        "expired": len(expired_ids),
        "expired_ids": expired_ids,
        "deleted_data_files": deleted_files,
        "deleted_manifests": deleted_manifests,
    }


def expired_snapshot_candidates(
    table: IceliteTable, older_than_ms: int | None, keep_last: int, as_of: int
) -> list[int]:
    meta = table.meta
    ordered = sorted(meta.snapshots, key=lambda s: s.snapshot_id)
    protected = {s.snapshot_id for s in ordered[-max(1, keep_last):]}
    if meta.current_snapshot_id is not None:
        protected.add(meta.current_snapshot_id)
    protected.update(int(r["snapshot_id"]) for r in meta.refs.values())
    out = []
    for s in ordered:
        if s.snapshot_id in protected:
            continue
        if older_than_ms is not None and (as_of - s.timestamp_ms) < older_than_ms:
            continue
        out.append(s.snapshot_id)
    return out
