"""Orphan-file GC — Iceberg's ``remove_orphan_files`` analogue.

A crash between a distributed write and its snapshot commit leaves data
files on disk that NO snapshot references (the write-then-commit protocol
makes this the only inconsistency a crash can produce — readers never see
the orphans because manifests pin exact file lists). This op deletes them:

  orphans = files under data/  −  files referenced by ANY live snapshot
            (current or historical, data or eq-delete content)

``older_than_ms`` guards against racing an in-flight commit: a writer may
have finished its Parquet but not yet swapped version-hint — freshly
written files are skipped (Iceberg's default is the same 3-day-style grace
interval, scaled down for tests via the injectable clock).
"""

from __future__ import annotations

import os

from ..icelite import metadata as md
from ..icelite.table import IceliteTable
from ..plans.lineage import LineageLog, LineageRow


def remove_orphan_files(
    table: IceliteTable,
    older_than_ms: int = 3 * 24 * 3600 * 1000,
    as_of_ms: int | None = None,
    dry_run: bool = False,
    run_id: str | None = None,
) -> dict:
    import uuid

    run_id = run_id or uuid.uuid4().hex[:12]
    as_of = as_of_ms if as_of_ms is not None else md.now_ms()

    referenced = {f.path for f in _all_referenced(table)}
    data_root = os.path.join(table.location, "data")
    orphans: list[str] = []
    scanned = 0
    for dirpath, _dirs, names in os.walk(data_root):
        for name in names:
            if not name.endswith(".parquet"):
                continue
            scanned += 1
            p = os.path.join(dirpath, name)
            if p in referenced:
                continue
            age_ms = as_of - int(os.path.getmtime(p) * 1000)
            if age_ms < older_than_ms:
                continue  # possibly an in-flight commit
            orphans.append(p)

    deleted = 0
    freed = 0
    if not dry_run:
        emptied_dirs = set()
        for p in orphans:
            freed += os.path.getsize(p)
            os.remove(p)
            emptied_dirs.add(os.path.dirname(p))
            deleted += 1
        # sweep commit dirs left with no parquet — only writer sidecars
        # (_SUCCESS, .crc) remain after their data files were orphan-deleted.
        # Dirs this run just emptied are known-dead (their parquet passed the
        # age check) and sweep unconditionally; any OTHER sidecar-only dir
        # gets the same mtime grace as the parquet pass — an in-flight write
        # may have created its dir/sidecars but not landed parquet yet, and
        # ripping its scaffolding out would fail the commit.
        for dirpath, dirs, names in os.walk(data_root, topdown=False):
            if dirpath == data_root or dirs:
                continue
            if any(n.endswith(".parquet") for n in names):
                continue
            if dirpath not in emptied_dirs:
                newest_ms = max(
                    [int(os.path.getmtime(dirpath) * 1000)]
                    + [
                        int(os.path.getmtime(os.path.join(dirpath, n)) * 1000)
                        for n in names
                    ]
                )
                if as_of - newest_ms < older_than_ms:
                    continue  # possibly an in-flight commit's scaffolding
            for n in names:
                os.remove(os.path.join(dirpath, n))
            os.rmdir(dirpath)

    LineageLog(table.location).write(
        LineageRow(
            run_id=run_id,
            op="remove_orphans",
            partition_id=0,
            files_in=scanned,
            files_out=deleted,
            rows=0,
            bytes_in=0,
            bytes_out=freed,
            snapshot_id=table.current_snapshot().snapshot_id if table.current_snapshot() else -1,
            status="done",
        )
    )
    return {
        "scanned": scanned,
        "orphans": len(orphans),
        "deleted": deleted,
        "bytes_freed": freed,
        "dry_run": dry_run,
        "run_id": run_id,
    }


def _all_referenced(table: IceliteTable):
    meta = table.meta
    seen: set[str] = set()
    out = []
    from ..icelite import manifest as mf

    for s in meta.snapshots:
        for name in s.manifests:
            if name in seen:
                continue
            seen.add(name)
            out.extend(mf.read_manifest(table.location, name))
    return out
