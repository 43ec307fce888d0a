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

    # metadata sweep: manifests written by LOSING commit attempts (optimistic
    # retries rewrite the added manifest per attempt — row-id assignment,
    # replace_files races) and superseded partition-stats registrations are
    # referenced by no retained snapshot / property. Same age grace as data
    # files; version JSONs and the hint are NEVER candidates (they are the
    # commit history itself).
    meta = table.meta
    live_manifests = {n for s in meta.snapshots for n in s.manifests}
    reg_stats = meta.properties.get("partition-stats.path")
    # realpath both sides (as the ndv branch below does): the registered
    # path was recorded from table.location at write time, which may differ
    # textually from the current location string (symlink, trailing slash)
    reg_stats_dir = (
        os.path.realpath(os.path.dirname(reg_stats)) if reg_stats else None
    )
    # ndv-stats registers the sidecar DIRECTORY itself; every refresh
    # writes a new dir and re-points the property, so superseded ones are
    # orphans (same lifecycle as losing partition-stats registrations)
    reg_ndv_dir = meta.properties.get("ndv-stats.path")
    reg_ndv_dir = os.path.realpath(reg_ndv_dir) if reg_ndv_dir else None
    mdir = md.metadata_dir(table.location)
    meta_deleted = 0
    meta_orphans = 0
    for name in sorted(os.listdir(mdir)):
        p = os.path.join(mdir, name)
        if (
            name.startswith("manifest-")
            and name.endswith(".parquet")
            and name not in live_manifests
        ):
            paths = [p]
        elif (
            name.startswith("partition-stats-")
            and os.path.isdir(p)
            and os.path.realpath(p) != reg_stats_dir
        ):
            paths = [os.path.join(p, n) for n in os.listdir(p)] + [p]
        elif (
            name.startswith("ndv-stats-")
            and os.path.isdir(p)
            and os.path.realpath(p) != reg_ndv_dir
        ):
            paths = [os.path.join(p, n) for n in os.listdir(p)] + [p]
        else:
            continue
        newest = max(int(os.path.getmtime(x) * 1000) for x in paths)
        if as_of - newest < older_than_ms:
            continue
        meta_orphans += 1
        if not dry_run:
            for x in paths:
                (os.rmdir if os.path.isdir(x) else os.remove)(x)
            meta_deleted += 1

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
        "metadata_orphans": meta_orphans,
        "metadata_deleted": meta_deleted,
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


def remove_orphan_files_distributed(
    spark,
    table: IceliteTable,
    older_than_ms: int = 3 * 24 * 3600 * 1000,
    as_of_ms: int | None = None,
    dry_run: bool = False,
    run_id: str | None = None,
) -> dict:
    """Executor-side orphan sweep — the shape Iceberg's
    ``remove_orphan_files`` Spark action uses at real scale.

    The driver variant above materializes every referenced path in a Python
    set and ``os.walk``s the data tree on one machine — O(#files) driver
    memory and wall. Here both sides are DataFrames: the listing comes from
    Spark's binaryFile source (path/length/mtime only — content column never
    selected, so nothing is read), referenced paths come from reading ALL
    live manifests as parquet (manifests are parquet; executors parse them,
    the driver only knows their names), and orphans fall out of a
    broadcast-or-shuffle left-anti join. Deletion runs foreachPartition on
    executors — on an object store that is exactly where the DELETE calls
    should originate.
    """
    import uuid

    from pyspark.sql import functions as F

    run_id = run_id or uuid.uuid4().hex[:12]
    as_of = as_of_ms if as_of_ms is not None else md.now_ms()

    names: set[str] = set()
    for s in table.meta.snapshots:
        names.update(s.manifests)
    man_paths = [
        os.path.join(md.metadata_dir(table.location), n) for n in sorted(names)
    ]
    if man_paths:
        ref = spark.read.parquet(*man_paths).select(F.col("path").alias("p"))
    else:
        ref = spark.createDataFrame([], "p string")

    data_root = os.path.join(table.location, "data")
    if not os.path.isdir(data_root):
        return {"scanned": 0, "orphans": 0, "deleted": 0, "bytes_freed": 0,
                "dry_run": dry_run, "run_id": run_id}
    listing = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(data_root)
        .select(
            F.regexp_replace("path", "^file:(//)?", "").alias("p"),
            F.col("length").alias("bytes"),
            F.unix_millis("modificationTime").alias("mtime_ms"),
        )
    )
    scanned = listing.count()
    # AQE picks broadcast vs shuffle from the ref side's measured size
    orphans = listing.join(ref, "p", "left_anti").filter(
        F.lit(as_of) - F.col("mtime_ms") >= F.lit(older_than_ms)
    )
    stats = orphans.agg(
        F.count("*").alias("n"), F.coalesce(F.sum("bytes"), F.lit(0)).alias("b")
    ).collect()[0]
    n_orphans, freed = int(stats["n"]), int(stats["b"])

    deleted = 0
    if not dry_run and n_orphans:

        def _rm(rows):
            import os as _os

            for r in rows:
                try:
                    _os.remove(r.p)
                except FileNotFoundError:
                    pass

        orphans.select("p").foreachPartition(_rm)
        deleted = n_orphans

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
            snapshot_id=table.current_snapshot().snapshot_id
            if table.current_snapshot()
            else -1,
            status="done",
        )
    )
    return {
        "scanned": scanned,
        "orphans": n_orphans,
        "deleted": deleted,
        "bytes_freed": freed,
        "dry_run": dry_run,
        "run_id": run_id,
    }
