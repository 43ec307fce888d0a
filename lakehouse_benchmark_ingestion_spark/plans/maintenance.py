"""Full maintenance suite orchestration.

Runs, in order: bin-packing compaction → global cluster (Z/Hilbert) →
manifest rewrite → snapshot expiration. Each stage commits its own snapshot
(all-or-nothing), checkpoints lineage, and is individually resumable. This
is the engine-level equivalent of what the reference leaves to each format's
background services (Hudi online compaction HudiCatalogSync.java:172-175,
Arctic self-optimizing ArcticCatalogSync.java:121-128).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from ..icelite import metadata as md
from ..icelite.table import IceliteTable
from ..operators.clustering import cluster
from ..operators.compaction import compact
from ..operators.compaction import delete_debt as _file_debt
from ..operators.expire_snapshots import expire_snapshots
from ..operators.manifest_rewrite import rewrite_manifests

# snapshot operations that COUNT as maintenance (reset the trigger clock)
# vs write commits (advance it)
_MAINT_OPS = {"replace", "rewrite-manifests"}
_WRITE_OPS = {"append", "merge", "merge-mor", "delete-mor", "delete-pos"}


def run_full_maintenance(
    spark: SparkSession,
    table: IceliteTable,
    target_file_size: int = 128 * 1024 * 1024,
    curve: str = "zorder",
    n_salts: int = 1,
    expire_keep_last: int = 2,
    run_id: str | None = None,
    max_concurrent_groups: int = 8,
) -> dict:
    # per-table resource quota (the engine's analogue of Arctic's optimizer
    # quota, ArcticCatalogSync.java:121-128 / ingestion-conf.yaml:21): a
    # table property caps how much of the cluster THIS table's maintenance
    # may take, regardless of what the invoking job asks for.
    quota = table.meta.properties.get("maintenance.max-concurrent-groups")
    if quota is not None:
        max_concurrent_groups = min(max_concurrent_groups, int(quota))

    import time
    import uuid as _uuid

    from .lineage import MetricsLog, MetricsRow

    run_id = run_id or _uuid.uuid4().hex[:12]
    mlog = MetricsLog(table.location)
    table_name = os.path.basename(table.location)

    def timed(op: str, fn) -> dict:
        t0 = time.monotonic()
        started = md.now_ms()
        m = fn()
        mlog.write(
            MetricsRow(
                run_id=run_id,
                table=table_name,
                op=op,
                started_ms=started,
                wall_ms=int((time.monotonic() - t0) * 1000),
                files_in=int(m.get("files_in", 0)),
                files_out=int(m.get("files_out", 0)),
                rows=int(m.get("rows", 0)),
                bytes_in=int(m.get("bytes_in", 0)),
                bytes_out=int(m.get("bytes_out", 0)),
                snapshot_id=int(m.get("snapshot_id", -1)),
                extra={
                    k: v
                    for k, v in m.items()
                    if k in ("skipped", "partial_commits", "groups",
                             "groups_resumed", "expired", "kept")
                },
            )
        )
        return m

    # per-table delete-debt threshold (Iceberg's delete-file-threshold as a
    # table property): files addressed by >= N delete sidecars are rewritten
    # by the suite's compaction regardless of size, materializing the deletes
    dft_prop = table.meta.properties.get("compaction.delete-file-threshold")
    dft = int(dft_prop) if dft_prop is not None else None

    metrics: dict = {}
    metrics["compact"] = timed("compact", lambda: compact(
        spark, table, target_file_size=target_file_size, curve=curve,
        n_salts=n_salts, run_id=run_id,
        max_concurrent_groups=max_concurrent_groups,
        delete_file_threshold=dft,
    ))
    if table.bucket_spec is None:
        metrics["cluster"] = timed("cluster", lambda: cluster(
            spark, table, curve=curve, target_file_size=target_file_size,
            n_salts=n_salts,
        ))
    metrics["rewrite_manifests"] = timed(
        "rewrite_manifests", lambda: rewrite_manifests(table)
    )
    # derived-index freshness: sync every registered text/ANN index to the
    # head BEFORE snapshot expiration — each index's CDC catch-up diffs
    # from its recorded base-snapshot watermark, which expiration is about
    # to make unreachable (same auto-freshness contract as the stats
    # sidecars; opt-out via index-sync.auto=false). The suite's own
    # rewrites are an EMPTY logical diff, so when no writes landed since
    # the last sync this is a watermark move, not work.
    if (
        table.meta.properties.get("index-sync.auto", "true") == "true"
        and table.meta.properties.get("derived.indexes")
        and table.meta.current_snapshot_id is not None
    ):
        from ..operators.index_sync import sync_registered_indexes

        def _isync() -> dict:
            r = sync_registered_indexes(spark, table)
            return {"files_out": r["synced"], "rows": r["indexes"],
                    "snapshot_id": table.meta.current_snapshot_id}

        metrics["index_sync"] = timed("index_sync", _isync)
    metrics["expire_snapshots"] = timed(
        "expire_snapshots",
        lambda: expire_snapshots(table, keep_last=expire_keep_last),
    )
    # refresh the partition statistics file at the post-maintenance head
    # (Iceberg computes partition stats as part of maintenance for the same
    # reason: the freshly-compacted layout is exactly when per-partition
    # counts are worth caching). Opt-out via table property.
    if (
        table.meta.properties.get("partition-stats.auto", "true") == "true"
        and table.meta.current_snapshot_id is not None
    ):
        from ..operators.partition_stats import write_partition_stats

        def _pstats() -> dict:
            r = write_partition_stats(spark, table)
            return {"files_out": 1, "rows": r["n_partitions"],
                    "snapshot_id": r["snapshot_id"]}

        metrics["partition_stats"] = timed("partition_stats", _pstats)
    # NDV sidecar: refresh at the post-maintenance head when one is
    # registered (incremental — scans only files the suite rewrote/added).
    # Opt-out via ndv-stats.auto=false; no-op when never built.
    if (
        table.meta.properties.get("ndv-stats.auto", "true") == "true"
        and table.meta.properties.get("ndv-stats.path")
        and table.meta.current_snapshot_id is not None
    ):
        from ..operators.ndv_stats import refresh_ndv_stats

        def _ndv() -> dict:
            r = refresh_ndv_stats(spark, table)
            return {"files_out": r["files_scanned"], "rows": 0,
                    "snapshot_id": r["snapshot_id"]}

        metrics["ndv_stats"] = timed("ndv_stats", _ndv)
    # opt-in post-suite integrity proof (maintenance.validate=true): the
    # metadata + file tiers of the fsck at the post-maintenance head, so a
    # rewrite that corrupted the table is caught by the run that did it,
    # not by the next reader. Recorded in the journal; a dirty report also
    # raises — maintenance must not hand off a table it just broke.
    if table.meta.properties.get("maintenance.validate", "") == "true":
        from ..operators.validate import validate_table

        def _validate() -> dict:
            r = validate_table(spark, table)
            if not r["ok"]:
                raise RuntimeError(
                    f"post-maintenance validation failed: {r['issues'][:5]}"
                )
            return {"files_out": r["files_checked"], "rows": 0,
                    "snapshot_id": r["snapshot_id"]}

        metrics["validate"] = timed("validate", _validate)
    return metrics


def _index_freshness(table: IceliteTable, head_sid: int) -> dict[str, str]:
    """'fresh' | 'stale' | 'dead' per registered derived index."""
    import json as _json

    from ..operators.index_sync import watermark_of

    raw = table.meta.properties.get("derived.indexes")
    out: dict[str, str] = {}
    for loc in _json.loads(raw) if raw else []:
        try:
            props = IceliteTable.load(loc).meta.properties
        except FileNotFoundError:
            out[loc] = "dead"
            continue
        wm = watermark_of(props)
        out[loc] = "fresh" if wm == head_sid else "stale"
    return out


def _stats_freshness(table: IceliteTable, head_sid: int, prop: str) -> str:
    """'absent' | 'fresh' | 'stale' for a snapshot-pinned stats sidecar
    registration (ndv-stats / partition-stats)."""
    reg = table.meta.properties.get(prop)
    if reg is None:
        return "absent"
    return "fresh" if reg == str(head_sid) else "stale"


def table_health(table: IceliteTable, small_file_bytes: int = 32 * 1024 * 1024) -> dict:
    """Operational health report, metadata-only (no Spark job): the
    numbers an operator checks before deciding what maintenance to run —
    small-file debt, delete debt (eq/pos/DV split), clustering staleness,
    snapshot/manifest accretion, partition skew (from recorded tuples),
    row-lineage coverage. The engine's `ANALYZE`/`DESCRIBE EXTENDED`
    composite over the same manifests every planner reads."""
    import json as _json

    from ..icelite import manifest as mf

    snap = table.current_snapshot()
    if snap is None:
        # same shape as the normal report (consumers tabulate keys across
        # tables; a just-created table must not break `analyze --all`)
        return {
            "snapshot_id": None,
            "snapshots": len(table.meta.snapshots),
            "manifests": 0,
            "files": 0,
            "rows": 0,
            "bytes": 0,
            "small_files": 0,
            "small_file_ratio": 0.0,
            "eq_delete_files": 0,
            "eq_delete_keys": 0,
            "pos_delete_files": 0,
            "dv_sidecars": 0,
            "deleted_positions": 0,
            "max_delete_debt": 0,
            "sort_orders": [],
            "unsorted_files": 0,
            "partitions": 0,
            "partition_row_skew": 0.0,
            "lineage_files": 0,
            "lineage_coverage": 0.0,
            "partition_spec": _json.loads(
                table.meta.properties.get("partition-spec", "null")
            ),
            "ndv_stats": "absent"
            if table.meta.properties.get("ndv-stats.snapshot-id") is None
            else "stale",
            "partition_stats": "absent"
            if table.meta.properties.get("partition-stats.snapshot-id") is None
            else "stale",
            # no snapshot -> nothing to be fresh AGAINST; report stale per
            # registered index (same key set as the populated shape)
            "derived_indexes": _index_freshness(table, -1),
            "properties": {
                k: v
                for k, v in table.meta.properties.items()
                if k.startswith(("write.", "row-lineage", "maintenance."))
            },
        }
    data = table.data_files(snap.snapshot_id)
    eq = table.delete_files(snap.snapshot_id)
    pos = table.pos_delete_files(snap.snapshot_id)
    dvs = [d for d in pos if d.delete_format == mf.DELETE_FORMAT_DV]
    small = [f for f in data if f.file_size_bytes < small_file_bytes]
    by_part: dict[str, int] = {}
    for f in data:
        by_part[f.partition_json] = by_part.get(f.partition_json, 0) + f.record_count
    skew = (
        round(max(by_part.values()) / (sum(by_part.values()) / len(by_part)), 2)
        if by_part and sum(by_part.values())
        else 0.0
    )
    curves = {f.sort_order or "none" for f in data}
    unsorted = sum(1 for f in data if not f.sort_order)
    lineage_files = sum(
        1
        for f in data
        if f.first_row_id is not None or f.lineage == mf.LINEAGE_MATERIALIZED
    )
    return {
        "snapshot_id": snap.snapshot_id,
        "snapshots": len(table.meta.snapshots),
        "manifests": len(snap.manifests),
        "files": len(data),
        "rows": sum(f.record_count for f in data),
        "bytes": sum(f.file_size_bytes for f in data),
        "small_files": len(small),
        "small_file_ratio": round(len(small) / len(data), 3) if data else 0.0,
        "eq_delete_files": len(eq),
        "eq_delete_keys": sum(f.record_count for f in eq),
        "pos_delete_files": len(pos) - len(dvs),
        "dv_sidecars": len(dvs),
        "deleted_positions": sum(f.record_count for f in pos),
        # worst per-file delete debt (sidecars that may address one file;
        # operators/compaction.delete_debt) — the signal for setting
        # compact(delete_file_threshold=)
        "max_delete_debt": max(_file_debt(table).values(), default=0),
        "sort_orders": sorted(curves),
        "unsorted_files": unsorted,
        "partitions": len(by_part),
        "partition_row_skew": skew,
        "lineage_files": lineage_files,
        "lineage_coverage": round(lineage_files / len(data), 3) if data else 0.0,
        "partition_spec": _json.loads(
            table.meta.properties.get("partition-spec", "null")
        ),
        # stats-sidecar freshness: stale registered stats are a maintenance
        # signal (refresh-ndv / write-partition-stats), not an error
        "ndv_stats": _stats_freshness(
            table, snap.snapshot_id, "ndv-stats.snapshot-id"
        ),
        "partition_stats": _stats_freshness(
            table, snap.snapshot_id, "partition-stats.snapshot-id"
        ),
        # derived-index freshness: per registered index, fresh when its
        # watermark is the head, stale when a sync is due, dead when the
        # index table no longer exists (the next sync GCs it)
        "derived_indexes": _index_freshness(table, snap.snapshot_id),
        "properties": {
            k: v
            for k, v in table.meta.properties.items()
            if k.startswith(("write.", "row-lineage", "maintenance."))
        },
    }


@dataclass
class CompactionPolicy:
    """``num_commits OR time`` trigger, mirroring the reference's online
    compaction config (HudiCatalogSync.java:172-175: trigger strategy
    ``num_or_time``, delta_commits=1, delta_seconds=120), gated on there
    being actual work (small files or outstanding eq-deletes)."""

    min_small_files: int = 8              # work gate: this many small files...
    small_file_bytes: int = 32 * 1024 * 1024  # ...below this size
    max_commits: int = 1                  # trigger: write commits since maintenance
    max_seconds: int = 120                # trigger: seconds since maintenance


def should_compact(
    table: IceliteTable,
    policy: CompactionPolicy | None = None,
    as_of_ms: int | None = None,
) -> dict:
    """Evaluate the trigger; returns a decision record a scheduler can log:
    ``{"compact": bool, "reason": str, ...evidence}``."""
    policy = policy or CompactionPolicy()
    as_of = as_of_ms if as_of_ms is not None else md.now_ms()

    history = table.history()
    last_maint_ms = None
    commits_since = 0
    for s in history:  # ascending snapshot order
        if s.operation in _MAINT_OPS:
            last_maint_ms = s.timestamp_ms
            commits_since = 0
        elif s.operation in _WRITE_OPS:
            commits_since += 1
    if last_maint_ms is None:
        last_maint_ms = history[0].timestamp_ms if history else as_of

    seconds_since = max(0, (as_of - last_maint_ms) // 1000)
    triggered = commits_since >= policy.max_commits or seconds_since >= policy.max_seconds
    if not triggered:
        # cheap short-circuit: the trigger reads ONLY the snapshot log; the
        # work gate below lists every live file (a manifest scan — heavy at
        # 10^7 files). Callers evaluating per micro-batch (streaming online
        # compaction) pay the listing only on batches where the trigger is
        # actually due.
        return {
            "compact": False,
            "reason": (
                f"not due: {commits_since} commits (< {policy.max_commits}), "
                f"{seconds_since}s since maintenance (< {policy.max_seconds}s)"
            ),
            "n_small_files": None,
            "n_files": None,
            "has_deletes": None,
            "commits_since_maintenance": commits_since,
            "seconds_since_maintenance": seconds_since,
        }

    files = table.data_files()
    n_small = sum(1 for f in files if f.file_size_bytes < policy.small_file_bytes)
    has_deletes = bool(table.delete_files()) or bool(table.pos_delete_files())
    # unpartitioned stragglers on a spec'd table (pre-spec files, MERGE COW
    # outputs) are layout debt compaction folds — they count as work
    has_stragglers = table.partition_spec is not None and any(
        f.partition_json == "{}" for f in files
    )

    work = n_small >= policy.min_small_files or has_deletes or has_stragglers
    decision = bool(work)
    if not work:
        reason = f"no work: {n_small} small files (< {policy.min_small_files}), no deletes"
    else:
        reason = (
            f"due: {n_small} small files, deletes={has_deletes}, "
            f"{commits_since} commits, {seconds_since}s since maintenance"
        )
    return {
        "compact": decision,
        "reason": reason,
        "n_small_files": n_small,
        "n_files": len(files),
        "has_deletes": has_deletes,
        "commits_since_maintenance": commits_since,
        "seconds_since_maintenance": seconds_since,
    }


def maintain_warehouse(
    spark: SparkSession,
    catalog,
    tables: list[str] | None = None,
    if_needed: bool = False,
    policy: CompactionPolicy | None = None,
    per_table_policy: dict[str, CompactionPolicy] | None = None,
    as_of_ms: int | None = None,
    **suite_kwargs,
) -> dict:
    """Whole-warehouse maintenance driver: discover every table in the
    catalog and run the full suite per table — the engine twin of the
    reference's whole-database sync loop, which iterates listTables() and
    fans one job out per table (BaseCatalogSync.java:63-101,
    SyncDbFunction.java:62-75). ``if_needed`` evaluates the compaction
    trigger policy first and skips tables with nothing due; per-table
    lineage stays in each table's own lineage log."""
    names = tables if tables is not None else catalog.list_tables()
    out: dict = {"tables": {}, "maintained": 0, "skipped": 0}
    for name in names:
        tbl = catalog.load_table(name)
        entry: dict = {}
        if if_needed:
            pol = (per_table_policy or {}).get(name, policy)
            entry["decision"] = should_compact(tbl, pol, as_of_ms=as_of_ms)
            if not entry["decision"]["compact"]:
                out["skipped"] += 1
                out["tables"][name] = entry
                continue
        entry["metrics"] = run_full_maintenance(spark, tbl, **suite_kwargs)
        out["maintained"] += 1
        out["tables"][name] = entry
    return out
