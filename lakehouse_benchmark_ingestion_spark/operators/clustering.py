"""Global Z-order / Hilbert clustering rewrite.

Where compaction bin-packs small files locally, ``cluster`` rewrites the
WHOLE table into globally key-disjoint, internally-sorted files — one global
``repartitionByRange(n, _ckey)`` (sampled range boundaries) followed by
``sortWithinPartitions(_ckey)``, the exact two stages the north_rule names.
After clustering, per-file min/max stats on the clustering dims make scans
over (source, n_tok, doc_id-hash) prune aggressively.

At 100 TB this runs per table-partition (one range shuffle per partition)
rather than one monolithic job; the primitive is identical.
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import SparkSession

from ..functions.hashing import row_salt_expr
from ..functions.zorder import with_cluster_key
from ..icelite import manifest as mf
from ..icelite import metadata as md
from ..icelite.table import IceliteTable
from ..plans.lineage import LineageLog, LineageRow
from .compaction import DEFAULT_TARGET_FILE_SIZE


def _already_clustered(
    table: IceliteTable, snap, files, curve: str, accept_ops: tuple[str, ...]
) -> bool:
    """True iff a re-cluster would reproduce the exact current layout.

    Sound when the head snapshot IS a same-curve rewrite in ``accept_ops``
    with no outstanding deletes and every live file already carries
    ``sort_order == curve`` — any append/merge/delete since the rewrite
    would be a NEWER head commit and fail the check. ``accept_ops`` is
    ("cluster",) on unpartitioned tables (a multi-group bin-pack compact
    leaves files internally sorted but NOT globally range-disjoint, so it
    must not satisfy a GLOBAL cluster) and ("cluster", "compact") on
    partitioned tables, where cluster itself delegates to the per-partition
    compact rewrite and the layouts coincide. At 100 TB a blind re-run is
    the single most expensive no-op possible: a full-table shuffle +
    rewrite that changes nothing."""
    return (
        bool(files)
        and snap.operation == "replace"
        and snap.summary.get("op") in accept_ops
        and snap.summary.get("curve") == curve
        and not table.delete_files(snap.snapshot_id)
        and not table.pos_delete_files(snap.snapshot_id)
        and all(f.sort_order == curve for f in files)
    )


def _skip_result(files, snap, run_id: str) -> dict:
    return {
        "files_in": len(files),
        "files_out": len(files),
        "skipped": "already-clustered",
        "snapshot_id": snap.snapshot_id,
        "run_id": run_id,
    }


def cluster(
    spark: SparkSession,
    table: IceliteTable,
    curve: str = "zorder",
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    n_salts: int = 1,
    run_id: str | None = None,
    timestamp_ms: int | None = None,
    _retry_on_delete_conflict: bool = True,
) -> dict:
    run_id = run_id or uuid.uuid4().hex[:12]
    if table.bucket_spec is not None:
        raise ValueError(
            "global clustering would destroy the hash-bucket layout "
            "(key->bucket routing); use compact() — it Z-sorts within each "
            "bucket and never mixes buckets in a group"
        )
    snap = table.current_snapshot()
    if snap is None:
        return {"files_in": 0, "files_out": 0, "run_id": run_id}
    files = table.data_files(snap.snapshot_id)
    if not files:
        return {"files_in": 0, "files_out": 0, "run_id": run_id}
    if table.partition_spec is not None:
        # hidden-partitioned table: a GLOBAL ckey-range rewrite would mix
        # partitions in one file. Cluster WITHIN partitions instead: an
        # all-files compaction plan — its group rewrite applies the same
        # ckey repartitionByRange + sortWithinPartitions per partition and
        # folds unpartitioned stragglers under the current spec. Same
        # idempotence skip as the unpartitioned path: without it every
        # run_full_maintenance cycle rewrites 100% of the table even when
        # every file already carries the requested sort order.
        if _already_clustered(
            table, snap, files, curve, accept_ops=("cluster", "compact")
        ):
            return _skip_result(files, snap, run_id)
        from .compaction import compact, plan_compaction

        plan = plan_compaction(
            table,
            target_file_size,
            min_input_files=1,
            small_file_threshold=float("inf"),
        )
        return compact(
            spark, table, target_file_size, curve=curve, n_salts=n_salts,
            run_id=run_id, plan=plan, timestamp_ms=timestamp_ms,
        )
    del_files = table.delete_files(snap.snapshot_id)
    if _already_clustered(table, snap, files, curve, accept_ops=("cluster",)):
        return _skip_result(files, snap, run_id)
    new_seq = table.next_sequence_number()
    bytes_in = sum(f.file_size_bytes for f in files)
    rows_in = sum(f.record_count for f in files)
    n_out = max(1, -(-bytes_in // target_file_size))

    # the ONE shared delete-applied rewrite reader (table.rewrite_reader):
    # materializes outstanding eq-deletes and masks pos-deletes, pinned to
    # this snapshot — a drifted private copy of that logic would silently
    # resurrect deleted rows in the clustered outputs
    lineage_on = table.row_lineage_enabled()
    if lineage_on and del_files:
        # mid-life enablement edge — same resolution as compaction: no ids
        # yet → plain rewrite assigns the first ones; ids present → the
        # eq-deletes must be converted before a preserving rewrite exists
        if any(
            f.first_row_id is not None or f.lineage == mf.LINEAGE_MATERIALIZED
            for f in files
        ):
            raise ValueError(
                "row-lineage table has outstanding equality deletes AND "
                "id-carrying files; run convert-eq-deletes first, then "
                "cluster"
            )
        lineage_on = False
    if lineage_on:
        # v3 row-lineage tables: rewrites preserve _row_id /
        # _last_updated_sequence_number by materializing them (same contract
        # as compaction; lineage tables carry no eq-deletes by construction)
        df = table.lineage_read(spark, files, snapshot_id=snap.snapshot_id)
    else:
        df = table.rewrite_reader(
            spark, snapshot_id=snap.snapshot_id, delete_files=del_files
        )(files)
    # zorder uses the Catalyst morton expression — the range sampler
    # re-evaluates the key, which must not trigger a second Python pass
    df = with_cluster_key(df, curve=curve)
    if n_salts > 1:
        # row-unique salt: splits even identical-key runs (see
        # row_salt_expr), which a key-derived salt cannot
        df = df.withColumn("_salt", row_salt_expr(n_salts))
        df = df.repartitionByRange(n_out, "_salt", "_ckey").drop("_salt")
    else:
        df = df.repartitionByRange(n_out, "_ckey")
    df = df.sortWithinPartitions("_ckey").drop("_ckey")

    out_dir = os.path.join(table.location, "data", f"cl-{run_id}")
    df.write.mode("overwrite").parquet(out_dir)
    out_paths = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))

    added = mf.harvest_stats(out_paths)
    for s in added:
        s.sequence_number = new_seq
        s.sort_order = curve  # globally range-disjoint AND file-sorted
        if lineage_on:
            s.lineage = mf.LINEAGE_MATERIALIZED
    LineageLog(table.location).write(
        LineageRow(
            run_id=run_id,
            op="cluster",
            partition_id=0,
            files_in=len(files),
            files_out=len(out_paths),
            rows=rows_in,
            bytes_in=bytes_in,
            bytes_out=sum(f.file_size_bytes for f in added),
            snapshot_id=snap.snapshot_id,
            status="done",
            output_paths=out_paths,
        )
    )
    # a global rewrite consumes every data file, so every eq- AND pos-delete
    # file is materialized into the outputs — drop them all in the commit.
    # validate-no-new-deletes: a MOR delete landing mid-rewrite was not
    # applied by the pinned reader above — abort and replan (same race as
    # compaction; the retry reads from the post-delete head)
    pos_files = table.pos_delete_files(snap.snapshot_id)
    try:
        new_snap = table.replace_files(
            {f.path for f in files}
            | {d.path for d in del_files}
            | {d.path for d in pos_files},
            added,
            operation="replace",
            summary={"op": "cluster", "curve": curve, "run-id": run_id},
            timestamp_ms=timestamp_ms,
            validate_no_new_deletes_since=snap.snapshot_id,
        )
    except md.ValidationFailed:
        if not _retry_on_delete_conflict:
            raise
        return cluster(
            spark, table, curve=curve, target_file_size=target_file_size,
            n_salts=n_salts, timestamp_ms=timestamp_ms,
            _retry_on_delete_conflict=False,
        )
    return {
        "files_in": len(files),
        "files_out": len(out_paths),
        "bytes_in": bytes_in,
        "rows": rows_in,
        "snapshot_id": new_snap.snapshot_id,
        "run_id": run_id,
    }
