"""Bin-packing small-file compaction with Z/Hilbert-sorted rewrite.

The reference NEVER compacts in its own code — it relies on the formats'
online compaction (Hudi: trigger every 1 delta commit or 120 s,
HudiCatalogSync.java:172-175; Arctic: self-optimizing quota groups,
ArcticCatalogSync.java:121-128; Iceberg: left to offline maintenance). Its
60 s checkpoint cadence (MainRunner.java:86) produces one small file per
table per minute — the exact pathology this operator fixes.

Design for 100 TB:
  - the PLAN is driver-side pure Python over manifest stats (tiny — file
    count, not row count);
  - each group's REWRITE is a distributed job reading only that group's
    files: cluster-key (pandas UDF) → ``repartitionByRange`` on the key
    (optionally salted for duplicate-key skew) → ``sortWithinPartitions``
    → parquet write — the two explicit stages the north_rule names;
  - groups commit in ONE atomic replace-files snapshot at the end, so an
    interruption leaves readers on the old snapshot;
  - per-group lineage rows (files_in/out, rows, bytes) make an interrupted
    run resumable without recompacting finished groups (plans/lineage.py).
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..functions.hashing import row_salt_expr
from ..functions.zorder import with_cluster_key
from ..icelite import manifest as mf
from ..icelite import partition as ps
from ..icelite.table import IceliteTable
from ..plans.lineage import LineageLog, LineageRow

DEFAULT_TARGET_FILE_SIZE = 128 * 1024 * 1024  # Iceberg's default write target


@dataclass
class CompactionGroup:
    group_id: int
    files: list[mf.DataFile]
    bucket: int = -1  # preserved on outputs for hash-bucketed tables
    # hidden-partitioning tuple shared by every file in the group ("{}" =
    # unpartitioned; on a spec'd table such stragglers are folded back into
    # partitions by a partition-aware rewrite)
    partition_json: str = "{}"

    @property
    def bytes_in(self) -> int:
        return sum(f.file_size_bytes for f in self.files)

    @property
    def rows_in(self) -> int:
        return sum(f.record_count for f in self.files)


@dataclass
class CompactionPlan:
    snapshot_id: int
    target_file_size: int
    groups: list[CompactionGroup] = field(default_factory=list)


def delete_debt(
    table: IceliteTable,
    snapshot_id: int | None = None,
    all_files: list[mf.DataFile] | None = None,
) -> dict[str, int]:
    """Per-data-file count of delete sidecars that may address it — pure
    manifest metadata, no sidecar bodies read (Iceberg's
    ``delete-file-threshold`` accounting): an equality-delete file counts
    against every data file with a LOWER sequence number (the v2 strict-<
    rule, icelite/mor.py); a pos/DV sidecar counts against the data files
    inside its recorded ``file_path`` bounds — exact when the sidecar was
    stats-harvested on file_path (every engine writer does), conservative
    all-files otherwise.

    ``all_files`` lets the caller share ONE manifest enumeration: the
    per-content accessors (data_files/delete_files/pos_delete_files) each
    re-parse every manifest, and at 10^6 files one parse pass is ~30 s of
    driver time (tools/plan_scale_bench.py) — three of them tripled the
    cost of a single sweep."""
    snap = table.current_snapshot()
    sid = snapshot_id if snapshot_id is not None else (
        snap.snapshot_id if snap else None
    )
    if sid is None:
        return {}
    from bisect import bisect_right

    entries = all_files if all_files is not None else table.all_files(sid)
    files = [f for f in entries if f.content == mf.CONTENT_DATA]
    eq = [f for f in entries if f.content == mf.CONTENT_EQ_DELETES]
    pos = [f for f in entries if f.content == mf.CONTENT_POS_DELETES]
    # O((F+S) log S), not O(F*S) — at 10^7 files x 10^3 sidecars the naive
    # double loop is a 10^10-step driver stall.
    # eq-deletes: debt = #eq files with seq > f.seq -> bisect a sorted list
    eq_seqs = sorted(e.sequence_number for e in eq)
    # pos/DV sidecars: interval stabbing over recorded file_path bounds via
    # a sweep in path order; boundless sidecars cover everything
    unbounded = 0
    starts: list[tuple[str, int]] = []  # (path, +1 at lo / -1 after hi)
    for s in pos:
        lo = s.lower_bounds.get("file_path") if s.lower_bounds else None
        hi = s.upper_bounds.get("file_path") if s.upper_bounds else None
        if lo is None or hi is None:
            unbounded += 1
        else:
            starts.append((str(lo), +1))
            starts.append((str(hi) + "\0", -1))  # closes AFTER hi inclusively
    starts.sort()
    debt: dict[str, int] = {}
    active = 0
    ei = 0
    for f in sorted(files, key=lambda f: f.path):
        while ei < len(starts) and starts[ei][0] <= f.path:
            active += starts[ei][1]
            ei += 1
        d = len(eq_seqs) - bisect_right(eq_seqs, f.sequence_number)
        debt[f.path] = d + active + unbounded
    return debt


def plan_compaction(
    table: IceliteTable,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    min_input_files: int = 2,
    small_file_threshold: float = 0.75,
    max_group_size: int | None = None,
    where: dict | None = None,
    spec_migration: bool = False,
    delete_file_threshold: int | None = None,
) -> CompactionPlan:
    """Greedy first-fit-decreasing bin packing of small files.

    Files already >= ``small_file_threshold * target`` are left alone
    (rewriting them buys nothing). Candidates are sorted descending and
    packed into bins of ~``max_group_size`` (default 8× target — cf.
    Iceberg's rewrite max-file-group-size vs target-file-size split); each
    group's rewrite job then range-splits into ceil(bytes/target) output
    files, so one group-job is itself a WIDE job — few jobs (fixed job
    latency stays negligible) but full shuffle parallelism. A bin with
    fewer than ``min_input_files`` inputs is dropped (rewrite amplification
    guard). Deterministic given the snapshot — resume re-derives the
    identical plan.
    """
    snap = table.current_snapshot()
    if snap is None:
        return CompactionPlan(snapshot_id=-1, target_file_size=target_file_size)
    if max_group_size is None:
        max_group_size = 8 * target_file_size
    # ONE manifest enumeration feeds both the candidate list and (when the
    # delete-file-threshold pass is on) the debt sweep: at 10^6 files each
    # full parse is ~30 s of driver time, and the planner used to pay four
    all_entries = table.all_files(snap.snapshot_id)
    files = [f for f in all_entries if f.content == mf.CONTENT_DATA]
    if where:
        # targeted compaction (Iceberg rewrite_data_files(filter) parity):
        # restrict candidates to files the predicate cannot rule out, via
        # the same shared pruning stack every reader uses; whole files are
        # rewritten (file-level filter), non-matching files stay untouched
        keep = {f.path for f in table.select_data_files(where, snap.snapshot_id)}
        files = [f for f in files if f.path in keep]
    has_pspec = table.partition_spec is not None
    debt_paths: set[str] = set()
    if spec_migration:
        # spec-migration mode (Iceberg: RewriteDataFiles always writes the
        # table's CURRENT spec): candidates are exactly the files whose
        # recorded tuple belongs to an older spec (or none) — any size,
        # every one rewritten; conforming files are never touched, so the
        # pass is idempotent (second run plans zero groups).
        small = [
            f for f in files
            if not ps.conforms(f.partition_json, table.partition_spec)
        ]
    else:
        # delete-debt candidates (Iceberg rewrite_data_files
        # delete-file-threshold): a file addressed by >= threshold delete
        # sidecars is rewritten REGARDLESS of size — the rewrite reads
        # through the delete-applied reader, materializing the deletes, and
        # the commit GCs the now-dead sidecars (the read-side anti-join
        # cost disappears). Opt-in: None disables (existing plans unchanged).
        if delete_file_threshold is not None:
            debt = delete_debt(
                table, snap.snapshot_id, all_files=all_entries
            )
            debt_paths = {
                p for p, d in debt.items() if d >= delete_file_threshold
            }
        small = [
            f
            for f in files
            if f.file_size_bytes < small_file_threshold * target_file_size
            # unpartitioned stragglers on a spec'd table are ALWAYS candidates
            # (regardless of size): the fold is layout healing, not bin packing
            or (has_pspec and f.partition_json == "{}")
            or f.path in debt_paths
        ]

    # bucketed tables (Hudi-style bucket index): never mix buckets in one
    # group — outputs must stay single-bucket so key→bucket routing holds.
    # Partitioned tables (hidden partitioning): never mix partitions either —
    # a compaction output must belong to exactly one partition tuple.
    by_key: dict[tuple, list[mf.DataFile]] = {}
    for f in small:
        by_key.setdefault((f.bucket, f.partition_json), []).append(f)

    plan = CompactionPlan(snapshot_id=snap.snapshot_id, target_file_size=target_file_size)
    gid = 0
    for bucket, pjson in sorted(by_key):
        cand = sorted(by_key[(bucket, pjson)], key=lambda f: (-f.file_size_bytes, f.path))
        bins: list[list[mf.DataFile]] = []
        bin_sizes: list[int] = []
        for f in cand:
            placed = False
            for i in range(len(bins)):
                if bin_sizes[i] + f.file_size_bytes <= max_group_size:
                    bins[i].append(f)
                    bin_sizes[i] += f.file_size_bytes
                    placed = True
                    break
            if not placed:
                bins.append([f])
                bin_sizes.append(f.file_size_bytes)
        for b in bins:
            if (
                len(b) < min_input_files
                and not (has_pspec and pjson == "{}")
                and not spec_migration
                # a solo delete-debt rewrite IS the point: materialize
                and not any(f.path in debt_paths for f in b)
            ):
                continue
            plan.groups.append(
                CompactionGroup(
                    group_id=gid,
                    files=sorted(b, key=lambda f: f.path),
                    bucket=bucket,
                    partition_json=pjson,
                )
            )
            gid += 1
    return plan


def _rewrite_group(
    spark: SparkSession,
    table: IceliteTable,
    group: CompactionGroup,
    out_tag: str,
    curve: str,
    target_file_size: int,
    n_salts: int,
    reader,
) -> list[str]:
    """Distributed rewrite of one group; returns output file paths.

    ``reader`` is the table's shared delete-applied rewrite reader, pinned
    to the PLAN snapshot (table.rewrite_reader) — outputs are delete-free
    and partial commits landing mid-run cannot shift the delete set.
    ``out_tag`` embeds the plan snapshot id: a resume replans from a NEW
    snapshot and must write to fresh directories — reusing (run_id, gid)
    paths would overwrite files an earlier partial commit already
    published."""
    df = reader(group.files)
    df = with_cluster_key(df, curve=curve)

    out_dir = os.path.join(
        table.location, "data", f"rw-{out_tag}-g{group.group_id:06d}"
    )
    pspec = table.partition_spec
    if pspec is not None and not ps.conforms(group.partition_json, pspec):
        # layout healing: files whose tuple doesn't belong to the CURRENT
        # spec — "{}" stragglers (pre-spec data, MERGE COW outputs) AND
        # old-spec-era files after spec evolution (Iceberg parity:
        # RewriteDataFiles always writes the table's current spec) — are
        # re-laid-out under it: partition-aware write, ckey-sorted within
        # each partition, so the layout self-heals instead of accreting an
        # ever-growing foreign-layout residue. maxRecordsPerFile derived
        # from the group's own bytes/row ratio keeps fold outputs near the
        # target size — an unsplittable giant would violate it forever.
        per_file = max(
            1, int(group.rows_in * target_file_size / max(group.bytes_in, 1))
        )
        return ps.write_partitioned(
            df,
            pspec,
            out_dir,
            max_records_per_file=per_file,
            sort_within=["_ckey"],
            drop_cols=["_ckey"],
            mode="overwrite",  # resumable: a crashed attempt's dir is replaced
        )

    n_out = max(1, -(-group.bytes_in // target_file_size))  # ceil
    if n_out == 1:
        # single-output groups skip the range-sampling job: plain shuffle
        # to one partition, then in-partition sort — same file contents
        df = df.repartition(1)
    elif n_salts > 1:
        # salt INSIDE the range-partition key, OUTSIDE the sort key
        # (SURVEY.md §7.3): duplicate-ckey hot spots split across salts,
        # while each output file stays internally ckey-sorted. Row-unique
        # salt: a key-derived salt cannot split rows whose key columns are
        # IDENTICAL (re-ingested doc / CDC churn), the worst hot run.
        df = df.withColumn("_salt", row_salt_expr(n_salts))
        df = df.repartitionByRange(n_out, "_salt", "_ckey").drop("_salt")
    else:
        df = df.repartitionByRange(n_out, "_ckey")
    df = df.sortWithinPartitions("_ckey").drop("_ckey")

    df.write.mode("overwrite").parquet(out_dir)
    import glob

    return sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))


def compact(
    spark: SparkSession,
    table: IceliteTable,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    curve: str = "zorder",
    n_salts: int = 1,
    run_id: str | None = None,
    plan: CompactionPlan | None = None,
    fail_after_groups: int | None = None,
    timestamp_ms: int | None = None,
    max_concurrent_groups: int = 8,
    max_group_size: int | None = None,
    partial_progress_commits: int | None = None,
    delete_conflict_retries: int = 1,
    where: dict | None = None,
    spec_migration: bool = False,
    delete_file_threshold: int | None = None,
) -> dict:
    """Compaction with validate-no-new-deletes: every commit (partial and
    final) validates that no eq-/pos-delete file landed after the PLAN
    snapshot — a concurrent MOR delete committed mid-rewrite was not
    applied during the group reads, and its sequence number would not gate
    the rewritten outputs (strict ``<`` rule), so swapping would resurrect
    the deleted rows. On ``ValidationFailed`` the whole run replans from
    the current snapshot (which now includes the delete, so the group
    reads apply it) up to ``delete_conflict_retries`` times; already-
    shipped partial commits stay (each was validated at ITS commit time),
    and the abandoned attempt's outputs become orphans for the GC sweep.
    Iceberg parity: RewriteFiles#validateNoNewDeletesForDataFiles."""
    from ..icelite import metadata as md

    attempts = max(1, 1 + delete_conflict_retries)
    for attempt in range(attempts):
        try:
            return _compact_attempt(
                spark, table, target_file_size, curve, n_salts,
                run_id if attempt == 0 else None, plan if attempt == 0 else None,
                fail_after_groups, timestamp_ms, max_concurrent_groups,
                max_group_size, partial_progress_commits, where,
                spec_migration, delete_file_threshold,
            )
        except md.ValidationFailed:
            if attempt == attempts - 1:
                raise
    raise AssertionError("unreachable")


def _compact_attempt(
    spark: SparkSession,
    table: IceliteTable,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    curve: str = "zorder",
    n_salts: int = 1,
    run_id: str | None = None,
    plan: CompactionPlan | None = None,
    fail_after_groups: int | None = None,
    timestamp_ms: int | None = None,
    max_concurrent_groups: int = 8,
    max_group_size: int | None = None,
    partial_progress_commits: int | None = None,
    where: dict | None = None,
    spec_migration: bool = False,
    delete_file_threshold: int | None = None,
) -> dict:
    """Run (or resume) a compaction; returns metrics.

    Group rewrites are submitted CONCURRENTLY (thread pool → Spark's
    scheduler interleaves the jobs), so many small group-jobs keep all
    executors busy — the driver-side analogue of Hudi's compaction task
    parallelism (hudi.compaction.tasks, HudiCatalogSync.java:175). Each
    group still checkpoints its own lineage row atomically.

    ``run_id``: pass the same id to resume an interrupted run — groups with
    a ``done`` lineage row are skipped, their recorded output reused.
    ``fail_after_groups``: test hook — raise after N groups (simulated crash
    BEFORE the commit; the table must still read at the old snapshot);
    forces serial execution so the cut point is deterministic.
    ``partial_progress_commits``: commit an intermediate snapshot every N
    completed groups instead of one all-or-nothing swap (Iceberg's
    rewrite_data_files ``partial-progress.enabled``). Readers see finished
    groups early and a crash loses at most N groups of work. Lineage rows
    are keyed by the base snapshot in this mode, because a resume replans
    from a DIFFERENT snapshot (the last partial commit) and group ids from
    the old plan must not leak into the new one.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    if plan is None:
        plan = plan_compaction(
            table, target_file_size, max_group_size=max_group_size, where=where,
            spec_migration=spec_migration,
            delete_file_threshold=delete_file_threshold,
        )
    # everything below is pinned to the PLAN snapshot: delete set, group
    # reads, and resume matching — a run must be internally consistent even
    # while partial commits (or concurrent writers) move the head
    del_files = table.delete_files(plan.snapshot_id) if plan.snapshot_id != -1 else []
    new_seq = table.next_sequence_number()
    log = LineageLog(table.location)
    lineage_op = (
        "compact" if partial_progress_commits is None
        else f"compact@{plan.snapshot_id}"
    )
    # resume only absorbs rows from THE SAME plan: group ids are plan-local,
    # so a row from a run over a different snapshot naming the same gid
    # would splice the wrong outputs in (dropping this plan's group rows)
    done = {
        gid: row
        for gid, row in log.done_tasks(run_id, lineage_op).items()
        if row.snapshot_id == plan.snapshot_id
    }
    # rewrite outputs land under run_id+snapshot-tagged dirs: a same-run_id
    # resume replans from a NEW snapshot and must not overwrite directories
    # an earlier attempt's partial commits already published
    out_tag = f"{run_id}-s{plan.snapshot_id}"
    reader = (
        table.rewrite_reader(
            spark, snapshot_id=plan.snapshot_id, delete_files=del_files
        )
        if plan.snapshot_id != -1
        else None
    )
    # row-lineage tables (Iceberg v3): rewrites must PRESERVE each row's
    # _row_id / _last_updated_sequence_number — read them (manifest-derived
    # or already-materialized) and write them as physical columns; the
    # outputs are stamped lineage=materialized so the commit assigns them
    # no fresh ids. Lineage tables carry no eq-deletes (refused at commit),
    # so the delete-applied read is the pos/DV anti-join lineage_read does.
    # Mid-life enablement edge (eq-deletes predate the property): if no
    # file carries an id yet, fall back to the plain rewrite — the outputs
    # get their FIRST ids at commit, which both materializes the deletes
    # and un-bricks the table; if ids already exist, preserving them while
    # applying eq-deletes is impossible — point at convert-eq-deletes.
    lineage_on = table.row_lineage_enabled()
    if lineage_on and plan.snapshot_id != -1:
        if del_files:
            if any(
                f.first_row_id is not None
                or f.lineage == mf.LINEAGE_MATERIALIZED
                for f in table.data_files(plan.snapshot_id)
            ):
                raise ValueError(
                    "row-lineage table has outstanding equality deletes AND "
                    "id-carrying files; run convert-eq-deletes to re-express "
                    "them as position deletes, then compact"
                )
            lineage_on = False
        else:
            reader = lambda files: table.lineage_read(  # noqa: E731
                spark, files, snapshot_id=plan.snapshot_id
            )

    removed: set[str] = set()
    added_paths: list[str] = []
    bucket_by_path: dict[str, int] = {}
    part_json_by_path: dict[str, str] = {}
    pspec = table.partition_spec

    def _effective_pjson(group: CompactionGroup) -> str:
        """Tuple to record for a group's outputs: groups being HEALED to the
        current spec ("{}" stragglers / old-spec eras) get their outputs'
        tuples from the ``_p`` path components in _finalize — recording the
        group's old tuple would mislabel the new layout."""
        if pspec is not None and ps.conforms(group.partition_json, pspec):
            return group.partition_json
        return "{}"

    skipped = 0
    todo: list[CompactionGroup] = []
    for group in plan.groups:
        if group.group_id in done:
            row = done[group.group_id]
            added_paths.extend(row.output_paths or [])
            bucket_by_path.update({p: group.bucket for p in row.output_paths or []})
            part_json_by_path.update(
                {p: _effective_pjson(group) for p in row.output_paths or []}
            )
            removed.update(f.path for f in group.files)
            skipped += 1
        else:
            todo.append(group)

    def run_one(group: CompactionGroup) -> list[str]:
        out_paths = _rewrite_group(
            spark, table, group, out_tag, curve, target_file_size, n_salts,
            reader,
        )
        log.write(
            LineageRow(
                run_id=run_id,
                op=lineage_op,
                partition_id=group.group_id,
                files_in=len(group.files),
                files_out=len(out_paths),
                rows=group.rows_in,
                bytes_in=group.bytes_in,
                bytes_out=sum(os.path.getsize(p) for p in out_paths),
                snapshot_id=plan.snapshot_id,
                status="done",
                output_paths=out_paths,
            )
        )
        return out_paths

    def _finalize(paths: list[str]) -> list[mf.DataFile]:
        """Harvest + stamp manifest stats for a set of rewrite outputs."""
        stats = mf.harvest_stats(paths)
        for s in stats:
            s.sequence_number = new_seq
            s.bucket = bucket_by_path.get(s.path, -1)
            # rewrite outputs are ckey-sorted within each file — record the
            # order so cluster() can prove a re-sort is redundant
            s.sort_order = curve
            # single-partition groups pass their tuple through;
            # straggler-fold outputs carry _p dirs the path parse recovers
            s.partition_json = part_json_by_path.get(s.path, "{}")
            if s.partition_json == "{}" and pspec is not None:
                s.partition_json = ps.partition_json_from_path(
                    s.path, pspec, table.schema
                )
            if lineage_on:
                s.lineage = mf.LINEAGE_MATERIALIZED
        return stats

    def _absorb(group: CompactionGroup, out_paths: list[str]) -> None:
        removed.update(f.path for f in group.files)
        added_paths.extend(out_paths)
        bucket_by_path.update({p: group.bucket for p in out_paths})
        part_json_by_path.update({p: _effective_pjson(group) for p in out_paths})

    executed = 0
    partial_commits = 0
    committed_removed: set[str] = set()
    committed_paths: set[str] = set()
    # partial-progress accumulators (flushed every N completed groups)
    batch_removed: set[str] = set()
    batch_paths: list[str] = []
    batch_groups = 0

    def _after_group(group: CompactionGroup, out_paths: list[str]) -> None:
        nonlocal executed, batch_groups, partial_commits
        _absorb(group, out_paths)
        executed += 1
        if partial_progress_commits is None:
            return
        batch_removed.update(f.path for f in group.files)
        batch_paths.extend(out_paths)
        batch_groups += 1
        if batch_groups >= partial_progress_commits:
            table.replace_files(
                set(batch_removed),
                _finalize(list(batch_paths)),
                operation="replace",
                summary={
                    "op": "compact-partial",
                    "run-id": run_id,
                    "curve": curve,
                    "commit-seq": str(partial_commits),
                },
                timestamp_ms=timestamp_ms,
                validate_no_new_deletes_since=plan.snapshot_id,
            )
            partial_commits += 1
            committed_removed.update(batch_removed)
            committed_paths.update(batch_paths)
            batch_removed.clear()
            batch_paths.clear()
            batch_groups = 0

    if fail_after_groups is not None:
        for group in todo:
            if executed >= fail_after_groups:
                raise RuntimeError(
                    f"injected failure after {executed} groups (run_id={run_id})"
                )
            _after_group(group, run_one(group))
    elif todo:
        from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

        workers = max(1, min(max_concurrent_groups, len(todo)))
        with ThreadPoolExecutor(max_workers=workers) as pool:
            pending = {pool.submit(run_one, g): g for g in todo}
            while pending:
                ready, _ = wait(set(pending), return_when=FIRST_COMPLETED)
                for fut in ready:
                    group = pending.pop(fut)
                    # commits happen on the driver thread, in completion
                    # order — rewrite jobs keep running concurrently
                    _after_group(group, fut.result())

    if not plan.groups:
        return {"groups": 0, "files_in": 0, "files_out": 0, "run_id": run_id}

    # everything not shipped by a partial commit lands in the final swap
    added = _finalize([p for p in added_paths if p not in committed_paths])

    # eq-delete GC: a delete file is dead once no surviving data file has a
    # smaller sequence number (rewritten outputs carry new_seq >= its seq,
    # and their rows were delete-applied during the group read)
    survivors = [
        f for f in table.data_files(plan.snapshot_id) if f.path not in removed
    ]
    dead_deletes = {
        d.path
        for d in del_files
        if all(f.sequence_number >= d.sequence_number for f in survivors)
    }
    # pos-delete GC: a position-delete file is dead once every data file it
    # addresses was rewritten (its rows were applied during the group read).
    # Exact check: the referenced path set is the delete file's own
    # file_path column — a tiny column-pruned driver read, only at commit.
    survivor_paths = {f.path for f in survivors}
    for d in table.pos_delete_files(plan.snapshot_id):
        import pyarrow.parquet as _pq

        refs = set(
            _pq.read_table(d.path, columns=["file_path"])
            .column("file_path")
            .to_pylist()
        )
        if not (refs & survivor_paths):
            dead_deletes.add(d.path)

    snap = table.replace_files(
        (removed - committed_removed) | dead_deletes,
        added,
        operation="replace",
        summary={"op": "compact", "run-id": run_id, "curve": curve},
        timestamp_ms=timestamp_ms,
        validate_no_new_deletes_since=plan.snapshot_id,
    )
    return {
        "groups": len(plan.groups),
        "groups_executed": executed,
        "groups_resumed": skipped,
        "files_in": len(removed),
        "files_out": len(added_paths),
        "bytes_in": sum(g.bytes_in for g in plan.groups),
        "bytes_out": sum(os.path.getsize(p) for p in added_paths),
        "rows": sum(g.rows_in for g in plan.groups),
        "snapshot_id": snap.snapshot_id,
        "partial_commits": partial_commits,
        "run_id": run_id,
    }


def migrate_partition_spec(
    spark: SparkSession,
    table: IceliteTable,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    curve: str = "zorder",
    **kwargs,
) -> dict:
    """Migrate the whole live layout to the table's CURRENT partition spec.

    Spec evolution is metadata-only (future writes only — Iceberg parity);
    old-era files keep their recorded tuples. This pass completes the
    story the way Iceberg's ``rewrite_data_files`` does (RewriteDataFiles
    always writes under the current spec): it rewrites EXACTLY the live
    files whose tuple belongs to an older spec (or none), any size, laying
    them out under the current spec — and touches nothing else, so a
    second run plans zero groups (idempotent). With the spec dropped
    (``set_partition_spec(None)``) it folds partitioned eras back into
    plain files. All of compaction's machinery applies: snapshot-pinned
    delete-applied reads, per-group lineage (resumable), atomic
    validate-no-new-deletes commit, partial progress.
    """
    return compact(
        spark,
        table,
        target_file_size=target_file_size,
        curve=curve,
        spec_migration=True,
        **kwargs,
    )
