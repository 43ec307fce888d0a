"""Table metadata: snapshots, versioned metadata JSON, atomic commit.

Mirrors (re-designed, not copied) the Iceberg v2 snapshot model the reference
enables at IcebergCatalogSync.java:115 (``format-version=2``). The reference's
exactly-once story is "Flink checkpoint == Iceberg snapshot commit"
(IcebergCatalogSync.java:73-74, 60 s cadence MainRunner.java:86); ours is an
atomic ``os.replace`` of ``version-hint.text`` with optimistic concurrency —
a new metadata version is created with ``open(..., "x")`` so two concurrent
committers cannot both claim version N+1 (SURVEY.md §7.3).

Timestamps are injectable (``clock_ms``) so snapshot-expiration tests are
deterministic (SURVEY.md §7.3 "no Date.now analogues").
"""

from __future__ import annotations

import json
import os
import time
import uuid
from dataclasses import asdict, dataclass, field
from typing import Callable

FORMAT_VERSION = 1


class CommitConflict(Exception):
    """Another writer committed the same metadata version."""


class ValidationFailed(CommitConflict):
    """A pre-commit validation (e.g. validate-no-new-deletes) found a
    conflicting concurrent commit; the operation must replan from the new
    table head rather than retry the same swap."""


@dataclass
class Snapshot:
    snapshot_id: int
    parent_id: int | None
    timestamp_ms: int
    operation: str  # append | replace | merge | expire | rewrite-manifests
    manifests: list[str]  # manifest file names relative to metadata/
    summary: dict = field(default_factory=dict)
    # Iceberg v3 row lineage: the first row id this snapshot's freshly-added
    # data rows were assigned from (None = lineage off, or no fresh rows).
    # Recorded for audit; the authoritative per-file value lives in the
    # manifest entry (DataFile.first_row_id), assigned inside the commit.
    first_row_id: int | None = None

    def to_dict(self) -> dict:
        return asdict(self)

    @staticmethod
    def from_dict(d: dict) -> "Snapshot":
        return Snapshot(
            snapshot_id=d["snapshot_id"],
            parent_id=d.get("parent_id"),
            timestamp_ms=d["timestamp_ms"],
            operation=d["operation"],
            manifests=list(d["manifests"]),
            summary=dict(d.get("summary", {})),
            first_row_id=d.get("first_row_id"),
        )


@dataclass
class TableMetadata:
    table_uuid: str
    location: str  # absolute table root
    schema_json: dict  # Spark StructType.jsonValue()
    current_snapshot_id: int | None
    snapshots: list[Snapshot]
    properties: dict = field(default_factory=dict)
    last_updated_ms: int = 0
    format_version: int = FORMAT_VERSION
    # schema evolution: current column name -> prior names, oldest last.
    # Data files written before a rename keep the old physical column; the
    # alias-aware reader coalesces across eras (Iceberg does this with field
    # IDs; name-lineage is the metadata-only equivalent for a JSON format).
    column_aliases: dict = field(default_factory=dict)
    # named refs (Iceberg v2 branches/tags): name -> {"snapshot_id": int,
    # "type": "tag" | "branch"}. Tags are immutable pins (time travel);
    # branches are movable heads that writes can target (write-audit-publish).
    refs: dict = field(default_factory=dict)
    # Iceberg v3 row-lineage counter: the next unassigned row id. Monotone —
    # rewrites/rollbacks never reclaim ids (paths and ids are never reused).
    next_row_id: int = 0

    # ---- accessors -------------------------------------------------------
    def snapshot(self, snapshot_id: int | None = None) -> Snapshot | None:
        sid = snapshot_id if snapshot_id is not None else self.current_snapshot_id
        if sid is None:
            return None
        for s in self.snapshots:
            if s.snapshot_id == sid:
                return s
        raise KeyError(f"snapshot {sid} not found (expired or never existed)")

    def to_dict(self) -> dict:
        return {
            "format_version": self.format_version,
            "table_uuid": self.table_uuid,
            "location": self.location,
            "schema": self.schema_json,
            "current_snapshot_id": self.current_snapshot_id,
            "snapshots": [s.to_dict() for s in self.snapshots],
            "properties": self.properties,
            "last_updated_ms": self.last_updated_ms,
            "column_aliases": self.column_aliases,
            "refs": self.refs,
            "next_row_id": self.next_row_id,
        }

    @staticmethod
    def from_dict(d: dict) -> "TableMetadata":
        return TableMetadata(
            table_uuid=d["table_uuid"],
            location=d["location"],
            schema_json=d["schema"],
            current_snapshot_id=d.get("current_snapshot_id"),
            snapshots=[Snapshot.from_dict(s) for s in d.get("snapshots", [])],
            properties=dict(d.get("properties", {})),
            last_updated_ms=d.get("last_updated_ms", 0),
            format_version=d.get("format_version", FORMAT_VERSION),
            column_aliases=dict(d.get("column_aliases", {})),
            refs=dict(d.get("refs", {})),
            next_row_id=d.get("next_row_id", 0),
        )


# ---- on-disk protocol ----------------------------------------------------

def metadata_dir(location: str) -> str:
    return os.path.join(location, "metadata")


def _hint_path(location: str) -> str:
    return os.path.join(metadata_dir(location), "version-hint.text")


def _metadata_path(location: str, version: int) -> str:
    return os.path.join(metadata_dir(location), f"v{version}.metadata.json")


def current_version(location: str) -> int:
    """Latest committed version: the hint, bumped past it if newer
    ``v*.metadata.json`` files already exist.

    The hint file is exactly that — a hint (Iceberg's
    HadoopTableOperations semantics): a winner creates
    ``v{N+1}.metadata.json`` (the atomic commit point) and THEN updates
    the hint, so a reader racing between those two steps sees a stale
    hint. Trusting it blindly livelocks the optimistic commit loop: the
    loser retries the same base version forever. Probing forward from
    the hint is O(lag) not O(history), and lag is at most the number of
    in-flight writers.
    """
    with open(_hint_path(location)) as f:
        v = int(f.read().strip())
    while os.path.exists(_metadata_path(location, v + 1)):
        v += 1
    return v


def read_metadata(location: str, version: int | None = None) -> TableMetadata:
    v = version if version is not None else current_version(location)
    with open(_metadata_path(location, v)) as f:
        return TableMetadata.from_dict(json.load(f))


def write_initial_metadata(meta: TableMetadata) -> None:
    os.makedirs(metadata_dir(meta.location), exist_ok=True)
    with open(_metadata_path(meta.location, 1), "x") as f:
        json.dump(meta.to_dict(), f, indent=1)
    tmp = _hint_path(meta.location) + f".tmp-{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        f.write("1")
    os.replace(tmp, _hint_path(meta.location))


def commit(
    location: str,
    mutate: Callable[[TableMetadata], TableMetadata],
    retries: int = 20,
) -> TableMetadata:
    """Optimistic-concurrency commit.

    Re-reads current metadata, applies ``mutate``, and attempts to claim the
    next version with an exclusive create. On conflict (another writer won),
    re-reads and retries ``mutate`` against the new base — the analogue of
    Iceberg's optimistic snapshot commit loop.
    """
    last_err: Exception | None = None
    for attempt in range(retries):
        base_version = current_version(location)
        try:
            meta = read_metadata(location, base_version)
        except FileNotFoundError as e:
            # probe → read race with a concurrent commit+metadata-GC that
            # deleted the probed version; re-probe (the GC retention floor
            # makes this need 2+ commits in the window — retry heals it)
            last_err = e
            continue
        new_meta = mutate(meta)
        new_meta.last_updated_ms = new_meta.last_updated_ms or now_ms()
        # claim v{N+1} by hard-linking a FULLY-WRITTEN temp file: the claim
        # is atomic AND carries complete content, so a concurrent
        # current_version() probe never reads a half-written JSON (a plain
        # open("x") + dump would expose that window)
        claim = _metadata_path(location, base_version + 1)
        tmp_meta = claim + f".tmp-{uuid.uuid4().hex}"
        with open(tmp_meta, "w") as f:
            json.dump(new_meta.to_dict(), f, indent=1)
        try:
            os.link(tmp_meta, claim)
        except FileExistsError as e:  # lost the race
            os.unlink(tmp_meta)
            last_err = e
            # jittered backoff (hash-derived, no global RNG state): under
            # heavy contention N writers otherwise re-read, re-mutate and
            # re-collide in lockstep
            time.sleep(
                0.01 * attempt * (1 + (hash((location, attempt, id(mutate))) % 97) / 97)
            )
            continue
        os.unlink(tmp_meta)
        tmp = _hint_path(location) + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(str(base_version + 1))
        os.replace(tmp, _hint_path(location))
        _gc_metadata_versions(location, base_version + 1, new_meta.properties)
        return new_meta
    raise CommitConflict(f"gave up after {retries} retries") from last_err


def _gc_metadata_versions(location: str, new_version: int, properties: dict) -> None:
    """Iceberg ``write.metadata.delete-after-commit.enabled`` parity: after
    a successful commit, keep the current metadata JSON plus the previous
    ``write.metadata.previous-versions-max`` (default 100) and unlink older
    ones. Safe because every version carries the FULL snapshot list — old
    versions are pure commit history, never consulted by reads (snapshot
    time travel resolves inside the current metadata). Best-effort: a
    concurrent GC racing on the same file is benign."""
    if str(properties.get(
        "write.metadata.delete-after-commit.enabled", ""
    )).lower() != "true":
        return
    try:
        keep = int(properties.get("write.metadata.previous-versions-max", 100))
    except (TypeError, ValueError):
        keep = 100
    floor = new_version - max(keep, 1)
    if floor < 1:
        return
    import re

    pat = re.compile(r"^v(\d+)\.metadata\.json$")
    try:
        names = os.listdir(metadata_dir(location))
    except OSError:
        return
    for name in names:
        m = pat.match(name)
        if m and int(m.group(1)) < floor:
            try:
                os.unlink(os.path.join(metadata_dir(location), name))
            except OSError:
                pass


def now_ms() -> int:
    return int(time.time() * 1000)


def new_snapshot_id(meta: TableMetadata) -> int:
    return 1 + max((s.snapshot_id for s in meta.snapshots), default=0)
