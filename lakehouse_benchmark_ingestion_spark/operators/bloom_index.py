"""Per-file Bloom-filter index for point-lookup file skipping.

Min/max stats (icelite/manifest.py) prune range predicates but are useless
for point lookups on high-cardinality keys once files overlap in range —
exactly the case after MOR merges land out-of-order keys. Iceberg solves
this with parquet bloom filters (`write.parquet.bloom-filter-enabled`); the
icelite equivalent is a snapshot-pinned sidecar: one small bitmap per data
file over a chosen column.

Build is DISTRIBUTED and one-pass: read only the indexed column plus
``_metadata.file_path`` (Catalyst prunes everything else), compute k hash
bit positions per value, and ``collect_set`` the positions per file — the
shuffle is O(files × bits), never O(rows). The hash family is
engine-portable by construction: ``h_i(v) = int(sha256("{i}:" + str(v))
[:15 hex], 16) % bits`` computes bit-identically in Spark
(sha2/conv/substring — all codegen built-ins) and in driver-side Python
(hashlib), so probing needs NO Spark job.

Probing composes with ``IceliteTable.scan(file_filter=...)``: a file whose
bitmap lacks any of the key's k bits provably does not contain the key; a
file missing from the sidecar (written after the build) is conservatively
kept. False positives only cost a wasted file read — never wrong results.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_K = 4
BITS_PER_KEY = 10  # with k=4: FP ~ (1 - e^(-4/10))^4 ≈ 1.2%
MIN_BITS = 8192
MAX_BITS = 1 << 23  # 1 MiB bitmap per file — the driver-side cap


def _positions_py(value, bits: int, k: int) -> list[int]:
    return [
        int(hashlib.sha256(f"{i}:{value}".encode()).hexdigest()[:15], 16) % bits
        for i in range(k)
    ]


def _position_cols(col: str, bits: int, k: int):
    return [
        (
            F.conv(
                F.substring(
                    F.sha2(F.concat(F.lit(f"{i}:"), F.col(col).cast("string")), 256),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("long")
            % bits
        ).alias(f"_p{i}")
        for i in range(k)
    ]


def _index_path(location: str, column: str, snapshot_id: int) -> str:
    return os.path.join(
        location, "metadata", f"bloom-{column}-{snapshot_id}.json"
    )


def build_bloom_index(
    spark: SparkSession,
    table,
    column: str,
    bits: int | None = None,
    k: int = DEFAULT_K,
) -> dict:
    """Build the per-file bloom sidecar for the CURRENT snapshot. Returns
    summary metrics. Re-running after new commits rebuilds for the new
    snapshot (sidecars are snapshot-pinned, like manifests).

    ``bits`` auto-sizes to BITS_PER_KEY × the largest file's row count
    (clamped to [MIN_BITS, MAX_BITS]) — an undersized bloom silently
    saturates and skips nothing; bitmaps are stored byte-packed + base64."""
    snap = table.current_snapshot()
    if snap is None:
        return {"files": 0}
    files = table.data_files(snap.snapshot_id)
    if not files:
        return {"files": 0}
    if bits is None:
        want = BITS_PER_KEY * max(f.record_count for f in files)
        bits = MIN_BITS
        while bits < want and bits < MAX_BITS:
            bits *= 2
    # raw read (not table.read_files): the _metadata pseudo-column only
    # exists on the scan relation itself. Renamed columns coalesce across
    # their recorded name lineage, mirroring read_files.
    raw = spark.read.parquet(*[f.path for f in files])
    aliases = table.meta.column_aliases.get(column, [])
    cands = [c for c in [column, *aliases] if c in raw.columns]
    if not cands:
        raise ValueError(f"column {column!r} not present in any data file")
    expr = F.coalesce(*[F.col(c) for c in cands]) if len(cands) > 1 else F.col(cands[0])
    df = raw.select(
        expr.alias(column), F.col("_metadata.file_path").alias("_fp")
    )
    pos = df.select(
        "_fp", F.explode(F.array(*_position_cols(column, bits, k))).alias("_p")
    )
    rows = (
        pos.groupBy("_fp")
        .agg(F.collect_set("_p").alias("_bits"))
        .collect()
    )
    # _metadata.file_path is a URI ("file:/abs/path" or "file:///abs/path");
    # realpath collapses the leftover leading slashes either way
    bitmap: dict[str, str] = {}
    n_bits_set = 0
    for r in rows:
        bm = bytearray(bits // 8)
        for p in r["_bits"]:
            bm[p >> 3] |= 1 << (p & 7)
        n_bits_set += len(r["_bits"])
        key = os.path.realpath(r["_fp"].removeprefix("file:"))
        bitmap[key] = base64.b64encode(bytes(bm)).decode("ascii")
    payload = {
        "column": column,
        "bits": bits,
        "k": k,
        "snapshot_id": snap.snapshot_id,
        "files": bitmap,
    }
    path = _index_path(table.location, column, snap.snapshot_id)
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(payload, fh)
    os.replace(tmp, path)
    return {
        "files": len(bitmap),
        "bits": bits,
        "bits_set_total": n_bits_set,
        "bytes": os.path.getsize(path),
        "snapshot_id": snap.snapshot_id,
        "path": path,
    }


def load_bloom_index(table, column: str, snapshot_id: int | None = None) -> dict | None:
    snap = table.current_snapshot() if snapshot_id is None else None
    sid = snapshot_id if snapshot_id is not None else (snap.snapshot_id if snap else None)
    if sid is None:
        return None
    path = _index_path(table.location, column, sid)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def bloom_file_filter(table, column: str, value, snapshot_id: int | None = None):
    """A ``scan(file_filter=...)`` callable that skips every file whose
    bloom bitmap proves ``column != value`` for all rows. Returns None when
    no index exists for the snapshot (caller falls back to stats-only)."""
    idx = load_bloom_index(table, column, snapshot_id)
    if idx is None:
        return None
    want = _positions_py(value, idx["bits"], idx["k"])
    bitmaps = {p: base64.b64decode(b) for p, b in idx["files"].items()}

    def keep(f) -> bool:
        bm = bitmaps.get(os.path.realpath(f.path))
        if bm is None:
            return True  # not indexed (newer than the build) — conservative
        return all(bm[p >> 3] & (1 << (p & 7)) for p in want)

    return keep
