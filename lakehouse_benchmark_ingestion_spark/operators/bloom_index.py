"""Per-file Bloom-filter index for point-lookup file skipping.

Min/max stats (icelite/manifest.py) prune range predicates but are useless
for point lookups on high-cardinality keys once files overlap in range —
exactly the case after MOR merges land out-of-order keys. Iceberg solves
this with parquet bloom filters (`write.parquet.bloom-filter-enabled`); the
icelite equivalent is a snapshot-pinned sidecar: one small bitmap per data
file over a chosen column.

Build is DISTRIBUTED end-to-end: read only the indexed column plus
``_metadata.file_path`` (Catalyst prunes everything else), compute k hash
bit positions per value, ``collect_set`` the positions per file, pack each
file's bitmap with a vectorized pandas UDF, and WRITE THE SIDECAR AS
PARQUET — one row per data file ``(file_path, bitmap binary, n_set)``,
range-sorted by file_path. No bitmap ever rides to the driver: at 800k
files × 1 MiB bitmaps the sidecar is hundreds of GB, which the previous
driver-collected JSON design would have OOM'd on. A tiny JSON header
(column, bits, k, snapshot id — no bitmaps) is the only driver-side state.

Probing is LAZY: ``select_data_files`` passes the candidate files that
survived stats + partition pruning, and the probe reads ONLY those rows
from the sidecar via a parquet predicate on ``file_path`` (the sidecar is
file_path-sorted, so row-group stats prune the read to the touched
slivers). The hash family is engine-portable by construction:
``h_i(v) = int(sha256("{i}:" + str(v))[:15 hex], 16) % bits`` computes
bit-identically in Spark (sha2/conv/substring — all codegen built-ins) and
in driver-side Python (hashlib), so probing needs NO Spark job.

Probing composes with ``IceliteTable.scan(file_filter=...)``: a file whose
bitmap lacks any of the key's k bits provably does not contain the key; a
file missing from the sidecar (written after the build) is conservatively
kept. False positives only cost a wasted file read — never wrong results.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import urllib.parse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_K = 4
BITS_PER_KEY = 10  # with k=4: FP ~ (1 - e^(-4/10))^4 ≈ 1.2%
MIN_BITS = 8192
MAX_BITS = 1 << 23  # 1 MiB bitmap per file
SIDECAR_TARGET_BYTES = 128 * 1024 * 1024  # per sidecar parquet file


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


def _header_path(location: str, column: str, snapshot_id: int) -> str:
    return os.path.join(location, "metadata", f"bloom-{column}-{snapshot_id}.json")


def _sidecar_dir(location: str, column: str, snapshot_id: int) -> str:
    return os.path.join(location, "metadata", f"bloom-{column}-{snapshot_id}")


def _norm(path: str) -> str:
    # _metadata.file_path is a URI ("file:/abs/path" or "file:///abs/path");
    # realpath collapses the leftover leading slashes either way
    return os.path.realpath(path.removeprefix("file:"))


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
    saturates and skips nothing."""
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
    df = raw.select(expr.alias(column), F.col("_metadata.file_path").alias("_fp"))
    # k position columns stay JVM-codegen (sha2/conv built-ins); the
    # per-file fold is ONE grouped-map that ships the unboxed int64
    # position columns over Arrow and ORs them into the bitmap with numpy.
    # This replaces the earlier explode + collect_set shape, whose JVM
    # hash-sets boxed k×rows Longs per file. The group key is xxhash64 of
    # the path TAIL (last two components — Spark part names carry a per-job
    # UUID), not the path string: 8 bytes/row through the shuffle + Arrow
    # instead of a ~100-byte URI, and the driver resolves ids back to
    # normalized paths through the bit-identical XXH64 twin
    # (functions/hashing.py) over the manifest's own file list. A hash
    # collision merges two files' bitmaps — SOUND for probing (bitmap OR
    # can only add false positives, and the unmapped file is conservatively
    # kept by probes), with ~2^-65·n² odds. Group payload is k int64s per
    # row — a 10 M-row file is an ~320 MB pandas frame; beyond that,
    # pre-reduce with distinct() (positions are ≤ bits ≤ 2^23 distinct).
    from ..functions.hashing import xxh64_bytes

    def _tail(path: str) -> str:
        return "/".join(path.rstrip("/").split("/")[-2:])

    id_to_path: dict[int, str] = {}
    for f in files:
        rp = os.path.realpath(f.path)
        t = _tail(f.path)
        id_to_path[xxh64_bytes(t.encode("utf-8"))] = rp
        # _metadata.file_path is a URI; if the tail contains URI-escaped
        # characters the hashed form differs — register that key too
        q = urllib.parse.quote(t, safe="/")
        if q != t:
            id_to_path[xxh64_bytes(q.encode("utf-8"))] = rp
    pos = df.select(
        F.xxhash64(F.substring_index("_fp", "/", -2)).alias("_g"),
        *_position_cols(column, bits, k),
    )

    n_bytes = bits // 8
    pos_names = [f"_p{i}" for i in range(k)]

    def _pack_group(pdf):
        import numpy as np
        import pandas as pd

        path = id_to_path.get(int(pdf["_g"].iloc[0]))
        if path is None:
            # unmappable tail (exotic URI escaping): emit no row — probes
            # conservatively KEEP files absent from the sidecar
            return pd.DataFrame({"file_path": [], "bitmap": [], "n_set": []})
        p = np.concatenate(
            [pdf[c].to_numpy(dtype=np.int64) for c in pos_names]
        )
        bm = np.zeros(n_bytes, dtype=np.uint8)
        np.bitwise_or.at(bm, p >> 3, np.uint8(1) << (p & 7).astype(np.uint8))
        return pd.DataFrame(
            {
                "file_path": [path],
                "bitmap": [bm.tobytes()],
                "n_set": [int(np.unpackbits(bm).sum())],
            }
        )

    sidecar = pos.groupBy("_g").applyInPandas(
        _pack_group, "file_path string, bitmap binary, n_set long"
    )
    # range-sort by file_path so a probe's parquet predicate prunes to the
    # row groups holding its candidate files; size outputs ~128 MiB each.
    # n_out is known from the manifest (one row per file), so the single-
    # output case skips repartitionByRange — its range sampler would run
    # the whole grouped-map plan a second time (measured ~1.4x build wall).
    n_out = max(1, (len(files) * n_bytes) // SIDECAR_TARGET_BYTES)
    out_dir = _sidecar_dir(table.location, column, snap.snapshot_id)
    writer = (
        sidecar.repartition(1)
        if n_out == 1
        else sidecar.persist().repartitionByRange(n_out, "file_path")
    )
    (
        writer.sortWithinPartitions("file_path")
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    if n_out > 1:
        sidecar.unpersist()
    header = {
        "column": column,
        "bits": bits,
        "k": k,
        "snapshot_id": snap.snapshot_id,
        "format": "parquet",
        "n_files": len(files),
    }
    hpath = _header_path(table.location, column, snap.snapshot_id)
    tmp = hpath + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(header, fh)
    os.replace(tmp, hpath)
    # summary metrics: tiny column-pruned driver read of the n_set column
    import pyarrow.parquet as pq

    parts = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    n_set_total = 0
    n_rows = 0
    for p in parts:
        t = pq.read_table(p, columns=["n_set"])
        n_rows += t.num_rows
        n_set_total += sum(t.column("n_set").to_pylist())
    return {
        "files": n_rows,
        "bits": bits,
        "bits_set_total": n_set_total,
        "bytes": sum(os.path.getsize(p) for p in parts),
        "sidecar_files": len(parts),
        "snapshot_id": snap.snapshot_id,
        "path": out_dir,
    }


def load_bloom_index(table, column: str, snapshot_id: int | None = None) -> dict | None:
    """The sidecar HEADER (column, bits, k, snapshot_id) — never bitmaps."""
    snap = table.current_snapshot() if snapshot_id is None else None
    sid = snapshot_id if snapshot_id is not None else (snap.snapshot_id if snap else None)
    if sid is None:
        return None
    path = _header_path(table.location, column, sid)
    if not os.path.exists(path):
        return None
    with open(path) as fh:
        return json.load(fh)


def _read_bitmaps(
    table, column: str, snapshot_id: int, candidate_paths: list[str] | None
) -> dict[str, bytes]:
    """Bitmaps for ``candidate_paths`` (normalized) — or all, when None.
    Pushes the path set as a parquet predicate so the file_path-sorted
    sidecar reads only the row groups containing candidates."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    if candidate_paths is not None and not candidate_paths:
        return {}  # nothing survived stats pruning — no sidecar read at all
    out_dir = _sidecar_dir(table.location, column, snapshot_id)
    flt = (
        pc.field("file_path").isin(candidate_paths)
        if candidate_paths is not None
        else None
    )
    bitmaps: dict[str, bytes] = {}
    for p in sorted(glob.glob(os.path.join(out_dir, "part-*.parquet"))):
        t = pq.read_table(p, columns=["file_path", "bitmap"], filters=flt)
        for fp, bm in zip(
            t.column("file_path").to_pylist(), t.column("bitmap").to_pylist()
        ):
            bitmaps[fp] = bm
    return bitmaps


def bloom_file_filter(
    table,
    column: str,
    value,
    snapshot_id: int | None = None,
    candidates: list | None = None,
):
    """A ``scan(file_filter=...)`` callable that skips every file whose
    bloom bitmap proves ``column != value`` for all rows. Returns None when
    no index exists for the snapshot (caller falls back to stats-only).

    ``candidates``: the DataFiles that survived stats/partition pruning —
    when given, only THEIR sidecar rows are read (lazy load); when None,
    the whole sidecar loads (fine for direct/bench use on small tables)."""
    idx = load_bloom_index(table, column, snapshot_id)
    if idx is None:
        return None
    want = _positions_py(value, idx["bits"], idx["k"])
    cand_paths = (
        [_norm(f.path) for f in candidates] if candidates is not None else None
    )
    bitmaps = _read_bitmaps(table, column, idx["snapshot_id"], cand_paths)

    def keep(f) -> bool:
        bm = bitmaps.get(_norm(f.path))
        if bm is None:
            return True  # not indexed (newer than the build) — conservative
        return all(bm[p >> 3] & (1 << (p & 7)) for p in want)

    return keep


def bloom_multi_probe_filter(
    table,
    column: str,
    values,
    snapshot_id: int | None = None,
    candidates: list | None = None,
):
    """Like ``bloom_file_filter`` for a SET of probe values: keep a file iff
    ANY value may be present (all k bits set for that value). One sidecar
    read for the whole set — the streaming append-dedup path probes every
    micro-batch digest against the per-file bitmaps this way, scanning only
    the files that could collide instead of the whole table. Returns None
    when no index exists for the snapshot."""
    values = list(values)
    if not values:
        # "nothing to probe" must mean NO filtering (keep all), not
        # any([]) == False pruning every indexed file — that inversion
        # would silently skip the existing-digest scan in append-dedup
        return None
    idx = load_bloom_index(table, column, snapshot_id)
    if idx is None:
        return None
    wants = [_positions_py(v, idx["bits"], idx["k"]) for v in values]
    cand_paths = (
        [_norm(f.path) for f in candidates] if candidates is not None else None
    )
    bitmaps = _read_bitmaps(table, column, idx["snapshot_id"], cand_paths)

    def keep(f) -> bool:
        bm = bitmaps.get(_norm(f.path))
        if bm is None:
            return True  # not indexed — conservative
        return any(
            all(bm[p >> 3] & (1 << (p & 7)) for p in want) for want in wants
        )

    return keep


def bloom_range_probe_filter(
    table,
    column: str,
    values,
    snapshot_id: int | None = None,
    candidates: list | None = None,
):
    """``bloom_multi_probe_filter`` specialized for RANGE-CLUSTERED columns
    (each file owns a disjoint [min, max] slice of the key space, e.g. the
    inverted-index postings table): every file is bloom-checked only
    against the probes INSIDE its recorded bounds (one bisect slice), so
    per-file work is O(in-range probes) instead of O(all probes) — and,
    decisively, false-positive probability stops accumulating over the
    whole probe set (with P probes and F files, each file answers ~P/F
    membership questions instead of P, so a large probe sweep cannot
    saturate the filter). Files without bounds stats fall back to the full
    probe set (conservative); an empty in-range slice is a proof of
    absence (stats pruning built in). Returns None when no index exists.
    """
    from bisect import bisect_left, bisect_right

    probes_sorted = sorted(set(values))
    if not probes_sorted:
        return None  # nothing to probe => no filtering (see multi_probe)
    idx = load_bloom_index(table, column, snapshot_id)
    if idx is None:
        return None
    pos = {
        v: _positions_py(v, idx["bits"], idx["k"]) for v in probes_sorted
    }
    cand_paths = (
        [_norm(f.path) for f in candidates] if candidates is not None else None
    )
    bitmaps = _read_bitmaps(table, column, idx["snapshot_id"], cand_paths)

    def keep(f) -> bool:
        bm = bitmaps.get(_norm(f.path))
        if bm is None:
            return True  # not indexed (newer than the build) — conservative
        lo = f.lower_bounds.get(column) if f.lower_bounds else None
        hi = f.upper_bounds.get(column) if f.upper_bounds else None
        if lo is None or hi is None:
            span = probes_sorted
        else:
            # normalize toward the PROBE domain: manifest bounds round-trip
            # through JSON (default=str for non-native types), so int probes
            # need int-coerced bounds — but a string-keyed column (numeric-
            # looking doc ids included) must stay a string comparison, or
            # bisect would compare int bounds against str probes. Any
            # residual type mismatch degrades to no-range-pruning (bloom
            # still applies), mirroring _stats_bisect_filter's fallback.
            if isinstance(probes_sorted[0], int):
                try:
                    lo, hi = int(lo), int(hi)
                except (TypeError, ValueError):
                    return True  # unparseable bound — conservative
            elif isinstance(probes_sorted[0], str):
                lo, hi = str(lo), str(hi)
            try:
                span = probes_sorted[
                    bisect_left(probes_sorted, lo):bisect_right(probes_sorted, hi)
                ]
            except TypeError:
                span = probes_sorted  # incomparable — bloom-check all probes
        return any(
            all(bm[p >> 3] & (1 << (p & 7)) for p in pos[v]) for v in span
        )

    return keep
