"""Persisted IVF ANN index as a MAINTAINED lakehouse artifact.

``operators/similarity.ivf_ann_topk`` quantizes the corpus per call —
right for one-shot queries, wrong for a serving corpus probed thousands
of times between ingests. This module persists the inverted file with the
engine's own table machinery so it inherits snapshots, incremental
refresh, and partition pruning:

  - the index IS an icelite table of ``(id, vector, cell)`` rows under a
    HIDDEN partition spec ``identity(cell)`` (icelite/partition.py): each
    data file belongs to exactly one coarse cell, recorded in the
    manifest as the file's partition tuple;
  - the coarse quantizer (cell centroids) is a tiny parquet sidecar under
    the table's metadata dir — written once at build, read at every
    refresh/search, NEVER retrained implicitly (retraining moves cell
    boundaries and would silently invalidate the stored assignment);
  - refresh ASSIGNS new vectors to the existing cells and appends —
    O(new vectors), existing index files are immutable; compaction and
    the rest of the maintenance suite apply to the index table like any
    other (partition-preserving by construction);
  - search routes each probe to its ``nprobe`` nearest cells and scans
    ONLY the files whose partition tuple is a probed cell (metadata-only
    pruning), then re-scores exactly inside the visited cells.

Cell assignment / scoring reuse similarity.py's JVM-fold kernels (flat
dot products in whole-stage codegen, zero Python in the hot path).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..icelite.catalog import Catalog
from ..icelite.table import IceliteTable
from .similarity import ivf_cells, kmeans_centroids, norm, pair_cosine

CELL_COL = "cell"
PROP_NPROBE_DEFAULT = "ann-index.nprobe"


def _centroid_path(tbl: IceliteTable) -> str:
    return os.path.join(tbl.location, "metadata", "ann-centroids.parquet")


def _write_centroids(tbl: IceliteTable, cents: list[tuple[int, list[float]]]) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table(
        {
            CELL_COL: pa.array([c for c, _ in cents], pa.int32()),
            "centroid": pa.array([v for _, v in cents],
                                 pa.list_(pa.float64())),
        }
    )
    pq.write_table(t, _centroid_path(tbl))


def load_centroids(tbl: IceliteTable) -> list[tuple[int, list[float]]]:
    import pyarrow.parquet as pq

    t = pq.read_table(_centroid_path(tbl))
    return list(zip(
        t.column(CELL_COL).to_pylist(), t.column("centroid").to_pylist()
    ))


def _assigned(vecs: DataFrame, cents, id_col: str, vec_col: str) -> DataFrame:
    out = ivf_cells(
        vecs.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v")),
        cents,
        "v",
        n_cells=1,
    )
    return out.withColumn(CELL_COL, F.col(CELL_COL)[0].cast("int"))


def build_ann_index(
    spark: SparkSession,
    vecs: DataFrame,
    warehouse: str,
    name: str = "ann_index",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    centroid_mode: str = "id-sample",
    kmeans_iters: int = 2,
) -> IceliteTable:
    """Train the coarse quantizer on the initial corpus, persist it, and
    write the assigned corpus under identity(cell) hidden partitioning.

    ``centroid_mode`` as in similarity.ivf_ann_topk: "id-sample" (the
    n_cells lowest-id vectors — deterministic, oracle-replayable) or
    "kmeans" (Lloyd-iterated — the production quantizer)."""
    if centroid_mode == "kmeans":
        cents = kmeans_centroids(vecs, id_col, vec_col, k=n_cells,
                                 iters=kmeans_iters)
    else:
        cents = [
            (r[0], list(r[1]))
            for r in vecs.select(id_col, vec_col)
            .filter(F.col(id_col) < n_cells)
            .collect()
        ]
    assigned = _assigned(vecs, cents, id_col, vec_col)
    tbl = Catalog(warehouse).create_table(name, assigned.schema)
    tbl.set_partition_spec([{"col": CELL_COL, "transform": "identity"}])
    _write_centroids(tbl, cents)
    tbl.append(assigned, stat_columns=["id", CELL_COL])
    return tbl


def refresh_ann_index(
    spark: SparkSession, tbl: IceliteTable, new_vecs: DataFrame,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> None:
    """Incremental maintenance: assign new vectors to the EXISTING cells
    and append — O(new vectors); the quantizer is pinned (see module doc),
    and identity(cell) partitioning routes the new rows into per-cell
    files automatically."""
    cents = load_centroids(tbl)
    tbl.append(_assigned(new_vecs, cents, id_col, vec_col))


def ann_index_topk(
    spark: SparkSession,
    tbl: IceliteTable,
    probes: DataFrame,
    k: int = 10,
    nprobe: int = 2,
) -> tuple[DataFrame, dict]:
    """IVF search against the persisted index. probes: (query_id, qv).

    Each probe routes to its ``nprobe`` nearest cells; the index scan
    opens ONLY files whose partition tuple is one of the probed cells
    (driver-side metadata filter over the manifest — the probed-cell set
    is at most n_cells ints, collected as metadata like the IVF centroid
    sample). Exact cosine re-scoring inside the visited cells; ties break
    by neighbor id. Returns (topk, metrics) where metrics records
    files_total / files_scanned so callers can assert the pruning."""
    cents = load_centroids(tbl)
    probed = (
        ivf_cells(probes, cents, "qv", n_cells=nprobe)
        .withColumnRenamed(CELL_COL, "cells")
        .withColumn("_qn", norm(F.col("qv")))
    )
    # the probed frame backs BOTH the cell set that drives manifest file
    # pruning AND the join below. Those two consumers must see the SAME
    # rows: if the caller's probes plan is non-deterministic (sample(),
    # unordered limit, rand-derived), two independent evaluations could
    # diverge and the pruning set could exclude files the join-time cells
    # need — silently dropping neighbors. So the probe rows are collected
    # ONCE and the join side rebuilt from the collected values; by
    # contract the probe set is broadcast-sized (the join broadcasts it),
    # so this is the same memory the broadcast already pays, and no cached
    # partitions leak across serving calls (the r3 persist concern).
    probed_schema = probed.schema
    probed_rows = probed.collect()
    probed = spark.createDataFrame(probed_rows, probed_schema)
    # probed-cell set: ≤ n_cells ints of metadata (bounded by the quantizer
    # size, not the probe count) — drives manifest-level file pruning
    probed_cells = {
        int(c) for r in probed_rows for c in r["cells"]
    }

    snap = tbl.current_snapshot()
    all_files = tbl.data_files(snap.snapshot_id)

    def keep(f) -> bool:
        pv = json.loads(f.partition_json)
        if CELL_COL in pv and pv[CELL_COL] is not None:
            return int(pv[CELL_COL]) in probed_cells
        # no tuple (pre-spec straggler): fall back to per-file cell stats
        lo = f.lower_bounds.get(CELL_COL) if f.lower_bounds else None
        hi = f.upper_bounds.get(CELL_COL) if f.upper_bounds else None
        if lo is None or hi is None:
            return True  # conservative
        return any(int(lo) <= c <= int(hi) for c in probed_cells)

    # evaluate the metadata filter ONCE (it parses per-file partition
    # JSON); the scan then consumes the precomputed survivor set
    kept = [f for f in all_files if keep(f)]
    kept_paths = {f.path for f in kept}
    corpus = tbl.scan(
        spark, snapshot_id=snap.snapshot_id,
        file_filter=lambda f: f.path in kept_paths,
    )
    corpus = corpus.withColumnRenamed("id", "neighbor_id").withColumnRenamed(
        "v", "cv"
    ).withColumn("_cn", norm(F.col("cv")))

    pairs = (
        F.broadcast(probed)
        .join(corpus, F.array_contains(F.col("cells"), F.col(CELL_COL)))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            pair_cosine(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    topk = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )
    return topk, {
        "files_total": len(all_files),
        "files_scanned": len(kept),
        "cells_probed": len(probed_cells),
    }


# ---- CDC-driven maintenance against an icelite base table -----------------

PROP_BASE_TABLE = "ann-index.base-table"
PROP_BASE_SNAPSHOT = "ann-index.base-snapshot"
PROP_ID_COL = "ann-index.id-col"
PROP_VEC_COL = "ann-index.vec-col"


def register_ann_index(
    spark: SparkSession,
    base: IceliteTable,
    warehouse: str,
    name: str = "ann_index",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 8,
    centroid_mode: str = "id-sample",
    kmeans_iters: int = 2,
) -> IceliteTable:
    """Build the index over an icelite BASE table's current snapshot and
    record that snapshot as the index's watermark (the incremental-MV
    bookkeeping pattern, operators/materialized.py) so ``sync_ann_index``
    is an O(changed vectors) catch-up."""
    snap = base.current_snapshot()
    if snap is None:
        raise ValueError(
            f"cannot register an ANN index over {base.location}: the base "
            "table has no snapshot yet — ingest first, then register"
        )
    tbl = build_ann_index(
        spark,
        base.scan(spark, snapshot_id=snap.snapshot_id),
        warehouse,
        name=name,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=n_cells,
        centroid_mode=centroid_mode,
        kmeans_iters=kmeans_iters,
    )
    tbl.set_properties(
        {
            PROP_BASE_TABLE: base.location,
            PROP_BASE_SNAPSHOT: str(snap.snapshot_id),
            PROP_ID_COL: id_col,
            PROP_VEC_COL: vec_col,
        }
    )
    from .index_sync import register_index_on_base

    register_index_on_base(base, tbl.location)
    return tbl


def sync_ann_index(
    spark: SparkSession, base: IceliteTable, tbl: IceliteTable
) -> dict:
    """Advance the index to the base table's current snapshot via the
    engine's CDC diff — O(changed vectors), quantizer PINNED:

      - deleted vectors (and the delete half of updates) become ONE
        equality-delete file on the index's ``id`` column; inserted
        vectors assign to the EXISTING cells and land as per-cell data
        files — BOTH in one atomic commit at one sequence number
        (index_sync.commit_index_delta, the MOR MERGE shape), so an
        updated vector's new cell row outlives the delete on its id and
        a crashed sync leaves no partial state;
      - the watermark moves in that same commit; an empty logical diff
        (maintenance-only base delta) is a watermark-only property move.
    """
    import uuid as _uuid

    from ..icelite import partition as ps
    from .changes import snapshot_changes
    from .index_sync import commit_index_delta

    props = tbl.meta.properties
    from_id = int(props[PROP_BASE_SNAPSHOT])
    head = base.current_snapshot()
    if head is None or from_id == head.snapshot_id:
        return {
            "synced": False,
            "from_snapshot": from_id,
            "to_snapshot": None if head is None else head.snapshot_id,
        }
    to_id = head.snapshot_id
    id_col = props[PROP_ID_COL]
    vec_col = props[PROP_VEC_COL]
    watermark = {PROP_BASE_SNAPSHOT: str(to_id)}

    # persist: the diff backs the probes and both writes below
    ch = snapshot_changes(spark, base, from_id, to_id).persist()
    try:
        deletes = ch.filter(F.col("change_type") == "delete")
        inserts = ch.filter(F.col("change_type") == "insert")
        has_del = bool(deletes.limit(1).count())
        has_ins = bool(inserts.limit(1).count())
        if not has_del and not has_ins:
            tbl.set_properties(watermark)
            return {
                "synced": True, "from_snapshot": from_id, "to_snapshot": to_id,
                "deleted_keys": 0, "inserted_vectors": False,
            }

        data_paths: list[str] = []
        if has_ins:
            cents = load_centroids(tbl)
            assigned = _assigned(inserts, cents, id_col, vec_col)
            out_dir = os.path.join(
                tbl.location, "data", f"annsync-{_uuid.uuid4().hex[:12]}"
            )
            data_paths = ps.write_partitioned(
                assigned, tbl.partition_spec, out_dir, mode="overwrite"
            )
        del_keys = (
            deletes.select(F.col(id_col).alias("id")).distinct()
            if has_del else None
        )
        r = commit_index_delta(
            tbl, del_keys, "id", data_paths, ["id", CELL_COL],
            watermark, "ann-sync",
        )
    finally:
        ch.unpersist()
    return {
        "synced": True,
        "from_snapshot": from_id,
        "to_snapshot": to_id,
        "deleted_keys": r["deleted_keys"],
        "inserted_vectors": bool(data_paths),
    }
