"""Table NDV statistics files (Iceberg Puffin `apache-datasketches-*` parity).

Iceberg's ANALYZE path writes a *statistics file* (Puffin format) holding
one DataSketches sketch per column; engines read the tiny sidecar to get
distinct-value counts for CBO decisions (join ordering, broadcast
thresholds) without scanning data. The reference leans on the same kind of
table-level metrics when its formats self-optimize
(`IcebergCatalogSync.java:111-117` turns on `write.metadata.metrics.default
=full`; `ArcticCatalogSync.java:121-128` quota decisions).

Spark-first shape:

- the sketches are built by the built-in DataSketches HLL aggregates
  (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`), entirely
  JVM-side — one distributed pass over the snapshot's data files, grouped
  by `_metadata.file_path`, emitting one row per (file, column);
- the sidecar is itself parquet (metadata is data), registered atomically
  in table properties (`ndv-stats.snapshot-id` + `.path`), stale-safe like
  the partition-stats file — stale registrations are never silently served;
- **refresh is incremental by sketch union**: HLL register states merge by
  elementwise max, so a new snapshot only scans files ADDED since the
  registered sidecar; sketches for still-live files are carried over and
  the table-level estimate is `hll_sketch_estimate(hll_union_agg(...))`
  over the per-file rows. At 10^12 rows an append-heavy table refreshes
  its NDV stats at O(new data), never a rescan.

Determinism note (measured, pinned by tests): per-file sketch BYTES are
fully deterministic — an incremental refresh carries bit-identical rows to
what a full rebuild recomputes. The table-level *estimate* however uses
DataSketches' HIP estimator, which is sensitive to the order sketches are
fed into the union, so two unions over the same row set can differ by a
fraction of a percent. The invariant the engine certifies is therefore
closeness (incremental ≈ full ≈ exact within the sketch's error bound),
not bitwise estimate equality.

Semantics note (documented, matches Iceberg's ANALYZE granularity): the
per-file sketches cover live data-file CONTENTS. Rows suppressed by
outstanding eq-/pos-delete sidecars still count until a compaction
materializes the deletes, so between deletes and the next maintenance run
the estimate is an upper bound — exactly the error mode Iceberg stats have
between ANALYZE runs.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..icelite import metadata as md

PROP_SNAPSHOT = "ndv-stats.snapshot-id"
PROP_PATH = "ndv-stats.path"
PROP_COLUMNS = "ndv-stats.columns"
PROP_LG_K = "ndv-stats.lg-k"

DEFAULT_LG_K = 12  # 4096 registers, ~1.6% relative standard error

SIDECAR_SCHEMA = "file_path string, column string, sketch binary, n_rows long"


def _norm(path: str) -> str:
    return os.path.realpath(path.removeprefix("file:"))


def _sidecar_dir(location: str, snapshot_id: int) -> str:
    return os.path.join(
        md.metadata_dir(location), f"ndv-stats-{snapshot_id}-{uuid.uuid4().hex[:8]}"
    )


def _column_expr(table, raw_columns: list[str], column: str):
    """Alias-aware column expression (files written under renamed-away
    names coalesce across the recorded lineage, mirroring read_files)."""
    aliases = table.meta.column_aliases.get(column, [])
    cands = [c for c in [column, *aliases] if c in raw_columns]
    if not cands:
        return None
    if len(cands) > 1:
        return F.coalesce(*[F.col(c) for c in cands])
    return F.col(cands[0])


def _sketch_rows(
    spark: SparkSession, table, paths: list[str], columns: list[str], lg_k: int
) -> DataFrame:
    """One distributed pass over ``paths``: per-file, per-column HLL
    sketches in long format (file_path, column, sketch, n_rows)."""
    # mergeSchema: files from different schema eras (renamed columns) must
    # all surface their physical column so the alias coalesce sees them
    raw = spark.read.option("mergeSchema", "true").parquet(*paths)
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    present: list[str] = []
    for c in columns:
        expr = _column_expr(table, raw.columns, c)
        if expr is None:
            raise ValueError(f"column {c!r} not present in any data file")
        aggs.append(F.hll_sketch_agg(expr, F.lit(lg_k)).alias(f"_sk_{c}"))
        present.append(c)

    @F.pandas_udf("string")
    def _norm_path(p):
        import pandas as pd

        return pd.Series([_norm(x) for x in p])

    wide = (
        raw.select(F.col("_metadata.file_path").alias("_fp"), *raw.columns)
        .groupBy("_fp")
        .agg(*aggs)
    )
    # melt wide sketch columns to the generic long sidecar layout;
    # identifiers are backtick-quoted and the name literal escaped so
    # column names with spaces/hyphens/quotes cannot break (or reparse as
    # arithmetic in) the generated expression
    def _lit(c: str) -> str:
        return "'" + c.replace("\\", "\\\\").replace("'", "\\'") + "'"

    def _ident(c: str) -> str:
        return "`" + f"_sk_{c}".replace("`", "``") + "`"

    stack = F.expr(
        "stack({n}, {pairs}) as (column, sketch)".format(
            n=len(present),
            pairs=", ".join(f"{_lit(c)}, {_ident(c)}" for c in present),
        )
    )
    return wide.select(
        _norm_path("_fp").alias("file_path"), F.col("n_rows"), stack
    ).select("file_path", "column", "sketch", "n_rows")


def _estimates_from_rows(rows: DataFrame) -> DataFrame:
    return (
        rows.groupBy("column")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("ndv"))
        .select("column", F.col("ndv").cast("long").alias("ndv"))
    )


def _write_and_register(
    spark: SparkSession, table, rows: DataFrame, snapshot_id: int,
    columns: list[str], lg_k: int,
) -> dict:
    out_dir = _sidecar_dir(table.location, snapshot_id)
    rows.repartition(1).write.mode("overwrite").parquet(out_dir)
    est = {
        r["column"]: int(r["ndv"])
        for r in _estimates_from_rows(
            spark.read.schema(SIDECAR_SCHEMA).parquet(out_dir)
        ).collect()  # O(columns) rows — result display, not data
    }
    with open(os.path.join(out_dir, "_header.json"), "w") as fh:
        json.dump(
            {
                "snapshot_id": snapshot_id,
                "lg_k": lg_k,
                "columns": columns,
                "estimates": est,
            },
            fh,
        )
    table.set_properties(
        {
            PROP_SNAPSHOT: str(snapshot_id),
            PROP_PATH: out_dir,
            PROP_COLUMNS: ",".join(columns),
            PROP_LG_K: str(lg_k),
        }
    )
    return {"path": out_dir, "snapshot_id": snapshot_id, "estimates": est}


def build_ndv_stats(
    spark: SparkSession, table, columns: list[str], lg_k: int = DEFAULT_LG_K
) -> dict:
    """Full build at the current snapshot: scan every live data file once,
    write + register the sidecar. Returns ``{"path", "snapshot_id",
    "estimates", "files_scanned", "files_carried"}``."""
    snap = table.current_snapshot()
    if snap is None:
        raise ValueError("table has no snapshot")
    files = table.data_files(snap.snapshot_id)
    if not files:
        rows = spark.createDataFrame([], SIDECAR_SCHEMA)
        out = _write_and_register(
            spark, table, rows, snap.snapshot_id, columns, lg_k
        )
        return {**out, "files_scanned": 0, "files_carried": 0}
    rows = _sketch_rows(spark, table, [f.path for f in files], columns, lg_k)
    out = _write_and_register(spark, table, rows, snap.snapshot_id, columns, lg_k)
    return {**out, "files_scanned": len(files), "files_carried": 0}


def refresh_ndv_stats(spark: SparkSession, table) -> dict:
    """Incremental refresh to the current head: carry sketches of files
    still live, scan ONLY files added since the registered sidecar, union.
    Raises when no registration exists (run build_ndv_stats). Files dropped
    by compaction/DML simply lose their rows; their replacements are
    scanned (same multiset of values ⇒ same sketch information — estimates
    agree to within the estimator's order sensitivity, see module doc)."""
    props = table.meta.properties
    reg_path = props.get(PROP_PATH)
    reg_cols = props.get(PROP_COLUMNS)
    if not reg_path or not os.path.isdir(reg_path) or not reg_cols:
        raise ValueError(
            "no ndv-stats registration to refresh; run build_ndv_stats"
        )
    columns = reg_cols.split(",")
    lg_k = int(props.get(PROP_LG_K, DEFAULT_LG_K))
    snap = table.current_snapshot()
    if snap is None:
        raise ValueError("table has no snapshot")
    if props.get(PROP_SNAPSHOT) == str(snap.snapshot_id):
        with open(os.path.join(reg_path, "_header.json")) as fh:
            est = json.load(fh)["estimates"]
        return {
            "path": reg_path,
            "snapshot_id": snap.snapshot_id,
            "estimates": est,
            "files_scanned": 0,
            "files_carried": -1,
            "skipped": "up-to-date",
        }

    live = {_norm(f.path): f.path for f in table.data_files(snap.snapshot_id)}
    old = spark.read.schema(SIDECAR_SCHEMA).parquet(reg_path)
    covered = {
        r["file_path"]
        for r in old.select("file_path").distinct().collect()
        # one row per file — bounded by the live file count of the OLD
        # snapshot; at 10^7 files this is a 10^7-row driver list, the same
        # order as the manifest planning already held in memory. A
        # sidecar-side anti-join variant can replace this if file counts
        # outgrow the planner.
    }
    new_paths = [orig for norm, orig in live.items() if norm not in covered]
    # semi-join, not isin(<N paths>): an isin literal list linearizes into
    # the Catalyst plan and chokes analysis at 10^5+ files
    live_df = spark.createDataFrame(
        [(p,) for p in live.keys()], "file_path string"
    )
    carried = old.join(F.broadcast(live_df), "file_path", "left_semi")
    if new_paths:
        fresh = _sketch_rows(spark, table, new_paths, columns, lg_k)
        rows = carried.unionByName(fresh)
    else:
        rows = carried
    out = _write_and_register(spark, table, rows, snap.snapshot_id, columns, lg_k)
    return {
        **out,
        "files_scanned": len(new_paths),
        "files_carried": len(live) - len(new_paths),
    }


def ndv_estimates(
    spark: SparkSession, table, allow_recompute: bool = False
) -> tuple[DataFrame, str]:
    """(column, ndv) estimates for the CURRENT snapshot, preferring the
    registered sidecar; a stale/missing registration raises unless
    ``allow_recompute`` (which runs a fresh unregistered estimate)."""
    snap = table.current_snapshot()
    sid = snap.snapshot_id if snap else None
    props = table.meta.properties
    reg_sid = props.get(PROP_SNAPSHOT)
    reg_path = props.get(PROP_PATH)
    if (
        sid is not None
        and reg_sid == str(sid)
        and reg_path
        and os.path.isdir(reg_path)
    ):
        rows = spark.read.schema(SIDECAR_SCHEMA).parquet(reg_path)
        return _estimates_from_rows(rows), "stats-file"
    if not allow_recompute:
        raise ValueError(
            f"no ndv-stats file registered for snapshot {sid} "
            f"(registered: {reg_sid}); run build/refresh_ndv_stats"
        )
    columns = (props.get(PROP_COLUMNS) or "").split(",")
    if not columns or columns == [""]:
        raise ValueError("no ndv-stats columns recorded; run build_ndv_stats")
    files = table.data_files(sid)
    if not files:
        # zero live data files (e.g. delete-all): parquet() on an empty
        # path list cannot infer a schema — the answer is simply ndv=0
        return (
            spark.createDataFrame(
                [(c, 0) for c in columns], "column string, ndv long"
            ),
            "computed",
        )
    rows = _sketch_rows(
        spark, table, [f.path for f in files], columns,
        int(props.get(PROP_LG_K, DEFAULT_LG_K)),
    )
    return _estimates_from_rows(rows), "computed"
