"""Partition statistics files (Iceberg partition-stats parity).

Iceberg v2+ can register a per-snapshot *partition statistics file* —
one row per partition with record/file counts and sizes — so engines
answer partition-level questions (size skew, row counts, compaction
targeting) from ONE small file instead of walking every manifest. The
reference relies on per-table optimizer metrics the same way (Arctic
optimizer quota decisions, ArcticCatalogSync.java:121-128).

Spark-first shape: manifests are already Parquet, so the aggregation runs
as a Spark job OVER THE MANIFEST FILES THEMSELVES — ``spark.read.parquet``
on the snapshot's manifest list, filter to data entries, group by
``partition_json``. Metadata is data. At 10^12 rows a table has ~10^6-10^7
manifest entries; the group-by is a trivially-parallel job and the output
is O(partitions).

The stats file is registered in table properties atomically
(``partition-stats.snapshot-id`` + ``.path``); readers check the recorded
snapshot id against the head and fall back to recomputing when stale —
stale stats are never silently served.
"""

from __future__ import annotations

import glob
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..icelite import manifest as mf
from ..icelite import metadata as md
from ..icelite.table import IceliteTable

PROP_SNAPSHOT = "partition-stats.snapshot-id"
PROP_PATH = "partition-stats.path"

STATS_SCHEMA = (
    "partition_json string, n_files long, record_count long, "
    "file_size_bytes long, last_updated_sequence long"
)


def _stats_df(spark: SparkSession, table: IceliteTable, snapshot_id: int) -> DataFrame:
    snap = table.meta.snapshot(snapshot_id)
    paths = [
        os.path.join(md.metadata_dir(table.location), name)
        for name in snap.manifests
    ]
    if not paths:
        return spark.createDataFrame([], STATS_SCHEMA)
    # explicit read schema: manifests from different feature eras differ in
    # trailing columns (null_counts, lineage, ...); the aggregation needs
    # only these five, present since the first manifest format
    manifest_read_schema = (
        "path string, content string, record_count long, "
        "file_size_bytes long, sequence_number long, partition_json string"
    )
    return (
        spark.read.schema(manifest_read_schema).parquet(*paths)
        .filter(F.col("content") == mf.CONTENT_DATA)
        .groupBy("partition_json")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("record_count").cast("long").alias("record_count"),
            F.sum("file_size_bytes").cast("long").alias("file_size_bytes"),
            F.max("sequence_number").cast("long").alias(
                "last_updated_sequence"
            ),
        )
    )


def write_partition_stats(
    spark: SparkSession, table: IceliteTable, snapshot_id: int | None = None
) -> dict:
    """Compute and register the partition statistics file for a snapshot
    (default: current head). Returns ``{"path", "snapshot_id",
    "n_partitions"}``. Registration is a metadata-only atomic property
    update; re-running for the same snapshot replaces the registration
    (the old file becomes an orphan for the GC sweep)."""
    sid = (
        snapshot_id
        if snapshot_id is not None
        else table.meta.current_snapshot_id
    )
    if sid is None:
        raise ValueError("table has no snapshot")
    out_dir = os.path.join(
        md.metadata_dir(table.location), f"partition-stats-{uuid.uuid4().hex}"
    )
    df = _stats_df(spark, table, sid)
    df.coalesce(1).write.mode("overwrite").parquet(out_dir)
    path = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))[0]
    # row count from the just-written footer — a second df.count() would
    # re-run the whole manifest aggregation job
    import pyarrow.parquet as pq

    n = pq.ParquetFile(path).metadata.num_rows
    table.set_properties({PROP_SNAPSHOT: str(sid), PROP_PATH: path})
    return {"path": path, "snapshot_id": sid, "n_partitions": n}


def read_partition_stats(
    spark: SparkSession,
    table: IceliteTable,
    snapshot_id: int | None = None,
    allow_recompute: bool = True,
) -> tuple[DataFrame, str]:
    """Partition stats for a snapshot, preferring the registered stats file.

    Returns ``(df, source)`` where source is ``"stats-file"`` when the
    registered file covers exactly the requested snapshot, else
    ``"computed"`` (fresh manifest aggregation — never a stale file). With
    ``allow_recompute=False`` a missing/stale registration raises instead,
    for callers that want the cheap path or an explicit failure."""
    sid = (
        snapshot_id
        if snapshot_id is not None
        else table.meta.current_snapshot_id
    )
    props = table.meta.properties
    reg_sid = props.get(PROP_SNAPSHOT)
    reg_path = props.get(PROP_PATH)
    if (
        reg_sid is not None
        and int(reg_sid) == sid
        and reg_path
        and os.path.exists(reg_path)
    ):
        return spark.read.schema(STATS_SCHEMA).parquet(reg_path), "stats-file"
    if not allow_recompute:
        raise ValueError(
            f"no partition-stats file registered for snapshot {sid} "
            f"(registered: {reg_sid}); run write_partition_stats"
        )
    return _stats_df(spark, table, sid), "computed"
