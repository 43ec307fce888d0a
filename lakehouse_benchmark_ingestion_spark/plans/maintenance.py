"""Full maintenance suite orchestration.

Runs, in order: bin-packing compaction → global cluster (Z/Hilbert) →
manifest rewrite → snapshot expiration. Each stage commits its own snapshot
(all-or-nothing), checkpoints lineage, and is individually resumable. This
is the engine-level equivalent of what the reference leaves to each format's
background services (Hudi online compaction HudiCatalogSync.java:172-175,
Arctic self-optimizing ArcticCatalogSync.java:121-128).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..icelite.table import IceliteTable
from ..operators.clustering import cluster
from ..operators.compaction import compact
from ..operators.expire_snapshots import expire_snapshots
from ..operators.manifest_rewrite import rewrite_manifests


def run_full_maintenance(
    spark: SparkSession,
    table: IceliteTable,
    target_file_size: int = 128 * 1024 * 1024,
    curve: str = "zorder",
    n_salts: int = 1,
    expire_keep_last: int = 2,
    run_id: str | None = None,
) -> dict:
    metrics: dict = {}
    metrics["compact"] = compact(
        spark, table, target_file_size=target_file_size, curve=curve,
        n_salts=n_salts, run_id=run_id,
    )
    metrics["cluster"] = cluster(
        spark, table, curve=curve, target_file_size=target_file_size, n_salts=n_salts,
    )
    metrics["rewrite_manifests"] = rewrite_manifests(table)
    metrics["expire_snapshots"] = expire_snapshots(table, keep_last=expire_keep_last)
    return metrics
