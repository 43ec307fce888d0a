"""icelite — a minimal Iceberg-semantics table format over Parquet.

Implements from scratch the table-format layer the reference switches on but
delegates (IcebergCatalogSync.java:111-117: format-version=2,
write.metadata.metrics.default=full): snapshots, manifest files with full
per-file column metrics, atomic commits, snapshot-isolated reads, and
replace-files semantics for maintenance operations.

Layout (SURVEY.md §7.0):

    warehouse/<table>/
      data/<commit-uuid>/part-*.parquet      # immutable data files
      metadata/
        v<N>.metadata.json                   # schema, snapshot log, current id
        manifest-<uuid>.parquet              # per-file stats (min/max/rows/bytes)
        version-hint.text                    # atomically replaced pointer
      lineage/                               # per-partition maintenance progress
"""

from .catalog import Catalog
from .metadata import Snapshot, TableMetadata
from .table import IceliteTable

__all__ = ["Catalog", "IceliteTable", "Snapshot", "TableMetadata"]
