"""lakehouse_benchmark_ingestion_spark — a PySpark-native lakehouse
table-maintenance engine.

A brand-new engine (NOT a port) supplying the table-format capabilities the
reference (NetEase/lakehouse-benchmark-ingestion, Flink-CDC → Iceberg/Hudi/
Arctic) delegates to its lakehouse sinks: snapshot-isolated tables over
Parquet ("icelite"), bin-packing small-file compaction, Z-order/Hilbert
clustering, manifest rewrite, snapshot expiration, MERGE INTO upserts, and
per-partition lineage/resume — plus the training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) a 100 TB
token-pipeline needs.

Reference behavior parity notes cite /root/reference files as file:line in
module docstrings.
"""

__version__ = "0.1.0"
