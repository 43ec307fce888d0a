"""Key-math helpers: salting and hash bucketing (all JVM built-ins).

The reference's Hudi sink locates file groups with an 8-bucket hash index on
the primary key (HudiCatalogSync.java:151-159); our equivalents:
``bucket_expr`` for co-partitioned MERGE joins and ``salt_expr`` for the
skewed ``source`` dimension (a few sources dominate — FIXTURES.md §1), kept
INSIDE the range-partition key but OUTSIDE the sort key so Z-locality within
files survives (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_expr(key: str | Column, n_buckets: int) -> Column:
    """Stable hash bucket of a key column: pmod(xxhash64(k), n)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def salt_expr(key: str | Column, n_salts: int) -> Column:
    """Uniform salt derived from a high-cardinality key (doc_id)."""
    return bucket_expr(key, n_salts)
