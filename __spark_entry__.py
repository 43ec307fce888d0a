"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: build the icelite sequences table from
sf0.001, run the FULL maintenance suite (bin-packing compaction → Z-order
cluster → manifest rewrite → snapshot expire) plus a MERGE INTO, then
aggregate the post-maintenance scan. ``queries()``/``oracle_sql()`` —
one entry per implemented operator (SURVEY.md §2), DuckDB-checked.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lakehouse_benchmark_ingestion_spark.queries import q_maint_agg_by_source

    return q_maint_agg_by_source(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from lakehouse_benchmark_ingestion_spark.queries import build_queries

    return build_queries()


def oracle_sql() -> dict[str, str]:
    from lakehouse_benchmark_ingestion_spark.queries import build_oracles

    return build_oracles()
