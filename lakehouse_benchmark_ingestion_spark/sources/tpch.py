"""Loaders for the driver's TPC-H-ish parquet fixtures (TESTDATA.md).

The reference discovers its source tables by JDBC catalog introspection
(MysqlCDCCatalog.java:145-168) and filters the sync list
(SyncDbFunction.java:65-66). Our batch analogue: a fixed table registry and
a register_views() that exposes each fixture as a Spark temp view.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TPCH_TABLES:
        raise KeyError(f"unknown fixture table {name!r}")
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    for name in tables or TPCH_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
