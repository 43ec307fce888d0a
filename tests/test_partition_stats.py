"""Partition statistics files (operators/partition_stats.py): per-snapshot
O(partitions) stats computed as a Spark job over the manifest parquets,
registered atomically, never served stale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.partition_stats import (
    read_partition_stats,
    write_partition_stats,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


@pytest.fixture()
def part_table(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("pstats", df.schema)
    tbl.set_partition_spec([{"col": "source", "transform": "identity"}])
    tbl.append(df)
    return tbl


def test_stats_match_data_side_groupby(spark, part_table):
    tbl = part_table
    r = write_partition_stats(spark, tbl)
    assert r["n_partitions"] > 1
    df, source = read_partition_stats(spark, tbl)
    assert source == "stats-file"
    got = {
        row["partition_json"]: row["record_count"] for row in df.collect()
    }
    truth = {
        f'{{"source": "{row["source"]}"}}': row["n"]
        for row in tbl.scan(spark)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == truth
    # file counts sum to the table's file count
    n_files = df.agg(F.sum("n_files")).collect()[0][0]
    assert n_files == len(tbl.data_files())


def test_stale_stats_never_served(spark, part_table):
    tbl = part_table
    write_partition_stats(spark, tbl)
    # a new commit makes the registered file stale
    extra = tokens_df(spark, SF_SMOKE).limit(5).withColumn(
        "doc_id", F.concat(F.lit("n-"), F.col("doc_id"))
    )
    tbl.append(extra)
    df, source = read_partition_stats(spark, tbl)
    assert source == "computed", "stale stats file must not be served"
    total = df.agg(F.sum("record_count")).collect()[0][0]
    assert total == tbl.scan(spark).count()
    with pytest.raises(ValueError, match="partition-stats"):
        read_partition_stats(spark, tbl, allow_recompute=False)
    # re-register at the new head -> fast path again
    write_partition_stats(spark, tbl)
    _, source = read_partition_stats(spark, tbl)
    assert source == "stats-file"


def test_unpartitioned_table_single_row(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("flat", df.schema)
    tbl.append(df, num_files=3)
    r = write_partition_stats(spark, tbl)
    assert r["n_partitions"] == 1
    sdf, _ = read_partition_stats(spark, tbl)
    row = sdf.collect()[0]
    assert row["partition_json"] == "{}"
    assert row["n_files"] == 3
    assert row["record_count"] == df.count()


def test_cli_partition_stats(spark, part_table, capsys):
    from tests.test_jobs_cli import run

    wh = os.path.dirname(part_table.location)
    r = run(capsys, "write-partition-stats", "--warehouse", wh,
            "--table", "pstats")
    assert r["n_partitions"] > 1
    r = run(capsys, "partition-stats", "--warehouse", wh, "--table", "pstats")
    assert r["source"] == "stats-file"
    assert len(r["partitions"]) == r.get("n_partitions", len(r["partitions"]))


def test_full_maintenance_refreshes_stats(spark, part_table):
    """run_full_maintenance ends by registering partition stats at the
    post-maintenance head (opt-out via partition-stats.auto=false)."""
    from lakehouse_benchmark_ingestion_spark.plans.maintenance import (
        run_full_maintenance,
    )

    tbl = part_table
    m = run_full_maintenance(spark, tbl, target_file_size=1 << 30)
    assert "partition_stats" in m
    df, source = read_partition_stats(spark, tbl)
    assert source == "stats-file", "stats must cover the maintained head"
    total = sum(r["record_count"] for r in df.collect())
    assert total == tbl.scan(spark).count()
