"""Distributed scan planning (table.select_data_files_distributed):
executor-side manifest parsing must select EXACTLY the same file set as
the driver-side planner for every predicate shape — range, equality,
partition-transformed, bloom-backed point lookups, stats-less files —
because stage 3 re-judges survivors with the identical filter chain and
stages 1-2 are conservative."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


def _paths(files):
    return sorted(f.path for f in files)


def _parity(spark, tbl, where, expect_pruning=True):
    want = tbl.select_data_files(where)
    got = tbl.select_data_files_distributed(spark, where)
    assert _paths(got) == _paths(want), (where, len(got), len(want))
    if expect_pruning:
        assert len(want) < len(tbl.data_files()), (
            f"test predicate {where} prunes nothing - not exercising "
            "the distributed pruning stage"
        )
    return want


def test_distributed_parity_range_and_point(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("dp", df.schema)
    # disjoint n_tok ranges per file so stats pruning has teeth
    for i in range(4):
        tbl.append(
            df.filter(F.col("doc_id").cast("long") % 4 == i)
            .repartitionByRange(2, "n_tok")
            .sortWithinPartitions("n_tok"),
        )
    _parity(spark, tbl, {"n_tok": (100, None)})
    _parity(spark, tbl, {"n_tok": (None, 20)})
    _parity(spark, tbl, {"n_tok": (30, 40)})
    # string point lookup: modulo-split files overlap on doc_id, so no
    # stats pruning here — bloom-backed pruning is the next test
    _parity(spark, tbl, {"doc_id": "7"}, expect_pruning=False)
    _parity(spark, tbl, {"n_tok": (1, None)}, expect_pruning=False)
    assert _paths(tbl.select_data_files_distributed(spark)) == _paths(
        tbl.select_data_files()
    )


def test_distributed_parity_partition_and_bloom(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.bloom_index import (
        build_bloom_index,
    )

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("dpp", df.schema)
    tbl.set_partition_spec([{"col": "source", "transform": "identity"}])
    tbl.append(df, max_records_per_file=64)
    srcs = [r[0] for r in df.select("source").distinct().collect()]
    _parity(spark, tbl, {"source": srcs[0]})
    build_bloom_index(spark, tbl, "doc_id")
    _parity(spark, tbl, {"doc_id": "11"})


def test_distributed_parity_stats_less_files(spark, warehouse):
    """Files without stats for the predicate column are kept by both."""
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("dps", df.schema)
    tbl.append(df.limit(40), stat_columns=["doc_id"])  # no n_tok stats
    tbl.append(
        df.filter(F.col("doc_id").cast("long") >= 40)
        .repartitionByRange(2, "n_tok")
    )
    want = tbl.select_data_files({"n_tok": (100, None)})
    got = tbl.select_data_files_distributed(spark, {"n_tok": (100, None)})
    assert _paths(got) == _paths(want)
