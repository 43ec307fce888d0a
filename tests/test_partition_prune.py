"""Hidden-partition PRUNING (the read-path half of the partition spec).

Contract under test:
  - the pure-Python XXH64 twin is bit-identical to Spark's xxhash64 for
    every dtype the bucket transform accepts (int/long/string), across
    all byte-length paths of the algorithm;
  - an equality predicate on a bucket[N]-partitioned column keeps only
    files in the constant's bucket — and never loses a row;
  - truncate[W] range predicates prune by tuple coverage [t, t+W-1];
  - files WITHOUT tuples (pre-spec appends) are always kept (soundness);
  - partition-clustered manifests (rewrite_manifests by_partition) are
    skipped footer-only by the same predicate.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.functions.hashing import (
    bucket_value,
    xxhash64_value,
)
from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.manifest_rewrite import (
    rewrite_manifests,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE

BUCKET_SPEC = [{"col": "doc_id", "transform": "bucket", "param": 4}]
TRUNC_SPEC = [{"col": "n_tok", "transform": "truncate", "param": 50}]


def _bucket_table(spark, warehouse, pre_spec_rows=False):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("bp", df.schema)
    if pre_spec_rows:
        # half the rows land BEFORE the spec exists → no partition tuples
        tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 0), num_files=2)
        tbl.set_partition_spec(BUCKET_SPEC)
        tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 1))
    else:
        tbl.set_partition_spec(BUCKET_SPEC)
        tbl.append(df)
    return tbl, df


# ---------------------------------------------------------------------------
# XXH64 twin bit-identity
# ---------------------------------------------------------------------------

def test_xxh64_twin_strings_all_length_paths(spark):
    # 0..40 covers the <4-, 4..7-, 8..31-, and >=32-byte paths; add multi-
    # byte UTF-8 so the byte-stream (not char-stream) contract is pinned
    vals = ["x" * i for i in range(41)] + ["7", "doc-123", "ünïcode✓"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert xxhash64_value(r.v, "string") == r.h


def test_xxh64_twin_integrals(spark):
    ints = [0, 1, -1, 7, 42, 2**31 - 1, -(2**31)]
    df = spark.createDataFrame([(v,) for v in ints], "v int")
    for r in df.select("v", F.xxhash64("v").alias("h")).collect():
        assert xxhash64_value(r.v, "int") == r.h
    longs = [0, -1, 2**63 - 1, -(2**63), 123456789012345]
    df2 = spark.createDataFrame([(v,) for v in longs], "v long")
    for r in df2.select("v", F.xxhash64("v").alias("h")).collect():
        assert xxhash64_value(r.v, "bigint") == r.h


def test_bucket_value_matches_bucket_expr(spark):
    from lakehouse_benchmark_ingestion_spark.functions.hashing import bucket_expr

    vals = [str(i) for i in range(50)]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    for r in df.select("v", bucket_expr("v", 8).alias("b")).collect():
        assert bucket_value(r.v, 8, "string") == r.b


# ---------------------------------------------------------------------------
# bucket pruning
# ---------------------------------------------------------------------------

def test_bucket_point_lookup_prunes_files(spark, warehouse):
    tbl, df = _bucket_table(spark, warehouse)
    total = len(tbl.data_files())
    assert total >= 4  # one file per non-empty bucket
    ppred = tbl._partition_predicate({"doc_id": "7"})
    kept = [f for f in tbl.data_files() if ppred(f.partition_json)]
    # exactly the one bucket the constant hashes to
    assert len(kept) == sum(
        1
        for f in tbl.data_files()
        if f'"doc_id_bucket4": {bucket_value("7", 4, "string")}' in f.partition_json
    )
    assert len(kept) < total


def test_bucket_point_lookup_correct_and_sound(spark, warehouse):
    tbl, df = _bucket_table(spark, warehouse)
    got = tbl.scan(spark, where={"doc_id": "7"}).select("doc_id", "n_tok").collect()
    exp = df.filter(F.col("doc_id") == "7").select("doc_id", "n_tok").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    # every doc_id must still be findable (pruning never loses rows)
    sample = [r.doc_id for r in df.select("doc_id").limit(20).collect()]
    for d in sample[:5]:
        assert tbl.scan(spark, where={"doc_id": d}).count() == 1


def test_pre_spec_files_always_kept(spark, warehouse):
    tbl, df = _bucket_table(spark, warehouse, pre_spec_rows=True)
    untupled = [f for f in tbl.data_files() if f.partition_json == "{}"]
    assert untupled, "fixture must contain pre-spec files"
    ppred = tbl._partition_predicate({"doc_id": "8"})
    assert all(ppred(f.partition_json) for f in untupled)
    # an even doc_id lives in the PRE-spec half; it must still be found
    assert tbl.scan(spark, where={"doc_id": "8"}).count() == 1


# ---------------------------------------------------------------------------
# truncate / identity range pruning
# ---------------------------------------------------------------------------

def test_truncate_range_pruning(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("tr", df.schema)
    tbl.set_partition_spec(TRUNC_SPEC)
    tbl.append(df)
    ppred = tbl._partition_predicate({"n_tok": (100, 149)})
    kept = [f for f in tbl.data_files() if ppred(f.partition_json)]
    # only the t=100 tuple covers [100,149]
    assert all('"n_tok_truncate50": 100' in f.partition_json for f in kept)
    got = tbl.scan(spark, where={"n_tok": (100, 149)}).count()
    exp = df.filter((F.col("n_tok") >= 100) & (F.col("n_tok") <= 149)).count()
    assert got == exp > 0


def test_truncate_range_straddling_two_tuples(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("tr2", df.schema)
    tbl.set_partition_spec(TRUNC_SPEC)
    tbl.append(df)
    ppred = tbl._partition_predicate({"n_tok": (95, 105)})
    kept_tuples = {
        f.partition_json for f in tbl.data_files() if ppred(f.partition_json)
    }
    want = {'{"n_tok_truncate50": 50}', '{"n_tok_truncate50": 100}'}
    all_tuples = {f.partition_json for f in tbl.data_files()}
    assert kept_tuples == want & all_tuples
    got = tbl.scan(spark, where={"n_tok": (95, 105)}).count()
    exp = df.filter((F.col("n_tok") >= 95) & (F.col("n_tok") <= 105)).count()
    assert got == exp


# ---------------------------------------------------------------------------
# partition-clustered manifests: footer-only skip
# ---------------------------------------------------------------------------

def test_partition_clustered_manifest_skip(spark, warehouse):
    tbl, df = _bucket_table(spark, warehouse)
    res = rewrite_manifests(tbl, min_manifests=1)
    assert res["manifests_out"] >= 4  # one per non-empty bucket
    planned, stats = tbl.plan_data_files({"doc_id": "7"})
    assert stats["manifests_read"] == 1, stats
    assert stats["manifests_total"] == res["manifests_out"]
    # and the scan through the pruned plan is still exact
    assert tbl.scan(spark, where={"doc_id": "7"}).count() == 1


def test_unpartitioned_rewrite_still_single_manifest(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("up", df.schema)
    for i in range(3):
        tbl.append(df.filter(F.col("doc_id").cast("long") % 3 == i))
    res = rewrite_manifests(tbl)
    assert res["manifests_out"] == 1
