"""Hidden partitioning (Iceberg partition-spec parity, icelite/partition.py).

Contract under test:
  - appends derive partition tuples invisibly (synthetic _p cols, never
    stored in file contents — the data schema stays pure);
  - every data file belongs to exactly ONE partition tuple, recorded as
    partition_json in the manifest;
  - compaction never mixes partitions in a group and folds unpartitioned
    stragglers (pre-spec files, MERGE COW outputs) back under the spec;
  - partition evolution affects future writes only;
  - scan results are bit-identical to the unpartitioned table.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite import partition as ps
from lakehouse_benchmark_ingestion_spark.operators.compaction import (
    compact,
    plan_compaction,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE

IDENTITY_SPEC = [{"col": "source", "transform": "identity"}]
TRUNC_SPEC = [{"col": "n_tok", "transform": "truncate", "param": 50}]


def _table(spark, warehouse, spec, name="part"):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table(name, df.schema)
    if spec is not None:
        tbl.set_partition_spec(spec)
    return tbl, df


def test_identity_partitioned_append(spark, warehouse):
    tbl, df = _table(spark, warehouse, IDENTITY_SPEC)
    tbl.append(df)
    files = tbl.data_files()
    sources = set()
    for f in files:
        pv = json.loads(f.partition_json)
        assert set(pv) == {"source"}
        sources.add(pv["source"])
        # hidden partitioning: the file's CONTENT still carries the source
        # column, and every row matches the recorded tuple
        assert f.lower_bounds["source"] == pv["source"]
        assert f.upper_bounds["source"] == pv["source"]
    assert sources == {r["source"] for r in df.select("source").distinct().collect()}
    # scan is bit-identical to the input
    assert tbl.scan(spark).exceptAll(df).count() == 0
    assert df.exceptAll(tbl.scan(spark)).count() == 0


def test_truncate_partitioned_append(spark, warehouse):
    tbl, df = _table(spark, warehouse, TRUNC_SPEC, name="trunc")
    tbl.append(df)
    for f in tbl.data_files():
        pv = json.loads(f.partition_json)
        v = pv["n_tok_truncate50"]
        assert v % 50 == 0
        assert v <= f.lower_bounds["n_tok"] and f.upper_bounds["n_tok"] < v + 50
    assert tbl.scan(spark).count() == df.count()


def test_compaction_never_mixes_partitions(spark, warehouse):
    tbl, df = _table(spark, warehouse, IDENTITY_SPEC, name="cmix")
    for i in range(3):
        tbl.append(df.filter(F.col("doc_id").cast("long") % 3 == i))
    plan = plan_compaction(tbl, target_file_size=4 << 20)
    for g in plan.groups:
        assert g.partition_json != "{}"
        assert len({f.partition_json for f in g.files}) == 1
    res = compact(spark, tbl, target_file_size=4 << 20)
    assert res["files_out"] >= 1
    for f in tbl.data_files():
        pv = json.loads(f.partition_json)
        assert set(pv) == {"source"}
        assert f.lower_bounds["source"] == pv["source"] == f.upper_bounds["source"]
    assert tbl.scan(spark).exceptAll(df).count() == 0
    assert df.exceptAll(tbl.scan(spark)).count() == 0


def test_spec_evolution_folds_stragglers(spark, warehouse):
    """Files written BEFORE the spec carry '{}'; the next compaction lays
    them out under the current spec (self-healing layout)."""
    tbl, df = _table(spark, warehouse, None, name="evolve")
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 0))
    tbl.set_partition_spec(IDENTITY_SPEC)
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 1))
    pjsons = {f.partition_json for f in tbl.data_files()}
    assert "{}" in pjsons and len(pjsons) > 1
    compact(spark, tbl, target_file_size=4 << 20)
    for f in tbl.data_files():
        assert f.partition_json != "{}"
    assert tbl.scan(spark).exceptAll(df).count() == 0
    assert df.exceptAll(tbl.scan(spark)).count() == 0


def test_merge_cow_outputs_folded_by_compaction(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl, df = _table(spark, warehouse, IDENTITY_SPEC, name="mergefold")
    tbl.append(df)
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE))
    expected = tbl.scan(spark).count()
    assert any(f.partition_json == "{}" for f in tbl.data_files())
    compact(spark, tbl, target_file_size=4 << 20)
    assert all(f.partition_json != "{}" for f in tbl.data_files())
    assert tbl.scan(spark).count() == expected


def test_cluster_delegates_to_partition_aware_rewrite(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster

    tbl, df = _table(spark, warehouse, IDENTITY_SPEC, name="clus")
    tbl.append(df)
    res = cluster(spark, tbl, target_file_size=4 << 20)
    assert res.get("groups", 0) >= 1
    for f in tbl.data_files():
        assert f.partition_json != "{}"
    assert tbl.scan(spark).count() == df.count()


def test_bucket_and_partition_spec_are_exclusive(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table(
        "bkt", df.schema, properties={"bucket-key": "doc_id", "bucket-n": "4"}
    )
    with pytest.raises(ValueError, match="exclusive"):
        tbl.set_partition_spec(IDENTITY_SPEC)


def test_partitions_metadata_table(spark, warehouse):
    tbl, df = _table(spark, warehouse, IDENTITY_SPEC, name="meta")
    tbl.append(df)
    md = tbl.metadata_df(spark, "partitions")
    rows = {json.loads(r["partition_json"])["source"]: r for r in md.collect()}
    per_source = {
        r["source"]: r["n"]
        for r in df.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    assert set(rows) == set(per_source)
    for s, n in per_source.items():
        assert rows[s]["record_count"] == n


def test_deletes_compose_with_partitions(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    tbl, df = _table(spark, warehouse, IDENTITY_SPEC, name="pdel")
    tbl.append(df)
    expected = df.filter(
        ~((F.col("n_tok") >= 40) & (F.col("n_tok") <= 60))
        & ~(F.col("n_tok") > 100)
    ).count()
    delete_where(spark, tbl, {"n_tok": (40, 60)}, strategy="mor-pos")
    delete_where(spark, tbl, {"n_tok": (101, None)}, strategy="mor")
    assert tbl.scan(spark).count() == expected
    compact(spark, tbl, target_file_size=4 << 20)
    assert tbl.scan(spark).count() == expected
    assert all(f.partition_json != "{}" for f in tbl.data_files())


def test_partition_json_path_roundtrip():
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType()),
            T.StructField("n_tok", T.IntegerType()),
            T.StructField("source", T.StringType()),
        ]
    )
    spec = ps.parse_spec(
        {
            ps.PROP_KEY: json.dumps(
                [
                    {"col": "source", "transform": "identity"},
                    {"col": "n_tok", "transform": "truncate", "param": 50},
                ]
            )
        }
    )
    path = "/wh/t/data/abc/_p0=src1/_p1=100/part-00000.parquet"
    assert json.loads(ps.partition_json_from_path(path, spec, schema)) == {
        "source": "src1",
        "n_tok_truncate50": 100,
    }
    assert ps.partition_json_from_path("/wh/t/data/abc/part-0.parquet", spec, schema) == "{}"


def test_should_compact_counts_stragglers_as_work(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.plans.maintenance import (
        CompactionPolicy,
        should_compact,
    )

    tbl, df = _table(spark, warehouse, None, name="policystrag")
    tbl.append(df, num_files=1)  # one big-enough file, no deletes
    policy = CompactionPolicy(
        min_small_files=99, small_file_bytes=1, max_commits=1, max_seconds=10**9
    )
    assert not should_compact(tbl, policy)["compact"]
    tbl.set_partition_spec(IDENTITY_SPEC)
    assert should_compact(tbl, policy)["compact"]  # layout debt = work
