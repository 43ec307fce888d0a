"""Partition-spec MIGRATION (operators/compaction.migrate_partition_spec).

Iceberg parity: spec evolution is metadata-only (future writes only), and
RewriteDataFiles always writes under the table's CURRENT spec — so one
rewrite pass after ``set_partition_spec`` migrates the whole layout.

Contract under test:
  - migration rewrites EXACTLY the non-conforming files (old-spec eras and
    "{}" stragglers) and leaves conforming files untouched (same paths);
  - after one pass every live file's tuple belongs to the current spec;
  - a second pass plans zero groups (idempotent);
  - scan results are bit-identical across the migration;
  - dropping the spec (None) folds partitioned eras back to plain files;
  - outstanding MOR deletes are applied during the rewrite (outputs are
    delete-free) — same machinery as compaction.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite import partition as ps
from lakehouse_benchmark_ingestion_spark.operators.compaction import (
    migrate_partition_spec,
    plan_compaction,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE

IDENTITY_SPEC = [{"col": "source", "transform": "identity"}]
TRUNC_SPEC = [{"col": "n_tok", "transform": "truncate", "param": 50}]


def _three_era_table(spark, warehouse, name="mig"):
    """unpartitioned era -> truncate(n_tok) era -> identity(source) era."""
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table(name, df.schema)
    third = F.col("doc_id").cast("long") % 3
    tbl.append(df.filter(third == 0), num_files=2)
    tbl.set_partition_spec(TRUNC_SPEC)
    tbl.append(df.filter(third == 1))
    tbl.set_partition_spec(IDENTITY_SPEC)
    tbl.append(df.filter(third == 2))
    return tbl, df


def _tuple_keysets(tbl):
    return {frozenset(json.loads(f.partition_json)) for f in tbl.data_files()}


def test_migrate_heals_all_eras(spark, warehouse):
    tbl, df = _three_era_table(spark, warehouse)
    assert len(_tuple_keysets(tbl)) == 3  # {}, {n_tok_truncate50}, {source}
    conforming_before = {
        f.path
        for f in tbl.data_files()
        if ps.conforms(f.partition_json, tbl.partition_spec)
    }
    res = migrate_partition_spec(spark, tbl, target_file_size=4 << 20)
    assert res["groups"] > 0
    files = tbl.data_files()
    for f in files:
        assert ps.conforms(f.partition_json, tbl.partition_spec), f.partition_json
        pv = json.loads(f.partition_json)
        # recorded tuple is real: file bounds agree with it
        assert f.lower_bounds["source"] == pv["source"] == f.upper_bounds["source"]
    # current-era files were never touched
    assert conforming_before <= {f.path for f in files}
    # content is bit-identical
    assert tbl.scan(spark).exceptAll(df).count() == 0
    assert df.exceptAll(tbl.scan(spark)).count() == 0


def test_migrate_is_idempotent(spark, warehouse):
    tbl, _ = _three_era_table(spark, warehouse, name="mig2")
    migrate_partition_spec(spark, tbl, target_file_size=4 << 20)
    snap = tbl.current_snapshot().snapshot_id
    plan = plan_compaction(tbl, 4 << 20, spec_migration=True)
    assert plan.groups == []
    res = migrate_partition_spec(spark, tbl, target_file_size=4 << 20)
    assert res["groups"] == 0
    assert tbl.current_snapshot().snapshot_id == snap  # no empty commit


def test_migrate_to_unpartitioned_folds_back(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mig3", df.schema)
    tbl.set_partition_spec(IDENTITY_SPEC)
    tbl.append(df)
    assert all(f.partition_json != "{}" for f in tbl.data_files())
    tbl.set_partition_spec(None)
    migrate_partition_spec(spark, tbl, target_file_size=4 << 20)
    assert all(f.partition_json == "{}" for f in tbl.data_files())
    assert tbl.scan(spark).exceptAll(df).count() == 0
    assert df.exceptAll(tbl.scan(spark)).count() == 0


def test_migrate_applies_outstanding_mor_deletes(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mig4", df.schema)
    tbl.append(df, num_files=2)  # unpartitioned era
    delete_where(spark, tbl, {"n_tok": (100, None)}, strategy="mor", key="doc_id")
    tbl.set_partition_spec(IDENTITY_SPEC)
    migrate_partition_spec(spark, tbl, target_file_size=4 << 20)
    expect = df.filter(~F.coalesce(F.col("n_tok") >= 100, F.lit(False)))
    got = tbl.scan(spark)
    assert got.exceptAll(expect).count() == 0
    assert expect.exceptAll(got).count() == 0
    # rewrite materialized the delete: sidecar GC'd, outputs conforming
    assert tbl.delete_files() == []
    assert all(
        ps.conforms(f.partition_json, tbl.partition_spec) for f in tbl.data_files()
    )
