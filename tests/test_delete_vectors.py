"""Deletion vectors (Iceberg v3 parity): position deletes encoded as ONE
bitmap per addressed data file (icelite/dv.py) instead of (file_path, pos)
rows. A DV *is* a CONTENT_POS_DELETES sidecar with delete_format="dv" —
identical sequence semantics, O(touched files) sidecar rows instead of
O(deleted positions).

Reference motivation: the reference writes Iceberg format-version=2 tables
(IcebergCatalogSync.java:112-116); DVs are v3's evolution of the same
delete surface the MOR sinks rely on.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite import dv as dvmod
from lakehouse_benchmark_ingestion_spark.icelite import manifest as mf
from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
from lakehouse_benchmark_ingestion_spark.operators.pos_delete_rewrite import (
    convert_pos_deletes_to_dv,
)
from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(7)
    for n in (0, 1, 63, 64, 65, 1000):
        pos = np.unique(rng.integers(0, 5000, size=n))
        assert np.array_equal(
            dvmod.unpack_positions(dvmod.pack_positions(pos)), pos
        )
    with pytest.raises(ValueError):
        dvmod.pack_positions(np.array([-1]))


@pytest.fixture()
def dv_table(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("dvdel", df.schema)
    tbl.append(df.repartitionByRange(6, "n_tok"))
    return tbl


def test_dv_delete_defers_rewrite_and_scan_applies(spark, dv_table):
    tbl = dv_table
    df = tokens_df(spark, SF_SMOKE)
    files_before = {f.path for f in tbl.data_files()}
    expected_kept = df.filter(~(F.col("n_tok") >= 40)).count()

    res = delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="dv")
    assert res["deleted_positions"] > 0
    assert res["delete_files_out"] == 1
    # no data file rewritten; ONE pos-delete sidecar, dv-encoded
    assert {f.path for f in tbl.data_files()} == files_before
    assert not tbl.delete_files()
    dels = tbl.pos_delete_files()
    assert len(dels) == 1 and dels[0].delete_format == mf.DELETE_FORMAT_DV
    # record_count of a delete file = delete records (positions)
    assert dels[0].record_count == res["deleted_positions"]
    out = tbl.scan(spark)
    assert out.count() == expected_kept
    assert out.filter(F.col("n_tok") >= 40).count() == 0
    assert out.columns == [f.name for f in tbl.schema.fields]
    assert out.filter(F.size("tokens") != F.col("n_tok")).count() == 0


def test_dv_sidecar_is_one_row_per_touched_file(spark, dv_table):
    """The scale property that motivates the encoding: sidecar rows ==
    addressed files, not deleted positions."""
    import pyarrow.parquet as pq

    tbl = dv_table
    res = delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="dv")
    side = tbl.pos_delete_files()[0]
    t = pq.read_table(side.path)
    assert t.num_rows <= len(tbl.data_files())
    assert t.num_rows < res["deleted_positions"]
    assert int(sum(t.column("cardinality").to_pylist())) == res[
        "deleted_positions"
    ]


def test_dv_sequence_rule_spares_newer_appends(spark, dv_table):
    """Rows appended AFTER the DV commit are never addressed, even when
    they match the original predicate (fseq > dseq)."""
    tbl = dv_table
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="dv")
    late = tokens_df(spark, SF_SMOKE).filter(F.col("n_tok") >= 40).limit(25)
    n_late = late.count()
    tbl.append(late)
    assert tbl.scan(spark).filter(F.col("n_tok") >= 40).count() == n_late


def test_dv_coexists_with_eq_deletes_and_row_pos(spark, dv_table):
    """All three delete flavors outstanding on one scan."""
    tbl = dv_table
    df = tokens_df(spark, SF_SMOKE)
    expected = df.filter(
        ~(F.col("n_tok") >= 90)
        & ~((F.col("n_tok") >= 30) & (F.col("n_tok") <= 45))
        & (F.col("source") != "src1")
    )
    delete_where(spark, tbl, {"n_tok": (90, None)}, strategy="dv")
    delete_where(spark, tbl, {"n_tok": (30, 45)}, strategy="mor-pos")
    delete_where(spark, tbl, {"source": "src1"}, strategy="mor")
    out = tbl.scan(spark)
    assert out.count() == expected.count()
    assert (
        out.select(F.sum(F.hash("doc_id", "source")).alias("h")).first()["h"]
        == expected.select(F.sum(F.hash("doc_id", "source")).alias("h")).first()["h"]
    )


def test_convert_pos_deletes_to_dv_merges_both_formats(spark, dv_table):
    tbl = dv_table
    expected = tbl.scan(spark).filter(
        ~((F.col("n_tok") >= 80))
        & ~((F.col("n_tok") >= 30) & (F.col("n_tok") <= 45))
    ).count()
    delete_where(spark, tbl, {"n_tok": (80, None)}, strategy="mor-pos")
    delete_where(spark, tbl, {"n_tok": (30, 45)}, strategy="dv")
    assert len(tbl.pos_delete_files()) == 2

    res = convert_pos_deletes_to_dv(spark, tbl)
    assert res["delete_files_in"] == 2 and res["delete_files_out"] == 1
    assert res["positions_out"] == res["positions_in"]  # nothing dangling
    dels = tbl.pos_delete_files()
    assert len(dels) == 1 and dels[0].delete_format == mf.DELETE_FORMAT_DV
    assert tbl.scan(spark).count() == expected
    # idempotent: a second convert is a metadata no-op
    res2 = convert_pos_deletes_to_dv(spark, tbl)
    assert res2["delete_files_out"] == 0


def test_compaction_materializes_and_gcs_dv(spark, dv_table):
    tbl = dv_table
    expected_kept = tbl.scan(spark).filter(~(F.col("n_tok") >= 40)).count()
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="dv")
    compact(spark, tbl, target_file_size=4 << 20)
    assert not tbl.pos_delete_files()
    out = tbl.scan(spark)
    assert out.count() == expected_kept
    assert out.filter(F.col("n_tok") >= 40).count() == 0


def test_datasource_read_applies_dv(spark, dv_table):
    from lakehouse_benchmark_ingestion_spark.sources.icelite_source import (
        IceliteDataSource,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(IceliteDataSource)
    tbl = dv_table
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="dv")
    native = tbl.scan(spark)
    import os

    via_ds = (
        spark.read.format("icelite")
        .option("warehouse", os.path.dirname(tbl.location))
        .option("table", "dvdel")
        .load()
    )
    assert via_ds.count() == native.count()
    cols = [f.name for f in tbl.schema.fields if f.name != "tokens"]
    a = native.select(F.sum(F.hash(*cols)).alias("h")).first()["h"]
    b = via_ds.select(F.sum(F.hash(*cols)).alias("h")).first()["h"]
    assert a == b


def test_fast_count_falls_back_under_dv(spark, dv_table):
    tbl = dv_table
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="dv")
    res = tbl.count_rows(spark)
    assert res["count"] == tbl.scan(spark).count()
