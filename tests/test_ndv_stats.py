"""NDV statistics sidecar (operators/ndv_stats.py): Puffin-parity
DataSketches HLL stats — per-file sketches built in one distributed pass,
incremental refresh by sketch union (appends scan only new files),
bit-identical carried sketch rows, stale registrations never served.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
from lakehouse_benchmark_ingestion_spark.operators.ndv_stats import (
    build_ndv_stats,
    ndv_estimates,
    refresh_ndv_stats,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE

COLS = ["doc_id", "source", "n_tok"]


def _exact(df):
    row = df.agg(
        *[F.countDistinct(c).alias(c) for c in COLS]
    ).collect()[0]
    return {c: row[c] for c in COLS}


@pytest.fixture()
def ndv_table(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("ndv", df.schema)
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 0), num_files=3)
    return tbl, df


def test_build_estimates_close_to_exact(spark, ndv_table):
    tbl, df = ndv_table
    r = build_ndv_stats(spark, tbl, COLS)
    assert r["files_scanned"] == 3 and r["files_carried"] == 0
    exact = _exact(tbl.scan(spark))
    for c in COLS:
        est = r["estimates"][c]
        assert abs(est - exact[c]) <= max(2, 0.05 * exact[c]), (c, est, exact)
    got, source = ndv_estimates(spark, tbl)
    assert source == "stats-file"
    assert {x["column"]: x["ndv"] for x in got.collect()} == r["estimates"]


def test_refresh_scans_only_new_files(spark, ndv_table):
    tbl, df = ndv_table
    build_ndv_stats(spark, tbl, COLS)
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 1), num_files=2)
    r = refresh_ndv_stats(spark, tbl)
    assert r["files_scanned"] == 2 and r["files_carried"] == 3
    exact = _exact(tbl.scan(spark))
    for c in COLS:
        assert abs(r["estimates"][c] - exact[c]) <= max(2, 0.05 * exact[c])
    # refresh at an unchanged head is a no-op
    again = refresh_ndv_stats(spark, tbl)
    assert again.get("skipped") == "up-to-date" and again["files_scanned"] == 0


def test_incremental_union_matches_full_rebuild(spark, ndv_table):
    """Incremental (carry + union) agrees with a from-scratch rebuild at
    the same snapshot: per-file sketch rows are bit-identical (asserted),
    and the union estimates agree within the HIP estimator's merge-order
    sensitivity (see module doc — register merge is grouping-insensitive,
    the estimator is not)."""
    from lakehouse_benchmark_ingestion_spark.operators.ndv_stats import (
        SIDECAR_SCHEMA,
    )

    tbl, df = ndv_table
    build_ndv_stats(spark, tbl, COLS)
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 1), num_files=2)
    r_incr = refresh_ndv_stats(spark, tbl)
    r_full = build_ndv_stats(spark, tbl, COLS)
    a = spark.read.schema(SIDECAR_SCHEMA).parquet(r_incr["path"])
    b = spark.read.schema(SIDECAR_SCHEMA).parquet(r_full["path"])
    assert a.count() == b.count()
    assert (
        a.join(b, ["file_path", "column", "sketch", "n_rows"]).count()
        == a.count()
    ), "incremental sidecar rows differ bitwise from a full rebuild"
    for c in COLS:
        ei, ef = r_incr["estimates"][c], r_full["estimates"][c]
        assert abs(ei - ef) <= max(2, 0.02 * ef), (c, ei, ef)


def test_compaction_preserves_estimates(spark, ndv_table):
    """Same multiset of values regrouped into different files ⇒ identical
    union estimate; refresh after compaction scans only the rewritten
    outputs."""
    tbl, df = ndv_table
    before = build_ndv_stats(spark, tbl, COLS)["estimates"]
    compact(spark, tbl, target_file_size=64 * 1024 * 1024)
    r = refresh_ndv_stats(spark, tbl)
    assert r["files_carried"] == 0  # every pre-compaction file was rewritten
    for c in COLS:
        assert abs(r["estimates"][c] - before[c]) <= max(2, 0.02 * before[c])


def test_stale_registration_never_served(spark, ndv_table):
    tbl, df = ndv_table
    build_ndv_stats(spark, tbl, COLS)
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 1), num_files=1)
    with pytest.raises(ValueError, match="no ndv-stats file registered"):
        ndv_estimates(spark, tbl)
    got, source = ndv_estimates(spark, tbl, allow_recompute=True)
    assert source == "computed"
    exact = _exact(tbl.scan(spark))
    for row in got.collect():
        c = row["column"]
        assert abs(row["ndv"] - exact[c]) <= max(2, 0.05 * exact[c])


def test_alias_aware_across_rename(spark, warehouse):
    """Files written under a renamed-away column name still feed the
    sketch for the current name (coalesce across recorded lineage)."""
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("ndv_ren", df.schema)
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 0), num_files=1)
    tbl.rename_column("n_tok", "tok_count")
    tbl.append(
        df.filter(F.col("doc_id").cast("long") % 2 == 1).withColumnRenamed(
            "n_tok", "tok_count"
        ),
        num_files=1,
    )
    r = build_ndv_stats(spark, tbl, ["doc_id", "tok_count"])
    exact = tbl.scan(spark).agg(
        F.countDistinct("tok_count").alias("x")
    ).collect()[0]["x"]
    assert abs(r["estimates"]["tok_count"] - exact) <= max(2, 0.05 * exact)


def test_full_maintenance_auto_refreshes_registered_ndv(spark, ndv_table):
    """A registered NDV sidecar is refreshed to the post-maintenance head
    as a journaled suite stage (opt-out ndv-stats.auto=false); tables that
    never built one pay nothing."""
    from lakehouse_benchmark_ingestion_spark.plans.maintenance import (
        run_full_maintenance,
    )

    tbl, df = ndv_table
    m = run_full_maintenance(spark, tbl, target_file_size=4 * 1024 * 1024)
    assert "ndv_stats" not in m  # never built — no stage

    build_ndv_stats(spark, tbl, COLS)
    tbl.append(df.filter(F.col("doc_id").cast("long") % 2 == 1), num_files=2)
    m = run_full_maintenance(spark, tbl, target_file_size=4 * 1024 * 1024)
    assert "ndv_stats" in m
    got, source = ndv_estimates(spark, tbl)
    assert source == "stats-file"
    exact = _exact(tbl.scan(spark))
    for row in got.collect():
        c = row["column"]
        assert abs(row["ndv"] - exact[c]) <= max(2, 0.05 * exact[c])


def test_recompute_on_empty_snapshot(spark, ndv_table):
    """allow_recompute on a snapshot with zero live data files (delete-all)
    must return ndv=0 rows, not crash on an empty parquet path list."""
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
        delete_where,
    )

    tbl, df = ndv_table
    build_ndv_stats(spark, tbl, COLS)
    delete_where(spark, tbl, {"n_tok": (0, 10**9)}, strategy="cow")
    assert not tbl.data_files()
    got, source = ndv_estimates(spark, tbl, allow_recompute=True)
    assert source == "computed"
    est = {r["column"]: r["ndv"] for r in got.collect()}
    assert est == {c: 0 for c in COLS}
