"""Incremental materialized aggregate views: the MV must equal the direct
GROUP BY of the base table after every kind of base change (append, COW
merge, MOR delete), refreshed from CDC deltas only — and refresh must be
a no-op when already current."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.materialized import (
    create_agg_view,
    refresh_agg_view,
)


def _direct(spark, tbl):
    return {
        r.group_key: (r.n_rows, r.sum_val)
        for r in tbl.scan(spark)
        .groupBy(F.col("source").alias("group_key"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("sum_val"),
        )
        .collect()
    }


def _mv_state(spark, mv):
    return {r.group_key: (r.n_rows, r.sum_val) for r in mv.scan(spark).collect()}


def test_mv_tracks_base_through_append_merge_delete(spark, sequences_table, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df
    from tests.conftest import SF_SMOKE

    tbl = sequences_table
    cat = Catalog(warehouse)
    mv = create_agg_view(spark, cat, tbl, "mv_by_source", "source", "n_tok")
    assert _mv_state(spark, mv) == _direct(spark, tbl)

    # no-op refresh
    r = refresh_agg_view(spark, tbl, mv)
    assert r["refreshed"] is False

    # append
    extra = tbl.scan(spark).limit(5).withColumn(
        "doc_id", F.concat(F.lit("mv-"), F.col("doc_id"))
    )
    tbl.append(extra)
    r = refresh_agg_view(spark, tbl, mv)
    assert r["refreshed"] is True
    assert _mv_state(spark, mv) == _direct(spark, tbl)

    # COW merge (updates + inserts)
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE))
    refresh_agg_view(spark, tbl, mv)
    assert _mv_state(spark, mv) == _direct(spark, tbl)

    # MOR predicate delete (eq-delete file, no rewrite) — the diff must see
    # through the delete-applied scan
    delete_where(spark, tbl, {"n_tok": (0, 40)}, strategy="mor")
    refresh_agg_view(spark, tbl, mv)
    assert _mv_state(spark, mv) == _direct(spark, tbl)

    # idempotent: a second refresh at the same head changes nothing
    before = _mv_state(spark, mv)
    r = refresh_agg_view(spark, tbl, mv)
    assert r["refreshed"] is False and _mv_state(spark, mv) == before


def test_mv_drops_emptied_groups(spark, sequences_table, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    tbl = sequences_table
    cat = Catalog(warehouse)
    mv = create_agg_view(spark, cat, tbl, "mv_drop", "source", "n_tok")
    victim = tbl.scan(spark).select("source").limit(1).collect()[0][0]
    delete_where(spark, tbl, {"source": victim})
    refresh_agg_view(spark, tbl, mv)
    state = _mv_state(spark, mv)
    assert victim not in state
    assert state == _direct(spark, tbl)
