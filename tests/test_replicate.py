"""Incremental replication: the replica's scan must equal the source's
scan after every kind of source change, synced via CDC deltas only."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.replicate import (
    create_replica,
    sync_replica,
)


def _rows(spark, tbl):
    return sorted(
        (r.doc_id, r.n_tok, r.source, tuple(r.tokens))
        for r in tbl.scan(spark).collect()
    )


def test_replica_tracks_source(spark, sequences_table, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df
    from tests.conftest import SF_SMOKE

    src = sequences_table
    cat = Catalog(warehouse)
    rep = create_replica(spark, cat, src, "sequences_replica")
    assert _rows(spark, rep) == _rows(spark, src)

    r = sync_replica(spark, src, rep)
    assert r["synced"] is False

    # append on the source
    extra = src.scan(spark).limit(4).withColumn(
        "doc_id", F.concat(F.lit("rep-"), F.col("doc_id"))
    )
    src.append(extra)
    r = sync_replica(spark, src, rep)
    assert r["synced"] is True and r["inserts"] == 4 and r["deleted_keys"] == 0
    assert _rows(spark, rep) == _rows(spark, src)

    # COW merge: updates arrive as delete+insert pairs -> eq-delete + append
    merge_into(spark, src, updates_df(spark, SF_SMOKE))
    r = sync_replica(spark, src, rep)
    assert r["synced"] and r["deleted_keys"] > 0
    assert _rows(spark, rep) == _rows(spark, src)

    # predicate delete on the source (MOR there; diff sees through it)
    delete_where(spark, src, {"n_tok": (0, 40)}, strategy="mor")
    sync_replica(spark, src, rep)
    assert _rows(spark, rep) == _rows(spark, src)

    # replica compaction materializes its eq-deletes; rows unchanged
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    compact(spark, rep, target_file_size=4 * 1024 * 1024)
    assert not rep.delete_files()
    assert _rows(spark, rep) == _rows(spark, src)

    # idempotent at head
    r = sync_replica(spark, src, rep)
    assert r["synced"] is False
