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
        r.group_key: (r.n_rows, r.sum_val, r.min_val, r.max_val)
        for r in tbl.scan(spark)
        .groupBy(F.col("source").alias("group_key"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_tok").cast("long").alias("sum_val"),
            F.min("n_tok").cast("long").alias("min_val"),
            F.max("n_tok").cast("long").alias("max_val"),
        )
        .collect()
    }


def _mv_state(spark, mv):
    return {
        r.group_key: (r.n_rows, r.sum_val, r.min_val, r.max_val)
        for r in mv.scan(spark).collect()
    }


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


def test_mv_minmax_rescoped_recompute(spark, sequences_table, warehouse):
    """Deleting a group's extreme triggers a per-group recompute (reported
    in the metrics); inserts fold in without any recompute; untouched
    groups never trigger one."""
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    tbl = sequences_table
    mv = create_agg_view(spark, Catalog(warehouse), tbl, "mv_mm", "source", "n_tok")

    # insert a new global max for one source: pure fold, no recompute
    top = (
        tbl.scan(spark)
        .orderBy(F.col("n_tok").desc())
        .limit(1)
        .withColumn("doc_id", F.concat(F.lit("mm-"), F.col("doc_id")))
        .withColumn("n_tok", (F.col("n_tok") + 1000).cast("int"))
    )
    tbl.append(top)
    r = refresh_agg_view(spark, tbl, mv)
    assert r["recomputed_groups"] == 0
    assert _mv_state(spark, mv) == _direct(spark, tbl)

    # now DELETE that max row: its group must be recomputed — and only it
    delete_where(spark, tbl, {"n_tok": (1000, None)}, strategy="mor")
    r = refresh_agg_view(spark, tbl, mv)
    assert r["recomputed_groups"] == 1
    assert _mv_state(spark, mv) == _direct(spark, tbl)

    # delete strictly interior values (neither min nor max anywhere):
    # no group may recompute, aggregates still track
    lo = tbl.scan(spark).agg(F.min("n_tok")).collect()[0][0]
    hi = tbl.scan(spark).agg(F.max("n_tok")).collect()[0][0]
    per_group = {
        r["group_key"]: (r["mn"], r["mx"])
        for r in tbl.scan(spark)
        .groupBy(F.col("source").alias("group_key"))
        .agg(F.min("n_tok").alias("mn"), F.max("n_tok").alias("mx"))
        .collect()
    }
    interior_lo = max(mn for mn, _ in per_group.values()) + 1
    interior_hi = min(mx for _, mx in per_group.values()) - 1
    if interior_lo <= interior_hi:
        delete_where(
            spark, tbl, {"n_tok": (interior_lo, interior_hi)}, strategy="mor"
        )
        r = refresh_agg_view(spark, tbl, mv)
        assert r["recomputed_groups"] == 0
        assert _mv_state(spark, mv) == _direct(spark, tbl)


def test_mv_refresh_pins_rescope_to_delta_head(
    spark, sequences_table, warehouse, monkeypatch
):
    """A base commit landing MID-refresh (between the delta's to_id capture
    and the rescoped min/max recompute) must NOT leak into the refreshed
    MV: the rescope scans the pinned to_id, so the concurrent rows arrive
    exactly once — via the NEXT refresh's delta — never twice."""
    from lakehouse_benchmark_ingestion_spark.icelite.table import IceliteTable
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    tbl = sequences_table
    mv = create_agg_view(spark, Catalog(warehouse), tbl, "mv_race", "source", "n_tok")

    # graze a group's max so the refresh must run a rescoped recompute
    hi = tbl.scan(spark).agg(F.max("n_tok")).collect()[0][0]
    delete_where(spark, tbl, {"n_tok": (hi, hi)}, strategy="mor")
    state_at_delete = _direct(spark, tbl)

    # a concurrent writer's batch, materialized up front so appending it
    # inside the scan hook doesn't recurse into scan
    concurrent = (
        tbl.scan(spark)
        .limit(1)
        .withColumn("doc_id", F.lit("race-doc"))
        .localCheckpoint()
    )

    orig_scan = IceliteTable.scan
    fired = {"done": False}

    def racing_scan(self, spark_, snapshot_id=None, **kw):
        # first pinned base scan inside the refresh = the rescoped
        # recompute; sneak a concurrent commit in just before it resolves
        if (
            not fired["done"]
            and self.location == tbl.location
            and snapshot_id is not None
        ):
            fired["done"] = True
            monkeypatch.setattr(IceliteTable, "scan", orig_scan)
            self.append(concurrent, num_files=1)
        return orig_scan(self, spark_, snapshot_id=snapshot_id, **kw)

    monkeypatch.setattr(IceliteTable, "scan", racing_scan)
    r = refresh_agg_view(spark, tbl, mv)
    monkeypatch.setattr(IceliteTable, "scan", orig_scan)
    assert r["refreshed"] is True and r["recomputed_groups"] >= 1
    assert fired["done"], "race hook never fired — rescope not exercised"
    # refresh reflects exactly the pinned snapshot (pre-race state)
    assert _mv_state(spark, mv) == state_at_delete
    # the concurrent row arrives exactly once, via the next delta
    r2 = refresh_agg_view(spark, tbl, mv)
    assert r2["refreshed"] is True
    assert _mv_state(spark, mv) == _direct(spark, tbl)
