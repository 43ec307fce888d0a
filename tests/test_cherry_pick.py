"""Snapshot cherry-pick (icelite/table.py cherry_pick — Iceberg's
cherrypick_snapshot): publish a staged append onto a main head that has
ADVANCED since staging; fast-forward covers only the unchanged case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


@pytest.fixture()
def staged(spark, warehouse):
    """Main: third==0 rows; branch 'audit' stages third==1; main then
    advances with third==2 (so fast-forward is impossible)."""
    df = tokens_df(spark, SF_SMOKE)
    third = F.col("doc_id").cast("long") % 3
    tbl = Catalog(warehouse).create_table("cp", df.schema)
    tbl.append(df.filter(third == 0), num_files=2)
    tbl.create_branch("audit")
    staged_snap = tbl.append(df.filter(third == 1), num_files=2, branch="audit")
    tbl.append(df.filter(third == 2), num_files=2)
    return tbl, df, staged_snap


def test_fast_forward_refuses_then_cherry_pick_publishes(spark, staged):
    tbl, df, staged_snap = staged
    with pytest.raises(ValueError, match="does not descend"):
        tbl.fast_forward("audit")
    before = tbl.scan(spark).count()
    snap = tbl.cherry_pick(staged_snap.snapshot_id)
    assert snap.summary["cherry-picked-from"] == str(staged_snap.snapshot_id)
    got = tbl.scan(spark)
    assert got.count() == df.count() and before < df.count()
    # full value equality: cherry-picked table == the synthesized source
    assert (
        got.select("doc_id", "n_tok", "source")
        .exceptAll(df.select("doc_id", "n_tok", "source"))
        .count()
        == 0
    )


def test_intervening_main_delete_does_not_suppress_staged_rows(spark, staged):
    """An eq-delete committed on main AFTER staging must not apply to the
    cherry-picked rows (they get a fresh, higher sequence number)."""
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
        delete_where,
    )

    tbl, df, staged_snap = staged
    # delete an n_tok range on main that also covers staged third==1 rows
    delete_where(spark, tbl, {"n_tok": (0, 50)}, strategy="mor")
    tbl.cherry_pick(staged_snap.snapshot_id)
    third = F.col("doc_id").cast("long") % 3
    got = tbl.scan(spark)
    # every staged row survives, including n_tok <= 50 ones
    staged_rows = df.filter(third == 1)
    assert got.filter(third == 1).count() == staged_rows.count()
    assert staged_rows.filter(F.col("n_tok") <= 50).count() > 0
    # main's own rows with n_tok <= 50 are gone
    assert got.filter((third != 1) & (F.col("n_tok") <= 50)).count() == 0


def test_cherry_pick_is_not_reappliable(spark, staged):
    tbl, df, staged_snap = staged
    tbl.cherry_pick(staged_snap.snapshot_id)
    with pytest.raises(ValueError, match="already cherry-picked"):
        tbl.cherry_pick(staged_snap.snapshot_id)
    # and fast-forward of the now-stale branch still refuses
    with pytest.raises(ValueError, match="does not descend"):
        tbl.fast_forward("audit")


def test_cherry_pick_refuses_non_append(spark, staged):
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
    )

    tbl, df, staged_snap = staged
    compact(spark, tbl, target_file_size=1 << 30)
    replace_snap = tbl.current_snapshot()
    assert replace_snap.operation != "append"
    with pytest.raises(ValueError, match="append snapshots only"):
        tbl.cherry_pick(replace_snap.snapshot_id)


def test_row_lineage_ids_survive_cherry_pick(spark, warehouse):
    """Ids assigned at staging are preserved verbatim — never reassigned."""
    from lakehouse_benchmark_ingestion_spark.icelite.table import (
        LINEAGE_ROW_ID_COL,
        ROW_LINEAGE_PROP,
    )

    df = tokens_df(spark, SF_SMOKE)
    half = F.col("doc_id").cast("long") % 2
    tbl = Catalog(warehouse).create_table(
        "cp_rl", df.schema, properties={ROW_LINEAGE_PROP: "true"}
    )
    tbl.append(df.filter(half == 0), num_files=1)
    tbl.create_branch("audit")
    staged_snap = tbl.append(df.filter(half == 1), num_files=1, branch="audit")
    staged_ids = {
        r["doc_id"]: r["rid"]
        for r in tbl.scan_lineage(spark, ref="audit")
        .select("doc_id", F.col(LINEAGE_ROW_ID_COL).alias("rid"))
        .collect()
    }
    tbl.append(df.filter(half == 0).limit(0), num_files=1)  # advance main
    tbl.cherry_pick(staged_snap.snapshot_id)
    got = {
        r["doc_id"]: r["rid"]
        for r in tbl.scan_lineage(spark)
        .filter(half == 1)
        .select("doc_id", F.col(LINEAGE_ROW_ID_COL).alias("rid"))
        .collect()
    }
    assert got == {k: v for k, v in staged_ids.items() if k in got}
    assert len(got) == df.filter(half == 1).count()


def test_cherry_pick_races_concurrent_append(spark, staged):
    """cherry_pick retries inside the optimistic commit loop: racing an
    append, both land, neither clobbers the other, and the published rows
    get a sequence number above everything at THEIR commit time."""
    import threading

    tbl, df, staged_snap = staged
    extra = df.limit(7).withColumn(
        "doc_id", F.concat(F.lit("race-"), F.col("doc_id"))
    )
    errs = []

    def do_append():
        try:
            tbl.append(extra, num_files=1)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    def do_pick():
        try:
            tbl.cherry_pick(staged_snap.snapshot_id)
        except Exception as e:  # pragma: no cover
            errs.append(e)

    ts = [threading.Thread(target=do_append), threading.Thread(target=do_pick)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs
    got = tbl.scan(spark)
    assert got.count() == df.count() + 7
    ops = [s.operation for s in tbl.history()]
    assert ops.count("append") >= 4  # 3 fixture appends + race commits


def test_cherry_pick_publish_once_survives_compaction(spark, staged):
    """Re-applying a published staged snapshot must be refused EVEN AFTER
    compaction rewrote the published files into new paths — the path-based
    duplicate check goes blind there, and a silent re-apply would
    duplicate every staged row (Iceberg: duplicate-WAP-commit guard)."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
    )

    tbl, df, staged_snap = staged
    tbl.cherry_pick(staged_snap.snapshot_id)
    n = tbl.scan(spark).count()
    compact(spark, tbl, target_file_size=256 * 1024 * 1024)
    # published paths are gone from main's live set now
    with pytest.raises(ValueError, match="already cherry-picked"):
        tbl.cherry_pick(staged_snap.snapshot_id)
    assert tbl.scan(spark).count() == n


def test_table_health_empty_table_shape(spark, warehouse):
    """A just-created table must report the same keys as a populated one
    (analyze --all consumers tabulate across tables)."""
    from lakehouse_benchmark_ingestion_spark.plans.maintenance import (
        table_health,
    )

    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    empty = cat.create_table("health_empty", df.schema)
    full = cat.create_table("health_full", df.schema)
    full.append(df, num_files=2)
    h_empty, h_full = table_health(empty), table_health(full)
    assert set(h_empty) == set(h_full)
    assert h_empty["snapshot_id"] is None and h_empty["files"] == 0
    assert h_empty["ndv_stats"] == "absent"
