"""POSITION deletes (Iceberg v2 pos-delete parity): exact row surgery by
(file_path, row_index) address — no merge key involved, no data file
rewritten at delete time; readers anti-join on the address, compaction
materializes and GCs the delete files.

Reference motivation: the reference's MOR sinks defer deletes to sidecar
files the reader merges (HudiCatalogSync MOR table type); icelite carries
both delete flavors (eq + pos) like Iceberg v2.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


@pytest.fixture()
def pos_table(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("posdel", df.schema)
    tbl.append(df.repartitionByRange(6, "n_tok"))
    return tbl


def test_pos_delete_defers_rewrite_and_scan_applies(spark, pos_table):
    tbl = pos_table
    df = tokens_df(spark, SF_SMOKE)
    files_before = {f.path for f in tbl.data_files()}
    expected_kept = df.filter(~(F.col("n_tok") >= 40)).count()

    res = delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor-pos")
    assert res["deleted_positions"] > 0
    # no data file rewritten, no eq-delete written — only a pos-delete file
    assert {f.path for f in tbl.data_files()} == files_before
    assert not tbl.delete_files()
    assert len(tbl.pos_delete_files()) == 1
    out = tbl.scan(spark)
    assert out.count() == expected_kept
    assert out.filter(F.col("n_tok") >= 40).count() == 0
    # survivors' token arrays intact (reader strips the address columns)
    assert out.columns == [f.name for f in tbl.schema.fields]
    assert out.filter(F.size("tokens") != F.col("n_tok")).count() == 0


def test_pos_delete_is_key_independent(spark, warehouse):
    """The semantic difference vs eq-delete: two physical rows sharing a
    key, predicate matching only one — pos-delete removes exactly the
    matching row; an eq-delete on the key would kill both."""
    cat = Catalog(warehouse)
    df = tokens_df(spark, SF_SMOKE).limit(10)
    dup = df.limit(1).withColumn("source", F.lit("dup-source"))
    tbl = cat.create_table("dupkeys", df.schema)
    tbl.append(df)
    tbl.append(dup)  # same doc_id, different source
    dup_id = dup.first()["doc_id"]
    assert tbl.scan(spark).filter(F.col("doc_id") == dup_id).count() == 2

    delete_where(spark, tbl, {"source": "dup-source"}, strategy="mor-pos")
    left = tbl.scan(spark).filter(F.col("doc_id") == dup_id)
    assert left.count() == 1
    assert left.first()["source"] != "dup-source"


def test_compaction_materializes_and_gcs_pos_deletes(spark, pos_table):
    tbl = pos_table
    expected_kept = tbl.scan(spark).count() - tbl.scan(spark).filter(
        F.col("n_tok") >= 40
    ).count()
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor-pos")
    compact(spark, tbl, target_file_size=4 << 20)
    assert not tbl.pos_delete_files()
    out = tbl.scan(spark)
    assert out.count() == expected_kept
    assert out.filter(F.col("n_tok") >= 40).count() == 0


def test_pos_and_eq_deletes_compose(spark, pos_table):
    tbl = pos_table
    df = tokens_df(spark, SF_SMOKE)
    expected = df.filter(~(F.col("n_tok") >= 40) & ~(F.col("n_tok") <= 20)).count()
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor-pos")
    delete_where(spark, tbl, {"n_tok": (None, 20)}, strategy="mor")
    assert len(tbl.pos_delete_files()) == 1
    assert len(tbl.delete_files()) == 1
    assert tbl.scan(spark).count() == expected
    # compaction clears BOTH sidecar flavors in one pass
    compact(spark, tbl, target_file_size=4 << 20)
    assert not tbl.delete_files() and not tbl.pos_delete_files()
    assert tbl.scan(spark).count() == expected


def test_time_travel_predates_pos_delete(spark, pos_table):
    tbl = pos_table
    before = tbl.current_snapshot().snapshot_id
    n_before = tbl.scan(spark).count()
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor-pos")
    assert tbl.scan(spark, snapshot_id=before).count() == n_before
    assert tbl.scan(spark).count() < n_before


def test_snapshot_changes_sees_pos_deleted_rows(spark, pos_table):
    from lakehouse_benchmark_ingestion_spark.operators.changes import (
        snapshot_changes,
    )

    tbl = pos_table
    before = tbl.current_snapshot().snapshot_id
    res = delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor-pos")
    after = tbl.current_snapshot().snapshot_id
    ch = snapshot_changes(spark, tbl, before, after)
    deleted = ch.filter(F.col("change_type") == "delete")
    assert deleted.count() == res["deleted_positions"]
    assert deleted.filter(F.col("n_tok") < 40).count() == 0


def test_clustering_rewrite_materializes_pos_deletes(spark, pos_table):
    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster

    tbl = pos_table
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor-pos")
    expected = tbl.scan(spark).count()
    cluster(spark, tbl, target_file_size=4 << 20)
    assert not tbl.pos_delete_files()
    out = tbl.scan(spark)
    assert out.count() == expected
    assert out.filter(F.col("n_tok") >= 40).count() == 0


def test_rewrite_position_deletes_merges_sidecars(spark, pos_table):
    """Three pos-delete commits → three sidecars; the rewrite action merges
    them into ONE sorted file with identical scan results, and a reader
    pinned before the rewrite still resolves the original three (snapshot
    isolation over delete metadata)."""
    from lakehouse_benchmark_ingestion_spark.operators.pos_delete_rewrite import (
        rewrite_position_deletes,
    )

    tbl = pos_table
    for band in [(40, 60), (61, 80), (81, None)]:
        delete_where(spark, tbl, {"n_tok": band}, strategy="mor-pos")
    assert len(tbl.pos_delete_files()) == 3
    pre = tbl.current_snapshot().snapshot_id
    expected = tbl.scan(spark).count()

    res = rewrite_position_deletes(spark, tbl)
    assert res["delete_files_in"] == 3 and res["delete_files_out"] == 1
    assert res["positions_in"] == res["positions_out"]  # nothing dangling
    assert len(tbl.pos_delete_files()) == 1
    out = tbl.scan(spark)
    assert out.count() == expected
    assert out.filter(F.col("n_tok") >= 40).count() == 0
    # pinned reader still sees the pre-rewrite sidecars and the same rows
    assert len(tbl.pos_delete_files(pre)) == 3
    assert tbl.scan(spark, snapshot_id=pre).count() == expected


def test_rewrite_position_deletes_drops_dangling(spark, pos_table):
    """A COW delete rewrites files whose rows a pos-delete addressed — those
    addresses dangle (the positions were applied into the rewrite's outputs
    and the old path removed). The rewrite action drops them."""
    from lakehouse_benchmark_ingestion_spark.operators.pos_delete_rewrite import (
        rewrite_position_deletes,
    )

    tbl = pos_table
    delete_where(spark, tbl, {"n_tok": (40, 60)}, strategy="mor-pos")
    delete_where(spark, tbl, {"n_tok": (61, 80)}, strategy="mor-pos")
    expected = tbl.scan(spark).count() - tbl.scan(spark).filter(
        F.col("n_tok") <= 20
    ).count()
    # COW delete: partially-matching files rewrite through the pos-aware
    # reader; fully-matching files drop metadata-only
    delete_where(spark, tbl, {"n_tok": (None, 20)}, strategy="cow")
    res = rewrite_position_deletes(spark, tbl)
    assert res["positions_out"] <= res["positions_in"]
    out = tbl.scan(spark)
    assert out.count() == expected
    assert out.filter((F.col("n_tok") >= 40) & (F.col("n_tok") <= 80)).count() == 0
    assert out.filter(F.col("n_tok") <= 20).count() == 0


def test_rewrite_position_deletes_noop_below_min(spark, pos_table):
    from lakehouse_benchmark_ingestion_spark.operators.pos_delete_rewrite import (
        rewrite_position_deletes,
    )

    tbl = pos_table
    delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor-pos")
    res = rewrite_position_deletes(spark, tbl)  # min_delete_files=2
    assert res["delete_files_out"] == 0
    assert len(tbl.pos_delete_files()) == 1


# --------------------------------------------------------------------------
# eq-delete -> pos-delete conversion (Iceberg v3 delete-file evolution)
# --------------------------------------------------------------------------

def test_convert_eq_deletes_to_pos_preserves_scan(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.pos_delete_rewrite import (
        convert_eq_deletes_to_pos,
        rewrite_position_deletes,
    )
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("seq_e2p", df.schema)
    tbl.append(df.repartitionByRange(3, "n_tok"))

    # two eq-deletes at different sequence numbers
    delete_where(spark, tbl, {"n_tok": (60, None)}, strategy="mor")
    # a row whose key IS in the first delete's key set, appended AFTER it:
    # the sequence rule protects it, and conversion must keep protecting it
    deleted_key = df.filter(F.col("n_tok") >= 60).select("doc_id").first()[0]
    revived = df.filter(F.col("doc_id") == deleted_key).withColumn(
        "source", F.lit("revived")
    )
    tbl.append(revived)
    delete_where(
        spark, tbl, {"n_tok": (0, 20)}, strategy="mor", verify_key_safety=False
    )
    assert len(tbl.delete_files()) == 2

    expected = tbl.scan(spark).orderBy("doc_id", "source").collect()
    assert any(r["source"] == "revived" for r in expected)

    m = convert_eq_deletes_to_pos(spark, tbl)
    assert m["eq_delete_files_in"] == 2
    assert m["pos_delete_files_out"] == 1
    assert not tbl.delete_files(), "eq-deletes must be gone"
    assert tbl.pos_delete_files(), "one pos sidecar must replace them"

    got = tbl.scan(spark).orderBy("doc_id", "source").collect()
    assert got == expected
    # the revived (post-delete) row survived the conversion
    assert any(r["source"] == "revived" for r in got)

    # converted sidecar merges with any other pos-deletes
    delete_where(spark, tbl, {"n_tok": (55, 59)}, strategy="mor-pos")
    expected2 = tbl.scan(spark).count()
    rewrite_position_deletes(spark, tbl, min_delete_files=2)
    assert len(tbl.pos_delete_files()) == 1
    assert tbl.scan(spark).count() == expected2


def test_convert_eq_to_pos_noop_without_deletes(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.pos_delete_rewrite import (
        convert_eq_deletes_to_pos,
    )
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("seq_e2p_noop", df.schema)
    tbl.append(df)
    snaps_before = len(tbl.history())
    m = convert_eq_deletes_to_pos(spark, tbl)
    assert m == {"eq_delete_files_in": 0, "pos_delete_files_out": 0}
    assert len(tbl.history()) == snaps_before


# ---- delete-debt-aware compaction (Iceberg delete-file-threshold) ---------


def test_delete_debt_counts_metadata_only(spark, pos_table):
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        delete_debt,
    )

    tbl = pos_table
    assert all(v == 0 for v in delete_debt(tbl).values())
    delete_where(spark, tbl, {"n_tok": (40, 60)}, strategy="mor-pos")
    debt = delete_debt(tbl)
    addressed = [p for p, d in debt.items() if d >= 1]
    # some but not all files sit inside the sidecar's file_path bounds
    assert addressed
    # an eq-delete counts against every older data file
    delete_where(spark, tbl, {"n_tok": (10, 12)}, strategy="mor")
    debt2 = delete_debt(tbl)
    assert all(debt2[p] >= debt[p] + 1 for p in debt)


def test_delete_file_threshold_rewrites_regardless_of_size(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
        plan_compaction,
    )

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("debt", df.schema)
    tbl.append(df, num_files=2)  # two LARGE files (vs the tiny target below)
    expected = df.filter(~((F.col("n_tok") >= 40) & (F.col("n_tok") <= 90))).count()
    delete_where(spark, tbl, {"n_tok": (40, 60)}, strategy="mor-pos")
    delete_where(spark, tbl, {"n_tok": (61, 90)}, strategy="mor-pos")
    assert len(tbl.pos_delete_files()) == 2

    # default planner: files are "large" (>= 0.75 * tiny target) -> no groups
    tiny = 1  # 1-byte target: nothing is a small file
    assert plan_compaction(tbl, tiny).groups == []
    # threshold planner: the addressed files become candidates at any size
    plan = plan_compaction(tbl, tiny, delete_file_threshold=2)
    assert plan.groups, "debt-laden files must be planned despite their size"

    m = compact(spark, tbl, target_file_size=tiny, delete_file_threshold=2)
    assert m.get("files_in", 0) >= 1
    # deletes materialized: sidecars addressing only rewritten files are GC'd
    assert not tbl.pos_delete_files()
    assert tbl.scan(spark).count() == expected
    # second pass: nothing left to do
    assert plan_compaction(tbl, tiny, delete_file_threshold=2).groups == []


def test_delete_debt_matches_naive_reference(spark, pos_table):
    """The bisect+sweep implementation must equal the quadratic reference
    on a table with mixed eq-deletes and multiple pos sidecars."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        delete_debt,
    )

    tbl = pos_table
    delete_where(spark, tbl, {"n_tok": (40, 50)}, strategy="mor-pos")
    delete_where(spark, tbl, {"n_tok": (80, 95)}, strategy="mor-pos")
    delete_where(spark, tbl, {"n_tok": (10, 12)}, strategy="mor")

    files = tbl.data_files()
    eq = tbl.delete_files()
    pos = tbl.pos_delete_files()
    naive = {}
    for f in files:
        d = sum(1 for e in eq if e.sequence_number > f.sequence_number)
        for s in pos:
            lo = s.lower_bounds.get("file_path") if s.lower_bounds else None
            hi = s.upper_bounds.get("file_path") if s.upper_bounds else None
            if lo is None or hi is None or (str(lo) <= f.path <= str(hi)):
                d += 1
        naive[f.path] = d
    assert delete_debt(tbl) == naive
    assert any(v > 0 for v in naive.values())
