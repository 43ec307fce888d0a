"""Regression tests for round-2 advisor findings:

1. COW delete_where dropped rows where the predicate evaluated to NULL
   (null in a predicate column) — SQL DELETE must keep them; the mor and
   mor-pos strategies already did, so behavior was layout-dependent.
2. Compaction pinned output sequence numbers before the rewrite: a
   concurrent MOR delete committing mid-compaction landed at the same
   sequence and applied to neither the group reads nor the outputs
   (strict < rule) — deleted rows resurrected. Now every compaction
   commit runs Iceberg's validate-no-new-deletes against the plan
   snapshot and replans on conflict.
3. cluster() on a partition-spec table delegated to an all-files compact
   with no already-clustered skip — every maintenance cycle rewrote 100%
   of the table even when every file already carried the sort order.
4. range_join applied the BETWEEN as a post-join filter, silently turning
   any outer join into inner (NULL predicate on unmatched rows).
5. mor delete_where wrote predicate-matching KEYS as an eq-delete: on a
   non-unique key, live rows NOT matching the predicate that share a
   matched key were collaterally deleted.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite.metadata import ValidationFailed
from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where


def _docs_table(spark, tmp_path, rows, schema, name="t", num_files=1):
    df = spark.createDataFrame(rows, schema)
    tbl = Catalog(str(tmp_path / "wh")).create_table(name, df.schema)
    tbl.append(df, num_files=num_files, stat_columns=list(df.columns))
    return tbl


# ---------------------------------------------------------------- 1. nulls


def test_cow_delete_keeps_null_predicate_rows(spark, tmp_path):
    """DELETE WHERE src = 'a' on rows with src NULL: the null rows are not
    matched (predicate is NULL, not TRUE) and must survive the COW rewrite."""
    rows = [("d1", "a"), ("d2", "b"), ("d3", None), ("d4", None), ("d5", "a")]
    tbl = _docs_table(spark, tmp_path, rows, "doc_id string, src string")

    res = delete_where(spark, tbl, {"src": "a"}, strategy="cow", key="doc_id")

    got = {r.doc_id: r.src for r in tbl.scan(spark).collect()}
    assert got == {"d2": "b", "d3": None, "d4": None}, (
        "rows with NULL in the predicate column must be KEPT by DELETE"
    )
    assert res["rows_out"] == 3


def test_cow_delete_null_range_predicate(spark, tmp_path):
    rows = [("d1", 10), ("d2", None), ("d3", 99)]
    tbl = _docs_table(spark, tmp_path, rows, "doc_id string, n int")
    delete_where(spark, tbl, {"n": (0, 50)}, strategy="cow", key="doc_id")
    assert {r.doc_id for r in tbl.scan(spark).collect()} == {"d2", "d3"}


# ------------------------------------------- 2. validate-no-new-deletes


def _seq_table(spark, tmp_path, n_files=6):
    from tests.conftest import SF_SMOKE
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(str(tmp_path / "wh")).create_table("seqs", df.schema)
    for i in range(n_files):
        tbl.append(df.filter(F.crc32(F.col("doc_id")) % n_files == i), num_files=1)
    return tbl


def test_compact_aborts_on_concurrent_mor_delete(spark, tmp_path):
    """A mor delete committed AFTER the compaction plan was pinned must
    abort the stale swap (ValidationFailed), not resurrect the rows."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
        plan_compaction,
    )

    tbl = _seq_table(spark, tmp_path)
    plan = plan_compaction(tbl, target_file_size=512 * 1024 * 1024)
    victim = tbl.scan(spark).select("doc_id").first().doc_id
    delete_where(spark, tbl, {"doc_id": victim}, strategy="mor", key="doc_id")

    with pytest.raises(ValidationFailed, match="delete file"):
        compact(spark, tbl, plan=plan, delete_conflict_retries=0)

    # the aborted swap must leave the table consistent: row still deleted
    assert tbl.scan(spark).filter(F.col("doc_id") == victim).count() == 0


def test_compact_replans_and_applies_concurrent_delete(spark, tmp_path):
    """With the default retry, compaction replans from the post-delete
    snapshot; the rewrite applies the delete and the table compacts."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
        plan_compaction,
    )

    tbl = _seq_table(spark, tmp_path)
    n_before = tbl.scan(spark).count()
    plan = plan_compaction(tbl, target_file_size=512 * 1024 * 1024)
    victim = tbl.scan(spark).select("doc_id").first().doc_id
    delete_where(spark, tbl, {"doc_id": victim}, strategy="mor", key="doc_id")

    res = compact(spark, tbl, plan=plan)  # delete_conflict_retries=1 default

    assert res["files_out"] < res["files_in"]
    scan = tbl.scan(spark)
    assert scan.filter(F.col("doc_id") == victim).count() == 0
    assert scan.count() == n_before - 1
    # the replanned rewrite materialized the delete: no outstanding deletes
    assert tbl.delete_files() == []


# ------------------------------------------- 3. partitioned cluster skip


def test_partitioned_cluster_skips_when_already_clustered(spark, tmp_path):
    from tests.conftest import SF_SMOKE
    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(str(tmp_path / "wh")).create_table("pclu", df.schema)
    tbl.set_partition_spec([{"col": "source", "transform": "identity"}])
    tbl.append(df)

    first = cluster(spark, tbl, curve="zorder")
    assert "skipped" not in first
    sid = tbl.current_snapshot().snapshot_id

    second = cluster(spark, tbl, curve="zorder")
    assert second.get("skipped") == "already-clustered"
    assert tbl.current_snapshot().snapshot_id == sid, "no new snapshot"

    # a write invalidates the skip; a different curve also re-clusters
    tbl.append(df.limit(5))
    third = cluster(spark, tbl, curve="zorder")
    assert "skipped" not in third


def test_unpartitioned_compact_does_not_satisfy_global_cluster(spark, tmp_path):
    """A multi-group bin-pack compact leaves files internally sorted but
    not globally range-disjoint — cluster() must still run after it."""
    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    tbl = _seq_table(spark, tmp_path)
    compact(spark, tbl, curve="zorder")
    res = cluster(spark, tbl, curve="zorder")
    assert "skipped" not in res
    assert cluster(spark, tbl, curve="zorder").get("skipped") == "already-clustered"


# ------------------------------------------------- 4. range_join outer


def test_range_join_left_preserves_unmatched_probes(spark):
    from lakehouse_benchmark_ingestion_spark.operators.temporal import range_join

    probes = spark.createDataFrame([(1, 5), (2, 55), (3, 999)], "pid int, ts long")
    ivs = spark.createDataFrame([(10, 0, 20), (11, 50, 60)], "iid int, lo long, hi long")
    out = range_join(
        probes, ivs, F.col("ts"), F.col("lo"), F.col("hi"), bucket_width=64,
        how="left",
    ).collect()
    by_pid = {r.pid: r.iid for r in out}
    assert len(out) == 3, "left join keeps every probe exactly once"
    assert by_pid == {1: 10, 2: 11, 3: None}


def test_range_join_rejects_interval_preserving_outer(spark):
    from lakehouse_benchmark_ingestion_spark.operators.temporal import range_join

    probes = spark.createDataFrame([(1, 5)], "pid int, ts long")
    ivs = spark.createDataFrame([(10, 0, 20)], "iid int, lo long, hi long")
    with pytest.raises(ValueError, match="inner.*left"):
        range_join(
            probes, ivs, F.col("ts"), F.col("lo"), F.col("hi"),
            bucket_width=64, how="full",
        )


def test_range_join_inner_unchanged(spark):
    from lakehouse_benchmark_ingestion_spark.operators.temporal import range_join

    probes = spark.createDataFrame([(1, 5), (2, 55), (3, 999)], "pid int, ts long")
    ivs = spark.createDataFrame([(10, 0, 20), (11, 50, 60)], "iid int, lo long, hi long")
    out = range_join(
        probes, ivs, F.col("ts"), F.col("lo"), F.col("hi"), bucket_width=64
    ).collect()
    assert {(r.pid, r.iid) for r in out} == {(1, 10), (2, 11)}


# ------------------------------------------------- 5. mor key safety


def test_mor_delete_refuses_collateral_on_nonunique_key(spark, tmp_path):
    """key 'grp' is shared by matching and non-matching rows: the eq-delete
    would erase the non-matching rows too — must refuse and steer."""
    rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g3", "c")]
    tbl = _docs_table(spark, tmp_path, rows, "grp string, src string")

    with pytest.raises(ValueError, match="mor-pos"):
        delete_where(spark, tbl, {"src": "a"}, strategy="mor", key="grp")

    # nothing committed
    assert tbl.scan(spark).count() == 4

    # mor-pos is exact row surgery on the same predicate
    delete_where(spark, tbl, {"src": "a"}, strategy="mor-pos", key="grp")
    got = {(r.grp, r.src) for r in tbl.scan(spark).collect()}
    assert got == {("g1", "b"), ("g3", "c")}


def test_mor_delete_allows_safe_nonunique_key(spark, tmp_path):
    """All rows sharing each matched key also match the predicate — the
    eq-delete is exact and must commit (check passes, no false refusal)."""
    rows = [("g1", "a"), ("g1", "a"), ("g2", "b")]
    tbl = _docs_table(spark, tmp_path, rows, "grp string, src string")
    res = delete_where(spark, tbl, {"src": "a"}, strategy="mor", key="grp")
    assert res["deleted_keys"] == 2
    assert {r.grp for r in tbl.scan(spark).collect()} == {"g2"}


def test_mor_delete_key_check_optout(spark, tmp_path):
    rows = [("d1", "a"), ("d2", "a"), ("d3", "b")]
    tbl = _docs_table(spark, tmp_path, rows, "doc_id string, src string")
    res = delete_where(
        spark, tbl, {"src": "a"}, strategy="mor", key="doc_id",
        verify_key_safety=False,
    )
    assert res["deleted_keys"] == 2
    assert {r.doc_id for r in tbl.scan(spark).collect()} == {"d3"}


def test_merge_cow_aborts_on_concurrent_mor_delete(spark, tmp_path):
    """Same resurrect race as compaction, on the MERGE COW path: the merge
    pins its snapshot, a mor delete lands mid-rewrite, the stale swap must
    abort (ValidationFailed) instead of resurrecting the deleted row."""
    import importlib

    mi = importlib.import_module(
        "lakehouse_benchmark_ingestion_spark.operators.merge_into"
    )
    merge_into = mi.merge_into

    rows = [(i, f"old-{i}") for i in range(20)]
    tbl = _docs_table(spark, tmp_path, rows, "k int, v string")
    upd = spark.createDataFrame([(5, "new-5", 1)], "k int, v string, _seq long")

    # inject the concurrent delete between snapshot pinning and commit:
    # patch harvest_stats (called during the rewrite) to fire the delete once
    fired = {"done": False}
    orig = mi.mf.harvest_stats

    def hooked(paths, **kw):
        if not fired["done"]:
            fired["done"] = True
            delete_where(spark, tbl, {"k": 7}, strategy="mor", key="k")
        return orig(paths, **kw)

    import pytest as _pytest

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(mi.mf, "harvest_stats", hooked)
        with _pytest.raises(ValidationFailed):
            merge_into(spark, tbl, upd, key="k")

    got = {r.k: r.v for r in tbl.scan(spark).collect()}
    assert 7 not in got, "concurrently deleted row must stay deleted"
    assert got[5] == "old-5", "aborted merge must not partially apply"


def test_cluster_replans_on_concurrent_mor_delete(spark, tmp_path):
    """cluster() aborts the stale global swap and replans; the rerun applies
    the concurrent delete and the final table must not resurrect the row."""
    from lakehouse_benchmark_ingestion_spark.operators import clustering as cl
    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster

    tbl = _seq_table(spark, tmp_path)
    victim = tbl.scan(spark).select("doc_id").first().doc_id
    n_before = tbl.scan(spark).count()

    fired = {"done": False}
    orig = cl.mf.harvest_stats

    def hooked(paths, **kw):
        if not fired["done"]:
            fired["done"] = True
            delete_where(spark, tbl, {"doc_id": victim}, strategy="mor", key="doc_id")
        return orig(paths, **kw)

    import pytest as _pytest

    with _pytest.MonkeyPatch.context() as mp:
        mp.setattr(cl.mf, "harvest_stats", hooked)
        res = cluster(spark, tbl, curve="zorder")

    assert "snapshot_id" in res
    scan = tbl.scan(spark)
    assert scan.filter(F.col("doc_id") == victim).count() == 0
    assert scan.count() == n_before - 1
    assert tbl.delete_files() == [], "replanned rewrite materializes the delete"
