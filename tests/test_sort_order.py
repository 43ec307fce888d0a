"""Sort-order tracking + partial-progress compaction.

Iceberg parity: data files record the sort order their rows were written
under (sort_order_id analogue); ``cluster()`` proves a same-curve re-run is
redundant and skips the full-table rewrite — at 100 TB the most expensive
no-op possible. ``compact(partial_progress_commits=N)`` mirrors Iceberg's
rewrite_data_files partial-progress.enabled: intermediate snapshots every N
groups, so readers see progress and a crash loses at most N groups.
"""

from __future__ import annotations

import pytest

from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster
from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

TARGET = 512 * 1024


def _rows(tbl, spark):
    return [
        (r.doc_id, r.tokens, r.n_tok, r.source)
        for r in tbl.scan(spark).orderBy("doc_id").collect()
    ]


def test_compact_stamps_sort_order(spark, sequences_table):
    tbl = sequences_table
    assert all(f.sort_order == "" for f in tbl.data_files())  # appends: unsorted
    compact(spark, tbl, target_file_size=TARGET, curve="zorder")
    assert all(f.sort_order == "zorder" for f in tbl.data_files())
    # reload from disk — the field round-trips through the manifest
    from lakehouse_benchmark_ingestion_spark.icelite.table import IceliteTable

    fresh = IceliteTable.load(tbl.location)
    assert all(f.sort_order == "zorder" for f in fresh.data_files())


def test_cluster_rerun_is_metadata_noop(spark, sequences_table):
    tbl = sequences_table
    m1 = cluster(spark, tbl, curve="zorder", target_file_size=TARGET)
    assert "skipped" not in m1
    n_snaps = len(tbl.history())
    before = _rows(tbl, spark)

    m2 = cluster(spark, tbl, curve="zorder", target_file_size=TARGET)
    assert m2["skipped"] == "already-clustered"
    assert m2["snapshot_id"] == m1["snapshot_id"]
    assert len(tbl.history()) == n_snaps  # no commit
    assert _rows(tbl, spark) == before

    # a DIFFERENT curve is not satisfied by the zorder layout
    m3 = cluster(spark, tbl, curve="hilbert", target_file_size=TARGET)
    assert "skipped" not in m3
    assert all(f.sort_order == "hilbert" for f in tbl.data_files())


def test_cluster_not_skipped_after_write(spark, sequences_table):
    """Any commit after the cluster snapshot invalidates the skip."""
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    tbl = sequences_table
    cluster(spark, tbl, curve="zorder", target_file_size=TARGET)
    extra = tokens_df(spark, SF_SMOKE).limit(10)
    tbl.append(extra, timestamp_ms=2_000_000)
    m = cluster(spark, tbl, curve="zorder", target_file_size=TARGET)
    assert "skipped" not in m
    assert all(f.sort_order == "zorder" for f in tbl.data_files())


def test_partial_progress_commits(spark, sequences_table, warehouse):
    """Partial mode: intermediate snapshots land every N groups; the final
    table equals the all-or-nothing result row-for-row."""
    tbl = sequences_table
    golden = _rows(tbl, spark)
    n_before = len(tbl.history())

    m = compact(
        spark, tbl, target_file_size=TARGET, partial_progress_commits=1,
        max_concurrent_groups=2, max_group_size=96 * 1024,
    )
    assert m["groups"] >= 2
    assert m["partial_commits"] >= 1
    ops = [s.summary.get("op") for s in tbl.history()[n_before:]]
    assert "compact-partial" in ops and ops[-1] == "compact"
    # no file is double-committed or lost
    assert _rows(tbl, spark) == golden
    paths = [f.path for f in tbl.data_files()]
    assert len(paths) == len(set(paths))
    assert all(f.sort_order == "zorder" for f in tbl.data_files())


def test_partial_progress_crash_preserves_committed_work(spark, sequences_table):
    """Crash after K partial commits: the table stays consistent, shows the
    committed groups' progress, and a fresh run finishes the job."""
    tbl = sequences_table
    golden = _rows(tbl, spark)
    files_before = len(tbl.data_files())

    with pytest.raises(RuntimeError, match="injected failure"):
        compact(
            spark, tbl, target_file_size=TARGET,
            partial_progress_commits=1, fail_after_groups=1,
            run_id="pp-crash", max_group_size=48 * 1024,
        )
    # the completed group committed its swap; the rest are untouched
    assert any(
        s.summary.get("op") == "compact-partial" for s in tbl.history()
    )
    assert _rows(tbl, spark) == golden  # reads are never broken mid-run
    assert len(tbl.data_files()) < files_before

    # fresh resume (replans from the partially-compacted snapshot)
    m = compact(spark, tbl, target_file_size=TARGET, partial_progress_commits=1)
    assert _rows(tbl, spark) == golden
    assert m["groups"] >= 1
