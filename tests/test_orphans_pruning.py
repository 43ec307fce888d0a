"""Orphan-file GC + predicate-driven scan pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_remove_orphan_files(spark, sequences_table):
    from lakehouse_benchmark_ingestion_spark.operators.orphan_files import (
        remove_orphan_files,
    )

    tbl = sequences_table
    n_rows = tbl.scan(spark).count()

    # simulate a crash between write and commit: parquet landed, no snapshot
    orphan_dir = os.path.join(tbl.location, "data", "aborted-commit")
    tbl.scan(spark).limit(50).write.parquet(orphan_dir)
    orphan_files = [
        os.path.join(orphan_dir, n)
        for n in os.listdir(orphan_dir)
        if n.endswith(".parquet")
    ]
    assert orphan_files

    # grace interval protects the "in-flight" write
    r = remove_orphan_files(tbl, older_than_ms=3_600_000)
    assert r["deleted"] == 0 and all(os.path.exists(p) for p in orphan_files)

    # dry run reports, deletes nothing
    r = remove_orphan_files(tbl, older_than_ms=0, dry_run=True)
    assert r["orphans"] == len(orphan_files) and r["deleted"] == 0
    assert all(os.path.exists(p) for p in orphan_files)

    # real GC: orphans gone, referenced files and table answer intact
    r = remove_orphan_files(tbl, older_than_ms=0)
    assert r["deleted"] == len(orphan_files)
    assert not os.path.exists(orphan_dir)  # empty commit dir swept
    assert tbl.scan(spark).count() == n_rows
    # historical snapshots still resolve (nothing referenced was touched)
    first = tbl.history()[0].snapshot_id
    assert tbl.scan(spark, snapshot_id=first).count() > 0


def test_remove_orphan_files_distributed(spark, sequences_table):
    """Executor-side sweep: identical decisions to the driver variant —
    grace interval, dry run, deletion — with both the listing and the
    referenced set living in DataFrames, not driver memory."""
    from lakehouse_benchmark_ingestion_spark.operators.orphan_files import (
        remove_orphan_files_distributed,
    )

    tbl = sequences_table
    n_rows = tbl.scan(spark).count()

    orphan_dir = os.path.join(tbl.location, "data", "aborted-commit-dist")
    tbl.scan(spark).limit(50).write.parquet(orphan_dir)
    orphan_files = [
        os.path.join(orphan_dir, n)
        for n in os.listdir(orphan_dir)
        if n.endswith(".parquet")
    ]
    assert orphan_files

    r = remove_orphan_files_distributed(spark, tbl, older_than_ms=3_600_000)
    assert r["deleted"] == 0 and all(os.path.exists(p) for p in orphan_files)

    r = remove_orphan_files_distributed(spark, tbl, older_than_ms=0, dry_run=True)
    assert r["orphans"] == len(orphan_files) and r["deleted"] == 0

    r = remove_orphan_files_distributed(spark, tbl, older_than_ms=0)
    assert r["deleted"] == len(orphan_files)
    assert not any(os.path.exists(p) for p in orphan_files)
    assert tbl.scan(spark).count() == n_rows
    first = tbl.history()[0].snapshot_id
    assert tbl.scan(spark, snapshot_id=first).count() > 0


def test_scan_where_prunes_and_filters(spark, warehouse):
    """Range-partitioned layout (repartitionByRange on n_tok → disjoint
    per-file min/max) + where= predicates: files skip via manifest stats,
    rows stay exact. (Z-order files would NOT prune well on n_tok — the
    values span ~8 of its 21 bits, so it only sets low-order key bits; range
    layout is the right tool for single-column range predicates.)"""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    tbl.append(df.repartitionByRange(8, "n_tok", "doc_id"))
    files_total = len(tbl.data_files())
    assert files_total > 3

    # range predicate on n_tok: file skip is visible AND rows are exact
    expected = tbl.scan(spark).filter(
        (F.col("n_tok") >= 100) & (F.col("n_tok") <= 120)
    )
    got = tbl.scan(spark, where={"n_tok": (100, 120)})
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0
    scanned = {p.removeprefix("file://") for p in got.inputFiles()}
    assert 0 < len(scanned) < files_total, "no files were pruned"

    # equality predicate on the key — on a key-ranged layout (disjoint
    # doc_id bounds per file, the post-merge file shape)
    tbl2 = Catalog(warehouse).create_table("by_key", df.schema)
    tbl2.append(df.repartitionByRange(8, "doc_id"))
    got1 = tbl2.scan(spark, where={"doc_id": "42"})
    assert got1.count() == 1
    assert len(got1.inputFiles()) < len(tbl2.data_files())

    # open-ended range
    lo = tbl.scan(spark, where={"n_tok": (200, None)})
    assert lo.filter(F.col("n_tok") < 200).count() == 0


def test_orphan_sweep_reaps_dead_metadata(spark, warehouse):
    """Losing commit attempts leave uuid-named manifests no snapshot
    references, and partition-stats re-registrations supersede old stats
    dirs — the sweep reaps both (age-graced), never touching live
    manifests, version JSONs, or the registered stats file."""
    import os

    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.icelite import manifest as mf
    from lakehouse_benchmark_ingestion_spark.icelite import metadata as md
    from lakehouse_benchmark_ingestion_spark.operators.orphan_files import (
        remove_orphan_files,
    )
    from lakehouse_benchmark_ingestion_spark.operators.partition_stats import (
        read_partition_stats,
        write_partition_stats,
    )
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE).limit(30)
    tbl = Catalog(warehouse).create_table("morph", df.schema)
    tbl.append(df, num_files=2)
    # a dead manifest (losing-attempt shape: written, never referenced)
    dead = mf.write_manifest(tbl.location, mf.harvest_stats(
        [f.path for f in tbl.data_files()][:1]
    ))
    # superseded ndv-stats: build, advance the table, refresh (each
    # registration writes a fresh sidecar dir and re-points the property)
    from lakehouse_benchmark_ingestion_spark.operators.ndv_stats import (
        build_ndv_stats,
        ndv_estimates,
        refresh_ndv_stats,
    )

    build_ndv_stats(spark, tbl, ["source"])
    old_ndv = tbl.meta.properties["ndv-stats.path"]
    tbl.append(df.limit(5), num_files=1)
    refresh_ndv_stats(spark, tbl)
    new_ndv = tbl.meta.properties["ndv-stats.path"]
    assert old_ndv != new_ndv
    # superseded partition-stats: register twice at the (final) head so the
    # surviving registration stays snapshot-fresh for the read-back check
    write_partition_stats(spark, tbl)
    old_path = tbl.meta.properties["partition-stats.path"]
    write_partition_stats(spark, tbl)
    new_path = tbl.meta.properties["partition-stats.path"]
    assert old_path != new_path
    mdir = md.metadata_dir(tbl.location)
    n_vjson = len([n for n in os.listdir(mdir) if n.endswith(".metadata.json")])

    res = remove_orphan_files(tbl, older_than_ms=0)
    assert res["metadata_deleted"] >= 3, res
    assert not os.path.exists(os.path.join(mdir, dead))
    assert not os.path.exists(old_path)
    assert not os.path.exists(old_ndv)
    # live surfaces intact
    assert os.path.exists(new_path)
    assert os.path.exists(new_ndv)
    assert tbl.scan(spark).count() == 35
    df2, source = read_partition_stats(spark, tbl)
    assert source == "stats-file"
    est, src = ndv_estimates(spark, tbl)
    assert src == "stats-file" and est.count() == 1
    assert len([
        n for n in os.listdir(mdir) if n.endswith(".metadata.json")
    ]) == n_vjson, "version JSONs are never sweep candidates"
    # age grace: a FRESH dead manifest survives a graced sweep
    mf.write_manifest(tbl.location, [])
    res2 = remove_orphan_files(tbl, older_than_ms=10_000)
    assert res2["metadata_deleted"] == 0
