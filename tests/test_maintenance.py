"""End-to-end maintenance suite tests (SURVEY.md §5.2-5.4, north_rule).

Golden-scan: post-maintenance scan equals pre-maintenance scan row-for-row
under token-array equality. Snapshot isolation: readers pinned to old
snapshots see pre-compaction files; expired snapshots become unreadable.
Resume: an interrupted compaction never recompacts finished groups.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.operators.compaction import (
    compact,
    plan_compaction,
)
from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster
from lakehouse_benchmark_ingestion_spark.operators.expire_snapshots import expire_snapshots
from lakehouse_benchmark_ingestion_spark.operators.manifest_rewrite import rewrite_manifests
from lakehouse_benchmark_ingestion_spark.plans.lineage import LineageLog
from lakehouse_benchmark_ingestion_spark.plans.maintenance import run_full_maintenance
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE

TARGET = 512 * 1024


def _sorted_rows(df):
    return df.orderBy("doc_id").collect()


def test_golden_scan_after_full_maintenance(spark, sequences_table):
    tbl = sequences_table
    before = _sorted_rows(tbl.scan(spark))
    metrics = run_full_maintenance(spark, tbl, target_file_size=TARGET, expire_keep_last=2)
    after = _sorted_rows(tbl.scan(spark))
    assert metrics["compact"]["files_in"] == 20
    assert metrics["compact"]["files_out"] < 20
    # row-for-row token-array equality (north_rule invariant)
    assert len(before) == len(after) == 500
    for b, a in zip(before, after):
        assert b.doc_id == a.doc_id
        assert b.tokens == a.tokens
        assert b.n_tok == a.n_tok and b.source == a.source
    # invariant: size(tokens) == n_tok survives maintenance
    bad = tbl.scan(spark).filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0


def test_compaction_output_is_key_sorted(spark, sequences_table):
    """Each output file must be internally _ckey-sorted (Z-order actually
    applied, not just bin-packed)."""
    from lakehouse_benchmark_ingestion_spark.functions.zorder import with_cluster_key

    tbl = sequences_table
    compact(spark, tbl, target_file_size=TARGET)
    for f in tbl.data_files():
        df = spark.read.schema(tbl.schema).parquet(f.path)
        keys = [r._ckey for r in with_cluster_key(df).select("_ckey").collect()]
        assert keys == sorted(keys)


def test_cluster_files_key_disjoint(spark, sequences_table):
    """Global clustering: per-file key ranges must not overlap (that is what
    range partitioning buys for scan pruning)."""
    from lakehouse_benchmark_ingestion_spark.functions.zorder import with_cluster_key

    tbl = sequences_table
    cluster(spark, tbl, target_file_size=64 * 1024)
    ranges = []
    for f in tbl.data_files():
        df = spark.read.schema(tbl.schema).parquet(f.path)
        mm = with_cluster_key(df).agg(
            F.min("_ckey").alias("lo"), F.max("_ckey").alias("hi")
        ).collect()[0]
        ranges.append((mm.lo, mm.hi))
    assert len(ranges) > 1  # actually split
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2


def test_snapshot_isolation(spark, sequences_table):
    tbl = sequences_table
    pre = tbl.current_snapshot().snapshot_id
    pre_files = {f.path for f in tbl.data_files()}
    compact(spark, tbl, target_file_size=TARGET)
    post = tbl.current_snapshot().snapshot_id
    assert post != pre
    # pinned reader resolves exactly the pre-compaction file list
    assert {f.path for f in tbl.data_files(pre)} == pre_files
    assert {f.path for f in tbl.data_files(post)} != pre_files
    # and the pinned scan still answers correctly
    assert tbl.scan(spark, snapshot_id=pre).count() == 500
    # parent lineage chain
    assert tbl.meta.snapshot(post).parent_id == pre


def test_expired_snapshots_unreadable_and_gcd(spark, sequences_table):
    import os

    tbl = sequences_table
    old = tbl.current_snapshot().snapshot_id
    old_files = {f.path for f in tbl.data_files()}
    compact(spark, tbl, target_file_size=TARGET, timestamp_ms=2_000_000)
    res = expire_snapshots(tbl, keep_last=1, as_of_ms=3_000_000)
    assert old in res["expired_ids"]
    with pytest.raises(KeyError):
        tbl.data_files(old)
    # replaced data files physically gone; current files intact
    assert all(not os.path.exists(p) for p in old_files)
    assert all(os.path.exists(f.path) for f in tbl.data_files())
    assert tbl.scan(spark).count() == 500


def test_expire_ttl_respected(spark, sequences_table):
    tbl = sequences_table  # snapshots at ts 1_000_000 + i*60_000
    res = expire_snapshots(
        tbl, older_than_ms=150_000, keep_last=1, as_of_ms=1_000_000 + 4 * 60_000
    )
    # ages: 240k,180k,120k,60k,0 → expire those > 150k old except protected
    assert res["expired"] == 2


def test_rewrite_manifests_pure_metadata(spark, sequences_table):
    tbl = sequences_table
    snap_before = tbl.current_snapshot()
    assert len(snap_before.manifests) == 5  # one per append
    files_before = {f.path for f in tbl.data_files()}
    rows_before = _sorted_rows(tbl.scan(spark))
    res = rewrite_manifests(tbl)
    assert res["manifests_in"] == 5 and res["manifests_out"] == 1
    snap_after = tbl.current_snapshot()
    assert len(snap_after.manifests) == 1
    assert {f.path for f in tbl.data_files()} == files_before  # no data movement
    assert _sorted_rows(tbl.scan(spark)) == rows_before


def test_resume_skips_finished_groups(spark, sequences_table):
    tbl = sequences_table
    plan = plan_compaction(tbl, target_file_size=64 * 1024, max_group_size=64 * 1024)
    assert len(plan.groups) >= 3, "need multiple groups for a meaningful resume test"
    run_id = "resumetest001"

    with pytest.raises(RuntimeError, match="injected failure"):
        compact(
            spark, tbl, target_file_size=64 * 1024, max_group_size=64 * 1024,
            run_id=run_id, fail_after_groups=2,
        )

    # crash happened BEFORE commit: readers still on the old snapshot
    assert len(tbl.data_files()) == 20
    log = LineageLog(tbl.location)
    done = log.done_tasks(run_id, "compact")
    assert len(done) == 2
    outputs_first_run = {p for row in done.values() for p in row.output_paths}

    # resume with the same run_id
    metrics = compact(
        spark, tbl, target_file_size=64 * 1024, max_group_size=64 * 1024, run_id=run_id
    )
    assert metrics["groups_resumed"] == 2
    assert metrics["groups_executed"] == len(plan.groups) - 2
    # finished groups were NOT recompacted: their output files are reused verbatim
    final_paths = {f.path for f in tbl.data_files()}
    assert outputs_first_run <= final_paths
    # and the table equals an uninterrupted run's content
    ref = tokens_df(spark, SF_SMOKE)
    assert tbl.scan(spark).exceptAll(ref).count() == 0
    assert ref.exceptAll(tbl.scan(spark)).count() == 0


def test_lineage_metrics_recorded(spark, sequences_table):
    tbl = sequences_table
    compact(spark, tbl, target_file_size=TARGET, run_id="lin001")
    rows = [r for r in LineageLog(tbl.location).all_rows() if r.run_id == "lin001"]
    assert rows, "lineage rows must exist"
    for r in rows:
        assert r.op == "compact" and r.status == "done"
        assert r.files_in > 0 and r.files_out > 0
        assert r.rows > 0 and r.bytes_in > 0 and r.bytes_out > 0
        assert r.snapshot_id >= 1


def test_compaction_plan_binpacking_invariants(spark, sequences_table):
    tbl = sequences_table
    target = 64 * 1024
    plan = plan_compaction(tbl, target_file_size=target)
    seen = set()
    for g in plan.groups:
        assert len(g.files) >= 2
        for f in g.files:
            assert f.path not in seen  # disjoint
            seen.add(f.path)
        # bins respect the max group size (single file may exceed)
        assert g.bytes_in <= 8 * target or len(g.files) == 1
    # plan is deterministic
    plan2 = plan_compaction(tbl, target_file_size=target)
    assert [[f.path for f in g.files] for g in plan.groups] == [
        [f.path for f in g.files] for g in plan2.groups
    ]


def test_salted_compaction_preserves_content(spark, sequences_table):
    tbl = sequences_table
    compact(spark, tbl, target_file_size=TARGET, n_salts=4)
    ref = tokens_df(spark, SF_SMOKE)
    assert tbl.scan(spark).exceptAll(ref).count() == 0
    assert ref.exceptAll(tbl.scan(spark)).count() == 0


def test_hilbert_compaction_preserves_content(spark, sequences_table):
    tbl = sequences_table
    compact(spark, tbl, target_file_size=TARGET, curve="hilbert")
    ref = tokens_df(spark, SF_SMOKE)
    assert tbl.scan(spark).exceptAll(ref).count() == 0
    assert ref.exceptAll(tbl.scan(spark)).count() == 0


def test_salting_splits_identical_key_runs(spark, warehouse):
    """The skew case range partitioning cannot fix alone: rows sharing ONE
    exact (source, n_tok, doc_id) triple interleave to ONE _ckey value, and
    no quantile boundary can split an identical-key run — only the salt
    can. With n_salts>1 the dominant run must spread across several output
    files instead of one straggler holding all of it."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog

    # token CONTENT varies (else parquet RLE shrinks the table below one
    # output file); the clustering KEY (source, n_tok, doc_id) stays
    # identical for the dominant run
    toks = "transform(sequence(1, 16), i -> cast(hash(id, i) as int))"
    dom = 9000  # 90% of rows share one key triple
    skew = spark.range(dom).select(
        F.lit("dup-doc").alias("doc_id"),
        F.expr(toks).alias("tokens"),
        F.lit(16).cast("int").alias("n_tok"),
        F.lit("src-hot").alias("source"),
    )
    rest = spark.range(1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        F.expr(toks).alias("tokens"),
        F.lit(16).cast("int").alias("n_tok"),
        F.concat(F.lit("s"), F.col("id") % 5).alias("source"),
    )
    df = skew.unionByName(rest)
    tbl = Catalog(warehouse).create_table("skewed", df.schema)
    tbl.append(df, num_files=4)

    target = 16 * 1024  # force n_out >> n_salts so balance is observable
    m = cluster(spark, tbl, curve="zorder", target_file_size=target, n_salts=8)
    assert m["files_out"] >= 8

    per_file = {
        f.path: f.record_count for f in tbl.data_files()
    }
    hot_max = max(per_file.values())
    # one file must NOT hold the whole dominant run (9000 rows); with 8
    # salts the run splits ~8 ways (allow 2x sampling slack)
    assert hot_max <= dom / 8 * 2.5, per_file
    # content preserved
    assert tbl.scan(spark).count() == dom + 1000
    assert (
        tbl.scan(spark).filter(F.col("doc_id") == "dup-doc").count() == dom
    )


def test_targeted_compaction_where_rewrites_only_matching_files(spark, warehouse):
    """compact(where=) — Iceberg rewrite_data_files(filter) parity: only
    files the predicate cannot rule out are rewritten; disjoint files keep
    their exact paths, and the post-compaction scan is unchanged."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("targeted", df.schema)
    srcs = sorted(r[0] for r in df.select("source").distinct().collect())
    lo_srcs, hi_srcs = srcs[: len(srcs) // 2], srcs[len(srcs) // 2:]
    # two appends with disjoint source ranges -> files prune cleanly
    tbl.append(df.filter(F.col("source").isin(lo_srcs)), num_files=4)
    tbl.append(df.filter(F.col("source").isin(hi_srcs)), num_files=4)
    before = {f.path for f in tbl.data_files()}
    total_before = tbl.scan(spark).count()

    compact(spark, tbl, target_file_size=TARGET, where={"source": hi_srcs[0]})
    after = {f.path for f in tbl.data_files()}
    # the lo-range append's files are untouched (bounds disjoint from the
    # predicate); the hi side actually changed layout
    assert len(before & after) >= 4, (before, after)
    assert after != before
    assert tbl.scan(spark).count() == total_before
