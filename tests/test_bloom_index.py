"""Per-file bloom index: hash portability (Spark == Python), skipping power
on point lookups, conservative behavior for unindexed files, and result
correctness through scan(file_filter=...)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.operators.bloom_index import (
    _positions_py,
    bloom_file_filter,
    build_bloom_index,
    load_bloom_index,
    _position_cols,
)


def test_hash_family_matches_spark(spark):
    vals = ["42-0", "abc", "7", ""]
    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    rows = df.select("v", *_position_cols("v", 8192, 4)).collect()
    for r in rows:
        assert [r[f"_p{i}"] for i in range(4)] == _positions_py(r["v"], 8192, 4)


def test_bloom_skips_files_and_preserves_results(spark, sequences_table):
    tbl = sequences_table
    m = build_bloom_index(spark, tbl, "doc_id")
    n_files = len(tbl.data_files())
    assert m["files"] == n_files and n_files >= 2

    probe = tbl.scan(spark).select("doc_id").limit(1).collect()[0][0]

    # present key: the filtered scan returns exactly the unfiltered answer
    keep = bloom_file_filter(tbl, "doc_id", probe)
    assert keep is not None
    hit_files = [f for f in tbl.data_files() if keep(f)]
    want = tbl.scan(spark).filter(F.col("doc_id") == probe).count()
    got = (
        tbl.scan(spark, file_filter=keep).filter(F.col("doc_id") == probe).count()
    )
    assert got == want and want >= 1
    assert 1 <= len(hit_files) <= n_files

    # absent key: with 8192 bits and small per-file cardinality the bloom
    # should prove absence for (nearly) every file
    keep_absent = bloom_file_filter(tbl, "doc_id", "no-such-key-xyz")
    n_kept = sum(1 for f in tbl.data_files() if keep_absent(f))
    assert n_kept <= max(1, n_files // 4)
    assert (
        tbl.scan(spark, file_filter=keep_absent)
        .filter(F.col("doc_id") == "no-such-key-xyz")
        .count()
        == 0
    )


def test_bloom_unindexed_and_stale_snapshots(spark, sequences_table):
    tbl = sequences_table
    build_bloom_index(spark, tbl, "doc_id")
    old_snapshot = tbl.current_snapshot().snapshot_id
    # a commit moves the head: the sidecar is pinned to the OLD snapshot
    extra = tbl.scan(spark).limit(2).withColumn(
        "doc_id", F.concat(F.lit("new-"), F.col("doc_id"))
    )
    tbl.append(extra)
    assert load_bloom_index(tbl, "doc_id") is None  # current head unindexed
    assert bloom_file_filter(tbl, "doc_id", "x") is None
    # the old snapshot's index still probes
    keep = bloom_file_filter(tbl, "doc_id", "x", snapshot_id=old_snapshot)
    assert keep is not None
    # rebuild at the new head: new files indexed, new keys found
    build_bloom_index(spark, tbl, "doc_id")
    probe = extra.select("doc_id").limit(1).collect()[0][0]
    keep = bloom_file_filter(tbl, "doc_id", probe)
    assert tbl.scan(spark, file_filter=keep).filter(
        F.col("doc_id") == probe
    ).count() == 1


def test_scan_where_consults_bloom_automatically(spark, sequences_table):
    tbl = sequences_table
    build_bloom_index(spark, tbl, "doc_id")
    probe = tbl.scan(spark).select("doc_id").limit(1).collect()[0][0]
    assert tbl.scan(spark, where={"doc_id": probe}).count() >= 1
    assert tbl.scan(spark, where={"doc_id": "nope-zzz"}).count() == 0
    # range predicates must NOT consult the bloom (only equality can)
    assert tbl.scan(spark, where={"n_tok": (0, 10**9)}).count() == tbl.scan(spark).count()


def test_sidecar_is_parquet_no_driver_bitmaps(spark, sequences_table):
    """Round-2 advisor: the old sidecar collect()ed every bitmap to the
    driver and stored them in ONE JSON (OOM at 800k files). The header must
    stay bitmap-free and the bitmaps must live in a parquet dataset."""
    import glob
    import json
    import os

    tbl = sequences_table
    m = build_bloom_index(spark, tbl, "doc_id")
    sid = tbl.current_snapshot().snapshot_id
    header_path = os.path.join(
        tbl.location, "metadata", f"bloom-doc_id-{sid}.json"
    )
    with open(header_path) as fh:
        header = json.load(fh)
    assert "files" not in header and "bitmap" not in json.dumps(header)
    assert os.path.getsize(header_path) < 4096, "header must stay tiny"
    parts = glob.glob(
        os.path.join(tbl.location, "metadata", f"bloom-doc_id-{sid}", "part-*.parquet")
    )
    assert parts and m["sidecar_files"] == len(parts)

    # lazy probe: candidates= loads only the named files' rows
    files = tbl.data_files()
    keep = bloom_file_filter(tbl, "doc_id", "zzz-absent", candidates=files[:1])
    assert keep is not None
    # non-candidate files fall back to conservative keep=True
    assert keep(files[-1]) is True


def test_range_probe_filter_string_keys(spark, sequences_table):
    """String-typed indexed column whose values LOOK numeric (doc_id):
    bounds must be compared in the probe's domain — coercing "10"/"99" to
    int against str probes used to TypeError inside bisect. The filter
    must keep every file that really holds a probed key (results
    preserved) and skip at least one that does not (bloom + string-order
    bounds both engaged)."""
    from lakehouse_benchmark_ingestion_spark.operators.bloom_index import (
        bloom_range_probe_filter,
    )

    tbl = sequences_table
    build_bloom_index(spark, tbl, "doc_id")
    probes = ["7", "42"]
    keep = bloom_range_probe_filter(tbl, "doc_id", probes)
    assert keep is not None
    files = tbl.data_files()
    kept = [f for f in files if keep(f)]  # must not raise
    assert 0 < len(kept) < len(files), (len(kept), len(files))
    got = sorted(
        r["doc_id"]
        for r in tbl.scan(spark, file_filter=keep)
        .filter(F.col("doc_id").isin(probes))
        .collect()
    )
    assert got == sorted(probes)


def test_range_probe_filter_incomparable_bounds_conservative(spark, sequences_table):
    """A probe/bound type mismatch that survives normalization must degrade
    to bloom-checking the full probe set, never raise, and never skip a
    file that holds the key."""
    from lakehouse_benchmark_ingestion_spark.operators.bloom_index import (
        bloom_range_probe_filter,
    )

    tbl = sequences_table
    build_bloom_index(spark, tbl, "doc_id")
    keep = bloom_range_probe_filter(tbl, "doc_id", [("tuple", "probe"), ("x", "y")])
    files = tbl.data_files()
    [keep(f) for f in files]  # incomparable everywhere — must not raise
