"""Regression tests for round-1 advisor findings:

1. MOR range-overlap compared bounds lexicographically — numeric merge keys
   could classify an affected file as clean and resurrect deleted rows.
2. The eq-delete key was never persisted — a scan with the default key read
   delete parquet under the wrong column name and applied no deletes.
3. Delete files were read under the CURRENT key name — renaming the merge
   key orphaned pre-rename delete files (rows resurrected).
4. Bucketed merge skipped data files with bucket == -1 (pre-bucketing
   files) — upserts of keys living there duplicated.
5. The orphan empty-dir sweep had no age grace — it could rip out an
   in-flight write's scaffolding.
6. The LSH band-bucket collect_list was unbounded (cap now implemented).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F


def _numeric_key_table(spark, tmp_path, name="numkey"):
    """Table with an INT merge key k=0..29, one file, v = 'old-<k>'."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog

    df = spark.range(30).select(
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("old-"), F.col("id")).alias("v"),
    )
    tbl = Catalog(str(tmp_path / "wh")).create_table(name, df.schema)
    tbl.append(df, num_files=1, stat_columns=["k"])
    return tbl


def _upd(spark, keys):
    return spark.createDataFrame(
        [(int(k), f"new-{k}", 1) for k in keys], "k int, v string, _seq long"
    )


def test_mor_numeric_bounds_no_resurrection(spark, tmp_path):
    """Data bounds [0,29], delete keys [10,12]: lexicographic compare would
    say '0' <= '12' is True here but e.g. single-file bounds ['9','15'] vs
    ['10','12'] fail — use a file whose numeric bounds start above the
    delete range's string order to force the old bug."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    df = spark.range(9, 16).select(  # k = 9..15  → str bounds '9' > '15'...
        F.col("id").cast("int").alias("k"),
        F.concat(F.lit("old-"), F.col("id")).alias("v"),
    )
    tbl = Catalog(str(tmp_path / "wh")).create_table("numkey", df.schema)
    tbl.append(df, num_files=1, stat_columns=["k"])

    merge_into(spark, tbl, _upd(spark, [10, 11, 12]), key="k", strategy="mor")

    rows = {r.k: r.v for r in tbl.scan(spark).collect()}
    assert len(rows) == 7, "deleted keys must not resurrect alongside updates"
    assert rows[10] == "new-10" and rows[12] == "new-12" and rows[9] == "old-9"


def test_merge_key_recorded_and_enforced(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    tbl = _numeric_key_table(spark, tmp_path)
    merge_into(spark, tbl, _upd(spark, [3, 4]), key="k", strategy="mor")

    assert tbl.recorded_merge_key() == "k"
    # default scan resolves the recorded key (the old default 'doc_id'
    # would read all-null delete keys and apply nothing)
    rows = {r.k: r.v for r in tbl.scan(spark).collect()}
    assert rows[3] == "new-3" and len(rows) == 30
    # an explicit WRONG key must refuse, not silently resurrect
    with pytest.raises(ValueError, match="merge_key"):
        tbl.scan(spark, merge_key="v").collect()


def test_rename_merge_key_keeps_deletes_applying(spark, tmp_path):
    """Pre-rename eq-delete files carry the old physical column; the
    alias-aware delete reader must keep applying them after rename."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    tbl = _numeric_key_table(spark, tmp_path)
    merge_into(spark, tbl, _upd(spark, [5, 6]), key="k", strategy="mor")
    assert tbl.delete_files()

    tbl.rename_column("k", "kk")
    assert tbl.recorded_merge_key() == "kk"
    rows = {r.kk: r.v for r in tbl.scan(spark).collect()}
    assert len(rows) == 30, "no duplicates: deletes still apply after rename"
    assert rows[5] == "new-5" and rows[7] == "old-7"

    # compaction materializes those deletes under the renamed key too
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    compact(spark, tbl, target_file_size=4 * 1024 * 1024)
    assert not tbl.delete_files()
    rows2 = {r.kk: r.v for r in tbl.scan(spark).collect()}
    assert rows2 == rows


def test_bucketed_merge_falls_back_on_untagged_files(spark, tmp_path):
    """Files with bucket == -1 (written before bucket properties existed)
    must route the upsert through the generic COW path — not silently skip
    the anti-join and duplicate keys."""
    from lakehouse_benchmark_ingestion_spark.icelite import metadata as md
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    tbl = _numeric_key_table(spark, tmp_path)
    assert all(f.bucket == -1 for f in tbl.data_files())

    def add_bucket_props(meta):
        meta.properties.update({"bucket-key": "k", "bucket-n": "4"})
        return meta

    md.commit(tbl.location, add_bucket_props)
    assert tbl.bucket_spec == ("k", 4)

    merge_into(spark, tbl, _upd(spark, [2, 7]), key="k", strategy="cow")
    rows = tbl.scan(spark).groupBy("k").count().filter(F.col("count") > 1).collect()
    assert rows == [], "no duplicated keys"
    vals = {r.k: r.v for r in tbl.scan(spark).collect()}
    assert vals[2] == "new-2" and len(vals) == 30


def test_orphan_dir_sweep_age_grace(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.operators.orphan_files import (
        remove_orphan_files,
    )

    tbl = _numeric_key_table(spark, tmp_path)
    inflight = os.path.join(tbl.location, "data", "inflight-commit")
    os.makedirs(inflight)
    open(os.path.join(inflight, "_SUCCESS"), "w").close()

    now_ms = int(os.path.getmtime(inflight) * 1000)
    grace = 3600 * 1000
    remove_orphan_files(tbl, older_than_ms=grace, as_of_ms=now_ms + 10)
    assert os.path.isdir(inflight), "young sidecar-only dir must survive"

    remove_orphan_files(tbl, older_than_ms=grace, as_of_ms=now_ms + grace + 10)
    assert not os.path.exists(inflight), "aged-out empty dir is swept"


def test_lsh_bucket_cap(spark):
    from lakehouse_benchmark_ingestion_spark.operators.dedup import (
        lsh_candidate_pairs,
    )

    # four ids with IDENTICAL signatures → one bucket of size 4 per band
    sig = [16 * [7]]
    df = spark.createDataFrame(
        [(f"d{i}", sig[0]) for i in range(4)], "doc_id string, minhash array<bigint>"
    )
    capped = lsh_candidate_pairs(df, max_bucket_size=2).collect()
    assert sorted((r.a_id, r.b_id) for r in capped) == [("d0", "d1")]

    full = lsh_candidate_pairs(df, max_bucket_size=512).collect()
    assert len(full) == 6  # all C(4,2) pairs


def test_distributed_prune_path_numeric_key(spark, tmp_path, monkeypatch):
    """Force the distributed range-overlap prune (native-typed bounds, no
    driver collect) and check the merge result is still exact."""
    from importlib import import_module

    mi = import_module("lakehouse_benchmark_ingestion_spark.operators.merge_into")
    monkeypatch.setattr(mi, "DRIVER_PRUNE_THRESHOLD_ROWS", 0)
    tbl = _numeric_key_table(spark, tmp_path)
    mi.merge_into(spark, tbl, _upd(spark, [1, 28]), key="k", strategy="cow")
    vals = {r.k: r.v for r in tbl.scan(spark).collect()}
    assert vals[1] == "new-1" and vals[28] == "new-28" and len(vals) == 30
