"""Merge-on-read MERGE INTO: eq-delete + insert commits, delete-applied
scans, materialization by compaction/clustering, COW interop.

Mirrors the reference's Iceberg v2 upsert mode (`format-version=2` +
`write.upsert.enabled`, IcebergCatalogSync.java:112-115): every upsert row
is an equality delete plus an insert; readers merge at scan time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _sorted_rows(df):
    return [
        (r.doc_id, list(r.tokens), r.n_tok, r.source)
        for r in df.select("doc_id", "tokens", "n_tok", "source")
        .orderBy("doc_id")
        .collect()
    ]


def test_mor_scan_equals_cow(spark, tmp_path):
    """The same upsert applied COW and MOR must produce identical tables."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df, updates_df

    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(str(tmp_path / "wh"))
    cow = cat.create_table("cow", df.schema)
    mor = cat.create_table("mor", df.schema)
    for t in (cow, mor):
        for i in range(3):
            t.append(df.filter(df.doc_id.cast("long") % 3 == i), max_records_per_file=64)

    upd = updates_df(spark, SF_SMOKE)
    m_cow = merge_into(spark, cow, upd, strategy="cow")
    m_mor = merge_into(spark, mor, upd, strategy="mor")

    assert m_mor["files_matched"] == 0  # MOR rewrites nothing
    assert m_mor["delete_files_out"] >= 1
    assert mor.delete_files(), "eq-delete file must be committed"
    assert _sorted_rows(mor.scan(spark)) == _sorted_rows(cow.scan(spark))


def test_mor_snapshot_isolation(spark, sequences_table):
    """Readers pinned before the MOR merge see the pre-merge rows."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl = sequences_table
    before_id = tbl.current_snapshot().snapshot_id
    before = _sorted_rows(tbl.scan(spark))
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE), strategy="mor")
    assert _sorted_rows(tbl.scan(spark, snapshot_id=before_id)) == before
    assert _sorted_rows(tbl.scan(spark)) != before


def test_compaction_materializes_deletes(spark, sequences_table):
    """Compaction reads delete-applied, emits plain data files, and GCs the
    dead eq-delete files in the same commit; the scan answer is unchanged."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl = sequences_table
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE), strategy="mor")
    expected = _sorted_rows(tbl.scan(spark))
    assert tbl.delete_files()

    compact(spark, tbl, target_file_size=4 * 1024 * 1024)
    assert not tbl.delete_files(), "all inputs rewritten → deletes are dead"
    assert _sorted_rows(tbl.scan(spark)) == expected


def test_cluster_materializes_deletes(spark, sequences_table):
    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl = sequences_table
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE), strategy="mor")
    expected = _sorted_rows(tbl.scan(spark))
    cluster(spark, tbl, target_file_size=4 * 1024 * 1024)
    assert not tbl.delete_files()
    assert _sorted_rows(tbl.scan(spark)) == expected


def test_stacked_mor_merges_last_writer_wins(spark, sequences_table):
    """Two MOR merges touching the same key: the later one's row wins
    (sequence-number ordering across delete files)."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    tbl = sequences_table
    df = tokens_df(spark, SF_SMOKE)
    base = df.filter(F.col("doc_id").cast("long") < 30)
    b1 = base.withColumn("source", F.lit("gen1")).withColumn(
        "_seq", F.lit(1).cast("long")
    )
    b2 = base.withColumn("source", F.lit("gen2")).withColumn(
        "_seq", F.lit(1).cast("long")
    )
    merge_into(spark, tbl, b1, strategy="mor")
    merge_into(spark, tbl, b2, strategy="mor")
    got = {
        r.doc_id: r.source
        for r in tbl.scan(spark)
        .filter(F.col("doc_id").cast("long") < 30)
        .select("doc_id", "source")
        .collect()
    }
    assert got and all(s == "gen2" for s in got.values())
    # no duplicate keys survive
    n = tbl.scan(spark).groupBy("doc_id").count().filter("count > 1").count()
    assert n == 0


def test_cow_after_mor_no_resurrection(spark, sequences_table):
    """A COW merge on a table carrying eq-deletes must apply them while
    rewriting (rows deleted by MOR must not come back)."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df, updates_df

    tbl = sequences_table
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE), strategy="mor")
    expected_sources = {
        r.doc_id: r.source for r in tbl.scan(spark).select("doc_id", "source").collect()
    }

    df = tokens_df(spark, SF_SMOKE)
    batch2 = (
        df.filter(F.col("doc_id").cast("long") % 11 == 0)
        .withColumn("source", F.lit("cow2"))
        .withColumn("_seq", F.lit(1).cast("long"))
    )
    touched = {r.doc_id for r in batch2.select("doc_id").collect()}
    merge_into(spark, tbl, batch2, strategy="cow")
    got = {
        r.doc_id: r.source for r in tbl.scan(spark).select("doc_id", "source").collect()
    }
    for k, v in got.items():
        if k in touched:
            assert v == "cow2"
        else:
            assert v == expected_sources[k], f"row {k} resurrected/changed"
    assert set(got) == set(expected_sources) | touched


def test_changes_across_mor_merge(spark, sequences_table):
    """snapshot_changes falls back to delete-applied scans for MOR commits."""
    from lakehouse_benchmark_ingestion_spark.operators.changes import snapshot_changes
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl = sequences_table
    before_id = tbl.current_snapshot().snapshot_id
    before = tbl.scan(spark).select("doc_id", "tokens", "n_tok", "source")
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE), strategy="mor")
    after_id = tbl.current_snapshot().snapshot_id
    after = tbl.scan(spark).select("doc_id", "tokens", "n_tok", "source")

    ch = snapshot_changes(spark, tbl, before_id, after_id)
    ins = ch.filter("change_type = 'insert'").drop("change_type")
    dele = ch.filter("change_type = 'delete'").drop("change_type")
    assert ins.exceptAll(after.exceptAll(before)).count() == 0
    assert after.exceptAll(before).exceptAll(ins).count() == 0
    assert dele.exceptAll(before.exceptAll(after)).count() == 0
    assert before.exceptAll(after).exceptAll(dele).count() == 0
