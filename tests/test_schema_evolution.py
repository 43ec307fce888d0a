"""Schema evolution: add / drop / rename column; alias-aware reads keep
pre-evolution files answering through scans AND maintenance rewrites."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_add_column(spark, sequences_table):
    tbl = sequences_table
    n_before = tbl.scan(spark).count()
    tbl.add_column("quality", "double")
    assert "quality" in tbl.schema.fieldNames()

    # old files read as null in the new column
    df = tbl.scan(spark)
    assert df.filter(F.col("quality").isNull()).count() == n_before

    # new appends carry values; mixed-era scan works
    add = df.limit(0)  # empty with new schema
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    newrows = (
        tokens_df(spark, SF_SMOKE)
        .limit(10)
        .withColumn("doc_id", F.concat(F.lit("new-"), F.col("doc_id")))
        .withColumn("quality", F.lit(0.5))
    )
    tbl.append(newrows)
    out = tbl.scan(spark)
    assert out.count() == n_before + 10
    assert out.filter(F.col("quality") == 0.5).count() == 10
    assert len(add.columns) == 5


def test_drop_column(spark, sequences_table):
    tbl = sequences_table
    tbl.drop_column("source")
    assert "source" not in tbl.schema.fieldNames()
    df = tbl.scan(spark)
    assert df.columns == ["doc_id", "tokens", "n_tok"]
    assert df.count() > 0


def test_rename_column_mixed_eras(spark, sequences_table):
    """Files written before the rename answer through the alias coalesce;
    files written after carry the new physical name; both eras agree."""
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    tbl = sequences_table
    before = {r.doc_id: r.source for r in tbl.scan(spark).select("doc_id", "source").collect()}

    tbl.rename_column("source", "origin")
    assert tbl.schema.fieldNames() == ["doc_id", "tokens", "n_tok", "origin"]

    # pre-rename files answer under the new name
    got = {r.doc_id: r.origin for r in tbl.scan(spark).select("doc_id", "origin").collect()}
    assert got == before

    # post-rename append (new physical name)
    newrows = (
        tokens_df(spark, SF_SMOKE)
        .limit(5)
        .withColumn("doc_id", F.concat(F.lit("post-"), F.col("doc_id")))
        .withColumnRenamed("source", "origin")
    )
    tbl.append(newrows)
    assert tbl.scan(spark).filter(F.col("origin").isNull()).count() == 0


def test_rename_survives_compaction_and_merge(spark, sequences_table):
    """Maintenance rewrites read alias-aware — a compaction after a rename
    must not null out the renamed column, and MERGE keeps working."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl = sequences_table
    before = {r.doc_id: r.source for r in tbl.scan(spark).select("doc_id", "source").collect()}
    tbl.rename_column("source", "origin")

    compact(spark, tbl, target_file_size=4 * 1024 * 1024)
    got = {r.doc_id: r.origin for r in tbl.scan(spark).select("doc_id", "origin").collect()}
    assert got == before  # nothing nulled by the rewrite

    upd = updates_df(spark, SF_SMOKE).withColumnRenamed("source", "origin")
    merge_into(spark, tbl, upd)
    out = tbl.scan(spark)
    assert out.filter(F.col("origin").isNull()).count() == 0
    assert out.filter(F.col("origin").endswith("_m")).count() > 0
