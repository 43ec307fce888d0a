"""Deterministic tokens-table generator invariants (FIXTURES.md §1-2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.sources.tokens import (
    GEN_A,
    GEN_B,
    GEN_C,
    VOCAB,
    tokens_df,
    updates_df,
)
from tests.conftest import SF_SMOKE


def test_schema_and_invariants(spark):
    df = tokens_df(spark, SF_SMOKE)
    assert [f.name for f in df.schema.fields] == ["doc_id", "tokens", "n_tok", "source"]
    assert df.filter(F.size("tokens") != F.col("n_tok")).count() == 0
    assert df.filter(F.col("doc_id").isNull()).count() == 0
    # PK uniqueness (MysqlCDCCatalog.java:212-216 analogue)
    assert df.select("doc_id").distinct().count() == df.count()
    # vocab range
    mx = df.select(F.max(F.array_max("tokens")).alias("m")).collect()[0].m
    mn = df.select(F.min(F.array_min("tokens")).alias("m")).collect()[0].m
    assert 0 <= mn and mx < VOCAB


def test_generator_formula_golden(spark):
    row = tokens_df(spark, SF_SMOKE).filter(F.col("doc_id") == "7").collect()[0]
    expect = [(7 * GEN_A + i * GEN_B + GEN_C) % VOCAB for i in range(row.n_tok)]
    assert list(row.tokens) == expect


def test_replicate_scales_and_stays_unique(spark):
    df = tokens_df(spark, SF_SMOKE, replicate=3)
    assert df.count() == 1500
    assert df.select("doc_id").distinct().count() == 1500
    # replicas have distinct token streams
    rows = df.filter(F.col("doc_id").isin("7-0", "7-1")).collect()
    t = {r.doc_id: list(r.tokens) for r in rows}
    assert t["7-0"] != t["7-1"]


def test_updates_batch_shape(spark):
    upd = updates_df(spark, SF_SMOKE)
    assert "_seq" in upd.columns
    # intra-batch duplicates exist (doc_id % 9 == 0 keys appear twice)
    dups = upd.groupBy("doc_id").count().filter("count > 1")
    assert dups.count() > 0
    # inserts have brand-new keys
    assert upd.filter(F.col("doc_id") >= "1000000").count() > 0
    assert upd.filter(F.size("tokens") != F.col("n_tok")).count() == 0
