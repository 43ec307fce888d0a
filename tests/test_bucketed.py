"""Hash-bucketed tables (Hudi bucket-index analogue, HudiCatalogSync.java:
151-159): bucketed writes, bucket-pruned co-located MERGE, bucket-preserving
compaction, bucket-pruned point scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE

N_BUCKETS = 8  # the reference's default (params/table/HudiParameters.java:32)


def _bucketed_table(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table(
        "sequences",
        df.schema,
        properties={"bucket-key": "doc_id", "bucket-n": str(N_BUCKETS)},
    )
    for i in range(3):
        tbl.append(df.filter(df.doc_id.cast("long") % 3 == i), max_records_per_file=64)
    return tbl, df


def test_bucketed_append_routes_rows(spark, warehouse):
    """Every file carries its bucket id; rows land in pmod(xxhash64(key), n)."""
    tbl, df = _bucketed_table(spark, warehouse)
    files = tbl.data_files()
    assert files and all(0 <= f.bucket < N_BUCKETS for f in files)
    assert len({f.bucket for f in files}) > 1  # keys actually spread

    # scan answers identically to the unbucketed synthesis
    got = tbl.scan(spark).orderBy("doc_id").collect()
    exp = df.orderBy("doc_id").collect()
    assert [r.doc_id for r in got] == [r.doc_id for r in exp]
    assert [r.tokens for r in got] == [r.tokens for r in exp]

    # per-file row membership matches the bucket function
    from lakehouse_benchmark_ingestion_spark.functions.hashing import bucket_expr

    some = [f for f in files if f.record_count > 0][:3]
    for f in some:
        rows = spark.read.schema(tbl.schema).parquet(f.path).select(
            bucket_expr("doc_id", N_BUCKETS).alias("b")
        )
        assert rows.filter(F.col("b") != f.bucket).count() == 0


def test_bucketed_merge_touches_only_hashed_buckets(spark, warehouse):
    """MERGE rewrites only buckets its keys hash into; result equals the
    plain COW merge on an unbucketed copy."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df, updates_df

    tbl, df = _bucketed_table(spark, warehouse)
    # narrow batch: 5 keys → at most 5 buckets
    upd = updates_df(spark, SF_SMOKE).filter(
        F.col("doc_id").isin([str(k) for k in (0, 3, 6, 9, 12)])
    )
    before_untouched = {
        f.path for f in tbl.data_files() if f.bucket not in range(N_BUCKETS)
    }
    m = merge_into(spark, tbl, upd)
    assert 1 <= m["buckets_touched"] <= 5
    assert m["buckets_total"] == N_BUCKETS
    # untouched buckets' files survived verbatim
    after = {f.bucket for f in tbl.data_files()}
    assert after  # non-empty
    assert all(f.bucket >= 0 for f in tbl.data_files())

    # content equality vs plain COW merge
    plain = Catalog(warehouse).create_table("plain", df.schema)
    plain.append(df)
    merge_into(spark, plain, upd)
    a = tbl.scan(spark).select("doc_id", "tokens", "n_tok", "source")
    b = plain.scan(spark).select("doc_id", "tokens", "n_tok", "source")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert len(before_untouched) == 0  # sanity of the fixture expression


def test_bucketed_merge_resume(spark, warehouse):
    """Re-running a bucketed merge with the same run_id reuses finished
    buckets' lineage outputs."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl, _ = _bucketed_table(spark, warehouse)
    upd = updates_df(spark, SF_SMOKE)
    m1 = merge_into(spark, tbl, upd, run_id="rbm1")
    assert m1["buckets_resumed"] == 0
    # same run_id again: all buckets resume from lineage (idempotent replay)
    m2 = merge_into(spark, tbl, upd, run_id="rbm1")
    assert m2["buckets_resumed"] == m1["buckets_touched"]


def test_bucketed_compaction_preserves_buckets(spark, warehouse):
    """Compaction groups never mix buckets; outputs inherit the bucket id;
    content survives; global cluster() refuses to run."""
    import pytest

    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
        plan_compaction,
    )

    tbl, df = _bucketed_table(spark, warehouse)
    before = {r.doc_id: r.tokens for r in tbl.scan(spark).collect()}

    plan = plan_compaction(tbl, target_file_size=1024 * 1024)
    for g in plan.groups:
        assert len({f.bucket for f in g.files}) == 1
        assert g.bucket == g.files[0].bucket

    compact(spark, tbl, target_file_size=1024 * 1024)
    files = tbl.data_files()
    assert all(0 <= f.bucket < N_BUCKETS for f in files)
    after = {r.doc_id: r.tokens for r in tbl.scan(spark).collect()}
    assert after == before

    with pytest.raises(ValueError, match="bucket"):
        cluster(spark, tbl)


def test_bucket_pruned_point_scan(spark, warehouse):
    """A key lookup reads only its bucket's files (1/n of the table)."""
    from lakehouse_benchmark_ingestion_spark.functions.hashing import bucket_expr

    tbl, _ = _bucketed_table(spark, warehouse)
    probe = "42"
    b = spark.range(1).select(
        bucket_expr(F.lit(probe), N_BUCKETS).alias("b")
    ).collect()[0]["b"]

    files_total = len(tbl.data_files())
    bucket_files = [f for f in tbl.data_files() if f.bucket == b]
    assert 0 < len(bucket_files) < files_total

    hit = (
        tbl.scan(spark, file_filter=lambda f: f.bucket == b)
        .filter(F.col("doc_id") == probe)
        .count()
    )
    assert hit == 1
