"""The ``icelite`` Spark Python DataSource (sources/icelite_source.py):
plain-Spark users read, tail, and write icelite tables through the standard
``spark.read.format("icelite")`` / ``readStream`` / ``df.write`` API — the
Spark-native analogue of the reference wiring its lakehouse sinks behind
the engine's standard Source/Sink interfaces (BaseCatalogSync.java:63-101).

Every read path is asserted IDENTICAL to the native ``scan()`` (the
oracle-certified reader), including merge-on-read eq-deletes, position
deletes, column renames, snapshot pinning, and plan-time file pruning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.sources.icelite_source import (
    IceliteDataSource,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(IceliteDataSource)


def _dsv2(spark, warehouse, table="seq", **opts):
    r = (
        spark.read.format("icelite")
        .option("warehouse", warehouse)
        .option("table", table)
    )
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def _same(a, b) -> None:
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


@pytest.fixture()
def seq_table(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("seq", df.schema)
    # 4 appends with DISJOINT doc_id ranges -> min/max stats can prune
    for i in range(4):
        tbl.append(df.filter(df.doc_id.cast("long") % 4 == i), num_files=1)
    return tbl


def test_batch_read_equals_native_scan(spark, warehouse, seq_table):
    _same(_dsv2(spark, warehouse), seq_table.scan(spark))


def test_batch_read_schema_matches(spark, warehouse, seq_table):
    assert _dsv2(spark, warehouse).schema == seq_table.scan(spark).schema


def test_snapshot_pinned_read(spark, warehouse, seq_table):
    first = seq_table.history()[0].snapshot_id
    pinned = _dsv2(spark, warehouse, snapshot_id=first)
    _same(pinned, seq_table.scan(spark, snapshot_id=first))
    assert pinned.count() < _dsv2(spark, warehouse).count()


def test_filter_pushdown_prunes_partitions(spark, warehouse, seq_table):
    """Equality predicate -> stats pruning at plan time: the DataSource
    plans one partition per SURVIVING file, so the pruned read's task
    count drops with the file count (4 disjoint-range files -> 1)."""
    some_id = seq_table.scan(spark).select("doc_id").first()[0]
    full = _dsv2(spark, warehouse)
    pruned = full.filter(F.col("doc_id") == some_id)
    assert pruned.count() == 1
    # prove the plan-time skip itself via the shared planner
    kept = seq_table.select_data_files(where={"doc_id": some_id})
    assert len(kept) < len(seq_table.data_files())
    # and that row-level semantics stayed with Spark (range predicate)
    lo = seq_table.scan(spark).agg(F.max("n_tok")).first()[0]
    assert (
        full.filter(F.col("n_tok") >= lo).count()
        == seq_table.scan(spark).filter(F.col("n_tok") >= lo).count()
    )


def test_mor_eq_deletes_applied(spark, warehouse, seq_table):
    """A merge-on-read MERGE leaves eq-delete sidecars; the DataSource read
    must apply them (v2 sequence rule) or deleted rows resurrect."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    upd = (
        seq_table.scan(spark)
        .limit(17)
        .withColumn("source", F.lit("updated-src"))
        .withColumn("_seq", F.lit(1).cast("long"))
    )
    merge_into(spark, seq_table, upd, strategy="mor")
    assert seq_table.delete_files(), "merge-on-read must write eq-deletes"
    _same(_dsv2(spark, warehouse), seq_table.scan(spark))
    assert (
        _dsv2(spark, warehouse).filter(F.col("source") == "updated-src").count()
        == 17
    )


def test_pos_deletes_applied(spark, warehouse, seq_table):
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    n_before = seq_table.scan(spark).count()
    res = delete_where(spark, seq_table, {"n_tok": (40, None)}, strategy="mor-pos")
    assert res["deleted_positions"] > 0
    got = _dsv2(spark, warehouse)
    assert got.count() == n_before - res["deleted_positions"]
    _same(got, seq_table.scan(spark))


def test_renamed_column_alias_read(spark, warehouse, seq_table):
    """Files written before a rename carry the old physical name; the
    DataSource resolves the lineage like read_files (coalesce)."""
    seq_table.rename_column("source", "origin")
    got = _dsv2(spark, warehouse)
    assert "origin" in got.columns and "source" not in got.columns
    _same(got, seq_table.scan(spark))
    assert got.filter(F.col("origin").isNull()).count() == 0


def test_stream_tail_bootstrap_then_increments(spark, warehouse, seq_table, tmp_path):
    """readStream: first batch bootstraps the current table, later batches
    carry exactly the appended files (offsets are snapshot ids)."""
    df = tokens_df(spark, SF_SMOKE)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            spark.readStream.format("icelite")
            .option("warehouse", warehouse)
            .option("table", "seq")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    first = spark.read.parquet(out)
    assert first.count() == seq_table.scan(spark).count()

    extra = df.limit(23).withColumn("source", F.lit("tail-batch"))
    seq_table.append(extra)
    drain()
    second = spark.read.parquet(out)
    assert second.count() == first.count() + 23
    assert second.filter(F.col("source") == "tail-batch").count() == 23


def test_stream_starting_snapshot_current_is_tail_only(
    spark, warehouse, seq_table, tmp_path
):
    df = tokens_df(spark, SF_SMOKE)
    out, ckpt = str(tmp_path / "o2"), str(tmp_path / "c2")
    q = (
        spark.readStream.format("icelite")
        .option("warehouse", warehouse)
        .option("table", "seq")
        .option("starting_snapshot_id", "current")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    seq_table.append(df.limit(5).withColumn("source", F.lit("after-start")))
    q = (
        spark.readStream.format("icelite")
        .option("warehouse", warehouse)
        .option("table", "seq")
        .option("starting_snapshot_id", "current")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 5  # bootstrap skipped, only the tail arrived
    assert got.filter(F.col("source") == "after-start").count() == 5


def test_stream_skips_maintenance_rewrites(spark, warehouse, seq_table, tmp_path):
    """Iceberg incremental-append-scan semantics: a compaction (or merge)
    between offsets emits NOTHING — a naive file diff would re-emit the
    whole table as fresh rows after every maintenance pass."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    df = tokens_df(spark, SF_SMOKE)
    out, ckpt = str(tmp_path / "o3"), str(tmp_path / "c3")

    def drain():
        q = (
            spark.readStream.format("icelite")
            .option("warehouse", warehouse)
            .option("table", "seq")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n0 = spark.read.parquet(out).count()
    assert n0 == seq_table.scan(spark).count()

    # maintenance + a row-rewriting merge: the tail must emit NOTHING
    compact(spark, seq_table, target_file_size=1024 * 1024)
    upd = (
        seq_table.scan(spark)
        .limit(9)
        .withColumn("source", F.lit("rewritten"))
        .withColumn("_seq", F.lit(1).cast("long"))
    )
    merge_into(spark, seq_table, upd)
    drain()
    assert spark.read.parquet(out).count() == n0

    # a real append afterwards emits exactly its rows
    seq_table.append(df.limit(11).withColumn("source", F.lit("post-maint")))
    drain()
    got = spark.read.parquet(out)
    assert got.count() == n0 + 11
    assert got.filter(F.col("source") == "post-maint").count() == 11


def test_stream_bootstrap_applies_deletes(spark, warehouse, seq_table, tmp_path):
    """The bootstrap batch reads through the full delete-aware planner: a
    MOR table's eq-deletes must not resurrect in the stream's first batch."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    upd = (
        seq_table.scan(spark)
        .limit(13)
        .withColumn("source", F.lit("mor-upd"))
        .withColumn("_seq", F.lit(1).cast("long"))
    )
    merge_into(spark, seq_table, upd, strategy="mor")
    out, ckpt = str(tmp_path / "o4"), str(tmp_path / "c4")
    q = (
        spark.readStream.format("icelite")
        .option("warehouse", warehouse)
        .option("table", "seq")
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == seq_table.scan(spark).count()
    assert got.filter(F.col("source") == "mor-upd").count() == 13


def test_writer_append_commits_snapshot(spark, warehouse, seq_table):
    df = tokens_df(spark, SF_SMOKE).limit(31).withColumn(
        "source", F.lit("dsv2-write")
    )
    n_snaps = len(seq_table.history())
    n_before = seq_table.scan(spark).count()
    (
        df.write.format("icelite")
        .option("warehouse", warehouse)
        .option("table", "seq")
        .mode("append")
        .save()
    )
    tbl = Catalog(warehouse).load_table("seq")
    assert len(tbl.history()) == n_snaps + 1
    assert tbl.history()[-1].operation == "append"
    assert tbl.scan(spark).count() == n_before + 31
    # stats harvested: the new files carry bounds the planner can prune on
    new_files = [f for f in tbl.data_files() if "dsv2-" in f.path]
    assert new_files and all("doc_id" in f.lower_bounds for f in new_files)
    _same(tbl.scan(spark), _dsv2(spark, warehouse))


def test_writer_overwrite_replaces_table(spark, warehouse, seq_table):
    df = tokens_df(spark, SF_SMOKE).limit(7)
    (
        df.write.format("icelite")
        .option("warehouse", warehouse)
        .option("table", "seq")
        .mode("overwrite")
        .save()
    )
    tbl = Catalog(warehouse).load_table("seq")
    assert tbl.scan(spark).count() == 7
    assert tbl.history()[-1].operation == "overwrite"
    # old snapshot still time-travels to the pre-overwrite rows
    prev = tbl.history()[-2].snapshot_id
    assert tbl.scan(spark, snapshot_id=prev).count() > 7


def test_writer_overwrite_drops_stale_eq_deletes(spark, warehouse, seq_table):
    """Overwrite must commit inside the optimistic loop AND drop delete
    manifests: a pre-overwrite MOR merge's eq-delete files would otherwise
    apply to the fresh rows (new files restart at sequence 0 < delete seq)
    and silently erase any overwritten row whose key was once updated."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    upd = (
        seq_table.scan(spark)
        .limit(19)
        .withColumn("source", F.lit("pre-ow-upd"))
        .withColumn("_seq", F.lit(1).cast("long"))
    )
    merge_into(spark, seq_table, upd, strategy="mor")
    assert seq_table.delete_files(), "precondition: live eq-deletes"
    df = tokens_df(spark, SF_SMOKE).limit(50)  # keys overlap the deleted set
    (
        df.write.format("icelite")
        .option("warehouse", warehouse)
        .option("table", "seq")
        .mode("overwrite")
        .save()
    )
    tbl = Catalog(warehouse).load_table("seq")
    assert not tbl.delete_files(), "overwrite must drop delete manifests"
    assert tbl.scan(spark).count() == 50  # nothing silently vanished
    _same(tbl.scan(spark), _dsv2(spark, warehouse))


def test_writer_rejects_type_mismatch(spark, warehouse, seq_table):
    df = tokens_df(spark, SF_SMOKE).limit(3).withColumn(
        "n_tok", F.col("n_tok").cast("string")  # right name, wrong type
    )
    with pytest.raises(Exception, match="does not match the table schema|does not match table schema"):
        (
            df.write.format("icelite")
            .option("warehouse", warehouse)
            .option("table", "seq")
            .mode("append")
            .save()
        )


def test_stream_survives_midstream_rename(spark, warehouse, seq_table, tmp_path):
    """Partitions carry plan-time column lineage: files appended AFTER a
    mid-stream rename carry the new physical name and must still stream
    (under the stream's fixed start-time column names), not as NULLs."""
    df = tokens_df(spark, SF_SMOKE)
    out, ckpt = str(tmp_path / "o5"), str(tmp_path / "c5")

    def drain():
        q = (
            spark.readStream.format("icelite")
            .option("warehouse", warehouse)
            .option("table", "seq")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n0 = spark.read.parquet(out).count()
    seq_table.rename_column("source", "origin")
    seq_table.append(
        df.limit(7)
        .withColumnRenamed("source", "origin")
        .withColumn("origin", F.lit("post-rename"))
    )
    drain()
    # each availableNow start() re-plans the schema, so the post-rename
    # batch lands under the NEW name (mixed-schema sink dir -> mergeSchema);
    # its values must be real data, not the NULLs a stale alias lineage
    # would produce
    got = spark.read.option("mergeSchema", "true").parquet(out)
    assert got.count() == n0 + 7
    assert got.filter(F.col("origin") == "post-rename").count() == 7
    assert got.filter(F.col("origin").isNull()).count() == n0  # pre-rename files


def test_writer_refuses_partitioned_tables(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("parted", df.schema)
    tbl.set_partition_spec([{"col": "source", "transform": "identity"}])
    with pytest.raises(Exception, match="bucketed/partitioned"):
        (
            df.limit(3)
            .write.format("icelite")
            .option("warehouse", warehouse)
            .option("table", "parted")
            .mode("append")
            .save()
        )


def test_stream_reader_rate_limited_tail(spark, warehouse):
    """max_snapshots_per_batch bounds how many commits one micro-batch
    admits: a consumer 4 appends behind catches up in ceil(4/2)=2 batches,
    and the union of the batches equals the full tail (no file lost or
    repeated at the admission boundary)."""
    from lakehouse_benchmark_ingestion_spark.sources.icelite_source import (
        IceliteStreamReader,
    )
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("rated", df.schema)
    tbl.append(df.limit(10))  # snapshot 1 — the consumer's start point
    start = tbl.current_snapshot().snapshot_id
    for i in range(4):  # snapshots 2..5
        tbl.append(df.filter(F.col("doc_id").cast("long") % 4 == i).limit(5))

    opts = {
        "warehouse": warehouse,
        "table": "rated",
        "starting_snapshot_id": str(start),
        "max_snapshots_per_batch": "2",
    }
    r = IceliteStreamReader(tbl.schema, opts)
    offs = [r.initialOffset()]
    batch_files: list[set[str]] = []
    for _ in range(4):
        end = r.latestOffset()
        if end == offs[-1]:
            break
        parts = r.partitions(offs[-1], end)
        batch_files.append({p.path for p in parts if p.path})
        offs.append(end)
    # 4 commits / cap 2 = exactly 2 non-empty admission rounds
    assert len([b for b in batch_files if b]) == 2, offs
    # union equals the uncapped tail, disjoint across batches
    uncapped = IceliteStreamReader(
        tbl.schema, {k: v for k, v in opts.items() if k != "max_snapshots_per_batch"}
    )
    full = {
        p.path
        for p in uncapped.partitions(
            {"snapshot_id": start},
            {"snapshot_id": tbl.current_snapshot().snapshot_id},
        )
        if p.path
    }
    got = set().union(*batch_files)
    assert got == full
    assert sum(len(b) for b in batch_files) == len(got), "no file repeated"


def test_stream_reader_rate_limit_restart_safety(spark, warehouse):
    """A restarted reader whose capped latestOffset lands behind the
    checkpointed start must plan an empty batch and fast-forward, never a
    backwards range."""
    from lakehouse_benchmark_ingestion_spark.sources.icelite_source import (
        IceliteStreamReader,
    )
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("rated_rs", df.schema)
    for i in range(4):
        tbl.append(df.filter(F.col("doc_id").cast("long") % 4 == i).limit(5))
    head = tbl.current_snapshot().snapshot_id

    # fresh reader (post-restart state), checkpoint already at head-1
    r = IceliteStreamReader(
        tbl.schema,
        {
            "warehouse": warehouse,
            "table": "rated_rs",
            "starting_snapshot_id": "1",
            "max_snapshots_per_batch": "1",
        },
    )
    end = r.latestOffset()  # capped near the start, behind the checkpoint
    ck_start = {"snapshot_id": head - 1}
    parts = r.partitions(ck_start, end)
    assert [p.path for p in parts] == [""], "backwards range must be empty"
    # next trigger resumes from the fast-forwarded tracker
    end2 = r.latestOffset()
    assert int(end2["snapshot_id"]) == head
    parts2 = r.partitions(ck_start, end2)
    assert {p.path for p in parts2 if p.path}, "catch-up batch plans the tail"
