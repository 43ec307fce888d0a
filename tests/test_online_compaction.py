"""Online compaction inside the streaming sinks — the reference's Hudi
3-stage write pipeline (bootstrap -> stream write -> inline compact,
HudiCatalogSync.java:114-118) with the num_or_time trigger (171-175)."""

from __future__ import annotations

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.plans.maintenance import CompactionPolicy
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from lakehouse_benchmark_ingestion_spark.streaming.incremental import (
    drop_parquet_batches,
    stream_ingest_files,
)
from lakehouse_benchmark_ingestion_spark.streaming.multiplex import (
    drop_envelope_batches,
    envelope,
    stream_ingest_multiplexed,
)
from tests.conftest import SF_SMOKE

# every drop file is tiny, so "small file" work always exists; the commit
# counter is the trigger under test (time trigger set far away)
POLICY = CompactionPolicy(
    min_small_files=2,
    small_file_bytes=32 * 1024 * 1024,
    max_commits=2,
    max_seconds=10_000,
)


def test_stream_online_compaction_interleaves_rewrites(spark, warehouse, tmp_path):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    drop_parquet_batches(df, str(tmp_path / "drops"), n_batches=6)
    n = stream_ingest_files(
        spark,
        tbl,
        str(tmp_path / "drops" / "drop-*"),
        str(tmp_path / "ckpt"),
        mode="append",
        online_compaction=POLICY,
    )
    assert n == 6
    ops = [s.operation for s in tbl.history()]
    # appends interleaved with replace commits: the trigger fires every 2
    # write commits (6 appends => 3 inline compactions), never at the tail
    # only — this is ONLINE, not post-hoc, maintenance
    assert ops.count("append") == 6
    assert ops.count("replace") == 3
    first_replace = ops.index("replace")
    assert "append" in ops[first_replace + 1 :], "compaction must interleave"
    # content survives the inline rewrites exactly (token-array equality)
    assert tbl.scan(spark).exceptAll(df).count() == 0
    assert df.exceptAll(tbl.scan(spark)).count() == 0
    # layout debt is paid down: far fewer live files than commits
    assert len(tbl.data_files()) < 6


def test_stream_online_compaction_no_work_no_trigger(spark, warehouse, tmp_path):
    """A policy whose work gate never opens (small_file_bytes=0 means no
    file ever counts as small) streams exactly like plain ingest."""
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    drop_parquet_batches(df, str(tmp_path / "drops"), n_batches=3)
    lazy = CompactionPolicy(
        min_small_files=1, small_file_bytes=0, max_commits=1, max_seconds=10_000
    )
    stream_ingest_files(
        spark,
        tbl,
        str(tmp_path / "drops" / "drop-*"),
        str(tmp_path / "ckpt"),
        mode="append",
        online_compaction=lazy,
    )
    assert [s.operation for s in tbl.history()] == ["append"] * 3


def test_multiplexed_online_compaction_per_table_policy(spark, tmp_path):
    """One envelope feed, two tables; only the table WITH a policy
    compacts (Arctic's per-table optimize quota shape,
    ArcticCatalogSync.java:121-128)."""
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(str(tmp_path / "wh"))
    ta = cat.create_table("ta", df.schema)
    tb = cat.create_table("tb", df.schema)
    feed = [envelope(df, "ta"), envelope(df, "tb")]
    drop_envelope_batches(feed, str(tmp_path / "feed"), n_batches=4)
    metrics = stream_ingest_multiplexed(
        spark,
        {"ta": ta, "tb": tb},
        str(tmp_path / "feed" / "drop-*"),
        str(tmp_path / "ckpt"),
        policies={"ta": POLICY},
    )
    assert metrics["batches"] == 4
    assert metrics["compactions"]["ta"] == 2
    assert metrics["compactions"]["tb"] == 0
    ops_a = [s.operation for s in ta.history()]
    assert ops_a.count("replace") == 2
    assert all(s.operation == "append" for s in tb.history())
    # both tables hold their full slice, rewrites lost nothing
    for t in (ta, tb):
        assert t.scan(spark).exceptAll(df).count() == 0
        assert df.exceptAll(t.scan(spark)).count() == 0


def test_online_compaction_trigger_state_survives_restart(spark, warehouse, tmp_path):
    """The trigger counts write commits from the SNAPSHOT LOG, not process
    state: drain 1 drop, stop, then drain a 2nd drop with a fresh call and
    checkpoint — the second run sees 1 prior commit and fires at its own
    first commit (2 total >= max_commits)."""
    import os
    import shutil

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    drops = str(tmp_path / "drops")
    paths = drop_parquet_batches(df, drops, n_batches=2)
    hold = os.path.join(drops, "hold-0001")
    shutil.move(paths[1], hold)
    ck = str(tmp_path / "ckpt")
    stream_ingest_files(
        spark, tbl, drops + "/drop-*", ck,
        mode="append", online_compaction=POLICY,
    )
    assert [s.operation for s in tbl.history()] == ["append"]
    shutil.move(hold, paths[1])
    stream_ingest_files(
        spark, tbl, drops + "/drop-*", ck,
        mode="append", online_compaction=POLICY,
    )
    ops = [s.operation for s in tbl.history()]
    assert ops[-1] == "replace", f"restart lost trigger state: {ops}"
    assert tbl.scan(spark).exceptAll(df).count() == 0


def test_stream_online_index_sync(spark, warehouse, tmp_path):
    """Streaming ingest keeps registered derived indexes fresh: with
    sync_indexes_every=2 the text index is CDC-synced during the run and
    finishes current with the table head (watermark == head snapshot)."""
    from pyspark.sql import functions as F

    from lakehouse_benchmark_ingestion_spark.operators.text_index import (
        PROP_BASE_SNAPSHOT,
        GRAM_COL,
        postings_df,
        probe_text_index,
        register_text_index,
    )

    rows = [(i, "s", f"streamdoc-{i:04d}-alpha") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    tbl = Catalog(warehouse).create_table("docs", df.schema)
    tbl.append(df.filter(F.col("doc_id") < 4))
    idx = register_text_index(spark, tbl, str(tmp_path / "tix"), n=8,
                              num_files=2, bloom=False)

    drop_parquet_batches(
        df.filter(F.col("doc_id") >= 4), str(tmp_path / "drops"), n_batches=4
    )
    n = stream_ingest_files(
        spark,
        tbl,
        str(tmp_path / "drops" / "drop-*"),
        str(tmp_path / "ckpt"),
        mode="append",
        sync_indexes_every=2,
    )
    assert n == 4
    # the final sync (batch 4) left the index at the table head
    assert int(idx.meta.properties[PROP_BASE_SNAPSHOT]) == (
        tbl.current_snapshot().snapshot_id
    )
    # and the streamed docs are findable through the index
    probes = postings_df(
        spark.createDataFrame([(11, "s", "streamdoc-0011-alpha")],
                              "doc_id long, source string, text string"), 8
    ).select(GRAM_COL).distinct()
    hits, _ = probe_text_index(spark, idx, probes)
    assert 11 in {r["doc_id"] for r in hits.collect()}
