"""Structured-Streaming ingest into icelite (CDC-tail analogue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df, updates_df
from lakehouse_benchmark_ingestion_spark.streaming.incremental import (
    drop_parquet_batches,
    stream_ingest_files,
)
from tests.conftest import SF_SMOKE


def test_stream_append_one_snapshot_per_batch(spark, warehouse, tmp_path):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    drop_parquet_batches(df, str(tmp_path / "drops"), n_batches=3)
    n = stream_ingest_files(
        spark,
        tbl,
        str(tmp_path / "drops" / "drop-*"),
        str(tmp_path / "ckpt"),
        mode="append",
    )
    assert n == 3
    # one snapshot per micro-batch (the reference's checkpoint==commit cadence)
    assert len(tbl.history()) == 3
    assert tbl.scan(spark).count() == 500
    # content equals the batch source exactly
    assert tbl.scan(spark).exceptAll(df).count() == 0


def test_stream_merge_mode_applies_upserts(spark, warehouse, tmp_path):
    base = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", base.schema)
    tbl.append(base)
    upd = updates_df(spark, SF_SMOKE)
    drop_parquet_batches(upd, str(tmp_path / "drops"), n_batches=2)
    n = stream_ingest_files(
        spark,
        tbl,
        str(tmp_path / "drops" / "drop-*"),
        str(tmp_path / "ckpt"),
        mode="merge",
    )
    assert n == 2
    # final state equals a single batch MERGE of the full update set
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    wh2 = str(tmp_path / "wh2")
    tbl2 = Catalog(wh2).create_table("sequences", base.schema)
    tbl2.append(base)
    merge_into(spark, tbl2, upd)
    a = tbl.scan(spark).orderBy("doc_id").collect()
    b = tbl2.scan(spark).orderBy("doc_id").collect()
    assert a == b


def test_stream_resume_from_checkpoint(spark, warehouse, tmp_path):
    """Drain 2 drops, then add 2 more and re-run with the SAME checkpoint:
    only the new files are ingested (no duplicates)."""
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    drops = str(tmp_path / "drops")
    paths = drop_parquet_batches(df, drops, n_batches=4)
    import os
    import shutil

    # renamed dirs must NOT match the drop-* glob while held back
    held_back = [
        os.path.join(os.path.dirname(p), "hold-" + os.path.basename(p)) for p in paths[2:]
    ]
    for src, dst in zip(paths[2:], held_back):
        shutil.move(src, dst)
    ck = str(tmp_path / "ckpt")
    n1 = stream_ingest_files(spark, tbl, drops + "/drop-*", ck, mode="append")
    assert n1 == 2
    for src, dst in zip(held_back, paths[2:]):
        shutil.move(src, dst)
    n2 = stream_ingest_files(spark, tbl, drops + "/drop-*", ck, mode="append")
    assert n2 == 2
    assert tbl.scan(spark).count() == 500
    assert tbl.scan(spark).exceptAll(df).count() == 0


def test_stream_append_dedup_drops_known_digests(spark, warehouse, tmp_path):
    # feed: 3 ordered batches where batch 2 and 3 replay earlier rows under
    # new doc_ids; the table must end with one row per digest (min doc_id)
    rows = [(i, f"content-{i % 4}", "s") for i in range(12)]
    df = spark.createDataFrame(rows, ["doc_id", "h", "source"])
    for k in range(3):
        df.filter((F.col("doc_id") >= k * 4) & (F.col("doc_id") < (k + 1) * 4)).coalesce(
            1
        ).write.parquet(str(tmp_path / f"drops/drop-{k:04d}"))
    tbl = Catalog(warehouse).create_table("dedup_feed", df.schema)
    n = stream_ingest_files(
        spark, tbl, str(tmp_path / "drops/drop-*"), str(tmp_path / "ckpt"),
        mode="append_dedup", key="doc_id", dedup_col="h",
    )
    assert n >= 1  # later batches are entirely duplicates -> empty appends skipped
    got = sorted((r.doc_id, r.h) for r in tbl.scan(spark).collect())
    assert got == [(0, "content-0"), (1, "content-1"), (2, "content-2"), (3, "content-3")]


def test_stream_append_dedup_uses_bloom_sidecar(spark, warehouse, tmp_path, monkeypatch):
    """With a digest bloom sidecar built, the cross-batch dedup probes the
    per-file bitmaps and anti-joins only against colliding files; results
    must be identical to the full-scan path, and the probe must engage."""
    from lakehouse_benchmark_ingestion_spark.operators import bloom_index
    from lakehouse_benchmark_ingestion_spark.operators.bloom_index import (
        build_bloom_index,
    )

    rows = [(i, f"content-{i % 4}", "s") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "h", "source"])
    # seed the table with batch 0 and build the bloom on the digest column
    tbl = Catalog(warehouse).create_table("dedup_bloom", df.schema)
    tbl.append(df.filter(F.col("doc_id") < 4))
    build_bloom_index(spark, tbl, "h")

    engaged = {"n": 0}
    orig = bloom_index.bloom_multi_probe_filter

    def spy(*a, **kw):
        engaged["n"] += 1
        return orig(*a, **kw)

    monkeypatch.setattr(
        "lakehouse_benchmark_ingestion_spark.operators.bloom_index"
        ".bloom_multi_probe_filter",
        spy,
    )

    df.filter(F.col("doc_id") >= 4).coalesce(1).write.parquet(
        str(tmp_path / "drops/drop-0000")
    )
    stream_ingest_files(
        spark, tbl, str(tmp_path / "drops/drop-*"), str(tmp_path / "ckpt"),
        mode="append_dedup", key="doc_id", dedup_col="h",
    )
    assert engaged["n"] >= 1, "bloom probe must engage when a sidecar exists"
    got = sorted((r.doc_id, r.h) for r in tbl.scan(spark).collect())
    assert got == [(0, "content-0"), (1, "content-1"), (2, "content-2"), (3, "content-3")]


def _rollback_last_stream_commit(ck: str) -> None:
    """Delete the newest streaming-checkpoint commit marker (and its CRC
    sidecar) so a restart redelivers the final micro-batch — the exact
    window a crash between table commit and checkpoint commit leaves."""
    import glob
    import os

    commits = sorted(
        p
        for p in glob.glob(os.path.join(ck, "commits", "*"))
        if "." not in os.path.basename(p)
    )
    last = commits[-1]
    os.remove(last)
    crc = os.path.join(os.path.dirname(last), f".{os.path.basename(last)}.crc")
    if os.path.exists(crc):
        os.remove(crc)


def test_stream_append_exactly_once_under_replay(spark, warehouse, tmp_path):
    """foreachBatch redelivers the last micro-batch if the process dies
    between the table commit and the streaming checkpoint. Simulate exactly
    that: run the stream, delete the checkpoint's newest commit marker (so
    Spark believes the final batch never finished), re-run — the batch
    watermark recorded atomically with each append must skip the replayed
    batch instead of double-appending it."""
    import glob
    import os

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    drops, ck = str(tmp_path / "drops"), str(tmp_path / "ckpt")
    drop_parquet_batches(df, drops, n_batches=3)
    n = stream_ingest_files(spark, tbl, drops + "/drop-*", ck, mode="append")
    assert n == 3
    expected = tbl.scan(spark).count()
    snaps = len(tbl.history())

    # roll the streaming checkpoint back one batch: Spark will replay it
    _rollback_last_stream_commit(ck)
    stream_ingest_files(spark, tbl, drops + "/drop-*", ck, mode="append")

    assert tbl.scan(spark).count() == expected, "replayed batch must not double-append"
    assert len(tbl.history()) == snaps, "no new snapshot for a replayed batch"
    assert tbl.scan(spark).exceptAll(df).count() == 0


def test_stream_dedup_exactly_once_under_replay(spark, warehouse, tmp_path):
    import glob
    import os

    rows = [(i, f"content-{i}", "s") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "h", "source"])
    tbl = Catalog(warehouse).create_table("dedup_replay", df.schema)
    drops, ck = str(tmp_path / "drops"), str(tmp_path / "ckpt")
    for k in range(2):
        df.filter(
            (F.col("doc_id") >= k * 4) & (F.col("doc_id") < (k + 1) * 4)
        ).coalesce(1).write.parquet(f"{drops}/drop-{k:04d}")
    stream_ingest_files(
        spark, tbl, drops + "/drop-*", ck,
        mode="append_dedup", key="doc_id", dedup_col="h",
    )
    expected = tbl.scan(spark).count()
    assert expected == 8  # all digests distinct -> everything ingested

    _rollback_last_stream_commit(ck)
    stream_ingest_files(
        spark, tbl, drops + "/drop-*", ck,
        mode="append_dedup", key="doc_id", dedup_col="h",
    )
    assert tbl.scan(spark).count() == expected
