"""Structured-Streaming ingest into icelite — the CDC-tail analogue.

The reference tails a MySQL binlog with Flink-CDC and commits one Iceberg
snapshot per 60 s checkpoint (SyncDbFunction.java:77-86, MainRunner.java:86).
Our engine's equivalent: a Structured Streaming source (file stream over
parquet drops, or any readStream) driven through ``foreachBatch``, where
each micro-batch either APPENDS (insert-only feeds) or MERGEs (upsert feeds
with a ``_seq`` column) into the table — one snapshot per micro-batch, same
exactly-once shape (a micro-batch that fails before commit leaves the table
on the previous snapshot; Spark replays it from the checkpoint).

``Trigger.AvailableNow`` drains a backlog deterministically — that is what
the tests and the streaming query use.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..icelite.table import IceliteTable
from ..operators.merge_into import merge_into


def stream_ingest_files(
    spark: SparkSession,
    table: IceliteTable,
    source_dir: str,
    checkpoint_dir: str,
    mode: str = "append",  # append | merge | append_dedup
    key: str = "doc_id",
    seq_col: str = "_seq",
    dedup_col: str = "tok_digest",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
    stop_after_batches: int | None = None,
    timeout_seconds: float = 120.0,
    trigger_interval: str = "500 milliseconds",
    bloom_probe_cap: int = 10_000,
    online_compaction=None,
    compact_kwargs: dict | None = None,
    sync_indexes_every: int | None = None,
) -> int:
    """Stream parquet drops from ``source_dir`` into the table.

    Returns the number of micro-batches committed. One icelite snapshot per
    micro-batch (the reference's checkpoint==commit cadence).

    ``available_now=True`` drains the backlog and stops (deterministic —
    tests and the driver queries use this). ``available_now=False`` is the
    reference's forever-running tail (BaseCatalogSync.java:100): a
    processing-time trigger keeps polling the source; the call returns after
    ``stop_after_batches`` non-empty batches committed (or
    ``timeout_seconds``), stopping the query — in production you simply
    never stop it.

    ``online_compaction`` (a ``plans.maintenance.CompactionPolicy``) turns
    the ingest into the reference's full Hudi 3-stage write pipeline —
    stream write THEN inline compaction in the same job, triggered
    ``num_or_time`` (HudiCatalogSync.java:114-118 wires
    ``Pipelines.compact`` after ``hoodieStreamWrite``; 171-175 sets
    trigger strategy num_or_time / delta_commits=1 / delta_seconds=120).
    After each committed micro-batch the policy is evaluated against the
    SNAPSHOT LOG (commits-since-last-replace + wall clock — resume-safe:
    a restarted stream re-derives the trigger state from table metadata,
    exactly like Hudi reading its timeline) and, when due, a bin-packing
    clustered rewrite runs inline before the next batch. ``compact_kwargs``
    pass through to ``operators.compaction.compact`` (curve, salts,
    target size). foreachBatch is serial, so the compaction never races
    its own stream's appends; concurrent OTHER writers are handled by
    compact's validate-no-new-deletes + optimistic-retry protocol.
    """
    # ``mode="append_dedup"`` is the novelty-filtered
    # ingest a dedup pipeline runs at the CDC tail: each micro-batch drops
    # rows whose ``dedup_col`` (a content digest computed upstream, e.g.
    # md5(text) or the token digest) already exists in the table OR occurs
    # earlier in the same batch (kept row = min key, deterministic). Both
    # checks are equi-joins against the digest — at 10^12 rows the existing-
    # keys side is a column-pruned scan of ONE column, and a bloom index on
    # the digest (operators/bloom_index.py) turns it into a file-skipping
    # probe. No all-pairs comparison anywhere.
    schema = table.schema if mode in ("append", "append_dedup") else None
    reader = spark.readStream.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # merge feeds carry the extra _seq column
        from pyspark.sql.types import LongType, StructField, StructType

        base = table.schema
        schema = StructType(list(base.fields) + [StructField(seq_col, LongType(), False)])
        reader = reader.schema(schema)
    stream = reader.parquet(source_dir)

    batches = {"n": 0}
    # exactly-once under foreachBatch replay: the LAST committed batch id is
    # recorded in table properties ATOMICALLY with each append commit (one
    # watermark per stream = per checkpoint dir). A crash between the table
    # commit and the streaming checkpoint redelivers the same batch id on
    # restart; the guard below skips it instead of double-appending. The
    # merge mode needs no watermark — replaying an identical upsert batch is
    # state-idempotent (same keys, same _seq, LWW picks the same rows).
    import hashlib

    stream_prop = (
        "stream."
        + hashlib.md5(os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]
        + ".last-batch"
    )

    def _already_committed(batch_id: int) -> bool:
        last = table.meta.properties.get(stream_prop)
        return last is not None and batch_id <= int(last)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if mode == "append":
            if _already_committed(batch_id):
                return
            table.append(batch_df, set_properties={stream_prop: str(batch_id)})
        elif mode == "append_dedup":
            if _already_committed(batch_id):
                return
            from pyspark.sql import Window
            from pyspark.sql import functions as F

            # intra-batch: keep min key per digest (deterministic LWW-style)
            w = Window.partitionBy(dedup_col).orderBy(F.col(key).asc())
            fresh = (
                batch_df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
            # cross-batch: drop digests the table already holds. When a
            # bloom sidecar exists on the digest column (run build-bloom as
            # part of maintenance), probe every batch digest against the
            # per-file bitmaps FIRST and anti-join only against the files
            # that could collide — at 10^12 rows that turns a table-wide
            # one-column scan per micro-batch into a few file reads. The
            # probe is driver-side over at most ``bloom_probe_cap``
            # distinct digests (micro-batches at a 60 s cadence are
            # bounded); an oversized batch falls back to the full
            # column-pruned anti-join, which stays the scalable path.
            snap = table.current_snapshot()
            if snap is not None and table.data_files(snap.snapshot_id):
                from ..operators.bloom_index import (
                    bloom_multi_probe_filter,
                    load_bloom_index,
                )

                file_filter = None
                if load_bloom_index(table, dedup_col, snap.snapshot_id):
                    digests = [
                        r[0]
                        for r in fresh.select(dedup_col)
                        .distinct()
                        .limit(bloom_probe_cap + 1)
                        .collect()
                    ]
                    if len(digests) <= bloom_probe_cap:
                        file_filter = bloom_multi_probe_filter(
                            table,
                            dedup_col,
                            digests,
                            snapshot_id=snap.snapshot_id,
                            candidates=table.data_files(snap.snapshot_id),
                        )
                existing = table.scan(
                    spark, columns=[dedup_col], file_filter=file_filter
                ).distinct()
                fresh = fresh.join(existing, dedup_col, "left_anti")
            if not fresh.isEmpty():
                table.append(fresh, set_properties={stream_prop: str(batch_id)})
        else:
            merge_into(spark, table, batch_df, key=key, seq_col=seq_col)
        batches["n"] += 1
        if online_compaction is not None:
            from ..operators.compaction import compact
            from ..plans.maintenance import should_compact

            if should_compact(table, online_compaction)["compact"]:
                compact(
                    spark,
                    table,
                    run_id=f"online-b{batch_id}",
                    **(compact_kwargs or {}),
                )
        # online derived-index maintenance: every N committed batches,
        # CDC-sync the registered text/ANN indexes — the streaming
        # analogue of run_full_maintenance's auto-sync, so a continuously
        # ingested table's indexes track it without a separate scheduler.
        # Each sync is O(docs since the last one) by construction.
        if (
            sync_indexes_every is not None
            and batches["n"] % sync_indexes_every == 0
            and table.meta.properties.get("derived.indexes")
        ):
            from ..operators.index_sync import sync_registered_indexes

            sync_registered_indexes(spark, table)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        import time

        q = writer.trigger(processingTime=trigger_interval).start()
        deadline = time.monotonic() + timeout_seconds
        try:
            while time.monotonic() < deadline:
                if q.exception() is not None:
                    raise q.exception()
                if stop_after_batches is not None and batches["n"] >= stop_after_batches:
                    break
                time.sleep(0.2)
        finally:
            q.stop()
        q.awaitTermination(30)
    return batches["n"]


def drop_parquet_batches(
    df: DataFrame, out_dir: str, n_batches: int, key_col: str = "doc_id"
) -> list[str]:
    """Test helper: split df into n deterministic parquet drop-files."""
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_batches):
        p = os.path.join(out_dir, f"drop-{i:04d}")
        df.filter(F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_batches)) == i).coalesce(
            1
        ).write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths
