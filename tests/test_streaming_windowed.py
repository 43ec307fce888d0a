"""Event-time windowed rollup stream: batch-equivalence + late-data drop."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_windowed_rollup_matches_batch(spark, tmp_path):
    """Drain the events fixture through the watermarked windowed stream;
    the rollup table must equal the equivalent batch aggregation."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.streaming.incremental import (
        drop_parquet_batches,
    )
    from lakehouse_benchmark_ingestion_spark.streaming.windowed import (
        rollup_table_schema,
        windowed_rollup_stream,
    )

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    drops = str(tmp_path / "drops")
    drop_parquet_batches(events, drops, n_batches=3, key_col="event_id")

    tbl = Catalog(str(tmp_path / "wh")).create_table("rollup", rollup_table_schema())
    n_batches = windowed_rollup_stream(
        spark,
        tbl,
        drops + "/drop-*",
        str(tmp_path / "ckpt"),
        window_duration="1 hour",
        # generous lateness: the hash-split drops are not time-ordered, so
        # nothing may be dropped if stream and batch answers are to agree
        watermark_delay="87600 hours",
    )
    assert n_batches >= 1

    got = {
        (r.window_start, r.grp): (r.n_events, r.n_users)
        for r in tbl.scan(spark).collect()
    }
    expected = {
        (r.window_start, r.grp): (r.n_events, r.n_users)
        for r in events.groupBy(
            F.window("ts", "1 hour").alias("w"),
            F.col("event_type").alias("grp"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(F.col("w.start").alias("window_start"), "grp", "n_events", "n_users")
        .collect()
    }
    assert got == expected


def test_windowed_rollup_drops_late_rows(spark, tmp_path):
    """A row older than the watermark at its arrival must be excluded."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.streaming.windowed import (
        rollup_table_schema,
        windowed_rollup_stream,
    )

    def ev(eid, uid, etype, ts):
        return (eid, ts, uid, etype, 1.0, "{}")

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    drops = str(tmp_path / "drops")
    tbl = Catalog(str(tmp_path / "wh")).create_table("rollup", rollup_table_schema())

    # two sequential drains against ONE checkpoint: the watermark state
    # persists, so run 1 advances it to ~t0+10h-1h and run 2's row — 8 hours
    # BEFORE t0 — arrives below the watermark and must be dropped
    spark.createDataFrame(
        [ev(1, 1, "click", t0), ev(2, 2, "click", t0 + datetime.timedelta(hours=10))],
        schema,
    ).coalesce(1).write.parquet(f"{drops}/drop-0000")
    windowed_rollup_stream(
        spark, tbl, drops + "/drop-*", str(tmp_path / "ckpt"),
        window_duration="1 hour", watermark_delay="1 hour",
    )
    spark.createDataFrame(
        [ev(3, 3, "click", t0 - datetime.timedelta(hours=8))], schema
    ).coalesce(1).write.parquet(f"{drops}/drop-0001")
    windowed_rollup_stream(
        spark, tbl, drops + "/drop-*", str(tmp_path / "ckpt"),
        window_duration="1 hour", watermark_delay="1 hour",
    )
    rows = {r.window_start: r.n_events for r in tbl.scan(spark).collect()}
    assert t0.replace(minute=0) in rows  # on-time window present
    late_window = (t0 - datetime.timedelta(hours=8)).replace(minute=0)
    assert late_window not in rows, "late row leaked past the watermark"
