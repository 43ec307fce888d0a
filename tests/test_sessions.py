"""Stateful sessionization (applyInPandasWithState): unit + stream-vs-batch."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _drop_time_slices(spark, events, out_dir: str, n: int) -> None:
    """Write n parquet drops that slice events by TIME (drop k holds the
    k-th ntile of the (ts, event_id) ordering) so the stateful operator
    replays them in event order across micro-batches."""
    from pyspark.sql import Window

    sliced = events.withColumn(
        "_slice", F.ntile(n).over(Window.orderBy("ts", "event_id"))
    )
    for k in range(1, n + 1):
        sliced.filter(F.col("_slice") == k).drop("_slice").coalesce(1).write.parquet(
            f"{out_dir}/drop-{k:04d}"
        )


def test_sessions_close_on_gap(spark, tmp_path):
    """Hand-built timeline: session closes exactly when the gap is exceeded,
    open sessions persist in state across drains and close later."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.streaming.sessions import (
        SESSION_SCHEMA,
        sessionize_stream,
    )

    t0 = datetime.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, uid, minutes):
        return (eid, t0 + datetime.timedelta(minutes=minutes), uid, "click", 1.0, "{}")

    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    drops = str(tmp_path / "drops")
    # user 1: events at 0,5,60min (30-min gap → [0,5] closes when 60 arrives)
    # user 2: single event (stays open)
    spark.createDataFrame(
        [ev(1, 1, 0), ev(2, 1, 5), ev(3, 1, 60), ev(4, 2, 0)], schema
    ).coalesce(1).write.parquet(f"{drops}/drop-0001")

    tbl = Catalog(str(tmp_path / "wh")).create_table("sessions", SESSION_SCHEMA)
    ck = str(tmp_path / "ckpt")
    sessionize_stream(spark, tbl, drops + "/drop-*", ck, gap_seconds=1800)

    rows = tbl.scan(spark).collect()
    assert len(rows) == 1
    s = rows[0]
    assert s.user_id == 1 and s.n_events == 2 and s.sum_value == 2.0
    assert s.session_start == t0
    assert s.session_end == t0 + datetime.timedelta(minutes=5)

    # second drain: user 1's open session (started at 60min) closes when a
    # much-later event arrives; user 2 stays open forever
    spark.createDataFrame([ev(5, 1, 300)], schema).coalesce(1).write.parquet(
        f"{drops}/drop-0002"
    )
    sessionize_stream(spark, tbl, drops + "/drop-*", ck, gap_seconds=1800)
    rows = {(r.user_id, r.session_start): r for r in tbl.scan(spark).collect()}
    assert len(rows) == 2
    second = rows[(1, t0 + datetime.timedelta(minutes=60))]
    assert second.n_events == 1 and second.session_end == second.session_start


def test_sessions_stream_matches_batch(spark, tmp_path):
    """Drain the events fixture in 3 time-ordered micro-batches; the closed
    sessions must equal the declarative batch sessionization."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.streaming.sessions import (
        SESSION_SCHEMA,
        sessionize_batch,
        sessionize_stream,
    )

    events = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    drops = str(tmp_path / "drops")
    _drop_time_slices(spark, events, drops, n=3)

    tbl = Catalog(str(tmp_path / "wh")).create_table("sessions", SESSION_SCHEMA)
    n = sessionize_stream(
        spark, tbl, drops + "/drop-*", str(tmp_path / "ckpt"), gap_seconds=3600
    )
    assert n >= 1

    def keyed(df):
        return {
            (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
            for r in df.collect()
        }

    got = keyed(tbl.scan(spark))
    expected = keyed(sessionize_batch(events, gap_seconds=3600))
    assert got == expected
    assert len(got) > 0
