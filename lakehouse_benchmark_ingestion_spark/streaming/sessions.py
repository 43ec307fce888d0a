"""Gap-based sessionization — custom stateful streaming operator.

``applyInPandasWithState`` keyed by user: per-user state carries the open
session (start, last-seen, count, value sum); an event later than ``gap``
after the last one CLOSES the session (emitted downstream) and opens a new
one. This is the operator class Spark's built-in windowed aggregates cannot
express (variable-length, data-dependent windows) — the designated escape
hatch per SURVEY.md §2.8, Arrow-batched, no per-row Python outside the
grouped kernel.

State size is O(active users), independent of event count; the only shuffle
is the groupBy hash exchange. Timestamps travel as int64 MICROSECONDS inside
the state so stream and batch oracle agree exactly (float epoch seconds lose
sub-microsecond precision at 2024-scale epochs).

Closed sessions append into an icelite table via foreachBatch — one snapshot
per micro-batch, the same commit cadence as every other ingest path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n", LongType()),
        StructField("val", DoubleType()),
    ]
)

_EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _make_session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            start_us, last_us, n, val = state.get
        else:
            start_us, last_us, n, val = None, None, 0, 0.0

        rows = pd.concat(list(pdfs), ignore_index=True)
        # deterministic replay order: event time, then id for equal stamps
        rows = rows.sort_values(["ts", "event_id"])
        closed: list[tuple] = []
        for ts, v in zip(rows["ts"], rows["value"]):
            t_us = ts.value // 1000  # pd.Timestamp.value is ns
            if last_us is None:
                start_us, last_us, n, val = t_us, t_us, 1, float(v)
            elif t_us - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n, val))
                start_us, last_us, n, val = t_us, t_us, 1, float(v)
            else:
                last_us, n, val = t_us, n + 1, val + float(v)
        state.update((start_us, last_us, n, val))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                    "sum_value": [c[4] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    spark: SparkSession,
    table,
    source_dir: str,
    checkpoint_dir: str,
    gap_seconds: int = 1800,
    max_files_per_trigger: int = 1,
    state_partitions: int | None = None,
) -> int:
    """Stream event drops through the stateful sessionizer; append CLOSED
    sessions to the icelite table. Returns micro-batches committed. Sessions
    still open when the stream drains stay in the checkpoint state and close
    on a later run — exactly Flink's keyed-state continuation model, which
    is what the reference's checkpointed operators rely on
    (FsStateBackend, MainRunner.java:85-88).

    ``state_partitions`` sizes the state-store instance count (pinned into
    the checkpoint at first run). Keyed state scales with DISTINCT USERS,
    not event volume — a small drop-feed wants far fewer state stores than
    the session's shuffle width (each store pays per-batch commit + Python
    worker overhead); a 10^12-event production stream wants thousands.
    None = inherit spark.sql.shuffle.partitions."""
    old_parts = None
    if state_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        return _run_stream(
            spark, table, source_dir, checkpoint_dir, gap_seconds,
            max_files_per_trigger,
        )
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)


def _run_stream(
    spark: SparkSession,
    table,
    source_dir: str,
    checkpoint_dir: str,
    gap_seconds: int,
    max_files_per_trigger: int,
) -> int:
    stream = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    sessions = (
        stream.select("event_id", "ts", "user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf="NoTimeout",
        )
    )

    batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        table.append(batch_df)
        batches["n"] += 1

    q = (
        sessions.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return batches["n"]


def sessionize_batch(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """Batch twin of the streaming sessionizer (closed sessions only) —
    declarative lag/cumsum sessionization, used as the correctness oracle.
    A session is closed iff a later session exists for the same user."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact integer microseconds (fixtures may be TIMESTAMP_NTZ, which Spark 4
    # refuses to cast to double directly)
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    marked = events.select("user_id", "event_id", "ts", "value").withColumn(
        "_new",
        (ts_us - F.lag(ts_us).over(w) > F.lit(gap_seconds * 1_000_000)).cast("long"),
    )
    marked = marked.withColumn(
        "_sid", F.coalesce(F.sum("_new").over(w), F.lit(0))
    )
    agg = marked.groupBy("user_id", "_sid").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    last = agg.groupBy("user_id").agg(F.max("_sid").alias("_last_sid"))
    return (
        agg.join(last, "user_id")
        .filter(F.col("_sid") < F.col("_last_sid"))
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )
