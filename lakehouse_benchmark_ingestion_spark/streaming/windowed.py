"""Event-time windowed aggregation with watermarks over a streaming feed.

The reference explicitly DISABLES watermarks (`WatermarkStrategy.noWatermarks()`,
BaseCatalogSync.java:123) because its job is pure transport; a consumer of the
lake tables still needs windowed rollups, so the engine ships the idiomatic
Structured Streaming shape: ``readStream → withWatermark → groupBy(window) →
foreachBatch upsert into an icelite rollup table``.

Late data: rows later than the watermark are dropped by Spark's stateful
aggregation exactly as documented; rows within the allowed lateness update
their window, and because the sink MERGEs on the window key, the rollup
table converges to the same answer a batch query gives (the test oracle).

Scale: state is keyed by (window, source) — cardinality = windows x sources,
independent of row count; the shuffle is the groupBy hash exchange, identical
at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..icelite.table import IceliteTable
from ..operators.merge_into import merge_into


def windowed_rollup_stream(
    spark: SparkSession,
    table: IceliteTable,
    source_dir: str,
    checkpoint_dir: str,
    event_time_col: str = "ts",
    group_col: str = "event_type",
    window_duration: str = "1 hour",
    watermark_delay: str = "2 hours",
    max_files_per_trigger: int = 1,
    state_partitions: int | None = None,
) -> int:
    """Stream parquet drops of events into an hourly rollup table.

    ``state_partitions`` sizes the streaming-agg state-store count (see
    sessions.sessionize_stream — state scales with live windows × groups,
    not event volume). None = inherit spark.sql.shuffle.partitions.

    Rollup table schema: (window_start timestamp, group string, n_events
    long, n_users long). Each micro-batch emits UPDATED windows; the sink
    merges them on (window_start, group) so re-emitted windows overwrite
    their previous row — last-writer-wins gives batch-equivalent results
    once the stream drains.

    Returns the number of micro-batches committed.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    # the driver fixture's events schema (TESTDATA.md)
    event_schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
            StructField("props", StringType()),
        ]
    )
    stream = (
        spark.readStream.schema(event_schema)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    agg = (
        stream.withWatermark(event_time_col, watermark_delay)
        .groupBy(
            F.window(F.col(event_time_col), window_duration).alias("w"),
            F.col(group_col).alias("grp"),
        )
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "grp",
            "n_events",
            "n_users",
        )
    )

    batches = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upserts = batch_df.withColumn(
            "_key", F.concat_ws("|", F.col("window_start").cast("string"), "grp")
        ).withColumn("_seq", F.lit(batch_id).cast("long"))
        merge_into(spark, table, upserts, key="_key", seq_col="_seq")
        batches["n"] += 1

    old_parts = None
    if state_partitions is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
    try:
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    return batches["n"]


ROLLUP_SCHEMA_DDL = (
    "window_start timestamp, grp string, n_events bigint, n_users bigint, _key string"
)


def rollup_table_schema():
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    return StructType(
        [
            StructField("window_start", TimestampType()),
            StructField("grp", StringType()),
            StructField("n_events", LongType()),
            StructField("n_users", LongType()),
            StructField("_key", StringType()),
        ]
    )
