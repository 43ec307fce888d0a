"""Multi-table single-scan CDC multiplexing — one feed, N tables.

The reference tails ONE MySQL binlog for an entire database and demuxes
rows to per-table Flink side-outputs (SyncDbFunction.java:77-86 builds one
OutputTag per table, 166-193 routes each Debezium record by its table
name; BaseCatalogSync.java:121-128 wires the single source to N sinks).
A user ingesting a whole database hits this shape first: the change feed
is shared, the destinations are not.

Spark-first analogue: ONE Structured-Streaming source over an ENVELOPE
feed — rows of ``(_table string, _seq long, _payload string)`` where
``_payload`` is the JSON-serialized typed row (the Debezium value shape) —
and a ``foreachBatch`` sink that demuxes each micro-batch: persist the
batch once (one source read, the side-output analogue), then for each
REGISTERED table filter by ``_table``, deserialize with ``from_json``
against THAT table's schema (S3 typed-row parity), and append or MERGE.
Each table gets one icelite snapshot per micro-batch — the same
checkpoint==commit cadence as the single-table path, multiplied across
the destination set.

Scale notes (100 TB): the batch is read once and cached; per-table
routing is a predicate + JSON parse, both codegen built-ins — no Python
in the row path. Tables absent from a batch cost one cached-filter
isEmpty probe. Rows naming UNREGISTERED tables are dropped (the
reference's table-list filter, BaseConfigOptions sync.table.list) unless
``strict=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from ..icelite.table import IceliteTable
from ..operators.merge_into import merge_into
from .cdc import cdc_apply_batch

ENVELOPE_SCHEMA = StructType(
    [
        StructField("_table", StringType(), False),
        StructField("_seq", LongType(), True),
        StructField("_op", StringType(), True),
        StructField("_payload", StringType(), False),
    ]
)


def envelope(
    df: DataFrame,
    table_name: str,
    seq_col: str | None = None,
    op_col: str | None = None,
) -> DataFrame:
    """Wrap a typed DataFrame as envelope rows for the multiplexed feed.
    ``seq_col`` (for merge/cdc feeds) and ``op_col`` (for cdc feeds: the
    Debezium I/U/D row kind) ride OUTSIDE the payload, like a binlog
    position and row-kind header; payload columns are the table row
    exactly."""
    payload_cols = [c for c in df.columns if c not in (seq_col, op_col)]
    return df.select(
        F.lit(table_name).alias("_table"),
        (F.col(seq_col) if seq_col else F.lit(0)).cast("long").alias("_seq"),
        (F.col(op_col) if op_col else F.lit(None)).cast("string").alias("_op"),
        F.to_json(F.struct(*[F.col(c) for c in payload_cols])).alias("_payload"),
    )


def stream_ingest_multiplexed(
    spark: SparkSession,
    tables: dict[str, IceliteTable],
    source_dir: str,
    checkpoint_dir: str,
    modes: dict[str, str] | None = None,
    keys: dict[str, str] | None = None,
    max_files_per_trigger: int = 1,
    strict: bool = False,
    policies: dict | None = None,
    compact_kwargs: dict | None = None,
) -> dict:
    """Drain an envelope feed into every registered table (availableNow).

    ``modes``: per-table ``"append"`` (default), ``"merge"`` (upsert on
    ``keys[table]``, sequence = the envelope ``_seq``), or ``"cdc"``
    (Debezium I/U/D row kinds in the envelope ``_op`` column, applied as
    one merge-on-read commit per micro-batch — the reference's full
    row-kind surface, SyncDbFunction.java:88-97, multiplexed). Returns
    metrics: batches committed and rows routed per table.

    ``policies``: per-table ``plans.maintenance.CompactionPolicy`` — the
    reference's ONLINE compaction stage, multiplexed: Hudi runs
    ``Pipelines.compact`` inline after the stream write per table
    (HudiCatalogSync.java:114-118) with a num_or_time trigger (171-175),
    and the per-table quota idea is Arctic's ``optimize.quota`` map
    (ArcticCatalogSync.java:121-128 — each table gets its own maintenance
    budget). After a table's micro-batch commit its policy is evaluated
    from the snapshot log (resume-safe) and a clustered bin-packing
    rewrite runs inline when due; tables without a policy never compact
    here. Compactions are counted in ``metrics["compactions"]``.
    """
    modes = modes or {}
    keys = keys or {}
    policies = policies or {}
    stream = (
        spark.readStream.schema(ENVELOPE_SCHEMA)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .parquet(source_dir)
    )
    metrics = {
        "batches": 0,
        "routed": {name: 0 for name in tables},
        "compactions": {name: 0 for name in tables},
    }
    # exactly-once under foreachBatch replay, PER TABLE: the routing loop is
    # not atomic across tables — a crash mid-loop leaves some tables
    # committed; on redelivery each table's own batch watermark (recorded
    # atomically with its append) skips the already-committed ones and
    # completes the rest. Merge-mode tables are replay-idempotent by
    # construction (same keys, same _seq).
    import hashlib
    import os as _os

    stream_prop = (
        "stream."
        + hashlib.md5(_os.path.abspath(checkpoint_dir).encode()).hexdigest()[:12]
        + ".last-batch"
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # one source read per micro-batch, N cached-filter routings — the
        # Flink side-output analogue
        batch_df.persist()
        try:
            if strict:
                unknown = (
                    batch_df.filter(~F.col("_table").isin(list(tables)))
                    .limit(1)
                    .count()
                )
                if unknown:
                    raise ValueError(
                        "multiplexed feed carries rows for unregistered tables"
                    )
            for name, tbl in tables.items():
                routed = (
                    batch_df.filter(F.col("_table") == name)
                    .select(
                        F.from_json("_payload", tbl.schema).alias("_r"),
                        "_seq",
                        "_op",
                    )
                    .select("_r.*", "_seq", "_op")
                )
                if routed.isEmpty():
                    continue
                mode = modes.get(name, "append")
                if mode == "merge":
                    res = merge_into(
                        spark, tbl, routed.drop("_op"),
                        key=keys.get(name, "doc_id"), seq_col="_seq",
                    )
                    metrics["routed"][name] += res.get("updates", 0) or 0
                elif mode == "cdc":
                    # not replay-idempotent snapshot-wise (each apply adds
                    # an eq-delete + images commit) — guard per table like
                    # append; a missing _op defaults to I (upsert-safe)
                    last = tbl.meta.properties.get(stream_prop)
                    if last is not None and batch_id <= int(last):
                        continue
                    typed = routed.withColumn(
                        "_op", F.coalesce(F.col("_op"), F.lit("I"))
                    )
                    res = cdc_apply_batch(
                        spark, tbl, typed,
                        key=keys.get(name, "doc_id"),
                        op_col="_op", seq_col="_seq",
                        set_properties={stream_prop: str(batch_id)},
                        run_id=f"b{batch_id}",
                    )
                    metrics["routed"][name] += (
                        res["upserts"] + res["delete_keys"]
                    )
                else:
                    last = tbl.meta.properties.get(stream_prop)
                    if last is not None and batch_id <= int(last):
                        continue
                    out = routed.drop("_seq", "_op")
                    tbl.append(out, set_properties={stream_prop: str(batch_id)})
                    metrics["routed"][name] += out.count()
                # online compaction, per table (reference stage 3): only
                # tables that just committed re-evaluate their trigger
                if name in policies:
                    from ..operators.compaction import compact
                    from ..plans.maintenance import should_compact

                    if should_compact(tbl, policies[name])["compact"]:
                        compact(
                            spark,
                            tbl,
                            run_id=f"online-{name}-b{batch_id}",
                            **(compact_kwargs or {}),
                        )
                        metrics["compactions"][name] += 1
        finally:
            batch_df.unpersist()
        metrics["batches"] += 1

    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return metrics


def drop_envelope_batches(
    envelopes: list[DataFrame], out_dir: str, n_batches: int
) -> list[str]:
    """Test/fixture helper: interleave N tables' envelope rows into
    ``n_batches`` MIXED drop files — every drop carries rows for several
    tables, which is the point of the multiplexed feed."""
    import os

    from functools import reduce

    feed = reduce(lambda a, b: a.unionByName(b), envelopes)
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i in range(n_batches):
        p = os.path.join(out_dir, f"drop-{i:04d}")
        feed.filter(
            F.pmod(F.xxhash64("_table", "_payload"), F.lit(n_batches)) == i
        ).coalesce(1).write.mode("overwrite").parquet(p)
        paths.append(p)
    return paths
