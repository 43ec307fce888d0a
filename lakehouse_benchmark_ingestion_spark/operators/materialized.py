"""Incrementally-maintained materialized aggregate views.

A lakehouse serving layer keeps per-key rollups (tokens per source, rows per
table) that must track a base table receiving appends, MERGEs, and deletes.
Recomputing the rollup from 100 TB on every commit is absurd; the
incremental contract is:

    MV(head) = MV(last_refresh) + delta(changes between the two snapshots)

where delta comes from the engine's own CDC diff (operators/changes.py):
each changed row contributes +1/-1 (insert/delete) to additive aggregates
(COUNT, SUM). The refresh cost is O(changed rows) — at a steady trickle of
upserts that is the batch size, never the table.

The view itself is an icelite table (it gets snapshots, time travel, and
atomic swaps for free); its metadata records the base snapshot it reflects
(``mv.base-snapshot`` property), so refresh is idempotent and resumable —
re-running after a crash re-derives the same delta. Groups whose counts
reach zero are dropped.

ADDITIVE aggregates (count/sum; avg = sum/count derived) maintain purely
from the delta. MIN/MAX maintain incrementally on inserts (fold the
inserted extremes in) but a delete can break them only when it GRAZES the
stored extreme (a deleted value can never be below the group's min, so
min survives unless deleted_min == stored min; symmetrically for max).
Grazed groups get a RESCOPED recompute: one semi-joined scan of the base
head restricted to exactly those group keys — O(rows of affected groups),
never the table. Multiplicity makes the graze test conservative (deleting
one of two min-valued rows leaves min intact but still triggers the
recompute), which is correct and cheap: the trigger set is tiny.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..icelite.catalog import Catalog
from ..icelite.table import IceliteTable
from .changes import snapshot_changes

MV_SCHEMA_DDL = (
    "group_key string, n_rows long, sum_val long, min_val long, max_val long"
)


def _aggregate(df: DataFrame, group_col: str, val_col: str) -> DataFrame:
    return df.groupBy(F.col(group_col).alias("group_key")).agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col(val_col)).cast("long").alias("sum_val"),
        F.min(F.col(val_col)).cast("long").alias("min_val"),
        F.max(F.col(val_col)).cast("long").alias("max_val"),
    )


def create_agg_view(
    spark: SparkSession,
    catalog: Catalog,
    base: IceliteTable,
    name: str,
    group_col: str,
    val_col: str,
    snapshot_id: int | None = None,
) -> IceliteTable:
    """Materialize COUNT(*)/SUM(val) per group from the base table's CURRENT
    (or pinned) snapshot and record that snapshot as the view's base."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("group_key", StringType(), False),
            StructField("n_rows", LongType(), False),
            StructField("sum_val", LongType(), False),
            StructField("min_val", LongType(), True),
            StructField("max_val", LongType(), True),
        ]
    )
    mv = catalog.create_table(name, schema)
    snap = base.meta.snapshot(snapshot_id)
    full = _aggregate(
        base.scan(spark, snapshot_id=snapshot_id), group_col, val_col
    )
    mv.append(
        full.select("group_key", "n_rows", "sum_val", "min_val", "max_val"),
        num_files=1,
    )
    mv.set_properties(
        {
            "mv.base-table": base.location,
            "mv.base-snapshot": str(snap.snapshot_id),
            "mv.group-col": group_col,
            "mv.val-col": val_col,
        }
    )
    return mv


def refresh_agg_view(
    spark: SparkSession,
    base: IceliteTable,
    mv: IceliteTable,
    run_id: str | None = None,
) -> dict:
    """Advance the view to the base table's current snapshot by applying the
    CDC delta. Idempotent: the delta is derived from the RECORDED base
    snapshot, and the new state + property move in one atomic commit."""
    run_id = run_id or uuid.uuid4().hex[:12]
    props = mv.meta.properties
    group_col = props["mv.group-col"]
    val_col = props["mv.val-col"]
    from_id = int(props["mv.base-snapshot"])
    to_id = base.current_snapshot().snapshot_id
    if from_id == to_id:
        return {"refreshed": False, "from_snapshot": from_id, "to_snapshot": to_id}

    ch = snapshot_changes(spark, base, from_id, to_id)
    sign = F.when(F.col("change_type") == "insert", F.lit(1)).otherwise(F.lit(-1))
    is_ins = F.col("change_type") == "insert"
    val = F.col(val_col).cast("long")
    delta = (
        ch.withColumn("_s", sign)
        .groupBy(F.col(group_col).alias("group_key"))
        .agg(
            F.sum("_s").cast("long").alias("d_rows"),
            F.sum(F.col("_s") * F.col(val_col)).cast("long").alias("d_val"),
            F.min(F.when(is_ins, val)).alias("ins_min"),
            F.max(F.when(is_ins, val)).alias("ins_max"),
            F.min(F.when(~is_ins, val)).alias("del_min"),
            F.max(F.when(~is_ins, val)).alias("del_max"),
        )
    )
    cur = mv.scan(spark)
    joined = cur.join(delta, "group_key", "full_outer")
    # a delete grazes an extreme only when it touches the stored value
    # (deleted values are never outside [min, max] of their group)
    grazed = (
        F.col("del_min").isNotNull()
        & F.col("min_val").isNotNull()
        & (
            (F.col("del_min") <= F.col("min_val"))
            | (F.col("del_max") >= F.col("max_val"))
        )
    )
    folded = joined.select(
        "group_key",
        (F.coalesce("n_rows", F.lit(0)) + F.coalesce("d_rows", F.lit(0))).alias("n_rows"),
        (F.coalesce("sum_val", F.lit(0)) + F.coalesce("d_val", F.lit(0))).alias("sum_val"),
        F.least("min_val", "ins_min").alias("min_val"),
        F.greatest("max_val", "ins_max").alias("max_val"),
        F.coalesce(grazed, F.lit(False)).alias("_recompute"),
    ).persist()
    # O(grazed groups) — the recompute TRIGGER SET, never the data
    n_recompute = folded.filter("_recompute").count()
    merged = (
        folded.filter(~F.col("_recompute"))
        .drop("_recompute")
        .filter(F.col("n_rows") > 0)
    )
    if n_recompute:
        # rescoped recompute: one scan PINNED to the refresh's to_id (a
        # concurrent base commit mid-refresh must not leak newer rows into
        # grazed groups — the next delta would re-apply them), restricted
        # to exactly the grazed groups via a broadcast semi-join (the
        # trigger set is delta-bounded — never an isin literal list or a
        # driver collect); a group whose rows all died yields no row and
        # drops out
        keys_df = folded.filter("_recompute").select("group_key")
        rescoped = _aggregate(
            base.scan(spark, snapshot_id=to_id).join(
                F.broadcast(keys_df),
                F.col(group_col) == F.col("group_key"),
                "left_semi",
            ),
            group_col,
            val_col,
        ).select("group_key", "n_rows", "sum_val", "min_val", "max_val")
        merged = merged.unionByName(rescoped)
    merged = merged.localCheckpoint()
    folded.unpersist()

    # rewrite the (tiny) view in one replace-files commit that also moves
    # the recorded base snapshot — state and watermark are atomic together
    import glob
    import os

    from ..icelite import manifest as mf

    out_dir = os.path.join(mv.location, "data", f"mv-{run_id}")
    merged.coalesce(1).write.mode("overwrite").parquet(out_dir)
    paths = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    added = mf.harvest_stats(paths)
    seq = mv.next_sequence_number()
    for s in added:
        s.sequence_number = seq
    old = {f.path for f in mv.data_files()}
    snap = mv.replace_files(
        old,
        added,
        operation="mv-refresh",
        summary={"op": "mv-refresh", "from": str(from_id), "to": str(to_id)},
        set_properties={"mv.base-snapshot": str(to_id)},
    )
    return {
        "refreshed": True,
        "from_snapshot": from_id,
        "to_snapshot": to_id,
        "mv_snapshot": snap.snapshot_id,
        "groups": merged.count(),
        "recomputed_groups": n_recompute,
    }
