"""Temporal joins Spark lacks as built-ins: as-of join and interval range
join, both expressed as shapes that survive 100 TB.

The reference's dataflow has no temporal joins (it is an ingestion loop),
but its CDC ordering semantics — "latest state no newer than T" — is
exactly the as-of contract, and time-bucketed routing is its demux pattern
(SyncDbFunction.java:151-157). Both operators here avoid the naive
theta-join plan Catalyst would pick for an inequality condition
(BroadcastNestedLoopJoin — quadratic, the #1 temporal-join scale killer):

- ``asof_join``: union-tag + one window pass. Left and right rows are
  unioned into one stream keyed by the join key, sorted by (ts, tag), and
  the most recent right-row payload is carried forward with
  ``last(..., ignorenulls=True)`` over rows UNBOUNDED PRECEDING..CURRENT.
  ONE shuffle on the key (vs the join's shuffle + per-key sort anyway), no
  join node at all, and skew only where one key's timeline is huge.
- ``range_join``: interval banding. Every interval is exploded into the
  fixed-width buckets it overlaps, every probe row into the single bucket
  it falls in; the join is then a plain equi-join on the bucket id with
  the exact BETWEEN as residual filter. Bucket width should be >= the max
  interval length so each interval lands in O(1 + len/width) buckets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the payload of the latest right row with
    ``right.right_ts <= left.left_ts`` and the same ``on`` key (strict
    backward as-of; right rows tie-break BEFORE left rows at equal ts, so
    an exactly-simultaneous right row IS visible to the left row).

    Returns the left rows + ``prefix + c`` for each payload column and
    ``prefix + "ts"`` (null when no prior right row exists).
    """
    lcols = left.columns
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_p_ts"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
        F.col(right_ts).alias("_p_ts"),
    ).select(*l.columns)  # align column order for the union
    w = (
        Window.partitionBy(on)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = r.unionByName(l).select(
        *lcols,
        "_tag",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in payload
        ],
        F.last("_p_ts", ignorenulls=True).over(w).alias(f"{prefix}ts"),
    )
    return carried.filter(F.col("_tag") == 1).drop("_tag")


def range_join(
    probes: DataFrame,
    intervals: DataFrame,
    probe_key: Column,
    interval_lo: Column,
    interval_hi: Column,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``probes`` rows to ``intervals`` rows with
    ``interval_lo <= probe_key <= interval_hi`` via fixed-width banding.

    All three column expressions must be integer-valued (epoch seconds,
    byte offsets, ...). ``bucket_width`` must be >= the longest interval
    for the O(1)-buckets-per-interval bound to hold (wider is always
    correct, just coarser).

    ``how`` may be ``inner`` or ``left`` (probe-preserving). The BETWEEN
    lives in the JOIN CONDITION, not a post-join filter — a post-filter
    would see NULL for unmatched outer rows and silently reduce any outer
    join to inner. Catalyst still extracts the bucket equality as the
    equi-key and applies the range as a join residual, so the physical
    plan is the same shuffled hash/sort-merge join. Left-outer is sound
    under banding because each probe owns exactly ONE bucket: a (probe,
    interval) pair can only meet in that bucket, so no duplicate matches;
    an unmatched probe yields exactly one null-extended row. Right/full
    outer are rejected — an unmatched interval appears once per exploded
    bucket copy and would emit duplicate null rows.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"range_join supports how='inner' or 'left', got {how!r}: "
            "banding explodes intervals per bucket, so interval-preserving "
            "joins would duplicate unmatched intervals"
        )
    iv = intervals.withColumn(
        "_bkt_iv",
        F.explode(
            F.sequence(
                (interval_lo / bucket_width).cast("long"),
                (interval_hi / bucket_width).cast("long"),
            )
        ),
    )
    pr = probes.withColumn("_bkt", (probe_key / bucket_width).cast("long"))
    joined = pr.join(
        iv,
        (F.col("_bkt") == F.col("_bkt_iv"))
        & (interval_lo <= probe_key)
        & (probe_key <= interval_hi),
        how,
    )
    return joined.drop("_bkt", "_bkt_iv")
