"""Checkpointed incremental changelog consumer (operators/changes.py
``changelog_tail``): bootstrap-then-tail, ackable offsets, bounded
catch-up, at-least-once replay, retention failure.

Reference parity: the consumer half of the CDC protocol the reference
produces (SyncDbFunction.java:88-97 row kinds; snapshot-then-tail startup
modes SyncDbFunction.java:128-135), over icelite's snapshot lineage.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.changes import changelog_tail
from lakehouse_benchmark_ingestion_spark.operators.expire_snapshots import (
    expire_snapshots,
)
from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
    delete_where,
    update_where,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tbl(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE).limit(60)
    t = Catalog(warehouse).create_table("cl", df.schema)
    t.append(df, num_files=2)
    return t


def test_bootstrap_then_empty(spark, tbl, tmp_path):
    state = str(tmp_path / "state")
    r = changelog_tail(spark, tbl, state)
    assert r["from_snapshot_id"] is None
    got = r["df"].collect()
    assert len(got) == 60
    assert all(x["change_type"] == "insert" for x in got)
    r["ack"]()
    r2 = changelog_tail(spark, tbl, state)
    assert r2["df"].count() == 0, "at head → empty changelog"
    assert r2["from_snapshot_id"] == r2["to_snapshot_id"]


def test_tail_emits_iud_and_replays_until_acked(spark, tbl, tmp_path):
    state = str(tmp_path / "state")
    changelog_tail(spark, tbl, state)["ack"]()

    # one update + one delete + one fresh append since the ack
    update_where(
        spark, tbl, {"doc_id": "7"}, {"source": "'updated'"}, strategy="cow"
    )
    delete_where(spark, tbl, {"doc_id": "11"}, strategy="cow")
    extra = tokens_df(spark, SF_SMOKE).limit(2).withColumn(
        "doc_id", F.concat(F.lit("new-"), F.col("doc_id"))
    )
    tbl.append(extra)

    r = changelog_tail(spark, tbl, state)
    by_type = {}
    for row in r["df"].collect():
        by_type.setdefault(row["change_type"], set()).add(row["doc_id"])
    assert by_type["update_before"] == {"7"}
    assert by_type["update_after"] == {"7"}
    assert by_type["delete"] == {"11"}
    assert by_type["insert"] == {"new-0", "new-1"}

    # crash before ack → identical range replays
    r2 = changelog_tail(spark, tbl, state)
    assert (r2["from_snapshot_id"], r2["to_snapshot_id"]) == (
        r["from_snapshot_id"],
        r["to_snapshot_id"],
    )
    assert r2["df"].exceptAll(r["df"]).count() == 0
    r2["ack"]()
    assert changelog_tail(spark, tbl, state)["df"].count() == 0


def test_bounded_catchup_union_equals_full_tail(spark, tbl, tmp_path):
    state = str(tmp_path / "state")
    changelog_tail(spark, tbl, state)["ack"]()
    # 3 commits behind
    for i in range(3):
        tbl.append(
            tokens_df(spark, SF_SMOKE).limit(2).withColumn(
                "doc_id", F.concat(F.lit(f"b{i}-"), F.col("doc_id"))
            )
        )
    seen: set[str] = set()
    steps = 0
    while True:
        r = changelog_tail(spark, tbl, state, max_snapshots=1)
        rows = r["df"].collect()
        if not rows and r["from_snapshot_id"] == r["to_snapshot_id"]:
            break
        assert len(rows) == 2, "one commit admitted per step"
        seen.update(x["doc_id"] for x in rows)
        r["ack"]()
        steps += 1
    assert steps == 3
    assert seen == {f"b{i}-{d}" for i in range(3) for d in ("0", "1")}


def test_expired_offset_raises(spark, tbl, tmp_path):
    state = str(tmp_path / "state")
    changelog_tail(spark, tbl, state)["ack"]()
    for i in range(3):
        tbl.append(
            tokens_df(spark, SF_SMOKE).limit(1).withColumn(
                "doc_id", F.lit(f"x{i}")
            )
        )
    expire_snapshots(tbl, keep_last=1)
    with pytest.raises(RuntimeError, match="retained ancestor"):
        changelog_tail(spark, tbl, state)
