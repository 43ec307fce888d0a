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


# ---- lineage-based changelog (key-free CDC via _row_id) -------------------


@pytest.fixture()
def lin_tbl(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite.table import (
        ROW_LINEAGE_PROP,
    )

    df = tokens_df(spark, SF_SMOKE).limit(60)
    t = Catalog(warehouse).create_table(
        "lcl", df.schema, properties={ROW_LINEAGE_PROP: "true"}
    )
    t.append(df, num_files=2)
    return t


def test_lineage_changelog_iud(spark, lin_tbl):
    from lakehouse_benchmark_ingestion_spark.operators.changes import (
        snapshot_changelog_lineage,
    )

    t = lin_tbl
    s0 = t.current_snapshot().snapshot_id
    update_where(
        spark, t, {"doc_id": "7"}, {"source": "'upd'"}, strategy="mor"
    )
    delete_where(spark, t, {"doc_id": "11"}, strategy="dv")
    t.append(
        tokens_df(spark, SF_SMOKE).limit(2).withColumn(
            "doc_id", F.concat(F.lit("new-"), F.col("doc_id"))
        )
    )
    head = t.current_snapshot().snapshot_id
    ch = snapshot_changelog_lineage(spark, t, s0, head)
    by_type = {}
    for r in ch.collect():
        by_type.setdefault(r["change_type"], set()).add(r["doc_id"])
    assert by_type["update_before"] == {"7"}
    assert by_type["update_after"] == {"7"}
    assert by_type["delete"] == {"11"}
    assert by_type["insert"] == {"new-0", "new-1"}
    # the update pair shares ONE _row_id (key-free pairing)
    rids = {
        r["change_type"]: r["_row_id"]
        for r in ch.filter(F.col("doc_id") == "7").collect()
    }
    assert rids["update_before"] == rids["update_after"]


def test_compaction_is_changelog_invisible(spark, lin_tbl):
    """A pure rewrite (compaction) between the snapshots must yield an
    EMPTY lineage changelog — without the engine comparing row contents
    (the content-diff path pays exceptAll over every column for this)."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
    )
    from lakehouse_benchmark_ingestion_spark.operators.changes import (
        snapshot_changelog_lineage,
    )

    t = lin_tbl
    s0 = t.current_snapshot().snapshot_id
    compact(spark, t, target_file_size=1 << 30)
    head = t.current_snapshot().snapshot_id
    assert head != s0
    assert snapshot_changelog_lineage(spark, t, s0, head).count() == 0


def test_dv_on_unchanged_file_is_caught(spark, lin_tbl):
    """A DV delete changes rows without changing the data-file set — the
    lineage diff must still emit those deletes (file-level diff alone
    would miss them)."""
    from lakehouse_benchmark_ingestion_spark.operators.changes import (
        snapshot_changelog_lineage,
    )

    t = lin_tbl
    s0 = t.current_snapshot().snapshot_id
    res = delete_where(spark, t, {"n_tok": (None, 25)}, strategy="dv")
    assert res["deleted_positions"] > 0
    head = t.current_snapshot().snapshot_id
    assert {f.path for f in t.data_files(head)} == {
        f.path for f in t.data_files(s0)
    }, "precondition: data-file set unchanged"
    ch = snapshot_changelog_lineage(spark, t, s0, head)
    rows = ch.collect()
    assert rows and all(r["change_type"] == "delete" for r in rows)
    assert len(rows) == res["deleted_positions"]


def test_pre_lineage_files_refused(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite.table import (
        ROW_LINEAGE_PROP,
    )
    from lakehouse_benchmark_ingestion_spark.operators.changes import (
        snapshot_changelog_lineage,
    )

    df = tokens_df(spark, SF_SMOKE).limit(20)
    t = Catalog(warehouse).create_table("plain", df.schema)
    t.append(df)
    s0 = t.current_snapshot().snapshot_id
    t.set_properties({ROW_LINEAGE_PROP: "true"})
    t.append(df.limit(3).withColumn("doc_id", F.concat(F.lit("n-"), F.col("doc_id"))))
    delete_where(spark, t, {"doc_id": "1"}, strategy="dv")
    with pytest.raises(ValueError, match="no row lineage"):
        snapshot_changelog_lineage(
            spark, t, s0, t.current_snapshot().snapshot_id
        )


def test_tail_auto_uses_lineage_diff(spark, lin_tbl, tmp_path):
    """On a row-lineage table, changelog_tail auto-selects the key-free
    lineage diff: rows carry _row_id, and a compaction-only range drains
    empty."""
    from lakehouse_benchmark_ingestion_spark.operators.compaction import (
        compact,
    )

    t = lin_tbl
    state = str(tmp_path / "state")
    r = changelog_tail(spark, t, state)
    assert "_row_id" in r["df"].columns
    boot = r["df"].collect()
    assert len(boot) == 60 and all(
        x["_row_id"] is not None for x in boot
    )
    r["ack"]()

    compact(spark, t, target_file_size=1 << 30)
    r = changelog_tail(spark, t, state)
    assert r["df"].count() == 0, "compaction-only range must drain empty"
    r["ack"]()

    delete_where(spark, t, {"doc_id": "5"}, strategy="dv")
    r = changelog_tail(spark, t, state)
    rows = r["df"].collect()
    assert [x["change_type"] for x in rows] == ["delete"]
    assert rows[0]["doc_id"] == "5" and rows[0]["_row_id"] is not None
