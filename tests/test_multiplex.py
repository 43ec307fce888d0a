"""Multi-table single-scan CDC multiplexing (streaming/multiplex.py).

Reference parity: one binlog tail demuxed to N per-table sinks
(SyncDbFunction.java:77-86, 166-193; BaseCatalogSync.java:121-128).
Contract under test:
  - ONE envelope feed routes rows to N icelite tables by _table;
  - typed deserialization against each table's own schema (S3 parity);
  - per-table mode: append feeds and merge (upsert) feeds coexist in the
    same stream;
  - rows for unregistered tables are dropped (table-list filter) unless
    strict=True;
  - each table advances one snapshot per micro-batch that carried its rows.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.streaming.multiplex import (
    drop_envelope_batches,
    envelope,
    stream_ingest_multiplexed,
)


def _feeds(spark):
    docs = spark.createDataFrame(
        [(i, f"text-{i}", "en", f"s{i % 3}", 10 + i) for i in range(20)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    evts = spark.createDataFrame(
        [(i, 100 + i, "click" if i % 2 else "view") for i in range(30)],
        "event_id long, user_id long, event_type string",
    )
    return docs, evts


def test_one_feed_routes_to_two_tables(spark, warehouse, tmp_path):
    docs, evts = _feeds(spark)
    cat = Catalog(warehouse)
    tdocs = cat.create_table("docs", docs.schema)
    tevts = cat.create_table("evts", evts.schema)

    drop_envelope_batches(
        [envelope(docs, "docs"), envelope(evts, "evts")],
        str(tmp_path / "feed"), n_batches=3,
    )
    m = stream_ingest_multiplexed(
        spark, {"docs": tdocs, "evts": tevts},
        str(tmp_path / "feed/drop-*"), str(tmp_path / "ckpt"),
    )
    assert m["batches"] == 3
    assert m["routed"] == {"docs": 20, "evts": 30}
    # typed round-trip: every column survives the envelope
    assert tdocs.scan(spark).exceptAll(docs).count() == 0
    assert docs.exceptAll(tdocs.scan(spark)).count() == 0
    assert tevts.scan(spark).exceptAll(evts).count() == 0


def test_mixed_append_and_merge_modes(spark, warehouse, tmp_path):
    docs, _ = _feeds(spark)
    cat = Catalog(warehouse)
    tdocs = cat.create_table("docs", docs.schema)
    tdocs.append(docs)

    # upsert feed: rewrite n_chars for 5 docs, insert 2 new ones
    upd = spark.createDataFrame(
        [(i, f"text-{i}-v2", "en", "sX", 999, 7) for i in [0, 1, 2, 3, 4, 100, 101]],
        "doc_id long, text string, lang string, source string, n_chars long, _seq long",
    )
    evts_new = spark.createDataFrame(
        [(900 + i, 1, "scroll") for i in range(4)],
        "event_id long, user_id long, event_type string",
    )
    tevts = cat.create_table("evts", evts_new.schema)

    drop_envelope_batches(
        [envelope(upd, "docs", seq_col="_seq"), envelope(evts_new, "evts")],
        str(tmp_path / "feed"), n_batches=2,
    )
    stream_ingest_multiplexed(
        spark, {"docs": tdocs, "evts": tevts},
        str(tmp_path / "feed/drop-*"), str(tmp_path / "ckpt"),
        modes={"docs": "merge"}, keys={"docs": "doc_id"},
    )
    got = {r.doc_id: (r.n_chars, r.source) for r in tdocs.scan(spark).collect()}
    assert len(got) == 22  # 20 base + 2 inserts
    assert got[0] == (999, "sX") and got[100] == (999, "sX")
    assert got[10] == (20, "s1")  # untouched row intact
    assert tevts.scan(spark).count() == 4


def test_unregistered_table_rows(spark, warehouse, tmp_path):
    docs, evts = _feeds(spark)
    tdocs = Catalog(warehouse).create_table("docs", docs.schema)
    drop_envelope_batches(
        [envelope(docs, "docs"), envelope(evts, "ghost")],
        str(tmp_path / "feed"), n_batches=2,
    )
    # permissive: ghost rows dropped, docs land
    m = stream_ingest_multiplexed(
        spark, {"docs": tdocs},
        str(tmp_path / "feed/drop-*"), str(tmp_path / "ckpt1"),
    )
    assert m["routed"]["docs"] == 20
    assert tdocs.scan(spark).count() == 20
    # strict: refuse
    tdocs2 = Catalog(str(tmp_path / "wh2")).create_table("docs", docs.schema)
    with pytest.raises(Exception, match="unregistered"):
        stream_ingest_multiplexed(
            spark, {"docs": tdocs2},
            str(tmp_path / "feed/drop-*"), str(tmp_path / "ckpt2"),
            strict=True,
        )


def test_snapshot_cadence_per_table(spark, warehouse, tmp_path):
    """Every micro-batch carrying a table's rows commits one snapshot to
    that table (checkpoint==commit parity, MainRunner.java:85-88)."""
    docs, evts = _feeds(spark)
    cat = Catalog(warehouse)
    tdocs = cat.create_table("docs", docs.schema)
    tevts = cat.create_table("evts", evts.schema)
    drop_envelope_batches(
        [envelope(docs, "docs"), envelope(evts, "evts")],
        str(tmp_path / "feed"), n_batches=4,
    )
    stream_ingest_multiplexed(
        spark, {"docs": tdocs, "evts": tevts},
        str(tmp_path / "feed/drop-*"), str(tmp_path / "ckpt"),
    )
    n_docs_snaps = len(tdocs.meta.snapshots)
    n_evts_snaps = len(tevts.meta.snapshots)
    assert 1 <= n_docs_snaps <= 4 and 1 <= n_evts_snaps <= 4
    assert tdocs.scan(spark).count() == 20
    assert tevts.scan(spark).count() == 30


def test_multiplex_replay_exactly_once_per_table(spark, warehouse, tmp_path):
    """Redelivered micro-batch (crash between table commits and streaming
    checkpoint): each table's own batch watermark must skip its
    already-committed slice — including the mid-loop case where only SOME
    tables committed before the crash (simulated by erasing one table's
    watermark property)."""
    from tests.test_streaming import _rollback_last_stream_commit

    docs, evts = _feeds(spark)
    cat = Catalog(warehouse)
    tdocs = cat.create_table("docs", docs.schema)
    tevts = cat.create_table("evts", evts.schema)
    feed, ck = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    drop_envelope_batches(
        [envelope(docs, "docs"), envelope(evts, "evts")], feed, n_batches=2
    )
    stream_ingest_multiplexed(
        spark, {"docs": tdocs, "evts": tevts}, feed + "/drop-*", ck
    )
    n_docs, n_evts = tdocs.scan(spark).count(), tevts.scan(spark).count()
    s_docs, s_evts = len(tdocs.history()), len(tevts.history())

    _rollback_last_stream_commit(ck)
    # mid-loop crash shape: evts never saw the final batch — wipe its
    # watermark back to the previous batch so the replay MUST re-commit
    # evts but skip docs
    prop = next(k for k in tevts.meta.properties if k.startswith("stream."))
    evts_files_before = {f.path for f in tevts.data_files()}
    tevts.set_properties({prop: "0"})
    # physically roll evts back too (as if its final append never happened)
    tevts.rollback(tevts.history()[-2].snapshot_id)

    stream_ingest_multiplexed(
        spark, {"docs": tdocs, "evts": tevts}, feed + "/drop-*", ck
    )
    assert tdocs.scan(spark).count() == n_docs, "docs replay must be skipped"
    assert len(tdocs.history()) == s_docs
    assert tevts.scan(spark).count() == n_evts, "evts must catch up, once"
    assert tevts.scan(spark).exceptAll(evts).count() == 0


def test_cdc_mode_in_multiplexed_feed(spark, warehouse, tmp_path):
    """One mixed drop carries Debezium I/U/D rows for a cdc-mode table AND
    plain append rows for a second table — the reference's full row-kind
    surface (SyncDbFunction.java:88-97) composed with its side-output
    routing (SyncDbFunction.java:166-193) in a single feed."""
    docs, evts = _feeds(spark)
    cat = Catalog(warehouse)
    tdocs = cat.create_table("docs", docs.schema)
    tdocs.append(docs)
    tevts = cat.create_table("evts", evts.schema)

    changes = spark.createDataFrame(
        [
            (0, "text-0-v2", "en", "sX", 777, "U", 1),
            (1, None, None, None, None, "D", 2),
            (100, "text-100", "en", "sN", 5, "I", 3),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, _op string, _seq long",
    )
    feed = str(tmp_path / "feed")
    drop_envelope_batches(
        [
            envelope(changes, "docs", seq_col="_seq", op_col="_op"),
            envelope(evts, "evts"),
        ],
        feed, n_batches=1,
    )
    m = stream_ingest_multiplexed(
        spark, {"docs": tdocs, "evts": tevts}, feed + "/drop-*",
        str(tmp_path / "ckpt"), modes={"docs": "cdc"}, keys={"docs": "doc_id"},
    )
    got = {r.doc_id: (r.n_chars, r.source) for r in tdocs.scan(spark).collect()}
    assert len(got) == 20  # 20 base - 1 delete + 1 insert
    assert 1 not in got, "D row must remove the base image"
    assert got[0] == (777, "sX"), "U row must replace the base image"
    assert got[100] == (5, "sN"), "I row must land"
    assert got[10] == (20, "s1"), "untouched row intact"
    assert tevts.scan(spark).count() == 30
    assert m["routed"]["evts"] == 30


def test_cdc_mode_replay_skipped(spark, warehouse, tmp_path):
    """A redelivered micro-batch must not re-apply a cdc-mode table's
    changes (each apply is a new eq-delete+images commit, so the batch
    watermark — committed atomically with the snapshot — is the guard)."""
    from tests.test_streaming import _rollback_last_stream_commit

    docs, _ = _feeds(spark)
    cat = Catalog(warehouse)
    tdocs = cat.create_table("docs", docs.schema)
    tdocs.append(docs)
    changes = spark.createDataFrame(
        [(0, "v2", "en", "sX", 777, "U", 1), (1, None, None, None, None, "D", 2)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long, _op string, _seq long",
    )
    feed, ck = str(tmp_path / "feed"), str(tmp_path / "ckpt")
    drop_envelope_batches(
        [envelope(changes, "docs", seq_col="_seq", op_col="_op")], feed, 1
    )
    stream_ingest_multiplexed(
        spark, {"docs": tdocs}, feed + "/drop-*", ck,
        modes={"docs": "cdc"}, keys={"docs": "doc_id"},
    )
    state = sorted(
        (r.doc_id, r.n_chars) for r in tdocs.scan(spark).collect()
    )
    n_snaps = len(tdocs.history())

    _rollback_last_stream_commit(ck)
    stream_ingest_multiplexed(
        spark, {"docs": tdocs}, feed + "/drop-*", ck,
        modes={"docs": "cdc"}, keys={"docs": "doc_id"},
    )
    assert len(tdocs.history()) == n_snaps, "replayed batch must be a no-op"
    assert state == sorted(
        (r.doc_id, r.n_chars) for r in tdocs.scan(spark).collect()
    )
