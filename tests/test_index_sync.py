"""Derived-index registry + maintenance-driven sync (operators/index_sync.py).

Contract under test:
  - register_*_index records the index in the BASE table's registry;
  - run_full_maintenance syncs every registered index to the base's head
    (text + ANN in one pass) and journals an index_sync metrics row;
  - a maintenance-only delta is a watermark move (synced=False second run);
  - dead registrations (index table dropped) are GC'd, not fatal.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite.table import IceliteTable
from lakehouse_benchmark_ingestion_spark.operators.ann_index import (
    register_ann_index,
)
from lakehouse_benchmark_ingestion_spark.operators.index_sync import (
    registered_indexes,
    sync_registered_indexes,
)
from lakehouse_benchmark_ingestion_spark.operators.text_index import (
    GRAM_COL,
    postings_df,
    probe_text_index,
    register_text_index,
)
from lakehouse_benchmark_ingestion_spark.plans.maintenance import (
    run_full_maintenance,
)


def _docs_base(spark, warehouse):
    rows = [(i, "s", f"docbody-{i:04d}-alpha beta gamma") for i in range(16)]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    tbl = Catalog(warehouse).create_table("docs", df.schema)
    tbl.append(df, num_files=3)
    return tbl


def test_maintenance_syncs_registered_indexes(spark, tmp_path):
    base = _docs_base(spark, str(tmp_path / "wh"))
    tix = register_text_index(spark, base, str(tmp_path / "tix"), n=8,
                              num_files=2)
    assert registered_indexes(base) == [tix.location]

    # base evolves, then maintenance runs: the index must come out current
    new_rows = [(100, "s", "freshdoc-0100-later")]
    base.append(spark.createDataFrame(
        new_rows, "doc_id long, source string, text string"))
    m = run_full_maintenance(spark, base, target_file_size=4 << 20)
    assert m["index_sync"]["rows"] == 1  # one registered index visited

    probes = postings_df(
        spark.createDataFrame(new_rows, "doc_id long, source string, text string"),
        8,
    ).select(GRAM_COL).distinct()
    hits, _ = probe_text_index(spark, tix, probes)
    assert {r["doc_id"] for r in hits.collect()} == {100}

    # second maintenance pass: rewrites only → empty diff → watermark move
    m2 = run_full_maintenance(spark, base, target_file_size=4 << 20)
    assert m2["index_sync"]["files_out"] in (0, 1)  # nothing or wm-only


def test_sync_walks_text_and_ann_and_gcs_dead(spark, tmp_path):
    import math

    base = _docs_base(spark, str(tmp_path / "wh"))
    tix = register_text_index(spark, base, str(tmp_path / "tix"), n=8,
                              num_files=2)

    # an ANN index on a vector base table shares the registry mechanics
    from lakehouse_benchmark_ingestion_spark.operators.similarity import FLAT_DIM

    vrows = []
    for i in range(12):
        v = [0.0] * FLAT_DIM
        v[i % 4] = 1.0
        vrows.append((i, v))
    vdf = spark.createDataFrame(vrows, "vec_id long, embedding array<double>")
    vbase = Catalog(str(tmp_path / "vwh")).create_table("vectors", vdf.schema)
    vbase.append(vdf)
    ann = register_ann_index(spark, vbase, str(tmp_path / "ann"), n_cells=4)
    assert registered_indexes(vbase) == [ann.location]

    vbase.append(spark.createDataFrame(
        [(50, [float(j == 1) for j in range(FLAT_DIM)])],
        "vec_id long, embedding array<double>"))
    r = sync_registered_indexes(spark, vbase)
    assert r["indexes"] == 1 and r["synced"] == 1

    # drop the text index table entirely: next sync GCs the registration
    IceliteTable.drop(tix.location)
    r = sync_registered_indexes(spark, base)
    assert r["results"][tix.location] == {"dropped": True}
    assert registered_indexes(base) == []


def test_expire_keeps_index_watermark_snapshot(spark, tmp_path):
    """keep_last=1 would expire the registered index's watermark snapshot;
    watermark-aware retention must pin it so the CDC catch-up still works."""
    from lakehouse_benchmark_ingestion_spark.operators.expire_snapshots import (
        expire_snapshots,
    )
    from lakehouse_benchmark_ingestion_spark.operators.text_index import (
        PROP_BASE_SNAPSHOT,
    )

    base = _docs_base(spark, str(tmp_path / "wh"))
    tix = register_text_index(spark, base, str(tmp_path / "tix"), n=8,
                              num_files=2)
    wm = int(tix.meta.properties[PROP_BASE_SNAPSHOT])

    for i in range(3):
        base.append(spark.createDataFrame(
            [(200 + i, "s", f"late{i}-{i:04d}")],
            "doc_id long, source string, text string"))
    expire_snapshots(base, keep_last=1)
    assert wm in {s.snapshot_id for s in base.meta.snapshots}

    r = sync_registered_indexes(spark, base)
    assert r["synced"] == 1
    probes = postings_df(
        spark.createDataFrame([(202, "s", "late2-0002")],
                              "doc_id long, source string, text string"), 8
    ).select(GRAM_COL).distinct()
    hits, _ = probe_text_index(spark, tix, probes)
    assert {r["doc_id"] for r in hits.collect()} == {202}

    # after the sync moved the watermark forward, the old snapshot is
    # expirable again
    expire_snapshots(base, keep_last=1)
    assert wm not in {s.snapshot_id for s in base.meta.snapshots}


def test_status_reports_index_freshness(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.plans.maintenance import table_health

    base = _docs_base(spark, str(tmp_path / "wh"))
    tix = register_text_index(spark, base, str(tmp_path / "tix"), n=8,
                              num_files=2)
    assert table_health(base)["derived_indexes"] == {tix.location: "fresh"}
    base.append(spark.createDataFrame(
        [(300, "s", "statusdoc-0300")],
        "doc_id long, source string, text string"))
    assert table_health(base)["derived_indexes"] == {tix.location: "stale"}
    sync_registered_indexes(spark, base)
    assert table_health(base)["derived_indexes"] == {tix.location: "fresh"}
    IceliteTable.drop(tix.location)
    assert table_health(base)["derived_indexes"] == {tix.location: "dead"}


def test_randomized_lifecycle_matches_rebuild(spark, tmp_path):
    """Stateful fuzz of the sync contract: a seeded random sequence of
    append / COW-delete / MERGE-update batches against the base, syncing
    after every step, must leave the index IDENTICAL (postings multiset)
    to a from-scratch rebuild over the live docs — any watermark slip,
    unapplied delete, sequence-rule error, or double-applied diff shows
    up as a multiset difference."""
    import random

    from pyspark.sql import functions as F

    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.operators.text_index import (
        build_text_index,
    )

    SCHEMA = "doc_id long, source string, text string"

    def doc(i, rev=0):
        return (i, f"s{i % 3}", f"body-{i:04d}-rev{rev}-payload")

    for seed in (7, 23):
        rng = random.Random(seed)
        wh = str(tmp_path / f"wh{seed}")
        live = {i: doc(i) for i in range(10)}
        base = Catalog(wh).create_table("docs", spark.createDataFrame(
            list(live.values()), SCHEMA).schema)
        base.append(spark.createDataFrame(list(live.values()), SCHEMA))
        idx = register_text_index(spark, base, str(tmp_path / f"ix{seed}"),
                                  n=8, num_files=2, bloom=False)
        next_id = 100
        for step in range(4):
            op = rng.choice(["append", "delete", "update", "noop"])
            if op == "append":
                new = [doc(next_id + j) for j in range(rng.randint(1, 3))]
                next_id += len(new)
                base.append(spark.createDataFrame(new, SCHEMA))
                live.update({d[0]: d for d in new})
            elif op == "delete" and live:
                victim = rng.choice(sorted(live))
                delete_where(spark, base, {"doc_id": victim},
                             strategy="cow", key="doc_id")
                del live[victim]
            elif op == "update" and live:
                victim = rng.choice(sorted(live))
                upd = doc(victim, rev=step + 1)
                merge_into(spark, base, spark.createDataFrame(
                    [(*upd, 1)], SCHEMA + ", _seq long"), key="doc_id")
                live[victim] = upd
            sync_registered_indexes(spark, base)

        rebuilt = build_text_index(
            spark,
            spark.createDataFrame(sorted(live.values()), SCHEMA),
            str(tmp_path / f"rb{seed}"), n=8, num_files=2, bloom=False,
        )
        a = idx.scan(spark).select("doc_id", "source", GRAM_COL)
        b = rebuilt.scan(spark).select("doc_id", "source", GRAM_COL)
        assert a.exceptAll(b).count() == 0, f"seed {seed}: extra postings"
        assert b.exceptAll(a).count() == 0, f"seed {seed}: missing postings"
