"""Tests: snapshot_changes (incremental CDC diff) and IVF ANN."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------------------
# snapshot_changes
# ---------------------------------------------------------------------------

def test_changes_across_merge(spark, sequences_table):
    """Diff across a MERGE commit = updates (delete+insert pairs) + inserts."""
    from lakehouse_benchmark_ingestion_spark.operators.changes import snapshot_changes
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import updates_df

    tbl = sequences_table
    before_id = tbl.current_snapshot().snapshot_id
    before = tbl.scan(spark).select("doc_id", "tokens", "n_tok", "source").cache()
    merge_into(spark, tbl, updates_df(spark, SF_SMOKE))
    after_id = tbl.current_snapshot().snapshot_id
    after = tbl.scan(spark).select("doc_id", "tokens", "n_tok", "source").cache()

    ch = snapshot_changes(spark, tbl, before_id, after_id).cache()
    ins = ch.filter(F.col("change_type") == "insert").drop("change_type")
    dele = ch.filter(F.col("change_type") == "delete").drop("change_type")

    # inserts = after - before, deletes = before - after (multiset equality)
    assert ins.exceptAll(after.exceptAll(before)).count() == 0
    assert after.exceptAll(before).exceptAll(ins).count() == 0
    assert dele.exceptAll(before.exceptAll(after)).count() == 0
    assert before.exceptAll(after).exceptAll(dele).count() == 0

    # an updated key shows both a delete and an insert; a brand-new key only
    # an insert
    upd_keys = {r.doc_id for r in dele.select("doc_id").distinct().collect()}
    ins_keys = {r.doc_id for r in ins.select("doc_id").distinct().collect()}
    assert upd_keys <= ins_keys  # every overwritten key got its new version
    new_keys = ins_keys - upd_keys
    assert all(int(k) >= 1000000 for k in new_keys)
    before.unpersist(); after.unpersist(); ch.unpersist()


def test_changes_empty_between_content_identical_snapshots(spark, sequences_table):
    """Compaction rewrites files but changes no rows → empty diff (and the
    diff job scans only the rewritten files, not the whole table)."""
    from lakehouse_benchmark_ingestion_spark.operators.changes import snapshot_changes
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    tbl = sequences_table
    before_id = tbl.current_snapshot().snapshot_id
    compact(spark, tbl, target_file_size=1024 * 1024)
    after_id = tbl.current_snapshot().snapshot_id
    assert after_id != before_id
    assert snapshot_changes(spark, tbl, before_id, after_id).count() == 0


def test_changes_prunes_untouched_files(spark, warehouse):
    """MERGE rewrites only the stats-matched files, and the changes scan
    reads only files added/removed between the snapshots."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.changes import snapshot_changes
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    df = tokens_df(spark, SF_SMOKE)
    # three files with LEXICALLY disjoint doc_id ranges (doc_id is a string
    # key; manifest min/max bounds compare lexically)
    ids = sorted(r.doc_id for r in df.select("doc_id").collect())
    third = len(ids) // 3
    parts = [ids[:third], ids[third : 2 * third], ids[2 * third :]]
    tbl = Catalog(warehouse).create_table("sequences", df.schema)
    for p in parts:
        tbl.append(df.filter(F.col("doc_id").isin(p)), num_files=1)
    before_id = tbl.current_snapshot().snapshot_id

    # update 10 keys that all live in the FIRST file's range
    upd = (
        df.filter(F.col("doc_id").isin(parts[0][:10]))
        .withColumn("source", F.lit("moved"))
        .withColumn("_seq", F.lit(1).cast("long"))
    )
    m = merge_into(spark, tbl, upd)
    after_id = tbl.current_snapshot().snapshot_id

    assert m["files_matched"] == 1  # stats pruning skipped 2 of 3 files
    old = {f.path for f in tbl.data_files(before_id)}
    new = {f.path for f in tbl.data_files(after_id)}
    assert len(old - new) == 1 and len(old & new) == 2

    # plan-level: the diff reads exactly the touched files, nothing else
    ch = snapshot_changes(spark, tbl, before_id, after_id)
    scanned = {p.removeprefix("file://") for p in ch.inputFiles()}
    assert scanned <= ((old - new) | (new - old))
    n = ch.groupBy("change_type").count().collect()
    counts = {r["change_type"]: r["count"] for r in n}
    assert counts["insert"] == 10 and counts["delete"] == 10


# ---------------------------------------------------------------------------
# IVF ANN
# ---------------------------------------------------------------------------

def test_ivf_cells_shape(spark):
    from lakehouse_benchmark_ingestion_spark.operators.similarity import ivf_cells

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    cents = [
        (r[0], list(r[1]))
        for r in e.select("vec_id", "embedding").filter(F.col("vec_id") < 4).collect()
    ]
    out = ivf_cells(
        e.select(F.col("embedding").alias("v"), "vec_id"), cents, "v", n_cells=2
    )
    rows = out.select("vec_id", "cell").collect()
    assert all(len(r.cell) == 2 for r in rows)
    assert all(0 <= c < 4 for r in rows for c in r.cell)
    # a centroid's own vector must rank its cell first
    own = {r.vec_id: r.cell[0] for r in rows if r.vec_id < 4}
    assert own == {i: i for i in range(4)}


def test_ivf_recall_vs_brute_force(spark):
    """IVF with nprobe=2 of 8 cells must recover a solid fraction of the
    true top-3 (structure check, not a tight bound)."""
    from lakehouse_benchmark_ingestion_spark.operators.similarity import (
        brute_force_topk,
        ivf_ann_topk,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    probes = e.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(e, probes, k=3).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_ann_topk(e, probes, k=3, n_centroids=8, nprobe=2).collect()
    }
    assert truth  # sanity
    recall = len(truth & approx) / len(truth)
    assert recall >= 0.3, f"IVF recall collapsed: {recall}"
    # every approximate neighbor must be a real corpus row, never self
    assert all(q != n for q, n in approx)


def test_kmeans_centroids_improve_quantization(spark):
    from lakehouse_benchmark_ingestion_spark.operators.similarity import (
        ivf_ann_topk,
        kmeans_centroids,
        quantization_error,
    )

    e = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    init = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in e.select("vec_id", "embedding").orderBy("vec_id").limit(8).collect()
    ]
    trained = kmeans_centroids(e, k=8, iters=3)
    assert len(trained) == 8 and all(len(v) == 64 for _c, v in trained)
    err0 = quantization_error(e, init)
    err3 = quantization_error(e, trained)
    assert err3 <= err0 + 1e-9, f"kmeans must not worsen the objective ({err0} -> {err3})"

    # the trained quantizer plugs into the same IVF plan
    probes = e.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    out = ivf_ann_topk(e, probes, k=3, centroid_mode="kmeans", kmeans_iters=2)
    per_probe = out.groupBy("query_id").count().collect()
    assert per_probe and all(r["count"] == 3 for r in per_probe)


def test_changelog_pairs_update_images(spark, sequences_table):
    """All four Debezium change types from one delta: an update (same key,
    changed row), a pure insert, and a pure delete."""
    from lakehouse_benchmark_ingestion_spark.operators.changes import (
        snapshot_changelog,
    )
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df

    tbl = sequences_table
    base = tbl.current_snapshot().snapshot_id
    df = tokens_df(spark, SF_SMOKE)

    # update one key via MERGE-shaped COW, insert a new key, delete a key
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    upd = (
        df.filter(F.col("doc_id") == "1")
        .withColumn("source", F.lit("updated_src"))
        .unionByName(
            df.filter(F.col("doc_id") == "2").withColumn(
                "doc_id", F.lit("brand-new")
            )
        )
        .withColumn("_seq", F.lit(1).cast("long"))
    )
    merge_into(spark, tbl, upd)
    delete_where(spark, tbl, {"doc_id": "3"})
    head = tbl.current_snapshot().snapshot_id

    log = snapshot_changelog(spark, tbl, base, head)
    by_type = {
        r["change_type"]: r["cnt"]
        for r in log.groupBy("change_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert by_type == {
        "update_after": 1,
        "update_before": 1,
        "insert": 1,
        "delete": 1,
    }, by_type
    images = {
        r["change_type"]: r["source"]
        for r in log.filter(F.col("doc_id") == "1").collect()
    }
    assert images["update_after"] == "updated_src"
    assert images["update_before"] != "updated_src"
    # compaction-only delta -> empty changelog
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    compact(spark, tbl, target_file_size=4 << 20)
    assert (
        snapshot_changelog(
            spark, tbl, head, tbl.current_snapshot().snapshot_id
        ).count()
        == 0
    )


def test_semdedup_keep_policy(spark):
    """Hand-computed SemDeDup case: two cells, every above-threshold pair
    drops its closer-to-centroid side, so only the cell-edge examples
    survive (the paper's keep-lowest-centroid-similarity policy)."""
    from lakehouse_benchmark_ingestion_spark.operators.similarity import semdedup

    pad = [0.0] * 62  # engine vectors are 64-dim (flat codegen dot)
    rows = [
        (10, [1.0, 0.0] + pad),   # cell 0, ccos 1.0
        (11, [0.9, 0.1] + pad),   # cell 0, ccos ~0.9939
        (12, [0.0, 1.0] + pad),   # cell 1, ccos 1.0
        (13, [0.6, 0.8] + pad),   # cell 1, ccos 0.8
        (14, [1.0, 1.0] + pad),   # centroid-cos tie 0.7071 -> smaller cid -> cell 0
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [(0, [1.0, 0.0] + pad), (1, [0.0, 1.0] + pad)]
    out = {
        r.vec_id: (r.cell, r.kept)
        for r in semdedup(df, "vec_id", "embedding", centroids=cents, tau=0.4).collect()
    }
    assert {i: c for i, (c, _) in out.items()} == {10: 0, 11: 0, 12: 1, 13: 1, 14: 0}
    # cell 0 all-pairs above tau -> only the farthest-from-centroid (14) kept;
    # cell 1 pair (12,13) drops the centroid-closer 12
    assert {i for i, (_, k) in out.items() if k == 1} == {13, 14}


def test_semdedup_no_pairs_keeps_everything(spark):
    from lakehouse_benchmark_ingestion_spark.operators.similarity import semdedup

    pad = [0.0] * 62
    rows = [(0, [1.0, 0.0] + pad), (1, [0.0, 1.0] + pad)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup(df, "vec_id", "embedding", n_centroids=2, tau=0.99).collect()
    assert sorted((r.vec_id, r.kept) for r in out) == [(0, 1), (1, 1)]
