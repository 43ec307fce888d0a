"""Persisted IVF ANN index (operators/ann_index.py).

Contract under test:
  - build + incremental refresh answers IDENTICALLY to the one-shot
    ivf_ann_topk over the full corpus with the same quantizer;
  - refresh assigns against the PINNED centroids and never rewrites
    existing index files;
  - search opens only the files of probed cells (identity(cell) hidden
    partitioning prunes at the manifest level);
  - compaction of the index table preserves the per-cell layout and
    search answers are unchanged.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.operators.ann_index import (
    ann_index_topk,
    build_ann_index,
    load_centroids,
    refresh_ann_index,
)
from lakehouse_benchmark_ingestion_spark.operators.similarity import (
    FLAT_DIM,
    ivf_ann_topk,
)

N_CELLS = 4
DIM = FLAT_DIM  # similarity's flat-dot kernels are fixed to this width


def _vecs(spark, n=32):
    """ids 0..3 are unit axes (the id-sample centroids); later vectors sit
    near the axis of (id % 4) with a small deterministic wobble."""
    rows = []
    for i in range(n):
        axis = i % N_CELLS
        v = [0.05 * ((i * 7 + j) % 5) for j in range(DIM)]
        v[axis] += 1.0
        nrm = math.sqrt(sum(x * x for x in v))
        rows.append((i, [x / nrm for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _probes(vecs):
    return vecs.filter(F.col("vec_id") % 8 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )


def _rows(df):
    return {
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rk"])
        for r in df.collect()
    }


def test_build_refresh_matches_one_shot(spark, tmp_path):
    vecs = _vecs(spark)
    first = vecs.filter(F.col("vec_id") < 16)  # contains centroid ids 0..3
    rest = vecs.filter(F.col("vec_id") >= 16)

    tbl = build_ann_index(spark, first, str(tmp_path / "wh"), n_cells=N_CELLS)
    files_before = {f.path for f in tbl.data_files()}
    refresh_ann_index(spark, tbl, rest)
    assert files_before <= {f.path for f in tbl.data_files()}

    got, metrics = ann_index_topk(spark, tbl, _probes(vecs), k=3, nprobe=2)
    want = ivf_ann_topk(
        vecs, _probes(vecs), k=3, n_centroids=N_CELLS, nprobe=2
    ).select("query_id", "neighbor_id", "cosine", "rk")
    assert _rows(got) == _rows(want)
    assert metrics["files_total"] > 0


def test_search_prunes_to_probed_cells(spark, tmp_path):
    vecs = _vecs(spark, n=64)
    tbl = build_ann_index(spark, vecs, str(tmp_path / "wh"), n_cells=N_CELLS)
    # one probe on axis 0 with nprobe=1 → exactly one cell's files open
    probe = vecs.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got, metrics = ann_index_topk(spark, tbl, probe, k=5, nprobe=1)
    assert metrics["cells_probed"] == 1
    assert metrics["files_scanned"] < metrics["files_total"], metrics
    # every neighbor really lives on the probed axis (cell 0 = ids % 4 == 0)
    neighbors = {r["neighbor_id"] for r in got.collect()}
    assert neighbors and all(n % N_CELLS == 0 for n in neighbors)


def test_centroids_pinned_across_refresh(spark, tmp_path):
    vecs = _vecs(spark)
    tbl = build_ann_index(
        spark, vecs.filter(F.col("vec_id") < 16), str(tmp_path / "wh"),
        n_cells=N_CELLS,
    )
    before = load_centroids(tbl)
    refresh_ann_index(spark, tbl, vecs.filter(F.col("vec_id") >= 16))
    assert load_centroids(tbl) == before


def test_compaction_preserves_answers(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    vecs = _vecs(spark, n=48)
    tbl = build_ann_index(
        spark, vecs.filter(F.col("vec_id") < 16), str(tmp_path / "wh"),
        n_cells=N_CELLS,
    )
    refresh_ann_index(spark, tbl, vecs.filter(F.col("vec_id") >= 16))
    probes = _probes(vecs)
    before, _ = ann_index_topk(spark, tbl, probes, k=3, nprobe=2)
    before_rows = _rows(before)
    compact(spark, tbl, target_file_size=4 << 20)
    # partition-preserving: every file still belongs to exactly one cell
    import json

    for f in tbl.data_files():
        assert set(json.loads(f.partition_json)) == {"cell"}
    after, _ = ann_index_topk(spark, tbl, probes, k=3, nprobe=2)
    assert _rows(after) == before_rows


# ---- CDC-driven sync against an icelite base table ------------------------


def _base_vectors(spark, warehouse, n=32):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog

    df = _vecs(spark, n)
    tbl = Catalog(warehouse).create_table("vectors", df.schema)
    tbl.append(df, num_files=2)
    return tbl, df


def test_ann_sync_applies_appends_and_deletes(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.operators.ann_index import (
        register_ann_index,
        sync_ann_index,
    )
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    base, _ = _base_vectors(spark, str(tmp_path / "base"), n=24)
    idx = register_ann_index(
        spark, base, str(tmp_path / "idx"), n_cells=N_CELLS
    )
    before = load_centroids(idx)

    # base evolves: append 8 new vectors, delete vec 5
    more = _vecs(spark, 32).filter(F.col("vec_id") >= 24)
    base.append(more)
    delete_where(spark, base, {"vec_id": 5}, strategy="cow", key="vec_id")

    r = sync_ann_index(spark, base, idx)
    assert r["synced"] and r["deleted_keys"] == 1
    assert load_centroids(idx) == before  # quantizer pinned

    # the index now answers like a fresh one-shot over the live base
    vecs_live = base.scan(spark)
    probes = vecs_live.filter(F.col("vec_id") % 8 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    got, _ = ann_index_topk(spark, idx, probes, k=3, nprobe=2)
    want = ivf_ann_topk(
        vecs_live, probes, k=3, n_centroids=N_CELLS, nprobe=2
    ).select("query_id", "neighbor_id", "cosine", "rk")
    assert _rows(got) == _rows(want)
    assert 5 not in {r["neighbor_id"] for r in got.collect()}

    # idempotent
    assert not sync_ann_index(spark, base, idx)["synced"]


def test_large_k_index_build_and_search(spark, tmp_path):
    """K past CENTROID_LITERAL_MAX: assignment (build, refresh) and probe
    routing must switch to the broadcast-matrix pandas path transparently —
    the persisted quantizer is the engine's largest K consumer. 300 cells
    over a small corpus: many cells stay empty (fine), answers must still
    equal brute-force cosine over the visited cells' contract, and refresh
    must keep the quantizer pinned."""
    from lakehouse_benchmark_ingestion_spark.operators import similarity as sim

    assert 300 > sim.CENTROID_LITERAL_MAX
    vecs = _vecs(spark, 64)
    idx = build_ann_index(
        spark, vecs, str(tmp_path / "bigk"), n_cells=300,
        centroid_mode="id-sample",
    )
    assert len(load_centroids(idx)) <= 300  # id-sample caps at corpus ids
    before = load_centroids(idx)

    probes = _probes(vecs)
    got, metrics = ann_index_topk(spark, idx, probes, k=3, nprobe=2)
    assert metrics["files_scanned"] <= metrics["files_total"]
    want = ivf_ann_topk(
        vecs, probes, k=3, n_centroids=300, nprobe=2
    ).select("query_id", "neighbor_id", "cosine", "rk")
    assert _rows(got) == _rows(want)

    extra = spark.createDataFrame(
        [(1000, [1.0] + [0.0] * (DIM - 1))], "vec_id long, embedding array<double>"
    )
    refresh_ann_index(spark, idx, extra)
    assert load_centroids(idx) == before  # quantizer pinned through large-K refresh


def test_nondeterministic_probes_single_evaluation(spark, tmp_path):
    """The probes plan feeds BOTH the pruned-cell collect and the search
    join; a non-deterministic probes DataFrame (sample, unordered limit,
    rand-derived) must not diverge between the two. The fix collects the
    probe rows once and rebuilds the join side from the collected values —
    pinned here by a UDF that drops a marker file per evaluated probe row
    (accumulators are unreliable under CollectLimit plans): exactly one
    pass over the probe rows, and completeness of the answers for a
    rand-ordered probe subset."""
    import os
    import uuid

    vecs = _vecs(spark, n=64)
    tbl = build_ann_index(spark, vecs, str(tmp_path / "wh"), n_cells=N_CELLS)

    marker_dir = str(tmp_path / "evals")
    os.makedirs(marker_dir)

    @F.udf("long")
    def counted(qid):
        open(os.path.join(marker_dir, uuid.uuid4().hex), "w").close()
        return qid

    n_probes = 3
    probes = (
        _probes(vecs)
        .orderBy(F.rand())           # non-deterministic plan
        .limit(n_probes)
        .withColumn("query_id", counted(F.col("query_id")))
    )
    got, _ = ann_index_topk(spark, tbl, probes, k=3, nprobe=2)
    rows = got.collect()
    evals = len(os.listdir(marker_dir))
    assert evals == n_probes, (
        f"probes plan evaluated {evals / n_probes:g} times - the pruning "
        "set and the join must come from ONE evaluation"
    )
    # completeness: whatever subset was drawn, every drawn query answers
    # with a full k - a diverged pruning set would starve some of them
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert len(by_q) == n_probes
    assert all(len(v) == 3 for v in by_q.values()), by_q
