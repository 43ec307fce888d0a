"""Large-K centroid assignment: the broadcast-matrix pandas path.

SemDeDup's "K proportional to corpus size" contract implies K ~ 1e5 cells
at 1e12 rows; an inlined-literal ranking expression grows the Catalyst
projection tree O(K*dim) and plan compilation explodes long before
execution. Above CENTROID_LITERAL_MAX the ranking must switch to ONE
vectorized pandas UDF over a broadcast numpy matrix — these tests pin
(a) result equality between the two physical strategies at a forced
K > 256 and (b) that the large-K plan really is the O(1)-size Arrow one.
"""

from __future__ import annotations

import pytest

from lakehouse_benchmark_ingestion_spark.operators import similarity as sim

K = 300  # > CENTROID_LITERAL_MAX -> pandas path by default
DIM = 8


def _vectors(spark, n=40):
    # deterministic, irrational-ish components so cosines sit nowhere near
    # a 6-decimal rounding boundary
    rows = []
    for i in range(n):
        v = [((i * 37 + j * 101) % 97) / 97.0 + 0.01 for j in range(DIM)]
        rows.append((i, v))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _centroids(k=K):
    return [
        (c, [((c * 13 + j * 7) % 89) / 89.0 + 0.02 for j in range(DIM)])
        for c in range(k)
    ]


def test_large_k_matches_literal_path(spark, monkeypatch):
    df = _vectors(spark)
    cents = _centroids()

    got = sim.ivf_cells(df, cents, "embedding", n_cells=3).collect()
    # force the literal path at the same K (plan is huge but correct)
    monkeypatch.setattr(sim, "CENTROID_LITERAL_MAX", 10**9)
    want = sim.ivf_cells(df, cents, "embedding", n_cells=3).collect()

    by_id = {r["vec_id"]: r["cell"] for r in got}
    for r in want:
        assert by_id[r["vec_id"]] == r["cell"], (
            f"vec {r['vec_id']}: pandas path {by_id[r['vec_id']]} != "
            f"literal path {r['cell']}"
        )


def test_large_k_plan_is_arrow_not_literal(spark):
    df = _vectors(spark, n=4)
    big = sim.ivf_cells(df, _centroids(K), "embedding", n_cells=1)
    small = sim.ivf_cells(df, _centroids(8), "embedding", n_cells=1)
    big_plan = big._jdf.queryExecution().executedPlan().toString()
    small_plan = small._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in big_plan, "large K must use the pandas path"
    assert "ArrowEvalPython" not in small_plan, (
        "small K must stay on the zero-Python literal path"
    )
    # the whole point: plan size no longer grows with K
    assert len(big_plan) < len(small_plan) * 4


def test_large_k_rank_carries_cosine_for_semdedup(spark):
    """semdedup reads element 1's cosine from the ranked array — the pandas
    path must produce the same (c, nid) struct contract."""
    df = _vectors(spark, n=10)
    cents = _centroids()
    from pyspark.sql import functions as F

    r0 = (
        df.select(
            "vec_id",
            F.element_at(
                sim._centroid_rank_array("embedding", cents), 1
            ).alias("r0"),
        )
        .collect()
    )
    for row in r0:
        assert row["r0"]["nid"] is not None
        assert -1.0 <= row["r0"]["c"] <= 1.0
        # best-first: cell id recoverable as -nid within range
        assert 0 <= -row["r0"]["nid"] < K


def test_quantization_error_large_k(spark):
    df = _vectors(spark, n=10)
    err = sim.quantization_error(df, _centroids(), vec_col="embedding")
    assert 0.0 <= err < 1.0


@pytest.mark.parametrize("n_cells", [1, 2])
def test_kmeans_through_large_k_threshold(spark, monkeypatch, n_cells):
    """ivf_cells consumers (kmeans assignment, ann_index._assigned) cross
    the threshold transparently: same nearest cell either way."""
    df = _vectors(spark, n=12)
    cents = _centroids(260)  # just past the threshold
    got = {
        r["vec_id"]: r["cell"]
        for r in sim.ivf_cells(df, cents, "embedding", n_cells=n_cells).collect()
    }
    monkeypatch.setattr(sim, "CENTROID_LITERAL_MAX", 10**9)
    want = {
        r["vec_id"]: r["cell"]
        for r in sim.ivf_cells(df, cents, "embedding", n_cells=n_cells).collect()
    }
    assert got == want


def test_large_k_null_and_empty_batches(spark):
    """Null vectors mirror the literal path (null ranked array), and empty
    partitions (empty Arrow batches) must not crash the kernel."""
    from pyspark.sql import functions as F

    rows = [(0, [0.5] * DIM), (1, None), (2, [0.25] * DIM)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).repartition(8)  # more partitions than rows -> some empty batches
    out = (
        df.select(
            "vec_id",
            sim._centroid_rank_array("embedding", _centroids()).alias("r"),
        )
        .collect()
    )
    by_id = {r["vec_id"]: r["r"] for r in out}
    assert by_id[1] is None
    assert by_id[0] is not None and len(by_id[0]) == K


def test_zero_vector_assignment_agrees_across_threshold(spark, monkeypatch):
    """A zero-norm vector's cosines are 0/0 = NaN; both physical paths must
    map them to -inf BEFORE ranking so the assigned cell is identical on
    either side of CENTROID_LITERAL_MAX (raw NaN sorts FIRST in Spark's
    sort_array but LAST under np.lexsort)."""
    from pyspark.sql import functions as F

    rows = [(0, [0.0] * DIM), (1, [0.3] * DIM)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = _centroids(260)

    got = {
        r["vec_id"]: (r["cell"], r["r0c"])
        for r in sim.ivf_cells(df, cents, "embedding", n_cells=1)
        .withColumn(
            "r0c",
            F.element_at(
                sim._centroid_rank_array("embedding", cents, top_n=1), 1
            )["c"],
        )
        .collect()
    }
    monkeypatch.setattr(sim, "CENTROID_LITERAL_MAX", 10**9)
    want = {
        r["vec_id"]: (r["cell"], r["r0c"])
        for r in sim.ivf_cells(df, cents, "embedding", n_cells=1)
        .withColumn(
            "r0c",
            F.element_at(
                sim._centroid_rank_array("embedding", cents, top_n=1), 1
            )["c"],
        )
        .collect()
    }
    assert got == want, (got, want)
    # the -inf sentinel (not NaN) is the struct value on both paths
    assert got[0][1] == float("-inf")
    assert got[0][0] == [0]  # all ties -> lowest cid wins deterministically


def test_top_n_prefix_equals_full_ranking(spark):
    """top_n must emit exactly the first n entries of the full ranking —
    including boundary ties, which argpartition alone would cut
    arbitrarily (centroid pairs here share identical vectors, so rounded
    cosines tie in bulk)."""
    from pyspark.sql import functions as F

    df = _vectors(spark, n=12)
    base = _centroids(150)
    # duplicate every centroid vector under a second cid: guaranteed ties
    cents = [(c, v) for c, v in base] + [
        (c + 150, list(v)) for c, v in base
    ]
    assert len(cents) > sim.CENTROID_LITERAL_MAX
    full = (
        df.select(
            "vec_id",
            sim._centroid_rank_array("embedding", cents).alias("r"),
        )
        .collect()
    )
    pref = (
        df.select(
            "vec_id",
            sim._centroid_rank_array("embedding", cents, top_n=5).alias("r"),
        )
        .collect()
    )
    full_by = {r["vec_id"]: r["r"] for r in full}
    for r in pref:
        assert len(r["r"]) == 5
        assert [tuple(x) for x in r["r"]] == [
            tuple(x) for x in full_by[r["vec_id"]][:5]
        ]
