"""asof_join / range_join: semantics vs a naive theta-join reference, and
plan-shape guards (the whole point of both operators is avoiding the
BroadcastNestedLoopJoin Catalyst picks for inequality conditions)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.operators.temporal import asof_join, range_join


def _plan(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def _mk(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_asof_join_matches_naive(spark):
    left = _mk(
        spark,
        [(1, 10, 100), (2, 10, 205), (3, 10, 50), (4, 20, 100), (5, 30, 10)],
        ["lid", "k", "t"],
    )
    right = _mk(
        spark,
        [(101, 10, 100), (102, 10, 200), (103, 20, 99), (104, 20, 100), (105, 40, 1)],
        ["rid", "k", "t"],
    )
    got = {
        r.lid: r.a_rid
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t", payload=["rid"], prefix="a_"
        ).collect()
    }
    # naive: max-t right row with rt <= lt per left row
    naive = {}
    rrows = right.collect()
    for lrow in left.collect():
        cand = [r for r in rrows if r.k == lrow.k and r.t <= lrow.t]
        naive[lrow.lid] = max(cand, key=lambda r: (r.t, r.rid)).rid if cand else None
    assert got == naive
    # equal-ts right row IS visible; no-match rows present with null
    assert got[1] == 101 and got[5] is None


def test_asof_join_plan_has_no_join_node(spark):
    left = _mk(spark, [(1, 1, 1)], ["lid", "k", "t"])
    right = _mk(spark, [(9, 1, 1)], ["rid", "k", "t"])
    plan = _plan(
        asof_join(left, right, on="k", left_ts="t", right_ts="t", payload=["rid"])
    )
    for node in ("NestedLoopJoin", "CartesianProduct", "SortMergeJoin", "ShuffledHashJoin"):
        assert node not in plan, node
    assert "Window" in plan


def test_range_join_matches_naive_and_plan(spark):
    probes = _mk(spark, [(i, i * 7 % 100) for i in range(40)], ["pid", "x"])
    intervals = _mk(
        spark, [(k, k * 20, k * 20 + 12) for k in range(5)], ["iid", "lo", "hi"]
    )
    j = range_join(
        probes,
        intervals,
        probe_key=F.col("x"),
        interval_lo=F.col("lo"),
        interval_hi=F.col("hi"),
        bucket_width=20,
    )
    got = sorted((r.pid, r.iid) for r in j.collect())
    naive = sorted(
        (p.pid, iv.iid)
        for p in probes.collect()
        for iv in intervals.collect()
        if iv.lo <= p.x <= iv.hi
    )
    assert got == naive and len(got) > 0
    plan = _plan(j)
    assert "NestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_range_join_interval_spanning_buckets(spark):
    # an interval longer than one bucket must still catch probes in every
    # bucket it overlaps (explode covers all spanned buckets)
    probes = _mk(spark, [(1, 5), (2, 25), (3, 45), (4, 75)], ["pid", "x"])
    intervals = _mk(spark, [(0, 0, 50)], ["iid", "lo", "hi"])
    j = range_join(
        probes, intervals,
        probe_key=F.col("x"), interval_lo=F.col("lo"), interval_hi=F.col("hi"),
        bucket_width=20,
    )
    assert sorted(r.pid for r in j.collect()) == [1, 2, 3]
