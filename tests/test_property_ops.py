"""Property-based checks (hypothesis) for the composable operators whose
correctness is a law, not an example: as-of join, banded range join,
sequence packing, and connected-components cluster resolution. Each Spark
result is compared against a straightforward Python reference on randomized
small inputs. max_examples is kept low — each example is a Spark round
trip — but every example exercises the full distributed code path."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SET = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.integers(min_value=0, max_value=3)
times = st.integers(min_value=0, max_value=50)


@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=12),
    right=st.lists(st.tuples(keys, times), min_size=0, max_size=12),
)
@SET
def test_asof_join_law(spark, left, right):
    from lakehouse_benchmark_ingestion_spark.operators.temporal import asof_join

    # unique right (k, t) so the as-of match is well-defined
    right = list({(k, t): None for k, t in right}.keys())
    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], ["lid", "k", "t"]
    )
    if right:
        rdf = spark.createDataFrame(
            [(100 + i, k, t) for i, (k, t) in enumerate(right)], ["rid", "k", "t"]
        )
    else:
        rdf = ldf.select(
            F.col("lid").alias("rid"), "k", "t"
        ).limit(0)
    got = {
        r.lid: r.a_rid
        for r in asof_join(
            ldf, rdf, on="k", left_ts="t", right_ts="t", payload=["rid"], prefix="a_"
        ).collect()
    }
    rrows = [(100 + i, k, t) for i, (k, t) in enumerate(right)]
    for i, (k, t) in enumerate(left):
        cand = [(rid, rt) for rid, rk, rt in rrows if rk == k and rt <= t]
        want = max(cand, key=lambda x: (x[1], x[0]))[0] if cand else None
        assert got[i] == want, (i, k, t)


@given(
    probes=st.lists(st.integers(min_value=0, max_value=100), min_size=1, max_size=15),
    ivs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100), st.integers(min_value=0, max_value=9)
        ),
        min_size=1,
        max_size=8,
    ),
)
@SET
def test_range_join_law(spark, probes, ivs):
    from lakehouse_benchmark_ingestion_spark.operators.temporal import range_join

    pdf = spark.createDataFrame(list(enumerate(probes)), ["pid", "x"])
    idf = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(ivs)], ["iid", "lo", "hi"]
    )
    got = sorted(
        (r.pid, r.iid)
        for r in range_join(
            pdf, idf,
            probe_key=F.col("x"), interval_lo=F.col("lo"), interval_hi=F.col("hi"),
            bucket_width=10,  # >= max interval length (9)
        ).collect()
    )
    want = sorted(
        (pid, i)
        for pid, x in enumerate(probes)
        for i, (lo, ln) in enumerate(ivs)
        if lo <= x <= lo + ln
    )
    assert got == want


@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(min_value=1, max_value=40)),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_packing_law(spark, docs):
    from lakehouse_benchmark_ingestion_spark.operators.packing import assign_packs

    ctx = 16
    df = spark.createDataFrame(
        [(i, src, nt) for i, (src, nt) in enumerate(docs)], ["doc_id", "source", "n_tok"]
    )
    rows = assign_packs(df, ctx).collect()
    # law 1: pack_id is the window containing the doc's first token
    for r in rows:
        assert r.pack_id == r.pack_offset // ctx
    # law 2: offsets are the exclusive prefix sums per stream in doc_id order
    by_stream: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r.stream, r.doc_id)):
        by_stream.setdefault(r.stream, []).append(r)
    for stream, rs in by_stream.items():
        cum = 0
        for r in rs:
            assert r.pack_offset == cum, (stream, r)
            cum += r.n_tok


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9), st.integers(min_value=0, max_value=9)
        ),
        min_size=1,
        max_size=15,
    )
)
@SET
def test_duplicate_clusters_law(spark, edges):
    from lakehouse_benchmark_ingestion_spark.operators.dedup import duplicate_clusters

    edges = [(str(a), str(b)) for a, b in edges]
    pairs = spark.createDataFrame(edges, ["a_id", "b_id"])
    got = {r.doc_id: r.cluster_id for r in duplicate_clusters(pairs).collect()}

    # union-find reference
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent[find(a)] = find(b)
    comps: dict[str, list[str]] = {}
    for n in parent:
        comps.setdefault(find(n), []).append(n)
    want = {n: min(ns) for ns in comps.values() for n in ns}
    assert got == want


def test_metadata_history_and_manifests_tables(spark, warehouse):
    """`history` flags rollback-orphaned snapshots non-ancestor; `manifests`
    aggregates entry counts from footer summaries."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mdt", df.schema)
    tbl.append(df, num_files=2)
    s1 = tbl.current_snapshot().snapshot_id
    tbl.append(df.limit(0), num_files=1)
    tbl.rollback(s1)
    hist = {
        r["snapshot_id"]: r["is_current_ancestor"]
        for r in tbl.metadata_df(spark, "history").collect()
    }
    assert hist[s1] is True and False in hist.values()
    man = tbl.metadata_df(spark, "manifests").collect()
    assert sum(r["n_data_files"] for r in man) == len(tbl.data_files())
    assert sum(r["record_count"] for r in man) == df.count()
    assert all(r["summary_json"] for r in man)
