"""Optimistic-concurrency commits under REAL thread contention.

metadata.commit claims version v+1 with an exclusive create and retries
mutate() against the new base on loss (`icelite/metadata.py:150`). The
existing unit test simulates one lost race; this exercises genuinely
concurrent writers racing the same table and proves linearizable append
history: every commit lands, no snapshot is lost, all rows survive.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


def test_concurrent_appends_all_land(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE).persist()
    df.count()
    cat = Catalog(warehouse)
    tbl = cat.create_table("race", df.schema)

    N_WRITERS, APPENDS_EACH = 4, 3

    def writer(w: int) -> int:
        ok = 0
        for j in range(APPENDS_EACH):
            part = df.filter(
                (F.col("doc_id").cast("long") % (N_WRITERS * APPENDS_EACH))
                == (w * APPENDS_EACH + j)
            )
            tbl.append(part, num_files=1)
            ok += 1
        return ok

    with ThreadPoolExecutor(max_workers=N_WRITERS) as pool:
        results = list(pool.map(writer, range(N_WRITERS)))
    df.unpersist()
    assert results == [APPENDS_EACH] * N_WRITERS

    # every commit is a snapshot; the chain is a single linear history
    snaps = tbl.history()
    assert len(snaps) == N_WRITERS * APPENDS_EACH
    parent_ids = [s.parent_id for s in snaps]
    chain_ids = [s.snapshot_id for s in snaps]
    assert parent_ids[0] is None
    assert parent_ids[1:] == chain_ids[:-1]  # each child points at the prior head

    # no rows lost, no rows duplicated
    expected = df.filter(
        F.col("doc_id").cast("long") % (N_WRITERS * APPENDS_EACH)
        < N_WRITERS * APPENDS_EACH
    ).count()
    got = tbl.scan(spark)
    assert got.count() == expected
    assert got.select("doc_id").distinct().count() == expected


def test_current_version_probes_past_stale_hint(spark, warehouse):
    """version-hint.text is a HINT (HadoopTableOperations semantics): the
    atomic commit point is the v{N+1}.metadata.json create, and the hint
    update can lag behind it. A reader trusting a stale hint livelocks the
    optimistic retry loop (it re-claims the same version forever), so
    current_version must probe forward past the hint."""
    import json

    from lakehouse_benchmark_ingestion_spark.icelite import metadata as md
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df as _t

    df = _t(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("stale", df.schema)
    tbl.append(df.limit(5), num_files=1)  # v2, hint=2
    loc = tbl.location
    v = md.current_version(loc)

    # simulate a winner that created v{v+1} but crashed before the hint write
    with open(md._metadata_path(loc, v), encoding="utf-8") as f:
        doc = json.load(f)
    with open(md._metadata_path(loc, v + 1), "x", encoding="utf-8") as f:
        json.dump(doc, f)

    assert md.current_version(loc) == v + 1  # probe sees past the stale hint

    # and the next commit claims v+2, not a livelocked v+1
    tbl2 = Catalog(warehouse).load_table("stale")
    tbl2.append(df.limit(3), num_files=1)
    assert md.current_version(loc) == v + 2
