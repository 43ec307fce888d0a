"""Regression tests for the round-3 self-review findings:

1. COW delete/update must validate-no-new-deletes (a concurrent MOR delete
   committing mid-rewrite would otherwise resurrect its rows through the
   rewritten files — same race class the compaction guard covers).
2. Enabling row lineage mid-life on a table with outstanding eq-deletes
   must not brick maintenance: compaction falls back to the plain rewrite
   (materializing the deletes, assigning first ids) when no file carries
   ids yet.
3. The mor-delete collateral-safety check must look at DELETE-APPLIED
   visibility: a row already invisible via an eq-delete is not collateral.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite.table import ROW_LINEAGE_PROP
from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
    delete_where,
    update_where,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


@pytest.fixture()
def tbl(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    t = Catalog(warehouse).create_table("rf", df.schema)
    t.append(df, num_files=4)
    return t


def _inject_concurrent_dv_delete(spark, t, where):
    """Monkeypatch-style race: the first replace_files call lands AFTER a
    concurrent DV delete commits, exactly the mid-rewrite window."""
    orig = t.replace_files
    state = {"fired": False}

    def racy(*a, **k):
        if not state["fired"]:
            state["fired"] = True
            delete_where(spark, t, where, strategy="dv")
        return orig(*a, **k)

    t.replace_files = racy
    return state


def test_cow_delete_replans_around_concurrent_mor_delete(spark, tbl):
    t = tbl
    df = tokens_df(spark, SF_SMOKE)
    # concurrent delete kills n_tok >= 120 while we COW-delete n_tok <= 30
    state = _inject_concurrent_dv_delete(spark, t, {"n_tok": (120, None)})
    delete_where(spark, t, {"n_tok": (None, 30)}, strategy="cow")
    assert state["fired"], "the race must have fired"
    got = {r.doc_id for r in t.scan(spark).collect()}
    want = {
        r.doc_id
        for r in df.filter((F.col("n_tok") > 30) & (F.col("n_tok") < 120)).collect()
    }
    assert got == want, "concurrently-deleted rows must NOT resurrect"


def test_cow_update_replans_around_concurrent_mor_delete(spark, tbl):
    t = tbl
    df = tokens_df(spark, SF_SMOKE)
    state = _inject_concurrent_dv_delete(spark, t, {"n_tok": (120, None)})
    update_where(
        spark, t, {"n_tok": (None, 30)}, {"source": "'upd'"}, strategy="cow"
    )
    assert state["fired"]
    got = {r.doc_id for r in t.scan(spark).collect()}
    want = {r.doc_id for r in df.filter(F.col("n_tok") < 120).collect()}
    assert got == want, "concurrently-deleted rows must NOT resurrect"
    n_upd = t.scan(spark).filter(F.col("source") == "upd").count()
    assert n_upd == df.filter(F.col("n_tok") <= 30).count()


def test_midlife_lineage_enable_with_eq_deletes_unbricks(spark, tbl):
    """eq-deletes predate row-lineage.enabled and no file carries ids yet:
    compact() must fall back to the plain delete-applied rewrite — the
    outputs materialize the deletes and receive their FIRST row ids."""
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import (
        merge_into,
    )

    t = tbl
    df = tokens_df(spark, SF_SMOKE)
    upd = df.limit(20).withColumn("source", F.lit("upd")).withColumn(
        "_seq", F.lit(1).cast("long")
    )
    merge_into(spark, t, upd, key="doc_id", seq_col="_seq", strategy="mor")
    assert t.delete_files(), "precondition: outstanding eq-deletes"
    t.set_properties({ROW_LINEAGE_PROP: "true"})
    res = compact(spark, t, target_file_size=1 << 30)
    assert res.get("files_out", 0) >= 1
    assert not t.delete_files(), "compaction materialized the eq-deletes"
    rows = t.scan_lineage(spark).collect()
    n = len(rows)
    assert n == df.count()
    ids = sorted(r["_row_id"] for r in rows)
    assert ids == list(range(n)), "first ids assigned by the fallback rewrite"


def test_collateral_check_ignores_already_deleted_rows(spark, warehouse):
    docs = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "c")], "k long, src string"
    )
    t = Catalog(warehouse).create_table("coll", docs.schema)
    t.append(docs)
    # kill (1,'a') and (2,'a') via eq-delete on their keys
    delete_where(spark, t, {"src": "a"}, strategy="mor", key="k")
    assert {r.k for r in t.scan(spark, merge_key="k").collect()} == {3}
    # re-insert k=1 with src='b'; deleting src='b' previously false-tripped
    # on the DEAD (1,'a') image sharing the matched key
    t.append(spark.createDataFrame([(1, "b")], "k long, src string"))
    res = delete_where(spark, t, {"src": "b"}, strategy="mor", key="k")
    assert res["deleted_keys"] == 1
    assert {r.k for r in t.scan(spark, merge_key="k").collect()} == {3}
