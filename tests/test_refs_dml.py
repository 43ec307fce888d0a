"""Named refs (tags/branches, WAP, time travel) and row-level DML
(DELETE WHERE / UPDATE WHERE, COW + MOR) over icelite tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
    delete_where,
    update_where,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


# --------------------------------------------------------------------------
# refs: tags, branches, write-audit-publish, time travel
# --------------------------------------------------------------------------

def test_tag_pins_snapshot_and_survives_expiration(spark, sequences_table):
    from lakehouse_benchmark_ingestion_spark.operators.expire_snapshots import (
        expire_snapshots,
    )

    tbl = sequences_table
    first = tbl.history()[0]
    tbl.create_tag("v1", first.snapshot_id)
    assert tbl.resolve_ref("v1") == first.snapshot_id

    # tags are immutable
    with pytest.raises(ValueError):
        tbl.create_tag("v1", tbl.current_snapshot().snapshot_id)

    # expiration protects the tagged snapshot even with keep_last=1
    res = expire_snapshots(tbl, keep_last=1, as_of_ms=10_000_000_000)
    assert first.snapshot_id not in res.get("expired_ids", [])
    n_first = tbl.scan(spark, ref="v1").count()
    assert n_first == 100  # 1 of 5 modulo slices of 500 docs

    tbl.drop_ref("v1")
    with pytest.raises(KeyError):
        tbl.resolve_ref("v1")


def test_branch_write_audit_publish(spark, sequences_table):
    tbl = sequences_table
    df = tokens_df(spark, SF_SMOKE)
    main_before = tbl.scan(spark).count()

    tbl.create_branch("audit")
    staged = df.limit(7).withColumn("doc_id", F.concat(F.lit("stage-"), "doc_id"))
    tbl.append(staged, branch="audit")

    # main readers do not see the staged append; branch readers do
    assert tbl.scan(spark).count() == main_before
    assert tbl.scan(spark, ref="audit").count() == main_before + 7

    # publish: one atomic metadata swap
    tbl.fast_forward("audit")
    assert tbl.scan(spark).count() == main_before + 7


def test_fast_forward_refuses_diverged_branch(spark, sequences_table):
    tbl = sequences_table
    df = tokens_df(spark, SF_SMOKE)
    tbl.create_branch("b")
    tbl.append(df.limit(1).withColumn("doc_id", F.lit("b-row")), branch="b")
    # main advances independently → branch no longer descends from main
    tbl.append(df.limit(1).withColumn("doc_id", F.lit("m-row")))
    with pytest.raises(ValueError, match="fast-forward"):
        tbl.fast_forward("b")


def test_scan_as_of_timestamp(spark, sequences_table):
    tbl = sequences_table
    # appends were committed at 1_000_000 + i*60_000 (conftest)
    assert tbl.scan(spark, as_of_timestamp_ms=1_000_000).count() == 100
    assert tbl.scan(spark, as_of_timestamp_ms=1_120_000).count() == 300
    assert tbl.scan(spark, as_of_timestamp_ms=9_999_999_999).count() == 500
    with pytest.raises(ValueError):
        tbl.snapshot_as_of(999_999)
    with pytest.raises(ValueError):  # exclusive selectors
        tbl.scan(spark, snapshot_id=1, ref="x")


# --------------------------------------------------------------------------
# DELETE WHERE
# --------------------------------------------------------------------------

@pytest.fixture()
def ranged_table(spark, warehouse):
    """Table whose files have DISJOINT n_tok ranges so predicate deletes can
    both drop whole files (metadata-only) and rewrite partial ones."""
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("ranged", df.schema)
    tbl.append(df.repartitionByRange(6, "n_tok"))
    return tbl


def test_delete_where_cow_counts_and_pruning(spark, ranged_table):
    tbl = ranged_table
    df = tokens_df(spark, SF_SMOKE)
    n_files = len(tbl.data_files())
    # predicate aligned with one file's actual bounds: that file must drop
    # via metadata only; range-overlapping neighbours rewrite
    first = min(tbl.data_files(), key=lambda f: f.lower_bounds["n_tok"])
    lo, hi = first.lower_bounds["n_tok"], first.upper_bounds["n_tok"]
    expected_kept = df.filter(~((F.col("n_tok") >= lo) & (F.col("n_tok") <= hi))).count()

    res = delete_where(spark, tbl, {"n_tok": (lo, hi)}, target_file_size=1 << 20)
    # disjoint ranges → most files untouched, the aligned one dropped meta-only
    assert res["files_matched"] < n_files
    assert res["files_dropped_metadata_only"] >= 1
    out = tbl.scan(spark)
    assert out.count() == expected_kept
    assert out.filter((F.col("n_tok") >= lo) & (F.col("n_tok") <= hi)).count() == 0
    # token arrays of survivors intact
    assert out.filter(F.size("tokens") != F.col("n_tok")).count() == 0


def test_delete_where_equality_on_source(spark, ranged_table):
    tbl = ranged_table
    df = tokens_df(spark, SF_SMOKE)
    some_source = df.select("source").first()[0]
    expected = df.filter(F.col("source") != some_source).count()
    delete_where(spark, tbl, {"source": some_source})
    assert tbl.scan(spark).count() == expected


def test_delete_where_mor_defers_rewrite(spark, ranged_table):
    tbl = ranged_table
    df = tokens_df(spark, SF_SMOKE)
    files_before = {f.path for f in tbl.data_files()}
    expected_kept = df.filter(~(F.col("n_tok") >= 40)).count()

    res = delete_where(spark, tbl, {"n_tok": (40, None)}, strategy="mor")
    assert res["deleted_keys"] > 0
    # no data file rewritten — only an eq-delete file added
    assert {f.path for f in tbl.data_files()} == files_before
    assert len(tbl.delete_files()) == 1
    assert tbl.scan(spark).count() == expected_kept

    # compaction materializes the delete; result unchanged
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    compact(spark, tbl, target_file_size=4 << 20)
    assert not tbl.delete_files()
    assert tbl.scan(spark).count() == expected_kept


def test_update_where_set_expressions_see_old_row(spark, ranged_table):
    tbl = ranged_table
    df = tokens_df(spark, SF_SMOKE)
    res = update_where(
        spark,
        tbl,
        {"n_tok": (30, None)},
        {"source": "concat(source, '_long')", "n_tok": "n_tok + 0"},
        target_file_size=1 << 20,
    )
    assert res["files_matched"] >= 1
    out = tbl.scan(spark)
    assert out.count() == df.count()  # update never changes cardinality
    n_expected = df.filter(F.col("n_tok") >= 30).count()
    assert out.filter(F.col("source").endswith("_long")).count() == n_expected
    # rows below the predicate untouched
    assert (
        out.filter((F.col("n_tok") < 30) & F.col("source").endswith("_long")).count()
        == 0
    )
    # snapshot isolation: pre-update snapshot still shows old values
    prev = tbl.history()[-2]
    old = tbl.scan(spark, snapshot_id=prev.snapshot_id)
    assert old.filter(F.col("source").endswith("_long")).count() == 0


def test_null_counts_harvested(spark, ranged_table):
    for f in ranged_table.data_files():
        assert f.null_counts.get("doc_id") == 0
        assert f.null_counts.get("n_tok") == 0


def test_rollback_and_metadata_tables(spark, sequences_table):
    tbl = sequences_table
    base = tbl.current_snapshot().snapshot_id
    n0 = tbl.scan(spark).count()
    extra = tbl.scan(spark).limit(3).withColumn("doc_id", F.concat(F.lit("rb-"), F.col("doc_id")))
    tbl.append(extra)
    assert tbl.scan(spark).count() == n0 + 3
    tbl.rollback(base)
    assert tbl.current_snapshot().snapshot_id == base
    assert tbl.scan(spark).count() == n0
    # rollback is reversible while the later snapshot is retained
    later = [s.snapshot_id for s in tbl.history() if s.snapshot_id != base]
    tbl.rollback(later[-1])
    assert tbl.scan(spark).count() == n0 + 3

    files = tbl.metadata_df(spark, "files")
    assert files.filter(F.col("content") == "data").count() == len(tbl.data_files())
    assert files.agg(F.sum("record_count")).collect()[0][0] >= n0
    snaps = tbl.metadata_df(spark, "snapshots")
    assert snaps.count() == len(tbl.history())
    tbl.create_tag("md-tag")
    refs = tbl.metadata_df(spark, "refs")
    assert refs.filter(F.col("name") == "md-tag").count() == 1

    import pytest as _pytest

    with _pytest.raises(KeyError):
        tbl.rollback(999999999)


# --------------------------------------------------------------------------
# merge-on-read UPDATE (pos-delete + append, one commit)
# --------------------------------------------------------------------------

def test_update_where_mor_defers_rewrite(spark, ranged_table):
    tbl = ranged_table
    df = tokens_df(spark, SF_SMOKE)
    files_before = {f.path for f in tbl.data_files()}

    res = update_where(
        spark, tbl, {"n_tok": (30, None)},
        {"source": "concat(source, '_long')"}, strategy="mor",
    )
    assert res["deleted_positions"] == res["rows_out"] > 0
    # ONLY appended: every pre-update data file still live, plus new ones
    assert files_before < {f.path for f in tbl.data_files()}
    assert len(tbl.pos_delete_files()) == 1

    out = tbl.scan(spark)
    assert out.count() == df.count()  # update never changes cardinality
    n_expected = df.filter(F.col("n_tok") >= 30).count()
    assert out.filter(F.col("source").endswith("_long")).count() == n_expected
    assert (
        out.filter((F.col("n_tok") < 30) & F.col("source").endswith("_long")).count()
        == 0
    )
    # snapshot isolation: pre-update snapshot unaffected
    prev = tbl.history()[-2]
    assert (
        tbl.scan(spark, snapshot_id=prev.snapshot_id)
        .filter(F.col("source").endswith("_long"))
        .count()
        == 0
    )

    # compaction materializes: sidecar retired, result unchanged
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact

    compact(spark, tbl, target_file_size=4 << 20)
    assert not tbl.pos_delete_files()
    assert tbl.scan(spark).filter(F.col("source").endswith("_long")).count() == n_expected


def test_update_where_mor_does_not_resurrect_deleted_rows(spark, ranged_table):
    """Rows already invisible through an eq-delete or a pos-delete must not
    come back as updated copies."""
    tbl = ranged_table
    df = tokens_df(spark, SF_SMOKE)

    # eq-delete n_tok >= 60, pos-delete n_tok in [50, 54]
    delete_where(spark, tbl, {"n_tok": (60, None)}, strategy="mor")
    delete_where(spark, tbl, {"n_tok": (50, 54)}, strategy="mor-pos")
    visible = df.filter(
        ~((F.col("n_tok") >= 60) | ((F.col("n_tok") >= 50) & (F.col("n_tok") <= 54)))
    )
    assert tbl.scan(spark).count() == visible.count()

    # MOR update overlapping BOTH deleted ranges
    update_where(
        spark, tbl, {"n_tok": (40, None)},
        {"source": "concat(source, '_u')"}, strategy="mor",
    )
    out = tbl.scan(spark)
    assert out.count() == visible.count()
    assert (
        out.filter(F.col("source").endswith("_u")).count()
        == visible.filter(F.col("n_tok") >= 40).count()
    )
    # nothing >= 60 or in [50,54] resurrected
    assert out.filter(F.col("n_tok") >= 60).count() == 0
    assert out.filter((F.col("n_tok") >= 50) & (F.col("n_tok") <= 54)).count() == 0


def test_write_mode_properties_steer_default_strategy(spark, warehouse):
    """Iceberg write-mode table properties: with write.delete.mode /
    write.update.mode = merge-on-read set on the table, strategy-less DML
    takes the MOR path (no data file rewritten); an explicit strategy arg
    still overrides; a property-less table defaults to copy-on-write."""
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
        delete_where,
        update_where,
    )
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("wmode", df.schema)
    tbl.append(df.repartitionByRange(4, "n_tok"))
    tbl.set_properties({
        "write.delete.mode": "merge-on-read",
        "write.update.mode": "merge-on-read",
    })
    assert tbl.write_mode("delete") == "mor-pos"
    assert tbl.write_mode("update") == "mor"
    assert tbl.write_mode("merge") == "cow"  # unset -> default

    files_before = {f.path for f in tbl.data_files()}
    delete_where(spark, tbl, {"n_tok": (100, None)})  # no strategy arg
    assert {f.path for f in tbl.data_files()} == files_before
    assert len(tbl.pos_delete_files()) == 1

    update_where(spark, tbl, {"n_tok": (None, 20)}, {"source": "'patched'"})
    assert files_before <= {f.path for f in tbl.data_files()}  # appends only
    assert len(tbl.pos_delete_files()) == 2
    assert tbl.scan(spark).filter(F.col("n_tok") >= 100).count() == 0

    # explicit arg overrides the property: cow rewrites, sidecar count flat
    delete_where(spark, tbl, {"n_tok": (90, 95)}, strategy="cow")
    assert len(tbl.pos_delete_files()) == 2

    # engine-native property value passes through (dv)
    tbl2 = cat.create_table("wmode2", df.schema)
    tbl2.append(df.limit(50))
    tbl2.set_properties({"write.delete.mode": "dv"})
    delete_where(spark, tbl2, {"n_tok": (40, None)})
    dv = [f for f in tbl2.pos_delete_files() if f.delete_format == "dv"]
    assert len(dv) == 1


# --------------------------------------------------------------------------
# branch-scoped MERGE (write-audit-publish for upserts)
# --------------------------------------------------------------------------

def _merge_updates(spark, n=30):
    rows = []
    for i in range(n):
        doc = str(i * 3)
        toks = [(i * 7 + j) % 1000 for j in range(5)]
        rows.append((doc, toks, 5, "branchsrc", i))
    return spark.createDataFrame(
        rows,
        "doc_id string, tokens array<int>, n_tok int, source string, _seq long",
    )


def test_merge_cow_on_branch_invisible_until_publish(spark, sequences_table):
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    tbl = sequences_table
    before = {r["doc_id"] for r in tbl.scan(spark).select("doc_id").collect()}
    main_head = tbl.current_snapshot().snapshot_id
    tbl.create_branch("audit")

    updates = _merge_updates(spark)
    m = merge_into(spark, tbl, updates, branch="audit")
    assert m["updates"] == 30

    # main readers see NOTHING of the merge
    assert tbl.current_snapshot().snapshot_id == main_head
    assert not tbl.scan(spark).filter(F.col("source") == "branchsrc").count()
    # branch readers see the merged state
    br = tbl.scan(spark, ref="audit")
    assert br.filter(F.col("source") == "branchsrc").count() == 30
    assert {r["doc_id"] for r in br.select("doc_id").collect()} >= before

    tbl.fast_forward("audit")
    assert tbl.scan(spark).filter(F.col("source") == "branchsrc").count() == 30
    # last-writer-wins: upserted keys are not duplicated after publish
    dup = (
        tbl.scan(spark).groupBy("doc_id").count().filter(F.col("count") > 1)
    )
    assert dup.count() == 0


def test_merge_mor_on_branch_applies_deletes_on_branch_scan(spark, sequences_table):
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into

    tbl = sequences_table
    n_main = tbl.scan(spark).count()
    tbl.create_branch("wapmor")
    merge_into(spark, tbl, _merge_updates(spark), strategy="mor", branch="wapmor")

    # main: no new rows, no visible deletes
    assert tbl.scan(spark).count() == n_main
    assert tbl.scan(spark).filter(F.col("source") == "branchsrc").count() == 0
    # branch: eq-deletes applied, updated keys single-imaged
    br = tbl.scan(spark, ref="wapmor")
    assert br.filter(F.col("source") == "branchsrc").count() == 30
    assert br.groupBy("doc_id").count().filter(F.col("count") > 1).count() == 0

    tbl.fast_forward("wapmor")
    assert tbl.scan(spark).filter(F.col("source") == "branchsrc").count() == 30
