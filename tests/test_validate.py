"""Integrity validation (operators/validate.py): healthy tables report
clean; seeded corruptions (missing file, truncated file, wrong footer row
count, dangling ref, dangling delete address) are each detected by name.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite import metadata as md
from lakehouse_benchmark_ingestion_spark.operators.validate import (
    validate_table,
)
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


def _checks(report):
    return {i["check"] for i in report["issues"]}


def test_healthy_table_is_clean_even_deep(spark, sequences_table):
    tbl = sequences_table
    r = validate_table(spark, tbl, deep=True)
    assert r["ok"] is True and r["issues"] == []
    assert r["files_checked"] == len(tbl.all_files())


def test_missing_and_truncated_files_detected(spark, sequences_table):
    tbl = sequences_table
    files = tbl.data_files()
    os.remove(files[0].path)
    with open(files[1].path, "r+b") as fh:
        fh.truncate(files[1].file_size_bytes // 2)
    r = validate_table(spark, tbl)
    assert r["ok"] is False
    assert _checks(r) == {"missing-file", "size-mismatch"}
    paths = {i["path"] for i in r["issues"]}
    assert files[0].path in paths and files[1].path in paths


def test_deep_detects_rowcount_mismatch(spark, sequences_table, tmp_path):
    """Replace a data file with a valid parquet of the SAME byte size but a
    different row count: only the deep footer check can catch it."""
    tbl = sequences_table
    victim = tbl.data_files()[0]
    other = str(tmp_path / "other.parquet")
    tbl.scan(spark).limit(max(1, victim.record_count // 2)).coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "o"))
    import glob as g
    import shutil

    src = g.glob(str(tmp_path / "o" / "part-*.parquet"))[0]
    shutil.copyfile(src, victim.path)
    # the replacement is a valid parquet with fewer rows; depending on
    # encoding it may or may not also differ in byte size — deep must flag
    # it either way (rowcount-mismatch when sizes collide, size-mismatch
    # otherwise), and deep never reports less than shallow
    shallow = validate_table(spark, tbl)
    deep = validate_table(spark, tbl, deep=True)
    assert deep["ok"] is False
    assert {"rowcount-mismatch", "size-mismatch"} & _checks(deep)
    assert len(deep["issues"]) >= len(shallow["issues"])


def test_dangling_ref_detected(spark, sequences_table):
    tbl = sequences_table

    def mutate(meta):
        meta.refs["ghost"] = {"snapshot_id": 999999, "type": "tag"}
        return meta

    md.commit(tbl.location, mutate)
    r = validate_table(spark, tbl)
    assert {"check": "ref-resolves", "path": "ghost"}.items() <= r["issues"][0].items() or any(
        i["check"] == "ref-resolves" and i["path"] == "ghost"
        for i in r["issues"]
    )


def test_deep_detects_dangling_delete_address(spark, warehouse):
    """A pos-delete sidecar addressing a no-longer-live data file must be
    flagged: its suppressed rows could resurrect."""
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
        delete_where,
    )

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("val_dd", df.schema)
    tbl.append(df, num_files=2)
    delete_where(spark, tbl, {"n_tok": (0, 30)}, strategy="mor-pos")
    assert tbl.pos_delete_files()
    assert validate_table(spark, tbl, deep=True)["ok"] is True

    # surgically drop one ADDRESSED data file from the manifest while
    # keeping the sidecar (the corruption a buggy rewrite would produce)
    import pyarrow.parquet as pq

    side = tbl.pos_delete_files()[0]
    addressed = set(
        pq.read_table(side.path, columns=["file_path"]).column("file_path").to_pylist()
    )
    victim = next(
        f for f in tbl.data_files() if os.path.realpath(f.path) in
        {os.path.realpath(a) for a in addressed}
    )
    tbl.replace_files({victim.path}, [], operation="test-corruption")
    r = validate_table(spark, tbl, deep=True)
    assert r["ok"] is False and "dangling-delete" in _checks(r)


def test_lineage_nested_overlap_detected(spark, warehouse):
    """Three forged row-id ranges where B nests inside A and C overlaps A
    while clearing B's end: the overlap frontier must be the running MAX
    end (tracking only the previous range's end lets C slip through)."""
    from lakehouse_benchmark_ingestion_spark.icelite import manifest as mf
    from lakehouse_benchmark_ingestion_spark.icelite.table import (
        ROW_LINEAGE_PROP,
    )

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table(
        "val_lin", df.schema, properties={ROW_LINEAGE_PROP: "true"}
    )
    for n in (100, 10, 50):
        tbl.append(df.limit(n), num_files=1)
    files = sorted(
        tbl.data_files(), key=lambda f: f.record_count, reverse=True
    )
    assert [f.record_count for f in files] == [100, 50, 10]
    # forge: A=[0,100), B=[10,20) nested inside A, C=[30,80) overlaps A
    # only (its lo clears B's end, so a last-end frontier misses it)
    forged_first = {100: 0, 10: 10, 50: 30}
    for f in files:
        f.first_row_id = forged_first[f.record_count]
    name = mf.write_manifest(tbl.location, files)

    def mutate(meta):
        meta.snapshots[-1].manifests = [name]
        meta.next_row_id = 1000
        return meta

    md.commit(tbl.location, mutate)
    r = validate_table(spark, tbl)
    overlaps = [i for i in r["issues"] if i["check"] == "lineage-overlap"]
    flagged = {i["path"] for i in overlaps}
    b = next(f for f in files if f.record_count == 10)
    c = next(f for f in files if f.record_count == 50)
    assert b.path in flagged
    assert c.path in flagged, "nested-range regression: C must be flagged"
    assert len(overlaps) == 2


def test_deep_detects_corrupt_delete_sidecar(spark, warehouse):
    """A pos-delete sidecar with a smashed footer must surface as a parse
    issue row (per-file), never crash the distributed validation job."""
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
        delete_where,
    )

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("val_cs", df.schema)
    tbl.append(df, num_files=2)
    delete_where(spark, tbl, {"n_tok": (0, 30)}, strategy="mor-pos")
    side = tbl.pos_delete_files()[0]
    with open(side.path, "r+b") as fh:
        fh.seek(-8, os.SEEK_END)
        fh.write(b"XXXXXXXX")  # same size, broken footer magic
    r = validate_table(spark, tbl, deep=True)
    assert r["ok"] is False
    assert "delete-sidecar-parse" in _checks(r)
    assert any(
        i["check"] == "delete-sidecar-parse" and i["path"] == side.path
        for i in r["issues"]
    )


def test_cli_validate(spark, sequences_table, capsys):
    from tests.test_jobs_cli import run

    wh = os.path.dirname(sequences_table.location)
    r = run(capsys, "validate", "--warehouse", wh, "--deep")
    assert r["ok"] is True and r["files_checked"] > 0


def test_full_maintenance_validate_stage(spark, sequences_table):
    """maintenance.validate=true appends a journaled validate stage that
    passes on a healthy table and raises when the head is corrupt."""
    import pytest as _pytest

    from lakehouse_benchmark_ingestion_spark.plans.maintenance import (
        run_full_maintenance,
    )

    tbl = sequences_table
    tbl.set_properties({"maintenance.validate": "true"})
    m = run_full_maintenance(spark, tbl, target_file_size=4 * 1024 * 1024)
    assert "validate" in m and m["validate"]["files_out"] > 0

    os.remove(tbl.data_files()[0].path)
    with _pytest.raises(RuntimeError, match="post-maintenance validation"):
        run_full_maintenance(spark, tbl, target_file_size=4 * 1024 * 1024)


def test_deep_validate_accepts_dv_sidecar(spark, warehouse):
    """DV sidecars store one parquet row per ADDRESSED file while their
    manifest record_count is the deleted-position cardinality — deep
    validation must not read that as a rowcount mismatch."""
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import (
        delete_where,
    )

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("val_dv", df.schema)
    tbl.append(df, num_files=2)
    r = delete_where(spark, tbl, {"n_tok": (0, 60)}, strategy="dv")
    # cardinality must exceed addressed-file count for the check to bite
    assert r["deleted_positions"] > r["delete_files_out"]
    rep = validate_table(spark, tbl, deep=True)
    assert rep["ok"] is True, rep["issues"]


def test_validate_empty_table_report_shape(spark, warehouse):
    """A table with no snapshot must return the same report keys as the
    normal path (the maintenance gate indexes snapshot_id/deep)."""
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("val_empty", df.schema)
    rep = validate_table(spark, tbl, deep=True)
    assert rep == {
        "ok": True,
        "snapshot_id": None,
        "files_checked": 0,
        "deep": True,
        "issues": [],
    }
