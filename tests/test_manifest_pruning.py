"""Two-level scan planning: manifest-list footer summaries skip whole
manifests before any body parse (Iceberg manifest-list analogue).

At 10^12-sequence scale the driver's plan time is bound on manifest
parsing; the footer summary keeps it O(matching manifests). Correctness
contract: the manifest skip is a strict superset of the per-file skip —
missing summaries (legacy manifests) or missing bounds read the body.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.icelite import Catalog
from lakehouse_benchmark_ingestion_spark.icelite import manifest as mf
from lakehouse_benchmark_ingestion_spark.icelite.metadata import metadata_dir
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE


def _banded_table(spark, warehouse, name="banded"):
    """One append (= one manifest) per disjoint n_tok band."""
    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table(name, df.schema)
    bands = [(0, 40), (41, 80), (81, 120), (121, 10_000)]
    for lo, hi in bands:
        part = df.filter((F.col("n_tok") >= lo) & (F.col("n_tok") <= hi))
        if part.limit(1).count():
            tbl.append(part, num_files=2)
    return tbl, df


def test_summary_written_and_read(spark, warehouse):
    tbl, _ = _banded_table(spark, warehouse)
    snap = tbl.current_snapshot()
    for name in snap.manifests:
        s = mf.read_manifest_summary(tbl.location, name)
        assert s is not None
        assert s["contents"] == ["data"]
        assert "n_tok" in s["lower"] and "n_tok" in s["upper"]
        # summary bounds must contain every file's bounds
        for f in mf.read_manifest(tbl.location, name):
            assert s["lower"]["n_tok"] <= f.lower_bounds["n_tok"]
            assert s["upper"]["n_tok"] >= f.upper_bounds["n_tok"]


def test_plan_skips_disjoint_manifests(spark, warehouse):
    tbl, df = _banded_table(spark, warehouse)
    files, plan = tbl.plan_data_files({"n_tok": (0, 40)})
    assert plan["manifests_total"] >= 3
    assert plan["manifests_read"] < plan["manifests_total"]
    # every kept file could match; every skipped file provably cannot
    all_files = tbl.data_files()
    skipped = {f.path for f in all_files} - {f.path for f in files}
    for f in all_files:
        if f.path in skipped:
            assert f.lower_bounds["n_tok"] > 40
    # scan answers exactly the predicate rows
    expected = df.filter(F.col("n_tok") <= 40).count()
    assert tbl.scan(spark, where={"n_tok": (0, 40)}).count() == expected


def test_legacy_manifest_without_summary_is_read(spark, warehouse):
    """A manifest whose footer lacks the summary key (pre-feature) must be
    body-read, never skipped."""
    tbl, df = _banded_table(spark, warehouse, name="legacy")
    snap = tbl.current_snapshot()
    # strip the footer summary off every manifest, simulating legacy files
    for name in snap.manifests:
        path = os.path.join(metadata_dir(tbl.location), name)
        t = pq.read_table(path).replace_schema_metadata({})
        pq.write_table(t, path)
    mf._MANIFEST_CACHE.clear()
    mf._SUMMARY_CACHE.clear()
    files, plan = tbl.plan_data_files({"n_tok": (0, 40)})
    assert plan["manifests_read"] == plan["manifests_total"]
    expected = df.filter(F.col("n_tok") <= 40).count()
    assert tbl.scan(spark, where={"n_tok": (0, 40)}).count() == expected


def test_mixed_content_manifest_summary(spark, warehouse):
    """Compaction commits delete-file manifests; summaries aggregate DATA
    bounds only and record the content kinds present."""
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    tbl, df = _banded_table(spark, warehouse, name="mixed")
    delete_where(spark, tbl, {"n_tok": (41, 80)}, strategy="mor")
    snap = tbl.current_snapshot()
    kinds = set()
    for name in snap.manifests:
        s = mf.read_manifest_summary(tbl.location, name)
        assert s is not None
        kinds.update(s["contents"])
    assert "eq-deletes" in kinds
    # predicate scan through the MOR path still answers exactly
    expected = df.filter(
        (F.col("n_tok") <= 120) & ~((F.col("n_tok") >= 41) & (F.col("n_tok") <= 80))
    ).count()
    assert tbl.scan(spark, where={"n_tok": (0, 120)}).count() == expected


def test_manifest_cache_returns_independent_objects(spark, warehouse):
    tbl, _ = _banded_table(spark, warehouse, name="cachetest")
    snap = tbl.current_snapshot()
    a = mf.read_manifest(tbl.location, snap.manifests[0])
    a[0].content = "mutated"
    a[0].lower_bounds["n_tok"] = -999
    b = mf.read_manifest(tbl.location, snap.manifests[0])
    assert b[0].content == "data"
    assert b[0].lower_bounds["n_tok"] != -999


# --------------------------------------------------------------------------
# metadata-only COUNT pushdown
# --------------------------------------------------------------------------

def test_count_rows_metadata_only_no_predicate(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("cnt_plain", df.schema)
    tbl.append(df, num_files=4)
    r = tbl.count_rows(spark)
    assert r["mode"] == "metadata" and r["files_scanned"] == 0
    assert r["count"] == df.count()


def test_count_rows_partition_aligned_is_metadata_only(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("cnt_part", df.schema)
    tbl.set_partition_spec([{"col": "source", "transform": "identity"}])
    tbl.append(df)
    src = df.select("source").first()[0]
    r = tbl.count_rows(spark, where={"source": src})
    assert r["mode"] == "metadata" and r["files_scanned"] == 0, r
    assert r["count"] == df.filter(F.col("source") == src).count()


def test_count_rows_mixed_and_delete_fallback(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("cnt_mix", df.schema)
    tbl.append(df.repartitionByRange(4, "n_tok"))  # disjoint n_tok ranges

    # a range that fully covers some files and straddles others
    bounds = sorted(f.upper_bounds["n_tok"] for f in tbl.data_files())
    cut = bounds[1] + 1  # inside the layout, misaligned with file edges
    r = tbl.count_rows(spark, where={"n_tok": (0, cut)})
    expected = df.filter(F.col("n_tok") <= cut).count()
    assert r["count"] == expected
    assert r["mode"] == "metadata+scan" and r["files_metadata"] >= 1, r

    # outstanding deletes force the sound full-scan path
    delete_where(spark, tbl, {"n_tok": (0, 30)}, strategy="mor")
    r2 = tbl.count_rows(spark, where={"n_tok": (0, cut)})
    assert r2["mode"] == "scan"
    assert r2["count"] == df.filter(
        (F.col("n_tok") <= cut) & ~(F.col("n_tok") <= 30)
    ).count()


def test_agg_minmax_metadata_only_no_predicate(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mm_plain", df.schema)
    tbl.append(df, num_files=4)
    r = tbl.agg_minmax(spark, "n_tok")
    assert r["mode"] == "metadata" and r["files_scanned"] == 0, r
    row = df.agg(F.min("n_tok"), F.max("n_tok")).first()
    assert (r["min"], r["max"]) == (row[0], row[1])


def test_agg_minmax_partition_aligned_is_metadata_only(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mm_part", df.schema)
    tbl.set_partition_spec([{"col": "source", "transform": "identity"}])
    tbl.append(df)
    src = df.select("source").first()[0]
    r = tbl.agg_minmax(spark, "n_tok", where={"source": src})
    assert r["mode"] == "metadata" and r["files_scanned"] == 0, r
    row = (
        df.filter(F.col("source") == src).agg(F.min("n_tok"), F.max("n_tok")).first()
    )
    assert (r["min"], r["max"]) == (row[0], row[1])


def test_agg_minmax_partial_overlap_scans_straddlers(spark, warehouse):
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mm_mix", df.schema)
    tbl.append(df.repartitionByRange(4, "n_tok"))  # disjoint n_tok ranges

    bounds = sorted(f.upper_bounds["n_tok"] for f in tbl.data_files())
    cut = bounds[1] + 1  # straddles a file edge
    r = tbl.agg_minmax(spark, "doc_id", where={"n_tok": (0, cut)})
    row = (
        df.filter(F.col("n_tok") <= cut)
        .agg(F.min("doc_id"), F.max("doc_id"))
        .first()
    )
    assert (r["min"], r["max"]) == (row[0], row[1])
    assert r["mode"] == "metadata+scan" and r["files_metadata"] >= 1, r
    assert 0 < r["files_scanned"] < len(tbl.data_files())


def test_agg_minmax_delete_fallback(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mm_del", df.schema)
    tbl.append(df, num_files=3)
    lo = df.agg(F.min("n_tok")).first()[0]
    # delete the extreme rows: a metadata answer would now be WRONG
    delete_where(spark, tbl, {"n_tok": (lo, lo)}, strategy="mor-pos")
    r = tbl.agg_minmax(spark, "n_tok")
    assert r["mode"] == "scan", r
    assert r["min"] == df.filter(F.col("n_tok") > lo).agg(F.min("n_tok")).first()[0]


def test_agg_minmax_unstatted_column_scans(spark, warehouse):
    # tokens (array) carries no bounds: every file must be scanned, and the
    # answer (MIN/MAX over array column) still matches the scan
    df = tokens_df(spark, SF_SMOKE)
    tbl = Catalog(warehouse).create_table("mm_arr", df.schema)
    tbl.append(df, num_files=2)
    r = tbl.agg_minmax(spark, "tokens")
    assert r["mode"] == "scan" and r["files_scanned"] == 2, r
    row = df.agg(F.min("tokens"), F.max("tokens")).first()
    assert (r["min"], r["max"]) == (row[0], row[1])
