"""The north_rule packaging contract: the engine ships as a --py-files zip.

Certifies three things about `tools/build_pyfiles.py`:

  1. builds are deterministic (re-submit with the same artifact hash is
     provably the same code);
  2. the archive contains only package .py sources — no tests, caches, data;
  3. a subprocess whose ONLY path to the engine is the zip (cwd outside the
     repo, PYTHONPATH=<zip>) can import the package FROM the zip and run a
     real non-JVM code path end-to-end: catalog create-table → pyarrow
     parquet write → footer stats harvest → manifest write → atomic snapshot
     commit → reload and plan. That is exactly what an executor that received
     the archive via SparkContext.addPyFile can do.
"""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import build_pyfiles  # noqa: E402


def _sha(path: str) -> str:
    with open(path, "rb") as fh:
        return hashlib.sha256(fh.read()).hexdigest()


def test_build_is_deterministic_and_sources_only(tmp_path):
    z1 = str(tmp_path / "a.zip")
    z2 = str(tmp_path / "b.zip")
    entries = build_pyfiles.build(z1)
    build_pyfiles.build(z2)
    assert _sha(z1) == _sha(z2)

    assert entries, "archive must not be empty"
    with zipfile.ZipFile(z1) as zf:
        names = zf.namelist()
    assert all(n.endswith(".py") for n in names)
    assert all(n.startswith("lakehouse_benchmark_ingestion_spark/") for n in names)
    assert not any("__pycache__" in n or n.startswith("tests/") for n in names)
    # the spark-submit entry point and the core engine modules are aboard
    for must in (
        "lakehouse_benchmark_ingestion_spark/jobs/cli.py",
        "lakehouse_benchmark_ingestion_spark/icelite/table.py",
        "lakehouse_benchmark_ingestion_spark/operators/compaction.py",
    ):
        assert must in names, must


ZIP_DRIVER = r"""
import os, sys
import pyarrow as pa
import pyarrow.parquet as pq

import lakehouse_benchmark_ingestion_spark as pkg
assert ".zip" in (pkg.__file__ or ""), f"package resolved OUTSIDE the zip: {pkg.__file__}"

from lakehouse_benchmark_ingestion_spark.icelite.catalog import Catalog
from lakehouse_benchmark_ingestion_spark.icelite import manifest as mf
from pyspark.sql.types import (
    ArrayType, IntegerType, StringType, StructField, StructType,
)

wh = sys.argv[1]
schema = StructType([
    StructField("doc_id", StringType()),
    StructField("tokens", ArrayType(IntegerType(), False)),
    StructField("n_tok", IntegerType()),
    StructField("source", StringType()),
])
cat = Catalog(wh)
t = cat.create_table("zip_smoke", schema)

data_dir = os.path.join(t.location, "data", "zip0")
os.makedirs(data_dir)
p = os.path.join(data_dir, "part-0.parquet")
pq.write_table(
    pa.table({
        "doc_id": ["d1", "d2"],
        "tokens": pa.array([[1, 2], [3]], pa.list_(pa.int32())),
        "n_tok": pa.array([2, 1], pa.int32()),
        "source": ["web", "web"],
    }),
    p,
)
stats = mf.harvest_stats([p])
seq = t.next_sequence_number()
for s in stats:
    s.sequence_number = seq
name = mf.write_manifest(t.location, stats)
t._commit_snapshot("append", add_manifests=[name])

t2 = cat.load_table("zip_smoke")
files, _plan_stats = t2.plan_data_files({})
assert len(files) == 1 and files[0].record_count == 2, files
assert len(t2.history()) == 1
print("ZIP_OK", pkg.__file__)
"""


def test_engine_runs_from_zip_alone(tmp_path):
    z = str(tmp_path / "engine.zip")
    build_pyfiles.build(z)
    driver = str(tmp_path / "driver.py")
    with open(driver, "w") as fh:
        fh.write(ZIP_DRIVER)
    env = dict(os.environ)
    env["PYTHONPATH"] = z  # the ONLY route to the engine
    res = subprocess.run(
        [sys.executable, driver, str(tmp_path / "wh")],
        cwd=str(tmp_path),  # not the repo — a repo checkout must not leak in
        env=env,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr
    assert "ZIP_OK" in res.stdout and ".zip" in res.stdout
