"""The north_rule deployment sentence, executed literally: the engine runs
as ``spark-submit --py-files engine.zip`` jobs on a multi-executor master.

This test drives a REAL ``spark-submit`` against ``local-cluster`` (separate
executor JVM processes, not threads) from a scratch cwd where the ONLY copy
of the engine is the --py-files archive:

- the entry script is extracted FROM the zip (the artifact carries its own
  entry point);
- ``PYTHONPATH`` is stripped and the cwd is outside the repo, so both the
  driver and the executors resolve ``lakehouse_benchmark_ingestion_spark``
  from the shipped archive;
- ``cluster --curve hilbert`` forces the module-level pandas UDF
  (``functions.zorder.hilbert_key_udf``), which pickles BY REFERENCE —
  executors must import the package from the zip to run it. A worker that
  couldn't see the archive fails this job immediately.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

import build_pyfiles  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMOKE", "/root/testdata/sf0.001")

SPARK_SUBMIT = shutil.which("spark-submit") or next(
    iter(
        sorted(
            __import__("glob").glob("/opt/spark-*/bin/spark-submit"), reverse=True
        )
    ),
    None,
)


def _submit(script: str, zip_path: str, cwd: str, env: dict, *args: str) -> dict:
    """One spark-submit job; returns the CLI's JSON metrics line."""
    p = subprocess.run(
        [
            SPARK_SUBMIT,
            "--py-files",
            zip_path,
            "--conf",
            "spark.ui.enabled=false",
            script,
            *args,
        ],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
    assert p.returncode == 0 and lines, (
        f"spark-submit {args[:1]} failed (exit {p.returncode})\n"
        f"stdout tail: {p.stdout[-1500:]}\nstderr tail: {p.stderr[-3000:]}"
    )
    return json.loads(lines[-1])


@pytest.mark.skipif(
    SPARK_SUBMIT is None or not os.path.isdir(SF_DIR),
    reason="needs spark-submit and the driver-generated testdata",
)
def test_spark_submit_pyfiles_real_executors(tmp_path):
    zip_path = str(tmp_path / "engine.zip")
    build_pyfiles.build(zip_path)

    # the artifact carries its own entry point — extract it, don't reach
    # back into the repo
    with zipfile.ZipFile(zip_path) as zf:
        script = str(tmp_path / "cli_main.py")
        with open(script, "wb") as fh:
            fh.write(zf.read("lakehouse_benchmark_ingestion_spark/jobs/cli.py"))

    wh = str(tmp_path / "wh")
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_GRAFT_MASTER", "SPARK_GRAFT_CPUS")
    }
    env.update(
        {
            # two executor JVM processes x 2 cores — a real (tiny) cluster
            "SPARK_GRAFT_MASTER": "local-cluster[2,2,1200]",
            "SPARK_GRAFT_EXECUTOR_MEM": "1200m",
            "SPARK_GRAFT_CPUS": "4",
            "SPARK_GRAFT_DRIVER_MEM": "2g",
            "PYSPARK_PYTHON": sys.executable,
            "PYSPARK_DRIVER_PYTHON": sys.executable,
        }
    )
    cwd = str(tmp_path)

    r = _submit(
        script, zip_path, cwd, env,
        "create-table", "--warehouse", wh, "--table", "seq",
        "--from-documents", SF_DIR,
    )
    assert r["command"] == "create-table"

    _submit(
        script, zip_path, cwd, env,
        "ingest", "--warehouse", wh, "--table", "seq",
        "--from-documents", SF_DIR, "--appends", "4",
    )
    before = _submit(
        script, zip_path, cwd, env, "count", "--warehouse", wh, "--table", "seq"
    )
    assert before["count"] > 0

    # hilbert = module-level pandas UDF = executors MUST import the package
    # from the shipped zip
    clu = _submit(
        script, zip_path, cwd, env,
        "cluster", "--warehouse", wh, "--table", "seq", "--curve", "hilbert",
    )
    assert clu.get("files_out", 0) >= 1 or clu.get("skipped"), clu

    after = _submit(
        script, zip_path, cwd, env, "count", "--warehouse", wh, "--table", "seq"
    )
    assert after["count"] == before["count"]
