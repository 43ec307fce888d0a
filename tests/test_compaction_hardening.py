"""Resume-path hardening for compact() (adversarial-review regressions):

1. a SAME-run_id resume after a partial-progress crash replans from a new
   base snapshot and must write to fresh directories — reusing the
   (run_id, group_id) path would mode("overwrite") directories whose files
   an earlier partial commit already published (data loss);
2. done-lineage rows only resume THE SAME plan — a stale row from a run
   over a different snapshot naming the same group id must be ignored, or
   the new plan's group is removed from the table without its rewrite
   output (data loss) / old outputs double-commit (duplication);
3. schema evolution must not break n_salts>1 rewrites (the row-unique
   salt has no column dependence; this pins that a renamed-away doc_id
   never regresses salted compaction).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df
from tests.conftest import SF_SMOKE

TARGET = 64 * 1024


def _checksum(tbl, spark):
    df = tbl.scan(spark)
    cols = df.columns
    return df.select(
        F.count("*").alias("n"),
        # bit_xor: order-independent row fingerprint, overflow-free (ANSI)
        F.expr(f"bit_xor(xxhash64({', '.join(cols)}))").alias("h"),
    ).collect()[0]


def test_same_run_id_resume_after_partial_progress_crash(spark, sequences_table):
    """The docstring's promise — 'pass the same id to resume' — must hold
    in partial-progress mode: committed outputs survive the resume."""
    tbl = sequences_table
    golden = _checksum(tbl, spark)

    with pytest.raises(RuntimeError, match="injected failure"):
        compact(
            spark, tbl, target_file_size=TARGET,
            partial_progress_commits=1, fail_after_groups=2,
            run_id="pp-same-id", max_group_size=48 * 1024,
        )
    assert any(
        s.summary.get("op") == "compact-partial" for s in tbl.history()
    ), "precondition: at least one partial commit landed before the crash"

    # SAME run_id: the new plan's group 0 must not overwrite the directory
    # the crashed attempt's partial commit already published
    compact(
        spark, tbl, target_file_size=TARGET,
        partial_progress_commits=1, run_id="pp-same-id",
    )
    assert _checksum(tbl, spark) == golden
    paths = [f.path for f in tbl.data_files()]
    assert len(paths) == len(set(paths))


def test_stale_lineage_rows_from_older_plan_are_ignored(spark, sequences_table):
    """Crash a non-partial run (done rows written, nothing committed), then
    CHANGE the table (new append -> new snapshot -> different plan) and
    rerun with the same run_id: the stale rows must not be absorbed."""
    tbl = sequences_table
    df = tokens_df(spark, SF_SMOKE)

    with pytest.raises(RuntimeError, match="injected failure"):
        compact(
            spark, tbl, target_file_size=TARGET, fail_after_groups=1,
            run_id="stale-row", max_group_size=48 * 1024,
        )
    # the table moves on: a new append changes the snapshot AND the plan
    tbl.append(df.limit(40).withColumn("source", F.lit("post-crash")))
    golden = _checksum(tbl, spark)

    m = compact(
        spark, tbl, target_file_size=TARGET, run_id="stale-row",
        max_group_size=48 * 1024,
    )
    # stale rows were for a different snapshot: nothing resumed from them
    assert m["groups_resumed"] == 0
    assert _checksum(tbl, spark) == golden
    paths = [f.path for f in tbl.data_files()]
    assert len(paths) == len(set(paths))


def test_salted_compaction_survives_doc_id_rename(spark, warehouse):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog

    df = tokens_df(spark, SF_SMOKE)
    cat = Catalog(warehouse)
    tbl = cat.create_table("renamed", df.schema)
    for i in range(3):
        tbl.append(df.filter(df.doc_id.cast("long") % 3 == i), num_files=2)
    tbl.rename_column("doc_id", "seq_id")
    n = tbl.scan(spark).count()
    m = compact(spark, tbl, target_file_size=TARGET, n_salts=4)
    assert m["groups"] >= 1
    assert tbl.scan(spark).count() == n
