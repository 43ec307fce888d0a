"""Per-run maintenance metrics journal (north_rule: lineage + METRICS).

The full suite persists one MetricsRow per stage per run; `status` surfaces
the last run's walls. Entries are atomic JSON files — same torn-write
protection as lineage."""

from __future__ import annotations

from lakehouse_benchmark_ingestion_spark.plans.lineage import MetricsLog
from lakehouse_benchmark_ingestion_spark.plans.maintenance import run_full_maintenance

TARGET = 512 * 1024


def test_full_maintenance_persists_stage_metrics(spark, sequences_table):
    tbl = sequences_table
    run_full_maintenance(spark, tbl, target_file_size=TARGET, run_id="mrun1")
    rows = MetricsLog(tbl.location).all_rows()
    ops = [r.op for r in rows]
    assert ops == ["compact", "cluster", "rewrite_manifests", "expire_snapshots", "partition_stats"]
    assert all(r.run_id == "mrun1" for r in rows)
    assert all(r.wall_ms >= 0 and r.started_ms > 0 for r in rows)
    c = rows[0]
    assert c.files_in == 20 and 0 < c.files_out < 20
    assert c.rows == 500 and c.bytes_in > 0 and c.snapshot_id > 0

    # second run: new run_id, last_run() returns only its rows; the cluster
    # stage's skip decision is visible in extra
    run_full_maintenance(spark, tbl, target_file_size=TARGET, run_id="mrun2")
    last = MetricsLog(tbl.location).last_run()
    assert {r.run_id for r in last} == {"mrun2"}
    cluster_row = next(r for r in last if r.op == "cluster")
    assert cluster_row.extra.get("skipped") == "already-clustered"


def test_status_cli_reports_last_maintenance(spark, sequences_table, capsys):
    import json

    from lakehouse_benchmark_ingestion_spark.jobs import cli

    tbl = sequences_table
    run_full_maintenance(spark, tbl, target_file_size=TARGET, run_id="mrun3")
    warehouse = tbl.location.rsplit("/", 1)[0]
    assert cli.main(["status", "--warehouse", warehouse]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    lm = out["tables"]["sequences"]["last_maintenance"]
    assert [m["op"] for m in lm] == [
        "compact", "cluster", "rewrite_manifests", "expire_snapshots",
        "partition_stats",
    ]
    assert all(m["run_id"] == "mrun3" for m in lm)
