"""Headline benchmark: maintenance-suite throughput on the tokens table.

Prints ONE JSON line:
  {"metric": "maintenance_suite_wall", "value": <sec>, "unit": "sec",
   "queries": {...per-phase/query seconds...}, "sf": <sf>,
   "gb_per_hour": ..., "seq_per_sec": ..., ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   fixture dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[<n>] parallelism (default 32)
  BENCH_REPLICATE      tokens-table scale multiplier (default 1024 since
                       round 5: a ~12 s suite wall sits well above this
                       host's 1-2 s noise swings, where the old 256
                       default's ~6 s wall did not; ~3 min per run)

--scaling: interleaved min-of-3 legs at local[4] vs local[16] on a
SCALING_REPLICATE=1024 input, fresh JVM per leg (the sandbox's N vs 4N
evidence protocol — see BENCH.md for the measured result and the
protocol rationale).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPLICATE = int(os.environ.get("BENCH_REPLICATE", "1024"))
# co-tenant noise robustness: the timed suite runs on ROUNDS freshly-ingested
# tables and each phase reports its min (the classic min-of-k protocol — min
# is the noise-free estimator for deterministic work)
ROUNDS = int(os.environ.get("BENCH_ROUNDS", "2"))
# BENCH_WH_BASE: where the bench warehouse lives. Default /tmp (disk). For
# executor-mode scaling runs set it to /dev/shm so 4 executor JVMs + driver
# don't serialize on the sandbox's single virtual disk — a real 4N-node
# cluster has 4N independent disks, so tmpfs is the honest analogue of
# per-node storage, not a cheat (the timed work is identical).
WH_BASE = os.environ.get("BENCH_WH_BASE", "/tmp")


def run_bench() -> dict:
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog
    from lakehouse_benchmark_ingestion_spark.operators.clustering import cluster
    from lakehouse_benchmark_ingestion_spark.operators.compaction import compact
    from lakehouse_benchmark_ingestion_spark.operators.expire_snapshots import expire_snapshots
    from lakehouse_benchmark_ingestion_spark.operators.manifest_rewrite import rewrite_manifests
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.session import get_spark
    from lakehouse_benchmark_ingestion_spark.sources.tokens import tokens_df, updates_df
    from pyspark.sql import functions as F

    spark = get_spark(
        "bench",
        shuffle_partitions=CPUS,
        extra_conf={
            # split the big post-compaction files into enough scan tasks to
            # feed all cores at bench scale (a real cluster keeps the 128 MB
            # default over TB inputs — thousands of tasks come free there)
            "spark.sql.files.maxPartitionBytes": str(16 * 1024 * 1024),
            # zstd: the production codec at 100 TB (much better ratio than
            # snappy; the extra CPU parallelizes where I/O does not)
            "spark.sql.parquet.compression.codec": "zstd",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    # ---- JIT warmup (untimed): run the whole suite once at replicate=1 so
    # the timed phases measure steady-state codegen, not compiler warmup.
    wwh = f"{WH_BASE}/bench_warm_{CPUS}"
    shutil.rmtree(wwh, ignore_errors=True)
    wdf = tokens_df(spark, SF_DIR, replicate=1)
    wtbl = Catalog(wwh).create_table("sequences", wdf.schema)
    wtbl.append(wdf, num_files=8)
    compact(spark, wtbl, target_file_size=256 * 1024, max_concurrent_groups=4)
    cluster(spark, wtbl, target_file_size=256 * 1024)
    merge_into(spark, wtbl, updates_df(spark, SF_DIR))
    shutil.rmtree(wwh, ignore_errors=True)

    wh = f"{WH_BASE}/bench_wh_{CPUS}"
    shutil.rmtree(wh, ignore_errors=True)
    cat = Catalog(wh)
    # cache: the 4 ingest appends each filter this — regeneration (crossJoin
    # + per-row transform()) would otherwise run 4x
    df = tokens_df(spark, SF_DIR, replicate=REPLICATE).persist()

    # ---- ingest + timed maintenance suite, min over ROUNDS fresh tables ---
    # ~10-15 groups at bench scale: enough concurrent jobs to saturate both
    # parallelism levels, few enough that Spark's fixed per-job latency
    # (which no amount of cores removes) stays a small fraction of the wall.
    # few WIDE group jobs: bins of up to 128 MB range-split into 8 MB files
    # → full shuffle width inside each job, negligible fixed job latency
    target = 8 * 1024 * 1024
    timings: dict[str, float] = {}
    suite_phases = ("compact", "cluster", "rewrite_manifests", "expire_snapshots", "merge")
    for rnd in range(max(1, ROUNDS)):
        # ingest: many small files across snapshots (the reference's 60 s
        # checkpoint cadence pathology, MainRunner.java:86) — not part of
        # the timed maintenance metric, but timed for context.
        t0 = time.time()
        tbl = cat.create_table(f"sequences_r{rnd}", df.schema)
        # fixed file count — the input layout must be IDENTICAL at every
        # parallelism level for the N-vs-4N scaling comparison to be valid
        for i in range(4):
            part = df.filter(F.pmod(F.xxhash64(F.col("doc_id")), F.lit(4)) == i)
            tbl.append(part, num_files=64)
        t_ingest = time.time() - t0

        files0 = tbl.data_files()
        n_files0 = len(files0)
        bytes_in = sum(f.file_size_bytes for f in files0)
        rows_in = sum(f.record_count for f in files0)

        round_t: dict[str, float] = {"ingest": round(t_ingest, 3)}
        t0 = time.time()
        m_compact = compact(
            spark, tbl, target_file_size=target,
            max_group_size=128 * 1024 * 1024, max_concurrent_groups=8,
        )
        round_t["compact"] = round(time.time() - t0, 3)

        t0 = time.time()
        cluster(spark, tbl, target_file_size=target)
        round_t["cluster"] = round(time.time() - t0, 3)

        t0 = time.time()
        rewrite_manifests(tbl)
        round_t["rewrite_manifests"] = round(time.time() - t0, 3)

        t0 = time.time()
        expire_snapshots(tbl, keep_last=1)
        round_t["expire_snapshots"] = round(time.time() - t0, 3)

        # MERGE INTO — same file-size target as the suite: without it the
        # COW rewrite needs only ceil(bytes/128MB) output partitions — a
        # one-task write at bench scale (at 100 TB the default is right)
        t0 = time.time()
        merge_into(spark, tbl, updates_df(spark, SF_DIR), target_file_size=target)
        round_t["merge"] = round(time.time() - t0, 3)

        for k, v in round_t.items():
            if k == "ingest":
                # context-only number; later rounds reuse the cached
                # generation, so only round 0 reflects real ingest cost
                timings.setdefault(k, v)
            else:
                timings[k] = min(timings.get(k, v), v)

    maintenance_wall = sum(timings[p] for p in suite_phases if p != "merge")

    # ---- post-maintenance scan latency -------------------------------------
    t0 = time.time()
    agg = tbl.scan(spark).groupBy("source").agg(
        F.count("*").alias("n"), F.sum("n_tok").alias("tok")
    ).collect()
    timings["scan_agg_by_source"] = round(time.time() - t0, 3)

    t0 = time.time()
    # explode+sum beats an aggregate() fold ~9x (measured): stays in
    # whole-stage codegen instead of the interpreted lambda path
    full = (
        tbl.scan(spark)
        .select(F.explode("tokens").alias("t"))
        .agg(F.sum("t").alias("cksum"))
        .collect()
    )
    timings["scan_token_checksum"] = round(time.time() - t0, 3)

    # ---- stats-pruned point scan (clustered table → few files) ------------
    t0 = time.time()
    probe = "42" if REPLICATE == 1 else "42-0"
    hit = tbl.scan(
        spark,
        file_filter=lambda f: f.lower_bounds.get("doc_id", "") <= probe
        and probe <= f.upper_bounds.get("doc_id", "￿"),
    ).filter(F.col("doc_id") == probe).count()
    timings["point_lookup_pruned"] = round(time.time() - t0, 3)

    # ---- bloom-index point lookups (not part of the suite wall): build the
    # per-file bloom sidecar once, then probe a present and an absent key.
    # Min/max stats prune the clustered table to ~1 file for present keys;
    # the bloom's win is ABSENT keys, which stats can't disprove once the
    # probe falls inside some file's range.
    from lakehouse_benchmark_ingestion_spark.operators.bloom_index import (
        bloom_file_filter,
        build_bloom_index,
    )

    t0 = time.time()
    bm = build_bloom_index(spark, tbl, "doc_id")
    timings["build_bloom"] = round(time.time() - t0, 3)
    # an absent key INSIDE the occupied key range: min/max stats cannot
    # disprove it, so any skipping measured here is the bloom's alone
    absent = probe + "-absent"
    bf = bloom_file_filter(tbl, "doc_id", absent)
    bloom_files_scanned = sum(1 for f in tbl.data_files() if bf(f)) if bf else None
    tbl.scan(spark, where={"doc_id": absent}).count()  # codegen warmup (untimed)
    t0 = time.time()
    miss = tbl.scan(spark, where={"doc_id": absent}).count()
    timings["point_lookup_bloom_absent"] = round(time.time() - t0, 3)
    assert miss == 0

    # ---- pure-CPU kernel probe (not part of the suite wall): xxhash64 over
    # a generated range — no storage, no shuffle. Separates "does the ENGINE
    # serialize anything" from this single box's shared memory-bandwidth
    # ceiling: a real 4N-node cluster scales bandwidth with nodes, one VM
    # cannot. Near-linear kernel scaling + sublinear suite scaling ⇒ the
    # residual gap is the box, not the job structure.
    t0 = time.time()
    spark.range(0, 400_000_000, 1, CPUS * 4).selectExpr(
        "bit_xor(xxhash64(id, id * 31, id + 7)) AS h"  # xor: no ANSI overflow
    ).collect()
    timings["kernel_cpu"] = round(time.time() - t0, 3)

    df.unpersist()

    # ---- merge-on-read upsert + delete-applied scan (extra visibility;
    # not part of the headline maintenance wall): the O(batch) write path
    # and what its deferred read-side anti-join costs before compaction.
    t0 = time.time()
    merge_into(spark, tbl, updates_df(spark, SF_DIR), strategy="mor")
    timings["merge_mor"] = round(time.time() - t0, 3)
    t0 = time.time()
    tbl.scan(spark).groupBy("source").agg(F.count("*").alias("n")).collect()
    timings["scan_after_mor"] = round(time.time() - t0, 3)

    # ---- deletion vectors at cardinality (v3 flagship; not part of the
    # suite wall): ~1% of rows deleted as v2 row-file pos-deletes, then
    # converted to ONE DV bitmap sidecar — sidecar bytes for both formats
    # plus the DV-applied scan cost guard the feature against regression.
    from lakehouse_benchmark_ingestion_spark.operators.pos_delete_rewrite import (
        convert_pos_deletes_to_dv,
    )
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where

    t0 = time.time()
    m_del = delete_where(spark, tbl, {"n_tok": (64, 64)}, strategy="mor-pos")
    timings["delete_1pct_pos"] = round(time.time() - t0, 3)
    pos_rows = [f for f in tbl.pos_delete_files()]
    pos_bytes = sum(f.file_size_bytes for f in pos_rows)
    dv_deleted = sum(f.record_count for f in pos_rows)

    t0 = time.time()
    convert_pos_deletes_to_dv(spark, tbl)
    timings["convert_pos_to_dv"] = round(time.time() - t0, 3)
    dv_sidecars = [
        f for f in tbl.pos_delete_files() if f.delete_format == "dv"
    ]
    dv_bytes = sum(f.file_size_bytes for f in dv_sidecars)

    # direct --strategy dv write path (a second ~1% slice): positions are
    # packed to bitmaps executor-side in the delete itself — no row files
    t0 = time.time()
    delete_where(spark, tbl, {"n_tok": (72, 72)}, strategy="dv")
    timings["delete_1pct_dv_direct"] = round(time.time() - t0, 3)

    t0 = time.time()
    n_after_dv = (
        tbl.scan(spark).groupBy("source").agg(F.count("*").alias("n")).collect()
    )
    timings["scan_after_dv"] = round(time.time() - t0, 3)

    # ---- DV-vs-pos crossover at DENSITY (round-5): a ~13% n_tok slice
    # written as v2 row-file pos-deletes, then converted to DV bitmaps.
    # Row files carry one (path, pos) row per deleted position — O(deleted
    # rows) — while a bitmap sidecar stays O(files + set bits / 8); the
    # 1%-vs-13% pair below turns the documented "the win grows with
    # density" claim into two measured points.
    dv_bytes_before_10 = sum(
        f.file_size_bytes
        for f in tbl.pos_delete_files()
        if f.delete_format == "dv"
    )
    t0 = time.time()
    delete_where(spark, tbl, {"n_tok": (80, 95)}, strategy="mor-pos")
    timings["delete_10pct_pos"] = round(time.time() - t0, 3)
    pos10_rows = [
        f for f in tbl.pos_delete_files() if f.delete_format != "dv"
    ]
    pos10_bytes = sum(f.file_size_bytes for f in pos10_rows)
    pos10_positions = sum(f.record_count for f in pos10_rows)
    t0 = time.time()
    convert_pos_deletes_to_dv(spark, tbl)
    timings["convert_pos_to_dv_10pct"] = round(time.time() - t0, 3)
    dv10_bytes = (
        sum(
            f.file_size_bytes
            for f in tbl.pos_delete_files()
            if f.delete_format == "dv"
        )
        - dv_bytes_before_10
    )

    gb = bytes_in / 1e9
    out = {
        "metric": "maintenance_suite_wall",
        "value": round(maintenance_wall, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]),
        "cpus": CPUS,
        "replicate": REPLICATE,
        "rows": rows_in,
        "files_before": n_files0,
        "files_after_compact": m_compact.get("files_out"),
        "bytes_in": bytes_in,
        "gb_per_hour": round(gb / (maintenance_wall / 3600), 2),
        "seq_per_sec": round(rows_in / maintenance_wall, 1),
        "point_lookup_rows": hit,
        "bloom_index_files": bm.get("files"),
        "bloom_index_bytes": bm.get("bytes"),
        "bloom_files_scanned_absent": bloom_files_scanned,
        "scan_rows": agg and sum(r.n for r in agg),
        "token_checksum": full[0]["cksum"],
        "dv_deleted_positions": dv_deleted,
        "pos_delete_bytes": pos_bytes,
        "dv_sidecar_bytes": dv_bytes,
        "dv_sidecar_files": len(dv_sidecars),
        "rows_after_dv": n_after_dv and sum(r.n for r in n_after_dv),
        "dv10_deleted_positions": pos10_positions,
        "dv10_density_pct": round(100.0 * pos10_positions / rows_in, 2),
        "pos10_delete_bytes": pos10_bytes,
        "dv10_sidecar_bytes": dv10_bytes,
    }
    shutil.rmtree(wh, ignore_errors=True)
    return out


def run_scaling() -> None:
    """N vs 4N evidence: identical job + identical input at two parallelism
    levels, fresh JVM per leg, legs interleaved across repeats, min-of-N
    walls (minimum is robust to noisy-neighbor interference on a shared
    host — this sandbox shows multi-x load spikes from co-tenants).

    The pair defaults to (4, 16): both legs inside the 16 PHYSICAL cores
    (32 logical = SMT, which adds ~15-25% not 2x, so an 8→32 comparison
    would structurally understate efficiency), and the input is scaled 4x
    over the headline bench (SCALING_REPLICATE=256 → per-task compute
    dominates Spark's fixed per-job/per-task latency, which no number of
    cores removes and which a real 4N-node cluster amortizes over TB-sized
    inputs). Override with SCALING_LEVELS=2,8 / SCALING_REPEATS / etc."""
    levels = [int(x) for x in os.environ.get("SCALING_LEVELS", "4,16").split(",")]
    repeats = int(os.environ.get("SCALING_REPEATS", "3"))
    # SCALING_MODE=executors: N-vs-4N REAL EXECUTOR JVM PROCESSES via
    # Spark's local-cluster master (1 executor x 4 cores vs 4 executors x
    # 4 cores) — the literal shape of the north rule's two cluster sizes.
    # Thread mode (default local[N]) additionally measures SMT/JVM thread
    # scaling, which on a shared virtualized host caps well below what
    # separate executor processes reach (see BENCH.md controls).
    executor_mode = os.environ.get("SCALING_MODE", "threads") == "executors"
    exec_mem_mb = int(os.environ.get("SCALING_EXECUTOR_MB", "8192"))
    # 1024 → ~0.4 GB zstd / 5.1M sequences → ~50 output files at the 8 MB
    # bench target, so the rewrite stage is ~3x wider than the big leg's
    # core count. Anything much smaller and output width (not the engine)
    # caps the big leg — measured: replicate=256 gives only 12 write tasks.
    replicate = os.environ.get("SCALING_REPLICATE", "1024")

    def _probe_quietness() -> float | None:
        """Pre-leg host probe (tools/host_probe.py): launch-time gating
        cannot see a co-tenant swing that starts seconds later (measured:
        r3 batch d launched at 0.895/0.893 double-quiet and its first two
        interleaved rounds still ran 2-3x slow), so every leg records the
        probe reading taken immediately before it and the summary computes
        a quiet-legs-only efficiency alongside the all-legs one."""
        probe = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tools", "host_probe.py")
        try:
            p = subprocess.run(
                [sys.executable, probe], capture_output=True, text=True,
                timeout=120,
            )
            return float(json.loads(p.stdout.strip().splitlines()[-1])["quietness"])
        except Exception:
            return None  # probe failure must never kill the measurement

    quiet_gate = float(os.environ.get("SCALING_QUIET_GATE", "0.85"))
    runs: dict[int, list[dict]] = {c: [] for c in levels}
    probes: dict[int, list[float | None]] = {c: [] for c in levels}
    probes_post: dict[int, list[float | None]] = {c: [] for c in levels}
    def _run_leg(cpus: int, r: int) -> None:
        probes[cpus].append(_probe_quietness())
        env = dict(
            os.environ,
            SPARK_GRAFT_CPUS=str(cpus),
            BENCH_REPLICATE=replicate,
            # noise robustness comes from the interleaved min-of-3
            # REPEATS here; no need for in-process rounds on top
            BENCH_ROUNDS="1",
            SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"),
        )
        if executor_mode:
            # `cpus` total cores split into (cpus // 4) executor JVMs
            # of 4 cores each: levels 4,16 → 1 vs 4 executors
            n_exec = max(1, cpus // 4)
            env["SPARK_GRAFT_MASTER"] = (
                f"local-cluster[{n_exec},4,{exec_mem_mb}]"
            )
            # the worker budget above only CAPS executor requests; the
            # executor JVM heap itself comes from spark.executor.memory
            # (default 1g → OOM at bench scale, measured)
            env["SPARK_GRAFT_EXECUTOR_MEM"] = f"{exec_mem_mb}m"
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        if not lines:
            # surface the leg's failure instead of a bare IndexError
            # (a crashed JVM leaves stdout empty; stderr has the cause)
            sys.stderr.write(
                f"scaling leg local[{cpus}] repeat {r} failed "
                f"(exit {p.returncode}):\n{p.stderr[-4000:]}\n"
            )
            raise RuntimeError(f"scaling leg local[{cpus}] produced no JSON")
        runs[cpus].append(json.loads(lines[-1]))
        # post-leg probe: batch-e showed a pre-leg probe alone
        # misclassifies legs whose co-tenant load arrives mid-leg (its
        # one pre-quiet local[16] leg ran 2.3x the level's min). A leg
        # counts as quiet only when the window is bounded on BOTH sides.
        probes_post[cpus].append(_probe_quietness())

    for r in range(repeats):
        for cpus in levels:
            _run_leg(cpus, r)

    # Adaptive continuation (SCALING_QUIET_TARGET=k, SCALING_DEADLINE_MIN=m):
    # fixed-repeat batches on this shared box routinely outlive its
    # minutes-scale quiet windows (r3 batches g/h: every leg probe-bracketed
    # loaded, quiet_scaling_efficiency null). Instead of praying one batch
    # lands quiet, keep running legs until EACH level has k legs whose pre-
    # AND post-probes clear the gate, or the deadline passes. Loaded moments
    # sleep instead of burning a leg, and levels that already met the target
    # stop paying — the quiet-legs-only efficiency is what this feeds.
    quiet_target = int(os.environ.get("SCALING_QUIET_TARGET", "0"))
    deadline_min = float(os.environ.get("SCALING_DEADLINE_MIN", "60"))

    def _quiet_count(c: int) -> int:
        return sum(
            1
            for q1, q2 in zip(probes[c], probes_post[c])
            if q1 is not None and q1 >= quiet_gate
            and q2 is not None and q2 >= quiet_gate
        )

    if quiet_target > 0:
        t_end = time.time() + deadline_min * 60
        r = repeats
        while time.time() < t_end and any(
            _quiet_count(c) < quiet_target for c in levels
        ):
            peek = _probe_quietness()
            if peek is None or peek < quiet_gate:
                time.sleep(60)
                continue
            for cpus in levels:
                if _quiet_count(cpus) < quiet_target:
                    _run_leg(cpus, r)
            r += 1
    best = {c: min(rs, key=lambda d: d["value"]) for c, rs in runs.items()}
    out = {f"local{c}": best[c] for c in levels}
    out["walls"] = {f"local{c}": [d["value"] for d in runs[c]] for c in levels}
    out["leg_probes"] = {f"local{c}": probes[c] for c in levels}
    out["leg_probes_post"] = {f"local{c}": probes_post[c] for c in levels}
    # per-leg kernel wall: the pure-CPU control runs inside every leg's
    # JVM, so it doubles as a load dosimeter DURING the leg (probes only
    # see the boundaries)
    out["kernel_walls"] = {
        f"local{c}": [d["queries"]["kernel_cpu"] for d in runs[c]] for c in levels
    }
    n, n4 = min(levels), max(levels)
    ratio = n4 / n
    sp = best[n]["value"] / best[n4]["value"]
    out[f"speedup_{n}_to_{n4}"] = round(sp, 3)
    out[f"scaling_efficiency_{n}_{n4}"] = round(sp / ratio, 3)
    # quiet-legs-only efficiency: min over legs whose pre- AND post-leg
    # probes BOTH read >= gate (the leg's window is bounded on both
    # sides); null when either level lacks a verifiably-quiet leg
    quiet_walls = {
        c: [
            d["value"]
            for d, q1, q2 in zip(runs[c], probes[c], probes_post[c])
            if q1 is not None and q1 >= quiet_gate
            and q2 is not None and q2 >= quiet_gate
        ]
        for c in levels
    }
    out["quiet_gate"] = quiet_gate
    out["quiet_walls"] = {f"local{c}": quiet_walls[c] for c in levels}
    if quiet_walls[n] and quiet_walls[n4]:
        qsp = min(quiet_walls[n]) / min(quiet_walls[n4])
        out["quiet_scaling_efficiency"] = round(qsp / ratio, 3)
    else:
        out["quiet_scaling_efficiency"] = None
    k_n = min(d["queries"]["kernel_cpu"] for d in runs[n])
    k_n4 = min(d["queries"]["kernel_cpu"] for d in runs[n4])
    out["kernel_cpu_sec"] = {f"local{n}": k_n, f"local{n4}": k_n4}
    out["kernel_scaling_efficiency"] = round((k_n / k_n4) / ratio, 3)
    # the decisive signal on a loaded host: the suite's scaling relative
    # to what the same window gave embarrassingly-parallel in-JVM CPU.
    # >= 1 means no engine-side serialization is visible above the host's
    # own thread-scaling ceiling (every non-contaminated batch shows this).
    if out["kernel_scaling_efficiency"] > 0:
        out["control_relative_efficiency"] = round(
            out[f"scaling_efficiency_{n}_{n4}"]
            / out["kernel_scaling_efficiency"],
            3,
        )
    tp = {c: best[c]["gb_per_hour"] for c in levels}
    out["gb_per_hour"] = {f"local{c}": tp[c] for c in levels}
    out["seq_per_sec"] = {f"local{c}": best[c]["seq_per_sec"] for c in levels}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
