"""Time every driver-contract query Spark-side only (no DuckDB oracle) at a
given sf dir — the 10x-scale smoke that catches queries whose plan is
correct at sf0.01 but explodes at sf0.1.

Usage: python tools/time_queries.py [SF_DIR] [name_filter ...]
Prints one line per query (rows, seconds, slowest first at the end).
"""

from __future__ import annotations

import sys
import time


def main() -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as entry
    from lakehouse_benchmark_ingestion_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    filters = sys.argv[2:]
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    if filters:
        qs = {k: v for k, v in qs.items() if any(f in k for f in filters)}
    # warm the shared warehouse UP FRONT so its one-time build (ingest +
    # full maintenance + MERGE) is charged to this setup line, not to
    # whichever query happens to run first in the certification order
    from lakehouse_benchmark_ingestion_spark.queries import prepared_warehouse

    t0 = time.time()
    prepared_warehouse(spark, sf_dir)
    print(f"{'(prepared_warehouse setup)':32s} {'':>9s}       {time.time() - t0:7.1f}s",
          flush=True)
    timings: list[tuple[str, int, float]] = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}", flush=True)
            continue
        dt = time.time() - t0
        timings.append((name, n, dt))
        print(f"{name:32s} {n:>9d} rows  {dt:7.1f}s", flush=True)
    timings.sort(key=lambda t: -t[2])
    total = sum(t[2] for t in timings)
    print(f"\ntotal {total:.1f}s; slowest:")
    for name, n, dt in timings[:8]:
        print(f"  {name:32s} {dt:7.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
