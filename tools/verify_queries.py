"""Dev harness: cross-check every queries() entry against its oracle_sql()
via DuckDB at a given sf, the way the driver does (row count + schema +
order-insensitive value comparison). Run:

    python tools/verify_queries.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import math
import os
import sys
import time
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTERS = sys.argv[2:]


def norm(v):
    if isinstance(v, Decimal):
        return ("num", float(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("num", "nan")
        return ("num", round(v, 9))
    if isinstance(v, int):
        return ("num", float(v))
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def rows_key(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm(vals[i]) for i in order))
    out.sort(key=repr)
    return out


def main():
    import __spark_entry__ as entrymod
    from lakehouse_benchmark_ingestion_spark.session import get_spark

    spark = get_spark("verify", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if FILTERS and not any(f in name for f in FILTERS):
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only ({len(srows)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(dcols):
            ok = False
            msgs.append(f"columns differ: spark={sorted(scols)} duck={sorted(dcols)}")
        elif len(srows) != len(drows):
            ok = False
            msgs.append(f"row count: spark={len(srows)} duck={len(drows)}")
        else:
            sk = rows_key(srows, scols)
            dk = rows_key(drows, dcols)
            if sk != dk:
                ok = False
                diff = [i for i, (a, b) in enumerate(zip(sk, dk)) if a != b]
                msgs.append(f"{len(diff)} of {len(sk)} sorted rows differ")
                for i in diff[:3]:
                    msgs.append(f"  spark: {sk[i]!r:.300}")
                    msgs.append(f"  duck : {dk[i]!r:.300}")
        status = "ok  " if ok else "FAIL"
        if not ok:
            failures.append(name)
        print(f"{status}  {name}  ({len(srows)} rows, {time.time()-t0:.1f}s)")
        for m in msgs:
            print("      " + m)
    print()
    print(f"{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
