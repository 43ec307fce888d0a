"""Dev harness: cross-check every queries() entry against its oracle_sql()
via DuckDB at a given sf, the way the driver does (row count + schema +
order-insensitive value hash over pandas frames). STRICT on purpose:

  - no list/array normalization — an array-typed result column must crash
    here exactly like it crashes the driver's canonicalizer;
  - no numeric coercion — int64 vs float64 vs Decimal-object are DIFFERENT
    (DuckDB HUGEINT/DECIMAL surface as float64/object in pandas while Spark
    sums surface as int64/Decimal; queries must cast both sides to the same
    output type);
  - timestamps are normalized to datetime64[us] on both sides (arrow/duckdb
    unit jitter only — values still compared exactly).

Run: python tools/verify_queries.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FILTERS = sys.argv[2:]


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-shaped canonicalization: columns sorted by name, rows sorted by
    all columns (raises TypeError on unhashable cells — lists — just like
    the driver), index reset."""
    df = df[sorted(df.columns)]
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif dt.startswith(("int", "uint")):
            # pandas.util.hash_pandas_object (the driver) hashes all integer
            # widths identically — int32 vs int64 is NOT a mismatch
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _dtype_sig(df: pd.DataFrame) -> dict[str, str]:
    out = {}
    for c in df.columns:
        dt = str(df[c].dtype)
        if dt == "object" and len(df):
            dt = f"object:{type(df[c].iloc[0]).__name__}"
        out[c] = dt
    return out


def compare(sp: pd.DataFrame, du: pd.DataFrame) -> list[str]:
    msgs: list[str] = []
    if sorted(sp.columns) != sorted(du.columns):
        return [f"columns differ: spark={sorted(sp.columns)} duck={sorted(du.columns)}"]
    if len(sp) != len(du):
        return [f"row count: spark={len(sp)} duck={len(du)}"]
    try:
        csp, cdu = _canon(sp.copy()), _canon(du.copy())
    except TypeError as e:
        return [f"CANON CRASH (array column → driver fail): {e}"]
    ds, dd = _dtype_sig(csp), _dtype_sig(cdu)
    for c in csp.columns:
        if ds[c] != dd[c]:
            msgs.append(f"dtype mismatch {c!r}: spark={ds[c]} duck={dd[c]}")
    if msgs:
        return msgs
    neq = ~(csp.eq(cdu) | (csp.isna() & cdu.isna()))
    bad_rows = neq.any(axis=1)
    if bad_rows.any():
        idx = list(csp.index[bad_rows])[:3]
        msgs.append(f"{int(bad_rows.sum())} of {len(csp)} sorted rows differ")
        for i in idx:
            msgs.append(f"  spark: {csp.loc[i].to_dict()!r:.300}")
            msgs.append(f"  duck : {cdu.loc[i].to_dict()!r:.300}")
    return msgs


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
            sp = sdf.toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"skip  {name}: rows-only ({len(sp)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            du = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            continue
        msgs = compare(sp, du)
        status = "ok  " if not msgs else "FAIL"
        if msgs:
            failures.append(name)
        print(f"{status}  {name}  ({len(sp)} rows, {time.time()-t0:.1f}s)")
        for m in msgs:
            print("      " + m)
    print()
    print(f"{'ALL OK' if not failures else 'FAILURES: ' + ', '.join(failures)}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
