"""Key-math helpers: salting and hash bucketing (all JVM built-ins).

The reference's Hudi sink locates file groups with an 8-bucket hash index on
the primary key (HudiCatalogSync.java:151-159); our equivalents:
``bucket_expr`` for co-partitioned MERGE joins and ``salt_expr`` for the
skewed ``source`` dimension (a few sources dominate — FIXTURES.md §1), kept
INSIDE the range-partition key but OUTSIDE the sort key so Z-locality within
files survives (SURVEY.md §7.3).
"""

from __future__ import annotations

import struct

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_expr(key: str | Column, n_buckets: int) -> Column:
    """Stable hash bucket of a key column: pmod(xxhash64(k), n)."""
    col = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


# --------------------------------------------------------------------------
# Driver-side XXH64 twin of Spark's ``xxhash64`` (Catalyst XXH64, seed 42).
#
# Hidden-partition pruning needs the planner to compute bucket[N] transform
# outputs for predicate constants WITHOUT launching a Spark job: a point
# lookup on a bucket-partitioned table must resolve "which bucket does this
# key hash to" from the driver alone (Iceberg's BucketTransform does the
# same in its Java planner). The implementation is the public XXH64 spec —
# Spark's XXH64.hashInt/hashLong/hashUnsafeBytes are the standard 4-byte /
# 8-byte / byte-stream paths — and tests/test_partition_prune.py asserts
# bit-identity against ``F.xxhash64`` across types and string lengths.
# --------------------------------------------------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M64 = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _M64
    return (_rotl(acc, 31) * _P1) & _M64


def xxh64_bytes(data: bytes, seed: int = 42) -> int:
    """XXH64 of a byte string, returned as a SIGNED 64-bit int (Spark long)."""
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while off + 32 <= length:
            v1 = _round(v1, int.from_bytes(data[off : off + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[off + 8 : off + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[off + 16 : off + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[off + 24 : off + 32], "little"))
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= _round(0, v)
            h = (h * _P1 + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + length) & _M64
    while off + 8 <= length:
        h ^= _round(0, int.from_bytes(data[off : off + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _M64
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(data[off : off + 4], "little") * _P1) & _M64
        h = (_rotl(h, 23) * _P2 + _P3) & _M64
        off += 4
    while off < length:
        h ^= (data[off] * _P5) & _M64
        h = (_rotl(h, 11) * _P1) & _M64
        off += 1
    h = _fmix(h)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxhash64_value(value, dtype_name: str) -> int:
    """Spark ``xxhash64(lit(value))`` for one scalar, computed driver-side.

    dtype_name is the Spark simpleString of the column type; byte/short/int
    hash through the 4-byte path (as Catalyst does), long through the
    8-byte path, string through UTF-8 bytes.
    """
    if dtype_name in ("tinyint", "smallint", "int"):
        return xxh64_bytes(struct.pack("<i", int(value)))
    if dtype_name == "bigint":
        return xxh64_bytes(struct.pack("<q", int(value)))
    if dtype_name == "string":
        return xxh64_bytes(str(value).encode("utf-8"))
    if dtype_name == "binary":
        return xxh64_bytes(bytes(value))
    raise TypeError(f"xxhash64_value: unsupported dtype {dtype_name!r}")


def bucket_value(value, n_buckets: int, dtype_name: str) -> int:
    """Driver-side twin of ``bucket_expr``: pmod(xxhash64(v), n)."""
    return xxhash64_value(value, dtype_name) % n_buckets


def salt_expr(key: str | Column, n_salts: int) -> Column:
    """Uniform salt derived from a high-cardinality key (doc_id).

    Splits hash-collision hot spots (distinct keys truncated to the same
    ckey dim) but NOT true duplicate-key runs — rows sharing the key get
    the same salt. Rewrite paths use ``row_salt_expr`` instead."""
    return bucket_expr(key, n_salts)


def row_salt_expr(n_salts: int) -> Column:
    """Row-unique salt for skew-splitting shuffles: diffused
    ``monotonically_increasing_id`` so even rows with IDENTICAL key
    columns (a re-ingested doc, CDC update churn) spread across salts —
    a key-derived salt cannot split those runs. Placement-only: the salt
    is dropped after partitioning, and Spark treats the nondeterministic
    stage as indeterminate (whole-stage rollback on map retry), the same
    contract as the standard rand()-salt pattern."""
    return F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
