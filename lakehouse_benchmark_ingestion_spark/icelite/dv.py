"""Deletion vectors — Iceberg v3 position-delete encoding parity.

A deletion vector is a position delete stored as ONE bitmap per addressed
data file instead of one (file_path, pos) row per deleted position. Iceberg
v3 adopted this encoding (puffin-stored DVs, one DV per data file) because
v2 pos-delete rows explode at scale: deleting 1% of a 10^12-row table is
10^10 sidecar rows to write, shuffle, and anti-join on every read, versus
a few KB of bitmap per touched file. The reference's Iceberg sink writes
format-version=2 tables (IcebergCatalogSync.java:112-116); this module is
the v3 continuation of that delete surface.

Design rule (mirrors Iceberg): a DV *is* a CONTENT_POS_DELETES file —
same content id, same sequence-number semantics, same file_path-bounds
addressability — with ``DataFile.delete_format == "dv"``. Every consumer
that only tests existence / paths / sequence numbers needs no format
awareness; only the three content-reading sites (native pos_reader, the
DataSource pyarrow kernel, sidecar rewrite) switch on the format.

Encoding: little-bit-order packed bitmap (numpy packbits) over row
positions, bit i set = position i deleted. Packing and unpacking are
vectorized numpy over Arrow batches — executor-side, never a driver loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# sidecar schema: one row per addressed data file
DV_SCHEMA = "file_path string, dv binary, cardinality long"

# conservative in-memory bytes per expanded (file_path, pos) row, for
# broadcast-threshold decisions (path pointer + long + row overhead)
EXPANDED_BYTES_PER_POSITION = 32


def pack_positions(positions) -> bytes:
    """Pack row positions into a little-bit-order bitmap (bit i = pos i)."""
    pos = np.asarray(positions, dtype=np.int64)
    if pos.size == 0:
        return b""
    lo = int(pos.min())
    if lo < 0:
        raise ValueError(f"negative row position: {lo}")
    bits = np.zeros(int(pos.max()) + 1, dtype=np.uint8)
    bits[pos] = 1
    return np.packbits(bits, bitorder="little").tobytes()


def unpack_positions(dv: bytes) -> np.ndarray:
    """Inverse of pack_positions: bitmap -> sorted int64 position array."""
    if not dv:
        return np.empty(0, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(dv, dtype=np.uint8), bitorder="little")
    return np.flatnonzero(bits).astype(np.int64)


def pack_addresses(addrs: DataFrame) -> DataFrame:
    """(file_path, pos) rows -> one (file_path, dv, cardinality) row per
    file. The pack runs as a grouped-map pandas UDF on the executors —
    positions for one data file land in one task (the only shuffle), and
    the bitmap never transits the driver."""

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pos = np.unique(pdf["pos"].to_numpy(dtype=np.int64))
        return pd.DataFrame(
            {
                "file_path": [pdf["file_path"].iloc[0]],
                "dv": [pack_positions(pos)],
                "cardinality": [int(pos.size)],
            }
        )

    return addrs.groupBy("file_path").applyInPandas(_pack, schema=DV_SCHEMA)


def sidecar_addresses(spark: SparkSession, sidecars: list) -> DataFrame:
    """Union of the given CONTENT_POS_DELETES sidecars' ``(file_path, pos)``
    relations across BOTH physical encodings — v2 row files read directly,
    DVs expanded lazily. The ONE implementation every consumer (scan-side
    anti-joins, rewrite actions) goes through, so the encodings can never
    diverge between read paths."""
    from functools import reduce

    from . import manifest as mf

    row_files = [d for d in sidecars if d.delete_format != mf.DELETE_FORMAT_DV]
    dv_files = [d for d in sidecars if d.delete_format == mf.DELETE_FORMAT_DV]
    parts = []
    if row_files:
        parts.append(
            spark.read.schema("file_path string, pos long").parquet(
                *[d.path for d in row_files]
            )
        )
    if dv_files:
        parts.append(expand_addresses(spark, [d.path for d in dv_files]))
    return reduce(DataFrame.unionByName, parts)


def expand_addresses(spark: SparkSession, sidecar_paths: list[str]) -> DataFrame:
    """DV sidecar files -> (file_path, pos) rows, the v2 relation every
    existing pos-delete consumer speaks. Lazy: runs as mapInPandas on the
    executors; callers prune sidecar files first (file_path bounds), so
    only bitmaps of addressed files are ever unpacked."""
    raw = spark.read.schema(DV_SCHEMA).parquet(*sidecar_paths)

    def _gen(batches):
        for pdf in batches:
            for fp, dv in zip(pdf["file_path"], pdf["dv"]):
                pos = unpack_positions(bytes(dv) if dv is not None else b"")
                if pos.size:
                    yield pd.DataFrame({"file_path": fp, "pos": pos})

    return raw.mapInPandas(_gen, schema="file_path string, pos long")
