"""Hidden partitioning: Iceberg partition-spec parity for icelite tables.

The table property ``partition-spec`` holds a JSON list of transform
fields, e.g.::

    [{"col": "source", "transform": "identity"},
     {"col": "n_tok", "transform": "truncate", "param": 50}]

Transforms (the Iceberg core set minus temporal ones — the sequences
schema has no timestamp column):

  identity      partition by the raw value
  truncate[W]   integral cols: v - (v mod W)  (Iceberg's truncate for ints);
                string cols: first W characters
  bucket[N]     pmod(xxhash64(v), N) — same hash family as the Hudi-style
                bucket index (functions/hashing.bucket_expr)

Like Iceberg, partitioning is HIDDEN: queries never reference partition
columns; the write path derives them (synthetic ``_p{i}`` columns consumed
by ``partitionBy`` — never stored in file contents, so file schema stays
pure data columns), and each DataFile records its transform-output tuple
as ``partition_json``.

Scan-side note: icelite keeps exact per-file min/max stats for every
scalar column, which are strictly TIGHTER than partition ranges — so
predicate file-skipping stays stats-driven and partition tuples add no
read-path logic. The partition spec's value is LAYOUT: appends and
compaction never produce a file spanning two partitions, the planner
never builds a compaction group spanning two partitions, and rewrite
stragglers written without tuples (e.g. MERGE COW outputs) are folded
back into partitions by the next compaction. Partition EVOLUTION is free:
changing the spec only affects future writes; old files keep their
recorded tuples and keep compacting among themselves.
"""

from __future__ import annotations

import json
import os
import urllib.parse
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROP_KEY = "partition-spec"
HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


@dataclass(frozen=True)
class PartitionField:
    col: str
    transform: str  # identity | truncate | bucket
    param: int | None = None

    @property
    def name(self) -> str:
        if self.transform == "identity":
            return self.col
        return f"{self.col}_{self.transform}{self.param}"


def parse_spec(properties: dict) -> list[PartitionField] | None:
    raw = properties.get(PROP_KEY)
    if not raw:
        return None
    fields = []
    for d in json.loads(raw):
        tr = d["transform"]
        if tr not in ("identity", "truncate", "bucket"):
            raise ValueError(f"unknown partition transform {tr!r}")
        if tr != "identity" and not d.get("param"):
            raise ValueError(f"transform {tr!r} requires a param")
        fields.append(PartitionField(d["col"], tr, d.get("param")))
    return fields


def spec_to_json(fields: list[PartitionField]) -> str:
    return json.dumps(
        [
            {"col": f.col, "transform": f.transform, "param": f.param}
            for f in fields
        ]
    )


def transform_expr(f: PartitionField, schema: T.StructType) -> Column:
    dtype = schema[f.col].dataType
    c = F.col(f.col)
    if f.transform == "identity":
        return c
    if f.transform == "truncate":
        if isinstance(dtype, _INTEGRAL):
            return c - F.pmod(c, F.lit(f.param))
        if isinstance(dtype, T.StringType):
            return F.substring(c, 1, f.param)
        raise ValueError(f"truncate unsupported for {dtype}")
    # bucket
    from ..functions.hashing import bucket_expr

    return bucket_expr(c, f.param)


def conforms(partition_json: str, fields: list[PartitionField] | None) -> bool:
    """Does a recorded file tuple belong to the given spec? A file conforms
    iff its tuple's field NAMES are exactly the spec's transform-output
    names (values vary per file; the name set is the spec's signature —
    e.g. ``n_tok_truncate50`` vs ``source``). With no spec, only the empty
    tuple conforms. Spec evolution leaves old-era files non-conforming;
    ``operators.compaction.migrate_partition_spec`` rewrites exactly those.
    """
    names = set(json.loads(partition_json))
    if not fields:
        return not names
    return names == {f.name for f in fields}


#: sentinel: the transform output for this constant cannot be computed
#: driver-side (unsupported type) — callers must skip pruning on it.
NOT_COMPUTABLE = object()


def transform_value(f: PartitionField, value, schema: T.StructType):
    """Driver-side twin of ``transform_expr`` for ONE scalar: the partition
    tuple value a row carrying ``value`` in ``f.col`` would be written
    under. This is what makes hidden partitioning prunable at plan time —
    an equality predicate constant is pushed through the transform and
    compared against recorded per-file tuples with no Spark job (Iceberg's
    Transform.project equivalent). Returns NOT_COMPUTABLE when the dtype
    has no driver-side twin; pruning must then be skipped (conservative).
    """
    if value is None:
        return NOT_COMPUTABLE
    dtype = schema[f.col].dataType
    if f.transform == "identity":
        return value
    if f.transform == "truncate":
        if isinstance(dtype, _INTEGRAL):
            # Spark pmod: non-negative remainder, same as Python % for W>0
            return int(value) - (int(value) % f.param)
        if isinstance(dtype, T.StringType):
            return str(value)[: f.param]
        return NOT_COMPUTABLE
    # bucket: pmod(xxhash64(v), N) — exact XXH64 twin (functions/hashing.py)
    from ..functions.hashing import bucket_value

    try:
        return bucket_value(value, f.param, dtype.simpleString())
    except TypeError:
        return NOT_COMPUTABLE


def output_is_integral(f: PartitionField, schema: T.StructType) -> bool:
    if f.transform == "bucket":
        return True
    dtype = schema[f.col].dataType
    return isinstance(dtype, _INTEGRAL)


def partition_json_from_path(
    path: str, fields: list[PartitionField], schema: T.StructType
) -> str:
    """Recover the partition tuple from ``_p{i}=value`` directory components
    of a partitionBy-written file path; "{}" if the path carries none."""
    values: dict[int, str] = {}
    for comp in path.split(os.sep):
        if comp.startswith("_p") and "=" in comp:
            idx, raw = comp[2:].split("=", 1)
            values[int(idx)] = raw
    if not values:
        return "{}"
    out = {}
    for i, f in enumerate(fields):
        raw = values.get(i)
        if raw is None:
            continue
        if raw == HIVE_NULL:
            out[f.name] = None
        elif output_is_integral(f, schema):
            out[f.name] = int(raw)
        else:
            out[f.name] = urllib.parse.unquote(raw)
    return json.dumps(out, sort_keys=True)


def write_partitioned(
    df: DataFrame,
    fields: list[PartitionField],
    commit_dir: str,
    max_records_per_file: int | None = None,
    sort_within: list[str] | None = None,
    drop_cols: list[str] | None = None,
    mode: str = "error",
) -> list[str]:
    """Hash-distribute by partition tuple and write one leaf dir per tuple
    (``partitionBy`` on synthetic ``_p{i}`` columns — excluded from file
    contents, so the stored schema stays pure data columns). One shuffle,
    one file per partition per task; ``maxRecordsPerFile`` splits giants.
    Returns the written file paths."""
    import glob as _glob

    schema = df.schema
    pnames = []
    out = df
    for i, f in enumerate(fields):
        pn = f"_p{i}"
        out = out.withColumn(pn, transform_expr(f, schema))
        pnames.append(pn)
    out = out.repartition(*[F.col(n) for n in pnames])
    if sort_within:
        out = out.sortWithinPartitions(*pnames, *sort_within)
    if drop_cols:
        # projection after the sort: per-partition order is preserved, the
        # helper columns (e.g. the cluster key) stay out of file contents
        out = out.drop(*drop_cols)
    # mode="overwrite" for RESUMABLE rewrites (compaction straggler fold):
    # a crashed attempt's half-written dir is replaced instead of raising
    writer = out.write.mode(mode).partitionBy(*pnames)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(commit_dir)
    return sorted(
        _glob.glob(os.path.join(commit_dir, "**", "part-*.parquet"), recursive=True)
    )
