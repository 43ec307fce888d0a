"""Sequence packing: fill fixed-length training context windows.

LLM pretraining consumes fixed-length token windows (e.g. 2048/8192); the
tokenized corpus is a stream of variable-length documents. The standard
packing discipline concatenates documents per stream and cuts the stream at
context-window boundaries — a document occupies byte-range
``[cum - n_tok, cum)`` of its stream and is assigned to the window where it
STARTS. This is pure window-function arithmetic (one shuffle on the stream
key, a running sum inside each stream): no UDF, no collect, fully
deterministic, and exactly expressible in ANSI SQL for the oracle.

Scale note: a running sum within a stream is sequential by construction, so
the unit of parallelism is the stream (``by`` column). With a handful of
giant sources, pass ``shards > 1`` to salt the stream key
(``pmod(xxhash64(order), shards)``) — each (source, shard) packs
independently, trading a little end-of-shard fragmentation for
shard-parallelism. The certified query uses shards=1 for oracle parity; the
sharded variant is unit-tested for the fill-ratio bound.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_packs(
    df: DataFrame,
    ctx_len: int,
    by: str = "source",
    order: str = "doc_id",
    n_tok: str = "n_tok",
    shards: int = 1,
) -> DataFrame:
    """Adds ``pack_id`` (window index within the stream) and ``pack_offset``
    (token offset of the document's first token inside the stream)."""
    cols = [F.col(by).alias("stream")]
    if shards > 1:
        cols.append(F.pmod(F.xxhash64(F.col(order)), F.lit(shards)).alias("_shard"))
        keys = ["stream", "_shard"]
    else:
        keys = ["stream"]
    d = df.select(*cols, F.col(order).alias("_ord"), F.col(n_tok).alias("_nt"))
    w = Window.partitionBy(*keys).orderBy("_ord")
    cum = F.sum("_nt").over(w)
    return d.select(
        "stream",
        F.col("_ord").alias(order),
        F.col("_nt").alias(n_tok),
        (cum - F.col("_nt")).alias("pack_offset"),
        F.floor((cum - F.col("_nt")) / ctx_len).cast("long").alias("pack_id"),
    )


def pack_stats(
    df: DataFrame,
    ctx_len: int,
    by: str = "source",
    order: str = "doc_id",
    n_tok: str = "n_tok",
    shards: int = 1,
) -> DataFrame:
    """Per-window occupancy: how many documents start in each window and how
    many of its tokens they contribute (a window can also carry the tail of
    a document that started earlier — tail tokens are accounted to the
    window the document started in; windows are cut, never padded)."""
    packs = assign_packs(df, ctx_len, by, order, n_tok, shards)
    return (
        packs.groupBy("stream", "pack_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok).alias("tok_started"),
            F.min("pack_offset").alias("first_offset"),
        )
        .withColumnRenamed("stream", by)
    )


# ---- deterministic global shuffle (training-order randomization) ----------

SHUFFLE_P = 2147483647  # 2^31-1, same modulus as the repo's text hashes
SHUFFLE_B = 31


def shuffle_rank(key_col: str, seed: str):
    """Deterministic pseudo-random rank for a row: the repo's polynomial
    hash folded over the characters of ``"<seed>:<key>"`` — pure Catalyst
    (aggregate over transform(sequence)), replayable closed-form in the
    DuckDB oracle, identical across runs and cluster shapes. Keys are
    short (ids), so the O(len) fold is trivial here — unlike document
    text, where the vectorized kernel (text_index.gram_hashes_udf) is the
    right tool. ``seed`` is a free-form user string interpolated into a
    SQL literal, so quotes/backslashes are escaped; ``key_col`` must be a
    plain column name (validated), not an expression."""
    import re

    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key_col):
        raise ValueError(f"key_col must be a plain column name: {key_col!r}")
    seed_lit = seed.replace("\\", "\\\\").replace("'", "\\'")
    s = f"concat('{seed_lit}', ':', cast({key_col} as string))"
    return F.expr(
        f"aggregate(transform(sequence(1, length({s})),"
        f"  i -> ascii(substring({s}, i, 1))),"
        f"  cast(0 as bigint),"
        f"  (h, c) -> (h * {SHUFFLE_B} + cast(c as bigint)) % {SHUFFLE_P})"
    )


def global_shuffle(
    df: DataFrame,
    key_col: str = "doc_id",
    seed: str = "epoch0",
    n_shards: int = 16,
) -> DataFrame:
    """Seeded deterministic global shuffle into ``n_shards`` — the
    training-order randomization step of an LLM data pipeline, expressed
    so a 1000-executor run and a laptop run produce the SAME permutation:

      - ``_rank`` = closed-form hash of (seed, key): the permutation IS
        the rank order, no RNG state, no partition-order dependence;
      - ``_shard`` = pmod(rank, n_shards): shards are hash-balanced (each
        gets a ~uniform slice of the rank space, so also of the corpus);
      - materializing is ONE ``repartitionByRange(_shard, _rank)`` +
        ``sortWithinPartitions`` write — the same two-stage shape as the
        engine's compaction rewrites; changing ``seed`` re-shuffles
        without touching the hash design (epoch reshuffling is free).

    Collision note: ranks collide at ~n²/2P; ties break by the key at the
    consumer (deterministic either way since ranks+keys are stable).
    Returns df + (_rank, _shard); callers write with
    ``partitionBy/_repartitionByRange`` or feed curriculum batching.
    """
    rank = shuffle_rank(key_col, seed)
    out = df.withColumn("_rank", rank)
    return out.withColumn(
        "_shard", F.pmod(F.col("_rank"), F.lit(n_shards)).cast("int")
    )
