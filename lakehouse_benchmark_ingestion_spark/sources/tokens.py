"""Deterministic synthesis of the pre-tokenized sequences table.

The target table (BASELINE.json input_hint / FIXTURES.md §1):
    (doc_id: string, tokens: array<int32>, n_tok: int32, source: string)
derived from the driver fixture ``documents.parquet``. The generator is a
pure-arithmetic LCG chosen so the SAME rows are expressible in DuckDB SQL —
this makes every downstream maintenance operator (compaction, clustering,
MERGE INTO, snapshot isolation) checkable by the driver's DuckDB oracle
under exact token-array equality:

    n_tok      = n_chars // 4 + 1
    tokens[i]  = (doc_id * 1103515245 + i * 2654435761 + 12345) % 50257
    doc_id_str = CAST(doc_id AS STRING)
    source     = documents.source   (Zipf-skewed in the fixtures)

All values stay far below int64 overflow (max doc_id ~5e3 at sf0.1).
The reference's PK requirement (MysqlCDCCatalog.java:212-216) maps to
doc_id being unique/not-null; upsert semantics hang off it.

The Spark side is pure built-in expressions (transform/sequence) — JVM
whole-stage-codegen, no Python in the loop at all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# generator constants (shared by Spark and oracle SQL — keep in lockstep)
GEN_A = 1103515245
GEN_B = 2654435761
GEN_C = 12345
VOCAB = 50257

# merge-batch generator constants (different stream → detectably different arrays)
UPD_A = 69069
UPD_B = 362437
UPD_C = 8675309

TOKENS_SCHEMA_DDL = "doc_id string, tokens array<int>, n_tok int, source string"


def _token_expr(seed_col: str, n_col: str, a: int, b: int, c: int) -> str:
    """Spark SQL expression producing the token array for one row."""
    return (
        f"transform(sequence(0, {n_col} - 1), "
        f"i -> CAST(({seed_col} * {a}L + CAST(i AS BIGINT) * {b}L + {c}L) % {VOCAB} AS INT))"
    )


def tokens_df(spark: SparkSession, sf_dir: str, replicate: int = 1) -> DataFrame:
    """Sequences table derived from ``{sf_dir}/documents.parquet``.

    ``replicate > 1`` scales the table for benchmarks: each document yields
    ``replicate`` rows with distinct doc_ids and distinct token streams
    (seed = doc_id * replicate + r), still fully deterministic. Oracle
    queries always use replicate=1.
    """
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    if replicate == 1:
        base = docs.select(
            F.col("doc_id").alias("seed"),
            F.col("doc_id").cast("string").alias("doc_id"),
            (F.col("n_chars") / 4).cast("long").alias("_nt_raw"),
            F.col("source"),
        )
    else:
        reps = spark.range(replicate).withColumnRenamed("id", "r")
        base = docs.crossJoin(reps).select(
            (F.col("doc_id") * replicate + F.col("r")).alias("seed"),
            F.concat_ws("-", F.col("doc_id").cast("string"), F.col("r").cast("string")).alias(
                "doc_id"
            ),
            (F.col("n_chars") / 4).cast("long").alias("_nt_raw"),
            F.col("source"),
        )
    base = base.withColumn("n_tok", (F.col("_nt_raw") + 1).cast("int"))
    return base.select(
        "doc_id",
        F.expr(_token_expr("seed", "n_tok", GEN_A, GEN_B, GEN_C)).alias("tokens"),
        "n_tok",
        "source",
    )


# DuckDB CTE producing the identical table (replicate=1). ``//`` is DuckDB
# integer division; range(n) is [0, n).
TOKENS_ORACLE_SQL = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       list_transform(range(n_chars // 4 + 1),
                      i -> CAST((doc_id * {GEN_A} + i * {GEN_B} + {GEN_C}) % {VOCAB} AS INT)) AS tokens,
       CAST(n_chars // 4 + 1 AS INT) AS n_tok,
       source
FROM documents
"""


# --------------------------------------------------------------------------
# token-array digest: the driver's result canonicalizer cannot hash raw
# array<int> columns (pandas sort_values → "unhashable type: list"), so
# scan queries certify token-array equality through a position-weighted
# scalar digest instead: digest = Σ tokens[i]·(i+1) (1-based weight). The
# digest is order-sensitive, so any reorder/corruption of the array changes
# it; both engines compute it with exact int64 arithmetic (max value
# ~50257·n²/2 ≪ 2^63 for any realistic n_tok).
# --------------------------------------------------------------------------

TOK_DIGEST_SPARK = (
    "aggregate(transform(tokens, (x, i) -> cast(x as bigint) * (i + 1)), "
    "cast(0 as bigint), (a, b) -> a + b)"
)

# DuckDB lambda index is 1-based, so the weight is just ``i``.
TOK_DIGEST_DUCK = (
    "CAST(list_sum(list_transform(tokens, (x, i) -> CAST(x AS BIGINT) * i)) AS BIGINT)"
)


def digest_scan_sql(inner_sql: str) -> str:
    """Wrap a (doc_id, tokens, n_tok, source) producing query with the
    scalar-digest projection the driver-facing scan queries return."""
    return (
        f"SELECT doc_id, n_tok, source, {TOK_DIGEST_DUCK} AS tok_digest "
        f"FROM ({inner_sql})"
    )


def updates_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic MERGE INTO input batch (FIXTURES.md §2).

    Schema: (doc_id string, tokens array<int>, n_tok int, source string, _seq long)
      - updates: existing keys with doc_id % 3 == 0 → new token stream, source
        suffixed '_m' (tests cluster-key movement);
      - intra-batch duplicates: keys with doc_id % 9 == 0 appear TWICE
        (_seq 1 and 2); the _seq=2 version (offset constant +1) must win
        (last-writer-wins, IcebergCatalogSync.java:112-114 upsert semantics);
      - inserts: brand-new keys 1000000 + doc_id for doc_id % 7 == 0.
    """
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    upd = docs.filter(F.col("doc_id") % 3 == 0).select(
        F.col("doc_id").alias("seed"),
        F.col("doc_id").cast("string").alias("doc_id"),
        ((F.col("n_chars") / 5).cast("int") + 2).alias("n_tok"),
        F.concat(F.col("source"), F.lit("_m")).alias("source"),
        F.lit(1).cast("long").alias("_seq"),
    )
    dup = docs.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 1).alias("seed"),  # different stream for the winner
        F.col("doc_id").cast("string").alias("doc_id"),
        ((F.col("n_chars") / 5).cast("int") + 2).alias("n_tok"),
        F.concat(F.col("source"), F.lit("_m")).alias("source"),
        F.lit(2).cast("long").alias("_seq"),
    )
    ins = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1000000).alias("seed"),
        (F.col("doc_id") + 1000000).cast("string").alias("doc_id"),
        ((F.col("n_chars") / 6).cast("int") + 3).alias("n_tok"),
        F.lit("src_new").alias("source"),
        F.lit(1).cast("long").alias("_seq"),
    )
    with_tok = (
        upd.unionByName(dup).unionByName(ins)
        .select(
            "doc_id",
            F.expr(_token_expr("seed", "n_tok", UPD_A, UPD_B, UPD_C)).alias("tokens"),
            "n_tok",
            "source",
            "_seq",
        )
    )
    return with_tok


def _upd_tokens_sql(seed_expr: str, ntok_expr: str) -> str:
    return (
        f"list_transform(range({ntok_expr}), "
        f"i -> CAST((({seed_expr}) * {UPD_A} + i * {UPD_B} + {UPD_C}) % {VOCAB} AS INT))"
    )


UPDATES_ORACLE_SQL = f"""
SELECT CAST(doc_id AS VARCHAR) AS doc_id,
       {_upd_tokens_sql('doc_id', 'n_chars // 5 + 2')} AS tokens,
       CAST(n_chars // 5 + 2 AS INT) AS n_tok,
       source || '_m' AS source,
       CAST(1 AS BIGINT) AS _seq
FROM documents WHERE doc_id % 3 = 0
UNION ALL
SELECT CAST(doc_id AS VARCHAR),
       {_upd_tokens_sql('doc_id + 1', 'n_chars // 5 + 2')},
       CAST(n_chars // 5 + 2 AS INT),
       source || '_m',
       CAST(2 AS BIGINT)
FROM documents WHERE doc_id % 9 = 0
UNION ALL
SELECT CAST(doc_id + 1000000 AS VARCHAR),
       {_upd_tokens_sql('doc_id + 1000000', 'n_chars // 6 + 3')},
       CAST(n_chars // 6 + 3 AS INT),
       'src_new',
       CAST(1 AS BIGINT)
FROM documents WHERE doc_id % 7 = 0
"""

# The post-MERGE table, expressed declaratively: last-writer-wins within the
# batch, then upsert over the base table, then inserts. This is the oracle
# for the engine's stats-pruned copy-on-write MERGE (operators/merge_into.py).
MERGE_FINAL_ORACLE_SQL = f"""
WITH base AS ({TOKENS_ORACLE_SQL}),
updates AS ({UPDATES_ORACLE_SQL}),
winners AS (
  SELECT doc_id, tokens, n_tok, source
  FROM (
    SELECT u.*, row_number() OVER (PARTITION BY doc_id ORDER BY _seq DESC) AS rn
    FROM updates u
  ) WHERE rn = 1
)
SELECT b.doc_id, b.tokens, b.n_tok, b.source
FROM base b ANTI JOIN winners w ON b.doc_id = w.doc_id
UNION ALL
SELECT doc_id, tokens, n_tok, source FROM winners
"""


# --------------------------------------------------------------------------
# CDC changelog feed: a deterministic 3-stage Debezium-style op stream for
# the streaming CDC-apply path (streaming/cdc.py). Stage k is one micro-batch
# (the reference's checkpoint==commit cadence); ordering across stages is
# load-bearing — stage 2 deletes keys stage 1 updated, stage 3 re-inserts a
# subset of the deleted keys.
#   stage 1 (_seq 1): op U for doc_id%3==0 (new stream, source||'_c')
#                     op I for new keys doc_id+2000000 where doc_id%7==0
#   stage 2 (_seq 2): op D for doc_id%5==0
#   stage 3 (_seq 3): op I for doc_id%10==0 (re-insert after delete)
# --------------------------------------------------------------------------


def cdc_feed_stages(spark: SparkSession, sf_dir: str) -> list[DataFrame]:
    """Three ordered changelog micro-batches with schema
    (doc_id, tokens, n_tok, source, _op string, _seq long)."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))

    def img(flt, seed_expr, ntok_expr, source_expr, op, seq):
        rows = docs.filter(flt).select(
            seed_expr.alias("seed"),
            F.col("doc_id").cast("string").alias("_base_id"),
            ntok_expr.cast("int").alias("n_tok"),
            source_expr.alias("source"),
        )
        return rows.select(
            F.col("_base_id").alias("doc_id"),
            F.expr(_token_expr("seed", "n_tok", UPD_A, UPD_B, UPD_C)).alias("tokens"),
            "n_tok",
            "source",
            F.lit(op).alias("_op"),
            F.lit(seq).cast("long").alias("_seq"),
        )

    upd = img(
        F.col("doc_id") % 3 == 0,
        F.col("doc_id"),
        (F.col("n_chars") / 5).cast("int") + 2,
        F.concat(F.col("source"), F.lit("_c")),
        "U",
        1,
    )
    new = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 2000000).alias("seed"),
        (F.col("doc_id") + 2000000).cast("string").alias("doc_id"),
        ((F.col("n_chars") / 6).cast("int") + 3).alias("n_tok"),
        F.lit("src_cdc").alias("source"),
    )
    new = new.select(
        "doc_id",
        F.expr(_token_expr("seed", "n_tok", UPD_A, UPD_B, UPD_C)).alias("tokens"),
        "n_tok",
        "source",
        F.lit("I").alias("_op"),
        F.lit(1).cast("long").alias("_seq"),
    )
    dele = docs.filter(F.col("doc_id") % 5 == 0).select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.expr("array()").cast("array<int>").alias("tokens"),
        F.lit(0).cast("int").alias("n_tok"),
        F.lit("del").alias("source"),
        F.lit("D").alias("_op"),
        F.lit(2).cast("long").alias("_seq"),
    )
    reins = img(
        F.col("doc_id") % 10 == 0,
        F.col("doc_id") + 2,
        (F.col("n_chars") / 6).cast("int") + 3,
        F.lit("src_re"),
        "I",
        3,
    )
    return [upd.unionByName(new), dele, reins]


# The post-CDC table, declaratively: untouched rows, surviving updates,
# re-inserts, and brand-new inserts. %5 keys are deleted unless %10
# re-inserted them; %3 updates survive only where not deleted.
CDC_FINAL_ORACLE_SQL = f"""
WITH base AS ({TOKENS_ORACLE_SQL})
SELECT b.doc_id, b.tokens, b.n_tok, b.source
FROM base b JOIN documents d ON b.doc_id = CAST(d.doc_id AS VARCHAR)
WHERE d.doc_id % 5 <> 0 AND d.doc_id % 3 <> 0
UNION ALL
SELECT CAST(doc_id AS VARCHAR),
       {_upd_tokens_sql('doc_id', 'n_chars // 5 + 2')},
       CAST(n_chars // 5 + 2 AS INT),
       source || '_c'
FROM documents WHERE doc_id % 3 = 0 AND doc_id % 5 <> 0
UNION ALL
SELECT CAST(doc_id AS VARCHAR),
       {_upd_tokens_sql('doc_id + 2', 'n_chars // 6 + 3')},
       CAST(n_chars // 6 + 3 AS INT),
       'src_re'
FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT CAST(doc_id + 2000000 AS VARCHAR),
       {_upd_tokens_sql('doc_id + 2000000', 'n_chars // 6 + 3')},
       CAST(n_chars // 6 + 3 AS INT),
       'src_cdc'
FROM documents WHERE doc_id % 7 = 0
"""
