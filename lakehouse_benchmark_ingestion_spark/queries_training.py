"""Training-data pipeline queries, batch 3: sequence packing, vocabulary
top-k, deterministic stratified sampling, duplicate-cluster resolution.

Each query is the Spark-first shape that survives 100 TB — window-function
packing (one shuffle per stream), partial-aggregated token counts with a
TakeOrdered top-k, arithmetic-hash sampling (map-only, no RNG state), and
join+groupBy label propagation for connected components — and each ships an
exact DuckDB oracle (same arithmetic, same tie-breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .sources.tokens import TOKENS_ORACLE_SQL, tokens_df
from .sources.tpch import load_table

CTX_LEN = 2048
TOPK = 100
SAMPLE_MOD = 100
SAMPLE_KEEP = 20  # 20% deterministic sample
SAMPLE_A = 2654435761
SAMPLE_C = 12345


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy stream packing into CTX_LEN-token windows (operators/
    packing.py): documents concatenate per source ordered by doc_id; each
    doc lands in the window where it starts. Output = per-window occupancy."""
    from .operators.packing import pack_stats

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id"),  # numeric order — same in both engines
        ((F.col("n_chars") / 4).cast("long") + 1).alias("n_tok"),
        "source",
    )
    return pack_stats(d, CTX_LEN).select(
        "source",
        "pack_id",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tok_started").cast("long").alias("tok_started"),
        F.col("first_offset").cast("long").alias("first_offset"),
    )


def q_token_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token-frequency top-k (vocabulary head): explode the token
    arrays, partial-aggregated count per token id, deterministic top-k
    (freq DESC, token ASC — TakeOrdered, no full sort)."""
    seq = tokens_df(spark, sf_dir)
    return (
        seq.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("token").asc())
        .limit(TOPK)
    )


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a document iff
    (doc_id*A + C) % 100 < 20 — an arithmetic hash, not an RNG, so the
    sample is reproducible across runs/engines, map-only (no shuffle), and
    pushes down to a scan filter. Certified per-stratum counts prove the
    rate lands near 20% in every source."""
    d = load_table(spark, sf_dir, "documents")
    keep = ((F.col("doc_id") * SAMPLE_A + SAMPLE_C) % SAMPLE_MOD) < SAMPLE_KEEP
    return (
        d.groupBy("source").agg(
            F.count("*").alias("n_total"),
            F.sum(keep.cast("long")).alias("n_sampled"),
        )
    )


def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → duplicate clusters: connected components via
    iterative min-label propagation (operators/dedup.duplicate_clusters)
    over the certified MinHash-LSH pair list. cluster_id = min doc_id of
    the component; doc_id == cluster_id marks the survivor."""
    from .operators.dedup import duplicate_clusters, minhash_dedup_pairs

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    pairs = minhash_dedup_pairs(d, jaccard_threshold=0.5, hash_fn="poly")
    return duplicate_clusters(pairs)


QUERIES = {
    "pipe_pack_sequences": q_pack_sequences,
    "pipe_token_topk": q_token_topk,
    "pipe_stratified_sample": q_stratified_sample,
    "pipe_dup_clusters": q_dup_clusters,
}

ORACLES = {
    "pipe_pack_sequences": f"""
        WITH seq AS (
          SELECT doc_id, CAST(n_chars // 4 + 1 AS BIGINT) AS n_tok, source
          FROM documents
        ),
        c AS (
          SELECT source, n_tok,
                 sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
          FROM seq
        )
        SELECT source,
               CAST((cum - n_tok) // {CTX_LEN} AS BIGINT) AS pack_id,
               count(*) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS tok_started,
               CAST(min(cum - n_tok) AS BIGINT) AS first_offset
        FROM c GROUP BY source, pack_id
    """,
    "pipe_token_topk": f"""
        WITH seq AS ({TOKENS_ORACLE_SQL}),
        t AS (SELECT unnest(tokens) AS token FROM seq)
        SELECT CAST(token AS INT) AS token, count(*) AS freq
        FROM t GROUP BY token
        ORDER BY freq DESC, token ASC LIMIT {TOPK}
    """,
    "pipe_stratified_sample": f"""
        SELECT source, count(*) AS n_total,
               CAST(sum(CASE WHEN (doc_id * {SAMPLE_A} + {SAMPLE_C}) % {SAMPLE_MOD}
                             < {SAMPLE_KEEP} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        FROM documents GROUP BY source
    """,
}


def _dup_clusters_oracle() -> str:
    # reuse the certified MinHash-LSH pairs oracle as the edge list, then
    # take its transitive closure with a recursive CTE (min reachable id =
    # the cluster label the Spark propagation loop converges to)
    from .queries_pipeline import ORACLES as PIPE

    pairs_sql = PIPE["pipe_dedup_minhash_pairs"]
    return f"""
        WITH RECURSIVE pairs AS (SELECT a_id, b_id FROM ({pairs_sql})),
        edges AS (
          SELECT a_id AS s, b_id AS d FROM pairs
          UNION
          SELECT b_id AS s, a_id AS d FROM pairs
        ),
        reach(node, r) AS (
          SELECT DISTINCT s, s FROM edges
          UNION
          SELECT rc.node, e.d FROM reach rc JOIN edges e ON e.s = rc.r
        )
        SELECT node AS doc_id, min(r) AS cluster_id
        FROM reach GROUP BY node
    """


ORACLES["pipe_dup_clusters"] = _dup_clusters_oracle()
