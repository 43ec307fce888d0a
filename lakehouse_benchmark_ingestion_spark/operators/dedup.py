"""Deduplication operators for the training-data pipeline.

Exact (content-hash groupBy), MinHash+LSH (shingle → minhash → band →
bucket-join), SimHash (word-hash sign aggregation), and n-gram Jaccard
verification. All hot paths are JVM built-ins (higher-order array functions,
explode+groupBy); Python never sees a row.

Scale notes (10^12 docs):
  - shingling + minhash are per-row map work — embarrassingly parallel;
  - the only shuffle is the LSH band-bucket groupBy (key = (band, hash));
    buckets are tiny except pathological near-identical clusters, which
    AQE skew-split handles;
  - candidate verification joins docs back by id — sort-merge on doc_id,
    prunable by the same file stats MERGE uses.

Two hash families:
  - ``xxhash64`` (default): fastest, JVM built-in;
  - ``poly``: the polynomial rolling hash (functions shared with the DuckDB
    oracles, which cannot evaluate xxhash64) — same algorithm, checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_P = 2147483647  # 2^31 - 1
HASH_B = 31

# MinHash permutation parameters: (a*h + b) mod P over the shingle hash.
# Odd multipliers, fixed seeds — deterministic across engines and runs.
MINHASH_PERMS = [(2 * i + 1, 104729 * (i + 1) % HASH_P) for i in range(16)]


def char_shingles(text: Column, n: int = 3, distinct: bool = True) -> Column:
    """Character n-gram array (1-based substring — same in DuckDB)."""
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text._jc.toString()}) - {n - 1}, 1)),"
        f" i -> substring({text._jc.toString()}, i, {n}))"
    )
    return F.array_distinct(grams) if distinct else grams


def _shingles_sql(col: str, n: int = 3) -> Column:
    grams = F.expr(
        f"transform(sequence(1, greatest(length({col}) - {n - 1}, 1)), i -> substring({col}, i, {n}))"
    )
    return F.array_distinct(grams)


def poly_hash(c: Column) -> Column:
    """Rolling-hash a string column (JVM fold; mirrors the oracle's
    list_reduce)."""
    codes = F.expr(
        f"transform(sequence(1, length({c._jc.toString()})), i -> ascii(substring({c._jc.toString()}, i, 1)))"
    )
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda h, ch: (h * HASH_B + ch.cast("long")) % HASH_P
    )


def _poly_hash_of(g: Column) -> Column:
    """Polynomial fold of one (lambda-bound) string column — nestable inside
    transform(); mirrors the oracle's list_reduce bit-for-bit."""
    return F.aggregate(
        F.transform(F.sequence(F.lit(1), F.length(g)), lambda i: F.ascii(g.substr(i, F.lit(1)))),
        F.lit(0).cast("long"),
        lambda h, ch: (h * HASH_B + ch.cast("long")) % HASH_P,
    )


def _poly_hash_flat(g: Column, n: int) -> Column:
    """Closed-form polynomial hash of an exactly-n-char gram:
    sum(code(g[i]) * B^(n-1-i)) % P — identical to the left fold for grams
    of length n (and zero-padded semantics for the degenerate shorter grams
    a text with < n chars produces; ascii('') == 0 in both Spark and
    DuckDB). Flat arithmetic stays in whole-stage codegen; the fold is an
    interpreted nested higher-order function — measured ~2x slower."""
    parts = [
        F.ascii(g.substr(i + 1, 1)).cast("long") * (HASH_B ** (n - 1 - i))
        for i in range(n)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out % HASH_P


def shingle_hashes(
    text_col: str, n: int = 3, hash_fn: str = "xxhash64", distinct: bool = True
) -> Column:
    """Array of int64 hashes in [0, P), one per distinct shingle.

    ``distinct=False`` skips the dedupe pass — sound wherever the consumer
    is duplicate-insensitive (a MIN over permuted hashes doesn't care how
    many times a shingle occurs), and saves a full per-row hash-set build.
    """
    grams = F.expr(
        f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)),"
        f" i -> substring({text_col}, i, {n}))"
    )
    if distinct:
        grams = F.array_distinct(grams)
    if hash_fn == "xxhash64":
        return F.transform(grams, lambda g: F.pmod(F.xxhash64(g), F.lit(HASH_P)))
    return F.transform(grams, lambda g: _poly_hash_flat(g, n))


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n: int = 3,
    n_perms: int = 16,
    hash_fn: str = "xxhash64",
    out_col: str = "minhash",
) -> DataFrame:
    """MinHash signatures: returns every df column EXCEPT ``text_col``,
    plus an array<long> signature column (text never enters the shuffle).

    signature[j] = min over shingles s of (a_j * H(s) + b_j) mod P.
    ``hash_fn="poly"`` uses the DuckDB-matchable rolling hash.
    """
    # CPU-heavy per row: widen single-split small inputs to the cluster
    # parallelism (guarded, so an already-wide caller pays nothing)
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        df = df.repartition(par)
    # explode + groupBy, NOT 16 parallel array_min(transform(hashes, ...)):
    # Catalyst re-inlines the (interpreted-HOF) gram-hash expression into
    # every permutation, recomputing the shingle hashing n_perms times.
    # Exploding hashes each gram ONCE; the 16 permutation mins are then
    # cheap codegen arithmetic with map-side partial aggregation.
    # Two deliberate exclusions from the hot path:
    #   - text_col is dropped BEFORE the explode: grouping by the raw text
    #     would hash+shuffle kilobytes of key per exploded gram row;
    #   - shingles are NOT deduped: MIN over permuted hashes is
    #     duplicate-insensitive, so array_distinct's per-row hash-set
    #     build buys nothing here.
    group_cols = [c for c in df.columns if c != text_col]
    hashes = shingle_hashes(text_col, n, hash_fn, distinct=False)
    exploded = df.withColumn("_h", F.explode(hashes)).select(*group_cols, "_h")
    aggs = [
        F.min(F.pmod(F.col("_h") * a + b, F.lit(HASH_P))).alias(f"_m{j}")
        for j, (a, b) in enumerate(MINHASH_PERMS[:n_perms])
    ]
    return (
        exploded.groupBy(*group_cols)
        .agg(*aggs)
        .select(
            *group_cols,
            F.array(*[F.col(f"_m{j}") for j in range(n_perms)]).alias(out_col),
        )
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    sig_col: str = "minhash",
    band_size: int = 4,
    max_bucket_size: int = 512,
) -> DataFrame:
    """Band the signatures and emit candidate pairs sharing any band bucket.

    Returns (a_id, b_id) with a < b, distinct. The band groupBy is the only
    shuffle; self-join happens within tiny buckets via collect_list.

    ``max_bucket_size`` caps degenerate buckets (mass-duplicated boilerplate
    is common in web corpora and would otherwise build an O(b²) row out of a
    single collect_list): only the ``max_bucket_size`` smallest ids per
    (band, bucket) — deterministic row_number over the bucket — enter the
    pair expansion, bounding any bucket's cost at O(cap²). Docs dropped from
    a giant bucket are near-exact duplicates of its survivors and are caught
    by the exact-dedup pass (content-hash groupBy) anyway.
    """
    n_perms = len(MINHASH_PERMS)
    n_bands = n_perms // band_size
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ":",
                        *[F.element_at(F.col(sig_col), b * band_size + j + 1) for j in range(band_size)],
                    )
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    from pyspark.sql import Window

    exploded = sig_df.select(F.col(id_col), F.explode(bands).alias("bb")).select(
        id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    wnd = Window.partitionBy("band", "bucket").orderBy(F.col(id_col))
    capped = (
        exploded.withColumn("_rn", F.row_number().over(wnd))
        .filter(F.col("_rn") <= max_bucket_size)
        .drop("_rn")
    )
    grouped = capped.groupBy("band", "bucket").agg(
        F.collect_list(id_col).alias("ids")
    ).filter(F.size("ids") > 1)
    pairs = grouped.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids) - i - 1), y -> "
                "struct(least(x, y) AS a, greatest(x, y) AS b))))"
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a_id"), F.col("p.b").alias("b_id"))
    return pairs.distinct()


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    n: int = 3,
    hash_fn: str = "xxhash64",
    max_bucket_size: int = 512,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: signature → LSH candidates →
    exact n-gram Jaccard verification of candidates only.

    ``hash_fn="poly"`` makes every stage DuckDB-replayable (the driver
    oracle); xxhash64 is the faster production default."""
    # the signature stage is CPU-heavy per row; small inputs arrive as ONE
    # file split and would serialize it on one core. Widen to the cluster's
    # parallelism first — at 100 TB the scan already has thousands of
    # splits and this repartition is a near-no-op reshuffle of (id, text).
    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.select(id_col, text_col).repartition(par, id_col)
    sig = minhash_signature(df, text_col, n=n, hash_fn=hash_fn)
    cands = lsh_candidate_pairs(sig, id_col=id_col, max_bucket_size=max_bucket_size)
    docs = df.select(
        F.col(id_col), _shingles_sql(text_col, n).alias("_grams")
    )
    a = docs.select(F.col(id_col).alias("a_id"), F.col("_grams").alias("ga"))
    b = docs.select(F.col(id_col).alias("b_id"), F.col("_grams").alias("gb"))
    verified = (
        cands.join(a, "a_id").join(b, "b_id")
        .withColumn("inter", F.size(F.array_intersect("ga", "gb")))
        .withColumn("uni", F.size("ga") + F.size("gb") - F.col("inter"))
        .filter(F.col("inter") >= F.col("uni") * jaccard_threshold)
        .select("a_id", "b_id", "inter", "uni")
    )
    return verified


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_bits: int = 31,
    out_col: str = "simhash",
) -> DataFrame:
    """Word-level SimHash via explode + per-bit sign aggregation.

    hash each whitespace word (poly hash — oracle-matchable), then
    bit j of the signature = 1 iff sum over words of (2*bit_j(h) - 1) > 0.
    explode+groupBy keeps it in codegen; the shuffle key is the doc id.
    """
    words = df.select(
        F.col(id_col), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("w")
    )
    h = F.aggregate(
        F.expr("transform(sequence(1, length(w)), i -> ascii(substring(w, i, 1)))"),
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * HASH_B + ch.cast("long")) % HASH_P,
    )
    hashed = words.select(id_col, h.alias("h"))
    bit_sums = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1
            ).alias(f"b{j}")
            for j in range(n_bits)
        ]
    )
    sig = bit_sums.select(
        id_col,
        sum(
            [F.when(F.col(f"b{j}") > 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long")) for j in range(n_bits)],
            F.lit(0).cast("long"),
        ).alias(out_col),
    )
    return sig


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: one survivor (min id) per content hash."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_md5"))
        .agg(F.min(id_col).alias("keeper"), F.count("*").alias("n_copies"))
    )


def duplicate_clusters(
    pairs: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
    max_iter: int = 25,
) -> DataFrame:
    """Resolve near-dup candidate PAIRS into duplicate CLUSTERS:
    connected components by iterative min-label propagation.

    A pair list says "a duplicates b"; keeping one survivor per *cluster*
    (not per pair) needs the transitive closure — A~B, B~C ⇒ {A,B,C} is one
    cluster with one survivor. The distributed algorithm is the standard
    large-graph one (no GraphFrames dependency): every node starts labeled
    with itself; each round every node takes the min label over itself and
    its neighbors (one equi-join + one groupBy per round), PLUS the label of
    its own label (pointer jumping — path halving); stop when a round
    changes nothing. Neighbor propagation alone needs diameter rounds —
    near-dup chains (A~B~C~...) make that linear; pointer jumping compresses
    paths geometrically, so convergence is O(log diameter) shuffles even for
    chain-shaped clusters. Each round's joins are keyed on node/label id
    (hash shuffle, no skew beyond the largest cluster's degree).

    Returns (doc_id, cluster_id) for every node that appears in any pair;
    cluster_id = min doc_id of the component, so ``doc_id == cluster_id``
    marks the survivor.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    # iterative algorithms must TRUNCATE lineage each round: a plan that
    # references the previous labels three times grows 3^k nodes after k
    # rounds and OOMs the driver just printing itself. localCheckpoint cuts
    # the logical plan at materialized partitions (on a real cluster with a
    # checkpoint dir, df.checkpoint() is the fault-tolerant variant).
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    prev_fp: int | None = None
    for _ in range(max_iter):
        # neighbor labels: for each edge dst, the label of src
        nb = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "lbl")
        # pointer jumping: the label of my label (path halving)
        jump = (
            labels.withColumnRenamed("lbl", "_mid")
            .join(
                labels.select(
                    F.col("node").alias("_mid"), F.col("lbl").alias("_root")
                ),
                "_mid",
            )
            .select("node", F.col("_root").alias("lbl"))
        )
        new_labels = (
            nb.unionByName(labels).unionByName(jump)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=True)
        )
        # convergence: a full-shuffle join-and-compare per round would cost
        # as much as the round itself; instead fingerprint the labeling with
        # one map-side agg over the just-materialized partitions (bit_xor of
        # per-row 64-bit hashes: order-independent, overflow-free under ANSI
        # — equal fingerprints on different labelings need hash deltas to
        # cancel exactly, ~2^-64/round), then CONFIRM the suspected fixed
        # point with the exact join ONCE before exiting
        fp = new_labels.agg(
            F.expr("bit_xor(xxhash64(node, lbl))").alias("h"),
        ).collect()[0]["h"]
        if prev_fp is not None and fp == prev_fp:
            changed = (
                new_labels.join(
                    labels.withColumnRenamed("lbl", "old"), "node"
                )
                .filter(F.col("lbl") != F.col("old"))
                .limit(1)
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        else:
            labels = new_labels
        prev_fp = fp
    return labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )
