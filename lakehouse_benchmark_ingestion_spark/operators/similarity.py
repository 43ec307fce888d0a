"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — probes broadcast against one corpus
scan, vector math in JVM zip_with/aggregate folds. Scale path: LSH with
deterministic random-hyperplane signatures — candidates only within matching
buckets, then exact re-scoring (recall < 1, measured by tests against the
brute-force truth).

At 10^12 rows the brute-force variant is the per-bucket verifier, not the
global scan; the bucket groupBy is the only shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# deterministic hyperplane weights: w(p, d) in [-0.5, 0.5)
#   w = ((p * 8191 + d) * 2654435761 mod 1000003) / 1000003 - 0.5
_W_MOD = 1000003
_W_MUL = 2654435761


def hyperplane_weights(n_planes: int, dim: int) -> list[list[float]]:
    return [
        [
            (((p * 8191 + d) * _W_MUL) % _W_MOD) / _W_MOD - 0.5
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


FLAT_DIM = 64  # the embeddings fixture's dimensionality


def _widen(df: DataFrame) -> DataFrame:
    """Small corpora arrive as ONE file split; the per-row vector math would
    serialize on one core. Reshuffle to the cluster parallelism (at real
    scale the scan already has thousands of splits — near-no-op)."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def dot(a: Column, b: Column, dim: int | None = FLAT_DIM) -> Column:
    """JVM-side dot product, bit-identical to the DuckDB oracle's
    sequential evaluation order.

    With ``dim`` (the default — the fixture dimensionality), the sum is a
    FLAT left-associated expression (0.0 + p1 + p2 + ...): same IEEE result
    as the fold, but plain arithmetic that whole-stage codegen compiles,
    instead of an interpreted higher-order aggregate (measured several-x on
    the rescoring joins). Requires both arrays to have exactly ``dim``
    elements (element_at past the end yields null and poisons the sum —
    loudly, not silently). ``dim=None`` falls back to the generic fold."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x * y).cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    out = F.lit(0.0)
    for i in range(1, dim + 1):
        out = out + (F.element_at(a, i) * F.element_at(b, i)).cast("double")
    return out


def cosine(a: Column, b: Column) -> Column:
    # hybrid: the cross-dot is flat (the hot term), the two self-norms stay
    # folds — three flat dots in ONE expression blow the generated method
    # past the JVM's 64 KB limit and force a whole-stage interpreted
    # fallback (logged "Failed to compile the generated Java code").
    # HOT PATHS should not use this per pair: precompute norm() per ROW
    # before the pair join and divide (pair_cosine) — bit-identical, O(rows)
    # norms instead of O(pairs).
    return dot(a, b) / (F.sqrt(dot(a, a, dim=None)) * F.sqrt(dot(b, b, dim=None)))


def norm(v: Column) -> Column:
    """Per-row L2 norm. The fold accumulates in the same left-associated
    IEEE order as the flat dot (0.0 + p1 + p2 + ...; float*float multiply
    then cast), so computing norms BEFORE a pair join then dividing is
    bit-identical to ``cosine()`` per pair — while costing O(rows) instead
    of O(pairs) norm evaluations."""
    return F.sqrt(dot(v, v, dim=None))


def pair_cosine(a: Column, b: Column, a_norm: Column, b_norm: Column) -> Column:
    """Cosine from a flat cross-dot and precomputed per-row norms — the one
    expensive term per pair stays in whole-stage codegen; value is
    bit-identical to ``cosine(a, b)``."""
    return dot(a, b) / (a_norm * b_norm)


def brute_force_topk(
    df: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: broadcast probes × corpus scan, per-probe window.

    probes must have columns (query_id, qv)."""
    cand = _widen(
        df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    ).withColumn("_cn", norm(F.col("cv")))
    probes_n = probes.withColumn("_qn", norm(F.col("qv")))
    pairs = F.broadcast(probes_n).crossJoin(cand).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            pair_cosine(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def lsh_signature(
    df: DataFrame,
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int = 64,
    out_col: str = "lsh_bucket",
) -> DataFrame:
    """Random-hyperplane signature: bucket = bits of sign(v · w_p).

    Weights are literal arrays (deterministic), the dot products run in
    zip_with folds — one map pass, no shuffle, no Python.
    """
    planes = hyperplane_weights(n_planes, dim)
    bucket = F.lit(0).cast("long")
    for p, w in enumerate(planes):
        wcol = F.array(*[F.lit(x) for x in w])
        bit = (dot(F.col(vec_col), wcol, dim=None) > 0).cast("long")
        bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
    return df.withColumn(out_col, bucket)


def lsh_tables(
    df: DataFrame,
    vec_col: str,
    n_tables: int = 8,
    band_size: int = 4,
    dim: int = 64,
    out_col: str = "bucket",
) -> DataFrame:
    """OR-amplified LSH: L independent tables of b hyperplanes each; a row
    lands in one bucket per table (exploded). Candidates = rows sharing a
    bucket in ANY table — collision prob 1-(1-(1-θ/π)^b)^L, tunable for the
    recall/candidate-count tradeoff. One map pass + explode; no Python."""
    entries = []
    for t in range(n_tables):
        # deterministic distinct planes per (table, band position)
        bucket = F.lit(0).cast("long")
        for j in range(band_size):
            wrow = _table_plane(t, j, dim)
            wcol = F.array(*[F.lit(x) for x in wrow])
            bit = (dot(F.col(vec_col), wcol, dim=None) > 0).cast("long")
            bucket = bucket.bitwiseOR(F.shiftleft(bit, j))
        entries.append(
            F.struct(F.lit(t).alias("tbl"), bucket.alias("bkt"))
        )
    return df.withColumn("_e", F.explode(F.array(*entries))).select(
        *df.columns, F.col("_e.tbl").alias("lsh_table"), F.col("_e.bkt").alias(out_col)
    )


def _table_plane(t: int, j: int, dim: int) -> list[float]:
    """Deterministic hyperplane for table t, position j."""
    p = t * 101 + j
    return [
        (((p * 8191 + d) * _W_MUL) % _W_MOD) / _W_MOD - 0.5 for d in range(dim)
    ]


def lsh_ann_topk(
    df: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_tables: int = 8,
    band_size: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: candidates share a bucket in ANY of the L hash
    tables; exact cosine re-scoring on candidates only. probes: (query_id, qv)."""
    corpus = lsh_tables(
        _widen(
            df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        ).withColumn("_cn", norm(F.col("cv"))),
        "cv",
        n_tables,
        band_size,
        dim,
    )
    probes_b = lsh_tables(
        probes.withColumn("_qn", norm(F.col("qv"))), "qv", n_tables, band_size, dim
    )
    pairs = (
        F.broadcast(probes_b)
        .join(corpus, ["lsh_table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        # norms are deterministic functions of the vectors, so carrying them
        # through the candidate de-dup cannot create extra distinct rows
        .select("query_id", "qv", "_qn", "neighbor_id", "cv", "_cn")
        .distinct()  # de-dup candidates found in several tables
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            pair_cosine(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iters: int = 3,
) -> list[tuple[int, list[float]]]:
    """Distributed Lloyd iterations producing the IVF coarse quantizer.

    Init = the k lowest-id vectors (deterministic); each iteration assigns
    every row to its nearest centroid (cosine, centroid vectors inlined as
    literal arrays — one map pass, no shuffle beyond the groupBy) and
    recomputes centroids as the element-wise mean via posexplode +
    groupBy(cell, dim) — k·dim tiny rows to the driver per iteration.

    At 10^12 rows you run this on a sample; the assignment pass shape is
    identical. Float summation order across partitions makes low-order bits
    run-dependent, which is why the oracle-certified IVF query keeps the
    deterministic id-sample centroids — this is the production quantizer,
    tested by quantization-error improvement, not bit equality."""
    from pyspark.sql import functions as F

    cents = [
        (int(r[0]), [float(x) for x in r[1]])
        for r in df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    ]
    dim = len(cents[0][1])
    for _ in range(iters):
        assigned = ivf_cells(
            df.select(F.col(vec_col).alias("v")), cents, "v", n_cells=1
        ).withColumn("cell", F.col("cell")[0])
        means = (
            assigned.select("cell", F.posexplode("v").alias("d", "x"))
            .groupBy("cell", "d")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .collect()
        )
        by_cell: dict[int, list[float]] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), [0.0] * dim)[int(r["d"])] = float(r["m"])
        # empty cells keep their previous centroid
        cents = [
            (cid, by_cell.get(cid, vec)) for cid, vec in cents
        ]
    return cents


def quantization_error(df: DataFrame, centroids, vec_col: str = "embedding") -> float:
    """Mean (1 - cosine-to-nearest-centroid) — the objective kmeans improves."""
    from pyspark.sql import functions as F

    if len(centroids) > CENTROID_LITERAL_MAX:
        # large K: the greatest()-fold below also grows the plan O(K*dim);
        # reuse the broadcast-matrix ranking (rounded at 6 decimals — noise
        # for an objective metric)
        best = F.element_at(
            _centroid_rank_pandas(vec_col, centroids, top_n=1), 1
        )["c"]
        row = df.select(F.avg(F.lit(1.0) - best).alias("err")).collect()[0]
        return float(row["err"])
    best = None
    for _cid, w in centroids:
        wcol = F.array(*[F.lit(float(x)).cast("double") for x in w])
        ww = sum(float(x) * float(x) for x in w) ** 0.5
        c = dot(F.col(vec_col), wcol) / (
            F.sqrt(dot(F.col(vec_col), F.col(vec_col))) * F.lit(ww)
        )
        best = c if best is None else F.greatest(best, c)
    row = df.select(F.avg(F.lit(1.0) - best).alias("err")).collect()[0]
    return float(row["err"])


def ivf_cells(
    df: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str,
    n_cells: int,
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector its ``n_cells`` nearest coarse-quantizer cells.

    IVF (inverted-file) coarse quantization: ``centroids`` is a small
    driver-side list of (cid, vector); each row scores all K centroids with
    JVM fold cosines (centroid vectors inlined as literal arrays — zero
    shuffle, zero Python) and keeps the top ``n_cells`` ids via a sorted
    array of (cosine, -cid) structs. At 10^12 rows this map-only pass is the
    whole assignment cost; the centroids themselves would come from a
    sampled k-means — here they are a deterministic corpus sample so the
    DuckDB oracle can replay the exact algorithm.

    ``out_col`` holds an ``array<bigint>`` of cell ids (length n_cells).
    """
    ranked = _centroid_rank_array(vec_col, centroids, top_n=n_cells)
    cells = F.transform(
        F.slice(ranked, 1, n_cells), lambda s: -s["nid"]
    )
    return df.withColumn(out_col, cells)


#: above this many centroids the ranking switches from inlined literal
#: arrays (zero Python, but the Catalyst projection tree grows O(K*dim)
#: and plan compilation becomes the bottleneck long before execution —
#: SemDeDup's own "K proportional to corpus" contract implies K~1e5 at
#: 1e12 rows) to ONE vectorized pandas UDF over a broadcast numpy
#: centroid matrix: plan size O(1) in K, assignment stays the same
#: N*K-flop map-only pass, now as a BLAS matmul per Arrow batch.
CENTROID_LITERAL_MAX = 256


def _centroid_rank_array(
    vec_col: str, centroids, top_n: int | None = None
) -> Column:
    """Centroid ranking expression shared by ``ivf_cells`` and ``semdedup``:
    an array of (rounded cosine, -cid) structs sorted best-first, so
    element 1 is the assigned cell and carries the centroid cosine.

    ``top_n`` bounds the emitted prefix: consumers only ever read the
    first ``nprobe``/1 entries, and at the K~1e5 scale the pandas path
    targets, a full K-length ranked array per row (~MB of Arrow output)
    would dwarf the input vectors. ``None`` keeps the full ranking.

    A zero-norm vector's cosine is 0/0 = NaN; both paths map it to -inf
    BEFORE ranking so the two physical strategies order it identically
    (Spark's sort_array treats NaN as the LARGEST double while np.lexsort
    places it last — a raw NaN would flip the assigned cell across the
    CENTROID_LITERAL_MAX threshold).

    Two physical strategies behind one contract (same column type, same
    ordering, same 6-decimal rounding): literal JVM folds below
    ``CENTROID_LITERAL_MAX`` centroids, a broadcast-matrix pandas UDF
    above it (``_centroid_rank_pandas``)."""
    if len(centroids) > CENTROID_LITERAL_MAX:
        return _centroid_rank_pandas(vec_col, centroids, top_n=top_n)
    entries = []
    for cid, w in centroids:
        wcol = F.array(*[F.lit(float(x)).cast("double") for x in w])
        # mirror the oracle exactly: both operands cast to double BEFORE
        # multiply (float32*float32-then-cast would round differently)
        # compact folds: this projection repeats per centroid — a flat
        # expansion multiplies the Catalyst tree size by k*dim and makes
        # plan optimization the bottleneck (see dot() notes)
        d = F.aggregate(
            F.zip_with(F.col(vec_col), wcol, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        vv = F.aggregate(
            F.zip_with(F.col(vec_col), F.col(vec_col), lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        ww = sum(float(x) * float(x) for x in w)
        # try_divide: under ANSI a zero-norm vector's 0-denominator is an
        # ArithmeticException, not a NaN — degrade it to NULL, then to the
        # -inf sentinel (shared with the pandas path) so both strategies
        # rank degenerate vectors LAST with identical struct values. A
        # null input vector stays a null cosine (contract unchanged).
        c_raw = F.round(F.try_divide(d, F.sqrt(vv) * F.lit(ww) ** 0.5), 6)
        c = (
            F.when(F.col(vec_col).isNull(), F.lit(None).cast("double"))
            .when(c_raw.isNull() | F.isnan(c_raw), F.lit(float("-inf")))
            .otherwise(c_raw)
        )
        entries.append(F.struct(c.alias("c"), F.lit(-cid).cast("long").alias("nid")))
    ranked = F.sort_array(F.array(*entries), asc=False)
    if top_n is not None and top_n < len(centroids):
        ranked = F.slice(ranked, 1, top_n)
    return ranked


def _centroid_rank_pandas(
    vec_col: str, centroids, top_n: int | None = None
) -> Column:
    """Large-K centroid ranking: one Arrow-batched pandas UDF scoring every
    vector against a broadcast numpy centroid matrix (K x dim float64).

    ``top_n`` emits only the best-``top_n`` prefix of the ranking (exact,
    tie-aware: candidates at the boundary cosine are re-ranked by cid
    before the cut) — O(top_n) Arrow output per row instead of O(K).

    Mirrors the literal path's arithmetic: per-element products in float64
    (float32 inputs widen exactly), centroid norms from the SAME Python
    ``sum(x*x) ** 0.5``, cosine rounded HALF_UP to 6 decimals (Spark
    ``F.round`` semantics, not numpy's half-even), ties ordered by cosine
    desc then nid desc (= cid asc) exactly like ``sort_array`` on the
    (c, nid) struct. Summation order inside the dot product differs from
    the JVM's sequential fold by at most a few ulps pre-rounding — the
    same tolerance the certified oracles already accept between Spark and
    DuckDB evaluation orders."""
    import numpy as np
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    cids = np.asarray([cid for cid, _ in centroids], dtype=np.int64)
    W = np.asarray([w for _, w in centroids], dtype=np.float64)
    wn = np.asarray(
        [sum(float(x) * float(x) for x in w) ** 0.5 for _, w in centroids],
        dtype=np.float64,
    )
    out_type = T.ArrayType(
        T.StructType(
            [
                T.StructField("c", T.DoubleType()),
                T.StructField("nid", T.LongType()),
            ]
        )
    )

    @pandas_udf(out_type)
    def rank(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:  # empty Arrow batch: np.stack would raise
            return pd.Series([], dtype=object)
        null_mask = vs.isna().to_numpy()
        V = np.stack(
            [
                np.zeros(W.shape[1])
                if null_mask[i]
                else np.asarray(vs.iloc[i], dtype=np.float64)
                for i in range(len(vs))
            ]
        )
        vv = np.einsum("ij,ij->i", V, V)
        D = V @ W.T  # B x K — the whole assignment cost, one BLAS call
        with np.errstate(divide="ignore", invalid="ignore"):
            C = D / (np.sqrt(vv)[:, None] * wn[None, :])
        # HALF_UP at 6 decimals (sign-aware away-from-zero on ties)
        C = np.sign(C) * np.floor(np.abs(C) * 1e6 + 0.5) / 1e6
        # zero-norm vectors: 0/0 = NaN — mapped to -inf so ordering matches
        # the literal path (see _centroid_rank_array)
        C = np.where(np.isnan(C), -np.inf, C)
        K = C.shape[1]
        n_keep = K if top_n is None else min(top_n, K)
        out = []
        for i in range(C.shape[0]):
            if null_mask[i]:
                # vectors are non-null by contract; a stray null degrades to
                # a null ranked array instead of crashing the whole batch
                out.append(None)
                continue
            row = C[i]
            if n_keep < K:
                # exact top-n: argpartition finds the boundary cosine, then
                # every candidate >= it (ties included) is re-ranked with
                # the full (c desc, cid asc) order before the cut — the
                # candidate set is n_keep + ties, never K
                part = np.argpartition(-row, n_keep - 1)[:n_keep]
                cstar = row[part].min()
                cand = np.flatnonzero(row >= cstar)
            else:
                cand = np.arange(K)
            order = cand[np.lexsort((cids[cand], -row[cand]))][:n_keep]
            out.append(
                [
                    {"c": float(row[j]), "nid": int(-cids[j])}
                    for j in order
                ]
            )
        return pd.Series(out)

    return rank(F.col(vec_col))


def semdedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[tuple[int, list[float]]] | None = None,
    n_centroids: int = 8,
    tau: float = 0.4,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings into k-means cells and comparing
    cosine similarity ONLY within a cell — the paper's trick that turns the
    O(n²) all-pairs problem into K independent O((n/K)²) problems.

    Keep policy (the paper's, made deterministic): within a cell, rows are
    ranked by centroid cosine ASCENDING (far-from-centroid "edge" examples
    rank first; id breaks ties) and a row is DROPPED when some
    earlier-ranked cell-mate is ≥ ``tau`` cosine-similar to it — the
    standard one-pass greedy (each above-threshold pair eliminates the
    more-redundant, closer-to-centroid side). Equivalent formulation used
    here: the loser of every above-threshold pair is dropped.

    ``centroids=None`` uses the n_centroids lowest-id vectors (deterministic,
    DuckDB-replayable — the oracle-certified path, same convention as
    ``ivf_ann_topk``); production would pass ``kmeans_centroids`` output.

    Scale shape: assignment is a map-only pass (centroid literals, JVM
    folds); the pair stage is a self-equi-join keyed on the cell id — the
    shuffle moves each row once and no CartesianProduct ever appears (K
    grows ∝ corpus so cells stay bounded; at 10^12 rows the cell id is the
    table's partition key and each cell dedups locally).

    Returns (id_col, cell, c_cos, kept) — one row per input row, kept=1
    for survivors.
    """
    if centroids is None:
        centroids = [
            (r[0], list(r[1]))
            for r in df.select(id_col, vec_col)
            .filter(F.col(id_col) < n_centroids)
            .collect()
        ]
    assigned = (
        _widen(df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("av")))
        .withColumn(
            "_r0",
            F.element_at(_centroid_rank_array("av", centroids, top_n=1), 1),
        )
        .select(
            "a_id",
            "av",
            (-F.col("_r0.nid")).alias("cell"),
            F.col("_r0.c").alias("c_cos"),
        )
        .withColumn("_an", norm(F.col("av")))
    )
    other = assigned.select(
        F.col("a_id").alias("b_id"),
        F.col("av").alias("bv"),
        "cell",
        F.col("c_cos").alias("b_ccos"),
        F.col("_an").alias("_bn"),
    )
    pairs = (
        assigned.select(
            "a_id", "av", "cell", F.col("c_cos").alias("a_ccos"), "_an"
        )
        .join(other, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cosine",
            F.round(
                pair_cosine(F.col("av"), F.col("bv"), F.col("_an"), F.col("_bn")), 6
            ),
        )
        .filter(F.col("cosine") >= F.lit(float(tau)))
    )
    # rank = (c_cos ASC, id ASC); the pair's loser is its later-ranked side
    losers = pairs.select(
        F.when(
            (F.col("a_ccos") > F.col("b_ccos"))
            | ((F.col("a_ccos") == F.col("b_ccos")) & (F.col("a_id") > F.col("b_id"))),
            F.col("a_id"),
        )
        .otherwise(F.col("b_id"))
        .alias("_loser")
    ).distinct()
    return assigned.join(
        losers, assigned["a_id"] == losers["_loser"], "left"
    ).select(
        F.col("a_id").alias(id_col),
        "cell",
        "c_cos",
        F.col("_loser").isNull().cast("int").alias("kept"),
    )


def ivf_ann_topk(
    df: DataFrame,
    probes: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 8,
    nprobe: int = 2,
    centroid_mode: str = "id-sample",
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF approximate top-k: corpus rows live in their single nearest cell;
    each probe searches its ``nprobe`` nearest cells; exact cosine re-scoring
    on the visited cells only (1/K-ish of the corpus per probe).

    ``centroid_mode="id-sample"``: the ``n_centroids`` lowest-id corpus
    vectors — deterministic, DuckDB-replayable (the oracle-certified path).
    ``centroid_mode="kmeans"``: Lloyd-iterated centroids (kmeans_centroids)
    — the production quantizer (better cells, float-sum nondeterminism in
    low bits). probes must have columns (query_id, qv).
    """
    if centroid_mode == "kmeans":
        cents = kmeans_centroids(
            df, id_col, vec_col, k=n_centroids, iters=kmeans_iters
        )
    else:
        cents = [
            (r[0], list(r[1]))
            for r in df.select(id_col, vec_col)
            .filter(F.col(id_col) < n_centroids)
            .collect()
        ]
    corpus = (
        ivf_cells(
            df.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
            cents,
            "cv",
            n_cells=1,
        )
        .withColumn("cell", F.col("cell")[0])
        .withColumn("_cn", norm(F.col("cv")))
    )
    probed = (
        ivf_cells(probes, cents, "qv", n_cells=nprobe)
        .withColumnRenamed("cell", "cells")
        .withColumn("_qn", norm(F.col("qv")))
    )
    pairs = (
        F.broadcast(probed)
        .join(corpus, F.array_contains(F.col("cells"), F.col("cell")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        F.round(
            pair_cosine(F.col("qv"), F.col("cv"), F.col("_qn"), F.col("_cn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)


def lsh_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    n_tables: int = 8,
    band_size: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Near-duplicate pairs via OR-amplified LSH — the SCALE path (the plan
    contains no crossJoin): rows are tagged with one bucket per hash table
    (map-only), candidate pairs are a self-equi-join on (table, bucket) —
    shuffle keyed on the bucket, each bucket joined locally — then exact
    cosine re-scoring keeps pairs ≥ threshold. Recall < 1 by design
    (pairs sharing no bucket are missed); ``neardup_pairs`` is the
    brute-force verifier to measure that recall on samples."""
    tagged = lsh_tables(
        _widen(
            df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"))
        ).withColumn("_an", norm(F.col("av"))),
        "av", n_tables, band_size, dim,
    )
    other = tagged.select(
        F.col("a_id").alias("b_id"), F.col("av").alias("bv"),
        F.col("_an").alias("_bn"), "lsh_table", "bucket",
    )
    pairs = (
        tagged.join(other, ["lsh_table", "bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "av", "_an", "b_id", "bv", "_bn")
        .distinct()  # a pair may collide in several tables
    )
    return pairs.select(
        "a_id", "b_id",
        F.round(
            pair_cosine(F.col("av"), F.col("bv"), F.col("_an"), F.col("_bn")), 6
        ).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All pairs above a cosine threshold (brute force — the correctness
    baseline the LSH path is measured against)."""
    # widen the STREAMED side: the corpus usually arrives as one file split
    # and the BroadcastNestedLoopJoin's parallelism is the streamed side's
    # partition count — without this the O(n²) dot loop runs on one core
    a = _widen(
        df.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("av"))
    ).withColumn("_an", norm(F.col("av")))
    b = df.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("bv")).withColumn(
        "_bn", norm(F.col("bv"))
    )
    pairs = a.crossJoin(b).filter(F.col("a_id") < F.col("b_id"))
    return pairs.select(
        "a_id",
        "b_id",
        F.round(
            pair_cosine(F.col("av"), F.col("bv"), F.col("_an"), F.col("_bn")), 6
        ).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
