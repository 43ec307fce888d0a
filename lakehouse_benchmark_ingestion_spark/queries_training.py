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
    from .operators.dedup import duplicate_clusters
    from .queries_pipeline import minhash_pairs_cached

    pairs = minhash_pairs_cached(spark, sf_dir)
    return duplicate_clusters(pairs)


GRAM_N = 16  # contamination n-gram width (chars)
EVAL_MOD = 97  # doc_id % EVAL_MOD == 0 -> held-out "benchmark" doc

EMAIL_RE = r"[a-z0-9]+@[a-z]+\.[a-z]+"
PHONE_RE = r"\+1-555-[0-9]{4}"


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: a training doc is contaminated if it
    shares any character-16-gram with the held-out eval slice
    (doc_id % 97 == 0). Shape: explode grams on both sides, DISTINCT the
    (small) eval gram set, LEFT SEMI equi-join on the gram — at 10^12 docs
    the join key is the gram itself (fine hash partitions); the eval side
    is tiny and broadcastable. Per-source contaminated counts certify it."""
    d = load_table(spark, sf_dir, "documents")
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, greatest(length(text) - {GRAM_N - 1}, 1)),"
            f" i -> substring(text, i, {GRAM_N}))"
        )
    )
    ex = d.select("doc_id", "source", F.explode(grams).alias("gram"))
    eval_grams = ex.filter(F.col("doc_id") % EVAL_MOD == 0).select("gram").distinct()
    train = ex.filter(F.col("doc_id") % EVAL_MOD != 0)
    contaminated = (
        train.join(F.broadcast(eval_grams), "gram", "left_semi")
        .select("doc_id", "source")
        .distinct()
        .groupBy("source")
        .agg(F.count("*").alias("n_contaminated"))
    )
    totals = (
        d.filter(F.col("doc_id") % EVAL_MOD != 0)
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"))
    )
    return totals.join(contaminated, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
    )


def q_contamination_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination audit through the MAINTAINED inverted gram-hash index
    (operators/text_index.py) instead of a corpus re-scan: the postings
    table is built over HALF the training docs and brought current with an
    incremental refresh over the other half (the maintenance path is part
    of what's certified), then the eval slice's gram hashes probe it with
    stats-bisect + range-sliced-bloom file pruning and one exact equi-join.
    Same (source, n_docs, n_contaminated) output as ``pipe_contamination``
    under gram-HASH membership — the oracle replays the polynomial hash
    closed-form, so any hash collision is collision-faithful on both sides.
    At 10^12 docs this is the audit you can afford to re-run per eval-set
    revision: O(probes + matching files), never O(corpus)."""
    from .operators.text_index import (
        GRAM_COL,
        build_text_index,
        gram_hashes_udf,
        probe_text_index,
        refresh_text_index,
    )
    from .queries import prepared_warehouse

    p = prepared_warehouse(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % EVAL_MOD != 0)
    if "gram_index" not in p:
        # bloom=False: the certified probe set is the full eval-slice gram
        # set, which exceeds the driver-side pruning cap at sf>=0.1 — the
        # sidecar would be built and then never consulted (pure overhead,
        # ~4 sha256 per posting). The bloom probe path is certified by
        # tests/test_text_index.py and the maint_bloom_lookup query.
        tbl = build_text_index(
            spark,
            train.filter(F.col("doc_id") % 2 == 0),
            p["warehouse"],
            name="gram_postings",
            n=GRAM_N,
            num_files=8,
            bloom=False,
        )
        refresh_text_index(
            spark, tbl, train.filter(F.col("doc_id") % 2 == 1), num_files=4,
            bloom=False,
        )
        p["gram_index"] = tbl
    tbl = p["gram_index"]

    eval_hashes = (
        d.filter(F.col("doc_id") % EVAL_MOD == 0)
        .select(F.explode(gram_hashes_udf(GRAM_N)(F.col("text"))).alias(GRAM_COL))
        .distinct()
    )
    hits, _metrics = probe_text_index(spark, tbl, eval_hashes)
    contaminated = hits.groupBy("source").agg(
        F.count("*").alias("n_contaminated")
    )
    totals = train.groupBy("source").agg(F.count("*").alias("n_docs"))
    return totals.join(contaminated, "source", "left").select(
        "source",
        "n_docs",
        F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
    )


def q_index_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived-index lifecycle certified end-to-end UNDER MAINTENANCE:
    an icelite docs base table gets HALF the corpus, a text index is
    registered over it, then the base receives the other half (append) and
    loses a slice (COW delete) — and ONE ``run_full_maintenance`` pass
    (compact + cluster + manifest rewrite + AUTO index-sync + snapshot
    expiration, plans/maintenance.py) must leave the index holding exactly
    the live corpus's postings (insert half applied, deleted docs'
    postings suppressed by the MOR eq-delete), with the sync's watermark
    moved BEFORE expiration made the old base snapshot unreachable — the
    registry's whole freshness claim. A file-pruned probe from the synced
    index must also hit a doc from the appended half (asserted). Certified
    shape: per-source indexed-doc and posting counts; the oracle recomputes
    both from the live documents with the gram-hash replay, so a stale
    watermark, an unapplied delete, or a duplicated sync all mismatch."""
    from .icelite import Catalog
    from .operators.row_dml import delete_where
    from .operators.text_index import (
        GRAM_COL,
        gram_hashes_py,
        probe_text_index,
        register_text_index,
    )
    from .plans.maintenance import run_full_maintenance
    from .queries import prepared_warehouse

    p = prepared_warehouse(spark, sf_dir)
    if "tix_sync" not in p:
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "source", "text"
        )
        base = Catalog(p["warehouse"]).create_table("docs_tix", d.schema)
        base.append(d.filter(F.col("doc_id") % 2 == 0), num_files=2)
        idx = register_text_index(
            spark, base, p["warehouse"], name="docs_tix_grams", n=GRAM_N,
            num_files=4, bloom=False,
        )
        base.append(d.filter(F.col("doc_id") % 2 == 1), num_files=2)
        delete_where(spark, base, {"doc_id": (0, 49)}, strategy="cow",
                     key="doc_id")
        m = run_full_maintenance(
            spark, base, target_file_size=4 << 20, expire_keep_last=1,
        )
        assert m["index_sync"]["files_out"] == 1, (
            "auto-sync must have caught the registered index up to head"
        )
        # probe the SYNCED index for a doc only the appended half contains:
        # an unapplied insert half (or a stale watermark) would miss it
        probe_doc = [
            r for r in d.filter(
                (F.col("doc_id") % 2 == 1) & (F.col("doc_id") > 49)
            ).limit(1).collect()
        ][0]
        probes = spark.createDataFrame(
            [(h,) for h in gram_hashes_py(probe_doc["text"], GRAM_N)],
            f"{GRAM_COL} long",
        )
        hits, _metrics = probe_text_index(spark, idx, probes)
        assert hits.filter(
            F.col("doc_id") == probe_doc["doc_id"]
        ).count() == 1, "synced index must answer a probe for an appended doc"
        p["tix_sync"] = idx
    return (
        p["tix_sync"].scan(spark)
        .groupBy("source")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_postings"),
        )
    )


def q_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded deterministic global shuffle (training-order randomization):
    every doc gets a closed-form pseudo-random rank and a hash-balanced
    shard — the permutation is a pure function of (seed, doc_id), so a
    1000-executor run reproduces a laptop run exactly and an epoch
    reshuffle is just a new seed. Certified per-shard: doc count, doc_id
    sum (membership, order-insensitive), and rank extrema (the oracle
    replays the hash, so a single misplaced doc mismatches)."""
    from .operators.packing import global_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    sh = global_shuffle(d, "doc_id", seed="epoch0", n_shards=16)
    return sh.groupBy(F.col("_shard").alias("shard")).agg(
        F.count("*").alias("n_docs"),
        F.sum("doc_id").cast("long").alias("sum_doc_id"),
        F.min("_rank").alias("min_rank"),
        F.max("_rank").alias("max_rank"),
    )


def _pii_text() -> object:
    """Deterministically inject PII into the synthetic text (the corpus
    vocabulary contains none): 0-2 emails and 0-1 phone numbers per doc as
    closed-form functions of doc_id, so counts vary and the oracle can
    rebuild the identical string."""
    did = F.col("doc_id")
    return F.concat(
        F.col("text"),
        F.when(
            did % 3 != 0,
            F.concat(
                F.lit(" reach user"),
                (did % 100).cast("string"),
                F.lit("@mail"),
                F.when(did % 2 == 0, F.lit(".com")).otherwise(F.lit(".org")),
            ),
        ).otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit(" and admin@site.org")).otherwise(F.lit("")),
        F.when(
            did % 4 == 0,
            F.concat(
                F.lit(" call +1-555-"),
                F.lpad((did % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
    )


def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub: count + redact emails and phone numbers with JVM-side
    regexps (regexp_count / regexp_replace — whole-stage codegen, no UDF).
    Map-only: scales as a pure scan transform."""
    d = load_table(spark, sf_dir, "documents")
    pii = _pii_text()
    redacted = F.regexp_replace(
        F.regexp_replace(pii, F.lit(EMAIL_RE), F.lit("<EMAIL>")),
        F.lit(PHONE_RE),
        F.lit("<PHONE>"),
    )
    return d.select(
        "doc_id",
        F.regexp_count(pii, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(pii, F.lit(PHONE_RE)).alias("n_phones"),
        F.length(redacted).alias("n_len_redacted"),
    )


def q_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition profile: word totals, distinct words, and
    the top word frequency — the standard boilerplate/spam signal. One
    shuffle keyed by (doc_id, word), partial-aggregated map-side."""
    d = load_table(spark, sf_dir, "documents")
    w = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"),
    )
    per_word = w.groupBy("doc_id", "source", "word").agg(F.count("*").alias("c"))
    return per_word.groupBy("doc_id", "source").agg(
        F.sum("c").alias("n_words"),
        F.count("*").alias("n_distinct_words"),
        F.max("c").alias("top_word_freq"),
    )


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture planning: per-source token mass, current share,
    sqrt-damped target share (the standard upweight-the-tail mixture rule),
    and the resulting keep-rate min(1, target/current). One groupBy to
    ~|sources| rows, then driver-free share math over a global window."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.sum((F.col("n_chars") / 4).cast("long") + 1).alias("n_tokens")
    )
    w = Window.partitionBy()
    cur = F.col("n_tokens") / F.sum("n_tokens").over(w)
    tgt = F.sqrt(F.col("n_tokens")) / F.sum(F.sqrt(F.col("n_tokens"))).over(w)
    return per_src.select(
        "source",
        "n_tokens",
        F.round(cur, 6).alias("current_share"),
        F.round(tgt, 6).alias("target_share"),
        F.round(F.least(F.lit(1.0), tgt / cur), 6).alias("keep_rate"),
    )


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest novelty check: docs with doc_id % 10 == 7 are the
    incoming batch, the rest the existing corpus. An incoming doc is flagged
    exact-dup if its md5 matches any corpus doc, neardup-candidate if any of
    its 4 MinHash band signatures (poly hashes — oracle-replayable) matches
    a corpus band. Both checks are LEFT SEMI equi-joins (md5 / band key):
    never an all-pairs comparison, which is the whole point at ingest scale."""
    from .operators.dedup import MINHASH_PERMS, minhash_signature

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sig = minhash_signature(d, hash_fn="poly")
    band_key = [
        F.concat_ws(
            ":", *[F.element_at("minhash", b * 4 + j + 1) for j in range(4)]
        ).alias("bkey")
        for b in range(len(MINHASH_PERMS) // 4)
    ]
    bands = sig.select(
        "doc_id", F.explode(F.array(*[F.struct(F.lit(b).alias("band"), band_key[b]) for b in range(4)])).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))

    incoming = F.col("doc_id") % 10 == 7
    inc_md5 = d.filter(incoming).select("doc_id", F.md5("text").alias("h"))
    cor_md5 = d.filter(~incoming).select(F.md5("text").alias("h")).distinct()
    exact = inc_md5.join(cor_md5, "h", "left_semi").select("doc_id")

    inc_b = bands.filter(incoming)
    cor_b = bands.filter(~incoming).select("band", "bkey").distinct()
    near = inc_b.join(cor_b, ["band", "bkey"], "left_semi").select("doc_id").distinct()

    return (
        d.filter(incoming)
        .select("doc_id")
        .join(exact.withColumn("is_exact_dup", F.lit(1)), "doc_id", "left")
        .join(near.withColumn("is_neardup_candidate", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("is_exact_dup", F.lit(0)).alias("is_exact_dup"),
            F.coalesce("is_neardup_candidate", F.lit(0)).alias("is_neardup_candidate"),
        )
    )


N_SHARDS = 16
BATCH_TOKENS = 4096


def q_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced output sharding: docs ranked by n_tok DESC (ties by
    doc_id) are dealt serpentine across N_SHARDS (shard = rank % N on even
    deals, N-1-rank%N on odd — the classic greedy-balance approximation
    that is also closed-form, so both engines compute the identical
    assignment). Certified output = per-shard doc/token totals; the spread
    between the heaviest and lightest shard is the balance proof. One
    global sort (rangepartitioned) + one groupBy."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", ((F.col("n_chars") / 4).cast("long") + 1).alias("n_tok")
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_tok").desc(), F.col("doc_id").asc())
    r = d.withColumn("rank0", F.row_number().over(w) - 1)
    deal = (F.col("rank0") / N_SHARDS).cast("long")
    pos = F.col("rank0") % N_SHARDS
    shard = F.when(deal % 2 == 0, pos).otherwise(N_SHARDS - 1 - pos)
    return (
        r.withColumn("shard", shard.cast("long"))
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


def q_curriculum_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: docs sorted easiest-first (shorter = easier as
    the stand-in difficulty), token-budgeted batches cut by cumulative
    token count // BATCH_TOKENS (same cumulative-window shape as sequence
    packing — one range-partitioned sort, no driver loop). Certified
    per-batch stats prove the difficulty ramp: batch_id increases with
    mean doc length."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        ((F.col("n_chars") / 4).cast("long") + 1).alias("n_tok"),
    )
    w = (
        Window.orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tok").over(w))
    batch = ((F.col("cum") - F.col("n_tok")) / BATCH_TOKENS).cast("long")
    return (
        c.withColumn("batch_id", batch)
        .groupBy("batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


def q_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-bigram frequency head (LM corpus statistics): adjacent token
    pairs from every sequence, counted and top-100'd. zip_with over the
    array and its tail keeps pair construction JVM-side; the only shuffle
    is the (t1, t2) groupBy with map-side partial aggregation."""
    seq = tokens_df(spark, sf_dir)
    pairs = F.zip_with(
        F.slice(F.col("tokens"), 1, F.size("tokens") - 1),
        F.slice(F.col("tokens"), 2, F.size("tokens") - 1),
        lambda a, b: F.struct(a.alias("t1"), b.alias("t2")),
    )
    return (
        seq.filter(F.size("tokens") >= 2)
        .select(F.explode(pairs).alias("bg"))
        .select(F.col("bg.t1").alias("t1"), F.col("bg.t2").alias("t2"))
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("t1").asc(), F.col("t2").asc())
        .limit(TOPK)
    )


SPAN_W = 16  # window width (tokens)
SPAN_STRIDE = 8  # window stride
SPAN_CLONE_MOD = 11  # every 11th doc is cloned → guaranteed duplicated spans
SPAN_CLONE_OFFSET = 300_000
SPAN_TOPK = 100


def q_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring (token-span) duplication detector — the hash-windowed
    distributed variant of the suffix-array exact-substring method
    (Lee et al. 2021, "Deduplicating Training Data Makes Language Models
    Better"): every W=16-token window at stride 8 is content-hashed; a span
    hash seen in >= 2 documents marks verbatim repeated text. Corpus =
    sequences plus deterministic clones (every 11th doc re-appears under a
    shifted id) so duplicated spans provably exist.

    Scale shape: the explode fans out n_tok/stride rows per doc but each
    carries ONLY (doc_id, 32-char hash) — the token array never enters the
    shuffle; the groupBy gets map-side partial aggregation. A suffix array
    (the paper's exact method) is a driver-sized structure; hash windows are
    the shape that distributes."""
    seqs = tokens_df(spark, sf_dir)
    clones = seqs.filter(
        F.col("doc_id").cast("long") % SPAN_CLONE_MOD == 0
    ).withColumn(
        "doc_id",
        (F.col("doc_id").cast("long") + SPAN_CLONE_OFFSET).cast("string"),
    )
    corpus = seqs.unionByName(clones)
    spans = (
        corpus.filter(F.col("n_tok") >= SPAN_W)
        .select(
            "doc_id",
            "tokens",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_tok") - SPAN_W, F.lit(SPAN_STRIDE)
                )
            ).alias("off"),
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr(
                        f"transform(slice(tokens, off + 1, {SPAN_W}),"
                        " x -> cast(x as string))"
                    ),
                )
            ).alias("span_hash"),
        )
    )
    return (
        spans.groupBy("span_hash")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy(
            F.col("n_docs").desc(), F.col("n_occ").desc(), F.col("span_hash").asc()
        )
        .limit(SPAN_TOPK)
    )


CHUNK_W = 32  # context-window width (tokens)
CHUNK_STRIDE = 24  # window stride (8-token overlap carries context across chunks)


def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window context chunking — the standard pretraining transform
    that turns variable-length documents into fixed-width training windows
    (W=32 tokens at stride 24, so consecutive chunks share an 8-token
    overlap and the partial tail chunk is KEPT — unlike span-dedup's
    detector grid, a chunker must not drop trailing text).

    Scale shape: one generator explode per row, zero shuffles, zero Python
    — the start-offset grid is a `sequence()` literal and the chunk digest
    a JVM md5 over the token slice. Emits (doc_id, chunk_off, n_chunk_tok,
    chunk_md5): the digest stands in for shipping the slice itself, which
    at 10^12 sequences keeps the result ~40 bytes/chunk."""
    seqs = tokens_df(spark, sf_dir)
    return (
        seqs.filter(F.col("n_tok") >= 1)
        .select(
            "doc_id",
            "tokens",
            "n_tok",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("n_tok") - 1, F.lit(CHUNK_STRIDE)
                )
            ).alias("off"),
        )
        .select(
            "doc_id",
            F.col("off").cast("long").alias("chunk_off"),
            F.least(
                F.lit(CHUNK_W).cast("long"),
                (F.col("n_tok") - F.col("off")).cast("long"),
            ).alias("n_chunk_tok"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.expr(
                        f"transform(slice(tokens, off + 1, {CHUNK_W}),"
                        " x -> cast(x as string))"
                    ),
                )
            ).alias("chunk_md5"),
        )
    )


def q_e2e_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-data prep pipeline as ONE composed dataflow:
    quality filter (length >= 100) → exact dedup (keep min doc_id per md5)
    → deterministic 20% stratified sample → greedy context-window packing,
    certified by per-source pack counts + token totals.

    Every stage is the engine's certified operator shape (filter pushdown,
    hash-groupBy dedup, arithmetic-hash sample, window packing) — the match
    proves the stages COMPOSE, not just that each works alone. Two shuffles
    total at scale: the dedup groupBy and the per-source packing sort."""
    from .operators.packing import pack_stats

    d = load_table(spark, sf_dir, "documents")
    quality = d.filter(F.length("text") >= 100)
    keeper = (
        quality.groupBy(F.md5("text").alias("h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = quality.join(keeper, "doc_id", "left_semi")
    sampled = kept.filter(
        (F.col("doc_id") * SAMPLE_A + SAMPLE_C) % SAMPLE_MOD < SAMPLE_KEEP
    )
    seq = sampled.select(
        "doc_id",
        ((F.col("n_chars") / 4).cast("long") + 1).alias("n_tok"),
        "source",
    )
    return (
        pack_stats(seq, CTX_LEN)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_packs"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("tok_started").alias("n_tokens"),
        )
    )


# ---- temporal joins over events (operators/temporal.py) ----------------------

WINDOW_BASE_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in epoch micros
WINDOW_STEP_US = 6 * 3600 * 1_000_000
WINDOW_LEN_US = 90 * 60 * 1_000_000
N_WINDOWS = 120


def q_length_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language exact length quantiles (linear interpolation — Spark's
    percentile() and DuckDB's quantile_cont share the same definition).
    At 10^12 rows this becomes approx_percentile (t-digest) with the exact
    version as the sampled verifier; certified here is the exact path."""
    d = load_table(spark, sf_dir, "documents")
    q = F.expr("percentile(n_chars, array(0.25, 0.5, 0.75))")
    return (
        d.groupBy("lang")
        .agg(q.alias("q"))
        .select(
            "lang",
            F.round(F.element_at("q", 1), 6).alias("q25"),
            F.round(F.element_at("q", 2), 6).alias("q50"),
            F.round(F.element_at("q", 3), 6).alias("q75"),
        )
    )


def q_asof_error_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click event, the latest error event of the
    same user at or before the click (operators/temporal.asof_join —
    union + one window pass, no join node, one shuffle on user_id).
    Errors are pre-deduped to one per (user, ts) so the match is unique."""
    from pyspark.sql import Window

    from .operators.temporal import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    dd = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    errors = (
        ev.filter(F.col("event_type") == "error")
        .withColumn("_rn", F.row_number().over(dd))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "event_id")
    )
    j = asof_join(
        clicks, errors, on="user_id", left_ts="ts", right_ts="ts",
        payload=["event_id"], prefix="err_",
    )
    # parquet timestamps load as TIMESTAMP_NTZ; the session tz is pinned to
    # UTC so the cast reads them as the same instants DuckDB's epoch_us sees
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    return j.select(
        "event_id",
        "user_id",
        F.col("err_event_id"),
        (us("ts") - us("err_ts")).alias("lag_us"),
    )


def q_events_in_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval range join: events falling inside any of 120 fixed
    90-minute maintenance windows (every 6 h from 2024-01-01), via
    operators/temporal.range_join — interval banding makes it a plain
    equi-join on the bucket id, never a nested-loop theta join."""
    from .operators.temporal import range_join

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
    )
    iv = spark.range(N_WINDOWS).select(
        F.col("id").alias("window_id"),
        (F.lit(WINDOW_BASE_US) + F.col("id") * WINDOW_STEP_US).alias("lo_us"),
        (F.lit(WINDOW_BASE_US) + F.col("id") * WINDOW_STEP_US + WINDOW_LEN_US).alias("hi_us"),
    )
    j = range_join(
        ev, iv,
        probe_key=F.col("ts_us"),
        interval_lo=F.col("lo_us"),
        interval_hi=F.col("hi_us"),
        bucket_width=WINDOW_STEP_US,
    )
    return j.groupBy("window_id").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.max("event_id").alias("max_event_id"),
    )


QUERIES = {
    "pipe_pack_sequences": q_pack_sequences,
    "pipe_token_topk": q_token_topk,
    "pipe_stratified_sample": q_stratified_sample,
    "pipe_dup_clusters": q_dup_clusters,
    "pipe_contamination": q_contamination,
    "pipe_contamination_indexed": q_contamination_indexed,
    "pipe_global_shuffle": q_global_shuffle,
    "maint_index_sync": q_index_sync,
    "pipe_pii_redaction": q_pii_redaction,
    "pipe_repetition": q_repetition,
    "pipe_mixture_plan": q_mixture_plan,
    "pipe_incremental_dedup": q_incremental_dedup,
    "pipe_shard_balance": q_shard_balance,
    "pipe_curriculum_batches": q_curriculum_batches,
    "pipe_bigram_topk": q_bigram_topk,
    "pipe_span_dedup": q_span_dedup,
    "pipe_chunk_windows": q_chunk_windows,
    "pipe_e2e_training_prep": q_e2e_training_prep,
    "pipe_length_quantiles": q_length_quantiles,
    "rel_asof_error_click": q_asof_error_click,
    "rel_events_in_windows": q_events_in_windows,
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


_PII_SQL = """
    text
    || CASE WHEN doc_id % 3 <> 0
            THEN ' reach user' || CAST(doc_id % 100 AS VARCHAR) || '@mail'
                 || CASE WHEN doc_id % 2 = 0 THEN '.com' ELSE '.org' END
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN ' and admin@site.org' ELSE '' END
    || CASE WHEN doc_id % 4 = 0
            THEN ' call +1-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
            ELSE '' END
"""

from .operators.text_index import HASH_B as _IDX_B  # noqa: E402
from .operators.text_index import HASH_P as _IDX_P  # noqa: E402

# gram-hash replay for the indexed contamination oracle: exactly the
# closed form of operators/text_index.gram_hash_col — polynomial fold
# (h*B + ascii(c)) % P over the characters of substr(text, i, GRAM_N)
_IDX_GRAM_HASHES = f"""
    list_distinct(list_transform(
      range(1, greatest(length(text) - {GRAM_N - 1}, 1) + 1),
      i -> list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(
                 range(1, length(substr(text, CAST(i AS INT), {GRAM_N})) + 1),
                 j -> CAST(ascii(substr(substr(text, CAST(i AS INT), {GRAM_N}),
                                        CAST(j AS INT), 1)) AS BIGINT))),
             (h, c) -> (h * {_IDX_B} + c) % {_IDX_P})))
"""

ORACLES.update(
    {
        # live corpus = even half ∪ odd half minus the deleted doc_id<50
        # slice; per-source docs and distinct-gram-hash postings replayed
        "maint_index_sync": f"""
            WITH live AS (
              SELECT doc_id, source, text FROM documents
              WHERE NOT (doc_id BETWEEN 0 AND 49)
            ),
            g AS (
              SELECT doc_id, source,
                     CAST(len({_IDX_GRAM_HASHES}) AS BIGINT) AS n_grams
              FROM live
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_grams) AS BIGINT) AS n_postings
            FROM g GROUP BY source
        """,
        "pipe_global_shuffle": """
            WITH r AS (
              SELECT doc_id,
                     list_reduce(list_prepend(CAST(0 AS BIGINT),
                       list_transform(
                         range(1, length('epoch0:' || CAST(doc_id AS VARCHAR)) + 1),
                         i -> CAST(ascii(substr('epoch0:' || CAST(doc_id AS VARCHAR),
                                               CAST(i AS INT), 1)) AS BIGINT))),
                       (h, c) -> (h * 31 + c) % 2147483647) AS rank
              FROM documents
            )
            SELECT CAST(rank % 16 AS INT) AS shard,
                   count(*) AS n_docs,
                   CAST(sum(doc_id) AS BIGINT) AS sum_doc_id,
                   CAST(min(rank) AS BIGINT) AS min_rank,
                   CAST(max(rank) AS BIGINT) AS max_rank
            FROM r GROUP BY shard
        """,
        "pipe_contamination_indexed": f"""
            WITH ex AS (
              SELECT doc_id, source, unnest({_IDX_GRAM_HASHES}) AS gh
              FROM documents
            ),
            ev AS (SELECT DISTINCT gh FROM ex WHERE doc_id % {EVAL_MOD} = 0),
            cont AS (
              SELECT source, count(DISTINCT doc_id) AS n_contaminated
              FROM ex
              WHERE doc_id % {EVAL_MOD} <> 0 AND gh IN (SELECT gh FROM ev)
              GROUP BY source
            ),
            tot AS (
              SELECT source, count(*) AS n_docs FROM documents
              WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY source
            )
            SELECT t.source, t.n_docs,
                   CAST(COALESCE(c.n_contaminated, 0) AS BIGINT) AS n_contaminated
            FROM tot t LEFT JOIN cont c USING (source)
        """,
        "pipe_contamination": f"""
            WITH ex AS (
              SELECT doc_id, source,
                     unnest(list_distinct(list_transform(
                       range(1, greatest(length(text) - {GRAM_N - 1}, 1) + 1),
                       i -> substr(text, CAST(i AS INT), {GRAM_N})))) AS gram
              FROM documents
            ),
            ev AS (SELECT DISTINCT gram FROM ex WHERE doc_id % {EVAL_MOD} = 0),
            cont AS (
              SELECT source, count(DISTINCT doc_id) AS n_contaminated
              FROM ex
              WHERE doc_id % {EVAL_MOD} <> 0 AND gram IN (SELECT gram FROM ev)
              GROUP BY source
            ),
            tot AS (
              SELECT source, count(*) AS n_docs FROM documents
              WHERE doc_id % {EVAL_MOD} <> 0 GROUP BY source
            )
            SELECT t.source, t.n_docs,
                   CAST(COALESCE(c.n_contaminated, 0) AS BIGINT) AS n_contaminated
            FROM tot t LEFT JOIN cont c USING (source)
        """,
        "pipe_pii_redaction": f"""
            WITH p AS (SELECT doc_id, {_PII_SQL} AS pii FROM documents)
            SELECT doc_id,
                   CAST(len(regexp_extract_all(pii, '{EMAIL_RE}')) AS INT) AS n_emails,
                   CAST(len(regexp_extract_all(pii, '{PHONE_RE}')) AS INT) AS n_phones,
                   CAST(length(regexp_replace(regexp_replace(pii,
                        '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g')) AS INT) AS n_len_redacted
            FROM p
        """,
        "pipe_repetition": r"""
            WITH w AS (
              SELECT doc_id, source,
                     unnest(regexp_split_to_array(trim(text), '\s+')) AS word
              FROM documents
            ),
            pw AS (SELECT doc_id, source, word, count(*) AS c FROM w GROUP BY ALL)
            SELECT doc_id, source,
                   CAST(sum(c) AS BIGINT) AS n_words,
                   count(*) AS n_distinct_words,
                   CAST(max(c) AS BIGINT) AS top_word_freq
            FROM pw GROUP BY doc_id, source
        """,
        "pipe_mixture_plan": """
            WITH s AS (
              SELECT source, CAST(sum(n_chars // 4 + 1) AS BIGINT) AS n_tokens
              FROM documents GROUP BY source
            )
            SELECT source, n_tokens,
                   round(n_tokens / sum(n_tokens) OVER (), 6) AS current_share,
                   round(sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER (), 6) AS target_share,
                   round(least(1.0,
                     (sqrt(n_tokens) / sum(sqrt(n_tokens)) OVER ())
                     / (n_tokens / sum(n_tokens) OVER ())), 6) AS keep_rate
            FROM s
        """,
        "pipe_shard_balance": f"""
            WITH d AS (
              SELECT doc_id, CAST(n_chars // 4 + 1 AS BIGINT) AS n_tok FROM documents
            ),
            r AS (
              SELECT doc_id, n_tok,
                     row_number() OVER (ORDER BY n_tok DESC, doc_id ASC) - 1 AS rank0
              FROM d
            )
            SELECT CAST(CASE WHEN (rank0 // {N_SHARDS}) % 2 = 0
                             THEN rank0 % {N_SHARDS}
                             ELSE {N_SHARDS} - 1 - rank0 % {N_SHARDS} END AS BIGINT) AS shard,
                   count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens
            FROM r GROUP BY shard
        """,
        "pipe_curriculum_batches": f"""
            WITH d AS (
              SELECT doc_id, n_chars, CAST(n_chars // 4 + 1 AS BIGINT) AS n_tok
              FROM documents
            ),
            c AS (
              SELECT *, sum(n_tok) OVER (
                ORDER BY n_chars ASC, doc_id ASC ROWS UNBOUNDED PRECEDING) AS cum
              FROM d
            )
            SELECT CAST((cum - n_tok) // {BATCH_TOKENS} AS BIGINT) AS batch_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tok) AS BIGINT) AS n_tokens,
                   min(n_chars) AS min_chars,
                   max(n_chars) AS max_chars
            FROM c GROUP BY batch_id
        """,
        "pipe_bigram_topk": f"""
            WITH seq AS ({TOKENS_ORACLE_SQL}),
            p AS (
              SELECT unnest(tokens[1:len(tokens) - 1]) AS t1,
                     unnest(tokens[2:len(tokens)]) AS t2
              FROM seq WHERE len(tokens) >= 2
            )
            SELECT CAST(t1 AS INT) AS t1, CAST(t2 AS INT) AS t2, count(*) AS freq
            FROM p GROUP BY t1, t2
            ORDER BY freq DESC, t1 ASC, t2 ASC LIMIT {TOPK}
        """,
        "pipe_e2e_training_prep": f"""
            WITH q AS (SELECT * FROM documents WHERE length(text) >= 100),
            k AS (SELECT md5(text) AS h, min(doc_id) AS doc_id FROM q GROUP BY h),
            kept AS (SELECT q.* FROM q JOIN k ON q.doc_id = k.doc_id),
            s AS (
              SELECT * FROM kept
              WHERE (doc_id * {SAMPLE_A} + {SAMPLE_C}) % {SAMPLE_MOD} < {SAMPLE_KEEP}
            ),
            seq AS (
              SELECT doc_id, CAST(n_chars // 4 + 1 AS BIGINT) AS n_tok, source FROM s
            ),
            c AS (
              SELECT source, n_tok,
                     sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
              FROM seq
            ),
            p AS (
              SELECT source, CAST((cum - n_tok) // {CTX_LEN} AS BIGINT) AS pack_id,
                     count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_started
              FROM c GROUP BY source, pack_id
            )
            SELECT source, count(*) AS n_packs,
                   CAST(sum(n_docs) AS BIGINT) AS n_docs,
                   CAST(sum(tok_started) AS BIGINT) AS n_tokens
            FROM p GROUP BY source
        """,
        "pipe_length_quantiles": """
            SELECT lang,
                   round(quantile_cont(n_chars, 0.25), 6) AS q25,
                   round(quantile_cont(n_chars, 0.50), 6) AS q50,
                   round(quantile_cont(n_chars, 0.75), 6) AS q75
            FROM documents GROUP BY lang
        """,
        "rel_asof_error_click": """
            WITH err AS (
              SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'
              QUALIFY row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) = 1
            ),
            clk AS (
              SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
            )
            SELECT c.event_id, c.user_id, e.event_id AS err_event_id,
                   epoch_us(c.ts) - epoch_us(e.ts) AS lag_us
            FROM clk c ASOF LEFT JOIN err e
              ON c.user_id = e.user_id AND c.ts >= e.ts
        """,
        "rel_events_in_windows": f"""
            WITH iv AS (
              SELECT k AS window_id,
                     {WINDOW_BASE_US} + k * {WINDOW_STEP_US} AS lo_us,
                     {WINDOW_BASE_US} + k * {WINDOW_STEP_US} + {WINDOW_LEN_US} AS hi_us
              FROM range(0, {N_WINDOWS}) t(k)
            ),
            e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events)
            SELECT window_id, count(*) AS n_events,
                   count(DISTINCT user_id) AS n_users,
                   max(event_id) AS max_event_id
            FROM e JOIN iv ON e.ts_us BETWEEN iv.lo_us AND iv.hi_us
            GROUP BY window_id
        """,
    }
)


def _incremental_dedup_oracle() -> str:
    from .queries_pipeline import _MINHASH_COLS, _NGRAMS_SQL, _POLY_HASH_G

    band_selects = " UNION ALL ".join(
        f"""SELECT doc_id, {b} AS band, """
        + " || ':' || ".join(f"CAST(s[{b * 4 + j + 1}] AS VARCHAR)" for j in range(4))
        + " AS bkey FROM sig"
        for b in range(4)
    )
    return f"""
        WITH h AS (
          SELECT doc_id,
                 list_transform({_NGRAMS_SQL}, g -> {_POLY_HASH_G}) AS hashes
          FROM documents
        ),
        sig AS MATERIALIZED (SELECT doc_id, [{_MINHASH_COLS}] AS s FROM h),
        bands AS MATERIALIZED ({band_selects}),
        exact AS (
          SELECT DISTINCT a.doc_id
          FROM documents a JOIN documents c ON md5(a.text) = md5(c.text)
          WHERE a.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
        ),
        near AS (
          SELECT DISTINCT i.doc_id
          FROM bands i JOIN bands c ON i.band = c.band AND i.bkey = c.bkey
          WHERE i.doc_id % 10 = 7 AND c.doc_id % 10 <> 7
        )
        SELECT d.doc_id,
               CAST(d.doc_id IN (SELECT doc_id FROM exact) AS INT) AS is_exact_dup,
               CAST(d.doc_id IN (SELECT doc_id FROM near) AS INT) AS is_neardup_candidate
        FROM documents d WHERE d.doc_id % 10 = 7
    """


ORACLES["pipe_chunk_windows"] = f"""
WITH seq AS ({TOKENS_ORACLE_SQL}),
offs AS (
  SELECT doc_id, tokens, n_tok,
         unnest(range(0, n_tok, {CHUNK_STRIDE})) AS off
  FROM seq WHERE n_tok >= 1
)
SELECT doc_id,
       off AS chunk_off,
       least(CAST({CHUNK_W} AS BIGINT), CAST(n_tok - off AS BIGINT)) AS n_chunk_tok,
       md5(array_to_string(list_slice(tokens, off + 1, off + {CHUNK_W}), ',')) AS chunk_md5
FROM offs
"""

ORACLES["pipe_incremental_dedup"] = _incremental_dedup_oracle()

ORACLES["pipe_span_dedup"] = f"""
WITH seq AS ({TOKENS_ORACLE_SQL}),
corpus AS (
  SELECT doc_id, tokens, n_tok FROM seq
  UNION ALL
  SELECT CAST(CAST(doc_id AS BIGINT) + {SPAN_CLONE_OFFSET} AS VARCHAR),
         tokens, n_tok
  FROM seq WHERE CAST(doc_id AS BIGINT) % {SPAN_CLONE_MOD} = 0
),
offs AS (
  SELECT doc_id,
         unnest(range(0, n_tok - {SPAN_W} + 1, {SPAN_STRIDE})) AS off,
         tokens
  FROM corpus WHERE n_tok >= {SPAN_W}
),
spans AS (
  SELECT doc_id,
         md5(array_to_string(list_slice(tokens, off + 1, off + {SPAN_W}), ',')) AS span_hash
  FROM offs
)
SELECT span_hash,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       count(*) AS n_occ
FROM spans GROUP BY span_hash
HAVING count(DISTINCT doc_id) >= 2
ORDER BY n_docs DESC, n_occ DESC, span_hash ASC LIMIT {SPAN_TOPK}
"""



def _dup_clusters_oracle() -> str:
    # reuse the certified MinHash-LSH pairs oracle as the edge list, then
    # take its transitive closure with a recursive CTE (min reachable id =
    # the cluster label the Spark propagation loop converges to)
    from .queries_pipeline import ORACLES as PIPE

    pairs_sql = PIPE["pipe_dedup_minhash_pairs"]
    # MATERIALIZED: DuckDB otherwise inlines these CTEs into the recursive
    # part and re-evaluates the expensive MinHash pipeline EVERY iteration
    # of the closure (measured 91 s -> 14 s at sf0.01)
    return f"""
        WITH RECURSIVE pairs AS MATERIALIZED (SELECT a_id, b_id FROM ({pairs_sql})),
        edges AS MATERIALIZED (
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


# ---- DSIR importance weights -------------------------------------------------

DSIR_B = 512  # hashed-unigram feature buckets (the paper uses 10k for n-grams)


def dsir_doc_weights(docs: DataFrame) -> DataFrame:
    """Per-document DSIR importance weight (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169 — public method):
    weight(doc) = Σ_w [ln p_tgt(h(w)) − ln p_raw(h(w))] under hashed
    unigram bag-of-words language models with add-1 smoothing over
    ``DSIR_B`` buckets. The target slice is the corpus's first source
    (deterministic: min(source)); resampling then keeps docs by weight.

    Spark shape that survives 100 TB: the bucket hash is the engine-
    portable polynomial fold (JVM built-ins, shared bit-for-bit with the
    DuckDB oracle), BOTH models come from ONE groupBy over the exploded
    words (cnt_raw = count, cnt_tgt = conditional sum — no second pass),
    the model is DSIR_B rows broadcast back, and the per-doc fold is one
    map-side-combined groupBy. Integer counts throughout; floats appear
    only in the ln() folds.

    Returns (doc_id, source, w_doc)."""
    from .operators.dedup import poly_hash

    w = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).filter(F.length("w") > 0)
    tgt = docs.groupBy().agg(F.min("source").alias("_tgt"))  # scalar: one row
    wb = w.crossJoin(F.broadcast(tgt)).select(
        "doc_id",
        "source",
        (poly_hash(F.col("w")) % DSIR_B).alias("b"),
        (F.col("source") == F.col("_tgt")).cast("long").alias("is_tgt"),
    )
    model = wb.groupBy("b").agg(
        F.count("*").alias("cnt_r"), F.sum("is_tgt").alias("cnt_t")
    )
    totals = model.groupBy().agg(
        F.sum("cnt_r").alias("tot_r"), F.sum("cnt_t").alias("tot_t")
    )
    scored = model.crossJoin(F.broadcast(totals)).select(
        "b",
        (
            F.log(F.col("cnt_t") + 1)
            - F.log(F.col("tot_t") + DSIR_B)
            - F.log(F.col("cnt_r") + 1)
            + F.log(F.col("tot_r") + DSIR_B)
        ).alias("lr"),
    )
    return (
        wb.join(F.broadcast(scored), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum("lr").alias("w_doc"))
    )


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights certified as per-source aggregates (the
    per-doc float sum is rounded once at the aggregate; see
    ``dsir_doc_weights`` for the method and the 100 TB shape)."""
    per_doc = dsir_doc_weights(load_table(spark, sf_dir, "documents"))
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("w_doc"), 6).alias("avg_dsir_weight"),
        F.sum((F.round("w_doc", 6) > 0).cast("long")).alias("n_positive"),
    )


QUERIES["pipe_dsir_weights"] = q_dsir_weights

_DSIR_WORD_HASH = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(range(1, length(w) + 1), "
    "i -> CAST(ascii(substr(w, CAST(i AS INT), 1)) AS BIGINT))), "
    "(h, c) -> (h * 31 + c) % 2147483647)"
)

ORACLES["pipe_dsir_weights"] = f"""
    WITH w0 AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), w2 AS (
        SELECT * FROM w0 WHERE length(w) > 0
    ), tgt AS (
        SELECT min(source) AS t FROM documents
    ), wb AS (
        SELECT doc_id, source, {_DSIR_WORD_HASH} % 512 AS b,
               CASE WHEN source = (SELECT t FROM tgt) THEN 1 ELSE 0 END AS is_tgt
        FROM w2
    ), model AS (
        SELECT b, count(*) AS cnt_r, sum(is_tgt) AS cnt_t FROM wb GROUP BY b
    ), totals AS (
        SELECT sum(cnt_r) AS tot_r, sum(cnt_t) AS tot_t FROM model
    ), scored AS (
        SELECT b,
               ln(cnt_t + 1) - ln((SELECT tot_t FROM totals) + 512)
             - ln(cnt_r + 1) + ln((SELECT tot_r FROM totals) + 512) AS lr
        FROM model
    ), per_doc AS (
        SELECT doc_id, any_value(source) AS source, sum(lr) AS w_doc
        FROM wb JOIN scored USING (b)
        GROUP BY doc_id
    )
    SELECT source, count(*) AS n_docs,
           round(avg(w_doc), 6) AS avg_dsir_weight,
           CAST(sum(CASE WHEN round(w_doc, 6) > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_positive
    FROM per_doc GROUP BY source
"""
