"""Inverted n-gram index (operators/text_index.py).

Contract under test:
  - postings = one row per (doc, distinct gram hash); the Spark-side hash
    equals a pure-Python replay of the closed form (oracle-replayable);
  - probing returns exactly the documents sharing a gram hash with the
    probe set (cross-checked against a brute-force join);
  - the range-clustered layout + bloom sidecar PRUNE: a tight probe set
    scans fewer files than the table holds;
  - incremental refresh (append new docs' postings) answers identically
    to a full rebuild — and never rewrites existing postings files;
  - probe sets past the cap skip pruning but stay correct.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_benchmark_ingestion_spark.operators.text_index import (
    GRAM_COL,
    HASH_B,
    HASH_P,
    build_text_index,
    gram_hash_col,
    postings_df,
    probe_text_index,
    refresh_text_index,
)


def _py_gram_hashes(text: str, n: int) -> set[int]:
    out = set()
    for i in range(max(len(text) - n + 1, 1)):
        h = 0
        for ch in text[i : i + n]:
            h = (h * HASH_B + ord(ch)) % HASH_P
        out.add(h)
    return out


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_gram_hashes_match_python_replay(spark):
    from lakehouse_benchmark_ingestion_spark.operators.text_index import (
        gram_hashes_udf,
    )

    rows = [(1, "a", "hello world"), (2, "a", "abc"), (3, "b", ""),
            (4, "c", "exact"), (5, "d", "ünïcødé £5 → ok")]
    df = _docs(spark, rows).select(
        "doc_id",
        gram_hash_col("text", 5).alias("g_expr"),
        gram_hashes_udf(5)(F.col("text")).alias("g_np"),
    )
    got = {r["doc_id"]: (set(r["g_expr"]), set(r["g_np"])) for r in df.collect()}
    for doc_id, _, text in rows:
        expr_set, np_set = got[doc_id]
        want = _py_gram_hashes(text, 5)
        # the Catalyst spec, the vectorized Arrow kernel, and the pure-
        # Python replay must agree exactly (incl. unicode codepoints,
        # short-text fallback, empty text)
        assert expr_set == want, text
        assert np_set == want, text


def test_probe_exactness_and_pruning(spark, tmp_path):
    # the contamination shape: most probe grams are ABSENT from the corpus
    # (held-out benchmark text), a few hit — pruning must skip the files
    # no probe can live in, the join must return exactly the true hits
    rows = [(i, f"s{i % 4}", f"corpus doc {i:04d} body text segment")
            for i in range(64)]
    docs = _docs(spark, rows)
    tbl = build_text_index(
        spark, docs, str(tmp_path / "wh"), n=6, num_files=8
    )
    # probes: many grams no corpus doc contains + ONE gram unique to doc 17
    # ("c 0017" occurs only in "corpus doc 0017 ...")
    probe_rows = [
        (1000 + j, "eval", f"ZZQX!{j:05d}@held#out$gram%{j * 7:06d}")
        for j in range(30)
    ] + [(2000, "eval", "c 0017")]
    probes = (
        postings_df(_docs(spark, probe_rows), 6).select(GRAM_COL).distinct()
    )
    hits, metrics = probe_text_index(spark, tbl, probes)
    got = {r["doc_id"] for r in hits.collect()}

    # brute force: any doc sharing a gram hash
    brute = (
        postings_df(docs, 6)
        .join(probes, GRAM_COL)
        .select("doc_id")
        .distinct()
    )
    assert got == {r["doc_id"] for r in brute.collect()} == {17}
    assert metrics["probes_pruned"]
    assert metrics["files_scanned"] < metrics["files_total"], metrics


def test_refresh_matches_full_rebuild(spark, tmp_path):
    rows = [(i, "s", f"document number {i:05d} talks about topic{i % 7}")
            for i in range(40)]
    first, second = rows[:25], rows[25:]
    docs_all = _docs(spark, rows)

    tbl = build_text_index(spark, _docs(spark, first), str(tmp_path / "wh1"),
                           n=8, num_files=4)
    files_before = {f.path for f in tbl.data_files()}
    refresh_text_index(spark, tbl, _docs(spark, second), num_files=2)
    # incremental: old postings files never rewritten
    assert files_before <= {f.path for f in tbl.data_files()}

    full = build_text_index(spark, docs_all, str(tmp_path / "wh2"),
                            n=8, num_files=4)
    probes = (
        postings_df(_docs(spark, [rows[3], rows[30]]), 8)
        .select(GRAM_COL).distinct()
    )
    inc_hits, _ = probe_text_index(spark, tbl, probes)
    full_hits, _ = probe_text_index(spark, full, probes)
    assert {tuple(r) for r in inc_hits.collect()} == {
        tuple(r) for r in full_hits.collect()
    }


def test_over_cap_probe_skips_pruning_but_stays_exact(spark, tmp_path):
    rows = [(i, "s", f"xyz-{i:03d}") for i in range(20)]
    docs = _docs(spark, rows)
    tbl = build_text_index(spark, docs, str(tmp_path / "wh"), n=4,
                           num_files=2, bloom=False)
    probes = postings_df(docs, 4).select(GRAM_COL).distinct()
    hits, metrics = probe_text_index(spark, tbl, probes, probe_cap=3)
    assert not metrics["probes_pruned"]
    assert metrics["files_scanned"] == metrics["files_total"]
    assert {r["doc_id"] for r in hits.collect()} == {r[0] for r in rows}


# ---- CDC-driven sync against an icelite base table ------------------------


def _base_table(spark, warehouse, rows):
    from lakehouse_benchmark_ingestion_spark.icelite import Catalog

    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    tbl = Catalog(warehouse).create_table("docs", df.schema)
    tbl.append(df, num_files=2)
    return tbl, df


def _probe_all_docs(spark, tbl, rows, n=8):
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    probes = postings_df(docs, n).select(GRAM_COL).distinct()
    hits, _ = probe_text_index(spark, tbl, probes)
    return {r["doc_id"] for r in hits.collect()}


def test_sync_applies_base_appends_and_deletes(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.operators.text_index import (
        register_text_index,
        sync_text_index,
    )

    rows = [(i, "s", f"unique-{i:04d}-payload words here") for i in range(12)]
    base, _ = _base_table(spark, str(tmp_path / "base"), rows)
    idx = register_text_index(
        spark, base, str(tmp_path / "idx"), n=8, num_files=4
    )

    # base evolves: 4 new docs appended, doc 3 deleted
    new_rows = [(100 + i, "s", f"fresh-{i:04d}-added later") for i in range(4)]
    base.append(
        spark.createDataFrame(new_rows, "doc_id long, source string, text string")
    )
    delete_where(spark, base, {"doc_id": 3}, strategy="cow", key="doc_id")

    r = sync_text_index(spark, base, idx)
    assert r["synced"] and r["deleted_keys"] == 1

    # probing each doc's own grams: new docs found, deleted doc gone
    assert _probe_all_docs(spark, idx, new_rows) == {100, 101, 102, 103}
    assert 3 not in _probe_all_docs(spark, idx, rows)
    assert 4 in _probe_all_docs(spark, idx, rows)

    # idempotent: watermark moved with the sync
    assert not sync_text_index(spark, base, idx)["synced"]


def test_sync_update_replaces_postings(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.operators.merge_into import merge_into
    from lakehouse_benchmark_ingestion_spark.operators.text_index import (
        register_text_index,
        sync_text_index,
    )

    rows = [(i, "s", f"original-{i:04d}-body") for i in range(6)]
    base, _ = _base_table(spark, str(tmp_path / "base"), rows)
    idx = register_text_index(spark, base, str(tmp_path / "idx"), n=8,
                              num_files=2)

    # update doc 2's text via MERGE (delete+insert pair in the CDC diff)
    upd = spark.createDataFrame(
        [(2, "s", "REWRITTEN-0002-payload", 1)],
        "doc_id long, source string, text string, _seq long",
    )
    merge_into(spark, base, upd, key="doc_id")
    r = sync_text_index(spark, base, idx)
    assert r["synced"] and r["deleted_keys"] == 1

    # old grams no longer find doc 2; new grams do
    assert 2 not in _probe_all_docs(spark, idx, [rows[2]])
    assert _probe_all_docs(
        spark, idx, [(2, "s", "REWRITTEN-0002-payload")]
    ) == {2}


def test_sync_matches_full_rebuild(spark, tmp_path):
    from lakehouse_benchmark_ingestion_spark.operators.row_dml import delete_where
    from lakehouse_benchmark_ingestion_spark.operators.text_index import (
        build_text_index,
        register_text_index,
        sync_text_index,
    )

    rows = [(i, "s", f"alpha-{i:03d}-beta gamma") for i in range(10)]
    base, _ = _base_table(spark, str(tmp_path / "base"), rows)
    idx = register_text_index(spark, base, str(tmp_path / "idx"), n=8,
                              num_files=2)
    base.append(spark.createDataFrame(
        [(50, "t", "delta-050-epsilon")],
        "doc_id long, source string, text string"))
    delete_where(spark, base, {"doc_id": (0, 2)}, strategy="cow", key="doc_id")
    sync_text_index(spark, base, idx)

    rebuilt = build_text_index(
        spark, base.scan(spark), str(tmp_path / "idx2"), n=8, num_files=2
    )
    a = idx.scan(spark).select("doc_id", "source", GRAM_COL)
    b = rebuilt.scan(spark).select("doc_id", "source", GRAM_COL)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
