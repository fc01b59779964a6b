"""Dedup family + similarity search + as-of join + multimodal plumbing."""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import functions as F

from watermark_remove_spark.operators.dedup import (
    dedup_exact_content,
    minhash_near_dupes,
    ngram_jaccard,
    simhash_near_dupes,
)
from watermark_remove_spark.operators.joins import anti_join, asof_join_latest_by_key, semi_join
from watermark_remove_spark.operators.multimodal import extract_media_features
from watermark_remove_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_dupes,
    lsh_topk,
)
from watermark_remove_spark.oracle import oracle_asof_template_version
from watermark_remove_spark.spec import shingles


def _docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("today", "tonight")),  # near dup of 0
        (3, "completely different content about spark engines and shuffles here now"),
        (4, "another unrelated document talking about window aggregation semantics"),
        (5, base + " with a small extra suffix appended"),  # near dup
    ]
    return spark.createDataFrame(rows, "id bigint, text string")


def test_exact_content_dedup(spark):
    df = _docs(spark)
    out = dedup_exact_content(df, "id")
    ids = {r.id for r in out.collect()}
    assert 0 in ids and 1 not in ids and len(ids) == 5


def test_minhash_finds_near_dupes(spark):
    df = _docs(spark)
    pairs = {(r.id_a, r.id_b) for r in minhash_near_dupes(df, "id", threshold=0.5).collect()}
    assert (0, 1) in pairs  # identical
    assert (0, 2) in pairs or (0, 5) in pairs  # near dup caught
    assert all(not ((a, b) == (3, 4)) for a, b in pairs)  # unrelated not paired


def test_minhash_fast_path_same_pairs(spark):
    """portable=False (xxhash64 production hashing) must yield the
    IDENTICAL final near-dup pair set as the md5-portable oracle path:
    the exact-Jaccard verify stage makes the output hash-agnostic as
    long as banding recalls the true near-dup candidates — on both the
    toy corpus and the real sf0.001 documents table (q22's input
    shape)."""
    toy = _docs(spark)
    for df, id_col, thr in [
        (toy, "id", 0.5),
        (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .selectExpr("doc_id as id", "text"),
            "id",
            0.5,
        ),
    ]:
        slow = {
            (r.id_a, r.id_b)
            for r in minhash_near_dupes(df, id_col, threshold=thr).collect()
        }
        fast = {
            (r.id_a, r.id_b)
            for r in minhash_near_dupes(
                df, id_col, threshold=thr, portable=False
            ).collect()
        }
        assert slow == fast


def test_jaccard_exact_value(spark):
    df = spark.createDataFrame([(0, "a b c d"), (1, "a b c d")], "id bigint, text string")
    pairs = spark.createDataFrame([(0, 1)], "id_a bigint, id_b bigint")
    j = ngram_jaccard(df, pairs, "id").collect()[0]
    assert j.jaccard == 1.0


def test_simhash_near_dupes(spark):
    df = _docs(spark)
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_near_dupes(df, "id", max_hamming=10).collect()}
    assert pairs.get((0, 1)) == 0
    assert (3, 4) not in pairs


def test_semi_anti_join(spark):
    df = _docs(spark)
    keys = spark.createDataFrame([(0,), (3,)], "id bigint")
    assert semi_join(df, keys, "id").count() == 2
    assert anti_join(df, keys, "id").count() == 4


def test_asof_join_matches_oracle(spark, corpus, pages_sdf):
    from watermark_remove_spark.operators.extract import with_domain

    tmpl = spark.createDataFrame(
        corpus.domain_templates[["domain", "valid_from"]].drop_duplicates()
    )
    pages = with_domain(pages_sdf).dropDuplicates(["url", "warc_ts"])
    got = asof_join_latest_by_key(
        pages.select("url", "warc_ts", "domain"), tmpl, unique_key=["url", "warc_ts"]
    ).select("url", "warc_ts", F.col("valid_from").alias("template_valid_from"))
    want = oracle_asof_template_version(
        corpus.pages.drop_duplicates(subset=["url", "warc_ts"]), corpus.domain_templates
    )[["url", "warc_ts", "template_valid_from"]]
    gp = got.toPandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
    wp = want.sort_values(["url", "warc_ts"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(gp, wp, check_dtype=False)


def _embeddings(spark, n=60, dim=8):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        v = rng.normal(size=dim)
        rows.append((i, [float(x) for x in v]))
    # inject two near-identical pairs
    base = rng.normal(size=dim)
    rows.append((n, [float(x) for x in base]))
    rows.append((n + 1, [float(x) for x in base + rng.normal(scale=1e-3, size=dim)]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_brute_force_topk_exact(spark):
    emb = _embeddings(spark)
    q = emb.where(F.col("vec_id") == 60)
    top = brute_force_topk(emb, q, k=3).collect()
    assert top[0].neighbor_id == 61  # the injected near-twin is rank 1
    assert top[0].cosine > 0.999


def test_lsh_topk_recall(spark):
    emb = _embeddings(spark, n=100)
    q = emb.limit(5)
    exact = brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = lsh_topk(emb, q, k=5, n_planes=4).select("query_id", "neighbor_id")
    inter = exact.intersect(approx).count()
    assert inter >= 5  # >=20% recall with 4 planes on random data; sanity floor


def test_embedding_near_dupes(spark):
    emb = _embeddings(spark)
    pairs = {(r.id_a, r.id_b) for r in embedding_near_dupes(emb, threshold=0.99).collect()}
    assert (60, 61) in pairs


def test_multimodal_plumbing(spark):
    rows = [
        (0, "image", b"\x01\x02\x03\x04" * 10, "image/png", 2, 2, None),
        (1, "audio", b"", "audio/wav", None, None, 1000),
        (2, "image", None, "image/png", None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id bigint, kind string, payload binary, mime string, "
        "width int, height int, duration_ms bigint",
    )
    out = extract_media_features(media).collect()
    by_id = {r.media_id: r for r in out}
    assert len(by_id) == 3
    assert by_id[0].n_bytes == 40 and len(by_id[0].feature) == 8
    assert by_id[1].feature == [0.0] * 8
    assert by_id[2].n_bytes == 0
    # determinism
    out2 = extract_media_features(media).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_real_decoder_stub_quarantines(spark):
    media = spark.createDataFrame(
        [(0, "image", b"xx", "image/png", None, None, None)],
        "media_id bigint, kind string, payload binary, mime string, width int, height int, duration_ms bigint",
    )
    out = extract_media_features(media, deterministic_fake_decode=False).collect()[0]
    assert out.feature is None and "Pillow" in out.error


def test_ivf_topk_recall(spark):
    from watermark_remove_spark.operators.similarity import ivf_topk

    emb = _embeddings(spark, n=120)
    q = emb.limit(5)
    exact = brute_force_topk(emb, q, k=5).select("query_id", "neighbor_id")
    approx = ivf_topk(emb, q, k=5, n_centroids=8, n_probe=4).select(
        "query_id", "neighbor_id"
    )
    inter = exact.intersect(approx).count()
    assert inter >= 10  # >=40% recall with 4/8 probes on random data


def test_ivf_finds_injected_twin(spark):
    from watermark_remove_spark.operators.similarity import ivf_topk

    emb = _embeddings(spark)  # injects near-identical pair (60, 61)
    q = emb.where(F.col("vec_id") == 60)
    top = ivf_topk(emb, q, k=3, n_centroids=8, n_probe=8).collect()
    assert top[0].neighbor_id == 61  # full probe == exhaustive: twin found


def test_bpe_ish_and_rolling_fingerprint(spark):
    from watermark_remove_spark.functions.text import (
        bpe_ish_token_count_expr,
        rolling_fingerprint_expr,
    )

    df = spark.createDataFrame(
        [(0, "Hello, world! abc123 def"), (1, ""), (2, "same text here ok fine yes"),
         (3, "same text here ok fine yes")],
        "id bigint, text string",
    )
    rows = {r.id: r for r in df.select(
        "id",
        bpe_ish_token_count_expr(F.col("text")).alias("bpe"),
        rolling_fingerprint_expr(F.col("text")).alias("fp"),
    ).collect()}
    # Hello , world ! abc 123 def -> 7 pieces
    assert rows[0].bpe == 7
    assert rows[1].bpe == 0 and rows[1].fp is None
    assert rows[2].fp == rows[3].fp  # identical text -> identical fingerprint
    assert rows[0].fp != rows[2].fp
