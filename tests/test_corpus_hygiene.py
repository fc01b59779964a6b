"""Non-vacuity + semantics tests for the corpus-hygiene queries
(q45-q48).  The driver's DuckDB oracle proves value equality; these
tests prove the checks MEAN something — both outcomes occur, the
sample is layout-independent, and the URL collapse is exactly 2:1.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_decontamination_flags_some_not_all(spark):
    from watermark_remove_spark.queries import q45_benchmark_decontamination

    rows = q45_benchmark_decontamination(spark, SF).collect()
    n_train = sum(r.n_train for r in rows)
    n_cont = sum(r.n_contaminated for r in rows)
    assert n_train > 0
    # every source reports, contaminated never exceeds train
    assert all(0 <= r.n_contaminated <= r.n_train for r in rows)
    # the gate must not be vacuous in EITHER direction at sf0.01 (the
    # driver's scale); at sf0.001 the eval set can be empty, so only
    # the structural invariants are asserted here
    assert n_cont <= n_train


def test_decontamination_non_vacuous_at_sf001(spark):
    from watermark_remove_spark.queries import q45_benchmark_decontamination

    rows = q45_benchmark_decontamination(spark, "/root/testdata/sf0.01").collect()
    n_cont = sum(r.n_contaminated for r in rows)
    n_train = sum(r.n_train for r in rows)
    assert 0 < n_cont < n_train


def test_repetition_filters_both_outcomes(spark):
    from watermark_remove_spark.queries import q46_repetition_filters

    rows = q46_repetition_filters(spark, "/root/testdata/sf0.01").collect()
    kept = [r for r in rows if r.keep]
    dropped = [r for r in rows if not r.keep]
    assert kept and dropped, "quality gate must fire both ways"
    for r in rows:
        assert 0.0 < r.top_token_frac <= 1.0
        assert 0.0 < r.distinct_token_ratio <= 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0


def test_repetition_filters_degenerate_doc(spark):
    """A maximally repetitive doc must be dropped, a diverse one kept."""
    from watermark_remove_spark.queries import q46_repetition_filters

    import os
    import tempfile

    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="wrs-hyg-")
    diverse = " ".join(f"w{i}" for i in range(200))
    df = pd.DataFrame(
        {
            "doc_id": [1, 2],
            "text": ["spam " * 199 + "spam", diverse],
            "lang": ["en", "en"],
            "source": ["s", "s"],
            "n_chars": [1000, 1000],
        }
    )
    df.to_parquet(os.path.join(tmp, "documents.parquet"), index=False)
    rows = {r.doc_id: r for r in q46_repetition_filters(spark, tmp).collect()}
    assert rows[1].top_token_frac == 1.0 and not rows[1].keep
    assert rows[2].distinct_token_ratio == 1.0 and rows[2].keep


def test_stratified_sample_deterministic_and_layout_independent(spark):
    from watermark_remove_spark.queries import q47_stratified_sample

    a = sorted(map(tuple, q47_stratified_sample(spark, SF).collect()))
    b = sorted(map(tuple, q47_stratified_sample(spark, SF).collect()))
    assert a == b
    # layout independence: the same decision expression over a
    # repartitioned input yields the identical sample
    from watermark_remove_spark.functions.portable_hash import md5_i64_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    kept_ids = lambda d: {
        r.doc_id
        for r in d.where(
            (md5_i64_expr(F.col("doc_id").cast("string"), salt="strat#") % 10)
            < F.when(F.col("lang") == "en", F.lit(5)).otherwise(F.lit(8))
        )
        .select("doc_id")
        .collect()
    }
    assert kept_ids(docs) == kept_ids(docs.repartition(13))


def test_stratified_sample_rates_plausible(spark):
    """Bucket uniformity: per-lang keep rate lands near the target
    (50% en / 80% other) at sf0.01 — catches a broken hash (all-keep
    or all-drop would be silent in the oracle, which mirrors the
    expression)."""
    from watermark_remove_spark.queries import q47_stratified_sample

    rows = q47_stratified_sample(spark, "/root/testdata/sf0.01").collect()
    en_docs = sum(r.n_docs for r in rows if r.lang == "en")
    en_kept = sum(r.n_kept for r in rows if r.lang == "en")
    other_docs = sum(r.n_docs for r in rows if r.lang != "en")
    other_kept = sum(r.n_kept for r in rows if r.lang != "en")
    assert 0.3 <= en_kept / en_docs <= 0.7
    assert 0.6 <= other_kept / other_docs <= 0.95


def test_url_canonicalization_exact_collapse(spark):
    from watermark_remove_spark.queries import q48_url_canonicalization

    rows = q48_url_canonicalization(spark, SF).collect()
    assert rows
    for r in rows:
        # every page emits (canonical, messy) and normalization must
        # collapse the pair: exactly 2 raw per canonical
        assert r.n_raw_urls == 2 * r.n_canonical_urls
        assert r.registrable == "example.com"
        assert r.host.endswith(".example.com")


@pytest.mark.parametrize(
    ("raw", "want"),
    [
        ("HTTP://WWW.Ex.Example.com/a/b?x=1", "ex.example.com/a/b"),
        ("https://m.ex.example.com/a/b/", "ex.example.com/a/b"),
        ("HTTPS://ex.example.com/a/b#frag", "ex.example.com/a/b"),
        ("https://ex.example.com/", "ex.example.com"),
    ],
)
def test_url_normalizer_cases(spark, raw, want):
    df = spark.createDataFrame([(raw,)], ["url"])
    u = F.lower(F.col("url"))
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^(www|m)\\.", "")
    u = F.regexp_replace(u, "[?#].*$", "")
    u = F.regexp_replace(u, "/+$", "")
    assert df.select(u.alias("c")).first().c == want


def test_streaming_quarantine_routes_both_ways(spark):
    """q52 non-vacuity: the poison injection must actually exercise
    BOTH routes, and the two routes must partition the corpus."""
    from watermark_remove_spark.queries import q52_streaming_quarantine

    rows = q52_streaming_quarantine(spark, "/root/testdata/sf0.001").collect()
    routed = {}
    for r in rows:
        routed.setdefault(r.routed, set()).add(r.url)
    assert routed.get("quarantine"), "no poison page reached quarantine"
    assert routed.get("data"), "no clean page committed"
    assert not (routed["data"] & routed["quarantine"])


def test_cli_suite_subcommand(spark, tmp_path, capsys):
    from watermark_remove_spark.cli import main

    assert main(["suite", "--list"]) == 0
    assert "q45_benchmark_decontamination" in capsys.readouterr().out

    out = str(tmp_path / "q47.csv")
    rc = main([
        "suite", "q47_stratified_sample",
        "--sf-dir", "/root/testdata/sf0.001",
        "--format", "csv", "--output", out,
    ])
    assert rc == 0
    import glob
    import os

    files = [p for p in glob.glob(out) + glob.glob(out + "/*.csv") if os.path.isfile(p)]
    assert files, f"suite export wrote nothing at {out}"
    assert any(os.path.getsize(p) > 0 for p in files)
    assert main(["suite", "nope"]) == 1
