"""Streaming salted two-phase aggregation (O-21 streaming form) vs the
unsalted batch result on the same surviving rows."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from watermark_remove_spark.fixtures import PagesConfig, generate_corpus
from watermark_remove_spark.operators.extract import with_domain
from watermark_remove_spark.operators.skew import salted_window_domain_agg_stream
from watermark_remove_spark.sources.pages import stream_pages_files, write_batch_files
from watermark_remove_spark.streaming.pipeline import run_stream_to_sink
from watermark_remove_spark.streaming.sink import ParquetLedgerSink


def test_streaming_salted_agg_matches_batch(spark, tmp_path):
    corpus = generate_corpus(PagesConfig(n_pages=400, n_domains=5, seed=21, late_frac=0.0, dup_frac=0.0))
    pages = corpus.pages
    sentinel = pd.DataFrame(
        {
            "url": ["https://s.example.com/p/1", "https://s.example.com/p/2"],
            "warc_ts": [pd.Timestamp("2027-01-01"), pd.Timestamp("2027-01-01T01:00:00")],
            "html": [b"s", b"s"],
            "text": ["s", "s"],
            "lang": ["en", "en"],
        }
    )
    batches = [pages.iloc[:200], pages.iloc[200:], sentinel.iloc[:1], sentinel.iloc[1:]]
    src = str(tmp_path / "src")
    write_batch_files(batches, src)

    stream = with_domain(stream_pages_files(spark, src, 1)).withColumn(
        "clean_text", F.col("text")
    )
    agg = salted_window_domain_agg_stream(stream, salt_buckets=4)
    sink = ParquetLedgerSink(str(tmp_path / "out"))
    q = run_stream_to_sink(agg, sink, str(tmp_path / "ck"))
    q.awaitTermination(300)

    got = {
        (pd.Timestamp(r.window_start), r.domain): (r.n_pages, r.total_chars)
        for r in sink.read_committed(spark).collect()
        if not r.domain.startswith("s.example")
    }
    # batch truth over the same rows (no late/dups in this corpus, so
    # every non-sentinel window finalizes under the sentinel watermark)
    all_pages = pd.concat(batches, ignore_index=True)
    batch_truth = (
        with_domain(spark.createDataFrame(all_pages))
        .groupBy(F.window("warc_ts", "10 minutes").alias("w"), "domain")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("c"))
        .select(F.col("w.start").alias("ws"), "domain", "n", "c")
        .collect()
    )
    want = {
        (pd.Timestamp(r.ws), r.domain): (r.n, r.c)
        for r in batch_truth
        if not r.domain.startswith("s.example")
    }
    assert got == want


def test_q57_fixture_has_mega_domain_skew():
    """The q57 fixture must actually BE skewed — the salt only proves
    anything if one domain dominates (round-3 verdict #4: 'assert one
    domain >= 30% of rows')."""
    from watermark_remove_spark.queries import MEGA_DOMAIN, _skewed_pages_pandas

    pages, _ = _skewed_pages_pandas("/root/testdata/sf0.01")
    domains = pages["url"].str.split("/").str[2]
    share = (domains == MEGA_DOMAIN).mean()
    assert share >= 0.30, f"mega-domain share {share:.2%} < 30%"
    # and it dwarfs the runner-up
    runner_up = domains[domains != MEGA_DOMAIN].value_counts().iloc[0] / len(pages)
    assert share > 2 * runner_up
