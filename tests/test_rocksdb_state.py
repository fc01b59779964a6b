"""RocksDB state-store provider (SURVEY §4: bounded-memory streaming
state): the dedup pipeline must produce identical row-exact output
under RocksDB as under the default HDFS-backed provider."""

from __future__ import annotations

import pandas as pd

from watermark_remove_spark.fixtures import PagesConfig, generate_corpus
from watermark_remove_spark.oracle_stream import simulate_dedup
from watermark_remove_spark.sources.pages import stream_pages_files, write_batch_files
from watermark_remove_spark.streaming.pipeline import run_stream_to_sink
from watermark_remove_spark.streaming.sink import ParquetLedgerSink

ROCKSDB = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def test_dedup_rowexact_under_rocksdb(spark, tmp_path):
    corpus = generate_corpus(PagesConfig(n_pages=300, n_domains=4, seed=13, dup_frac=0.05))
    pages = corpus.pages
    sent = pd.DataFrame(
        {
            "url": ["https://s.example.com/p/1", "https://s.example.com/p/2"],
            "warc_ts": [pd.Timestamp("2027-01-01"), pd.Timestamp("2027-01-01T01:00")],
            "html": [b"s", b"s"],
            "text": ["s", "s"],
            "lang": ["en", "en"],
        }
    )
    batches = [pages.iloc[:150], pages.iloc[150:], sent.iloc[:1], sent.iloc[1:]]
    src = str(tmp_path / "src")
    write_batch_files(batches, src)

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB)
    try:
        ded = (
            stream_pages_files(spark, src, 1)
            .withWatermark("warc_ts", "10 minutes")
            .dropDuplicates(["url", "warc_ts"])
            .select("url", "warc_ts")
        )
        sink = ParquetLedgerSink(str(tmp_path / "out"))
        q = run_stream_to_sink(ded, sink, str(tmp_path / "ck"))
        q.awaitTermination(300)
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)

    got = {(r.url, pd.Timestamp(r.warc_ts)) for r in sink.read_committed(spark).collect()}
    want_df = simulate_dedup(batches, pd.Timedelta(minutes=10))
    want = set(zip(want_df["url"], want_df["warc_ts"]))
    assert got == want
