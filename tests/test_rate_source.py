"""O-2 rate-limited synthetic stream: the `rate` metronome joined to
the corpus bounds ingest at rows/sec (north_star 'rate-limited
stream')."""

from __future__ import annotations

import time

from watermark_remove_spark.fixtures import PagesConfig, generate_corpus
from watermark_remove_spark.sources.pages import (
    stream_rate_limited_synthetic,
    write_batch_files,
)


def test_rate_limited_source_bounds_ingest(spark, tmp_path):
    corpus = generate_corpus(PagesConfig(n_pages=300, n_domains=3, seed=9))
    src = str(tmp_path / "corpus")
    write_batch_files([corpus.pages], src)

    stream = stream_rate_limited_synthetic(spark, src, rows_per_second=100)
    assert stream.isStreaming
    seen = []

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(lambda df, bid: seen.append(df.count()))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline and sum(seen) < 150:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)

    total = sum(seen)
    assert total >= 100  # stream is actually flowing
    # rate-limited: can't have ingested wildly beyond rate * elapsed
    assert total <= 300  # bounded by corpus (and by rate over the window)
