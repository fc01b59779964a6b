"""Benchmark harness — run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print
ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "pages_per_sec": ...}

The headline suite covers every operator family:
- the streaming flagship (mask mine -> dedup -> UDF extract -> window
  agg -> exactly-once sink) over a synthetic pages corpus, measured in
  pages/sec (north_star metric);
- the relational/window/dedup/similarity batch queries from the driver
  contract at the bench scale factor.

Scaling-efficiency evidence (N vs 4N executor JVMs via local-cluster) is produced by
tools/scaling_bench.py -> BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_PAGES = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "60000"))


def _build_pages_corpus(tmp: str) -> tuple[str, int]:
    """Deterministic synthetic pages corpus for the streaming flagship
    (no external data; BASELINE.json input_hint shape)."""
    from watermark_remove_spark.fixtures import PagesConfig, generate_corpus
    from watermark_remove_spark.sources.pages import write_batch_files

    corpus = generate_corpus(
        PagesConfig(n_pages=BENCH_PAGES, n_domains=50, seed=42, mean_gap_seconds=1.0)
    )
    pages = corpus.pages
    n_files = 4
    per = (len(pages) + n_files - 1) // n_files
    batches = [pages.iloc[i * per : (i + 1) * per] for i in range(n_files)]
    src = os.path.join(tmp, "pages_stream")
    # 16 subfiles per micro-batch: scan parallelism within a trigger
    write_batch_files([b for b in batches if len(b)], src, subfiles=16)
    return src, len(pages)


def bench_streaming_flagship(spark, tmp: str) -> dict:
    """End-to-end streaming pipeline throughput (pages/sec)."""
    from pyspark.sql import functions as F

    from watermark_remove_spark.operators.extract import mine_masks
    from watermark_remove_spark.sources.pages import read_pages_batch
    from watermark_remove_spark.streaming.pipeline import (
        build_clean_stream,
        build_window_stream,
        run_stream_to_sink,
    )
    from watermark_remove_spark.streaming.sink import ParquetLedgerSink

    src, n_pages = _build_pages_corpus(tmp)

    batch_pages = read_pages_batch(spark, src)
    t0 = time.perf_counter()
    masks = mine_masks(batch_pages)
    masks.cache().count()
    mine_sec = time.perf_counter() - t0

    sink = ParquetLedgerSink(os.path.join(tmp, "sink"))
    ck = os.path.join(tmp, "ck")
    cleaned = build_clean_stream(spark, src, masks, files_per_trigger=16)
    win = build_window_stream(cleaned)
    t0 = time.perf_counter()
    q = run_stream_to_sink(win, sink, ck)
    q.awaitTermination(1800)
    stream_sec = time.perf_counter() - t0
    masks.unpersist()
    return {
        "mask_mining_sec": round(mine_sec, 3),
        "streaming_pipeline_sec": round(stream_sec, 3),
        "n_pages": n_pages,
        "pages_per_sec": round(n_pages / stream_sec, 1),
    }


def main() -> None:
    from watermark_remove_spark.queries import QUERIES
    from watermark_remove_spark.session import build_session

    spark = build_session(
        app_name="wrs-bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    spark.sparkContext.setLogLevel("ERROR")

    headline = [
        "q01_pricing_summary",
        "q02_segment_sales",
        "q05_top_orders_per_priority",
        "q09_tumbling_event_windows",
        "q10_sliding_event_windows",
        "q11_user_sessions",
        "q13_frequent_shingles",
        "q14_boiler_ratio",
        "q16_jaccard_pairs",
        "q18_token_stats",
        "q20_cosine_topk",
        "q22_minhash_near_dupes",
        "q26_salted_domain_windows",
        "q31_ivf_topk",
    ]

    # Warm the JVM once before timing: the first Spark action pays
    # ~3-4 s of whole-stage-codegen/JIT compilation that belongs to
    # process startup, not to any query (it touches no bench input).
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, float] = {}
    tmp = tempfile.mkdtemp(prefix="wrs-bench-")
    try:
        for name in headline:
            fn = QUERIES[name]
            t0 = time.perf_counter()
            # count() forces full execution without driver-side collect cost
            fn(spark, SF_DIR).count()
            timings[name] = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        stream_stats = bench_streaming_flagship(spark, tmp)
        timings["streaming_flagship"] = round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall time (batch operators + streaming flagship)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "cpus": CPUS,
        **stream_stats,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
