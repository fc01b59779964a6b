"""Watermark-boundary semantics of session windows, pinned empirically.

Corpus engineered so a session's end lands EXACTLY on the in-force
watermark (two-batch lag model, oracle_stream module doc) and a later
micro-batch delivers an event at exactly t == wm:

- builtin streaming ``F.session_window`` ADMITS the t == wm event (its
  window end is > wm) and, having already evicted the finished session
  at ``end == wm``, starts a NEW session for it;
- ``applyInPandasWithState`` late-filters strictly (keeps t > wm), so
  our stateful engine never sees the event — the one documented
  boundary divergence between the two engines (ADVICE round 2).

Consequences verified here:
1. engine output == oracle (``simulate_sessions`` with strict-> admit);
2. builtin output == engine output + exactly the boundary session;
3. the <=-close in ``split_closed`` is exact under strict-> admission.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from watermark_remove_spark.operators.extract import with_domain
from watermark_remove_spark.oracle_stream import simulate_sessions
from watermark_remove_spark.sources.pages import (
    stream_pages_files,
    write_batch_files,
)
from watermark_remove_spark.streaming.pipeline import run_stream_to_sink
from watermark_remove_spark.streaming.sessions import stateful_domain_sessions
from watermark_remove_spark.streaming.sink import ParquetLedgerSink

BASE = pd.Timestamp("2026-01-01T00:00:00")
GAP = pd.Timedelta(seconds=10)


def _t(sec: float) -> pd.Timestamp:
    return BASE + pd.Timedelta(seconds=sec)


def _page(domain: str, sec: float, i: int) -> dict:
    return dict(
        url=f"https://{domain}.example.com/p/{i}",
        warc_ts=_t(sec),
        html=b"x",
        text="x",
        lang="en",
    )


@pytest.fixture(scope="module")
def boundary_batches() -> list[pd.DataFrame]:
    # gap=10s, delay=0s.  wm(k) = max ts of batches 0..k-2.
    # b0: a@100 (session A [100,110)); w@110 drives the max to 110.
    # b1: w@50 filler (does not raise the max).
    # b2: wm=110 == A.end — builtin evicts A; our close fires on timeout.
    # b3: wm=110 still; a@110 is the boundary event (t == wm).
    # b4..b6: watermark raisers so everything real flushes.
    return [
        pd.DataFrame([_page("a", 100, 0), _page("w", 110, 1)]),
        pd.DataFrame([_page("w", 50, 2)]),
        pd.DataFrame([_page("w", 110, 3)]),
        pd.DataFrame([_page("a", 110, 4)]),
        pd.DataFrame([_page("w", 1000, 5)]),
        pd.DataFrame([_page("w", 2000, 6)]),
        pd.DataFrame([_page("w", 3000, 7)]),
    ]


@pytest.fixture(scope="module")
def boundary_dir(boundary_batches, tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("boundary_src"))
    write_batch_files(boundary_batches, d)
    return d


def _domain_a(rows) -> set:
    return {r for r in rows if r[0].startswith("a.")}


def test_boundary_event_semantics(spark, boundary_batches, boundary_dir, tmp_path):
    # -- our stateful engine --------------------------------------------
    src = with_domain(stream_pages_files(spark, boundary_dir, 1))
    sessions = stateful_domain_sessions(src, gap_seconds=10, watermark="0 seconds")
    sink = ParquetLedgerSink(str(tmp_path / "out"))
    q = run_stream_to_sink(sessions, sink, str(tmp_path / "ck"))
    q.awaitTermination(300)
    engine = {
        (r.domain, pd.Timestamp(r.session_start), pd.Timestamp(r.session_end), r.n_pages)
        for r in sink.read_committed(spark).collect()
    }

    # -- builtin F.session_window streaming ------------------------------
    src_b = with_domain(stream_pages_files(spark, boundary_dir, 1))
    builtin_q = (
        src_b.withWatermark("warc_ts", "0 seconds")
        .groupBy(F.session_window("warc_ts", "10 seconds").alias("w"), "domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            "domain",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_pages",
        )
    )
    out_b = str(tmp_path / "builtin")
    qb = (
        builtin_q.writeStream.format("parquet")
        .option("path", out_b)
        .option("checkpointLocation", str(tmp_path / "ck_b"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    qb.awaitTermination(300)
    builtin = {
        (r.domain, pd.Timestamp(r.session_start), pd.Timestamp(r.session_end), r.n_pages)
        for r in spark.read.parquet(out_b).collect()
    }

    # -- oracle -----------------------------------------------------------
    from watermark_remove_spark.spec import domain_of

    batches = [
        b.assign(domain=b["url"].map(domain_of)) for b in boundary_batches
    ]
    want_df = simulate_sessions(batches, pd.Timedelta(0), GAP)
    oracle = {
        (r.domain, r.session_start, r.session_end, r.n_pages)
        for r in want_df.itertuples(index=False)
    }

    # non-vacuous: the boundary event produced a session for the builtin
    boundary_session = (
        "a.example.com", _t(110), _t(120), 1
    )
    assert boundary_session in _domain_a(builtin)

    # 1. engine == oracle, including the dropped boundary event
    assert engine == oracle
    # 2. builtin == engine + exactly the boundary session (domain a view)
    assert _domain_a(builtin) == _domain_a(engine) | {boundary_session}
    # 3. the finished session itself agrees everywhere
    assert ("a.example.com", _t(100), _t(110), 1) in _domain_a(engine)
