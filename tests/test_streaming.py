"""Streaming end-to-end: exactly-once sink, dedup, windowed agg,
stateful sessions, stream-stream as-of join, checkpoint resume.

Golden strategy (oracle_stream docstring): a far-future sentinel row
in the last micro-batch pushes the watermark past all real windows so
emitted rows are complete and exactly comparable.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pytest
from pyspark.sql import functions as F

from watermark_remove_spark.fixtures import PagesConfig, generate_corpus
from watermark_remove_spark.oracle_stream import (
    simulate_dedup,
    simulate_sessions,
    simulate_tumbling_agg,
)
from watermark_remove_spark.operators.extract import mine_masks, with_domain
from watermark_remove_spark.sources.pages import stream_pages_files, write_ordered_batches
from watermark_remove_spark.streaming.pipeline import (
    build_clean_stream,
    build_window_stream,
    run_stream_to_sink,
    streaming_asof_template_join,
)
from watermark_remove_spark.streaming.sessions import stateful_domain_sessions
from watermark_remove_spark.streaming.sink import ParquetLedgerSink
from watermark_remove_spark.spec import clean_text, domain_of

DELAY = pd.Timedelta(minutes=10)
SENTINEL_TS = pd.Timestamp("2027-01-01T00:00:00")


@pytest.fixture(scope="module")
def stream_corpus():
    cfg = PagesConfig(n_pages=500, n_domains=6, seed=11, dup_frac=0.04, late_frac=0.06)
    return generate_corpus(cfg)


@pytest.fixture(scope="module")
def stream_batches(stream_corpus):
    pages = stream_corpus.pages
    sentinel = pd.DataFrame(
        {
            "url": ["https://sentinel.example.com/p/1"],
            "warc_ts": [SENTINEL_TS],
            "html": [b"sentinel"],
            "text": ["sentinel"],
            "lang": ["en"],
        }
    )
    n_files = 10
    per = (len(pages) + n_files - 1) // n_files
    batches = [pages.iloc[i * per : (i + 1) * per] for i in range(n_files)]
    sentinel2 = sentinel.assign(
        url="https://sentinel.example.com/p/2",
        warc_ts=SENTINEL_TS + pd.Timedelta(hours=1),
    )
    # two sentinel batches: with the two-batch watermark lag, the far-
    # future watermark must be *observed* a batch before it can flush
    batches = [b for b in batches if len(b)] + [sentinel, sentinel2]
    return batches


@pytest.fixture(scope="module")
def stream_dir(stream_batches, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_src"))
    from watermark_remove_spark.sources.pages import write_batch_files

    write_batch_files(stream_batches, d)
    return d


def _run(df, sink_dir, ckpt, mode="append"):
    sink = ParquetLedgerSink(sink_dir)
    q = run_stream_to_sink(df, sink, ckpt, output_mode=mode)
    q.awaitTermination(300)
    return sink


def test_stream_dedup_matches_oracle(spark, stream_corpus, stream_batches, stream_dir, tmp_path):
    src = stream_pages_files(spark, stream_dir, 1)
    deduped = src.withWatermark("warc_ts", "10 minutes").dropDuplicates(["url", "warc_ts"])
    sink = _run(deduped.select("url", "warc_ts"), str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (r.url, pd.Timestamp(r.warc_ts))
        for r in sink.read_committed(spark).collect()
    }
    want_df = simulate_dedup(stream_batches, DELAY)
    want = set(zip(want_df["url"], want_df["warc_ts"]))
    assert got == want


def test_stream_windows_match_oracle(spark, stream_corpus, stream_batches, stream_dir, tmp_path):
    masks = mine_masks(spark.createDataFrame(stream_corpus.pages))
    cleaned = build_clean_stream(spark, stream_dir, masks)
    win = build_window_stream(cleaned, "10 minutes")
    sink = _run(win, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (pd.Timestamp(r.window_start), r.lang, r.n_pages, r.total_chars)
        for r in sink.read_committed(spark).collect()
    }

    # oracle: dedup sim -> clean via spec -> tumbling agg sim
    from watermark_remove_spark.oracle import oracle_mine_masks

    omasks = oracle_mine_masks(stream_corpus.pages)
    deduped_batches = []
    survivors = simulate_dedup(stream_batches, DELAY)
    surv_keys = set(zip(survivors["url"], survivors["warc_ts"]))
    for b in stream_batches:
        bb = b[[((u, t) in surv_keys) for u, t in zip(b["url"], b["warc_ts"])]].copy()
        bb = bb.drop_duplicates(subset=["url", "warc_ts"])  # in-batch dup arrives once
        surv_keys -= set(zip(bb["url"], bb["warc_ts"]))  # first arrival only
        bb["clean_text"] = [
            clean_text(t, omasks.get(domain_of(u), frozenset()))
            for u, t in zip(bb["url"], bb["text"])
        ]
        deduped_batches.append(bb)
    want_df = simulate_tumbling_agg(deduped_batches, DELAY, pd.Timedelta(minutes=10))
    want = {
        (r.window_start, r.lang, r.n_pages, r.total_chars)
        for r in want_df.itertuples(index=False)
    }
    assert got == want


def test_stateful_sessions_match_oracle(spark, stream_corpus, stream_batches, stream_dir, tmp_path):
    src = stream_pages_files(spark, stream_dir, 1)
    pages = with_domain(src)
    sessions = stateful_domain_sessions(pages, gap_seconds=300, watermark="10 minutes")
    sink = _run(sessions, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (r.domain, pd.Timestamp(r.session_start), pd.Timestamp(r.session_end), r.n_pages)
        for r in sink.read_committed(spark).collect()
    }
    batches = [b.assign(domain=b["url"].map(domain_of)) for b in stream_batches]
    want_df = simulate_sessions(batches, DELAY, pd.Timedelta(minutes=5))
    want = {
        (r.domain, r.session_start, r.session_end, r.n_pages)
        for r in want_df.itertuples(index=False)
    }
    assert got == want


def test_sink_replay_is_noop(spark, tmp_path):
    sink = ParquetLedgerSink(str(tmp_path / "out"))
    df = spark.range(10).withColumnRenamed("id", "v")
    sink.write_batch(df, 0)
    n0 = sink.read_committed(spark).count()
    sink.write_batch(df, 0)  # replay
    assert sink.read_committed(spark).count() == n0 == 10
    assert sink.committed_batches() == {0}
    lineage = sink.read_lineage(spark)
    assert lineage.agg(F.sum("n_rows")).collect()[0][0] == 10


def test_checkpoint_resume_no_dupes_no_gaps(spark, stream_corpus, stream_batches, stream_dir, tmp_path):
    """Kill after a few batches, restart from checkpoint, assert the
    final committed set equals a single uninterrupted run."""
    src_cols = ["url", "warc_ts"]
    out1, ck = str(tmp_path / "out1"), str(tmp_path / "ck")

    def build():
        src = stream_pages_files(spark, stream_dir, 1)
        return src.withWatermark("warc_ts", "10 minutes").dropDuplicates(["url", "warc_ts"]).select(*src_cols)

    sink = ParquetLedgerSink(out1)
    # phase 1: process a few micro-batches then stop mid-stream
    q = (
        build()
        .writeStream.outputMode("append")
        .option("checkpointLocation", ck)
        .foreachBatch(sink.foreach_batch())
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    while len(sink.committed_batches()) < 3:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(60)
    n_before = len(sink.committed_batches())

    # phase 2: resume from checkpoint, drain the rest
    q2 = run_stream_to_sink(build(), sink, ck)
    q2.awaitTermination(300)
    got = {
        (r.url, pd.Timestamp(r.warc_ts)) for r in sink.read_committed(spark).collect()
    }
    want_df = simulate_dedup(stream_batches, DELAY)
    want = set(zip(want_df["url"], want_df["warc_ts"]))
    assert n_before >= 3
    assert got == want  # no dupes, no gaps


def test_streaming_asof_join(spark, stream_corpus, stream_batches, stream_dir, tmp_path):
    tmpl_dir = str(tmp_path / "tmpl")
    os.makedirs(tmpl_dir)
    tmpl_full = stream_corpus.domain_templates.copy()
    # sentinel template rows: the query watermark is the MIN across both
    # streams, so the template stream must also advance past the data
    sent = pd.DataFrame(
        {
            "domain": ["sentinel.example.com"] * 2,
            "valid_from": [SENTINEL_TS, SENTINEL_TS + pd.Timedelta(hours=1)],
            "template_kind": ["header"] * 2,
            "template_line": ["x"] * 2,
            "shingle_hashes": [[1], [1]],
        }
    )
    kw = {"index": False, "coerce_timestamps": "us", "allow_truncated_timestamps": True}
    tmpl_full.to_parquet(os.path.join(tmpl_dir, "t0.parquet"), **kw)
    sent.to_parquet(os.path.join(tmpl_dir, "t1.parquet"), **kw)

    from watermark_remove_spark.sources.pages import stream_templates_files

    pages = with_domain(stream_pages_files(spark, stream_dir, 3))
    templates = stream_templates_files(spark, tmpl_dir)
    joined = streaming_asof_template_join(pages, templates, watermark="10 minutes")
    sink = _run(joined, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (r.url, pd.Timestamp(r.warc_ts), pd.Timestamp(r.template_valid_from))
        for r in sink.read_committed(spark).collect()
    }
    assert len(got) > 0
    # every resolved version must equal the oracle as-of resolution
    from watermark_remove_spark.oracle import oracle_asof_template_version

    pages_all = pd.concat(stream_batches, ignore_index=True).drop_duplicates(
        subset=["url", "warc_ts"]
    )
    want_df = oracle_asof_template_version(pages_all, stream_corpus.domain_templates)
    # leftOuter semantics (matches the batch as-of form): pages with NO
    # version in range emit with NULL valid_from instead of vanishing
    want_map = {
        (r.url, r.warc_ts): (
            r.template_valid_from if pd.notna(r.template_valid_from) else None
        )
        for r in want_df.itertuples(index=False)
    }
    unresolved = 0
    for url, ts, vf in got:
        assert (url, ts) in want_map, (url, ts)
        vf_norm = vf if pd.notna(vf) else None
        assert want_map[(url, ts)] == vf_norm, (url, ts)
        unresolved += vf_norm is None
    assert unresolved > 0  # the no-template case is actually exercised


def _has_protobuf() -> bool:
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas state server needs protobuf "
    "(absent in this sandbox; see sessions_tws.py docstring)",
)
def test_tws_sessions_match_oracle(spark, stream_corpus, stream_batches, stream_dir, tmp_path):
    """O-19 on the new API: transformWithStateInPandas session windows
    must emit the SAME closed-session rows as the applyInPandasWithState
    engine and the pandas oracle on the same multi-batch input."""
    from watermark_remove_spark.streaming.sessions_tws import tws_domain_sessions

    src = stream_pages_files(spark, stream_dir, 1)
    pages = with_domain(src)
    sessions = tws_domain_sessions(pages, gap_seconds=300, watermark="10 minutes")
    sink = _run(sessions, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (r.domain, pd.Timestamp(r.session_start), pd.Timestamp(r.session_end), r.n_pages)
        for r in sink.read_committed(spark).collect()
    }
    batches = [b.assign(domain=b["url"].map(domain_of)) for b in stream_batches]
    want_df = simulate_sessions(batches, DELAY, pd.Timedelta(minutes=5))
    want = {
        (r.domain, r.session_start, r.session_end, r.n_pages)
        for r in want_df.itertuples(index=False)
    }
    assert got == want


def test_tws_processor_semantics(stream_batches):
    """SessionProcessor's merge/supersede/timer logic replayed against
    the pandas oracle with a fake state handle — covers every line of
    sessions_tws.py except the plan call (which needs protobuf; see
    module docstring)."""
    from watermark_remove_spark.oracle_stream import (
        watermark_timeline,
        with_flush_batches,
    )
    from watermark_remove_spark.streaming.sessions_tws import SessionProcessor

    class FakeValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = tuple(v)

        def clear(self):
            self.v = None

    class FakeHandle:
        def __init__(self):
            self.states = {}
            self.timers = set()

        def getValueState(self, name, schema, ttlDurationMs=None):
            return self.states.setdefault(name, FakeValueState())

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, t):
            self.timers.discard(t)

        def registerTimer(self, t):
            self.timers.add(t)

    class FakeExpiry:
        def __init__(self, ms):
            self.ms = ms

        def getExpiryTimeInMs(self):
            return self.ms

    class FakeTimerValues:
        def __init__(self, wm_ms):
            self.wm_ms = wm_ms

        def getCurrentWatermarkInMs(self):
            return self.wm_ms

        def getCurrentProcessingTimeInMs(self):
            return self.wm_ms

    gap = pd.Timedelta(minutes=5)
    batches = [
        b.assign(domain=b["url"].map(domain_of))[["warc_ts", "domain"]]
        for b in stream_batches
    ]
    flushed = with_flush_batches(batches, 3)
    wms = watermark_timeline(flushed, DELAY, "warc_ts")

    procs: dict[str, tuple[SessionProcessor, FakeHandle]] = {}

    def proc_for(domain):
        if domain not in procs:
            p = SessionProcessor(300)
            h = FakeHandle()
            p.init(h)
            procs[domain] = (p, h)
        return procs[domain]

    emitted = []
    for k, b in enumerate(flushed):
        wm = wms[k]
        live = b[b["warc_ts"] >= wm] if len(b) else b
        wm_ms = wm.value // 1_000_000
        tv = FakeTimerValues(wm_ms)
        for domain, grp in live.groupby("domain"):
            p, _ = proc_for(domain)
            emitted.extend(p.handleInputRows((domain,), iter([grp]), tv))
        for domain, (p, h) in procs.items():
            for t in sorted(h.listTimers()):
                if t <= wm_ms:
                    h.deleteTimer(t)
                    emitted.extend(
                        p.handleExpiredTimer((domain,), tv, FakeExpiry(t))
                    )

    got_df = pd.concat(emitted, ignore_index=True)
    got = {
        (r.domain, r.session_start, r.session_end, r.n_pages)
        for r in got_df.itertuples(index=False)
    }
    want_df = simulate_sessions(batches, DELAY, gap)
    want = {
        (r.domain, r.session_start, r.session_end, r.n_pages)
        for r in want_df.itertuples(index=False)
    }
    assert got == want


def test_stream_sliding_windows_match_oracle(spark, stream_corpus, stream_batches, stream_dir, tmp_path):
    """O-18 sliding variant in STREAMING mode (previously only the batch
    form q10 was checked): window 10 min, slide 5 min — every row feeds
    two overlapping windows; append emission at window_end <= wm."""
    masks = mine_masks(spark.createDataFrame(stream_corpus.pages))
    cleaned = build_clean_stream(spark, stream_dir, masks)
    win = build_window_stream(cleaned, "10 minutes", slide="5 minutes")
    sink = _run(win, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (pd.Timestamp(r.window_start), r.lang, r.n_pages, r.total_chars)
        for r in sink.read_committed(spark).collect()
    }

    from watermark_remove_spark.oracle import oracle_mine_masks

    omasks = oracle_mine_masks(stream_corpus.pages)
    deduped_batches = []
    survivors = simulate_dedup(stream_batches, DELAY)
    surv_keys = set(zip(survivors["url"], survivors["warc_ts"]))
    for b in stream_batches:
        bb = b[[((u, t) in surv_keys) for u, t in zip(b["url"], b["warc_ts"])]].copy()
        bb = bb.drop_duplicates(subset=["url", "warc_ts"])
        surv_keys -= set(zip(bb["url"], bb["warc_ts"]))
        bb["clean_text"] = [
            clean_text(t, omasks.get(domain_of(u), frozenset()))
            for u, t in zip(bb["url"], bb["text"])
        ]
        deduped_batches.append(bb)
    want_df = simulate_tumbling_agg(
        deduped_batches, DELAY, pd.Timedelta(minutes=10), slide=pd.Timedelta(minutes=5)
    )
    want = {
        (r.window_start, r.lang, r.n_pages, r.total_chars)
        for r in want_df.itertuples(index=False)
    }
    assert got == want


def test_sink_compaction_and_vacuum(spark, tmp_path):
    """Small-file maintenance: many batch dirs -> one generation, same
    exactly-once view; vacuum removes superseded dirs and orphans;
    replay of a compacted batch is still a no-op."""
    sink = ParquetLedgerSink(str(tmp_path / "out"))
    for b in range(6):
        sink.write_batch(
            spark.range(b * 10, b * 10 + 10).withColumnRenamed("id", "v"), b
        )
    before = {r.v for r in sink.read_committed(spark).collect()}
    assert len(before) == 60

    rec = sink.compact(spark)
    assert rec is not None and rec["batches"] == list(range(6)) and rec["n_rows"] == 60
    # the view is unchanged and now served from the generation
    assert {r.v for r in sink.read_committed(spark).collect()} == before
    gen_dir = os.path.join(sink.compacted_dir, f"gen={rec['compaction']}")
    n_parts = len([f for f in os.listdir(gen_dir) if f.startswith("part-")])
    assert n_parts == 1  # tiny data -> one consolidated file

    # nothing left to compact
    assert sink.compact(spark) is None

    # new batches append after compaction; a second generation covers them
    sink.write_batch(spark.range(60, 70).withColumnRenamed("id", "v"), 6)
    assert sink.read_committed(spark).count() == 70
    rec2 = sink.compact(spark)
    assert rec2["batches"] == [6]
    assert sink.read_committed(spark).count() == 70

    # replay of a compacted batch: still a ledger no-op
    sink.write_batch(spark.range(0, 10).withColumnRenamed("id", "v"), 3)
    assert sink.read_committed(spark).count() == 70

    # orphan gen (crash before ledger commit) + superseded batch dirs
    os.makedirs(os.path.join(sink.compacted_dir, "gen=deadbeef"))
    removed = sink.vacuum(tmp_min_age_sec=0)  # test: no live writers
    assert not any(
        d.startswith("batch_id=") for d in os.listdir(sink.data_dir)
    )
    assert not os.path.exists(os.path.join(sink.compacted_dir, "gen=deadbeef"))
    assert sink.read_committed(spark).count() == 70
    assert len(removed) >= 7


def test_compaction_resume_generations(
    spark, stream_corpus, stream_batches, stream_dir, tmp_path
):
    """Production crash shape (round-4 verdict #6): a checkpointed
    stream is killed and resumed TWICE, with a compaction generation
    committed at each pause, a mid-compaction crash (gen dir renamed
    into place, ledger line never written) left between them, and
    explicit batch replays thrown at the sink after its dirs were
    compacted away and even vacuumed.  The final committed view must
    still equal the single-uninterrupted-run dedup oracle exactly."""
    import time
    import uuid as _uuid

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def build():
        src = stream_pages_files(spark, stream_dir, 1)
        return (
            src.withWatermark("warc_ts", "10 minutes")
            .dropDuplicates(["url", "warc_ts"])
            .select("url", "warc_ts")
        )

    sink = ParquetLedgerSink(out)

    def run_until(n_batches, timeout=120):
        q = (
            build()
            .writeStream.outputMode("append")
            .option("checkpointLocation", ck)
            .foreachBatch(sink.foreach_batch())
            .trigger(processingTime="0 seconds")
            .start()
        )
        deadline = time.time() + timeout
        while len(sink.committed_batches()) < n_batches and time.time() < deadline:
            time.sleep(0.3)
        q.stop()
        q.awaitTermination(60)

    # ---- phase 1: a few batches, then kill mid-stream (resume pt 1)
    run_until(2)
    phase1 = set(sink.committed_batches())
    assert len(phase1) >= 2

    # generation 1 covers exactly the batches committed so far
    rec1 = sink.compact(spark)
    assert sorted(rec1["batches"]) == sorted(phase1)
    n_after_gen1 = sink.read_committed(spark).count()

    # mid-compaction crash: a second compact() that died between the
    # gen-dir rename and the ledger append leaves an unledgered gen
    orphan = os.path.join(sink.compacted_dir, f"gen={_uuid.uuid4().hex}")
    shutil.copytree(
        os.path.join(sink.compacted_dir, f"gen={rec1['compaction']}"), orphan
    )
    # a concurrent vacuum while a writer may be live must NOT reap the
    # fresh unledgered gen (it could be mid-commit, not an orphan)
    sink.vacuum(tmp_min_age_sec=3600)
    assert os.path.exists(orphan)

    # replay of a compacted batch: ledger no-op, view unchanged
    b0 = min(phase1)
    sink.write_batch(spark.createDataFrame([("replay", SENTINEL_TS.to_pydatetime())], "url string, warc_ts timestamp"), b0)
    assert sink.read_committed(spark).count() == n_after_gen1

    # ---- phase 2: resume from checkpoint, kill again (resume pt 2)
    run_until(len(phase1) + 2)
    phase2 = set(sink.committed_batches())
    assert len(phase2) > len(phase1)

    # generation 2 covers exactly the new batches
    rec2 = sink.compact(spark)
    assert sorted(rec2["batches"]) == sorted(phase2 - phase1)

    # ---- phase 3: resume once more and drain to completion
    q = run_stream_to_sink(build(), sink, ck)
    q.awaitTermination(300)

    # third generation for the tail (>= 2 generations exercised)
    rec3 = sink.compact(spark)
    gens = {r["compaction"] for r in sink.compactions()}
    assert rec1["compaction"] in gens and rec2["compaction"] in gens
    assert len(gens) >= 2 + (rec3 is not None)

    # vacuum with no live writers: superseded batch dirs + the
    # mid-compaction orphan go away; ledgered generations stay
    sink.vacuum(tmp_min_age_sec=0)
    assert not os.path.exists(orphan)
    for g in gens:
        assert os.path.exists(os.path.join(sink.compacted_dir, f"gen={g}"))

    # replay against a fully-compacted+vacuumed sink: still a no-op
    sink.write_batch(spark.createDataFrame([("replay", SENTINEL_TS.to_pydatetime())], "url string, warc_ts timestamp"), b0)

    # ---- oracle equality: exactly the uninterrupted-run dedup set
    got = {
        (r.url, pd.Timestamp(r.warc_ts))
        for r in sink.read_committed(spark).collect()
    }
    want_df = simulate_dedup(stream_batches, DELAY)
    want = set(zip(want_df["url"], want_df["warc_ts"]))
    assert got == want
    assert sink.committed_rows() == len(want)


def test_stateful_sessions_equal_batch_session_window(
    spark, stream_corpus, stream_batches, stream_dir, tmp_path
):
    """The stateful session engine must produce EXACTLY the rows of the
    built-in batch F.session_window over the rows the stream admitted
    (ts >= watermark at arrival) — the principled cross-engine parity
    the round-2 review demanded (out-of-order admissible events must
    extend sessions backward / bridge, not be absorbed forward)."""
    from watermark_remove_spark.oracle_stream import (
        watermark_timeline,
        with_flush_batches,
    )

    src = stream_pages_files(spark, stream_dir, 1)
    pages = with_domain(src)
    sessions = stateful_domain_sessions(pages, gap_seconds=300, watermark="10 minutes")
    sink = _run(sessions, str(tmp_path / "out"), str(tmp_path / "ck"))
    got = {
        (r.domain, pd.Timestamp(r.session_start), pd.Timestamp(r.session_end), r.n_pages)
        for r in sink.read_committed(spark).collect()
    }

    # the admission model: a row survives iff ts >= in-force watermark
    batches = [b.assign(domain=b["url"].map(domain_of)) for b in stream_batches]
    flushed = with_flush_batches(batches, 3)
    wms = watermark_timeline(flushed, DELAY, "warc_ts")
    admitted = pd.concat(
        [b[b["warc_ts"] >= wms[k]] for k, b in enumerate(flushed) if len(b)],
        ignore_index=True,
    )[["domain", "warc_ts"]]

    batch_out = (
        spark.createDataFrame(admitted)
        .groupBy(F.session_window("warc_ts", "5 minutes").alias("sw"), "domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select("domain", "sw.start", "sw.end", "n_pages")
    )
    # sessions the watermark never passed (the final sentinel's own
    # session) legitimately stay open in the stream — batch sees them
    # closed; compare only watermark-finalized sessions
    final_wm = wms[-1]
    want = {
        (r.domain, pd.Timestamp(r.start), pd.Timestamp(r.end), r.n_pages)
        for r in batch_out.collect()
        if pd.Timestamp(r.end) <= final_wm
    }
    assert {g for g in got if g[2] <= final_wm} == want
    assert got - want == set()  # stream emitted nothing extra
