"""Streaming CEP strict-sequence matcher: out-of-order delivery,
watermark-boundary finality and exactly-once emission vs the batch
ground truth (the driver's q66 fixture is time-ordered; these tests
cover the arrival orders it can't)."""

from __future__ import annotations

import pandas as pd
import pytest

from watermark_remove_spark.sources.pages import stream_events_files, write_batch_files
from watermark_remove_spark.streaming.cep import find_matches, stateful_sequence_match
from watermark_remove_spark.streaming.pipeline import run_stream_to_sink
from watermark_remove_spark.streaming.sink import ParquetLedgerSink

PATTERN = ("view", "click", "purchase")
BASE = pd.Timestamp("2026-01-01")


def _ev(eid, minute, user, etype):
    return {
        "event_id": eid,
        "ts": BASE + pd.Timedelta(minutes=minute),
        "user_id": user,
        "event_type": etype,
        "value": 0.0,
        "props": "{}",
    }


def _sentinels(start_eid=10**9):
    return [
        _ev(start_eid, 24 * 60 * 400, -1, "sentinel"),
        _ev(start_eid + 1, 24 * 60 * 400 + 60, -1, "sentinel"),
    ]


def _run(spark, tmp_path, batches, within_seconds=86400, watermark="10 minutes"):
    frames = [pd.DataFrame(b) for b in batches]
    src = str(tmp_path / "src")
    write_batch_files(frames, src)
    stream = stream_events_files(spark, src, 1)
    matches = stateful_sequence_match(
        stream, pattern=PATTERN, within_seconds=within_seconds, watermark=watermark
    )
    sink = ParquetLedgerSink(str(tmp_path / "out"))
    q = run_stream_to_sink(matches, sink, str(tmp_path / "ck"))
    q.awaitTermination(300)
    return sorted(
        (r.user_id, r.start_epoch, r.end_epoch)
        for r in sink.read_committed(spark).collect()
        if r.user_id != -1
    )


def _batch_truth(batches, within_seconds=86400):
    rows = [e for b in batches for e in b if e["user_id"] != -1]
    out = []
    by_user: dict[int, list] = {}
    for e in rows:
        by_user.setdefault(e["user_id"], []).append(
            (int(e["ts"].value // 1000), e["event_id"], e["event_type"])
        )
    for u, evs in by_user.items():
        evs.sort()
        for s, e in find_matches(evs, PATTERN, within_seconds):
            out.append((u, s // 1_000_000, e // 1_000_000))
    return sorted(out)


def test_cep_in_order_basic(spark, tmp_path):
    b1 = [_ev(1, 0, 7, "view"), _ev(2, 1, 7, "click")]
    b2 = [_ev(3, 2, 7, "purchase"), _ev(4, 3, 8, "view")]
    batches = [b1, b2] + [[s] for s in _sentinels()]
    assert _run(spark, tmp_path, batches) == _batch_truth(batches)
    assert len(_batch_truth(batches)) == 1


def test_cep_out_of_order_interloper_breaks_contiguity(spark, tmp_path):
    # view,click,purchase arrive in batch 1; an ERROR event with a ts
    # BETWEEN click and purchase arrives in batch 2 (above watermark —
    # admissible).  A naive matcher emits the funnel on batch 1; the
    # final stream order is view,click,error,purchase -> NO match.
    b1 = [_ev(1, 0, 7, "view"), _ev(2, 1, 7, "click"), _ev(3, 5, 7, "purchase")]
    b2 = [_ev(4, 3, 7, "error")]
    batches = [b1, b2] + [[s] for s in _sentinels()]
    got = _run(spark, tmp_path, batches)
    assert got == _batch_truth(batches) == []


def test_cep_out_of_order_completes_match_late(spark, tmp_path):
    # the MIDDLE event arrives a batch after its neighbors
    b1 = [_ev(1, 0, 7, "view"), _ev(3, 9, 7, "purchase")]
    b2 = [_ev(2, 4, 7, "click")]
    batches = [b1, b2] + [[s] for s in _sentinels()]
    got = _run(spark, tmp_path, batches)
    assert got == _batch_truth(batches)
    assert len(got) == 1


def test_cep_exactly_once_across_watermark_advances(spark, tmp_path):
    # matches completed early must not re-emit as later batches move
    # the watermark past their kept-prefix events; interleave several
    # users and multiple matches per user
    # 1-minute watermark + wide gaps: u7's first match finalizes via
    # the event-time TIMEOUT in batch 2 (no u7 data that batch), u8's
    # in batch 4, u7's second only under the sentinels — three
    # separate finalization paths, each exactly once
    batches = [
        [_ev(1, 0, 7, "view"), _ev(2, 1, 7, "click"), _ev(3, 2, 7, "purchase")],
        [_ev(4, 30, 8, "view"), _ev(5, 31, 8, "click")],
        [_ev(6, 32, 8, "purchase"), _ev(7, 60, 7, "view")],
        [_ev(8, 61, 7, "click"), _ev(9, 62, 7, "purchase")],
    ] + [[s] for s in _sentinels()]
    got = _run(spark, tmp_path, batches, watermark="1 minute")
    assert got == _batch_truth(batches)
    assert len(got) == 3
    assert len(set(got)) == len(got)  # no duplicate emissions


def test_cep_within_bound_excludes_slow_funnel(spark, tmp_path):
    # consecutive and correctly typed, but spanning > within
    b1 = [_ev(1, 0, 7, "view"), _ev(2, 1, 7, "click")]
    b2 = [_ev(3, 60 * 25, 7, "purchase")]  # 25h later
    batches = [b1, b2] + [[s] for s in _sentinels()]
    assert _run(spark, tmp_path, batches) == _batch_truth(batches) == []


def test_find_matches_overlapping_runs():
    # view,click,purchase,click,purchase: only one strict run (the
    # second click is preceded by purchase, not view)
    us = 60 * 1_000_000
    evs = [
        (0 * us, 1, "view"),
        (1 * us, 2, "click"),
        (2 * us, 3, "purchase"),
        (3 * us, 4, "click"),
        (4 * us, 5, "purchase"),
    ]
    assert find_matches(evs, PATTERN, 86400) == [(0, 2 * us)]


@pytest.mark.parametrize("span_s,expect", [(86400, 1), (86401, 0)])
def test_find_matches_floored_second_boundary(span_s, expect):
    evs = [
        (0, 1, "view"),
        (1_000_000, 2, "click"),
        (span_s * 1_000_000 + 500_000, 3, "purchase"),
    ]
    # floored-seconds span == span_s (the .5s truncates), matching the
    # batch oracle's unix_timestamp arithmetic
    assert len(find_matches(evs, PATTERN, 86400)) == expect
