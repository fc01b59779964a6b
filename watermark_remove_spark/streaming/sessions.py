"""O-19 (mandated form): session windows per domain via
``applyInPandasWithState`` with event-time timeout.

Semantics — verified identical to ``F.session_window`` (which merges
at gap-distance EQUAL to the gap, tested empirically) and to the
pandas oracle: events of a domain whose gap-distance is <= gap merge
into one session; session_end = last event + gap; a session is
emitted only once the watermark passes its end (it can no longer be
extended by any admissible event).

State per domain: the LIST of open sessions (parallel start/last/count
arrays).  A single open session is NOT sufficient: an admissible
out-of-order event (above the watermark but before the newest event)
must extend a session backward or bridge two open sessions — the
round-2 review caught the earlier single-session form silently
absorbing such events without moving session_start.  The list is
bounded by the watermark horizon / gap, so state stays small on
mega-domains (SURVEY §7 known-hard).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_OUT_SCHEMA = StructType(
    [
        StructField("domain", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_pages", LongType()),
    ]
)

# open sessions: parallel arrays (start_us, last_us, count), sorted by start
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("starts_us", ArrayType(LongType())),
        StructField("lasts_us", ArrayType(LongType())),
        StructField("counts", ArrayType(LongType())),
    ]
)


def merge_sessions(sessions, events, gap):
    """Canonical gap-session merge — the ONE definition all engines
    and the oracle share.

    ``sessions``: [(start, last, count)] in any order; ``events``: list
    of timestamps; ``gap``: same additive/comparable type as the
    timestamps (int µs, or pd.Timedelta with pd.Timestamp).  Returns
    the merged open-session list sorted by start.  Handles
    out-of-order events: backward extension and bridging two sessions.
    """
    items = list(sessions) + [(t, t, 1) for t in events]
    items.sort(key=lambda x: (x[0], x[1]))
    out: list[tuple] = []
    for s, l, c in items:
        if out and s <= out[-1][1] + gap:
            ps, pl, pc = out[-1]
            out[-1] = (ps, max(pl, l), pc + c)
        else:
            out.append((s, l, c))
    return out


def split_closed(sessions, gap, wm):
    """Partition open sessions into (closed, still_open) under
    watermark ``wm``: a session is final once ``last + gap <= wm``.

    This <=-close is exact, not just same-batch-safe: Spark's
    applyInPandasWithState late-filter only delivers rows with
    ``t > wm`` (strict — a row at exactly t == wm is dropped before
    the function runs; verified empirically, pinned by
    tests/test_session_boundary.py), so any event that could still
    reach a session with ``last + gap <= wm`` would need
    ``t <= last + gap <= wm`` — and is therefore never delivered.
    The builtin ``F.session_window`` agg evicts on the same
    ``end <= wm`` timeline but ADMITS an event at t == wm (its window
    end is > wm), the one documented boundary divergence between the
    two engines."""
    closed = [x for x in sessions if x[1] + gap <= wm]
    still = [x for x in sessions if x[1] + gap > wm]
    return closed, still


def make_session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def _load(state: GroupState):
        if not state.exists:
            return []
        starts, lasts, counts = state.get
        return list(zip(starts, lasts, counts))

    def _emit(domain, closed):
        return pd.DataFrame(
            {
                "domain": [domain] * len(closed),
                "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                "session_end": [
                    pd.Timestamp(l + gap_us, unit="us") for _, l, _ in closed
                ],
                "n_pages": [c for _, _, c in closed],
            }
        )

    def _store(state: GroupState, still, wm_ms: int) -> None:
        if still:
            state.update(
                (
                    [s for s, _, _ in still],
                    [l for _, l, _ in still],
                    [c for _, _, c in still],
                )
            )
            earliest_ms = min(l for _, l, _ in still) // 1000 + gap_seconds * 1000
            state.setTimeoutTimestamp(max(earliest_ms, wm_ms + 1))
        elif state.exists:
            state.remove()

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        domain = key[0]
        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000

        sessions = _load(state)
        if not state.hasTimedOut:
            ts_list: list[int] = []
            for pdf in pdfs:
                # timestamps arrive tz-naive in UTC (session tz pinned)
                ts_list.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf["warc_ts"])
                )
            sessions = merge_sessions(sessions, ts_list, gap_us)

        closed, still = split_closed(sessions, gap_us, wm_us)
        _store(state, still, wm_ms)
        if closed:
            yield _emit(domain, closed)

    return fn


def stateful_domain_sessions(
    pages: DataFrame, gap_seconds: int = 300, watermark: str = "10 minutes"
) -> DataFrame:
    """pages stream (url, warc_ts, domain, ...) -> closed sessions."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy("domain")
        .applyInPandasWithState(
            make_session_fn(gap_seconds),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
