"""Streaming CEP: strict-sequence pattern detection per key via
``applyInPandasWithState`` — the stateful form of q65's batch
MATCH_RECOGNIZE semantics (Flink CEP's ``next()`` contiguity).

A match is a run of events that are STRICTLY CONSECUTIVE in the key's
(ts, tiebreak) order whose types equal the pattern and whose
end-to-start span is <= ``within``.  Out-of-order arrival is the whole
problem: an event arriving later can interleave into the middle of a
previously-seen run and break its contiguity, so nothing may be
emitted until the watermark proves the neighborhood is final.

Finality argument (the invariant the state machinery enforces):
Spark's stateful late-filter delivers only rows with ``ts > wm``
(strict; pinned empirically by tests/test_session_boundary.py for the
same mechanism).  Therefore once the batch's watermark is ``wm``, no
future event can sort at-or-before ANY buffered event with
``ts <= wm`` — a candidate run whose LAST event has ``ts <= wm`` can
never gain an interloper and its contiguity is final.  Runs ending
above the watermark stay buffered.

State per key is bounded by the watermark horizon: events with
``ts <= wm`` can never be the END of a new match (they'd have been
final this batch), but the last ``len(pattern) - 1`` of them can still
be the PREFIX of a match ending at a future event — keep exactly
those, evict the rest.  ``emitted_hwm_us`` (the previous batch's
watermark) guards against re-emitting a match whose end falls in the
kept prefix.

Reference scaffold has no streaming/CEP surface (282-LoC PIL/FastAPI
app, SURVEY.md §1); engine-native depth per the graft mandate.
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
)

MATCH_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("start_epoch", LongType()),
        StructField("end_epoch", LongType()),
    ]
)

# buffered events as parallel arrays (ts_us, tiebreak id, type), plus
# the emitted high-water mark (previous watermark, µs)
CEP_STATE_SCHEMA = StructType(
    [
        StructField("ts_us", ArrayType(LongType())),
        StructField("ids", ArrayType(LongType())),
        StructField("types", ArrayType(StringType())),
        StructField("emitted_hwm_us", LongType()),
    ]
)


def find_matches(events, pattern, within_seconds):
    """Strictly-consecutive pattern runs over an ORDERED event list
    [(ts_us, id, type)] — the ONE matcher the streaming operator, the
    tests and the oracle semantics share.  Returns [(start_us, end_us)]
    keyed by the run's first/last event times.  The span bound compares
    FLOORED epoch seconds — the exact arithmetic of the batch oracle
    (q65: unix_timestamp diffs), so stream and batch agree at the
    boundary even for sub-second timestamps."""
    k = len(pattern)
    out = []
    for i in range(k - 1, len(events)):
        run = events[i - k + 1 : i + 1]
        if all(e[2] == p for e, p in zip(run, pattern)) and (
            run[-1][0] // 1_000_000 - run[0][0] // 1_000_000 <= within_seconds
        ):
            out.append((run[0][0], run[-1][0]))
    return out


def make_cep_fn(pattern: tuple[str, ...], within_seconds: int):
    k = len(pattern)

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        user_id = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            ts_us, ids, types, hwm = state.get
            buf = list(zip(ts_us, ids, types))
        else:
            buf, hwm = [], -1

        if not state.hasTimedOut:
            for pdf in pdfs:
                ts = pd.to_datetime(pdf["ts"])
                for t, i, ty in zip(ts, pdf["event_id"], pdf["event_type"]):
                    buf.append((int(t.value // 1000), int(i), str(ty)))
        buf.sort()

        # final = runs ending at ts <= wm, minus anything at or below
        # the already-emitted boundary (ends in the kept prefix)
        matches = [
            (s, e)
            for s, e in find_matches(buf, pattern, within_seconds)
            if hwm < e <= wm_us
        ]

        # evict: drop events with ts <= wm except the last k-1 (the
        # only ones a future (> wm) event can extend into a match)
        below = [e for e in buf if e[0] <= wm_us]
        above = [e for e in buf if e[0] > wm_us]
        still = below[len(below) - (k - 1) :] + above if k > 1 else above

        if still:
            state.update(
                (
                    [t for t, _, _ in still],
                    [i for _, i, _ in still],
                    [ty for _, _, ty in still],
                    max(hwm, wm_us),
                )
            )
            # wake when the watermark moves, so buffered runs finalize
            # even if the key never receives another event
            state.setTimeoutTimestamp(wm_us // 1000 + 1)
        elif state.exists:
            state.remove()

        if matches:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(matches),
                    "start_epoch": [s // 1_000_000 for s, _ in matches],
                    "end_epoch": [e // 1_000_000 for _, e in matches],
                }
            )

    return fn


def stateful_sequence_match(
    events: DataFrame,
    pattern: tuple[str, ...] = ("view", "click", "purchase"),
    within_seconds: int = 86400,
    watermark: str = "10 minutes",
) -> DataFrame:
    """events stream (ts, user_id, event_type, event_id) -> one row per
    completed strictly-consecutive pattern match, emitted exactly once
    when the watermark finalizes the run's neighborhood."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_cep_fn(pattern, within_seconds),
            outputStructType=MATCH_OUT_SCHEMA,
            stateStructType=CEP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
