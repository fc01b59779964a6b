"""O-19 on the NEW stateful API: session windows per domain via
``transformWithStateInPandas`` (Spark 4.x ``StatefulProcessor``).

Same semantics as ``sessions.stateful_domain_sessions`` (the
``applyInPandasWithState`` form) and the pandas oracle
``simulate_sessions``: events of a domain whose gaps are <= gap merge
into one session; session_end = last event + gap; a session is emitted
when superseded in-batch or when the event-time timer at
``last + gap`` fires (watermark passed, no extension possible).

Why both engines exist: ``applyInPandasWithState`` is the mandated
form (north_star), but ``transformWithStateInPandas`` is the
forward-looking API — typed per-key state handles (value/list/map),
first-class timers, TTL, and the same RocksDB state-store backend.
State per domain stays O(1): one (start_us, last_us, count) tuple, so
mega-domain skew costs one tuple, not one row per event.

Sandbox constraint (same class as the Iceberg jar, SURVEY §7 step 5):
the TWS state-server protocol requires the ``protobuf`` package
(``pyspark/sql/streaming/stateful_processor_api_client.py`` imports
``StateMessage_pb2``), which is absent here and not installable —
verified empirically: the driver worker exits with ``ImportError:
cannot import name 'descriptor' from 'google.protobuf'``.  So:

- the end-to-end parity test
  (``tests/test_streaming.py::test_tws_sessions_match_oracle``) runs
  iff ``google.protobuf`` imports, and
- the processor's session-merge/timer semantics are unit-tested
  row-exactly against the AIPWS engine with a fake state handle
  (``tests/test_streaming.py::test_tws_processor_semantics``), which
  exercises every line of this file except the final
  ``transformWithStateInPandas`` plan call.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .sessions import SESSION_OUT_SCHEMA, SESSION_STATE_SCHEMA


def _emit(domain: str, closed: list[tuple[int, int, int]]) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "domain": [domain] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
            "n_pages": [c for _, _, c in closed],
        }
    )


class SessionProcessor(StatefulProcessor):
    """Per-domain open-session state with an event-time close timer."""

    def __init__(self, gap_seconds: int):
        self.gap_us = gap_seconds * 1_000_000
        self.gap_ms = gap_seconds * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.open = handle.getValueState("open_session", SESSION_STATE_SCHEMA)

    def _retime(self, last_us: int) -> None:
        # one live timer per key: drop stale ones, arm at last + gap
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(last_us // 1000 + self.gap_ms)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        domain = key[0]
        ts_list: list[int] = []
        for pdf in rows:
            ts_list.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["warc_ts"])
            )
        ts_list.sort()

        s = l = c = None
        if self.open.exists():
            s, l, c = self.open.get()
        closed: list[tuple[int, int, int]] = []
        for t in ts_list:
            if s is None:
                s, l, c = t, t, 1
            elif t - l <= self.gap_us:
                l = max(l, t)
                c += 1
            else:
                closed.append((s, l + self.gap_us, c))
                s, l, c = t, t, 1
        if s is not None:
            self.open.update((s, l, c))
            self._retime(l)
        if closed:
            yield _emit(domain, closed)

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # watermark passed last + gap: the open session can no longer
        # be extended (late rows would be dropped) -> close it
        if self.open.exists():
            s, l, c = self.open.get()
            if l // 1000 + self.gap_ms <= expiredTimerInfo.getExpiryTimeInMs():
                self.open.clear()
                yield _emit(key[0], [(s, l + self.gap_us, c)])

    def close(self) -> None:
        pass


def tws_domain_sessions(
    pages: DataFrame, gap_seconds: int = 300, watermark: str = "10 minutes"
) -> DataFrame:
    """pages stream (url, warc_ts, domain, ...) -> closed sessions,
    computed by the ``transformWithStateInPandas`` engine."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy("domain")
        .transformWithStateInPandas(
            SessionProcessor(gap_seconds),
            outputStructType=SESSION_OUT_SCHEMA,
            outputMode="append",
            timeMode="eventTime",
        )
    )
