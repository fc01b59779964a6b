"""O-19 on the NEW stateful API: session windows per domain via
``transformWithStateInPandas`` (Spark 4.x ``StatefulProcessor``).

Same semantics as ``sessions.stateful_domain_sessions`` (the
``applyInPandasWithState`` form) and the pandas oracle — all three
share the ONE canonical merge in ``sessions.merge_sessions``:
multiple open sessions per key, out-of-order admissible events extend
a session backward or bridge two open sessions, and a session is
emitted only when the watermark passes ``last + gap``.

Why both engines exist: ``applyInPandasWithState`` is the mandated
form (north_star), but ``transformWithStateInPandas`` is the
forward-looking API — typed per-key state handles (value/list/map),
first-class timers, TTL, and the same RocksDB state-store backend.
State per domain stays bounded by the watermark horizon / gap.

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
  row-exactly against the pandas oracle with a fake state handle
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

from .sessions import (
    SESSION_OUT_SCHEMA,
    SESSION_STATE_SCHEMA,
    merge_sessions,
    split_closed,
)


def _emit(domain: str, closed: list[tuple[int, int, int]], gap_us: int) -> pd.DataFrame:
    return pd.DataFrame(
        {
            "domain": [domain] * len(closed),
            "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
            "session_end": [pd.Timestamp(l + gap_us, unit="us") for _, l, _ in closed],
            "n_pages": [c for _, _, c in closed],
        }
    )


class SessionProcessor(StatefulProcessor):
    """Per-domain open-session list with an event-time close timer."""

    def __init__(self, gap_seconds: int):
        self.gap_us = gap_seconds * 1_000_000
        self.gap_ms = gap_seconds * 1_000

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.handle = handle
        self.open = handle.getValueState("open_sessions", SESSION_STATE_SCHEMA)

    def _load(self) -> list[tuple[int, int, int]]:
        if not self.open.exists():
            return []
        starts, lasts, counts = self.open.get()
        return list(zip(starts, lasts, counts))

    def _store(self, still, wm_ms: int) -> None:
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        if still:
            self.open.update(
                (
                    [s for s, _, _ in still],
                    [l for _, l, _ in still],
                    [c for _, _, c in still],
                )
            )
            earliest_ms = min(l for _, l, _ in still) // 1000 + self.gap_ms
            self.handle.registerTimer(max(earliest_ms, wm_ms + 1))
        elif self.open.exists():
            self.open.clear()

    def _close(self, domain: str, sessions, wm_ms: int) -> Iterator[pd.DataFrame]:
        closed, still = split_closed(sessions, self.gap_us, wm_ms * 1000)
        self._store(still, wm_ms)
        if closed:
            yield _emit(domain, closed, self.gap_us)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        ts_list: list[int] = []
        for pdf in rows:
            ts_list.extend(
                int(t.value // 1000) for t in pd.to_datetime(pdf["warc_ts"])
            )
        sessions = merge_sessions(self._load(), ts_list, self.gap_us)
        yield from self._close(key[0], sessions, timerValues.getCurrentWatermarkInMs())

    def handleExpiredTimer(
        self, key, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        # watermark passed some session's last + gap: close everything
        # no longer extensible, keep the rest, re-arm
        yield from self._close(
            key[0], self._load(), timerValues.getCurrentWatermarkInMs()
        )

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
