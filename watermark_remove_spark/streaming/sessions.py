"""O-19 (mandated form): session windows per domain via
``applyInPandasWithState`` with event-time timeout.

Semantics (identical to F.session_window + the pandas oracle):
events of a domain whose gaps are <= gap merge into one session;
session_end = last event + gap.  A session is EMITTED when it closes:
either superseded within a batch (a later event opens a new session)
or timed out by the watermark (no event within gap before the
watermark passed session_end).

State per domain: the single open session (start, last, count) — O(1)
state per key, bounded memory on mega-domains (SURVEY §7 known-hard).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
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

# open-session state: (start_epoch_us, last_epoch_us, count)
SESSION_STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("count", LongType()),
    ]
)


def make_session_fn(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        domain = key[0]
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            if state.exists:
                s, l, c = state.get
                closed.append((s, l, c))
                state.remove()
        else:
            ts_list: list[int] = []
            for pdf in pdfs:
                # timestamps arrive tz-naive in UTC (session tz pinned)
                ts_list.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf["warc_ts"])
                )
            ts_list.sort()
            if state.exists:
                s, l, c = state.get
            else:
                s = l = c = None
            for t in ts_list:
                if s is None:
                    s, l, c = t, t, 1
                elif t - l <= gap_us:
                    l = max(l, t)
                    c += 1
                else:
                    closed.append((s, l, c))
                    s, l, c = t, t, 1
            if s is not None:
                state.update((s, l, c))
                # close when watermark passes last + gap
                state.setTimeoutTimestamp(l // 1000 + gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                {
                    "domain": [domain] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [
                        pd.Timestamp(l + gap_us, unit="us") for _, l, _ in closed
                    ],
                    "n_pages": [c for _, _, c in closed],
                }
            )

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
