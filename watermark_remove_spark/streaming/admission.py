"""Streaming per-key admission quota — stateful rate limiting.

Admit at most ``quota`` events per (event_type, hour-window) key on an
unbounded stream; every event past the budget is dropped.  This is the
streaming form of the batch per-source cap (q81): ingest budgeting,
per-tenant rate limiting, and bounded-sample collection all reduce to
it.  The batch form needs the whole window's rows to rank; the
streaming form must decide per arrival — which is exactly what a
count-in-state operator does.

Determinism contract (what makes the oracle exact): admission is
first-come within (batch order, then (ts, event_id) within the batch).
When the stream delivers events time-ordered across micro-batches —
true of any log-structured ingest, and of the catalog's stream
fixtures (sorted by (ts, event_id), split sequentially) — the admitted
set is exactly the ``quota`` smallest (ts, event_id) rows per key,
i.e. the batch SQL ``row_number() OVER (PARTITION BY key ORDER BY ts,
event_id) <= quota``.

Scale shape: state per open key is ONE int64 (admitted count) — O(1)
bytes, vs buffering rows to rank.  Keys are evicted by event-time
timeout at their window end: once the watermark passes ``window_end``
no row of that window can still be delivered (the state-store
late-filter only admits rows with ``ts > watermark``, and every row of
the window has ``ts < window_end <= watermark``), so eviction can
never reopen a quota.  Live state is therefore bounded by (keys per
watermark horizon), not by stream length.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

ADMIT_OUT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("window_epoch", LongType()),
        StructField("ts_epoch", LongType()),
    ]
)

ADMIT_STATE_SCHEMA = StructType([StructField("taken", LongType())])


def make_admission_fn(quota: int, window_seconds: int):
    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        event_type, window_start = key
        start = pd.Timestamp(window_start)
        taken = state.get[0] if state.exists else 0

        parts = [p for p in pdfs if len(p)]
        if parts:
            batch = pd.concat(parts, ignore_index=True)
            # deterministic within-batch order: (ts, event_id)
            batch = (
                batch.assign(_ts=pd.to_datetime(batch["ts"]))
                .sort_values(["_ts", "event_id"], kind="stable")
                .reset_index(drop=True)
            )
            room = max(0, quota - taken)
            admit = batch.iloc[:room]
            taken += len(admit)
            if len(admit):
                yield pd.DataFrame(
                    {
                        "event_id": admit["event_id"].astype("int64"),
                        "event_type": [event_type] * len(admit),
                        "window_epoch": [int(start.value // 1_000_000_000)]
                        * len(admit),
                        "ts_epoch": (
                            pd.to_datetime(admit["ts"]).astype("int64")
                            // 1_000_000_000
                        ),
                    }
                )

        state.update((int(taken),))
        end_ms = start.value // 1_000_000 + window_seconds * 1000
        state.setTimeoutTimestamp(max(end_ms, state.getCurrentWatermarkMs() + 1))

    return fn


def admission_quota_stream(
    events: DataFrame,
    quota: int,
    window_seconds: int = 3600,
    watermark: str = "10 minutes",
) -> DataFrame:
    """events stream (event_id, ts, event_type, ...) -> admitted rows
    (event_id, event_type, window_epoch, ts_epoch), at most ``quota``
    per (event_type, hour window)."""
    keyed = events.withWatermark("ts", watermark).withColumn(
        "window_start", F.date_trunc("hour", F.col("ts"))
    )
    return keyed.groupBy("event_type", "window_start").applyInPandasWithState(
        make_admission_fn(quota, window_seconds),
        outputStructType=ADMIT_OUT_SCHEMA,
        stateStructType=ADMIT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
