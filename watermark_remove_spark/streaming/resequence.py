"""Streaming event-time re-sequencer — the out-of-order-to-ordered
repair operator.

Downstream consumers of an event stream often need PER-KEY IN-ORDER
delivery (CDC appliers, per-user timelines, change feeds), but
micro-batches hand them arrival order.  This operator buffers each
key's events in state and releases them in (ts, event_id) order as
soon as the watermark PROVES no earlier event can still arrive,
stamping each released row with its per-key emission sequence number.

Correctness argument (what makes the batch oracle exact):

- a buffered row with ``ts <= watermark`` is safe to emit: the
  state-store late filter only delivers rows with ``ts > watermark``
  (pinned empirically in tests/test_session_boundary.py), so no
  not-yet-seen row can sort before it;
- flushes are monotone: everything flushed at watermark w1 has
  ts <= w1 < ts of anything flushed at a later w2, so concatenating
  flushes yields the key's full (ts, event_id) order and the running
  ``emitted`` counter equals the batch ``row_number()`` rank.

Scale shape: buffered state per key is bounded by the watermark
horizon (rows older than the watermark leave state at the next
invocation); the sequence counter is one int64 per key that has ever
appeared — the same user-universe state bound as the streaming
leaderboard (q108).  Keys are re-armed with an event-time timeout at
``watermark + 1ms`` so buffers drain even when a key receives no new
rows.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

RESEQ_OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("seq", LongType()),
        StructField("ts_epoch", LongType()),
    ]
)

# buffered (event_id, ts-micros) arrays + the per-key emission counter
RESEQ_STATE_SCHEMA = StructType(
    [
        StructField("ids", ArrayType(LongType())),
        StructField("tss", ArrayType(LongType())),
        StructField("emitted", LongType()),
    ]
)


def _reseq_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        ids, tss, emitted = state.get
        buf = list(zip(tss, ids))
    else:
        buf, emitted = [], 0

    for p in pdfs:
        if len(p):
            ts_us = pd.to_datetime(p["ts"]).astype("int64") // 1000
            buf.extend(zip(ts_us.tolist(), p["event_id"].astype("int64").tolist()))

    wm_us = state.getCurrentWatermarkMs() * 1000
    buf.sort()
    n_ready = 0
    while n_ready < len(buf) and buf[n_ready][0] <= wm_us:
        n_ready += 1
    ready, keep = buf[:n_ready], buf[n_ready:]

    if ready:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(ready),
                "event_id": [eid for _, eid in ready],
                "seq": list(range(emitted + 1, emitted + 1 + len(ready))),
                "ts_epoch": [ts // 1_000_000 for ts, _ in ready],
            }
        )
        emitted += len(ready)

    state.update(
        ([eid for _, eid in keep], [ts for ts, _ in keep], int(emitted))
    )
    # re-arm: fire as soon as the watermark moves, so buffers drain
    # even for keys that receive no further rows
    state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)


def resequence_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """events stream (event_id, ts, user_id, ...) -> per-user
    event-time-ordered rows (user_id, event_id, seq, ts_epoch), each
    emitted exactly once, seq = the key's (ts, event_id) rank."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _reseq_fn,
            outputStructType=RESEQ_OUT_SCHEMA,
            stateStructType=RESEQ_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
