"""Streaming ORACLE: batch-by-batch simulation of Spark Structured
Streaming watermark semantics (O-24/O-25/O-18/O-19 streaming forms),
pure pandas — the golden for "exact output rows for the same input
stream and watermark settings" (north_star).

Empirical Spark 4.1 watermark model (validated row-exactly in
tests/test_streaming.py against a micro-batch file source with
maxFilesPerTrigger=1):

- Let m(k) = max event time seen in batches 0..k; the watermark IN
  FORCE during batch k is  wm(k) = m(k-2) - delay  (two-batch lag: the
  update computed after batch k-1 becomes effective in the batch after
  it).
- A row is LATE — dropped before any stateful operator — iff its event
  time (dedup) or its window membership (aggregates) falls strictly
  below the in-force watermark.
- Append-mode aggregates emit a group in batch k once
  window_end <= wm(k); dedup/session state is evicted on the same
  timeline.

Feeding a far-future sentinel row in the final micro-batches pushes
the watermark past every real window, so the emitted set equals the
simulated total regardless of trailing-flush timing.
"""

from __future__ import annotations

import pandas as pd

TS_MIN = pd.Timestamp.min


def with_flush_batches(batches: list[pd.DataFrame], n_flush: int) -> list[pd.DataFrame]:
    """Model Spark's trailing no-data maintenance batches (availableNow
    runs extra empty batches so state finalizes under the lagged
    watermark)."""
    empty = batches[0].iloc[0:0]
    return list(batches) + [empty] * n_flush


def watermark_timeline(
    batches: list[pd.DataFrame], delay: pd.Timedelta, ts_col: str
) -> list[pd.Timestamp]:
    """wm_in_force[k] for each batch k (two-batch lag, see module doc)."""
    maxes = []
    cur = TS_MIN
    for b in batches:
        if len(b):
            cur = max(cur, b[ts_col].max() - delay)
        maxes.append(cur)
    out = []
    for k in range(len(batches)):
        out.append(maxes[k - 2] if k >= 2 else TS_MIN)
    return out


def final_watermark(batches, delay, ts_col) -> pd.Timestamp:
    cur = TS_MIN
    for b in batches:
        if len(b):
            cur = max(cur, b[ts_col].max() - delay)
    return cur


def simulate_dedup(
    batches: list[pd.DataFrame], delay: pd.Timedelta, ts_col: str = "warc_ts"
) -> pd.DataFrame:
    """Rows surviving withWatermark(delay).dropDuplicates([url, ts])."""
    wms = watermark_timeline(batches, delay, ts_col)
    state: dict[tuple, pd.Timestamp] = {}
    out = []
    for k, b in enumerate(batches):
        wm = wms[k]
        for row in b.itertuples(index=False):
            ts = getattr(row, ts_col)
            if ts < wm:
                continue  # late (strict <)
            key = (row.url, ts)
            if key in state:
                continue
            state[key] = ts
            out.append(row)
        for kk in [kk for kk, t in state.items() if t < wm]:
            del state[kk]
    return pd.DataFrame(out, columns=list(batches[0].columns))


def simulate_tumbling_agg(
    batches: list[pd.DataFrame],
    delay: pd.Timedelta,
    window: pd.Timedelta,
    ts_col: str = "warc_ts",
    agg_cols=("lang",),
    value_col: str | None = "clean_text",
    n_flush: int = 3,
    slide: pd.Timedelta | None = None,
) -> pd.DataFrame:
    """Emitted rows of the append-mode windowed agg (n_pages,
    total_chars) keyed by (window_start, *agg_cols).  With ``slide``
    (must divide ``window``) each row contributes to window/slide
    overlapping windows — Spark's sliding ``F.window(ts, W, S)``."""
    slide = slide or window
    n_off = int(window / slide)
    assert n_off * slide == window, "slide must divide window"
    batches = with_flush_batches(batches, n_flush)
    wms = watermark_timeline(batches, delay, ts_col)
    state: dict[tuple, list] = {}
    emitted: dict[tuple, list] = {}
    for k, b in enumerate(batches):
        wm = wms[k]
        for row in b.itertuples(index=False):
            ts = getattr(row, ts_col)
            base = ts.floor(slide)
            for j in range(n_off):
                wstart = base - slide * j
                wend = wstart + window
                if wend <= wm:
                    continue  # late: window already finalized
                key = (wstart, *[getattr(row, c) for c in agg_cols])
                acc = state.setdefault(key, [0, 0])
                acc[0] += 1
                if value_col is not None:
                    acc[1] += len(getattr(row, value_col))
        done = [kk for kk in state if kk[0] + window <= wm]
        for kk in done:
            emitted[kk] = state.pop(kk)
    rows = [
        {
            "window_start": k[0],
            "window_end": k[0] + window,
            **{c: k[i + 1] for i, c in enumerate(agg_cols)},
            "n_pages": v[0],
            "total_chars": v[1],
        }
        for k, v in emitted.items()
    ]
    return pd.DataFrame(rows)


def simulate_sessions(
    batches: list[pd.DataFrame],
    delay: pd.Timedelta,
    gap: pd.Timedelta,
    ts_col: str = "warc_ts",
    key_col: str = "domain",
    n_flush: int = 3,
) -> pd.DataFrame:
    """Closed sessions emitted by the stateful per-domain session
    operator.  Shares the ONE canonical merge with both engines
    (``streaming.sessions.merge_sessions``): multiple open sessions
    per key, out-of-order admissible events extend backward / bridge,
    close only when the watermark passes ``last + gap``."""
    from .streaming.sessions import merge_sessions, split_closed

    batches = with_flush_batches(batches, n_flush)
    wms = watermark_timeline(batches, delay, ts_col)
    open_s: dict[str, list] = {}
    closed = []

    for k, b in enumerate(batches):
        wm = wms[k]
        # applyInPandasWithState late-filter keeps strict ts > wm
        # (drops ts == wm) — empirically distinct from the windowed-agg
        # path, which admits an event at t == wm because its window end
        # is > wm.  Pinned by tests/test_session_boundary.py.
        live = b[b[ts_col] > wm] if len(b) else b
        for kk, grp in live.groupby(key_col):
            open_s[kk] = merge_sessions(
                open_s.get(kk, []), list(grp[ts_col]), gap
            )
        for kk in list(open_s):
            done, still = split_closed(open_s[kk], gap, wm)
            for s, l, n in done:
                closed.append(
                    {
                        key_col: kk,
                        "session_start": s,
                        "session_end": l + gap,
                        "n_pages": n,
                    }
                )
            if still:
                open_s[kk] = still
            else:
                del open_s[kk]
    return pd.DataFrame(closed)
