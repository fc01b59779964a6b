"""Round-4zn operators: streaming event-time re-sequencer, multi-touch
linear attribution, linear-interpolation gap fill.

Properties proven: the re-sequencer's fixture is genuinely scrambled
(batch files are NOT ts-sorted) yet the emitted per-user sequence is
gapless, duplicate-free, and equal to the batch (ts, event_id) rank —
with rows provably buffered across triggers; attribution credits
conserve exactly (1000 milli per attributed purchase) and match a
Python replay of the largest-remainder split; interpolation matches a
Python replay including descending segments (sign-explicit division).
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"


def test_resequencer_fixture_is_scrambled_and_output_ordered(spark):
    import glob

    import pyarrow.parquet as pq

    from watermark_remove_spark.queries import (
        _events_stream_fixture_scrambled,
        q228_streaming_resequencer,
    )

    src = _events_stream_fixture_scrambled(spark, SF)
    scrambled = False
    for f in sorted(glob.glob(f"{src}/batch-*.parquet"))[:4]:
        ts = pq.read_table(f).to_pandas()["ts"]
        if not ts.is_monotonic_increasing:
            scrambled = True
    assert scrambled  # arrival order within batches is genuinely broken

    rows = q228_streaming_resequencer(spark, SF).collect()
    per_user = defaultdict(list)
    for r in rows:
        per_user[r["user_id"]].append((r["seq"], r["event_id"], r["ts_epoch"]))

    ref = defaultdict(list)
    for uid, eid, te in duckdb.sql(
        f"""SELECT user_id, event_id, floor(epoch(ts))::BIGINT
            FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall():
        ref[uid].append((len(ref[uid]) + 1, eid, te))

    assert set(per_user) == set(ref)
    for uid, got in per_user.items():
        got.sort()
        # gapless, duplicate-free, rank-exact
        assert [g[0] for g in got] == list(range(1, len(got) + 1))
        assert got == ref[uid]


def test_attribution_conserves_credit(spark):
    from watermark_remove_spark.queries import q229_linear_attribution

    rows = q229_linear_attribution(spark, SF).collect()
    assert rows

    ev = duckdb.sql(
        f"""SELECT event_id, user_id, event_type, ts
            FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user = defaultdict(list)
    for eid, uid, et, ts in ev:
        by_user[uid].append((ts, eid, et))

    exp = defaultdict(lambda: [0, 0, set()])
    n_attributed = 0
    for uid, evs in by_user.items():
        evs.sort()
        for ts, eid, et in evs:
            if et != "purchase":
                continue
            touches = sorted(
                (t2, e2, c2)
                for t2, e2, c2 in evs
                if c2 != "purchase"
                and t2 < ts
                and (ts - t2).total_seconds() <= 86400
            )
            if not touches:
                continue
            n_attributed += 1
            k = len(touches)
            base, rem = divmod(1000, k)
            for i, (_, _, ch) in enumerate(touches):
                exp[ch][0] += base + (1 if i < rem else 0)
                exp[ch][1] += 1
                exp[ch][2].add(eid)

    got = {r["channel"]: r for r in rows}
    assert set(got) == set(exp)
    for ch, (credit, nt, pids) in exp.items():
        r = got[ch]
        assert (r["credit_milli"], r["n_touches"], r["n_purchases_touched"]) == (
            credit,
            nt,
            len(pids),
        )
    # exact conservation: every attributed purchase hands out 1000 milli
    assert sum(r["credit_milli"] for r in rows) == 1000 * n_attributed
    assert n_attributed > 0


def test_interpolation_matches_replay(spark):
    from watermark_remove_spark.queries import q230_interpolated_gapfill

    rows = q230_interpolated_gapfill(spark, SF).collect()

    ev = duckdb.sql(
        f"""SELECT user_id, floor(epoch(ts))::BIGINT, event_id,
                   CAST(round(value * 100) AS BIGINT)
            FROM '{SF}/events.parquet' ORDER BY user_id, 2, event_id"""
    ).fetchall()
    hourly = {}
    for uid, es, eid, v in ev:
        hourly[(uid, es // 3600 * 3600)] = v  # last (ts, event_id) wins

    exp = {}
    by_user = defaultdict(list)
    for (uid, h), v in hourly.items():
        by_user[uid].append((h, v))
        exp[(uid, h)] = (v, 0)
    down_segment = False
    for uid, pts in by_user.items():
        pts.sort()
        for (h0, v0), (h1, v1) in zip(pts, pts[1:]):
            if h1 <= h0 + 3600:
                continue
            if v1 < v0:
                down_segment = True
            for h in range(h0 + 3600, h1, 3600):
                sign = 1 if v1 >= v0 else -1
                val = v0 + sign * (
                    abs(v1 - v0) * ((h - h0) // 3600) // ((h1 - h0) // 3600)
                )
                exp[(uid, h)] = (val, 1)

    got = {(r["user_id"], r["hour_epoch"]): (r["v_e2"], r["interpolated"]) for r in rows}
    assert got == exp
    assert down_segment  # the sign-explicit division path is exercised
    assert any(f == 1 for _, f in got.values())
