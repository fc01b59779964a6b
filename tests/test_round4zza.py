"""Independent Python replays for the round-4zza batch q393-q395
(each already oracle-checked via tools/selfcheck.py at sf0.001 and
sf0.01; these replays recompute the answers from raw parquet in pure
Python and add non-vacuity assertions).

Properties proven: the Shapley attribution satisfies the efficiency
axiom (sum of phi equals v(full) - v(empty), exactly, in the x24
integer domain) and a brute-force subset enumeration over all 32
(channel, coalition) terms reproduces Spark's phi bit-for-bit; the
Lindley closed form (running sum + running min, two window frames)
equals the literal sequential W_{k+1} = max(0, W_k + s_k - gap)
recurrence job-for-job, and the load-proportional service genuinely
creates contention (every queue has waiting jobs, utilization in a
sane band); the l-diversity audit's two criteria are independently
recomputed per equivalence class and both outcome classes are
populated (classes that pass and classes that leak)."""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import combinations
from math import factorial

import duckdb

SF = "/root/testdata/sf0.001"

CHANNELS = [("click", 1), ("error", 2), ("signup", 4), ("view", 8)]


def test_shapley_attribution(spark):
    from watermark_remove_spark.queries import q393_shapley_attribution

    got = {
        r["channel"]: (r["phi_x24"], r["phi_milli"])
        for r in q393_shapley_attribution(spark, SF).collect()
    }

    first_purchase = {}
    rows = duckdb.sql(
        f"SELECT user_id, ts, event_type FROM '{SF}/events.parquet'"
    ).fetchall()
    for uid, ts, et in rows:
        if et == "purchase" and (
            uid not in first_purchase or ts < first_purchase[uid]
        ):
            first_purchase[uid] = ts
    bit = dict(CHANNELS)
    mask = {uid: 0 for uid in first_purchase}
    for uid, ts, et in rows:
        if uid in first_purchase and et in bit and ts < first_purchase[uid]:
            mask[uid] |= bit[et]
    cnt = Counter(mask.values())

    def v(s):
        return sum(c for m, c in cnt.items() if m & ~s == 0)

    # brute-force Shapley with literal factorial weights
    exp = {}
    for ch, b in CHANNELS:
        others = [x for _, x in CHANNELS if x != b]
        phi24 = 0
        for k in range(4):
            for sub in combinations(others, k):
                s = sum(sub)
                w = factorial(k) * factorial(3 - k)  # /4! = /24
                phi24 += w * (v(s | b) - v(s))
        exp[ch] = (phi24, phi24 * 1000 // 24)
    assert got == exp
    # efficiency axiom: credits add up to exactly the explained
    # conversions, in the exact x24 domain
    assert sum(p for p, _ in got.values()) == 24 * (v(15) - v(0))
    # non-vacuity: conversions are actually being attributed
    assert v(15) > 0 and any(p > 0 for p, _ in got.values())


def test_queue_replay(spark):
    from watermark_remove_spark.queries import q394_queue_replay

    got = {r["queue"]: tuple(r) for r in q394_queue_replay(spark, SF).collect()}

    by_queue = defaultdict(list)
    for et, ts, eid in duckdb.sql(
        f"SELECT event_type, ts, event_id FROM '{SF}/events.parquet'"
    ).fetchall():
        by_queue[et].append((int(ts.timestamp()), eid))
    exp = {}
    for q, js in by_queue.items():
        js.sort()
        n = len(js)
        span = js[-1][0] - js[0][0]
        base = (span * 3) // ((n - 1) * 4)
        # literal sequential Lindley recurrence, job for job
        waits, prev_a, prev_s, w = [], None, None, 0
        busy = 0
        last_dep = 0
        for a, eid in js:
            s = max(1, (base * (4 + eid % 7)) // 7)
            w = 0 if prev_a is None else max(0, w + prev_s - (a - prev_a))
            waits.append(w)
            busy += s
            last_dep = a + w + s
            prev_a, prev_s = a, s
        makespan = last_dep - js[0][0]
        exp[q] = (
            q,
            n,
            busy,
            makespan,
            (busy * 1000000) // makespan,
            (sum(waits) * 1000) // n,
            max(waits),
            (sum(1 for x in waits if x > 0) * 1000000) // n,
        )
    assert got == exp
    # the load-proportional service creates real contention at every
    # sf: every queue saw waiting, utilization in a sane (0, 1) band
    for q, row in got.items():
        assert 0 < row[4] < 1000000, q
        assert row[7] > 0 and row[6] > 0, q
        # monotone sanity: server busy time never exceeds makespan
        assert row[2] <= row[3], q


def test_ldiversity_audit(spark):
    from watermark_remove_spark.queries import q395_ldiversity_audit

    got = {
        (r["m"], r["priority"]): tuple(r)
        for r in q395_ldiversity_audit(spark, SF).collect()
    }

    by = Counter()
    for od, prio, status in duckdb.sql(
        f"""SELECT o_orderdate, o_orderpriority, o_orderstatus
            FROM '{SF}/orders.parquet'"""
    ).fetchall():
        by[(od.year * 12 + od.month, prio, status)] += 1
    groups = defaultdict(list)
    for (m, prio, _), c in by.items():
        groups[(m, prio)].append(c)
    exp = {}
    for (m, prio), cs in groups.items():
        n, top = sum(cs), max(cs)
        exp[(m, prio)] = (
            m,
            prio,
            n,
            len(cs),
            (top * 1000000) // n,
            len(cs) >= 3,
            top * 3 <= n,
        )
    assert got == exp
    # both audit outcomes are populated: some classes satisfy
    # distinct-l, some leak (near-constant sensitive value)
    assert any(r[5] for r in got.values())
    assert any(not r[5] for r in got.values())
    assert any(not r[6] for r in got.values())
    # a frequency-diverse class is always distinct-diverse at l=3
    for r in got.values():
        if r[6]:
            assert r[5]
