"""Backfill pytest coverage for the late-round-4 batches q270-q284
(each already oracle-checked via tools/selfcheck.py; these add
INDEPENDENT Python replays plus non-vacuity assertions).

Properties proven: TPC-H Q20/Q11/Q4 join-shape replays; the full
Allen interval-algebra classification against a brute-force pair walk
(multiple relation classes live); rendezvous-hash minimal-disruption
law (ONLY the removed shard's docs move); gaps-and-islands streak
histogram; running-peak drawdown; Kendall tau-b from exact
concordance counts; rolling-median spike gate; sequential-stopping
walk with live accept/reject decisions; Good-Turing identity
(sum of (r+1)N_{r+1} mass conservation); inverse-Simpson bounds;
Wilson lower bound strictly below the raw rate; Fano factor >= 0;
two-window burn-rate AND-gate (each side individually insufficient).
"""

from __future__ import annotations

import json
import math
import re
from collections import Counter, defaultdict
from datetime import datetime, timedelta
from decimal import Decimal

import duckdb

from watermark_remove_spark.functions.portable_hash import md5_i64_py

SF = "/root/testdata/sf0.001"
EPOCH = datetime(1970, 1, 1)


def _us(ts):
    return (ts - EPOCH) // timedelta(microseconds=1)


def _d2(x):
    return Decimal(f"{x:.2f}")


def _tdiv(a, b):
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _events(cols):
    return duckdb.sql(f"SELECT {cols} FROM '{SF}/events.parquet'").fetchall()


def test_excess_volume_suppliers(spark):
    from watermark_remove_spark.queries import q270_excess_volume_suppliers

    got = [tuple(r) for r in q270_excess_volume_suppliers(spark, SF).collect()]

    red = {
        pk
        for (pk,) in duckdb.sql(
            f"SELECT p_partkey FROM '{SF}/part.parquet' WHERE regexp_matches(p_name, 'red')"
        ).fetchall()
    }
    vol = defaultdict(Decimal)
    for sk, pk, q in duckdb.sql(
        f"""SELECT l_suppkey, l_partkey, l_quantity FROM '{SF}/lineitem.parquet'
            WHERE year(l_shipdate) = 1997"""
    ).fetchall():
        if pk in red:
            vol[sk] += _d2(q)
    heavy = {sk for sk, v in vol.items() if v > 300}
    sups = duckdb.sql(
        f"SELECT s_suppkey, s_name, s_acctbal FROM '{SF}/supplier.parquet'"
    ).fetchall()
    exp = sorted((sk, nm, ab) for sk, nm, ab in sups if sk in heavy)
    assert got == exp
    assert 0 < len(heavy) < len(vol)  # the volume threshold really selects


def test_allen_interval_algebra(spark):
    from watermark_remove_spark.queries import q271_allen_interval_algebra

    got = {r["relation"]: r["n_pairs"] for r in q271_allen_interval_algebra(spark, SF).collect()}

    by_user = defaultdict(list)
    errors = Counter()
    for uid, eid, ts, et in _events("user_id, event_id, ts, event_type"):
        us = _us(ts)
        by_user[uid].append((us, eid))
        if et == "error":
            errors[(us // 900_000_000) * 900] += 1
    sessions = []
    for uid, rows in by_user.items():
        rows.sort()
        cur = [rows[0][0]]
        for (us, _), (pus, _) in zip(rows[1:], rows):
            if us - pus > 300_000_000:
                sessions.append(cur)
                cur = [us]
            else:
                cur.append(us)
        sessions.append(cur)
    ivs = [
        ((min(c) // 60_000_000) * 60, (max(c) // 60_000_000 + 1) * 60)
        for c in sessions
    ]
    incs = [(s2, s2 + 900) for s2, n in errors.items() if n >= 2]
    H = 1800

    def rel(s1, e1, s2, e2):
        if e1 < s2:
            return "precedes"
        if s1 > e2:
            return "preceded_by"
        if e1 == s2:
            return "meets"
        if s1 == e2:
            return "met_by"
        if s1 == s2 and e1 == e2:
            return "equals"
        if s1 == s2:
            return "starts" if e1 < e2 else "started_by"
        if e1 == e2:
            return "finishes" if s1 > s2 else "finished_by"
        if s1 > s2 and e1 < e2:
            return "during"
        if s1 < s2 and e1 > e2:
            return "contains"
        return "overlaps" if s1 < s2 else "overlapped_by"

    exp = Counter(
        rel(s1, e1, s2, e2)
        for s1, e1 in ivs
        for s2, e2 in incs
        if s1 <= e2 + H and s2 <= e1 + H
    )
    assert got == dict(exp)
    # the taxonomy is genuinely exercised, not just before/after
    assert len(got) >= 3 and sum(got.values()) > len(incs)


def test_rendezvous_hashing(spark):
    from watermark_remove_spark.queries import q272_rendezvous_hashing

    got = {r["shard"]: tuple(r) for r in q272_rendezvous_hashing(spark, SF).collect()}

    docs = [
        d
        for (d,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    shards9 = [f"shard{i}" for i in range(9)]
    per_shard = defaultdict(lambda: [0, 0, 0])
    for d in docs:
        hs = {s: md5_i64_py(f"{d}#{s}") for s in shards9}
        a9 = max(shards9, key=lambda s: hs[s])
        a8 = max(shards9[:8], key=lambda s: hs[s])
        row = per_shard[a9]
        row[0] += 1
        if a8 == a9:
            row[1] += 1
        else:
            row[2] += 1
    assert got == {s: (s, *v) for s, v in per_shard.items()}
    # minimal-disruption law: only shard8's docs move when it leaves
    for s, (_, n9, stayed, moved) in got.items():
        if s == "shard8":
            assert moved == n9 and stayed == 0
        else:
            assert stayed == n9 and moved == 0
    assert "shard8" in got  # the removed shard really had docs


def test_important_parts(spark):
    from watermark_remove_spark.queries import q273_important_parts

    got = [tuple(r) for r in q273_important_parts(spark, SF).collect()]

    rev = defaultdict(Decimal)
    for pk, ep, disc in duckdb.sql(
        f"SELECT l_partkey, l_extendedprice, l_discount FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        rev[pk] += (_d2(ep) * (1 - _d2(disc))).quantize(Decimal("0.0001"))
    total = sum(rev.values())
    names = dict(
        duckdb.sql(f"SELECT p_partkey, p_name FROM '{SF}/part.parquet'").fetchall()
    )
    exp = sorted(
        (pk, names[pk], float(r)) for pk, r in rev.items() if r * 1600 > total
    )
    assert got == exp
    # threshold algebra: every emitted part clears the global fraction
    assert len(got) > 0
    assert all(rev[pk] * 1600 > total for pk, _, _ in got)


def test_activity_streaks(spark):
    from watermark_remove_spark.queries import q274_activity_streaks

    got = {r["max_streak"]: r["n_users"] for r in q274_activity_streaks(spark, SF).collect()}

    days = defaultdict(set)
    for uid, ts in _events("user_id, ts"):
        days[uid].add((ts.date() - EPOCH.date()).days)
    hist = Counter()
    for uid, ds in days.items():
        best = cur = 1
        prev = None
        for d in sorted(ds):
            cur = cur + 1 if prev is not None and d == prev + 1 else 1
            best = max(best, cur)
            prev = d
        hist[best] += 1
    assert got == dict(hist)
    assert max(hist) > 1  # multi-day streaks exist


def test_max_drawdown(spark):
    from watermark_remove_spark.queries import q275_max_drawdown

    got = [tuple(r) for r in q275_max_drawdown(spark, SF).collect()]

    series = defaultdict(list)
    for uid, ts, eid, val, et in _events("user_id, ts, event_id, value, event_type"):
        if et in ("purchase", "error"):
            sign = 1 if et == "purchase" else -1
            series[uid].append((_us(ts), eid, sign * int(_d2(val) * 100)))
    per_user = []
    for uid, rows in series.items():
        rows.sort()
        bal = 0
        peak = None
        dd = None
        for _, _, c in rows:
            bal += c
            peak = bal if peak is None else max(peak, bal)
            d = peak - bal
            dd = d if dd is None else max(dd, d)
        per_user.append((uid, dd, peak))
    exp = sorted(per_user, key=lambda t: (-t[1], t[0]))[:20]
    assert got == exp
    assert got[0][1] > 0  # a real drawdown exists (signed flow is live)


def test_priority_check(spark):
    from watermark_remove_spark.queries import q276_priority_check

    got = {r["o_orderpriority"]: r["order_count"] for r in q276_priority_check(spark, SF).collect()}

    orders = duckdb.sql(
        f"""SELECT o_orderkey, o_orderdate, o_orderpriority
            FROM '{SF}/orders.parquet'
            WHERE o_orderdate >= TIMESTAMP '1995-01-01'
              AND o_orderdate < TIMESTAMP '1995-04-01'"""
    ).fetchall()
    ship = defaultdict(list)
    for ok, sd in duckdb.sql(
        f"SELECT l_orderkey, l_shipdate FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        ship[ok].append(sd)
    exp = Counter(
        pr
        for ok, od, pr in orders
        if any(sd > od + timedelta(days=30) for sd in ship.get(ok, []))
    )
    assert got == dict(exp)
    # the 30-day predicate is selective at line granularity: on-time
    # lineitems exist inside the window orders
    assert any(
        sd <= od + timedelta(days=30)
        for ok, od, _ in orders
        for sd in ship.get(ok, [])
    )


def test_kendall_tau(spark):
    from watermark_remove_spark.queries import q277_kendall_tau

    (row,) = q277_kendall_tau(spark, SF).collect()

    cells = Counter()
    for q, d in duckdb.sql(
        f"SELECT l_quantity, l_discount FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        cells[(int(q), int(d * 100))] += 1
    conc = disc = 0
    items = list(cells.items())
    for (x1, y1), n1 in items:
        for (x2, y2), n2 in items:
            if x2 > x1 and y2 != y1:
                if y2 > y1:
                    conc += n1 * n2
                else:
                    disc += n1 * n2
    n = sum(cells.values())
    xm = Counter()
    ym = Counter()
    for (x, y), c in cells.items():
        xm[x] += c
        ym[y] += c
    nx2 = sum(t * (t - 1) for t in xm.values())
    ny2 = sum(t * (t - 1) for t in ym.values())
    tau = math.floor(
        (float(conc) - float(disc))
        / math.sqrt(float(n * (n - 1) - nx2) * float(n * (n - 1) - ny2))
        * 2000000.0
    )
    assert tuple(row) == (n, conc, disc, tau)
    assert conc > 0 and disc > 0  # both orientations live
    assert -1000000 <= tau <= 1000000


def test_rolling_median_gate(spark):
    from watermark_remove_spark.queries import q278_rolling_median_gate

    got = {r["user_id"]: tuple(r) for r in q278_rolling_median_gate(spark, SF).collect()}

    series = defaultdict(list)
    for uid, ts, eid, val, et in _events("user_id, ts, event_id, value, event_type"):
        if et == "purchase":
            series[uid].append((_us(ts), eid, int(_d2(val) * 100)))
    exp = {}
    for uid, rows in series.items():
        rows.sort()
        cs = [c for _, _, c in rows]
        n_scored = n_spikes = 0
        worst = None
        for i in range(4, len(cs)):
            med = sorted(cs[i - 4 : i + 1])[2]
            n_scored += 1
            if med > 0:
                r = _tdiv(cs[i] * 1000000, med)
                worst = r if worst is None else max(worst, r)
                if cs[i] > 4 * med:
                    n_spikes += 1
        if n_spikes > 0:
            exp[uid] = (uid, n_scored, n_spikes, worst)
    assert got == exp
    assert len(got) > 0
    # every flagged user's worst ratio really exceeds the 4x gate
    assert all(t[3] > 4000000 for t in got.values())


def test_sequential_stopping(spark):
    from watermark_remove_spark.queries import q279_sequential_stopping

    # sf0.01: the ±25 walk bound is only reachable with enough events
    # per experiment bucket (at sf0.001 every bucket stays 'running')
    sf = "/root/testdata/sf0.01"
    got = {r["exp_id"]: tuple(r) for r in q279_sequential_stopping(spark, sf).collect()}

    walks = defaultdict(list)
    for uid, ts, eid, et in duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{sf}/events.parquet'"
    ).fetchall():
        if et in ("purchase", "click"):
            walks[uid % 16].append((_us(ts), eid, 1 if et == "purchase" else -1))
    exp = {}
    for ex, rows in walks.items():
        rows.sort()
        walk = 0
        decided = None
        for i, (_, _, step) in enumerate(rows, 1):
            walk += step
            if decided is None and abs(walk) >= 25:
                decided = (i, "accept" if walk >= 25 else "reject", walk)
        if decided:
            exp[ex] = (ex, decided[1], decided[0], len(rows), decided[2])
        else:
            exp[ex] = (ex, "running", len(rows), len(rows), walk)
    assert got == exp
    decisions = {t[1] for t in got.values()}
    assert "accept" in decisions or "reject" in decisions
    # early stopping is real: some decided experiment used < all its rows
    assert any(t[1] != "running" and t[2] < t[3] for t in got.values())


def test_good_turing_spectrum(spark):
    from watermark_remove_spark.queries import q280_good_turing_spectrum

    got = [tuple(r) for r in q280_good_turing_spectrum(spark, SF).collect()]

    counts = Counter()
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall():
        for t in re.split(r"\s+", text.lower()):
            if t:
                counts[t] += 1
    spec = Counter(counts.values())
    rs = sorted(spec)
    exp = []
    for i, r in enumerate(rs):
        nxt = rs[i + 1] if i + 1 < len(rs) else None
        adj = (
            _tdiv((r + 1) * spec[nxt] * 1000000, spec[r])
            if nxt == r + 1
            else None
        )
        exp.append((r, spec[r], adj))
    assert got == exp
    # mass conservation: sum r*N_r equals the corpus token count
    assert sum(r * n for r, n, _ in got) == sum(counts.values())
    # a real spectrum: many frequency classes, adjacent classes exist
    assert len(got) > 5 and any(adj is not None for _, _, adj in got)


def test_effective_languages(spark):
    from watermark_remove_spark.queries import q281_effective_languages

    got = {r["source"]: tuple(r) for r in q281_effective_languages(spark, SF).collect()}

    cells = Counter()
    for src, lang in duckdb.sql(
        f"SELECT source, lang FROM '{SF}/documents.parquet'"
    ).fetchall():
        cells[(src, lang)] += 1
    per_src = defaultdict(list)
    for (src, lang), c in cells.items():
        per_src[src].append((c, lang))
    for src, cl in per_src.items():
        n = sum(c for c, _ in cl)
        ss = sum(c * c for c, _ in cl)
        dom_c, dom_lang = max(cl)
        exp = (
            src, n, dom_lang,
            (dom_c * 1000000) // n,
            (n * n * 1000000) // ss,
        )
        assert got[src] == exp
        # inverse Simpson lies in [1, #langs] (scaled ppm)
        assert 1000000 <= exp[4] <= len(cl) * 1000000
    assert len(got) == len(per_src)


def test_wilson_ranking(spark):
    from watermark_remove_spark.queries import q282_wilson_ranking

    got = [tuple(r) for r in q282_wilson_ranking(spark, SF).collect()]

    agg = defaultdict(lambda: [0, 0])
    for et, props in _events("event_type, props"):
        if et in ("view", "purchase"):
            k = json.loads(props).get("k")
            a = agg[int(k) if k is not None else None]
            a[0] += 1
            a[1] += et == "purchase"
    exp = []
    for camp, (n, s) in agg.items():
        p = float(s) / float(n)
        z2 = 3.8416
        lb = (
            p + z2 / (2.0 * n)
            - 1.96 * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n)) / n)
        ) / (1.0 + z2 / n)
        exp.append(
            (camp, n, s, _tdiv(s * 1000000, n), math.floor(lb * 1000000.0))
        )
    exp.sort(key=lambda t: (-t[4], t[0]))
    assert got == exp
    # the lower bound is strictly below the raw rate whenever s > 0
    assert all(t[4] < t[3] for t in got if t[2] > 0)


def test_token_dispersion(spark):
    from watermark_remove_spark.queries import q283_token_dispersion

    got = [tuple(r) for r in q283_token_dispersion(spark, SF).collect()]

    cells = Counter()
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        for t in re.split(r"\s+", text.lower()):
            if t:
                cells[(t, doc_id % 64)] += 1
    per_tok = defaultdict(lambda: [0, 0, 0])
    for (t, _), c in cells.items():
        row = per_tok[t]
        row[0] += c
        row[1] += c * c
        row[2] += 1
    exp = [
        (t, s, nsh, _tdiv((64 * ss - s * s) * 1000000, 64 * s))
        for t, (s, ss, nsh) in per_tok.items()
        if s >= 100
    ]
    exp.sort(key=lambda x: (-x[3], x[0]))
    assert got == exp[:100]
    # Fano factor is non-negative by Cauchy-Schwarz (B*SS >= S^2 over B shards)
    assert all(t[3] >= 0 for t in got) and len(got) > 0


def test_burn_rate_alerts(spark):
    from watermark_remove_spark.queries import q284_burn_rate_alerts

    got = [tuple(r) for r in q284_burn_rate_alerts(spark, SF).collect()]

    hourly = defaultdict(lambda: [0, 0])
    for ts, et in _events("ts, event_type"):
        w = (_us(ts) // 1_000_000 // 3600) * 3600
        hourly[w][0] += 1
        hourly[w][1] += et == "error"
    slow = defaultdict(lambda: [0, 0])
    for w, (t, e) in hourly.items():
        sw = (w // 21600) * 21600
        slow[sw][0] += t
        slow[sw][1] += e
    exp = []
    for w, (t, e) in hourly.items():
        sw = (w // 21600) * 21600
        st, se = slow[sw]
        f_ppm = (e * 1000000) // t
        s_ppm = (se * 1000000) // st
        if f_ppm > 280000 and s_ppm > 220000:
            exp.append((sw, w, e, t, f_ppm, s_ppm))
    exp.sort(key=lambda x: x[1])
    assert got == exp
    # the AND-gate suppresses: hours exist where exactly one side trips
    fast_only = sum(
        1
        for w, (t, e) in hourly.items()
        if (e * 1000000) // t > 280000
        and (slow[(w // 21600) * 21600][1] * 1000000)
        // slow[(w // 21600) * 21600][0]
        <= 220000
    )
    slow_only_pages = len(exp)
    assert fast_only > 0 or slow_only_pages < sum(
        1 for w, (t, e) in hourly.items() if (e * 1000000) // t > 280000
    )
