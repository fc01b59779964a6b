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


def test_voptimal_histogram(spark):
    from watermark_remove_spark.queries import q396_voptimal_histogram

    got = {r["b"]: tuple(r) for r in q396_voptimal_histogram(spark, SF).collect()}

    cents = [
        int(round(p * 100))
        for (p,) in duckdb.sql(
            f"SELECT o_totalprice FROM '{SF}/orders.parquet'"
        ).fetchall()
    ]
    mn, mx = min(cents), max(cents)
    c = [0] * 60
    for p in cents:
        c[((p - mn) * 60) // (mx - mn + 1)] += 1
    # prefix sums over 61 boundary points
    S = [0] * 61
    Q = [0] * 61
    for k in range(60):
        S[k + 1] = S[k] + c[k]
        Q[k + 1] = Q[k] + c[k] * c[k]

    def cost(i, j):
        ln = j - i
        return ((ln * (Q[j] - Q[i]) - (S[j] - S[i]) ** 2) * 1000) // ln

    # literal O(n^2 B) DP
    INF = float("inf")
    best = {0: {0: 0}}
    exp = {}
    prev = {j: cost(0, j) for j in range(1, 61)}
    vopt = {1: prev[60]}
    for b in range(2, 7):
        cur = {}
        for j in range(b, 61):
            cur[j] = min(prev[i] + cost(i, j) for i in range(b - 1, j))
        vopt[b] = cur[60]
        prev = cur
    for b in range(1, 7):
        bounds = [(k * 60) // b for k in range(b + 1)]
        equi = sum(cost(bounds[k], bounds[k + 1]) for k in range(b))
        exp[b] = (
            b,
            vopt[b],
            equi,
            ((equi - vopt[b]) * 1000000) // max(1, equi),
        )
    assert got == exp
    # optimality: the DP never loses to equi-width, and more buckets
    # never hurt
    for b in range(1, 7):
        assert got[b][1] <= got[b][2]
        if b > 1:
            assert got[b][1] <= got[b - 1][1]
    assert got[6][3] > 0  # the advisor finds real savings


def test_lru_hit_curve(spark):
    from watermark_remove_spark.queries import q397_lru_hit_curve

    got = {r["c_size"]: tuple(r) for r in q397_lru_hit_curve(spark, SF).collect()}

    K = 256
    by_cache = defaultdict(list)
    for et, ts, eid, uid in duckdb.sql(
        f"SELECT event_type, ts, event_id, user_id FROM '{SF}/events.parquet'"
    ).fetchall():
        by_cache[et].append((ts, eid, uid))
    sds = []
    for trace in by_cache.values():
        trace.sort()
        hist = []
        for _, _, uid in trace:
            recent = hist[-K:]
            rev = recent[::-1]
            if uid in rev:
                idx = rev.index(uid)
                sds.append(len(set(rev[:idx])))
            else:
                sds.append(-1)
            hist.append(uid)
    n = len(sds)
    in_window = sum(1 for s in sds if s >= 0)
    exp = {}
    for cs in [1, 2, 4, 8, 16, 32, 64, 128]:
        hits = sum(1 for s in sds if 0 <= s < cs)
        exp[cs] = (cs, n, in_window, hits, hits * 1000000 // n)
    assert got == exp
    # the curve is monotone in capacity, strictly rises off C=1, and
    # saturates at exactly the in-window mass
    hits_seq = [got[cs][3] for cs in [1, 2, 4, 8, 16, 32, 64, 128]]
    assert hits_seq == sorted(hits_seq)
    assert 0 < hits_seq[0] < hits_seq[-1] <= in_window
    assert got[128][3] == in_window  # window cap binds before C=128 here


def test_rtm_deciles(spark):
    from watermark_remove_spark.queries import q398_rtm_deciles

    got = {r["decile"]: tuple(r) for r in q398_rtm_deciles(spark, SF).collect()}

    import math

    secs = [
        (uid, int(ts.timestamp()))
        for uid, ts in duckdb.sql(
            f"SELECT user_id, ts FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    lo = min(s for _, s in secs)
    hi = max(s for _, s in secs)
    mid = (lo + hi) // 2
    h = defaultdict(lambda: [0, 0])
    for uid, s in secs:
        h[uid][0 if s <= mid else 1] += 1
    users = [(uid, a, b) for uid, (a, b) in h.items() if a > 0]
    users.sort(key=lambda t: (-t[1], t[0]))
    n = len(users)
    m = n
    sx = sum(a for _, a, _ in users)
    sy = sum(b for _, _, b in users)
    sxy = sum(a * b for _, a, b in users)
    sxx = sum(a * a for _, a, _ in users)
    slope = math.floor(
        1000.0 * float(m * sxy - sx * sy) / float(m * sxx - sx * sx)
    )
    dec = defaultdict(list)
    for rk, (_, a, b) in enumerate(users, start=1):
        dec[min(10, 1 + ((rk - 1) * 10) // n)].append((a, b))
    exp = {}
    for d, rows in dec.items():
        nd = len(rows)
        s1 = sum(a for a, _ in rows)
        s2 = sum(b for _, b in rows)
        exp[d] = (d, nd, s1 * 1000 // nd, s2 * 1000 // nd, slope)
    assert got == exp
    # regression to the mean: attenuated slope and a top decile that
    # falls back toward the pack
    assert 0 < slope < 1000
    h1_means = [got[d][2] for d in sorted(got)]
    assert h1_means == sorted(h1_means, reverse=True)
    assert got[1][3] < got[1][2]


def test_isotonic_calibration(spark):
    from fractions import Fraction
    from math import floor

    from watermark_remove_spark.queries import q399_isotonic_calibration

    got = {r["b"]: tuple(r) for r in q399_isotonic_calibration(spark, SF).collect()}

    agg = defaultdict(lambda: [0, 0])
    for uid, et in duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        a = agg[uid]
        if et == "purchase":
            a[1] += 1
        else:
            a[0] += 1
    users = sorted((uid, s, pc) for uid, (s, pc) in agg.items())
    n = len(users)
    med = sorted((pc, uid) for uid, _, pc in users)[(n + 1) // 2 - 1][0]
    by_score = sorted(users, key=lambda t: (t[1], t[0]))
    binstats = defaultdict(lambda: [0, 0])
    for rk, (uid, s, pc) in enumerate(by_score, start=1):
        b = min(20, 1 + ((rk - 1) * 20) // n)
        binstats[b][0] += 1
        binstats[b][1] += 1 if pc > med else 0
    # classic weighted PAVA over the present bins (exact rationals)
    order = sorted(binstats)
    pools = []  # (num, den, [bins])
    for b in order:
        nu, conv = binstats[b]
        pools.append([conv, nu, [b]])
        while len(pools) > 1 and Fraction(pools[-2][0], pools[-2][1]) >= \
                Fraction(pools[-1][0], pools[-1][1]):
            c2, n2, b2 = pools.pop()
            pools[-1][0] += c2
            pools[-1][1] += n2
            pools[-1][2] += b2
    fit = {}
    for num, den, bs in pools:
        for b in bs:
            fit[b] = floor(1000000.0 * (num / den))
    exp = {
        b: (
            b,
            binstats[b][0],
            binstats[b][1],
            binstats[b][1] * 1000000 // binstats[b][0],
            fit[b],
        )
        for b in order
    }
    assert got == exp
    # isotonic: fitted curve is monotone nondecreasing and pooling
    # actually happened somewhere (raw curve is not isotone)
    fits = [got[b][4] for b in order]
    assert fits == sorted(fits)
    assert any(got[b][4] != got[b][3] for b in order)


def test_ab_duration_advisor(spark):
    from math import ceil

    from watermark_remove_spark.queries import q400_ab_duration_advisor

    got = {r["rel_pct"]: tuple(r) for r in q400_ab_duration_advisor(spark, SF).collect()}

    ud = defaultdict(int)
    for d, uid, et in duckdb.sql(
        f"SELECT CAST(ts AS DATE), user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        ud[(d, uid)] |= 1 if et == "purchase" else 0
    n_users = len(ud)
    n_conv = sum(ud.values())
    n_days = len({d for d, _ in ud})
    p = n_conv / n_users
    exp = {}
    for rel in [1, 2, 5, 10]:
        npa = ceil(
            (2.0 * p * (1.0 - p) * ((1.959964 + 0.841621) * (1.959964 + 0.841621)))
            / ((p * (rel / 100.0)) * (p * (rel / 100.0)))
        )
        daily = n_users // (2 * n_days)
        exp[rel] = (
            rel,
            n_conv * 1000000 // n_users,
            daily,
            npa,
            ceil(npa / daily),
        )
    assert got == exp
    # smaller detectable lifts need quadratically more sample
    assert got[1][3] > got[2][3] > got[5][3] > got[10][3]
    assert 0 < got[1][1] < 1000000
    assert all(r[4] >= 1 for r in got.values())


def test_ta_early_termination(spark):
    from watermark_remove_spark.queries import q401_ta_early_termination

    got = {r["k"]: tuple(r) for r in q401_ta_early_termination(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT doc_id, text, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    scored = []
    for did, text, nc in rows:
        s2 = 7 * len([t for t in text.split(" ") if t])
        scored.append((did, nc, s2, nc + s2))
    n = len(scored)
    l1 = sorted(scored, key=lambda t: (-t[1], t[0]))
    l2 = sorted(scored, key=lambda t: (-t[2], t[0]))
    lt = sorted(scored, key=lambda t: (-t[3], t[0]))
    thresholds = [l1[d][1] + l2[d][2] for d in range(n)]
    exp = {}
    for k in [1, 5, 10, 25]:
        kth = lt[k - 1][3]
        depth = 1 + sum(1 for t in thresholds if t > kth)
        exp[k] = (k, kth, depth, (n - depth) * 1000000 // n)
    assert got == exp
    # certification: scanning to `depth` provably covers the top-k
    # (every unseen item is bounded by a threshold <= kth_total), and
    # the advisor actually saves scan work
    for k in [1, 5, 10, 25]:
        kth, depth = exp[k][1], exp[k][2]
        assert depth >= 1 and thresholds[depth - 1] <= kth
        assert got[k][3] > 0
    assert got[1][2] <= got[5][2] <= got[10][2] <= got[25][2]


def test_retry_storm(spark):
    from watermark_remove_spark.queries import q402_retry_storm

    (row,) = q402_retry_storm(spark, SF).collect()

    base = Counter()
    retries = Counter()
    for ts, et in duckdb.sql(
        f"SELECT ts, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        base[sec - sec % 600] += 1
        if et == "error":
            for d in (60, 120, 240, 480):
                retries[(sec + d) - (sec + d) % 600] += 1
    wins = set(base) | set(retries)
    b = {w: base.get(w, 0) for w in wins}
    r = {w: retries.get(w, 0) for w in wins}
    exp = (
        len(wins),
        max(b.values()),
        max(b[w] + r[w] for w in wins),
        (max(b[w] + r[w] for w in wins) * 1000000) // max(b.values()),
        sum(r.values()),
        sum(1 for w in wins if r[w] > b[w]),
    )
    assert tuple(row) == exp
    # the storm projection is live: retries injected, amplification
    # above parity, and the policy creates retry-dominated windows
    assert row["total_retries"] == 4 * sum(
        1 for _, et in duckdb.sql(
            f"SELECT ts, event_type FROM '{SF}/events.parquet'"
        ).fetchall() if et == "error"
    )
    assert row["amplification_ppm"] > 1000000
    assert 0 < row["retry_dominated_windows"] < row["n_windows"]


def test_median_polish(spark):
    from watermark_remove_spark.queries import q403_median_polish

    got = {
        (r["dow"], r["hour"]): tuple(r)
        for r in q403_median_polish(spark, SF).collect()
    }
    assert len(got) == 168

    x = {(d, h): 0 for d in range(7) for h in range(24)}
    n = dict(x)
    for (ts,) in duckdb.sql(
        f"SELECT ts FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        key = ((sec // 86400 + 4) % 7, (sec // 3600) % 24)
        x[key] += 1
        n[key] += 1

    def lower_med(vals):
        s = sorted(vals)
        return s[(len(s) + 1) // 2 - 1]

    m1 = {d: lower_med([x[(d, h)] for h in range(24)]) for d in range(7)}
    x = {(d, h): v - m1[d] for (d, h), v in x.items()}
    m2 = {h: lower_med([x[(d, h)] for d in range(7)]) for h in range(24)}
    x = {(d, h): v - m2[h] for (d, h), v in x.items()}
    m3 = {d: lower_med([x[(d, h)] for h in range(24)]) for d in range(7)}
    x = {(d, h): v - m3[d] for (d, h), v in x.items()}
    m4 = {h: lower_med([x[(d, h)] for d in range(7)]) for h in range(24)}
    x = {(d, h): v - m4[h] for (d, h), v in x.items()}
    exp = {
        (d, h): (d, h, n[(d, h)], m1[d] + m3[d], m2[h] + m4[h], x[(d, h)])
        for d in range(7)
        for h in range(24)
    }
    assert got == exp
    # decomposition identity and the post-polish column-median-zero
    # property of the final column sweep
    for (d, h), row in got.items():
        assert row[2] == row[3] + row[4] + row[5]
    for h in range(24):
        col = [got[(d, h)][5] for d in range(7)]
        assert lower_med(col) == 0
    # the polish is non-trivial: effects and residuals both live
    assert any(r[3] != 0 for r in got.values())
    assert any(r[4] != 0 for r in got.values())
    assert any(r[5] != 0 for r in got.values())


def test_jl_projection_audit(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q404_jl_projection_audit

    (row,) = q404_jl_projection_audit(spark, SF).collect()

    dim, kd = 64, 16
    signs = [
        [1 if md5_i64_py(f"jl{j}#{i}") % 2 == 0 else -1 for i in range(dim)]
        for j in range(kd)
    ]
    vecs = {}
    for vid, emb in duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall():
        # mirror round-half-away-from-zero on the double product
        q = []
        for v in emb:
            p = v * 128.0
            q.append(int(p + 0.5) if p >= 0 else -int(-p + 0.5))
        vecs[vid] = q
    ratios = []
    s64 = s16 = 0
    for a in sorted(vecs):
        if a % 2 or a + 1 not in vecs:
            continue
        qa, qb = vecs[a], vecs[a + 1]
        d64 = sum((x - z) ** 2 for x, z in zip(qa, qb))
        if d64 == 0:
            continue
        ya = [sum(s * x for s, x in zip(signs[j], qa)) for j in range(kd)]
        yb = [sum(s * x for s, x in zip(signs[j], qb)) for j in range(kd)]
        d16 = sum((x - z) ** 2 for x, z in zip(ya, yb))
        ratios.append(((a + 1), d16 * 1000000 // (16 * d64)))
        s64 += d64
        s16 += d16
    n = len(ratios)
    ordered = [r for _, r in sorted(ratios, key=lambda t: (t[1], t[0]))]
    within = sum(1 for _, r in ratios if abs(r - 1000000) <= 300000)
    exp = (
        n,
        s16 * 1000000 // (16 * s64),
        ordered[max(1, n * 10 // 100) - 1],
        ordered[max(1, n * 50 // 100) - 1],
        ordered[max(1, n * 90 // 100) - 1],
        within * 1000000 // n,
    )
    assert tuple(row) == exp
    # JL at k=16: aggregate ratio near-unbiased, per-pair spread wide
    # (p10 well below 1, p90 well above), band share strictly partial
    assert 800000 < row["agg_ratio_ppm"] < 1200000
    assert row["p10_ppm"] < 900000 < 1100000 < row["p90_ppm"]
    assert 0 < row["within30_ppm"] < 1000000


def _shingles_py(text: str) -> set[str]:
    out = set()
    for ln in text.split("\n"):
        toks = [t for t in ln.split(" ") if t]
        if not toks:
            continue
        if len(toks) <= 3:
            out.add(" ".join(toks))
        else:
            out.update(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
    return out


def test_lang_modularity(spark):
    import math

    from watermark_remove_spark.queries import q405_lang_modularity

    got = {r["lang"]: tuple(r) for r in q405_lang_modularity(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    nd = len(rows)
    sh = {did: _shingles_py(text) for did, text, _ in rows}
    lang = {did: lg for did, _, lg in rows}
    df = Counter()
    for s in sh.values():
        df.update(s)
    kept = {
        did: {g for g in s if 10 * df[g] < nd} for did, s in sh.items()
    }
    inv = defaultdict(list)
    for did, s in kept.items():
        for g in s:
            inv[g].append(did)
    shared = Counter()
    for g, dids in inv.items():
        dids.sort()
        for i in range(len(dids)):
            for j in range(i + 1, len(dids)):
                shared[(dids[i], dids[j])] += 1
    edges = [p for p, c in shared.items() if c >= 3]
    m = len(edges)
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    per = defaultdict(lambda: [0, 0, 0])  # nodes, d_sum, e_within
    for n_, d in deg.items():
        per[lang[n_]][0] += 1
        per[lang[n_]][1] += d
    for a, b in edges:
        if lang[a] == lang[b]:
            per[lang[a]][2] += 1
    num = {
        lg: 4 * m * e - d * d for lg, (n_, d, e) in per.items()
        for e in [per[lg][2]]
    }
    den = 4 * m * m
    q_milli = math.floor(1000.0 * float(sum(num.values())) / float(den))
    exp = {
        lg: (
            lg,
            per[lg][0],
            per[lg][2],
            per[lg][1],
            math.floor(1000000.0 * float(num[lg]) / float(den)),
            q_milli,
        )
        for lg in per
    }
    assert got == exp
    # the audit is live: edges exist, degree mass is consistent with
    # the handshake lemma, and Q is a bounded quality score
    assert m > 0 and sum(d for _, d, _ in per.values()) == 2 * m
    assert -1000 <= q_milli <= 1000
    assert any(r[4] < 0 for r in got.values()) or q_milli < 1000


def test_bounded_load_chash(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q406_bounded_load_chash

    got = {r["shard"]: tuple(r) for r in q406_bounded_load_chash(spark, SF).collect()}

    dids = [
        d
        for (d,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    n = len(dids)
    cap = ((n // 16) * 21) // 20 + 1
    homes = defaultdict(list)
    for d in dids:
        h = md5_i64_py(f"ch{d}")
        homes[h % 16].append((h, d))
    kept = {s: 0 for s in range(16)}
    spilled = defaultdict(list)
    for s in range(16):
        hs = sorted(homes.get(s, []))
        kept[s] = min(len(hs), cap)
        for h, d in hs[cap:]:
            spilled[(s + 1) % 16].append((h, d))
    placed = {s: 0 for s in range(16)}
    unplaced = 0
    for tgt, lst in spilled.items():
        lst.sort()
        rem = max(0, cap - kept[tgt])
        placed[tgt] = min(len(lst), rem)
        unplaced += max(0, len(lst) - rem)
    exp = {}
    for s in range(16):
        home_n = len(homes.get(s, []))
        sp_out = max(0, home_n - cap)
        final = kept[s] + placed[s]
        exp[s] = (
            s,
            home_n,
            cap,
            kept[s],
            placed[s],
            sp_out,
            final,
            final * 1000000 // cap,
            unplaced,
        )
    assert got == exp
    # conservation: every doc is kept at home, placed after one hop,
    # or counted unplaced — and the bounded-load property holds
    assert sum(r[6] for r in got.values()) + unplaced == n
    assert all(r[6] <= cap for r in got.values())
    # the cap binds somewhere (spills actually happened)
    assert sum(r[5] for r in got.values()) > 0


def test_ls_changepoint(spark):
    from watermark_remove_spark.queries import q407_ls_changepoint

    (row,) = q407_ls_changepoint(spark, SF).collect()

    obs = Counter()
    for (ts,) in duckdb.sql(
        f"SELECT ts FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        obs[sec - sec % 86400] += 1
    d0, d1 = min(obs), max(obs)
    days = list(range(d0, d1 + 1, 86400))
    xs = [obs.get(d, 0) for d in days]
    nd = len(xs)

    def sse_milli(seq):
        ln = len(seq)
        s = sum(seq)
        q = sum(v * v for v in seq)
        return ((ln * q - s * s) * 1000) // ln

    best = None
    for t in range(1, nd):
        cost = sse_milli(xs[:t]) + sse_milli(xs[t:])
        if best is None or cost < best[0]:
            best = (cost, t)
    cost, t = best
    s_left = sum(xs[:t])
    total = sse_milli(xs)
    exp = (
        days[t - 1],
        nd,
        (s_left * 1000) // t,
        ((sum(xs) - s_left) * 1000) // (nd - t),
        total,
        cost,
        ((total - cost) * 1000000) // max(1, total),
    )
    assert tuple(row) == exp
    # the split is a genuine improvement and the means differ
    assert row["split_sse_milli"] < row["total_sse_milli"]
    assert row["explained_ppm"] > 0
    assert row["left_mean_milli"] != row["right_mean_milli"]


def test_second_price_auction(spark):
    from watermark_remove_spark.queries import q408_second_price_auction

    (row,) = q408_second_price_auction(spark, SF).collect()

    bids = defaultdict(list)
    for ts, val, eid in duckdb.sql(
        f"SELECT ts, value, event_id FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        bids[sec - sec % 3600].append((int(round(val * 100)), eid))
    n_single = first = second = 0
    for w, bs in bids.items():
        bs.sort(key=lambda t: (-t[0], t[1]))
        first += bs[0][0]
        if len(bs) >= 2:
            second += bs[1][0]
        else:
            n_single += 1
    exp = (
        len(bids),
        n_single,
        first,
        second,
        ((first - second) * 1000000) // first,
    )
    assert tuple(row) == exp
    # the mechanism is live: truthful clearing costs real revenue,
    # and both auction depths occur
    assert 0 < row["discount_ppm"] < 1000000
    assert 0 < row["single_bid_auctions"] < row["n_auctions"]
    assert row["second_price_cents"] < row["first_price_cents"]


def test_splithalf_stability(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q409_splithalf_stability

    (row,) = q409_splithalf_stability(spark, SF).collect()

    halves = {0: Counter(), 1: Counter()}
    for did, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        h = md5_i64_py(f"sh{did}") % 2
        halves[h].update(t for t in text.split(" ") if t)
    tops = {}
    for h, cnt in halves.items():
        ranked = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:10]
        tops[h] = {tok: i + 1 for i, (tok, _) in enumerate(ranked)}
    common = set(tops[0]) & set(tops[1])
    ov = {
        d: sum(1 for t in common if tops[0][t] <= d and tops[1][t] <= d)
        for d in range(1, 11)
    }
    exp = (
        ov[10],
        sum((ov[d] * 1000000) // d for d in range(1, 11)) // 10,
        1 if ov[1] == 1 else 0,
    )
    assert tuple(row) == exp
    # the null comparison shows real sampling noise: agreement is
    # partial, not perfect and not empty
    assert 0 < row["overlap_at_10"] < 10
    assert 0 < row["avg_overlap_ppm"] < 1000000


def test_binpack_bounds(spark):
    from math import ceil

    from watermark_remove_spark.queries import q410_binpack_bounds

    (row,) = q410_binpack_bounds(spark, SF).collect()

    c = 2048
    sizes = [
        len(t.encode("utf-8"))
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    small = [s for s in sizes if s <= c]
    over = [s for s in sizes if s > c]
    mass = sum(small)
    cands = {0} | {s for s in small if 2 * s <= c}
    l2 = 0
    for a in cands:
        j1 = sum(1 for s in small if s > c - a)
        j2 = [s for s in small if 2 * s > c and s <= c - a]
        j3 = sum(s for s in small if a <= s and 2 * s <= c)
        extra = j3 - (len(j2) * c - sum(j2))
        l2 = max(l2, j1 + len(j2) + (ceil(extra / c) if extra > 0 else 0))
    classes = Counter()
    for s in small:
        k = next((k for k in range(1, 8) if s * (k + 1) > c), 8)
        classes[k] += 1
    harm = sum(ceil(n / k) for k, n in classes.items())
    exp = (
        len(small),
        len(over),
        sum(ceil(s / c) for s in over),
        ceil(mass / c),
        l2,
        harm,
        ((harm - l2) * 1000000) // harm,
    )
    assert tuple(row) == exp
    # bound sandwich: naive <= L2 <= OPT <= harmonic, and the gap
    # certificate is informative (under 2x)
    assert row["naive_lower"] <= row["l2_lower"] <= row["harmonic_upper"]
    assert row["gap_ppm"] < 500000


def test_markov_hitting_time(spark):
    import math
    from itertools import permutations

    from watermark_remove_spark.queries import (
        _Q411_STATES,
        q411_markov_hitting_time,
    )

    got = {
        r["state"]: r["hitting_steps_milli"]
        for r in q411_markov_hitting_time(spark, SF).collect()
    }

    by_user = defaultdict(list)
    for uid, ts, eid, et in duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        by_user[uid].append((ts, eid, et))
    idx = {s: i for i, s in enumerate(_Q411_STATES)}
    c = [[0] * 4 for _ in range(4)]
    r = [0] * 4
    for rows in by_user.values():
        rows.sort()
        for (_, _, a), (_, _, b) in zip(rows, rows[1:]):
            if a == "purchase":
                continue
            r[idx[a]] += 1
            if b in idx:
                c[idx[a]][idx[b]] += 1
    A = [
        [(r[i] if i == j else 0) - c[i][j] for j in range(4)]
        for i in range(4)
    ]

    def det4(m):
        tot = 0
        for p in permutations(range(4)):
            s = 1
            for i in range(4):
                for j in range(i + 1, 4):
                    if p[i] > p[j]:
                        s = -s
            prod = 1
            for i in range(4):
                prod *= m[i][p[i]]
            tot += s * prod
        return tot

    d = det4(A)
    exp = {}
    for k, st in enumerate(_Q411_STATES):
        ak = [
            [r[i] if j == k else A[i][j] for j in range(4)]
            for i in range(4)
        ]
        exp[st] = math.floor(1000.0 * float(det4(ak)) / float(d))
    assert got == exp
    # hitting a purchase takes at least one step from every state,
    # and the chain is genuinely absorbing (finite expectations)
    assert all(1000 <= v < 100000 for v in got.values())
    assert d != 0


def test_lsm_compaction_advisor(spark):
    from watermark_remove_spark.queries import q412_lsm_compaction_advisor

    got = {r["ratio"]: tuple(r) for r in q412_lsm_compaction_advisor(spark, SF).collect()}

    vol = sum(
        len(t.encode("utf-8"))
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    exp = {}
    for ratio in (4, 8, 10, 16):
        lvl = next(
            lv for lv in range(1, 21) if 65536 * ratio**lv >= vol
        )
        exp[ratio] = (
            ratio,
            vol,
            lvl,
            lvl * ratio,
            lvl,
            lvl,
            lvl * ratio,
            ((ratio + 1) * 1000000) // ratio,
            2000000,
        )
    assert got == exp
    # the RUM trade: bigger ratios never need more levels, and
    # leveled trades write amp for space amp monotonically
    lvls = [got[ratio][2] for ratio in (4, 8, 10, 16)]
    assert lvls == sorted(lvls, reverse=True)
    spaces = [got[ratio][7] for ratio in (4, 8, 10, 16)]
    assert spaces == sorted(spaces, reverse=True)


def test_cube_view_selection(spark):
    from watermark_remove_spark.queries import q413_cube_view_selection

    got = [tuple(r) for r in q413_cube_view_selection(spark, SF).collect()]

    rows = duckdb.sql(
        f"SELECT lang, source, n_chars // 512 FROM '{SF}/documents.parquet'"
    ).fetchall()
    size = {}
    for mask in range(8):
        keys = set()
        for lg, src, b in rows:
            keys.add(
                (
                    lg if mask & 4 else None,
                    src if mask & 2 else None,
                    b if mask & 1 else None,
                )
            )
        size[mask] = len(keys)
    materialized = {7}
    exp = []
    for rnd in range(1, 4):
        best = None
        for cand in range(8):
            if cand in materialized:
                continue
            benefit = 0
            for w in range(8):
                if w & cand != w:
                    continue
                cost = min(size[m] for m in materialized if w & m == w)
                benefit += max(0, cost - size[cand])
            key = (-benefit, size[cand], cand)
            if best is None or key < best[0]:
                best = (key, cand, benefit)
        _, pick, benefit = best
        materialized.add(pick)
        exp.append((rnd, pick, size[pick], benefit))
    assert got == exp
    # greedy on a submodular benefit: marginal gains never increase,
    # picks are distinct non-base cuboids
    assert got[0][3] >= got[1][3] >= got[2][3]
    assert len({g[1] for g in got}) == 3 and all(g[1] != 7 for g in got)


def test_wilcoxon_signed_rank(spark):
    import math

    from watermark_remove_spark.queries import q414_wilcoxon_signed_rank

    (row,) = q414_wilcoxon_signed_rank(spark, SF).collect()

    secs = [
        (uid, int(ts.timestamp()))
        for uid, ts in duckdb.sql(
            f"SELECT user_id, ts FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    mid = (min(s for _, s in secs) + max(s for _, s in secs)) // 2
    d = defaultdict(int)
    for uid, s in secs:
        d[uid] += 1 if s > mid else -1
    diffs = sorted(
        ((abs(v), uid, v) for uid, v in d.items() if v != 0)
    )
    n = len(diffs)
    # average ranks as first+last of each tie block (2x scale)
    rank2 = {}
    i = 0
    while i < n:
        j = i
        while j < n and diffs[j][0] == diffs[i][0]:
            j += 1
        rank2[diffs[i][0]] = (i + 1) + j  # min_rn + max_rn
        i = j
    w2 = sum(rank2[a] for a, _, v in diffs if v > 0)
    ties = Counter(a for a, _, _ in diffs)
    tie3 = sum(t**3 - t for t in ties.values())
    e2 = n * (n + 1) // 2
    v12 = 2 * n * (n + 1) * (2 * n + 1) - tie3
    z = math.floor(
        1000.0 * (float(w2) - float(e2)) / math.sqrt(float(v12) / 12.0)
    )
    sig = 12000 * (w2 - e2) ** 2 >= 3841 * v12
    assert tuple(row) == (n, w2, e2, v12, z, sig)
    # rank-sum identity: W+ + W- = n(n+1)/2 in the 2x domain
    wminus2 = sum(rank2[a] for a, _, v in diffs if v < 0)
    assert w2 + wminus2 == n * (n + 1)
    assert v12 > 0 and -10000 < z < 10000


def test_dorfman_pooling(spark):
    import math

    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q415_dorfman_pooling

    got = {r["s"]: tuple(r) for r in q415_dorfman_pooling(spark, SF).collect()}

    dids = [
        d
        for (d,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    n = len(dids)
    defects = sum(1 for d in dids if md5_i64_py(f"qc{d}") % 20 < 1)
    q = (float(n) - float(defects)) / float(n)
    rows = {}
    for s in (2, 3, 4, 5, 6, 8, 10, 12, 16):
        qs = 1.0
        for _ in range(s):
            qs = qs * q
        e = math.floor(1000000.0 * ((1.0 / float(s)) + 1.0 - qs))
        rows[s] = e
    best = min(rows.items(), key=lambda t: (t[1], t[0]))[0]
    exp = {
        s: (
            s,
            n,
            defects,
            defects * 1000000 // n,
            e,
            1000000 - e,
            s == best,
        )
        for s, e in rows.items()
    }
    assert got == exp
    # pooling genuinely helps at this defect rate, exactly one argmin
    assert sum(1 for r in got.values() if r[6]) == 1
    assert got[best][5] > 300000
    # U-shape: the extremes are worse than the optimum
    assert rows[2] > rows[best] and rows[16] > rows[best]


def test_bloom_sizing_sweep(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q416_bloom_sizing_sweep

    got = {r["m_bits"]: tuple(r) for r in q416_bloom_sizing_sweep(spark, SF).collect()}

    keys = sorted(
        {
            u
            for (u,) in duckdb.sql(
                f"""SELECT DISTINCT user_id FROM '{SF}/events.parquet'
                    WHERE event_type = 'purchase'"""
            ).fetchall()
        }
    )
    n = len(keys)
    exp = {}
    for m in (64, 128, 256, 512, 1024):
        bits = set()
        for k in keys:
            bits.add(md5_i64_py(f"bf0#{k}") % m)
            bits.add(md5_i64_py(f"bf1#{k}") % m)
        fp = 0
        for k in keys:
            p = k + 1000000
            if (
                md5_i64_py(f"bf0#{p}") % m in bits
                and md5_i64_py(f"bf1#{p}") % m in bits
            ):
                fp += 1
        exp[m] = (m, n, len(bits), m * 1000 // n, fp, fp * 1000000 // n)
    assert got == exp
    # more bits, fewer false positives (weakly monotone), and the
    # set-bit count is bounded by both the bitmap and 2x the keys
    fpps = [got[m][5] for m in (64, 128, 256, 512, 1024)]
    assert fpps == sorted(fpps, reverse=True)
    for m in (64, 128, 256, 512, 1024):
        assert got[m][2] <= min(m, 2 * n)


def test_coupon_collector(spark):
    from watermark_remove_spark.queries import q417_coupon_collector

    (row,) = q417_coupon_collector(spark, SF).collect()

    rows = sorted(
        duckdb.sql(
            f"SELECT doc_id, source, lang FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    n = len({(s, lg) for _, s, lg in rows})
    k = len({(s, lg) for _, s, lg in rows[:50]})
    SCALE = 10**12
    h = [0] * (n + 1)
    for i in range(1, n + 1):
        h[i] = h[i - 1] + SCALE // i
    exp = (
        n,
        k,
        n * h[n - k] * 1000 // SCALE,
        n * h[n] * 1000 // SCALE,
    )
    assert tuple(row) == exp
    # the projection is live: real cells remain unseen and the
    # remaining wait is positive but below the full-collection wait
    assert 0 < k < n
    assert 0 < row["e_more_draws_milli"] < row["e_full_milli"]


def test_chao1_richness(spark):
    from watermark_remove_spark.queries import q418_chao1_richness

    got = {r["lang"]: tuple(r) for r in q418_chao1_richness(spark, SF).collect()}

    spec = defaultdict(Counter)
    for lg, text in duckdb.sql(
        f"SELECT lang, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        for ln in text.split("\n"):
            toks = [t for t in ln.split(" ") if t]
            if not toks:
                continue
            if len(toks) <= 3:
                spec[lg][" ".join(toks)] += 1
            else:
                for i in range(len(toks) - 2):
                    spec[lg][" ".join(toks[i : i + 3])] += 1
    exp = {}
    for lg, cnt in spec.items():
        n = sum(cnt.values())
        s_obs = len(cnt)
        f1 = sum(1 for c in cnt.values() if c == 1)
        f2 = sum(1 for c in cnt.values() if c == 2)
        exp[lg] = (
            lg,
            n,
            s_obs,
            f1,
            f2,
            s_obs * 1000 + (f1 * (f1 - 1) * 1000) // (2 * (f2 + 1)),
            (n - f1) * 1000000 // n,
        )
    assert got == exp
    # the estimator is live: singletons exist, Chao1 strictly exceeds
    # the observed vocabulary, coverage is genuinely partial
    for r in got.values():
        assert r[3] > 0 and r[5] > r[2] * 1000
        assert 0 < r[6] < 1000000


def test_horvitz_thompson_audit(spark):
    import math

    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q419_horvitz_thompson_audit

    (row,) = q419_horvitz_thompson_audit(spark, SF).collect()

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    n_total = len(rows)
    true_total = sum(nc for _, nc in rows)
    sampled = [
        (d, nc)
        for d, nc in rows
        if md5_i64_py(f"wsamp#{d}") % 1000 < min(nc, 1000)
    ]
    n_s = len(sampled)
    sample_chars = sum(nc for _, nc in sampled)
    ht = sum(1000 if nc <= 1000 else nc for _, nc in sampled)
    naive = (sample_chars * n_total) // n_s
    exp = (
        n_total,
        n_s,
        true_total,
        ht,
        math.floor(
            1000000.0 * (float(ht) - float(true_total)) / float(true_total)
        ),
        naive,
        math.floor(
            1000000.0
            * (float(naive) - float(true_total))
            / float(true_total)
        ),
    )
    assert tuple(row) == exp
    # reweighting beats ignoring the length bias: HT lands closer to
    # the truth, and the naive estimate is biased UP (long docs are
    # over-represented by construction)
    assert abs(row["ht_err_ppm"]) < abs(row["naive_err_ppm"])
    assert row["naive_err_ppm"] > 0


def _quality_micro(text: str) -> int:
    n_chars = len(text)
    toks = [t for t in text.split(" ") if t]
    n_tokens = len(toks)
    lines = text.split("\n")
    n_lines = len(lines)
    non_empty = sum(1 for l in lines if l)
    length_score = min(n_chars / 500.0, 1.0)
    tok_score = (
        1.0
        if n_tokens > 0 and 3.0 <= (n_chars - (n_tokens - 1.0)) / n_tokens <= 10.0
        else 0.5
    )
    line_ratio = non_empty * 1.0 / n_lines if n_lines > 0 else 0.0
    q = round(0.4 * length_score + 0.4 * tok_score + 0.2 * line_ratio, 6)
    return int(round(q * 1000000))


def test_loo_source_influence(spark):
    import math

    from watermark_remove_spark.queries import q420_loo_source_influence

    got = {r["source"]: tuple(r) for r in q420_loo_source_influence(spark, SF).collect()}

    per = defaultdict(lambda: [0, 0])
    for src, text in duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        per[src][0] += 1
        per[src][1] += _quality_micro(text)
    nt = sum(n for n, _ in per.values())
    st = sum(s for _, s in per.values())
    exp = {
        src: (
            src,
            n,
            s // n,
            math.floor(
                (float(st - s) / float(nt - n)) - (float(st) / float(nt))
            ),
        )
        for src, (n, s) in per.items()
    }
    assert got == exp
    # influence is a zero-sum-ish audit: both signs occur (some
    # sources drag the mean, some lift it)
    assert any(r[3] < 0 for r in got.values())
    assert any(r[3] >= 0 for r in got.values())


def test_snapshot_interval_advisor(spark):
    from watermark_remove_spark.queries import q421_snapshot_interval_advisor

    got = {r["k"]: tuple(r) for r in q421_snapshot_interval_advisor(spark, SF).collect()}

    nu = Counter(
        u
        for (u,) in duckdb.sql(
            f"SELECT user_id FROM '{SF}/events.parquet'"
        ).fetchall()
    )
    n_events = sum(nu.values())
    exp = {}
    costs = {}
    for k in (8, 16, 32, 64):
        snaps = sum((n + k - 1) // k for n in nu.values())
        # closed form vs literal position walk: both computed
        replay = sum(
            (n // k) * (k * (k - 1) // 2) + (n % k) * ((n % k) - 1) // 2
            for n in nu.values()
        )
        brute = sum(i % k for n in nu.values() for i in range(n))
        assert replay == brute  # the closed form IS the position walk
        costs[k] = 10 * snaps + replay
        exp[k] = (k, snaps, replay, replay * 1000 // n_events, costs[k], None)
    best = min(costs.items(), key=lambda t: (t[1], t[0]))[0]
    for k in exp:
        e = list(exp[k])
        e[5] = k == best
        exp[k] = tuple(e)
    assert got == exp
    # the trade is real: snapshots fall, replay grows, exactly one
    # argmin
    snaps_seq = [got[k][1] for k in (8, 16, 32, 64)]
    replay_seq = [got[k][2] for k in (8, 16, 32, 64)]
    assert snaps_seq == sorted(snaps_seq, reverse=True)
    assert replay_seq == sorted(replay_seq)
    assert sum(1 for r in got.values() if r[5]) == 1


def test_ski_rental_advisor(spark):
    from watermark_remove_spark.queries import q422_ski_rental_advisor

    got = {r["b"]: tuple(r) for r in q422_ski_rental_advisor(spark, SF).collect()}

    spans = Counter()
    seen = set()
    for u, ts in duckdb.sql(
        f"SELECT user_id, ts FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        seen.add((u, sec // 604800, ts.date()))
    per_span = Counter((u, w) for u, w, _ in seen)
    exp = {}
    for b in (2, 3, 4, 6):
        pol = sum(d if d < b else 2 * b - 1 for d in per_span.values())
        opt = sum(min(d, b) for d in per_span.values())
        bought = sum(1 for d in per_span.values() if d >= b)
        exp[b] = (
            b,
            len(per_span),
            pol,
            opt,
            pol * 1000000 // opt,
            (2 * b - 1) * 1000000 // b,
            bought,
        )
    assert got == exp
    # competitive guarantee holds on every replay, both branches live
    for b in (2, 3, 4, 6):
        assert got[b][4] <= got[b][5]
    assert any(0 < r[6] < r[1] for r in got.values())


def test_sjf_counterfactual(spark):
    from watermark_remove_spark.queries import q423_sjf_counterfactual

    got = {r["queue"]: tuple(r) for r in q423_sjf_counterfactual(spark, SF).collect()}

    by_queue = defaultdict(list)
    for et, ts, eid in duckdb.sql(
        f"SELECT event_type, ts, event_id FROM '{SF}/events.parquet'"
    ).fetchall():
        by_queue[et].append((int(ts.timestamp()), eid, 1 + eid % 7))
    exp = {}
    for q, js in by_queue.items():
        fcfs = sorted(js)
        sjf = sorted(js, key=lambda t: (t[2], t[0], t[1]))

        def total_wait(order):
            acc = w = 0
            for _, _, s in order:
                w += acc
                acc += s
            return w

        fw, sw = total_wait(fcfs), total_wait(sjf)
        exp[q] = (
            q,
            len(js),
            sum(s for _, _, s in js),
            fw,
            sw,
            ((fw - sw) * 1000000) // max(1, fw),
        )
    assert got == exp
    # SJF optimality (the exchange argument) holds on every queue,
    # and reordering buys real waiting time on this workload
    for r in got.values():
        assert r[4] <= r[3]
        assert r[5] > 0


def test_siegel_repeated_median(spark):
    import math

    from watermark_remove_spark.queries import q424_siegel_repeated_median

    (row,) = q424_siegel_repeated_median(spark, SF).collect()

    obs = Counter()
    for (ts,) in duckdb.sql(
        f"SELECT ts FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        obs[(sec - sec % 86400) // 86400] += 1
    t0, t1 = min(obs), max(obs)
    series = [(t, obs.get(t, 0)) for t in range(t0, t1 + 1)]
    n = len(series)

    def lower_med(pairs):
        # pairs: (value, tiebreak...) — value at the pinned rank
        return sorted(pairs)[(len(pairs) + 1) // 2 - 1][0]

    per_i = []
    for i, (ti, xi) in enumerate(series):
        sls = [
            ((xj - xi) / (tj - ti), tj)
            for tj, xj in series
            if tj != ti
        ]
        per_i.append((lower_med(sls), ti))
    siegel = lower_med(per_i)
    half = [
        ((xj - xi) / (tj - ti), ti, tj)
        for ti, xi in series
        for tj, xj in series
        if ti < tj
    ]
    theil = lower_med(half)
    exp = (
        n,
        math.floor(1000000.0 * siegel),
        math.floor(1000000.0 * theil),
    )
    assert tuple(row) == exp
    # both robust estimators land in a sane band and the repeated
    # median genuinely differs from the single median here
    assert abs(row["siegel_slope_micro"]) < 10_000_000
    assert row["siegel_slope_micro"] != row["theil_sen_slope_micro"]


def test_sketch_selection_advisor(spark):
    import math

    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.functions.sketches import (
        A_SCALED,
        K,
        M_REGISTERS,
        P,
    )
    from watermark_remove_spark.queries import q425_sketch_selection_advisor

    got = {r["sketch"]: tuple(r) for r in q425_sketch_selection_advisor(spark, SF).collect()}

    keys = {
        f"{u}/{int(ts.timestamp()) // 86400}"
        for u, ts in duckdb.sql(
            f"SELECT user_id, ts FROM '{SF}/events.parquet'"
        ).fetchall()
    }
    exact = len(keys)
    # portable HLL raw estimate
    regs = {}
    for v in keys:
        h = md5_i64_py(f"hll#{v}")
        b = h & (M_REGISTERS - 1)
        top = h >> P
        r = K if top == 0 else K - len(bin(top)) + 2  # bin() has '0b'
        regs[b] = max(regs.get(b, -1), r)
    s_present = sum(1 << (K - m) for m in regs.values())
    scale = s_present + (256 - len(regs)) * (1 << K)
    hll_est = math.floor(float(A_SCALED) / float(scale))
    # KMV
    hs = sorted(md5_i64_py(f"kmv#{v}") for v in keys)
    ests = {"exact": (exact, exact), "hll256": (256, hll_est)}
    for k in (64, 256):
        if exact < k:
            ests[f"kmv{k}"] = (k, exact)
        else:
            ests[f"kmv{k}"] = (
                k,
                math.floor(
                    (float(k - 1) * 1152921504606846976.0)
                    / float(hs[k - 1])
                ),
            )
    exp = {
        name: (
            name,
            state,
            est,
            exact,
            math.floor(
                1000000.0 * (float(est) - float(exact)) / float(exact)
            ),
        )
        for name, (state, est) in ests.items()
    }
    assert got == exp
    # the advisor is informative: exact has zero error, every sketch
    # lands within a 20% band on this corpus
    assert got["exact"][4] == 0
    for name in ("hll256", "kmv64", "kmv256"):
        assert abs(got[name][4]) < 200000


def test_sampling_bound_audit(spark):
    import math

    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q426_sampling_bound_audit

    got = {r["r_pct"]: tuple(r) for r in q426_sampling_bound_audit(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    n = len(rows)
    s = sum(nc for _, nc in rows)
    rng = max(nc for _, nc in rows) - min(nc for _, nc in rows)
    exp = {}
    for r in (1, 5, 10, 25):
        sam = [nc for d, nc in rows if md5_i64_py(f"esb#{d}") % 100 < r]
        ns = len(sam)
        ss = sum(sam)
        qq = sum(x * x for x in sam)
        err = math.floor(abs((ss / ns) - (s / n)) * 1000.0)
        cheb = math.floor(
            1000.0 * math.sqrt(20.0 * ((qq / ns) - ((ss / ns) * (ss / ns))) / ns)
        )
        hoeff = math.floor(1000.0 * float(rng) * math.sqrt(1.8444 / ns))
        exp[r] = (r, ns, err, cheb, hoeff, err <= cheb, err <= hoeff)
    assert got == exp
    # the bounds hold on every draw and the audit shows their cost:
    # actual error is far inside both envelopes at the larger rates
    for r in (1, 5, 10, 25):
        assert got[r][5] and got[r][6]
    assert got[25][2] * 3 < got[25][3]


def test_rich_club_profile(spark):
    import math

    from watermark_remove_spark.queries import q427_rich_club_profile

    got = {r["k"]: tuple(r) for r in q427_rich_club_profile(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    nd = len(rows)
    sh = {d: _shingles_py(t) for d, t in rows}
    df = Counter()
    for ss in sh.values():
        df.update(ss)
    kept = {d: {g for g in ss if 10 * df[g] < nd} for d, ss in sh.items()}
    inv = defaultdict(list)
    for d, ss in kept.items():
        for g in ss:
            inv[g].append(d)
    shared = Counter()
    for g, ds in inv.items():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    edges = [p for p, c in shared.items() if c >= 3]
    deg = Counter()
    for a, b in edges:
        deg[a] += 1
        deg[b] += 1
    exp = {}
    for k in (1, 2, 3):
        richset = {v for v, d in deg.items() if d > k}
        er = sum(1 for a, b in edges if a in richset and b in richset)
        nr = len(richset)
        phi = (
            math.floor(1000000.0 * (2.0 * er) / (nr * (nr - 1.0)))
            if nr >= 2
            else None
        )
        exp[k] = (k, nr, er, phi)
    assert got == exp
    # elite cohesion rises with the threshold while membership falls
    nrs = [got[k][1] for k in (1, 2, 3)]
    assert nrs == sorted(nrs, reverse=True)
    phis = [got[k][3] for k in (1, 2, 3) if got[k][3] is not None]
    assert phis and phis == sorted(phis)


def test_kish_ess_audit(spark):
    import math

    from watermark_remove_spark.queries import q428_kish_ess_audit

    got = {r["weighting"]: tuple(r) for r in q428_kish_ess_audit(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    n = len(rows)
    sw = sum(nc for _, nc in rows)
    sw2 = sum(nc * nc for _, nc in rows)
    ess_len = math.floor((float(sw) * float(sw)) / float(sw2))
    nl = Counter(lg for lg, _ in rows)
    ws = [10**9 // nl[lg] for lg, _ in rows]
    ess_bal = math.floor(
        (float(sum(ws)) * float(sum(ws))) / float(sum(w * w for w in ws))
    )
    exp = {
        "length_weighted": (
            "length_weighted", n, ess_len, ess_len * 1000000 // n
        ),
        "lang_balanced": (
            "lang_balanced", n, ess_bal, ess_bal * 1000000 // n
        ),
    }
    assert got == exp
    # weighting always costs effective sample (ESS <= n), and the
    # length weighting genuinely concentrates while near-uniform
    # lang balance barely does
    assert got["length_weighted"][2] < n
    assert got["length_weighted"][2] < got["lang_balanced"][2] <= n


def test_cuped_variance_reduction(spark):
    import math

    from watermark_remove_spark.queries import q429_cuped_variance_reduction

    (row,) = q429_cuped_variance_reduction(spark, SF).collect()

    secs = [
        (uid, int(ts.timestamp()))
        for uid, ts in duckdb.sql(
            f"SELECT user_id, ts FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    mid = (min(s for _, s in secs) + max(s for _, s in secs)) // 2
    h = defaultdict(lambda: [0, 0])
    for uid, s in secs:
        h[uid][0 if s <= mid else 1] += 1
    n = len(h)
    sx = sum(a for a, _ in h.values())
    sy = sum(b for _, b in h.values())
    sxy = sum(a * b for a, b in h.values())
    sxx = sum(a * a for a, _ in h.values())
    syy = sum(b * b for _, b in h.values())
    cov = float(n * sxy - sx * sy)
    vx = float(n * sxx - sx * sx)
    vy = float(n * syy - sy * sy)
    exp = (
        n,
        math.floor(1000.0 * cov / vx),
        math.floor(1000000.0 * (cov * cov) / (vx * vy)),
        math.floor(1000.0 * vy / (float(n) * float(n))),
        math.floor(
            (1000.0 * vy / (float(n) * float(n)))
            * (1.0 - (cov * cov) / (vx * vy))
        ),
    )
    assert tuple(row) == exp
    # CUPED buys real sensitivity on this population: rho^2 in (0,1)
    # and the adjusted variance strictly below the raw variance
    assert 0 < row["rho2_ppm"] < 1000000
    assert row["var_adj_milli"] < row["var_post_milli"]


def test_delta_join_audit(spark):
    from watermark_remove_spark.queries import q430_delta_join_audit

    (row,) = q430_delta_join_audit(spark, SF).collect()

    orders = duckdb.sql(
        f"SELECT o_orderkey, o_orderdate FROM '{SF}/orders.parquet'"
    ).fetchall()
    lines = duckdb.sql(
        f"SELECT l_orderkey, l_shipdate FROM '{SF}/lineitem.parquet'"
    ).fetchall()
    cut = max(int(d.timestamp()) for _, d in orders) - 7 * 86400
    obase = {k: int(d.timestamp()) <= cut for k, d in orders}
    cells = Counter()
    for k, d in lines:
        if k in obase:
            cells[(obase[k], int(d.timestamp()) <= cut)] += 1
    full = sum(cells.values())
    base = cells.get((True, True), 0)
    do_lb = cells.get((False, True), 0)
    ob_dl = cells.get((True, False), 0)
    do_dl = cells.get((False, False), 0)
    o_delta = sum(1 for v in obase.values() if not v)
    l_delta = sum(
        1 for _, d in lines if int(d.timestamp()) > cut
    )
    exp = (
        full,
        base,
        do_lb,
        ob_dl,
        do_dl,
        full == base + do_lb + ob_dl + do_dl,
        (do_lb + ob_dl + do_dl) * 1000000 // max(1, full),
        o_delta + l_delta,
        len(orders) + len(lines),
    )
    assert tuple(row) == exp
    # the decomposition is exact and incremental work is a small
    # fraction of the full recompute
    assert row["identity_holds"]
    assert 0 < row["incr_input_rows"] < row["full_input_rows"] // 4
    assert row["do_lb_rows"] + row["ob_dl_rows"] + row["do_dl_rows"] > 0


def test_embedding_layout_audit(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q431_embedding_layout_audit

    got = {r["ordering"]: tuple(r) for r in q431_embedding_layout_audit(spark, SF).collect()}

    signs0 = [
        1 if md5_i64_py(f"jl0#{i}") % 2 == 0 else -1 for i in range(64)
    ]
    vecs = {}
    for vid, emb in duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall():
        q = []
        for v in emb:
            p = v * 128.0
            q.append(int(p + 0.5) if p >= 0 else -int(-p + 0.5))
        vecs[vid] = q

    def total(order):
        tot = 0
        for a, b in zip(order, order[1:]):
            tot += sum(
                (x - z) ** 2 for x, z in zip(vecs[a], vecs[b])
            )
        return tot

    by_id = sorted(vecs)
    y0 = {v: sum(s * x for s, x in zip(signs0, q)) for v, q in vecs.items()}
    by_proj = sorted(vecs, key=lambda v: (y0[v], v))
    n_pairs = len(vecs) - 1
    exp = {
        "jl_projected": (
            "jl_projected",
            n_pairs,
            total(by_proj),
            total(by_proj) // n_pairs,
        ),
        "vec_id_order": (
            "vec_id_order",
            n_pairs,
            total(by_id),
            total(by_id) // n_pairs,
        ),
    }
    assert got == exp
    # the locality key buys real (if modest) adjacent coherence on
    # this corpus
    assert got["jl_projected"][2] < got["vec_id_order"][2]


def test_lttb_downsample(spark):
    from watermark_remove_spark.queries import q432_lttb_downsample

    got = {r["bucket"]: tuple(r) for r in q432_lttb_downsample(spark, SF).collect()}

    obs = Counter()
    for (ts,) in duckdb.sql(
        f"SELECT ts FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        obs[sec - sec % 3600] += 1
    h0, h1 = min(obs), max(obs)
    hours = list(range(h0, h1 + 1, 3600))
    ys = [obs.get(h, 0) for h in hours]
    n = len(hours)
    x0 = h0 // 3600
    exp = {}
    for i in range(1, n - 1):
        x = h0 // 3600 + i
        area = abs(
            (x - (x - 1)) * (ys[i + 1] - ys[i - 1])
            - ((x + 1) - (x - 1)) * (ys[i] - ys[i - 1])
        )
        bucket = min(19, ((x - x0) * 20) // n)
        cand = (bucket, hours[i], ys[i], area)
        cur = exp.get(bucket)
        if cur is None or (-area, x) < (-cur[3], cur[1] // 3600):
            exp[bucket] = cand
    assert got == exp
    # the sketch is a real shape summary: 20 buckets, salient points
    # carry nonzero area somewhere
    assert len(got) == 20
    assert any(r[3] > 0 for r in got.values())


def test_pagination_cost_advisor(spark):
    from watermark_remove_spark.queries import q433_pagination_cost_advisor

    got = {r["n_pages"]: tuple(r) for r in q433_pagination_cost_advisor(spark, SF).collect()}

    nu = Counter(
        u
        for (u,) in duckdb.sql(
            f"SELECT user_id FROM '{SF}/events.parquet'"
        ).fetchall()
    )
    agg = defaultdict(lambda: [0, 0, 0])
    for n in nu.values():
        pages = (n + 9) // 10
        offset = 10 * (((n // 10) * ((n // 10) + 1)) // 2) + (
            0 if n % 10 == 0 else n
        )
        a = agg[pages]
        a[0] += 1
        a[1] += n
        a[2] += offset
        # the closed form equals the literal per-page prefix scan
        brute = sum(min(n, (p + 1) * 10) for p in range(pages))
        assert offset == brute
    exp = {
        p: (p, c, k, o, o * 1000 // k) for p, (c, k, o) in agg.items()
    }
    assert got == exp
    # the quadratic cliff: amplification grows with page depth
    amps = [got[p][4] for p in sorted(got)]
    assert amps == sorted(amps)
    assert amps[-1] > 2000


def test_emd_drift(spark):
    from watermark_remove_spark.queries import q434_emd_drift

    (row,) = q434_emd_drift(spark, SF).collect()

    rows = duckdb.sql(
        f"SELECT ts, value FROM '{SF}/events.parquet'"
    ).fetchall()
    secs = [int(ts.timestamp()) for ts, _ in rows]
    mid = (min(secs) + max(secs)) // 2
    cents = [
        (int(round(v * 100)), int(ts.timestamp()) <= mid)
        for ts, v in rows
    ]
    lo = min(c for c, _ in cents)
    hi = max(c for c, _ in cents)
    c1 = [0] * 100
    c2 = [0] * 100
    for c, h1 in cents:
        b = ((c - lo) * 100) // (hi - lo + 1)
        (c1 if h1 else c2)[b] += 1
    n1, n2 = sum(c1), sum(c2)
    k1 = k2 = emd = 0
    for b in range(100):
        k1 += c1[b]
        k2 += c2[b]
        emd += abs(k1 * n2 - k2 * n1)
    exp = (n1, n2, emd, emd * 1000000 // (n1 * n2))
    assert tuple(row) == exp
    # halves genuinely differ but not pathologically: EMD is a
    # positive, bounded number of bin-steps
    assert 0 < row["emd_ppm_binsteps"] < 100 * 1000000


def _q62_edges_py(SF_):
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_}/documents.parquet'"
    ).fetchall()
    nd = len(rows)
    sh = {d: _shingles_py(t) for d, t in rows}
    df = Counter()
    for ss in sh.values():
        df.update(ss)
    kept = {d: {g for g in ss if 10 * df[g] < nd} for d, ss in sh.items()}
    inv = defaultdict(list)
    for d, ss in kept.items():
        for g in ss:
            inv[g].append(d)
    shared = Counter()
    for g, ds in inv.items():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    return [p for p, c in shared.items() if c >= 3]


def test_syndication_matrix(spark):
    from watermark_remove_spark.queries import q435_syndication_matrix

    got = {
        (r["source_a"], r["source_b"]): tuple(r)
        for r in q435_syndication_matrix(spark, SF).collect()
    }

    src = dict(
        duckdb.sql(
            f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    mat = Counter()
    for a, b in _q62_edges_py(SF):
        sa, sb = sorted((src[a], src[b]))
        mat[(sa, sb)] += 1
    exp = {
        (a, b): (a, b, c, a != b) for (a, b), c in mat.items()
    }
    assert got == exp
    # syndication is real on this corpus: cross-source near-dup
    # flows exist alongside within-source duplication
    assert any(r[3] for r in got.values())
    assert any(not r[3] for r in got.values())


def test_decision_stump(spark):
    import math

    from watermark_remove_spark.queries import q436_decision_stump

    (row,) = q436_decision_stump(spark, SF).collect()

    agg = defaultdict(lambda: [0, 0])
    for uid, et in duckdb.sql(
        f"SELECT user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        a = agg[uid]
        if et == "purchase":
            a[1] += 1
        else:
            a[0] += 1
    users = sorted((uid, s, pc) for uid, (s, pc) in agg.items())
    n = len(users)
    med = sorted((pc, uid) for uid, _, pc in users)[(n + 1) // 2 - 1][0]
    lab = sorted(
        ((s, uid, 1 if pc > med else 0) for uid, s, pc in users)
    )
    pos = sum(y for _, _, y in lab)
    best = None
    pl = 0
    for i, (s, uid, y) in enumerate(lab):
        pl += y
        rk = i + 1
        if rk == n or lab[i + 1][0] == s:
            continue
        nl, nr = rk, n - rk
        pr = pos - pl
        cost = nr * (nl * nl - pl * pl - (nl - pl) ** 2) + nl * (
            nr * nr - pr * pr - (nr - pr) ** 2
        )
        key = (cost, s)
        if best is None or key < best[0]:
            best = (key, s, rk, pl, cost)
    _, thr, nl, pl, cost = best
    exp = (
        thr,
        nl,
        n - nl,
        pl,
        pos - pl,
        math.floor(
            1000000.0 * float(cost) / (float(n) * float(nl) * float(n - nl))
        ),
        math.floor(
            1000000.0
            * (
                1.0
                - (pos / n) * (pos / n)
                - (1.0 - pos / n) * (1.0 - pos / n)
            )
        ),
    )
    assert tuple(row) == exp
    # the split genuinely reduces impurity and both leaves are
    # populated
    assert row["gini_ppm"] < row["root_gini_ppm"]
    assert row["n_left"] > 0 and row["n_right"] > 0


def test_time_underwater(spark):
    from watermark_remove_spark.queries import q437_time_underwater

    (row,) = q437_time_underwater(spark, SF).collect()

    flows = Counter()
    for ts, et, val in duckdb.sql(
        f"SELECT ts, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        day = sec - sec % 86400
        if et == "purchase":
            flows[day] += int(round(val * 100))
        else:
            flows[day] -= int(round(val * 10))
    d0, d1 = min(flows), max(flows)
    eq = 0
    peak = None
    unders = []
    for d in range(d0, d1 + 1, 86400):
        under = False
        cur_peak = peak
        eq += flows.get(d, 0)
        if cur_peak is not None and eq < cur_peak:
            under = True
        peak = eq if peak is None else max(peak, eq)
        unders.append(under)
    n_days = len(unders)
    spells = []
    run = 0
    for u in unders:
        if u:
            run += 1
        elif run:
            spells.append(run)
            run = 0
    if run:
        spells.append(run)
    exp = (
        n_days,
        len(spells),
        max(spells) if spells else 0,
        sum(spells),
        sum(spells) * 1000000 // n_days,
    )
    assert tuple(row) == exp
    # the curve genuinely dips: underwater spells exist but the
    # series is not permanently submerged
    assert 0 < row["underwater_days"] < row["n_days"]
    assert row["longest_spell_days"] >= 1


def test_jarque_bera(spark):
    import math

    from watermark_remove_spark.queries import q438_jarque_bera

    got = {r["event_type"]: tuple(r) for r in q438_jarque_bera(spark, SF).collect()}

    mom = defaultdict(lambda: [0, 0, 0, 0, 0])
    for et, val in duckdb.sql(
        f"SELECT event_type, value FROM '{SF}/events.parquet'"
    ).fetchall():
        c = int(round(val * 100))
        m = mom[et]
        m[0] += 1
        m[1] += c
        m[2] += c * c
        m[3] += c**3
        m[4] += c**4
    exp = {}
    for et, (n, s1, s2, s3, s4) in mom.items():
        mean = s1 / n
        m2 = (s2 / n) - mean * mean
        m3 = (s3 / n) - 3.0 * mean * (s2 / n) + 2.0 * mean**3
        m4 = (
            (s4 / n)
            - 4.0 * mean * (s3 / n)
            + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean**4
        )
        skew = m3 / math.sqrt(m2 * m2 * m2)
        kurt = (m4 / (m2 * m2)) - 3.0
        jb = (n / 6.0) * (skew * skew + (kurt * kurt) / 4.0)
        exp[et] = (
            et,
            n,
            math.floor(1000.0 * skew),
            math.floor(1000.0 * kurt),
            math.floor(1000.0 * jb),
            jb >= 5.991,
        )
    assert got == exp
    # the value distribution is exponential-ish: right skew, heavy
    # tails, normality rejected on every stream
    for r in got.values():
        assert r[2] > 0 and r[3] > 0 and r[5]


def test_hash_spacings_audit(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q439_hash_spacings_audit

    (row,) = q439_hash_spacings_audit(spark, SF).collect()

    hs = sorted(
        md5_i64_py(f"sp#{d}")
        for (d,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    n = len(hs)
    r = hs[-1] - hs[0]
    gaps = sorted(b - a for a, b in zip(hs, hs[1:]))
    m = len(gaps)
    yard = r // (n + 1)
    ym = max(1, yard // 1000)
    exp = (
        n,
        yard,
        gaps[max(1, m * 50 // 100) - 1] // ym,
        gaps[max(1, m * 90 // 100) - 1] // ym,
        gaps[-1] // ym,
    )
    assert tuple(row) == exp
    # uniform-spacings fingerprints: the median gap sits near the
    # exponential ln 2 = 693 milli-yardsticks, p90 near ln 10, and
    # the profile is strictly increasing
    assert 500 < row["p50_milli"] < 900
    assert 1800 < row["p90_milli"] < 3200
    assert row["p50_milli"] < row["p90_milli"] < row["max_milli"]


def test_lorenz_asymmetry(spark):
    from watermark_remove_spark.queries import q440_lorenz_asymmetry

    got = {r["distribution"]: tuple(r) for r in q440_lorenz_asymmetry(spark, SF).collect()}

    chars = [
        nc
        for (nc,) in duckdb.sql(
            f"SELECT n_chars FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    purch = defaultdict(int)
    for u, v in duckdb.sql(
        f"""SELECT user_id, value FROM '{SF}/events.parquet'
            WHERE event_type = 'purchase'"""
    ).fetchall():
        purch[u] += int(round(v * 100))

    def lac(vals):
        n = len(vals)
        s = sum(vals)
        below = [v for v in vals if v * n < s]
        return (
            n,
            len(below),
            (len(below) * 1000) // n + (sum(below) * 1000) // s,
        )

    exp = {}
    n, nb, l = lac(chars)
    exp["doc_chars"] = ("doc_chars", n, nb, l)
    n, nb, l = lac(list(purch.values()))
    exp["user_purchase_cents"] = ("user_purchase_cents", n, nb, l)
    assert got == exp
    # the two distributions exhibit the two KINDS of inequality:
    # doc lengths are giant-driven (LAC < 1000), purchase mass is
    # dwarf-driven (LAC > 1000) on this corpus
    assert got["doc_chars"][3] < 1000
    assert got["user_purchase_cents"][3] > 1000


def test_greedy_bandit_replay(spark):
    import math

    from watermark_remove_spark.queries import q441_greedy_bandit_replay

    got = {r["policy"]: tuple(r) for r in q441_greedy_bandit_replay(spark, SF).collect()}

    cells = defaultdict(lambda: [0, 0])
    for ts, et, val in duckdb.sql(
        f"SELECT ts, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        c = cells[(sec - sec % 3600, et)]
        c[0] += 1
        c[1] += int(round(val * 100))
    hours = sorted({h for h, _ in cells})
    arms = sorted({a for _, a in cells})
    cn = {a: 0 for a in arms}
    cs = {a: 0 for a in arms}
    greedy = 0.0
    for h in hours:
        pick = min(
            arms,
            key=lambda a: (
                -(cs[a] / cn[a] if cn[a] else 0.0),
                a,
            ),
        )
        n, s_ = cells.get((h, pick), (0, 0))
        greedy += (s_ / n) if n else 0.0
        for a in arms:
            n, s_ = cells.get((h, a), (0, 0))
            cn[a] += n
            cs[a] += s_
    per_arm = {
        a: math.floor(
            sum(
                (cells[(h, a)][1] / cells[(h, a)][0])
                if (h, a) in cells and cells[(h, a)][0]
                else 0.0
                for h in hours
            )
            * 1000.0
        )
        for a in arms
    }
    best = max(per_arm.items(), key=lambda t: (t[1], [-ord(c) for c in t[0]]))
    uniform = math.floor(
        sum(
            (cells[(h, a)][1] / cells[(h, a)][0])
            if (h, a) in cells and cells[(h, a)][0]
            else 0.0
            for h in hours
            for a in arms
        )
        * 1000.0
        / 5.0
    )
    exp = {
        "greedy": ("greedy", len(hours), math.floor(greedy * 1000.0)),
        "best_fixed": (
            "best_fixed",
            len(hours),
            max(per_arm.values()),
        ),
        "uniform": ("uniform", len(hours), uniform),
    }
    assert got == exp
    # the textbook ordering on this replay: uniform < greedy <=
    # best-fixed (greedy pays only early exploration-free mistakes)
    assert got["uniform"][2] < got["greedy"][2] <= got["best_fixed"][2]


def test_working_set_curve(spark):
    from watermark_remove_spark.queries import q442_working_set_curve

    got = {r["width"]: tuple(r) for r in q442_working_set_curve(spark, SF).collect()}

    rows = [
        (int(ts.timestamp()), u)
        for ts, u in duckdb.sql(
            f"SELECT ts, user_id FROM '{SF}/events.parquet'"
        ).fetchall()
    ]
    exp = {}
    for tau, name in ((3600, "1h"), (21600, "6h"), (86400, "24h")):
        per = defaultdict(set)
        for sec, u in rows:
            per[sec - sec % tau].add(u)
        nw = len(per)
        sd = sum(len(v) for v in per.values())
        exp[name] = (
            name,
            tau,
            nw,
            sd * 1000 // nw,
            max(len(v) for v in per.values()),
        )
    assert got == exp
    # the working set grows with window width and the mean stays
    # below the peak
    assert (
        got["1h"][3] < got["6h"][3] < got["24h"][3]
    )
    for r in got.values():
        assert r[3] <= r[4] * 1000


def test_markov_removal_attribution(spark):
    import math
    from itertools import permutations

    from watermark_remove_spark.queries import (
        _Q411_STATES,
        q443_markov_removal_attribution,
    )

    got = {r["channel"]: tuple(r) for r in q443_markov_removal_attribution(spark, SF).collect()}

    by_user = defaultdict(list)
    for uid, ts, eid, et in duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        by_user[uid].append((ts, eid, et))
    idx = {s: i for i, s in enumerate(_Q411_STATES)}
    c = [[0] * 4 for _ in range(4)]
    p = [0] * 4
    r = [0] * 4
    w = [0] * 4
    for rows in by_user.values():
        rows.sort()
        if rows[0][2] != "purchase":
            w[idx[rows[0][2]]] += 1
        seq = [et for _, _, et in rows] + ["END"]
        for a, b in zip(seq, seq[1:]):
            if a == "purchase" or a == "END":
                continue
            r[idx[a]] += 1
            if b == "purchase":
                p[idx[a]] += 1
            elif b in idx:
                c[idx[a]][idx[b]] += 1

    def det(m):
        n = len(m)
        tot = 0
        for perm in permutations(range(n)):
            s = 1
            for i in range(n):
                for j in range(i + 1, n):
                    if perm[i] > perm[j]:
                        s = -s
            prod = 1
            for i in range(n):
                prod *= m[i][perm[i]]
            tot += s * prod
        return tot

    A = [
        [(r[i] if i == j else 0) - c[i][j] for j in range(4)]
        for i in range(4)
    ]

    def reach(keep):
        m = [[A[i][j] for j in keep] for i in keep]
        d = det(m)
        terms = 0.0
        for pos, i in enumerate(keep):
            mi = [
                [(p[rr] if jp == pos else A[rr][keep[jp]]) for jp in range(3 if len(keep) == 3 else 4)]
                for rr in keep
            ]
            terms = terms + float(w[i]) * (float(det(mi)) / float(d))
        wsum = float(w[0]) + float(w[1]) + float(w[2]) + float(w[3])
        return terms / wsum

    full = reach([0, 1, 2, 3])
    effects = {}
    for k, st in enumerate(_Q411_STATES):
        wo = reach([i for i in range(4) if i != k])
        effects[st] = (
            math.floor(1000000.0 * full),
            math.floor(1000000.0 * wo),
            math.floor(1000000.0 * (full - wo)),
        )
    te = sum(v[2] for v in effects.values())
    exp = {
        st: (st, *v, v[2] * 1000000 // max(1, te))
        for st, v in effects.items()
    }
    assert got == exp
    # removal always hurts reach, and the shares form a proper
    # attribution (each positive, summing to ~1e6)
    for v in got.values():
        assert v[3] > 0 and v[2] < v[1]
    share_sum = sum(v[4] for v in got.values())
    assert 999000 <= share_sum <= 1000000


def test_reserve_price_sweep(spark):
    from watermark_remove_spark.queries import q444_reserve_price_sweep

    got = {r["reserve_name"]: tuple(r) for r in q444_reserve_price_sweep(spark, SF).collect()}

    bids = defaultdict(list)
    allb = []
    for ts, val, eid in duckdb.sql(
        f"SELECT ts, value, event_id FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        c = int(round(val * 100))
        bids[sec - sec % 3600].append((c, eid))
        allb.append((c, eid))
    allb.sort()
    m = len(allb)
    reserves = {"none": 0}
    for pct in (25, 50, 75, 90):
        reserves[f"p{pct}"] = allb[max(1, m * pct // 100) - 1][0]
    top2 = []
    for w, bs in bids.items():
        bs.sort(key=lambda t: (-t[0], t[1]))
        top2.append(
            (bs[0][0], bs[1][0] if len(bs) >= 2 else 0)
        )
    rows = {}
    for name, res in reserves.items():
        rev = unsold = 0
        for b1, b2 in top2:
            if b1 < res:
                unsold += 1
            elif b2 < res:
                rev += res
            else:
                rev += b2
        rows[name] = (res, rev, unsold)
    best = max(rows.items(), key=lambda t: (t[1][1], -t[1][0]))[0]
    exp = {
        name: (name, res, rev, uns, name == best)
        for name, (res, rev, uns) in rows.items()
    }
    assert got == exp
    # a well-chosen reserve beats no reserve, and the extreme
    # reserve destroys revenue via unsold auctions
    assert got[best][2] > got["none"][2]
    assert got["p90"][3] > got["p25"][3] > 0
    assert sum(1 for r in got.values() if r[4]) == 1


def test_eager_agg_advisor(spark):
    from watermark_remove_spark.queries import q445_eager_agg_advisor

    rows = q445_eager_agg_advisor(spark, SF).collect()

    li = duckdb.sql(
        f"""SELECT l_orderkey, l_extendedprice, l_discount
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    n_li = len(li)
    n_keys = len({k for k, _, _ in li})
    assert len(rows) == 5
    for r in rows:
        # the rewrite is semantics-preserving and the flow saving is
        # the measured |L| -> |distinct keys| reduction
        assert r["plans_agree"]
        assert r["naive_join_rows"] == n_li
        assert r["pushed_join_rows"] == n_keys
        assert (
            r["flow_reduction_ppm"]
            == (n_li - n_keys) * 1000000 // n_li
            > 0
        )
    assert sum(r["n_lines"] for r in rows) == n_li


def test_insert_scatter_audit(spark):
    from watermark_remove_spark.queries import q446_insert_scatter_audit

    (row,) = q446_insert_scatter_audit(spark, SF).collect()

    orders = duckdb.sql(
        f"""SELECT o_custkey, o_orderkey, o_orderdate
            FROM '{SF}/orders.parquet'"""
    ).fetchall()
    cut = max(int(d.timestamp()) for _, _, d in orders) - 7 * 86400
    allrows = sorted(
        (ck, ok, int(d.timestamp()) > cut) for ck, ok, d in orders
    )
    nb = sum(1 for _, _, d in allrows if not d)
    pos = 0
    pages = set()
    tail = n_delta = 0
    for ck, ok, is_delta in allrows:
        if is_delta:
            n_delta += 1
            pages.add(pos // 256)
            if pos >= nb:
                tail += 1
        else:
            pos += 1
    base_pages = (nb + 255) // 256
    exp = (
        n_delta,
        nb,
        base_pages,
        len(pages),
        len(pages) * 1000000 // base_pages,
        tail,
    )
    assert tuple(row) == exp
    # the customer-clustered layout scatters the weekly delta across
    # most of the table — the point of the audit
    assert row["pages_touched"] > 1
    assert row["dirty_ppm"] > 500000


def test_partial_agg_advisor(spark):
    from watermark_remove_spark.queries import q447_partial_agg_advisor

    got = {r["grouping"]: tuple(r) for r in q447_partial_agg_advisor(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT event_id, user_id, event_type, ts FROM '{SF}/events.parquet'"
    ).fetchall()
    keysets = {
        "event_type": lambda eid, uid, et, ts: et,
        "user_id": lambda eid, uid, et, ts: str(uid),
        "user_day": lambda eid, uid, et, ts: f"{uid}/{int(ts.timestamp()) // 86400}",
    }
    exp = {}
    for name, kf in keysets.items():
        pairs = {(kf(*r), r[0] % 32) for r in rows}
        keys = {kf(*r) for r in rows}
        n = len(rows)
        exp[name] = (
            name,
            n,
            len(keys),
            len(pairs),
            (n - len(pairs)) * 1000000 // n,
        )
    assert got == exp
    # the combiner-benefit spectrum: coarse keys combine hard, fine
    # keys barely combine — the advisor's whole point
    assert (
        got["event_type"][4] > got["user_id"][4] > got["user_day"][4] >= 0
    )
    for r in got.values():
        assert r[2] <= r[3] <= r[1]


def test_watermark_skew_audit(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q448_watermark_skew_audit

    (row,) = q448_watermark_skew_audit(spark, SF).collect()

    pmax = {}
    for uid, ts in duckdb.sql(
        f"SELECT user_id, ts FROM '{SF}/events.parquet'"
    ).fetchall():
        p = md5_i64_py(f"wm#{uid}") % 32
        sec = int(ts.timestamp())
        pmax[p] = max(pmax.get(p, 0), sec)
    ordered = sorted((mx, p) for p, mx in pmax.items())
    np_ = len(pmax)
    g = max(mx for mx, _ in ordered)
    wm, straggler = ordered[0]
    p10 = ordered[max(1, np_ * 10 // 100) - 1][0]
    exp = (np_, g, wm, straggler, g - wm, g - p10)
    assert tuple(row) == exp
    # the straggler effect is real: the min-of-maxima watermark sits
    # well behind the freshest partition
    assert row["watermark_lag_s"] > 0
    assert row["watermark_lag_s"] >= row["p10_lag_s"] >= 0


def test_zipf_doubling_profile(spark):
    from watermark_remove_spark.queries import q449_zipf_doubling_profile

    got = {r["r"]: tuple(r) for r in q449_zipf_doubling_profile(spark, SF).collect()}

    cnt = Counter()
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall():
        for ln in text.split("\n"):
            toks = [t for t in ln.split(" ") if t]
            if not toks:
                continue
            if len(toks) <= 3:
                cnt[" ".join(toks)] += 1
            else:
                for i in range(len(toks) - 2):
                    cnt[" ".join(toks[i : i + 3])] += 1
    ranked = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))
    exp = {}
    for r in (1, 2, 4, 8, 16, 32):
        fr = ranked[r - 1][1]
        f2r = ranked[2 * r - 1][1]
        exp[r] = (r, fr, f2r, fr * 1000 // f2r)
    assert got == exp
    # rank-frequency is monotone and every doubling ratio is a
    # bounded, >= 1 factor (the law's log-free signature)
    for r in (1, 2, 4, 8, 16, 32):
        assert got[r][1] >= got[r][2]
        assert 1000 <= got[r][3] < 10000


def test_interrupted_time_series(spark):
    import math

    from watermark_remove_spark.queries import q450_interrupted_time_series

    (row,) = q450_interrupted_time_series(spark, SF).collect()

    obs = Counter()
    for (ts,) in duckdb.sql(
        f"SELECT ts FROM '{SF}/events.parquet'"
    ).fetchall():
        sec = int(ts.timestamp())
        obs[sec - sec % 86400] += 1
    d0, d1 = min(obs), max(obs)
    xs = [(d - d0) // 86400 for d in range(d0, d1 + 1, 86400)]
    ys = [obs.get(d0 + t * 86400, 0) for t in xs]
    t0 = ((d1 - d0) // 86400) // 2

    def ols(pts):
        n = len(pts)
        st = sum(t for t, _ in pts)
        sx = sum(x for _, x in pts)
        stx = sum(t * x for t, x in pts)
        stt = sum(t * t for t, _ in pts)
        m = float(n * stx - st * sx) / float(n * stt - st * st)
        b = (sx / n) - m * (st / n)
        return m, b

    a = [(t, x) for t, x in zip(xs, ys) if t < t0]
    bb = [(t, x) for t, x in zip(xs, ys) if t >= t0]
    ma, ba = ols(a)
    mb, bbv = ols(bb)
    exp = (
        t0,
        math.floor(1000.0 * ma),
        math.floor(1000.0 * mb),
        math.floor(1000.0 * ((bbv + mb * t0) - (ba + ma * t0))),
        math.floor(1000.0 * (mb - ma)),
    )
    assert tuple(row) == exp
    # sane bands: daily counts move by units, not orders of magnitude
    assert abs(row["pre_slope_milli"]) < 100000
    assert abs(row["level_change_milli"]) < 1000000


def test_join_state_forecast(spark):
    from watermark_remove_spark.queries import q451_join_state_forecast

    got = {r["horizon"]: tuple(r) for r in q451_join_state_forecast(spark, SF).collect()}

    secs = sorted(
        int(ts.timestamp())
        for (ts,) in duckdb.sql(
            f"SELECT ts FROM '{SF}/events.parquet'"
        ).fetchall()
    )
    exp = {}
    for h, name in ((3600, "1h"), (21600, "6h")):
        marks = Counter()
        for s_ in secs:
            marks[s_] += 1
            marks[s_ + h] -= 1
        ts_sorted = sorted(marks)
        cnt = 0
        peak = 0
        area = span = 0
        for t, nxt in zip(ts_sorted, ts_sorted[1:]):
            cnt += marks[t]
            peak = max(peak, cnt)
            dt = nxt - t
            area += cnt * dt
            span += dt
        exp[name] = (name, h, peak, area * 1000 // span)
    assert got == exp
    # more horizon, more state — on both axes — and the mean tracks
    # rate x horizon to within the bursty-arrival factor
    assert got["1h"][2] < got["6h"][2]
    assert got["1h"][3] < got["6h"][3]


def test_kpi_bridge(spark):
    import math

    from watermark_remove_spark.queries import q452_kpi_bridge

    (row,) = q452_kpi_bridge(spark, SF).collect()

    rows = duckdb.sql(
        f"SELECT ts, user_id, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    secs = [int(ts.timestamp()) for ts, _, _, _ in rows]
    mid = (min(secs) + max(secs)) // 2
    agg = {True: [set(), 0, 0], False: [set(), 0, 0]}
    for ts, uid, et, val in rows:
        h1 = int(ts.timestamp()) <= mid
        a = agg[h1]
        a[0].add(uid)
        if et == "purchase":
            a[1] += 1
            a[2] += int(round(val * 100))
    u1, p1, r1 = len(agg[True][0]), agg[True][1], agg[True][2]
    u2, p2, r2 = len(agg[False][0]), agg[False][1], agg[False][2]

    def rev(u, pu, rp):
        return u * pu * rp

    base = rev(u1, p1 / u1, r1 / p1)
    t = rev(u2, p1 / u1, r1 / p1)
    tf = rev(u2, p2 / u2, r1 / p1)
    tfb = rev(u2, p2 / u2, r2 / p2)
    exp = (
        u1,
        u2,
        p1,
        p2,
        r1,
        r2,
        math.floor(1000.0 * (t - base)),
        math.floor(1000.0 * (tf - t)),
        math.floor(1000.0 * (tfb - tf)),
        (r2 - r1) * 1000,
    )
    assert tuple(row) == exp
    # telescoping: the three contributions reconstruct the revenue
    # delta up to floor residue (< 3 milli-cents)
    recon = (
        row["traffic_contrib_milli"]
        + row["frequency_contrib_milli"]
        + row["basket_contrib_milli"]
    )
    assert abs(recon - row["delta_rev_milli"]) <= 3


def test_sortedness_runs_audit(spark):
    from watermark_remove_spark.queries import q453_sortedness_runs_audit

    got = {r["ordering"]: tuple(r) for r in q453_sortedness_runs_audit(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT ts, event_id, user_id, value FROM '{SF}/events.parquet'"
    ).fetchall()

    def runs(seq):
        c = 0
        prev = None
        for v in seq:
            if prev is None or v < prev:
                c += 1
            prev = v
        return c

    arrival = sorted(rows, key=lambda r: (r[0], r[1]))
    byuser = sorted(rows, key=lambda r: (r[2], r[0], r[1]))
    n = len(rows)
    exp = {
        "value_by_arrival": runs([int(round(r[3] * 100)) for r in arrival]),
        "user_by_arrival": runs([r[2] for r in arrival]),
        "ts_by_user_blocks": runs(
            [int(r[0].timestamp()) for r in byuser]
        ),
    }
    exp = {
        k: (k, n, v, v * 3000000 // (2 * n + 1)) for k, v in exp.items()
    }
    assert got == exp
    # grouped-by-user timestamps are nearly sorted; arrival-order
    # values are essentially random
    assert got["ts_by_user_blocks"][3] < 100000
    assert got["value_by_arrival"][3] > 500000


def test_rle_layout_sensitivity(spark):
    from watermark_remove_spark.queries import q454_rle_layout_sensitivity

    got = {r["ordering"]: tuple(r) for r in q454_rle_layout_sensitivity(spark, SF).collect()}

    rows = duckdb.sql(
        f"SELECT ts, event_id, user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall()

    def runs(seq):
        c = 0
        prev = None
        for v in seq:
            if prev is None or v != prev:
                c += 1
            prev = v
        return c

    n = len(rows)
    orders = {
        "arrival": sorted(rows, key=lambda r: (r[0], r[1])),
        "by_user": sorted(rows, key=lambda r: (r[2], r[0], r[1])),
        "by_type": sorted(rows, key=lambda r: (r[3], r[0], r[1])),
    }
    exp = {}
    for name, seq in orders.items():
        rr = runs([r[3] for r in seq])
        exp[name] = (name, n, rr, rr * 5 * 1000000 // n)
    assert got == exp
    # the layout swing: type-sorted RLE is tiny, unsorted RLE is
    # WORSE than plain — the decision the audit exists to inform
    assert got["by_type"][3] < 100000
    assert got["arrival"][3] > 1000000


def test_peeking_audit(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q455_peeking_audit

    (row,) = q455_peeking_audit(spark, SF).collect()

    daily = defaultdict(lambda: [0, 0, 0, 0])  # na, a, nb, b per day
    for ts, uid, et in duckdb.sql(
        f"SELECT ts, user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        d = int(ts.timestamp()) // 86400
        arm = md5_i64_py(f"peek#{uid}") % 2
        rec = daily[d]
        if arm == 0:
            rec[0] += 1
            rec[1] += 1 if et == "purchase" else 0
        else:
            rec[2] += 1
            rec[3] += 1 if et == "purchase" else 0
    na = a = nb = b = 0
    looks = naive = bonf = 0
    first = -1
    for d in sorted(daily):
        rec = daily[d]
        na += rec[0]
        a += rec[1]
        nb += rec[2]
        b += rec[3]
        # a look requires BOTH arms active on day d (the SQL's
        # cum rows exist only on an arm's active days)
        if rec[0] == 0 or rec[2] == 0:
            continue
        if a + b == 0 or a + b == na + nb:
            continue
        looks += 1
        lhs = (na + nb) * (a * nb - b * na) ** 2
        rhs = na * nb * (a + b) * (na + nb - a - b)
        if 1000 * lhs >= 3841 * rhs:
            naive += 1
            if first == -1:
                first = d
        if 1000 * lhs >= 11070 * rhs:
            bonf += 1
    assert tuple(row) == (looks, naive, bonf, first)
    # a proper negative control: the corrected threshold never fires
    # more than the naive one, looks cover the span
    assert row["bonferroni_crossings"] <= row["naive_crossings"]
    assert row["n_looks"] >= 20


def test_disorder_profile(spark):
    from watermark_remove_spark.queries import q456_disorder_profile

    (row,) = q456_disorder_profile(spark, SF).collect()

    rows = sorted(
        duckdb.sql(
            f"SELECT o_orderkey, o_orderdate FROM '{SF}/orders.parquet'"
        ).fetchall()
    )
    lates = []
    mx = None
    for _, d in rows:
        sec = int(d.timestamp())
        lates.append(max(0, (mx if mx is not None else sec) - sec))
        mx = sec if mx is None else max(mx, sec)
    n = len(lates)
    in_order = sum(1 for l in lates if l == 0)
    pos = [l for l in lates if l > 0]
    pos_sorted = sorted(pos)
    m = len(pos)
    exp = (
        n,
        in_order * 1000000 // n,
        pos_sorted[max(1, m * 50 // 100) - 1],
        pos_sorted[max(1, m * 90 // 100) - 1],
        pos_sorted[max(1, m * 99 // 100) - 1],
        max(lates),
    )
    assert tuple(row) == exp
    # the CDC shape: almost everything is late, by a lot
    assert row["in_order_ppm"] < 100000
    assert row["p50_late_s"] > 86400
    assert row["p50_late_s"] <= row["p90_late_s"] <= row["p99_late_s"] <= row["max_late_s"]


def test_fanout_tail_audit(spark):
    from watermark_remove_spark.queries import q457_fanout_tail_audit

    got = {r["k"]: tuple(r) for r in q457_fanout_tail_audit(spark, SF).collect()}

    by_type = defaultdict(list)
    for et, eid, val in duckdb.sql(
        f"SELECT event_type, event_id, value FROM '{SF}/events.parquet'"
    ).fetchall():
        by_type[et].append((eid, int(round(val * 100))))
    exp = {}
    for k in (1, 2, 4, 8, 16):
        maxima = []
        for vals in by_type.values():
            vals.sort()
            seq = [c for _, c in vals]
            for i in range(0, len(seq) - len(seq) % k, k):
                maxima.append(max(seq[i : i + k]))
        nb = len(maxima)
        exp[k] = (k, nb, sum(maxima) * 1000 // nb)
    base = exp[1][2]
    exp = {
        k: (*v, v[2] * 1000 // base) for k, v in exp.items()
    }
    assert got == exp
    # the tail at scale: mean-of-max strictly climbs with fan-out
    amps = [got[k][3] for k in (1, 2, 4, 8, 16)]
    assert amps == sorted(amps) and amps[0] == 1000 and amps[-1] > 1500


def test_agg_tree_advisor(spark):
    from math import ceil

    from watermark_remove_spark.queries import q458_agg_tree_advisor

    got = {r["f"]: tuple(r) for r in q458_agg_tree_advisor(spark, SF).collect()}

    vol = sum(
        len(t.encode("utf-8"))
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    n = (vol + 65535) // 65536
    exp = {}
    for f in (2, 4, 8, 16, 32):
        depth = next(l for l in range(1, 33) if f**l >= n)
        msgs = sum(ceil(n / f**i) for i in range(1, depth + 1))
        exp[f] = (f, n, depth, msgs, ceil(n / f))
    assert got == exp
    # the latency/width trade: depth falls, level-1 width rises...
    depths = [got[f][2] for f in (2, 4, 8, 16, 32)]
    assert depths == sorted(depths, reverse=True)
    assert got[2][3] >= got[32][3]


def test_equivalence_tost(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import q459_equivalence_tost

    (row,) = q459_equivalence_tost(spark, SF).collect()

    ud = {}
    for ts, uid, et in duckdb.sql(
        f"SELECT ts, user_id, event_type FROM '{SF}/events.parquet'"
    ).fetchall():
        key = (int(ts.timestamp()) // 86400, uid)
        ud[key] = max(ud.get(key, 0), 1 if et == "purchase" else 0)
    na = a = nb = b = 0
    for (d, uid), y in ud.items():
        if md5_i64_py(f"tost#{uid}") % 2 == 0:
            na += 1
            a += y
        else:
            nb += 1
            b += y
    dd = 100 * (a * nb - b * na) + na * nb
    d2 = na * nb - 100 * (a * nb - b * na)
    pq = 10000 * na * nb * (a + b) * (na + nb - a - b)
    t1 = dd > 0 and 1000 * (na + nb) * dd * dd >= 2706 * pq
    t2 = d2 > 0 and 1000 * (na + nb) * d2 * d2 >= 2706 * pq
    exp = (
        na,
        a,
        nb,
        b,
        a * 1000000 // na,
        b * 1000000 // nb,
        t1,
        t2,
        t1 and t2,
    )
    assert tuple(row) == exp
    # logical consistency: equivalence iff both one-sided bounds hold
    assert row["equivalent"] == (
        row["lower_bound_holds"] and row["upper_bound_holds"]
    )


def test_dedup_roi_ranking(spark):
    from watermark_remove_spark.queries import q460_dedup_roi_ranking

    got = {r["source"]: tuple(r) for r in q460_dedup_roi_ranking(spark, SF).collect()}

    src = dict(
        duckdb.sql(
            f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    within = Counter()
    for x, y in _q62_edges_py(SF):
        if src[x] == src[y]:
            within[src[x]] += 1
    size = defaultdict(int)
    for s_, t in duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        size[s_] += len(t.encode("utf-8"))
    scored = {
        s_: (
            size[s_],
            within.get(s_, 0),
            within.get(s_, 0) * 1048576 * 1000 // size[s_],
        )
        for s_ in size
    }
    order = sorted(scored.items(), key=lambda t: (-t[1][2], t[0]))
    exp = {
        s_: (s_, by, dp, roi, i + 1)
        for i, (s_, (by, dp, roi)) in enumerate(order)
    }
    assert got == exp
    # the ranking discriminates: the top source genuinely out-earns
    # the bottom per megabyte
    top = min(got.values(), key=lambda r: r[4])
    bot = max(got.values(), key=lambda r: r[4])
    assert top[3] > bot[3]


def test_nbu_aging_test(spark):
    import math

    from watermark_remove_spark.queries import q461_nbu_aging_test

    got = {(r["a"], r["b"]): tuple(r) for r in q461_nbu_aging_test(spark, SF).collect()}

    by_user = defaultdict(list)
    for uid, ts, eid in duckdb.sql(
        f"""SELECT user_id, ts, event_id FROM '{SF}/events.parquet'
            WHERE event_type = 'purchase'"""
    ).fetchall():
        by_user[uid].append((int(ts.timestamp()), eid))
    gaps = []
    for rows in by_user.values():
        rows.sort()
        gaps.extend(b[0] - a[0] for a, b in zip(rows, rows[1:]))
    n = len(gaps)
    gs = sorted(gaps)
    qa = gs[max(1, n * 25 // 100) - 1]
    qb = gs[max(1, n * 50 // 100) - 1]
    exp = {}
    for a, b in {(qa, qa), (qa, qb), (qb, qb)}:
        sa = sum(1 for g in gaps if g > a)
        sb = sum(1 for g in gaps if g > b)
        sab = sum(1 for g in gaps if g > a + b)
        exp[(a, b)] = (
            a,
            b,
            n,
            sa,
            sb,
            sab,
            sab * n <= sa * sb,
            math.floor(
                1000000.0 * (float(sab) * float(n)) / (float(sa) * float(sb))
            ),
        )
    assert got == exp
    # the purchase process CLUMPS on this corpus (NWU side of
    # memoryless) — consistent with q389's positive gap correlation
    for r in got.values():
        assert r[7] > 1000000 and not r[6]


def test_watermark_completeness_curve(spark):
    from watermark_remove_spark.queries import q462_watermark_completeness_curve

    got = {r["delay_days"]: tuple(r) for r in q462_watermark_completeness_curve(spark, SF).collect()}

    rows = sorted(
        duckdb.sql(
            f"SELECT o_orderkey, o_orderdate FROM '{SF}/orders.parquet'"
        ).fetchall()
    )
    lates = []
    secs = []
    mx = None
    for _, d in rows:
        sec = int(d.timestamp())
        secs.append(sec)
        lates.append(max(0, (mx if mx is not None else sec) - sec))
        mx = sec if mx is None else max(mx, sec)
    n = len(lates)
    span = (max(secs) - min(secs)) // 86400
    exp = {}
    for d in (1, 7, 30, 90):
        ok = sum(1 for l in lates if l <= d * 86400)
        exp[d] = (d, n, ok, ok * 1000000 // n, d * n // max(1, span))
    assert got == exp
    # the curve is monotone and the verdict is stark: key-ordered CDC
    # ingest defeats even a 90-day watermark
    comp = [got[d][3] for d in (1, 7, 30, 90)]
    assert comp == sorted(comp)
    assert got[90][3] < 500000


def test_backlog_capacity_sweep(spark):
    from watermark_remove_spark.queries import q463_backlog_capacity_sweep

    got = {r["cap_name"]: tuple(r) for r in q463_backlog_capacity_sweep(spark, SF).collect()}

    obs = Counter()
    for (d,) in duckdb.sql(
        f"SELECT o_orderdate FROM '{SF}/orders.parquet'"
    ).fetchall():
        sec = int(d.timestamp())
        obs[sec - sec % 86400] += 1
    d0, d1 = min(obs), max(obs)
    days = list(range(d0, d1 + 1, 86400))
    arr = [obs.get(d, 0) for d in days]
    n = len(arr)
    ranked = sorted(zip(arr, days))
    exp = {}
    for p, name in ((50, "p50"), (75, "p75"), (90, "p90")):
        c = ranked[max(1, n * p // 100) - 1][0]
        b = 0
        peak = tot = bdays = 0
        for a in arr:
            b = max(0, b + a - c)
            peak = max(peak, b)
            tot += b
            bdays += 1 if b > 0 else 0
        exp[name] = (name, c, peak, tot, bdays)
    assert got == exp
    # the staffing curve: higher capacity, strictly less pain
    assert (
        got["p50"][3] > got["p75"][3] > got["p90"][3] >= 0
    )


def test_fingerprint_collision_audit(spark):
    from watermark_remove_spark.queries import q464_fingerprint_collision_audit

    (row,) = q464_fingerprint_collision_audit(spark, SF).collect()

    import hashlib

    def fingerprint(text):
        toks = [t for t in text.split(" ") if t]
        if len(toks) == 0:
            grams = []
        elif len(toks) <= 5:
            grams = [" ".join(toks)]
        else:
            grams = [
                " ".join(toks[i : i + 5]) for i in range(len(toks) - 4)
            ]
        return min(
            hashlib.md5(g.encode("utf-8")).hexdigest() for g in grams
        )

    groups = defaultdict(list)
    for (t,) in duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall():
        groups[fingerprint(t)].append(t)
    n_docs = sum(len(v) for v in groups.values())
    multi = sum(1 for v in groups.values() if len(v) > 1)
    collide_groups = [
        v for v in groups.values() if len(set(v)) > 1
    ]
    colliding = sum(len(v) for v in collide_groups)
    exp = (
        n_docs,
        len(groups),
        multi,
        len(collide_groups),
        colliding,
        colliding * 1000000 // n_docs,
        max(len(v) for v in groups.values()),
    )
    assert tuple(row) == exp
    # the false-merge risk is measurable on this corpus: real
    # collisions exist but stay a small minority
    assert 0 < row["colliding_ppm"] < 500000
    assert row["true_collision_groups"] <= row["multi_doc_groups"]
