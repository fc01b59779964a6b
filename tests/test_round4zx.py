"""Backfill pytest coverage for the late-round-4 statistics / TPC-H /
state-machine batches q255-q269 (each already oracle-checked via
tools/selfcheck.py; these tests add INDEPENDENT Python replays plus
non-vacuity assertions, the discipline the earlier batches carry).

Properties proven: Mann-Whitney U identities (U1+U2 = n1*n2, live tie
mass); Spearman rho from midrank moments; Gini gain replayed per
feature; association-rule confidence/lift algebra on the full pair
set; ACF from the centered daily series; leave-one-out encoding
algebra; KS gap extremum; Naive Bayes smoothed likelihood grid;
TPC-H Q9/Q15/Q16 join-shape replays; CRDT G-counter dominance + LWW
pick; NDCG against hand-stacked ideal; event-sourcing last-SET fold;
weighted-quartile cumulative picks.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict
from datetime import datetime, timedelta
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"

EPOCH = datetime(1970, 1, 1)


def _us(ts):
    return (ts - EPOCH) // timedelta(microseconds=1)


def _tdiv(a, b):
    """Truncating integer division — Spark `div` / DuckDB `//`
    semantics (Python // floors, which differs on negatives)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _d2(x):
    return Decimal(f"{x:.2f}")


def test_mann_whitney(spark):
    from watermark_remove_spark.queries import q255_mann_whitney

    (row,) = q255_mann_whitney(spark, SF).collect()

    per_v = defaultdict(lambda: [0, 0])
    for q, fl in duckdb.sql(
        f"""SELECT l_quantity, l_returnflag FROM '{SF}/lineitem.parquet'
            WHERE l_returnflag IN ('R', 'A')"""
    ).fetchall():
        per_v[int(q)][0 if fl == "R" else 1] += 1
    n1 = sum(c[0] for c in per_v.values())
    n2 = sum(c[1] for c in per_v.values())
    u1_x2 = 0
    cum2 = 0
    tie = 0
    for v in sorted(per_v):
        n1_v, n2_v = per_v[v]
        u1_x2 += n1_v * (2 * cum2 + n2_v)
        cum2 += n2_v
        t = n1_v + n2_v
        tie += t * t * t - t
    assert tuple(row) == (n1, n2, u1_x2, 2 * n1 * n2 - u1_x2, tie)
    assert row.u1_x2 + row.u2_x2 == 2 * n1 * n2
    assert tie > 0  # shared quantity values really exist


def test_spearman(spark):
    from watermark_remove_spark.queries import q256_spearman_correlation

    (row,) = q256_spearman_correlation(spark, SF).collect()

    cells = Counter()
    for q, d in duckdb.sql(
        f"SELECT l_quantity, l_discount FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        cells[(int(q), int(d * 100))] += 1

    def midranks(idx):
        cnt = Counter()
        for k, c in cells.items():
            cnt[k[idx]] += c
        r2, cum = {}, 0
        for v in sorted(cnt):
            r2[v] = 2 * cum + cnt[v] + 1
            cum += cnt[v]
        return r2

    rx2, ry2 = midranks(0), midranks(1)
    n = sx = sy = sxx = syy = sxy = 0
    for (x, y), c in cells.items():
        n += c
        sx += c * rx2[x]
        sy += c * ry2[y]
        sxx += c * rx2[x] * rx2[x]
        syy += c * ry2[y] * ry2[y]
        sxy += c * rx2[x] * ry2[y]
    import math

    rho_ppm = math.floor(
        1000000.0
        * float(n * sxy - sx * sy)
        / math.sqrt(float(n * sxx - sx * sx) * float(n * syy - sy * sy))
    )
    assert tuple(row) == (n, rho_ppm)
    assert -1000000 <= rho_ppm <= 1000000


def test_gini_gain(spark):
    from watermark_remove_spark.queries import q257_gini_gain_features

    got = {r["feature"]: tuple(r) for r in q257_gini_gain_features(spark, SF).collect()}
    assert len(got) == 3

    rows = duckdb.sql(
        f"SELECT lang, n_chars, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    feats = defaultdict(Counter)  # feature -> (value, lang) -> n
    for lang, n_chars, text in rows:
        feats["len_bucket"][(min(n_chars // 400, 4), lang)] += 1
        feats["has_digit"][(int(bool(re.search("[0-9]", text))), lang)] += 1
        feats["has_sentence_punct"][(int("!" in text or "?" in text), lang)] += 1

    for feature, vc in feats.items():
        per_v = defaultdict(lambda: [0, 0])  # value -> [sum n_vc^2, n_v]
        per_c = Counter()
        for (value, lang), c in vc.items():
            per_v[value][0] += c * c
            per_v[value][1] += c
            per_c[lang] += c
        child = sum((100000000 * sv) // nv for sv, nv in per_v.values())
        n = sum(nv for _, nv in per_v.values())
        p = sum(c * c for c in per_c.values())
        gain_ppb = (10 * (child - (100000000 * p) // n)) // n
        assert got[feature] == (feature, n, gain_ppb)
        assert gain_ppb >= 0  # splitting can't un-purify under Gini


def test_association_rules(spark):
    from watermark_remove_spark.queries import q258_association_rules

    got = [tuple(r) for r in q258_association_rules(spark, SF).collect()]

    items = set(
        duckdb.sql(
            f"""SELECT DISTINCT l_orderkey, p_brand
                FROM '{SF}/lineitem.parquet' l
                JOIN '{SF}/part.parquet' p ON l.l_partkey = p.p_partkey"""
        ).fetchall()
    )
    marg = Counter(b for _, b in items)
    by_basket = defaultdict(list)
    for o, b in items:
        by_basket[o].append(b)
    n_total = len(by_basket)
    pairs = Counter()
    for brands in by_basket.values():
        for a in brands:
            for b in brands:
                if a != b:
                    pairs[(a, b)] += 1
    exp = []
    for (a, b), n_ab in pairs.items():
        if n_ab >= 5:
            exp.append(
                (
                    a, b, n_ab,
                    (1000000 * n_ab) // marg[a],
                    (1000 * n_ab * n_total) // (marg[a] * marg[b]),
                )
            )
    exp.sort(key=lambda t: (-t[4], -t[2], t[0], t[1]))
    assert got == exp[:40]
    # pair counts are symmetric by construction
    assert all(pairs[(b, a)] == n for (a, b), n in pairs.items())


def test_autocorrelation(spark):
    from watermark_remove_spark.queries import q259_autocorrelation

    got = {r["lag"]: r["acf_ppm"] for r in q259_autocorrelation(spark, SF).collect()}
    assert sorted(got) == list(range(1, 8))

    daily = dict(
        duckdb.sql(
            f"""SELECT date_trunc('day', o_orderdate) AS d, count(*)
                FROM '{SF}/orders.parquet' GROUP BY 1"""
        ).fetchall()
    )
    n, s = len(daily), sum(daily.values())
    r = {d: n * x - s for d, x in daily.items()}
    den = sum(v * v for v in r.values())
    for lag in range(1, 8):
        num = sum(
            v * r[d - timedelta(days=lag)]
            for d, v in r.items()
            if d - timedelta(days=lag) in r
        )
        assert got[lag] == _tdiv(1000000 * num, den)
    assert den > 0
    # at least one lag is genuinely negative (trunc-vs-floor is live)
    assert any(v < 0 for v in got.values())


def test_target_encoding(spark):
    from watermark_remove_spark.queries import q260_target_encoding

    got = [tuple(r) for r in q260_target_encoding(spark, SF).collect()]

    rows = duckdb.sql(
        f"""SELECT c_mktsegment, CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
            FROM '{SF}/orders.parquet' o
            JOIN '{SF}/customer.parquet' c ON o.o_custkey = c.c_custkey"""
    ).fetchall()
    stats = defaultdict(lambda: [0, 0])
    for seg, y in rows:
        stats[seg][0] += y
        stats[seg][1] += 1
    combo = Counter()
    for seg, y in rows:
        s, n = stats[seg]
        combo[(seg, y, (1000000 * (s - y)) // (n - 1), s, n)] += 1
    exp = sorted(
        ((seg, y, loo, s, n, c) for (seg, y, loo, s, n), c in combo.items()),
        key=lambda t: (t[0], t[1]),
    )
    assert got == exp
    # leave-one-out really shifts the encoding between y=0 and y=1 rows
    segs = {t[0] for t in exp}
    assert any(
        len({t[2] for t in exp if t[0] == seg}) == 2 for seg in segs
    )


def test_ks_two_sample(spark):
    from watermark_remove_spark.queries import q261_ks_two_sample

    (row,) = q261_ks_two_sample(spark, SF).collect()

    per_v = defaultdict(lambda: [0, 0])
    for d, st in duckdb.sql(
        f"""SELECT l_discount, l_linestatus FROM '{SF}/lineitem.parquet'
            WHERE l_linestatus IN ('F', 'O')"""
    ).fetchall():
        per_v[int(d * 100)][0 if st == "F" else 1] += 1
    n1 = sum(c[0] for c in per_v.values())
    n2 = sum(c[1] for c in per_v.values())
    cum1 = cum2 = 0
    best, arg = -1, None
    for v in sorted(per_v):
        cum1 += per_v[v][0]
        cum2 += per_v[v][1]
        gap = abs(n2 * cum1 - n1 * cum2)
        if gap > best:
            best, arg = gap, v
    assert tuple(row) == (n1, n2, best, arg)
    assert 0 < best <= n1 * n2  # D in (0, 1] scaled by n1*n2


def test_naive_bayes_model(spark):
    from watermark_remove_spark.queries import q262_naive_bayes_model

    got = [tuple(r) for r in q262_naive_bayes_model(spark, SF).collect()]

    docs = duckdb.sql(
        f"SELECT lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    tc = Counter()
    priors = Counter()
    for lang, text in docs:
        priors[lang] += 1
        for t in text.split(" "):
            if t:
                tc[(lang, t)] += 1
    class_tot = Counter()
    tok_tot = Counter()
    for (lang, t), c in tc.items():
        class_tot[lang] += c
        tok_tot[t] += c
    v = len(tok_tot)
    docs_total = sum(priors.values())
    top = sorted(tok_tot.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    exp = sorted(
        (
            (
                lang,
                tok,
                tc.get((lang, tok), 0),
                (1000000000 * (tc.get((lang, tok), 0) + 1)) // (class_tot[lang] + v),
                class_tot[lang],
                (1000000 * priors[lang]) // docs_total,
            )
            for tok, _ in top
            for lang in class_tot
        ),
        key=lambda t: (t[0], t[1]),
    )
    assert got == exp
    # Laplace smoothing is live: every likelihood is strictly positive,
    # and the grid is dense (every top token scored for every class)
    assert all(t[3] > 0 for t in got)
    assert len(got) == 20 * len(class_tot)


def test_nation_profit(spark):
    from watermark_remove_spark.queries import q263_nation_profit

    got = [tuple(r) for r in q263_nation_profit(spark, SF).collect()]

    rows = duckdb.sql(
        f"""SELECT n.n_name, year(o.o_orderdate),
                   l.l_extendedprice, l.l_discount, l.l_quantity,
                   p.p_retailprice
            FROM '{SF}/lineitem.parquet' l
            JOIN '{SF}/part.parquet' p ON l.l_partkey = p.p_partkey
            JOIN '{SF}/supplier.parquet' s ON l.l_suppkey = s.s_suppkey
            JOIN '{SF}/nation.parquet' n ON s.s_nationkey = n.n_nationkey
            JOIN '{SF}/orders.parquet' o ON l.l_orderkey = o.o_orderkey
            WHERE regexp_matches(p.p_name, 'green|blue|red')"""
    ).fetchall()
    agg = defaultdict(lambda: [Decimal(0), 0])
    for nation, yr, ep, disc, qty, retail in rows:
        amount = _d2(ep) * (1 - _d2(disc)) - Decimal("0.60") * _d2(retail) * _d2(qty)
        a = agg[(nation, yr)]
        a[0] += amount
        a[1] += 1
    exp = sorted(
        ((nat, yr, float(tot), n) for (nat, yr), (tot, n) in agg.items()),
        key=lambda t: (t[0], -t[1]),
    )
    assert got == exp
    assert len({t[0] for t in got}) > 5  # many nations live


def test_top_supplier(spark):
    from watermark_remove_spark.queries import q264_top_supplier

    got = [tuple(r) for r in q264_top_supplier(spark, SF).collect()]

    rev = defaultdict(Decimal)
    for sk, ep, disc in duckdb.sql(
        f"""SELECT l_suppkey, l_extendedprice, l_discount
            FROM '{SF}/lineitem.parquet'
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1996-04-01'"""
    ).fetchall():
        rev[sk] += (_d2(ep) * (1 - _d2(disc))).quantize(Decimal("0.0001"))
    mx = max(rev.values())
    names = dict(
        duckdb.sql(
            f"SELECT s_suppkey, s_name FROM '{SF}/supplier.parquet'"
        ).fetchall()
    )
    exp = sorted(
        (sk, names[sk], float(r)) for sk, r in rev.items() if r == mx
    )
    assert got == exp
    assert len(got) >= 1 and len(rev) > len(got)  # a real argmax happened


def test_crdt_merge(spark):
    from watermark_remove_spark.queries import q265_crdt_merge

    got = {r["key"]: tuple(r) for r in q265_crdt_merge(spark, SF).collect()}

    ev = duckdb.sql(
        f"""SELECT user_id, event_id, ts, event_type
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    slots = defaultdict(lambda: [0, 0])
    latest = {}
    for uid, eid, ts, et in ev:
        s = slots[(uid, eid % 5)]
        if eid % 2 == 0:
            s[0] += 1
        else:
            s[1] += 1
        k = (_us(ts), eid)
        if uid not in latest or k > latest[uid][0]:
            latest[uid] = (k, et)
    per_user = defaultdict(lambda: [0, 0, 0])
    for (uid, _), (a, b) in slots.items():
        pu = per_user[uid]
        pu[0] += max(a, b)
        pu[1] += a
        pu[2] += b
    for uid, (m, a, b) in per_user.items():
        (us_, _eid), et = latest[uid]
        assert got[uid] == (uid, m, a, b, et, us_)
        # G-counter merge dominates both replicas (CRDT join axiom)
        assert m >= a and m >= b
    assert len(got) == len(per_user)


def test_ndcg(spark):
    from watermark_remove_spark.queries import q266_ndcg_ranking_quality

    got = {r["user_id"]: tuple(r) for r in q266_ndcg_ranking_quality(spark, SF).collect()}

    ev = duckdb.sql(
        f"""SELECT user_id, event_type, ts, value
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    all_us = [_us(ts) for _, _, ts, _ in ev]
    t0, t1 = min(all_us), max(all_us)
    train = Counter()
    truth = defaultdict(set)
    for uid, et, ts, val in ev:
        if 2 * _us(ts) < t0 + t1:
            train[(uid, et)] += 1
        elif val >= 50:
            truth[uid].add(et)
    wts = [1000000, 630929, 500000, 430676, 386852]
    cumw = [1000000, 1630929, 2130929, 2561605, 2948457]
    by_user = defaultdict(list)
    for (uid, et), c in train.items():
        by_user[uid].append((-c, et))
    exp = {}
    for uid, rel in truth.items():
        ranked = [et for _, et in sorted(by_user.get(uid, []))[:5]]
        dcg = sum(w for r, w in zip(ranked, wts) if r in rel)
        idcg = cumw[min(len(rel), 5) - 1]
        if uid in by_user:
            exp[uid] = (uid, dcg, idcg, (1000000 * dcg) // idcg)
    assert got == exp
    vals = [t[3] for t in got.values()]
    assert any(v == 1000000 for v in vals) and any(v < 1000000 for v in vals)


def test_supplier_relationship(spark):
    from watermark_remove_spark.queries import q267_supplier_relationship

    got = [tuple(r) for r in q267_supplier_relationship(spark, SF).collect()]

    bad = {
        sk
        for (sk,) in duckdb.sql(
            f"SELECT s_suppkey FROM '{SF}/supplier.parquet' WHERE s_acctbal < 0"
        ).fetchall()
    }
    parts = {
        pk: (b, sz)
        for pk, b, sz in duckdb.sql(
            f"""SELECT p_partkey, p_brand, p_size FROM '{SF}/part.parquet'
                WHERE p_brand <> 'Brand#45'"""
        ).fetchall()
    }
    sups = defaultdict(set)
    for pk, sk in duckdb.sql(
        f"SELECT DISTINCT l_partkey, l_suppkey FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        if sk not in bad and pk in parts:
            sups[parts[pk]].add(sk)
    exp = sorted(
        ((b, sz, len(s)) for (b, sz), s in sups.items()),
        key=lambda t: (-t[2], t[0], t[1]),
    )[:50]
    assert got == exp
    # ranked output really is count-descending with the pinned tie-break
    assert got == sorted(got, key=lambda t: (-t[2], t[0], t[1]))
    assert got[0][2] > 1  # multi-supplier groups exist


def test_ledger_replay(spark):
    from watermark_remove_spark.queries import q268_ledger_replay

    got = {r["user_id"]: tuple(r) for r in q268_ledger_replay(spark, SF).collect()}

    ev = duckdb.sql(
        f"""SELECT user_id, event_type, value, ts, event_id
            FROM '{SF}/events.parquet'
            WHERE event_type IN ('signup', 'purchase')"""
    ).fetchall()
    last_set = {}
    for uid, et, val, ts, eid in ev:
        if et == "signup":
            k = (_us(ts), eid)
            if uid not in last_set or k > last_set[uid][0]:
                last_set[uid] = (k, int(_d2(val) * 100))
    folded = defaultdict(lambda: [0, 0])
    for uid, et, val, ts, eid in ev:
        if et == "purchase":
            k = (_us(ts), eid)
            if uid not in last_set or k > last_set[uid][0]:
                f = folded[uid]
                f[0] += int(_d2(val) * 100)
                f[1] += 1
    exp = {}
    for uid in set(last_set) | set(folded):
        base = last_set.get(uid, (None, 0))[1]
        adds, n = folded.get(uid, (0, 0))
        exp[uid] = (uid, base + adds, n)
    assert got == exp
    # the last-SET fold is live: some user's purchases were partly
    # discarded (adds before the SET), i.e. applied < total purchases
    total_adds = Counter(uid for uid, et, *_ in ev if et == "purchase")
    assert any(got[u][2] < total_adds[u] for u in got if u in total_adds)


def test_weighted_median(spark):
    from watermark_remove_spark.queries import q269_weighted_median

    got = {r["flag"]: tuple(r) for r in q269_weighted_median(spark, SF).collect()}

    per = defaultdict(Counter)
    for fl, q, ep in duckdb.sql(
        f"""SELECT l_returnflag, l_quantity, l_extendedprice
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall():
        per[fl][int(q)] += int(_d2(ep) * 100)
    for fl, wc in per.items():
        tot = sum(wc.values())

        def pick(num, den):
            cum = 0
            for v in sorted(wc):
                cum += wc[v]
                if cum * den >= tot * num:
                    return v

        assert got[fl] == (fl, pick(1, 4), pick(1, 2), pick(3, 4), tot)
        q25, med, q75 = got[fl][1], got[fl][2], got[fl][3]
        assert q25 <= med <= q75
