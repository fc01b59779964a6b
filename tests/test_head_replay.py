"""Independent Python replays for the driver-head block q51-q100
entries that had neither a name-level nor an operator-level pytest
(round-5 backfill; the block is the frozen driver-check head, so its
third verification leg — a replay that shares no code with the Spark
query or its DuckDB oracle mirror — matters most here).

Each test recomputes the full answer from raw parquet in plain
Python and adds a non-vacuity assertion so a degenerate fixture
cannot silently pass."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang, source FROM '{SF}/documents.parquet'"
    ).fetchall()


def _events():
    return duckdb.sql(
        f"SELECT event_id, ts, user_id, event_type, value"
        f" FROM '{SF}/events.parquet'"
    ).fetchall()


def _toks(text):
    """tokens_expr: split the WHOLE string on single spaces, drop
    empties (newlines stay inside tokens)."""
    return [t for t in text.split(" ") if t]


def _line_toks(text):
    """per-line tokens, flattened (q61's explode shape)."""
    out = []
    for ln in text.split("\n"):
        out.extend(t for t in ln.split(" ") if t)
    return out


def _md5_i64(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_q55_user_event_features(spark):
    from watermark_remove_spark.queries import q55_user_event_features

    got = {
        r["event_id"]: (r["seq"], r["gap_sec"], r["mov_sum3"], r["value_quartile"])
        for r in q55_user_event_features(spark, SF).collect()
    }

    ev = _events()
    per_user = defaultdict(list)
    for eid, ts, uid, _t, val in ev:
        per_user[uid].append((ts, eid, val))
    exp = {}
    for uid, rows in per_user.items():
        rows.sort()
        for i, (ts, eid, val) in enumerate(rows):
            gap = (
                int(ts.timestamp()) - int(rows[i - 1][0].timestamp())
                if i > 0
                else -1
            )
            window = rows[max(0, i - 2) : i + 1]
            msum = float(
                sum(
                    Decimal(str(v)).quantize(Decimal("0.01"), ROUND_HALF_UP)
                    for _, _, v in window
                )
            )
            exp[eid] = (i + 1, gap, msum)
    # ntile(4) per event_type ordered by (value, event_id)
    per_type = defaultdict(list)
    for eid, ts, uid, t, val in ev:
        per_type[t].append((val, eid))
    quart = {}
    for t, rows in per_type.items():
        rows.sort()
        n, q = len(rows), 4
        base, rem = n // q, n % q
        i = 0
        for b in range(1, q + 1):
            size = base + (1 if b <= rem else 0)
            for _ in range(size):
                quart[rows[i][1]] = b
                i += 1
    assert len(got) == len(ev)
    for eid in exp:
        assert got[eid] == (*exp[eid], quart[eid]), eid
    # non-vacuity: multi-event users exist (real gaps and moving sums)
    assert any(g[1] >= 0 for g in got.values())


def test_q56_grouping_sets(spark):
    from watermark_remove_spark.queries import q56_grouping_sets

    got = {
        (r["status"], r["priority"], r["gid"]): (r["n_orders"], r["total_price"])
        for r in q56_grouping_sets(spark, SF).collect()
    }

    orders = duckdb.sql(
        f"SELECT o_orderstatus, o_orderpriority, o_totalprice"
        f" FROM '{SF}/orders.parquet'"
    ).fetchall()
    fine, by_status, total = defaultdict(list), defaultdict(list), []
    for s, p, tp in orders:
        d = Decimal(str(tp)).quantize(Decimal("0.01"), ROUND_HALF_UP)
        fine[(s, p)].append(d)
        by_status[s].append(d)
        total.append(d)
    exp = {}
    for (s, p), vs in fine.items():
        exp[(s, p, 0)] = (len(vs), float(sum(vs)))
    for s, vs in by_status.items():
        exp[(s, None, 1)] = (len(vs), float(sum(vs)))
    exp[(None, None, 3)] = (len(total), float(sum(total)))
    assert got == exp
    # all three levels present
    assert {g for _, _, g in got} == {0, 1, 3}


def test_q60_pii_redaction(spark):
    from watermark_remove_spark.queries import q60_pii_redaction

    got = {
        r["source"]: (
            r["n_docs"],
            r["n_emails_redacted"],
            r["n_phones_redacted"],
            r["total_redacted_chars"],
        )
        for r in q60_pii_redaction(spark, SF).collect()
    }

    em_re = re.compile(r"[A-Za-z0-9_.]+@[A-Za-z0-9.]+[.][A-Za-z]+")
    ph_re = re.compile(r"[+][0-9]{1,2}-[0-9]{3}-[0-9]{4,}")
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for doc_id, text, _lang, source in _docs():
        t = text
        if doc_id % 7 == 0:
            t += f" contact user{doc_id}@example.org"
        if doc_id % 11 == 0:
            t += f" call +1-555-{doc_id:04d}"
        red = ph_re.sub("<PHONE>", em_re.sub("<EMAIL>", t))
        a = agg[source]
        a[0] += 1
        a[1] += len(em_re.findall(t))
        a[2] += len(ph_re.findall(t))
        a[3] += len(red)
    assert got == {s: tuple(v) for s, v in agg.items()}
    # injection is live on both classes
    assert sum(v[1] for v in got.values()) > 0
    assert sum(v[2] for v in got.values()) > 0


def test_q61_distinctive_terms(spark):
    from watermark_remove_spark.queries import q61_distinctive_terms

    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["df"])
        for r in q61_distinctive_terms(spark, SF).collect()
    }

    tf = defaultdict(Counter)
    for doc_id, text, _l, _s in _docs():
        tf[doc_id].update(_line_toks(text))
    df = Counter()
    for doc_id, c in tf.items():
        for tok in c:
            df[tok] += 1
    exp = {}
    for doc_id, c in tf.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], df[kv[0]], kv[0]))
        for r, (tok, n) in enumerate(ranked[:3], 1):
            exp[(doc_id, r)] = (tok, n, df[tok])
    assert got == exp
    assert len(got) >= 3 * 100  # most docs have >= 3 distinct tokens


def test_q65_funnel_sequences(spark):
    from watermark_remove_spark.queries import q65_funnel_sequences

    got = {
        r["user_id"]: (r["n_funnels"], r["first_funnel_epoch"])
        for r in q65_funnel_sequences(spark, SF).collect()
    }

    per_user = defaultdict(list)
    for eid, ts, uid, t, _v in _events():
        per_user[uid].append((ts, eid, t))
    exp = {}
    for uid, rows in per_user.items():
        rows.sort()
        hits = [
            int(rows[i][0].timestamp())
            for i in range(2, len(rows))
            if rows[i - 2][2] == "view"
            and rows[i - 1][2] == "click"
            and rows[i][2] == "purchase"
            and int(rows[i][0].timestamp()) - int(rows[i - 2][0].timestamp())
            <= 86400
        ]
        if hits:
            exp[uid] = (len(hits), min(hits))
    assert got == exp
    assert len(got) > 0  # funnels actually fire on this fixture


def test_q68_triangle_counts(spark):
    from watermark_remove_spark.queries import q68_triangle_counts
    from watermark_remove_spark.spec import shingles

    got = {
        r["doc_id"]: r["n_triangles"]
        for r in q68_triangle_counts(spark, SF).collect()
    }

    docs = _docs()
    n_docs = len(docs)
    doc_sh = {}
    for doc_id, text, _l, _s in docs:
        s = set()
        for ln in text.split("\n"):
            s.update(shingles(ln))
        doc_sh[doc_id] = s
    dfc = Counter()
    for s in doc_sh.values():
        dfc.update(s)
    kept = {d: {x for x in s if 10 * dfc[x] < n_docs} for d, s in doc_sh.items()}
    inv = defaultdict(list)
    for d, s in kept.items():
        for x in s:
            inv[x].append(d)
    shared = Counter()
    for ds in inv.values():
        ds.sort()
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                shared[(ds[i], ds[j])] += 1
    adj = defaultdict(set)
    edges = set()
    for (a, b), n in shared.items():
        if n >= 2:
            edges.add((a, b))
            adj[a].add(b)
            adj[b].add(a)
    tri = Counter()
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # oriented a < b < c, counted once
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    assert got == {d: n for d, n in tri.items()}
    assert sum(got.values()) % 3 == 0 and sum(got.values()) > 0


def test_q69_hll_merge_rollup(spark):
    from watermark_remove_spark.queries import q69_hll_merge_rollup

    K, M = 53, 256
    ALPHA = 0.7213 / (1.0 + 1.079 / M)
    A_SCALED = ALPHA * M * M * float(1 << K)

    got = {
        (r["level"], r["event_type"], r["day_id"]): (
            r["register_scale_sum"],
            r["empty_registers"],
            r["estimate_raw"],
        )
        for r in q69_hll_merge_rollup(spark, SF).collect()
    }

    regs_day = defaultdict(dict)  # (type, day) -> bucket -> max rho
    for _eid, ts, uid, t, _v in _events():
        day = int(ts.timestamp()) // 86400
        h = _md5_i64(f"hll#{uid}")
        b, w = h & 255, h >> 8
        rho = K if w == 0 else K - w.bit_length()
        d = regs_day[(t, day)]
        d[b] = max(d.get(b, 0), rho)

    def fold(d):
        s = sum(1 << (K - m) for m in d.values()) + (M - len(d)) * (1 << K)
        return (s, M - len(d), A_SCALED / float(s))

    exp = {}
    for (t, day), d in regs_day.items():
        exp[("day", t, day)] = fold(d)
    regs_type = defaultdict(dict)
    for (t, _day), d in regs_day.items():
        rt = regs_type[t]
        for b, m in d.items():
            rt[b] = max(rt.get(b, 0), m)
    for t, d in regs_type.items():
        exp[("type", t, -1)] = fold(d)
    assert got == exp
    # the merge is doing real work: some day-level register sets differ
    assert len({k for k in got if k[0] == "day"}) > len(regs_type)


def test_q86_paragraph_dedup(spark):
    from watermark_remove_spark.queries import q86_paragraph_dedup

    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["kept_md5"])
        for r in q86_paragraph_dedup(spark, SF).collect()
    }

    paras = []  # (doc_id, idx, para) in catalog order
    totals = {}
    for doc_id, text, _l, _s in _docs():
        tk = _toks(text)
        chunks = [" ".join(tk[i : i + 10]) for i in range(0, len(tk), 10)]
        totals[doc_id] = len(chunks)
        for idx, p in enumerate(chunks):
            paras.append((doc_id, idx, p))
    first = {}
    for doc_id, idx, p in sorted(paras):
        if p not in first:
            first[p] = (doc_id, idx)
    kept = defaultdict(list)
    for p, (doc_id, idx) in first.items():
        kept[doc_id].append((idx, p))
    exp = {}
    for doc_id, n in totals.items():
        ks = sorted(kept.get(doc_id, []))
        joined = " ".join(p for _, p in ks)
        exp[doc_id] = (n, len(ks), hashlib.md5(joined.encode()).hexdigest())
    assert got == exp
    # dedup removed something somewhere
    assert any(v[1] < v[0] for v in got.values())


def test_q87_token_rarity(spark):
    from watermark_remove_spark.queries import q87_token_rarity

    got = {
        (r["lang"], r["bucket"]): (r["n_docs"], r["min_score"], r["max_score"])
        for r in q87_token_rarity(spark, SF).collect()
    }

    docs = _docs()
    vocab = Counter()
    for _d, text, _l, _s in docs:
        vocab.update(_toks(text))
    ranked = {
        tok: i + 1
        for i, (tok, _c) in enumerate(
            sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))
        )
    }
    scores = defaultdict(list)
    for doc_id, text, lang, _s in docs:
        tk = _toks(text)
        if tk:
            scores[lang].append(sum(ranked[t] for t in tk) // len(tk))
    exp = {}
    agg = defaultdict(list)
    for lang, ss in scores.items():
        for s in ss:
            agg[(lang, s // 5)].append(s)
    for k, ss in agg.items():
        exp[k] = (len(ss), min(ss), max(ss))
    assert got == exp
    assert len({b for _l, b in got}) > 1  # score spread is real


def test_q88_vocab_coverage(spark):
    from watermark_remove_spark.queries import q88_vocab_coverage

    got = {
        r["rank"]: (r["token"], r["cnt"], r["cov_pct"])
        for r in q88_vocab_coverage(spark, SF).collect()
    }

    vocab = Counter()
    for _d, text, _l, _s in _docs():
        vocab.update(_toks(text))
    total = sum(vocab.values())
    cum = 0
    exp = {}
    for i, (tok, c) in enumerate(
        sorted(vocab.items(), key=lambda kv: (-kv[1], kv[0]))[:25], 1
    ):
        cum += c
        exp[i] = (tok, c, (100 * cum) // total)
    assert got == exp
    assert got[25][2] > got[1][2]  # the curve actually climbs


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def test_q89_fuzzy_blocked_join(spark):
    from watermark_remove_spark.queries import q89_fuzzy_blocked_join

    got = {
        r["doc_id"]: (r["dirty"], r["best_canon"], r["dist"])
        for r in q89_fuzzy_blocked_join(spark, SF).collect()
    }

    docs = _docs()
    catalog = sorted({f"{s}-item-{d % 40}" for d, _t, _l, s in docs})
    exp = {}
    for doc_id, _t, _l, s in docs:
        c = f"{s}-item-{doc_id % 40}"
        m = doc_id % 4
        dirty = (
            c[:-1]
            if m == 1
            else c.replace("item", "itme")
            if m == 2
            else c + "x"
            if m == 3
            else c
        )
        cands = [
            (c2, _lev(dirty, c2))
            for c2 in catalog
            if c2[:4] == dirty[:4]
        ]
        cands = [(d, c2) for c2, d in cands if d <= 2]
        if cands:
            d, c2 = min(cands)
            exp[doc_id] = (dirty, c2, d)
    assert got == exp
    # every corruption class resolved somewhere
    assert {v[2] for v in got.values()} >= {0, 1}


def test_q91_url_rule_filter(spark):
    from watermark_remove_spark.queries import q91_url_rule_filter

    got = {
        (r["source"], r["rule_id"]): r["n_urls"]
        for r in q91_url_rule_filter(spark, SF).collect()
    }

    rules = [(0, r"/admin/"), (1, r"[?&]utm_"), (2, r"\.zip$"), (3, r"//m\.")]
    agg = Counter()
    for doc_id, _t, _l, s in _docs():
        m = doc_id % 5
        host = ("m." if m == 4 else "") + s + ".example.com/"
        path = (
            "admin/panel"
            if m == 0
            else f"p/{doc_id}?utm_source=feed"
            if m == 1
            else f"dl/{doc_id}.zip"
            if m == 2
            else f"p/{doc_id}"
        )
        url = "https://" + host + path
        rid = next((r for r, pat in rules if re.search(pat, url)), -1)
        agg[(s, rid)] += 1
    assert got == dict(agg)
    assert {r for _s, r in got} == {-1, 0, 1, 2, 3}  # every rule fires


def test_q92_checksum_audit(spark):
    from watermark_remove_spark.queries import q92_checksum_audit

    got = {
        r["source_g"]: (r["n_docs"], r["checksum"])
        for r in q92_checksum_audit(spark, SF).collect()
    }

    sums = defaultdict(int)
    counts = Counter()
    for doc_id, text, _l, s in _docs():
        d = _md5_i64(f"ck#{doc_id}:{hashlib.md5(text.encode()).hexdigest()}")
        sums[s] += d
        counts[s] += 1
    exp = {s: (counts[s], str(sums[s])) for s in sums}
    exp["<ALL>"] = (sum(counts.values()), str(sum(sums.values())))
    assert got == exp
    # the rollup really is the sum of the per-source rows
    assert int(got["<ALL>"][1]) == sum(
        int(v[1]) for k, v in got.items() if k != "<ALL>"
    )


def test_q94_mixture_quota(spark):
    from watermark_remove_spark.queries import q94_mixture_quota

    got = {
        (r["lang"], r["source"]): (r["n_sel"], r["sel_tokens"])
        for r in q94_mixture_quota(spark, SF).collect()
    }

    weights = {"en": 40, "de": 20, "es": 20, "fr": 20}
    docs = _docs()
    by_lang = defaultdict(list)
    for doc_id, text, lang, s in docs:
        by_lang[lang].append((_md5_i64(f"mix#{doc_id}"), doc_id, s, text))
    agg = defaultdict(lambda: [0, 0])
    for lang, rows in by_lang.items():
        if lang not in weights:
            continue
        quota = min(len(rows), weights[lang] * 200 // 100)
        for _h, _d, s, text in sorted(rows)[:quota]:
            a = agg[(lang, s)]
            a[0] += 1
            a[1] += len(_toks(text))
    assert got == {k: tuple(v) for k, v in agg.items()}
    # quotas bind: selected count per lang == min(avail, quota)
    per_lang = Counter()
    for (lang, _s), (n, _t) in got.items():
        per_lang[lang] += n
    for lang, n in per_lang.items():
        assert n == min(len(by_lang[lang]), weights[lang] * 2)


def test_q96_phrase_search(spark):
    from watermark_remove_spark.queries import q96_phrase_search

    got = {
        r["doc_id"]: (r["n_hits"], r["first_pos"])
        for r in q96_phrase_search(spark, SF).collect()
    }

    exp = {}
    for doc_id, text, _l, _s in _docs():
        tk = _toks(text)
        hits = [
            i
            for i in range(len(tk) - 1)
            if tk[i] == "fast" and tk[i + 1] == "table"
        ]
        if hits:
            exp[doc_id] = (len(hits), min(hits))
    assert got == exp
    assert len(got) > 0  # the phrase occurs in this corpus


def test_q98_pmi_collocations(spark):
    from watermark_remove_spark.queries import q98_pmi_collocations

    got = [
        (r["t1"], r["t2"], r["n_ab"], r["lift_x1000"])
        for r in q98_pmi_collocations(spark, SF).collect()
    ]

    uni, big = Counter(), Counter()
    for _d, text, _l, _s in _docs():
        tk = _toks(text)
        uni.update(tk)
        big.update(zip(tk, tk[1:]))
    n_total = sum(uni.values())
    scored = [
        (t1, t2, n_ab, (n_ab * 1000 * n_total) // (uni[t1] * uni[t2]))
        for (t1, t2), n_ab in big.items()
        if n_ab >= 3
    ]
    scored.sort(key=lambda r: (-r[3], -r[2], r[0], r[1]))
    assert got == scored[:50]
    assert len(got) == 50 and got[0][3] > got[-1][3]  # real ranking


# ---- next drain block (q101-q150): the five entries without prior
# name- or operator-level pytest coverage — next round's driver head


def test_q101_robots_prefix_match(spark):
    from watermark_remove_spark.queries import q101_robots_prefix_match

    got = {
        (r["policy"], r["rule_prefix"]): r["n_urls"]
        for r in q101_robots_prefix_match(spark, SF).collect()
    }

    segments = ["news", "blog", "shop", "admin", "tmp", "static", "user"]
    rules = {
        "/admin": "deny",
        "/tmp": "deny",
        "/user": "deny",
        "/user/x1": "allow",
        "/shop": "allow",
        "/shop/x3": "deny",
        "/news": "allow",
    }
    agg = Counter()
    for doc_id, _t, _l, _s in _docs():
        p1 = "/" + segments[doc_id % 7]
        p2 = f"{p1}/x{doc_id % 13}"
        p3 = f"{p2}/d{doc_id}"
        best = None
        for p in (p1, p2, p3):
            if p in rules:
                best = p  # prefixes lengthen along the chain
        if best is None:
            agg[("allow", "<default>")] += 1
        else:
            agg[(rules[best], best)] += 1
    assert got == dict(agg)
    # the override is live: '/user/x1' allow rows exist alongside
    # '/user' deny rows
    assert ("allow", "/user/x1") in got and ("deny", "/user") in got


def test_q102_gapfill_ffill(spark):
    from watermark_remove_spark.queries import q102_gapfill_ffill

    got = {
        (r["event_type"], r["hour_epoch"]): (
            r["n_events"],
            r["carried_n"],
            r["is_gap"],
        )
        for r in q102_gapfill_ffill(spark, SF).collect()
    }

    hourly = Counter()
    for _e, ts, _u, t, _v in _events():
        hourly[(t, int(ts.timestamp()) // 3600 * 3600)] += 1
    exp = {}
    for t in {k[0] for k in hourly}:
        hours = [h for (tt, h) in hourly if tt == t]
        carried = None
        for h in range(min(hours), max(hours) + 3600, 3600):
            n = hourly.get((t, h), 0)
            if (t, h) in hourly:
                carried = n
            exp[(t, h)] = (n, carried, n == 0)
    assert got == exp
    assert any(v[2] for v in got.values())  # real gaps exist
    # a gap row still carries the last observed reading
    assert any(v[2] and v[1] is not None for v in got.values())


def test_q103_split_leakage(spark):
    from watermark_remove_spark.queries import q103_split_leakage

    got = {
        (r["scheme"], r["split"]): (
            r["n_docs"],
            r["total_tokens"],
            r["n_sources"],
            r["leaked_sources"],
        )
        for r in q103_split_leakage(spark, SF).collect()
    }

    def bucket(h):
        m = h % 100
        return "train" if m < 80 else "val" if m < 90 else "test"

    stats = defaultdict(lambda: [0, 0, set()])
    src_splits = defaultdict(set)
    for doc_id, text, _l, s in _docs():
        n_tok = len(_toks(text))
        for scheme, h in (
            ("by_doc", _md5_i64(f"split#{doc_id}")),
            ("by_source", _md5_i64(f"split#{s}")),
        ):
            sp = bucket(h)
            a = stats[(scheme, sp)]
            a[0] += 1
            a[1] += n_tok
            a[2].add(s)
            src_splits[(scheme, s)].add(sp)
    leaks = Counter()
    for (scheme, _s), sps in src_splits.items():
        if len(sps) > 1:
            leaks[scheme] += 1
    exp = {
        k: (v[0], v[1], len(v[2]), leaks[k[0]]) for k, v in stats.items()
    }
    assert got == exp
    # the audit's point: per-source leaks zero, per-doc leaks nonzero
    assert leaks["by_source"] == 0 and leaks["by_doc"] > 0


def test_q104_winsorized_stats(spark):
    from watermark_remove_spark.queries import q104_winsorized_stats

    got = {
        r["lang"]: (
            r["p05"],
            r["p95"],
            r["n_docs"],
            r["wmean_milli"],
            r["n_clipped_low"],
            r["n_clipped_high"],
        )
        for r in q104_winsorized_stats(spark, SF).collect()
    }

    per_lang = defaultdict(list)
    for _d, text, lang, _s in _docs():
        per_lang[lang].append(len(_toks(text)))
    exp = {}
    for lang, vals in per_lang.items():
        vals.sort()
        n = len(vals)
        p05 = vals[(n + 19) // 20 - 1]
        p95 = vals[(19 * n + 19) // 20 - 1]
        clipped = [min(max(v, p05), p95) for v in vals]
        exp[lang] = (
            p05,
            p95,
            n,
            (1000 * sum(clipped)) // n,
            sum(v < p05 for v in vals),
            sum(v > p95 for v in vals),
        )
    assert got == exp
    # clipping is real on at least one language
    assert any(v[4] + v[5] > 0 for v in got.values())


def test_q108_streaming_leaderboard(spark):
    from watermark_remove_spark.queries import q108_streaming_leaderboard

    got = [
        (r["rank"], r["user_id"], r["n_events"], r["n_purchases"], r["last_epoch"])
        for r in q108_streaming_leaderboard(spark, SF).collect()
    ]

    per_user = defaultdict(lambda: [0, 0, 0])
    for _e, ts, uid, t, _v in _events():
        a = per_user[uid]
        a[0] += 1
        a[1] += t == "purchase"
        a[2] = max(a[2], int(ts.timestamp()))
    board = sorted(
        ((v[0], uid, v[1], v[2]) for uid, v in per_user.items()),
        key=lambda r: (-r[0], r[1]),
    )[:10]
    exp = [
        (i + 1, uid, n, np, le) for i, (n, uid, np, le) in enumerate(board)
    ]
    assert got == exp
    assert len(got) == 10 and got[0][2] >= got[-1][2]


def test_q193_cdc_chunking(spark):
    """CDC chunker replay (also the HOF-audit head-to-head kernel):
    boundary after any token whose 60-bit md5 hash % 8 == 0."""
    from watermark_remove_spark.queries import q193_cdc_chunking

    got = {
        r["source"]: (
            r["n_chunks"],
            r["n_distinct_chunks"],
            r["dup_ppm"],
            r["total_tokens"],
            r["avg_chunk_tokens_milli"],
        )
        for r in q193_cdc_chunking(spark, SF).collect()
    }

    per_source = defaultdict(list)
    for _d, text, _l, s in _docs():
        toks = [w for w in text.replace("\n", " ").split(" ") if w]
        chunks, cur = [], []
        for w in toks:
            cur.append(w)
            if _md5_i64(f"cdc#{w}") % 8 == 0:
                chunks.append(" ".join(cur))
                cur = []
        if cur:
            chunks.append(" ".join(cur))
        per_source[s].extend(chunks)
    exp = {}
    for s, chunks in per_source.items():
        n = len(chunks)
        nd = len({_md5_i64(f"chunk#{c}") for c in chunks})
        tot = sum(len(c.split(" ")) for c in chunks)
        exp[s] = (n, nd, ((n - nd) * 1000000) // n, tot, (tot * 1000) // n)
    assert got == exp
    # chunk-level duplication is real (shared boilerplate chunks)
    assert any(v[2] > 0 for v in got.values())
