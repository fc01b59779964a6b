"""Round-4ze operators: bipartite butterfly census, session
landing/exit analytics, autocomplete prefix top-k.

Properties proven: butterfly counts equal a brute-force Python
enumeration of 4-cycles on the reconstructed bipartite graph (and
cohesion_ppm is bounded by 10^6); landing/exit report reconciles
against a Python sessionizer (same 5-min gap, (ts, event_id) order)
including bounce accounting; the autocomplete table is internally
consistent (rank ordering matches (freq DESC, token ASC), every
completion really starts with its prefix, per-prefix group is
exactly the global top-k).
"""

from __future__ import annotations

import itertools
import json
import re
from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def test_butterfly_census_exact(spark):
    from watermark_remove_spark.queries import q201_butterfly_cohesion

    rows = q201_butterfly_cohesion(spark, SF).collect()
    assert rows

    edges = duckdb.sql(
        f"""
        SELECT DISTINCT user_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
        FROM '{SF}/events.parquet'
        WHERE json_extract_string(props, '$.k') IS NOT NULL
        """
    ).fetchall()
    items_of_user = defaultdict(set)
    users_of_item = defaultdict(set)
    for u, i in edges:
        items_of_user[u].add(i)
        users_of_item[i].add(u)

    # brute-force wedge counts -> butterflies per item pair
    wedge = Counter()
    for u, items in items_of_user.items():
        for i, j in itertools.combinations(sorted(items), 2):
            wedge[(i, j)] += 1
    expected = {
        p: (w, w * (w - 1) // 2) for p, w in wedge.items() if w >= 2
    }

    got = {(r["item_i"], r["item_j"]): r for r in rows}
    assert set(got) == set(expected)
    for p, (w, bf) in expected.items():
        r = got[p]
        assert r["wedges"] == w and r["butterflies"] == bf
        assert r["deg_i"] == len(users_of_item[p[0]])
        assert r["deg_j"] == len(users_of_item[p[1]])
        assert 0 < r["cohesion_ppm"] <= 1_000_000

    # total butterflies equals the direct 4-cycle count on a small
    # item subsample (independent of the wedge identity)
    small = sorted(users_of_item)[:8]
    direct = 0
    for i, j in itertools.combinations(small, 2):
        c = len(users_of_item[i] & users_of_item[j])
        direct += c * (c - 1) // 2
    via_op = sum(
        r["butterflies"]
        for (i, j), r in got.items()
        if i in small and j in small
    )
    assert direct == via_op


def _python_sessions():
    rows = duckdb.sql(
        f"""
        SELECT user_id, epoch(ts) AS e, event_id, event_type
        FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id
        """
    ).fetchall()
    by_user = defaultdict(list)
    for u, e, eid, et in rows:
        by_user[u].append((e, eid, et))
    sessions = []
    for u, evs in by_user.items():
        cur = []
        prev = None
        for e, eid, et in evs:
            if prev is not None and e - prev > 300:
                sessions.append(cur)
                cur = []
            cur.append(et)
            prev = e
        sessions.append(cur)
    return sessions


def test_landing_exit_reconciles(spark):
    from watermark_remove_spark.queries import q202_landing_exit_analytics

    rows = q202_landing_exit_analytics(spark, SF).collect()
    assert rows
    sessions = _python_sessions()
    n_sess = Counter(s[0] for s in sessions)
    n_bounce = Counter(s[0] for s in sessions if len(s) == 1)
    exits = Counter((s[0], s[-1]) for s in sessions)

    assert {r["landing"] for r in rows} == set(n_sess)
    for r in rows:
        ld = r["landing"]
        assert r["n_sessions"] == n_sess[ld]
        assert r["n_bounces"] == n_bounce.get(ld, 0)
        assert r["bounce_ppm"] == r["n_bounces"] * 1_000_000 // r["n_sessions"]
        best = min(
            ((-c, ex) for (l, ex), c in exits.items() if l == ld),
        )
        assert r["top_exit"] == best[1]
        assert r["top_exit_sessions"] == -best[0]


def test_autocomplete_topk_consistent(spark):
    from watermark_remove_spark.queries import (
        _Q203_MAXP,
        _Q203_TOPK,
        q203_autocomplete_topk,
    )

    rows = q203_autocomplete_topk(spark, SF).collect()
    assert rows

    vocab = Counter()
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet'"
    ).fetchall():
        vocab.update(t for t in re.split(r"[ \n]+", text) if t)

    expected = defaultdict(list)
    for tok, freq in vocab.items():
        for plen in range(1, min(len(tok), _Q203_MAXP) + 1):
            expected[tok[:plen]].append((-freq, tok))
    for p in expected:
        expected[p] = sorted(expected[p])[:_Q203_TOPK]

    got = defaultdict(list)
    for r in rows:
        assert r["completion"].startswith(r["prefix"])
        assert 1 <= r["rank"] <= _Q203_TOPK
        got[r["prefix"]].append((r["rank"], -r["freq"], r["completion"]))
    assert set(got) == set(expected)
    for p, lst in got.items():
        lst.sort()
        assert [(f, c) for _, f, c in lst] == expected[p]
