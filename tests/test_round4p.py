"""Round-4p operators: integer-exact PageRank, asymmetric shingle
containment (quote detection), streaming histogram quantiles.

Properties proven against brute force / constructed fixtures: PageRank
equals a Python integer reconstruction over the same edge list (and
isolates stay at base mass); containment detects a planted wholesale
quote at exactly 1e6 ppm in the contained direction while Jaccard-style
symmetric evidence stays low; the streaming quantile picks equal a
Python nearest-rank reconstruction over the raw fixture values and the
overflow-bin clamp is exercised.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_pagerank_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q159_BASE,
        _Q159_ITERS,
        _Q159_UNIT,
        _q62_edges_sql,
        q159_pagerank,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'"
    )
    edges = con.execute(
        f"WITH {_q62_edges_sql(min_shared=2)} SELECT src, dst FROM edges"
    ).fetchall()
    nodes = [r[0] for r in con.execute("SELECT doc_id FROM documents").fetchall()]
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    rank = {n: _Q159_UNIT for n in nodes}
    for _ in range(_Q159_ITERS):
        recv = {n: 0 for n in nodes}
        for n, neighbors in adj.items():
            c = (85 * rank[n]) // (100 * len(neighbors))
            for m in neighbors:
                recv[m] += c
        rank = {n: _Q159_BASE + recv[n] for n in nodes}

    got = {r["doc_id"]: (r["pr_ppm"], r["deg"]) for r in q159_pagerank(spark, SF).collect()}
    assert {k: v[0] for k, v in got.items()} == rank
    assert all(got[n][1] == len(adj.get(n, [])) for n in nodes)
    # non-vacuity: the graph is non-empty and rank mass actually moved
    assert any(d > 0 for _, d in got.values())
    assert len({r for r, _ in got.values()}) > 2
    # isolates keep exactly the base mass
    assert all(got[n][0] == _Q159_BASE for n in nodes if n not in adj)


def test_containment_detects_planted_quote(spark, tmp_path):
    """A short doc quoted wholesale inside a long one scores 1e6 ppm
    containment in the quoted direction — while the reverse direction
    (and symmetric Jaccard evidence) stays far below it."""
    from watermark_remove_spark.queries import q160_shingle_containment

    quote = "alpha beta gamma delta epsilon zeta"
    long_doc = "\n".join(
        [quote]
        + [f"host{i} filler{i} extra{i} pad{i} tail{i}" for i in range(10)]
    )
    # 30 unique filler docs so the shared shingles survive 10*df < n
    fillers = [
        {
            "doc_id": 100 + i,
            "text": f"uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e",
            "lang": "en",
            "source": "s",
            "n_chars": 40,
        }
        for i in range(30)
    ]
    rows = [
        {"doc_id": 1, "text": quote, "lang": "en", "source": "s", "n_chars": 36},
        {"doc_id": 2, "text": long_doc, "lang": "en", "source": "s", "n_chars": 400},
    ] + fillers
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    got = {(r["doc_a"], r["doc_b"]): r for r in q160_shingle_containment(spark, str(tmp_path)).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["cont_a_in_b_ppm"] == 1_000_000  # every quote shingle is in the long doc
    assert r["cont_b_in_a_ppm"] < 200_000  # the reverse direction is weak
    assert r["inter"] == r["n_a"] == 4  # 6 tokens -> 4 k=3 shingles


def test_containment_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q160_MIN_SET,
        _Q160_T_PPM,
        q160_shingle_containment,
    )
    from watermark_remove_spark.spec import shingles

    docs = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    sets = {
        d: {s for ln in tx.split("\n") for s in shingles(ln)} for d, tx in docs
    }
    n = len(docs)
    df: dict[str, int] = {}
    for ss in sets.values():
        for s in ss:
            df[s] = df.get(s, 0) + 1
    kept = {d: {s for s in ss if 10 * df[s] < n} for d, ss in sets.items()}
    ids = sorted(kept)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            na, nb = len(kept[a]), len(kept[b])
            if na < _Q160_MIN_SET or nb < _Q160_MIN_SET:
                continue
            inter = len(kept[a] & kept[b])
            ca, cb = inter * 1_000_000 // na, inter * 1_000_000 // nb
            if inter and max(ca, cb) >= _Q160_T_PPM:
                expect[(a, b)] = (inter, na, nb, ca, cb)

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter"],
            r["n_a"],
            r["n_b"],
            r["cont_a_in_b_ppm"],
            r["cont_b_in_a_ppm"],
        )
        for r in q160_shingle_containment(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0  # non-vacuous on real fixtures


def test_streaming_hist_quantiles_match_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q161_BINS,
        _Q161_BINW,
        _Q161_MOD,
        _Q161_N,
        q161_streaming_hist_quantiles,
        STATIC_T0_EPOCH,
    )

    # raw fixture values, grouped into their event-time windows
    per_win: dict[int, list[int]] = {}
    clamped = 0
    for i in range(_Q161_N):
        m = (i * i) % _Q161_MOD
        ws = STATIC_T0_EPOCH + (i * 5 // 600) * 600
        per_win.setdefault(ws, []).append(m)
        clamped += m >= (_Q161_BINS - 1) * _Q161_BINW
    assert clamped > 0  # the overflow-bin clamp is non-vacuous

    def ub(vals: list[int], pct: int) -> int:
        bins = sorted(min(v // _Q161_BINW, _Q161_BINS - 1) for v in vals)
        tot, cum = len(bins), 0
        seen: dict[int, int] = {}
        for b in bins:
            seen[b] = seen.get(b, 0) + 1
        for b in sorted(seen):
            cum += seen[b]
            if 100 * cum >= pct * tot:
                return (b + 1) * _Q161_BINW
        raise AssertionError("unreachable")

    got = {
        r["window_start_epoch"]: r
        for r in q161_streaming_hist_quantiles(spark, SF).collect()
    }
    assert set(got) == set(per_win)
    for ws, vals in per_win.items():
        r = got[ws]
        assert r["total_n"] == len(vals)
        assert r["n_bins"] == len(
            {min(v // _Q161_BINW, _Q161_BINS - 1) for v in vals}
        )
        assert (r["p50_ub"], r["p90_ub"], r["p99_ub"]) == (
            ub(vals, 50),
            ub(vals, 90),
            ub(vals, 99),
        )
        assert r["p50_ub"] < r["p99_ub"]  # real spread in every window
