"""Round-4r operators: degree-ordered triangle counting, reciprocal-
rank fusion, two-sample chi-square snapshot drift.

Properties proven: the degree-ordered triangle enumeration equals an
itertools brute force over the same edge set (orientation changes join
cost, never the result); RRF actually REORDERS the BM25 ranking (a
fresher doc overtakes a staler, better-scored one) while preserving the
candidate pool; the chi-square statistic matches the hand formula and
is zero for identical snapshots / large for a planted shift.
"""

from __future__ import annotations

import itertools

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_triangles_match_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _q62_edges_sql,
        q165_triangle_clustering,
    )

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    edges = con.execute(
        f"WITH {_q62_edges_sql(min_shared=2)} SELECT src, dst FROM edges"
    ).fetchall()
    nbrs: dict[int, set[int]] = {}
    for s, d in edges:
        nbrs.setdefault(s, set()).add(d)
        nbrs.setdefault(d, set()).add(s)
    tri_count: dict[int, int] = {}
    for a, b, c in itertools.combinations(sorted(nbrs), 3):
        if b in nbrs[a] and c in nbrs[a] and c in nbrs[b]:
            for n in (a, b, c):
                tri_count[n] = tri_count.get(n, 0) + 1
    expect = {
        n: (
            len(nbrs[n]),
            t,
            (2 * t * 1_000_000) // (len(nbrs[n]) * (len(nbrs[n]) - 1)),
        )
        for n, t in tri_count.items()
    }

    got = {
        r["doc_id"]: (r["deg"], r["n_tri"], r["clust_ppm"])
        for r in q165_triangle_clustering(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0  # the near-dup graph really has triangles
    # closure varies: both perfect cliques and open neighborhoods exist
    assert len({c for _, _, c in got.values()}) > 1


def test_rrf_fuses_and_reorders(spark):
    from watermark_remove_spark.queries import (
        _Q166_K,
        q105_bm25_retrieval,
        q166_rrf_hybrid_retrieval,
    )

    fused = q166_rrf_hybrid_retrieval(spark, SF).collect()
    by_q: dict[str, list] = {}
    for r in fused:
        by_q.setdefault(r["qid"], []).append(r)
    assert by_q  # non-vacuous
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["fused_rank"])
        for r in rows:
            # the fused score is exactly the two reciprocal ranks
            assert r["rrf_micro"] == 1_000_000 // (_Q166_K + r["bm25_rank"]) + (
                1_000_000 // (_Q166_K + r["fresh_rank"])
            )
        # fused order is by (rrf desc, doc_id)
        keys = [(-r["rrf_micro"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
    # fusion is not a no-op: somewhere the fused order differs from BM25
    bm25_top = {
        (r["qid"], r["rank"]): r["doc_id"]
        for r in q105_bm25_retrieval(spark, SF).collect()
    }
    fused_top = {(r["qid"], r["fused_rank"]): r["doc_id"] for r in fused}
    assert any(
        bm25_top.get(k) != v for k, v in fused_top.items() if k in bm25_top
    )


def test_chi2_drift_zero_and_planted(spark, tmp_path):
    """Identical snapshots -> statistic exactly 0; a planted length
    shift between parities -> large statistic matching the hand
    formula."""
    from watermark_remove_spark.queries import (
        _Q167_BINS,
        _Q167_BINW,
        q167_snapshot_drift_chi2,
    )

    rows = []
    # lang 'same': parity-identical length distribution (pairs)
    for i in range(100):
        n = 50 + (i // 2 % 10) * 100  # each length occurs at both parities
        rows.append(
            {"doc_id": i, "text": "x", "lang": "same", "source": "s", "n_chars": n}
        )
    # lang 'shift': evens short, odds long
    for i in range(100):
        n = 50 if i % 2 == 0 else 1500
        rows.append(
            {
                "doc_id": 1000 + i,
                "text": "x",
                "lang": "shift",
                "source": "s",
                "n_chars": n,
            }
        )
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    got = {r["lang"]: r for r in q167_snapshot_drift_chi2(spark, str(tmp_path)).collect()}
    assert got["same"]["chi2_milli"] == 0
    assert got["same"]["n_a"] == got["same"]["n_b"] == 50

    # hand formula for 'shift': two bins (0 and 15), each fully one-sided
    # doc_id parity: 1000+i has parity of i, so c1 = evens (short bin)
    hist = {0: (50, 0), 15: (0, 50)}
    n1 = n2 = 50
    expect = sum(
        ((c1 * n2 - c2 * n1) ** 2 * 1000) // (n1 * n2 * (c1 + c2))
        for c1, c2 in hist.values()
    )
    r = got["shift"]
    assert r["n_bins"] == 2 and r["dof"] == 1
    assert r["chi2_milli"] == expect == 100_000  # chi2 = N = 100 here
    # clamp sanity: the long docs landed in bin 1500//100 = 15 < 19
    assert 1500 // _Q167_BINW < _Q167_BINS - 1


def test_chi2_drift_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q167_BINS,
        _Q167_BINW,
        q167_snapshot_drift_chi2,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    hist: dict[tuple[str, int], list[int]] = {}
    for did, lang, n in docs:
        b = min(n // _Q167_BINW, _Q167_BINS - 1)
        hist.setdefault((lang, b), [0, 0])[did % 2] += 1
    tots: dict[str, list[int]] = {}
    for (lang, _), (c1, c2) in hist.items():
        t = tots.setdefault(lang, [0, 0])
        t[0] += c1
        t[1] += c2
    expect = {}
    for lang, (n1, n2) in tots.items():
        bins = [v for (lg, _), v in hist.items() if lg == lang]
        chi = sum(
            ((c1 * n2 - c2 * n1) ** 2 * 1000) // (n1 * n2 * (c1 + c2))
            for c1, c2 in bins
        )
        expect[lang] = (n1, n2, len(bins), len(bins) - 1, chi)

    got = {
        r["lang"]: (r["n_a"], r["n_b"], r["n_bins"], r["dof"], r["chi2_milli"])
        for r in q167_snapshot_drift_chi2(spark, SF).collect()
    }
    assert got == expect
    assert any(v[4] > 0 for v in got.values())  # real parity noise shows up
