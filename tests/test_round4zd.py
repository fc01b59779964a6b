"""Round-4zd operators: TPC-H Q7 cross-nation volume, integer HITS,
crawl novelty-decay curve.

Properties proven: the Q7 join tree covers exactly the cross-nation
date-bounded lineitems (count reconciled against an independent
single-pass count) with both pair directions present; HITS equals an
exact Python fixpoint run on the reconstructed edge multiset with
hubs != authorities somewhere (the split is real); the novelty curve
equals a Python first-occurrence reconstruction, opens fully novel
and decays.
"""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def test_cross_nation_volume_structure(spark):
    from watermark_remove_spark.queries import q198_cross_nation_volume

    rows = q198_cross_nation_volume(spark, SF).collect()
    assert rows
    (n_expected,) = duckdb.sql(
        f"""
        SELECT count(*) FROM '{SF}/lineitem.parquet' l
        JOIN '{SF}/orders.parquet' o ON o.o_orderkey = l.l_orderkey
        JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{SF}/supplier.parquet' s ON s.s_suppkey = l.l_suppkey
        JOIN '{SF}/nation.parquet' n1 ON n1.n_nationkey = s.s_nationkey
        JOIN '{SF}/nation.parquet' n2 ON n2.n_nationkey = c.c_nationkey
        WHERE n1.n_name <> n2.n_name
          AND l.l_shipdate BETWEEN '1995-01-01' AND '1996-12-31'
        """
    ).fetchall()[0]
    assert sum(r["n_items"] for r in rows) == n_expected
    for r in rows:
        assert r["supp_nation"] != r["cust_nation"]
        assert r["l_year"] in (1995, 1996)
        assert r["revenue"] > 0
    # the nation dimension is genuinely two-role: both directions of
    # at least one pair appear
    pairs = {(r["supp_nation"], r["cust_nation"]) for r in rows}
    assert any((b, a) in pairs for (a, b) in pairs)


def _edges():
    return duckdb.sql(
        f"""
        SELECT src, dst FROM (
          SELECT user_id AS src,
                 lead(user_id) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS dst
          FROM '{SF}/events.parquet'
        ) WHERE dst IS NOT NULL AND dst <> src
        """
    ).fetchall()


def test_hits_matches_python_fixpoint(spark):
    from watermark_remove_spark.queries import q199_user_hits

    edges = _edges()
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    a = {n: 1 for n in nodes}
    h = {n: 0 for n in nodes}
    for _ in range(3):
        h = {n: 0 for n in nodes}
        for u, v in edges:
            h[u] += a[v]
        a = {n: 0 for n in nodes}
        for u, v in edges:
            a[v] += h[u]
    got = {
        r["user_id"]: (r["hub_score"], r["auth_score"])
        for r in q199_user_hits(spark, SF).collect()
    }
    assert got == {n: (h[n], a[n]) for n in nodes}
    # mutual reinforcement produced a real hub/authority SPLIT
    assert any(hs != as_ for hs, as_ in got.values())
    assert any(hs > 0 for hs, _ in got.values())


def _shingles(text: str) -> set[str]:
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


def test_novelty_decay_bruteforce(spark):
    from watermark_remove_spark.queries import _Q200_BATCH, q200_novelty_decay

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    per_batch: dict[int, set[str]] = {}
    for doc_id, text in rows:
        per_batch.setdefault(doc_id // _Q200_BATCH, set()).update(
            _shingles(text)
        )
    seen: set[str] = set()
    expect = {}
    cum = 0
    for b in sorted(per_batch):
        grams = per_batch[b]
        novel = len(grams - seen)
        cum += novel
        expect[b] = (
            len(grams), novel, novel * 1_000_000 // len(grams), cum,
        )
        seen |= grams
    got = {
        r["batch"]: (
            r["n_grams"], r["n_novel"], r["novelty_ppm"], r["cum_vocab"],
        )
        for r in q200_novelty_decay(spark, SF).collect()
    }
    assert got == expect
    # batch 0 is by definition fully novel; the crawl then dries up
    assert got[0][2] == 1_000_000
    assert got[max(got)][2] < 1_000_000
