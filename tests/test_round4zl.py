"""Round-4zl operators: the correlated-subquery / decorrelation family
(TPC-H Q17/Q18/Q22 shapes).

Properties proven: each query reconciles against a pure-Python
reimplementation of its subquery semantics (per-part correlated
average, HAVING over an aggregated relation, global scalar +
anti join); every filter is non-vacuous in BOTH directions (keeps
some rows, drops some rows) so the subquery actually binds.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return int(Decimal(f"{x:.2f}") * 100)


def test_small_quantity_revenue_decorrelation(spark):
    from watermark_remove_spark.queries import q222_small_quantity_revenue

    rows = {r["p_brand"]: r for r in q222_small_quantity_revenue(spark, SF).collect()}
    assert rows

    li = duckdb.sql(
        f"""SELECT l_partkey, l_quantity, l_extendedprice, l_discount
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall()
    brand = dict(
        duckdb.sql(
            f"SELECT p_partkey, p_brand FROM '{SF}/part.parquet'"
        ).fetchall()
    )
    per_part = defaultdict(lambda: [0, 0])  # n, sum_qty_e2
    for pk, q, _, _ in li:
        per_part[pk][0] += 1
        per_part[pk][1] += _cents(q)

    exp_n = defaultdict(int)
    exp_rev = defaultdict(Decimal)
    n_small = n_large = 0
    for pk, q, ep, disc in li:
        n, sq = per_part[pk]
        if 5 * _cents(q) * n < sq:
            n_small += 1
            b = brand[pk]
            exp_n[b] += 1
            rev = Decimal(f"{ep:.2f}") * (1 - Decimal(f"{disc:.2f}"))
            exp_rev[b] += rev.quantize(Decimal("0.0001"))
        else:
            n_large += 1
    # the correlated predicate binds in both directions
    assert n_small > 0 and n_large > 0

    assert set(rows) == set(exp_n)
    for b, r in rows.items():
        assert r["n_small"] == exp_n[b]
        assert r["small_rev_e4"] == int(exp_rev[b] * 10000)


def test_large_volume_orders_having_semi(spark):
    from watermark_remove_spark.queries import q223_large_volume_orders

    rows = q223_large_volume_orders(spark, SF).collect()
    assert rows and len(rows) <= 20

    qty = defaultdict(int)
    for ok, q in duckdb.sql(
        f"SELECT l_orderkey, l_quantity FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        qty[ok] += _cents(q)
    big = {ok: s for ok, s in qty.items() if s > 25000}
    # the HAVING threshold binds in both directions
    assert big and len(big) < len(qty)

    o = {
        ok: (ck, od, tp)
        for ok, ck, od, tp in duckdb.sql(
            f"""SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
                FROM '{SF}/orders.parquet'"""
        ).fetchall()
    }
    cname = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_name FROM '{SF}/customer.parquet'"
        ).fetchall()
    )
    expected = sorted(
        ((s, ok) for ok, s in big.items()), key=lambda t: (-t[0], t[1])
    )[:20]
    got = [(r["order_qty_e2"], r["o_orderkey"]) for r in rows]
    assert got == expected
    for r in rows:
        ck, od, tp = o[r["o_orderkey"]]
        assert r["c_name"] == cname[ck]
        assert r["o_orderdate"] == od.strftime("%Y-%m-%d")
        assert r["o_totalprice_e2"] == _cents(tp)


def test_dormant_high_balance_scalar_anti(spark):
    from watermark_remove_spark.queries import q224_dormant_high_balance

    rows = {r["c_mktsegment"]: r for r in q224_dormant_high_balance(spark, SF).collect()}
    assert rows

    cust = duckdb.sql(
        f"""SELECT c_custkey, c_mktsegment, c_acctbal
            FROM '{SF}/customer.parquet'"""
    ).fetchall()
    recent = {
        r[0]
        for r in duckdb.sql(
            f"""SELECT DISTINCT o_custkey FROM '{SF}/orders.parquet'
                WHERE o_orderdate >= TIMESTAMP '2000-01-01'"""
        ).fetchall()
    }
    pos = [round(b * 100) for _, _, b in cust if b > 0]
    n_pos, sum_pos = len(pos), sum(pos)

    exp = defaultdict(lambda: [0, 0])
    n_rich = n_rich_recent = 0
    for ck, seg, bal in cust:
        bal_e2 = round(bal * 100)
        if bal_e2 * n_pos > sum_pos:
            n_rich += 1
            if ck in recent:
                n_rich_recent += 1  # rich but NOT dormant
            else:
                exp[seg][0] += 1
                exp[seg][1] += bal_e2
    # both the scalar threshold and the anti join bind
    assert 0 < n_rich < len(cust)
    assert n_rich_recent > 0 and sum(v[0] for v in exp.values()) > 0

    assert set(rows) == set(exp)
    for seg, (n, tot) in exp.items():
        assert rows[seg]["n_cust"] == n
        assert rows[seg]["total_bal_e2"] == tot
