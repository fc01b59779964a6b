"""Round-4zv operators: TPC-H Q3 shipping priority, Q8 market share,
Q21 waiting suppliers.

Properties proven: the top-10 equals a Python replay under the pinned
total order (revenue DESC, date, key) and every row really straddles
the cutoff (order before, ship after); the market share equals a
Python two-role-nation replay with target revenue strictly between 0
and total (both nation roles live); the waiting-supplier counts equal
a Python EXISTS/NOT-EXISTS replay and the NOT-EXISTS clause really
excludes orders (multi-late-supplier orders exist and none of their
rows are counted).
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"


def _rev_e4(ep, disc):
    return int(
        (Decimal(f"{ep:.2f}") * (1 - Decimal(f"{disc:.2f}"))).quantize(
            Decimal("0.0001")
        )
        * 10000
    )


def test_shipping_priority(spark):
    from watermark_remove_spark.queries import q252_shipping_priority

    got = [tuple(r) for r in q252_shipping_priority(spark, SF).collect()]
    assert len(got) == 10

    cust = {
        ck
        for (ck,) in duckdb.sql(
            f"""SELECT c_custkey FROM '{SF}/customer.parquet'
                WHERE c_mktsegment = 'BUILDING'"""
        ).fetchall()
    }
    orders = {
        ok: (od, pr)
        for ok, ck, od, pr in duckdb.sql(
            f"""SELECT o_orderkey, o_custkey, o_orderdate, o_orderpriority
                FROM '{SF}/orders.parquet'
                WHERE o_orderdate < TIMESTAMP '1998-01-01'"""
        ).fetchall()
        if ck in cust
    }
    rev = defaultdict(int)
    for ok, ep, disc in duckdb.sql(
        f"""SELECT l_orderkey, l_extendedprice, l_discount
            FROM '{SF}/lineitem.parquet'
            WHERE l_shipdate > TIMESTAMP '1998-01-01'"""
    ).fetchall():
        if ok in orders:
            rev[ok] += _rev_e4(ep, disc)
    exp = sorted(
        ((ok, r, orders[ok][0].date(), orders[ok][1]) for ok, r in rev.items()),
        key=lambda t: (-t[1], t[2], t[0]),
    )[:10]
    assert got == exp
    # double-sided cutoff is live: more candidates than the k emitted
    assert len(rev) > 10


def test_market_share(spark):
    from watermark_remove_spark.queries import q253_market_share

    rows = {r["order_year"]: r for r in q253_market_share(spark, SF).collect()}

    d = duckdb.connect()
    asia_cust = {
        ck
        for (ck,) in d.sql(
            f"""SELECT c_custkey FROM '{SF}/customer.parquet'
                JOIN '{SF}/nation.parquet' ON c_nationkey = n_nationkey
                JOIN '{SF}/region.parquet' ON n_regionkey = r_regionkey
                WHERE r_name = 'ASIA'"""
        ).fetchall()
    }
    order_year = {
        ok: oy
        for ok, ck, oy in d.sql(
            f"""SELECT o_orderkey, o_custkey, year(o_orderdate)
                FROM '{SF}/orders.parquet'"""
        ).fetchall()
        if ck in asia_cust
    }
    target_supp = {
        sk
        for (sk,) in d.sql(
            f"""SELECT s_suppkey FROM '{SF}/supplier.parquet'
                JOIN '{SF}/nation.parquet' ON s_nationkey = n_nationkey
                WHERE n_name = 'NATION_8'"""
        ).fetchall()
    }
    assert target_supp  # the target nation really supplies
    tot = defaultdict(int)
    tgt = defaultdict(int)
    for ok, sk, ep, disc in d.sql(
        f"""SELECT l_orderkey, l_suppkey, l_extendedprice, l_discount
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall():
        oy = order_year.get(ok)
        if oy is None:
            continue
        r = _rev_e4(ep, disc)
        tot[oy] += r
        if sk in target_supp:
            tgt[oy] += r

    assert set(rows) == set(tot)
    for oy in tot:
        r = rows[oy]
        assert r["total_rev_e4"] == tot[oy]
        assert r["target_rev_e4"] == tgt[oy]
        assert r["share_ppm"] == tgt[oy] * 1_000_000 // tot[oy]
    # both nation roles live: target share strictly inside (0, 1)
    assert 0 < sum(tgt.values()) < sum(tot.values())


def test_waiting_suppliers(spark):
    from watermark_remove_spark.queries import q254_waiting_suppliers

    rows = {r["s_name"]: r for r in q254_waiting_suppliers(spark, SF).collect()}

    odate = {
        ok: od
        for ok, od in duckdb.sql(
            f"""SELECT o_orderkey, o_orderdate FROM '{SF}/orders.parquet'
                WHERE o_orderstatus = 'F'"""
        ).fetchall()
    }
    names = dict(
        duckdb.sql(
            f"SELECT s_suppkey, s_name FROM '{SF}/supplier.parquet'"
        ).fetchall()
    )
    by_order = defaultdict(list)
    for ok, sk, sd in duckdb.sql(
        f"""SELECT l_orderkey, l_suppkey, l_shipdate
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall():
        if ok in odate:
            late = (sd.date() - odate[ok].date()).days > 365
            by_order[ok].append((sk, late))
    numwait = defaultdict(int)
    n_orders = defaultdict(set)
    n_excluded = 0
    for ok, lis in by_order.items():
        supps = {sk for sk, _ in lis}
        late_supps = {sk for sk, late in lis if late}
        if len(supps) > 1 and len(late_supps) > 1:
            n_excluded += 1
        if len(supps) > 1 and len(late_supps) == 1:
            for sk, late in lis:
                if late:
                    numwait[names[sk]] += 1
                    n_orders[names[sk]].add(ok)

    assert set(rows) == set(numwait)
    for nm, nw in numwait.items():
        assert rows[nm]["numwait"] == nw
        assert rows[nm]["n_orders"] == len(n_orders[nm])
    # the NOT-EXISTS clause really excludes orders
    assert n_excluded > 0
    # late lineitems can outnumber their orders (row-count semantics)
    assert sum(numwait.values()) >= sum(len(s) for s in n_orders.values())
