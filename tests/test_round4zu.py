"""Round-4zu operators: Benford first-digit audit, RLE layout
economics, shipping-delay service classes (TPC-H Q12 shape).

Properties proven: the digit histogram and deviations equal a Python
replay with the exact Benford ppm constants (all 9 digits observed,
max-deviation pinned corpus-wide); the RLE audit equals a Python
run-counter (sorted-by-column runs == NDV, natural-order runs strictly
greater — adjacency really is the thing being priced); the delay
classes equal a Python replay with every class and both priority
groups populated.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"

BENFORD = [301030, 176091, 124939, 96910, 79181, 66947, 57992, 51153, 45757]


def test_benford_audit(spark):
    from watermark_remove_spark.queries import q249_benford_audit

    rows = {r["first_digit"]: r for r in q249_benford_audit(spark, SF).collect()}
    assert set(rows) == set(range(1, 10))  # every digit observed

    digits = Counter(
        int(str(int(Decimal(f"{tp:.2f}") * 100))[0])
        for (tp,) in duckdb.sql(
            f"SELECT o_totalprice FROM '{SF}/orders.parquet'"
        ).fetchall()
    )
    total = sum(digits.values())
    devs = {}
    for d in range(1, 10):
        obs = digits[d] * 1_000_000 // total
        exp = BENFORD[d - 1]
        devs[d] = abs(obs - exp)
        r = rows[d]
        assert r["n_values"] == digits[d]
        assert r["obs_ppm"] == obs
        assert r["exp_ppm"] == exp
        assert r["dev_ppm"] == devs[d]
    for r in rows.values():
        assert r["max_dev_ppm"] == max(devs.values())


def test_rle_layout_audit(spark):
    from watermark_remove_spark.queries import q250_rle_layout_audit

    rows = {r["col"]: r for r in q250_rle_layout_audit(spark, SF).collect()}
    assert set(rows) == {"lang", "source"}

    docs = duckdb.sql(
        f"SELECT doc_id, lang, source FROM '{SF}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    for col, idx in (("lang", 1), ("source", 2)):
        vals = [r[idx] for r in docs]
        runs_nat = sum(
            1 for i, v in enumerate(vals) if i == 0 or vals[i - 1] != v
        )
        ndv = len(set(vals))
        vbytes = sum(len(v) for v in vals)
        r = rows[col]
        assert r["n_rows"] == len(vals)
        assert r["runs_sorted"] == ndv
        assert r["runs_natural"] == runs_nat
        assert r["natural_run_ppm"] == runs_nat * 1_000_000 // len(vals)
        w = (vbytes // len(vals)) + 4
        assert r["rle_bytes_natural"] == runs_nat * w
        assert r["rle_bytes_sorted"] == ndv * w
        # adjacency is the thing priced: sorting wins decisively
        assert ndv < runs_nat


def test_ship_delay_classes(spark):
    from watermark_remove_spark.queries import q251_ship_delay_classes

    rows = {r["delay_class"]: r for r in q251_ship_delay_classes(spark, SF).collect()}

    orders = {
        ok: (od, pr)
        for ok, od, pr in duckdb.sql(
            f"""SELECT o_orderkey, o_orderdate, o_orderpriority
                FROM '{SF}/orders.parquet'"""
        ).fetchall()
    }
    exp = defaultdict(lambda: [0, 0, 0, None, None])
    for ok, sd in duckdb.sql(
        f"SELECT l_orderkey, l_shipdate FROM '{SF}/lineitem.parquet'"
    ).fetchall():
        od, pr = orders[ok]
        delay = (sd.date() - od.date()).days
        cls = "on_time" if delay <= 30 else ("late" if delay <= 90 else "very_late")
        a = exp[cls]
        a[0] += 1
        if pr in ("1-URGENT", "2-HIGH"):
            a[1] += 1
        else:
            a[2] += 1
        a[3] = delay if a[3] is None else min(a[3], delay)
        a[4] = delay if a[4] is None else max(a[4], delay)

    assert set(rows) == set(exp)
    assert len(rows) == 3  # every class populated
    for cls, (n, urg, norm, lo, hi) in exp.items():
        r = rows[cls]
        assert (r["n_lineitems"], r["n_urgent"], r["n_normal"]) == (n, urg, norm)
        assert (r["min_delay_d"], r["max_delay_d"]) == (lo, hi)
        assert urg > 0 and norm > 0  # both priority groups live
