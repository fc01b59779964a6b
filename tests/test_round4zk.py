"""Round-4zk operators: approximate-FD profiling (g3), time-weighted
average, TPC-H Q14 promotion share.

Properties proven: the FD table reconciles against a Python g3
computation, the key FDs (event_id->event_type, doc_id->lang) hold
exactly (g3=0, strength 1e6 ppm) while source->lang genuinely
violates; TWA equals a Python step-function integration (including
the day-boundary closure weight) and differs from the naive AVG on
irregularly-sampled days (the bug it exists to fix); Q14 reconciles
against an independent DuckDB aggregation and the ppm share is
consistent with its own numerator/denominator.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from datetime import datetime, timedelta
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"


def test_fd_profile_g3(spark):
    from watermark_remove_spark.queries import q219_fd_profile

    rows = {r["fd"]: r for r in q219_fd_profile(spark, SF).collect()}
    assert len(rows) == 4

    def g3(pairs):
        per_key = defaultdict(Counter)
        for k, v in pairs:
            per_key[k][v] += 1
        n_rows = sum(sum(c.values()) for c in per_key.values())
        viol = sum(
            sum(c.values()) - max(c.values()) for c in per_key.values()
        )
        vkeys = sum(1 for c in per_key.values() if len(c) > 1)
        return len(per_key), vkeys, n_rows, viol

    cases = {
        "event_id->event_type": f"SELECT event_id, event_type FROM '{SF}/events.parquet'",
        "doc_id->lang": f"SELECT doc_id, lang FROM '{SF}/documents.parquet'",
        "source->lang": f"SELECT source, lang FROM '{SF}/documents.parquet'",
        "o_custkey->o_orderpriority": f"SELECT o_custkey, o_orderpriority FROM '{SF}/orders.parquet'",
    }
    for fd, sql in cases.items():
        nk, vk, nr, viol = g3(duckdb.sql(sql).fetchall())
        r = rows[fd]
        assert (r["n_keys"], r["n_violating_keys"], r["n_rows"], r["g3_rows"]) == (
            nk,
            vk,
            nr,
            viol,
        )
        assert r["fd_strength_ppm"] == (nr - viol) * 1_000_000 // nr

    # key FDs hold exactly; the cross-column FD genuinely violates
    assert rows["event_id->event_type"]["g3_rows"] == 0
    assert rows["doc_id->lang"]["fd_strength_ppm"] == 1_000_000
    assert rows["source->lang"]["g3_rows"] > 0


def test_twa_integrates_step_function(spark):
    from watermark_remove_spark.queries import q220_time_weighted_average

    rows = q220_time_weighted_average(spark, SF).collect()
    assert rows

    ev = duckdb.sql(
        f"""SELECT user_id, ts, event_id, value
            FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall()
    series = defaultdict(list)
    for u, ts, eid, v in ev:
        series[(u, ts.date())].append((int(ts.timestamp()), v))
    expected = {}
    naive_differs = False
    for (u, day), pts in series.items():
        day_end = int(
            (datetime.combine(day, datetime.min.time()) + timedelta(days=1)).timestamp()
        )
        num = Decimal(0)
        tot = 0
        for i, (e, v) in enumerate(pts):
            nxt = pts[i + 1][0] if i + 1 < len(pts) else day_end
            dt = nxt - e
            num += Decimal(f"{v:.6f}") * dt
            tot += dt
        twa = int(num * 1_000_000) // tot
        expected[(u, str(day))] = (len(pts), tot, twa)
        naive = sum(v for _, v in pts) / len(pts)
        if abs(naive * 1e6 - twa) > 1e6:  # differs by > 1.0
            naive_differs = True

    got = {
        (r["user_id"], r["day"]): (
            r["n_samples"],
            r["total_dt_s"],
            r["twa_micro"],
        )
        for r in rows
    }
    assert got == expected
    assert naive_differs  # TWA is not just AVG on this data


def test_q14_promo_share(spark):
    from watermark_remove_spark.queries import q221_promo_revenue_share

    rows = q221_promo_revenue_share(spark, SF).collect()
    assert rows and len(rows) <= 12

    ref = {
        m: (p, t)
        for m, p, t in duckdb.sql(
            f"""
            SELECT month(l_shipdate),
                   CAST(sum(CASE WHEN p_type = 'PROMO' THEN
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (1 - CAST(l_discount AS DECIMAL(18,2)))
                          AS DECIMAL(18,4))
                     ELSE CAST(0 AS DECIMAL(18,4)) END) * 10000 AS BIGINT),
                   CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                          (1 - CAST(l_discount AS DECIMAL(18,2)))
                          AS DECIMAL(18,4))) * 10000 AS BIGINT)
            FROM '{SF}/lineitem.parquet'
            JOIN '{SF}/part.parquet' ON l_partkey = p_partkey
            WHERE l_shipdate >= TIMESTAMP '1995-01-01'
              AND l_shipdate < TIMESTAMP '1996-01-01'
            GROUP BY 1
            """
        ).fetchall()
    }
    got = {r["ship_month"]: r for r in rows}
    assert set(got) == set(ref)
    for m, (p, t) in ref.items():
        r = got[m]
        assert (r["promo_rev_e4"], r["total_rev_e4"]) == (p, t)
        assert r["promo_ppm"] == p * 1_000_000 // t
        assert 0 < r["promo_ppm"] < 1_000_000
