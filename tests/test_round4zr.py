"""Round-4zr operators: SCD2 validity-integrity audit, expanding
distinct count, order-count distribution (TPC-H Q13 shape).

Properties proven: the audit flags EXACTLY the injected defect keys
(gap at src%5, overlap at src%7, no-current at src%11) and nothing
else; the expanding distinct equals a Python running-set replay and is
monotone per user, capped at the type universe; the count histogram
equals a Python tally, includes a NON-EMPTY zero class, and its mass
sums to the customer universe.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def test_scd2_audit_flags_exactly_injected_defects(spark):
    from watermark_remove_spark.queries import q240_scd2_integrity_audit

    rows = {r["source"]: r for r in q240_scd2_integrity_audit(spark, SF).collect()}
    assert rows

    gap_live = overlap_live = closed_live = clean_live = False
    for src, r in rows.items():
        s = int(src[3:])
        assert r["n_versions"] == 3
        assert r["n_gaps"] == (1 if s % 5 == 0 else 0)
        assert r["n_overlaps"] == (1 if s % 7 == 0 else 0)
        assert r["has_current"] == (0 if s % 11 == 0 else 1)
        gap_live |= s % 5 == 0
        overlap_live |= s % 7 == 0
        closed_live |= s % 11 == 0
        clean_live |= s % 5 and s % 7 and s % 11
    # every defect class AND the clean class are live
    assert gap_live and overlap_live and closed_live and clean_live


def test_expanding_distinct_matches_running_set(spark):
    from watermark_remove_spark.queries import q241_expanding_distinct

    rows = {r["event_id"]: r for r in q241_expanding_distinct(spark, SF).collect()}

    ev = duckdb.sql(
        f"""SELECT user_id, event_id, event_type
            FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall()
    seen = defaultdict(set)
    last = defaultdict(int)
    for uid, eid, et in ev:
        new = et not in seen[uid]
        seen[uid].add(et)
        r = rows[eid]
        assert r["is_new_type"] == int(new)
        assert r["distinct_types_so_far"] == len(seen[uid])
        # monotone, capped by the type universe
        assert last[uid] <= len(seen[uid]) <= 5
        last[uid] = len(seen[uid])


def test_order_count_distribution_zero_class(spark):
    from watermark_remove_spark.queries import q242_order_count_distribution

    rows = {r["c_count"]: r["custdist"] for r in q242_order_count_distribution(spark, SF).collect()}

    custs = [
        c
        for (c,) in duckdb.sql(
            f"SELECT c_custkey FROM '{SF}/customer.parquet'"
        ).fetchall()
    ]
    per_cust = Counter(
        {c: 0 for c in custs}
    )
    for (ck,) in duckdb.sql(
        f"""SELECT o_custkey FROM '{SF}/orders.parquet'
            WHERE o_orderdate >= TIMESTAMP '2000-01-01'"""
    ).fetchall():
        per_cust[ck] += 1
    expected = Counter(per_cust.values())

    assert rows == dict(expected)
    assert rows.get(0, 0) > 0  # the zero class is live (left join kept it)
    assert sum(rows.values()) == len(custs)
