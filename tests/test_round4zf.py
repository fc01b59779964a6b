"""Round-4zf operators: classifier calibration audit, CIDR
longest-prefix-match join, TPC-H Q10 returned-item revenue.

Properties proven: the calibration table reconciles against a Python
reimplementation (density confidence, binning, per-bin accuracy) and
is non-degenerate (>= 3 bins, gaps consistent, ECE recomputable);
the LPM join picks the genuinely longest matching prefix for every
user (verified against a Python FIB lookup over the reconstructed
rule table) and unmatched users fall to 'default'; Q10 output is the
exact top-20 of the full DuckDB aggregation with the documented
tiebreak.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

SF = "/root/testdata/sf0.001"

KNUTH = 2654435761
SPACE = 1 << 32
PLENS = [8, 12, 16, 20, 24]


def test_calibration_reconciles(spark):
    from watermark_remove_spark.queries import q204_langid_calibration

    rows = q204_langid_calibration(spark, SF).collect()
    assert len(rows) >= 3  # non-degenerate reliability diagram

    docs = duckdb.sql(
        f"SELECT lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    bins = defaultdict(lambda: [0, 0, 0])  # n, sum_conf, n_pos
    for lang, text in docs:
        toks = [t for t in text.split(" ") if t]
        if not toks:
            continue
        padded = (" " + text.lower() + " ").replace("\n", " ")
        h_en = sum(
            padded.count(f" {m} ") for m in ("the", "and", "of")
        )
        conf = min(1_000_000, h_en * 20 * 1_000_000 // len(toks))
        b = min(9, conf * 10 // 1_000_000)
        bins[b][0] += 1
        bins[b][1] += conf
        bins[b][2] += 1 if lang == "en" else 0

    got = {r["bin"]: r for r in rows}
    assert set(got) == set(bins)
    for b, (n, sc, pos) in bins.items():
        r = got[b]
        assert r["n_docs"] == n
        assert r["mean_conf_ppm"] == sc // n
        assert r["acc_ppm"] == pos * 1_000_000 // n
        assert r["gap_ppm"] == abs(sc // n - pos * 1_000_000 // n)
    # ECE is recomputable from the emitted terms and sane
    total = sum(r["n_docs"] for r in rows)
    ece = sum(r["gap_ppm"] * r["n_docs"] for r in rows) // total
    assert 0 <= ece <= 1_000_000


def test_cidr_lpm_matches_fib(spark):
    from watermark_remove_spark.queries import q205_cidr_lpm_join

    # sf0.01: 150 users of which only 25 hash-match a rule — both the
    # routed and the default branch are exercised (at sf0.001 every
    # user happens to match, leaving the default path dead)
    sf = "/root/testdata/sf0.01"
    rows = q205_cidr_lpm_join(spark, sf).collect()
    assert rows

    nations = duckdb.sql(
        f"SELECT n_nationkey, n_name FROM '{sf}/nation.parquet'"
    ).fetchall()
    fib = defaultdict(dict)  # plen -> prefix -> action (min alphabetical)
    for nk, name in nations:
        plen = 8 + (nk % 5) * 4
        prefix = ((nk * KNUTH) % SPACE) >> (32 - plen)
        cur = fib[plen].get(prefix)
        fib[plen][prefix] = min(cur, name) if cur else name

    users = {
        u
        for (u,) in duckdb.sql(
            f"SELECT DISTINCT user_id FROM '{sf}/events.parquet'"
        ).fetchall()
    }
    assert {r["user_id"] for r in rows} == users
    n_matched = 0
    for r in rows:
        ip = (r["user_id"] * KNUTH) % SPACE
        assert r["ip"] == ip
        best = (0, "default")
        for plen in PLENS:
            act = fib[plen].get(ip >> (32 - plen))
            if act is not None and plen > best[0]:
                best = (plen, act)
        assert (r["matched_plen"], r["action"]) == best
        n_matched += 1 if best[0] > 0 else 0
    # the rule table actually routes someone AND leaves a default tail
    assert 0 < n_matched < len(rows)


def test_q10_exact_top20(spark):
    from watermark_remove_spark.queries import q206_returned_item_revenue

    rows = q206_returned_item_revenue(spark, SF).collect()
    assert 0 < len(rows) <= 20

    full = duckdb.sql(
        f"""
        SELECT c_custkey,
               sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                   (1 - CAST(l_discount AS DECIMAL(18,2)))
                   AS DECIMAL(18,4))) AS revenue
        FROM '{SF}/lineitem.parquet'
        JOIN '{SF}/orders.parquet' ON l_orderkey = o_orderkey
        JOIN '{SF}/customer.parquet' ON o_custkey = c_custkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1995-10-01'
          AND o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY 1 ORDER BY revenue DESC, c_custkey ASC LIMIT 20
        """
    ).fetchall()
    assert [r["c_custkey"] for r in rows] == [k for k, _ in full]
    # ordering invariant holds inside the result too
    revs = [(r["revenue"], -r["c_custkey"]) for r in rows]
    assert revs == sorted(revs, key=lambda t: (-t[0], -t[1]))
