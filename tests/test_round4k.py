"""Round-4k operators: CUSUM change-point, BPE merge-induction step,
join-size/skew forecast.

The oracle hash proves Spark == DuckDB on the full expressions; these
tests prove the defining *properties* against brute-force Python: the
window identity really computes the CUSUM recurrence, the two-pass
merge reaches the simultaneous-merge fixpoint and the chosen pair is
the true argmax, and the forecast predicts the ACTUAL join sizes
exactly.
"""

from __future__ import annotations

import duckdb

SF = "/root/testdata/sf0.001"


def test_cusum_window_identity_matches_recurrence(spark):
    from watermark_remove_spark.queries import q144_cusum_changepoint

    rows = duckdb.sql(
        f"""SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
            FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    series: dict[str, list[int]] = {}
    for et, _, n in rows:
        series.setdefault(et, []).append(n)

    got = sorted(
        q144_cusum_changepoint(spark, SF).collect(),
        key=lambda r: (r["event_type"], r["window_epoch"]),
    )
    i = 0
    alarms = 0
    for et in sorted(series):
        ns = series[et]
        k = sum(ns) // len(ns) + 1
        s = 0
        for n in ns:
            # the textbook recurrence the window identity must equal
            s = max(0, s + (n - k))
            r = got[i]
            assert (r["event_type"], r["n"], r["k"]) == (et, n, k)
            assert r["cusum"] == s, f"{et}: recurrence diverged"
            assert r["is_alarm"] == (s >= 4 * k)
            alarms += r["is_alarm"]
            i += 1
    assert i == len(got)


def test_bpe_merge_argmax_and_fixpoint(spark):
    from watermark_remove_spark.queries import q145_bpe_merge_step

    words = duckdb.sql(
        f"""SELECT w, count(*) AS cnt FROM (
              SELECT unnest(string_split(text, ' ')) AS w
              FROM '{SF}/documents.parquet')
            WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w"""
    ).fetchall()

    def pair_counts(seqs: dict[str, int]) -> dict[tuple[str, str], int]:
        pc: dict[tuple[str, str], int] = {}
        for sp, cnt in seqs.items():
            syms = sp.split(" ")
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + cnt
        return pc

    seqs = {" ".join(w): c for w, c in words}
    p1 = pair_counts(seqs)
    best = min(p1.items(), key=lambda kv: (-kv[1], kv[0]))[0]

    out = q145_bpe_merge_step(spark, SF).collect()
    assert len(out) == 20
    r1 = {r["rk"]: r for r in out}
    assert (r1[1]["merge_left"], r1[1]["merge_right"]) == best

    # brute-force simultaneous merge (two-pass replace semantics):
    # repeatedly replace until fixpoint — the engine's two passes must
    # already be there, so a third pass changes nothing
    pat = f" {best[0]} {best[1]} "
    rep = f" {best[0]}{best[1]} "
    merged: dict[str, int] = {}
    for sp, cnt in seqs.items():
        s = f" {sp} "
        one = s.replace(pat, rep)
        two = one.replace(pat, rep)
        assert two.replace(pat, rep) == two, "two passes did not reach fixpoint"
        merged[two.strip()] = merged.get(two.strip(), 0) + cnt
    p2 = pair_counts(merged)
    top = sorted(p2.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    for rk, ((ls, rs), pc) in enumerate(top, start=1):
        r = r1[rk]
        assert (r["left_sym"], r["right_sym"], r["pair_count"]) == (ls, rs, pc)


def test_join_forecast_equals_actual_join_size(spark):
    from watermark_remove_spark.queries import q146_join_size_forecast

    got = {r["join_name"]: r for r in q146_join_size_forecast(spark, SF).collect()}
    actual_co = duckdb.sql(
        f"""SELECT count(*) FROM '{SF}/customer.parquet' c
            JOIN '{SF}/orders.parquet' o ON c.c_custkey = o.o_custkey"""
    ).fetchone()[0]
    actual_ol = duckdb.sql(
        f"""SELECT count(*) FROM '{SF}/orders.parquet' o
            JOIN '{SF}/lineitem.parquet' l ON o.o_orderkey = l.l_orderkey"""
    ).fetchone()[0]
    assert got["customer_orders"]["predicted_rows"] == actual_co
    assert got["orders_lineitem"]["predicted_rows"] == actual_ol
    for r in got.values():
        assert 0 < r["max_key_rows"] <= r["predicted_rows"]
        assert 0 < r["skew_ppm"] <= 1_000_000
        assert r["skew_ppm"] == r["max_key_rows"] * 1_000_000 // r["predicted_rows"]
