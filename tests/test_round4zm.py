"""Round-4zm operators: Theil–Sen robust slope, Merkle-style snapshot
diff, peak session concurrency (sweep line).

Properties proven: Theil–Sen equals a brute-force pairwise-slope
median and shrugs off a planted outlier day that drags OLS; the
Merkle diff reconciles against a Python set diff, all three
perturbation classes (changed/added/removed) are live, and the
bucket gate really skips work (row-level rows < corpus); the
two-phase distributed prefix sum equals a flat Python sweep and a
real overlap (peak >= 2) exists.
"""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"
TS_LCM = 2329089562800


def _md5_i64(s: str, salt: str = "") -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


def test_theil_sen_matches_brute_force(spark):
    from watermark_remove_spark.queries import q225_theil_sen_slope

    rows = {r["event_type"]: r for r in q225_theil_sen_slope(spark, SF).collect()}
    assert rows

    daily = defaultdict(Counter)
    for et, d in duckdb.sql(
        f"SELECT event_type, ts::DATE FROM '{SF}/events.parquet'"
    ).fetchall():
        daily[et][d] += 1
    d0 = min(d for c in daily.values() for d in c)
    for et, c in daily.items():
        pts = sorted((int((d - d0).days), y) for d, y in c.items())
        slopes = sorted(
            (y2 - y1) * TS_LCM // (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for (x2, y2) in pts[i + 1 :]
        )
        med = slopes[(len(slopes) + 1) // 2 - 1]
        r = rows[et]
        assert r["n_days"] == len(pts)
        assert r["n_pairs"] == len(slopes)
        assert r["med_slope_scaled"] == med
        sign = (med > 0) - (med < 0)
        assert r["slope_milli"] == sign * ((1000 * abs(med)) // TS_LCM)


def test_theil_sen_robust_to_outlier(spark, tmp_path):
    """A clean +2/day series with ONE crazy day: TS stays at 2.0/day,
    OLS is dragged off it."""
    import pandas as pd

    recs = []
    eid = 0
    for day in range(10):
        n = 10 + 2 * day if day != 9 else 500  # planted outlier day
        for j in range(n):
            recs.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp("2024-03-01") + pd.Timedelta(days=day, seconds=j),
                    "user_id": j % 5,
                    "event_type": "crawl",
                    "value": 0.0,
                    "props": "{}",
                }
            )
            eid += 1
    df = pd.DataFrame(recs)
    d = tmp_path / "sf"
    d.mkdir()
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(d / "events.parquet"),
        coerce_timestamps="us",
    )

    from watermark_remove_spark.queries import (
        q164_daily_trend_slope,
        q225_theil_sen_slope,
    )

    ts = q225_theil_sen_slope(spark, str(d)).collect()[0]
    assert ts["slope_milli"] == 2000  # exactly +2/day despite the outlier

    ols = q164_daily_trend_slope(spark, str(d)).collect()[0]
    assert abs(ols["slope_milli"] - 2000) > 5000  # OLS dragged far off


def test_merkle_diff_matches_set_diff(spark):
    from watermark_remove_spark.queries import q226_merkle_snapshot_diff

    rows = {r["bucket"]: r for r in q226_merkle_snapshot_diff(spark, SF).collect()}

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    a = {i: _md5_i64(t, "snap#") for i, t in docs}
    b = {}
    for i, t in docs:
        if i % 101 == 0:
            continue
        b[i] = _md5_i64(t, "v2#") if i % 17 == 0 else _md5_i64(t, "snap#")
    for i, t in docs:
        if i % 97 == 0:
            b[i + 1000000] = _md5_i64(t, "new#")

    exp = {}
    for bkt in set(i % 64 for i in a) | set(i % 64 for i in b):
        ids_a = {i for i in a if i % 64 == bkt}
        ids_b = {i for i in b if i % 64 == bkt}
        dirty = int(
            len(ids_a) != len(ids_b)
            or sum(a[i] for i in ids_a) != sum(b[i] for i in ids_b)
        )
        chg = sum(1 for i in ids_a & ids_b if a[i] != b[i])
        exp[bkt] = (
            len(ids_a),
            len(ids_b),
            dirty,
            chg if dirty else 0,
            len(ids_b - ids_a) if dirty else 0,
            len(ids_a - ids_b) if dirty else 0,
            (len(ids_a) + len(ids_b)) if dirty else 0,
        )

    assert set(rows) == set(exp)
    for bkt, r in rows.items():
        assert (
            r["n_a"], r["n_b"], r["dirty"], r["n_changed"],
            r["n_added"], r["n_removed"], r["rows_rowlevel"],
        ) == exp[bkt]

    # all three perturbation classes live; the bucket gate skips work
    assert sum(r["n_changed"] for r in rows.values()) > 0
    assert sum(r["n_added"] for r in rows.values()) > 0
    assert sum(r["n_removed"] for r in rows.values()) > 0
    total_rowlevel = sum(r["rows_rowlevel"] for r in rows.values())
    assert 0 < total_rowlevel < len(a) + len(b)


def test_peak_concurrency_matches_flat_sweep(spark):
    from watermark_remove_spark.queries import q227_peak_concurrency

    rows = {r["day_idx"]: r for r in q227_peak_concurrency(spark, SF).collect()}
    assert rows

    sess = duckdb.sql(
        f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 5 minutes OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS ns
  FROM '{SF}/events.parquet'
), numbered AS (
  SELECT user_id, ts,
         sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                       ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT CAST(floor(epoch(min(ts))) AS BIGINT),
       CAST(floor(epoch(max(ts) + INTERVAL 5 minutes)) AS BIGINT)
FROM numbered GROUP BY user_id, sid
"""
    ).fetchall()

    bounds = sorted(
        [(t0, 1) for t0, _ in sess] + [(t1, -1) for _, t1 in sess]
    )
    run = 0
    peak = defaultdict(int)
    starts = defaultdict(int)
    # group equal (t, delta) atomically (RANGE-frame semantics)
    i = 0
    while i < len(bounds):
        j = i
        while j < len(bounds) and bounds[j] == bounds[i]:
            j += 1
        t, delta = bounds[i]
        run += delta * (j - i)
        day = t // 86400
        peak[day] = max(peak[day], run)
        if delta == 1:
            starts[day] += j - i
        i = j

    assert set(rows) == set(peak)
    for day, r in rows.items():
        assert r["peak_concurrent"] == peak[day]
        assert r["n_starts"] == starts[day]
    # a real overlap exists somewhere
    assert max(peak.values()) >= 2
