"""Round-4zh operators: grid-bucketed epsilon join, interval-interval
overlap join, per-entity periodicity detection.

Properties proven: the grid join equals the brute-force O(n^2) radius
join (exact recall — no pair within eps is missed by the 3x3
neighborhood, none outside sneaks in, no pair is duplicated); the
interval overlap join equals the naive inequality join (meet-exactly-
once discipline holds) with positive overlap seconds bounded by both
interval lengths; periodicity reconciles against a Python gap-
histogram reimplementation and a synthetic strict-cron user scores
1e6 ppm while organic fixture users score lower.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def test_grid_join_equals_bruteforce(spark):
    from watermark_remove_spark.queries import _Q210_EPS, q210_grid_epsilon_join

    rows = q210_grid_epsilon_join(spark, SF).collect()
    assert rows

    pts = {
        v: (x, y)
        for v, x, y in duckdb.sql(
            f"""SELECT vec_id, embedding[1]::DOUBLE, embedding[2]::DOUBLE
                FROM '{SF}/embeddings.parquet'"""
        ).fetchall()
    }
    eps2 = _Q210_EPS * _Q210_EPS
    ids = sorted(pts)
    brute = set()
    for i, a in enumerate(ids):
        xa, ya = pts[a]
        for b in ids[i + 1 :]:
            xb, yb = pts[b]
            if (xa - xb) ** 2 + (ya - yb) ** 2 <= eps2:
                brute.add((a, b))

    got = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(got) == len(set(got))  # meet-exactly-once: no dupes
    assert set(got) == brute  # exact recall AND precision
    for r in rows:
        assert 0.0 <= r["dist"] <= _Q210_EPS + 1e-9


def test_interval_overlap_equals_naive(spark):
    from watermark_remove_spark.queries import q211_session_incident_overlap

    rows = q211_session_incident_overlap(spark, SF).collect()
    assert rows

    naive = duckdb.sql(
        f"""
        WITH marked AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER w > INTERVAL 5 minutes
                           OR lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS ns
          FROM '{SF}/events.parquet'
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), numbered AS (
          SELECT user_id, ts, sum(ns) OVER
            (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
          FROM marked
        ), sessions AS (
          SELECT user_id, min(ts) AS s0, max(ts) + INTERVAL 5 minutes AS s1
          FROM numbered GROUP BY user_id, sid
        ), incidents AS (
          SELECT n_nationkey AS iid,
                 TIMESTAMP '2024-01-01' + n_nationkey * INTERVAL 28 hours AS i0,
                 TIMESTAMP '2024-01-01'
                   + (n_nationkey * 28 + 5) * INTERVAL 1 hour AS i1
          FROM '{SF}/nation.parquet'
        )
        SELECT user_id, CAST(floor(epoch(s0)) AS BIGINT), iid,
               (least(epoch_us(s1), epoch_us(i1))
                - greatest(epoch_us(s0), epoch_us(i0))) // 1000000
        FROM sessions JOIN incidents ON s0 < i1 AND i0 < s1
        """
    ).fetchall()

    got = Counter(
        (
            r["user_id"],
            r["session_start_epoch"],
            r["incident_id"],
            r["overlap_seconds"],
        )
        for r in rows
    )
    assert got == Counter(tuple(t) for t in naive)
    assert max(got.values()) == 1  # meet-exactly-once
    assert all(r["overlap_seconds"] > 0 for r in rows)
    # overlap can never exceed the 5h incident length
    assert all(r["overlap_seconds"] <= 5 * 3600 for r in rows)


def test_periodicity_flags_cron(spark):
    import pandas as pd

    from watermark_remove_spark.queries import (
        _Q212_BIN_S,
        q212_periodicity_detection,
    )

    rows = q212_periodicity_detection(spark, SF).collect()
    assert rows

    ev = duckdb.sql(
        f"""SELECT user_id, epoch_us(ts) AS us, event_id
            FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"""
    ).fetchall()
    by_user = defaultdict(list)
    for u, us, eid in ev:
        by_user[u].append(us)
    expected = {}
    for u, uss in by_user.items():
        gaps = [
            (b - a) // (_Q212_BIN_S * 1_000_000)
            for a, b in zip(uss, uss[1:])
        ]
        if not gaps:
            continue
        c = Counter(gaps)
        modal_bin, modal_count = min(
            c.items(), key=lambda kv: (-kv[1], kv[0])
        )
        expected[u] = (
            len(gaps),
            modal_bin,
            modal_count,
            modal_count * 1_000_000 // len(gaps),
        )

    got = {
        r["user_id"]: (
            r["n_gaps"],
            r["modal_bin"],
            r["modal_count"],
            r["periodicity_ppm"],
        )
        for r in rows
    }
    assert got == expected
    # organic fixture users are NOT perfectly periodic
    assert all(v[3] < 1_000_000 for v in got.values())

    # a strict cron user (exactly hourly) must score 1e6 ppm
    t0 = pd.Timestamp("2024-01-01")
    cron = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": range(50),
                "ts": [t0 + pd.Timedelta(hours=i) for i in range(50)],
                "user_id": [999] * 50,
                "event_type": ["ping"] * 50,
                "value": [0.0] * 50,
                "props": ["{}"] * 50,
            }
        )
    )
    import tempfile

    d = tempfile.mkdtemp()
    cron.write.mode("overwrite").parquet(f"{d}/events.parquet")
    out = q212_periodicity_detection(spark, d).collect()
    assert len(out) == 1 and out[0]["periodicity_ppm"] == 1_000_000
