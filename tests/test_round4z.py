"""Round-4z operators: streaming percolator, bot detection, AND-query
intersection planning.

Properties proven: percolator matches equal a brute-force all-terms
check per (window, query, page) — candidates that match only SOME
terms are counted but not matched (the conjunction is real); bot
flagging matches the threshold algebra and fires exactly on a planted
machine-rate user; the intersection plan's driver df and true match
counts equal a brute-force posting reconstruction, with matches never
exceeding the driver list.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_percolator_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q186_QUERIES,
        STATIC_T0_EPOCH,
        q186_streaming_percolator,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    qterms: dict[str, set[str]] = {}
    for q, t, _ in _Q186_QUERIES:
        qterms.setdefault(q, set()).add(t)
    expect: dict[tuple[int, str], list[int]] = {}
    for doc_id, source, text in docs:
        full = (
            f"wm-header {source} common header line\n"
            + text
            + f"\nwm-footer {source} shared footer line"
        )
        toks = {t for ln in full.split("\n") for t in ln.split(" ") if t}
        ws = STATIC_T0_EPOCH + (doc_id * 47 // 600) * 600
        for q, terms in qterms.items():
            if toks & terms:
                e = expect.setdefault((ws, q), [0, 0])
                e[0] += 1
                e[1] += terms <= toks

    got = {
        (r["window_start_epoch"], r["qid"]): (r["n_candidates"], r["n_matches"])
        for r in q186_streaming_percolator(spark, SF).collect()
    }
    assert got == {k: tuple(v) for k, v in expect.items()}
    # the conjunction is non-vacuous: some candidates are NOT matches
    assert any(c > m for c, m in got.values())
    assert any(m > 0 for _, m in got.values())


def test_bot_detection_planted_rate(spark, tmp_path):
    from watermark_remove_spark.queries import q187_bot_detection

    rows, eid = [], 0
    # user 1: human — one event per minute for 30 minutes
    for i in range(30):
        rows.append(
            {"event_id": eid, "ts": pd.Timestamp(2024, 7, 1, 9, 0, 0) + pd.Timedelta(minutes=i), "user_id": 1, "event_type": "view"}
        )
        eid += 1
    # user 2: bot — 20 events inside one minute plus 10 spread out
    for i in range(20):
        rows.append(
            {"event_id": eid, "ts": pd.Timestamp(2024, 7, 1, 9, 5, i), "user_id": 2, "event_type": "view"}
        )
        eid += 1
    for i in range(10):
        rows.append(
            {"event_id": eid, "ts": pd.Timestamp(2024, 7, 1, 10, i, 0), "user_id": 2, "event_type": "view"}
        )
        eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)

    got = {r["user_id"]: r for r in q187_bot_detection(spark, str(tmp_path)).collect()}
    h, b = got[1], got[2]
    assert (h["n_events"], h["active_minutes"], h["peak_per_min"]) == (30, 30, 1)
    assert h["flagged"] is False
    assert (b["n_events"], b["peak_per_min"]) == (30, 20)
    assert b["burst_ppm"] == 20 * 1_000_000 // 30
    assert b["flagged"] is True


def test_bot_detection_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q187_CONC_PPM,
        _Q187_RATE_MAX,
        q187_bot_detection,
    )

    rows = duckdb.sql(
        f"SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 60, count(*) FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    per_user: dict[int, list[int]] = {}
    for u, _, c in rows:
        per_user.setdefault(u, []).append(c)
    got = {r["user_id"]: r for r in q187_bot_detection(spark, SF).collect()}
    assert set(got) == set(per_user)
    for u, cnts in per_user.items():
        r = got[u]
        assert r["n_events"] == sum(cnts)
        assert r["active_minutes"] == len(cnts)
        assert r["peak_per_min"] == max(cnts)
        ppm = max(cnts) * 1_000_000 // sum(cnts)
        assert r["burst_ppm"] == ppm
        assert r["flagged"] == (max(cnts) > _Q187_RATE_MAX or ppm > _Q187_CONC_PPM)


def test_intersection_planner_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q188_QUERIES,
        q188_intersection_planner,
    )

    docs = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    toksets = {
        d: {t for ln in tx.split("\n") for t in ln.split(" ") if t}
        for d, tx in docs
    }
    qterms: dict[str, set[str]] = {}
    for q, t in _Q188_QUERIES:
        qterms.setdefault(q, set()).add(t)
    got = {r["qid"]: r for r in q188_intersection_planner(spark, SF).collect()}
    assert set(got) == set(qterms)
    for q, terms in qterms.items():
        dfs = {t: sum(t in ts for ts in toksets.values()) for t in terms}
        matches = sum(terms <= ts for ts in toksets.values())
        r = got[q]
        assert r["n_terms"] == len(terms)
        assert r["driver_df"] == min(dfs.values())
        assert r["widest_df"] == max(dfs.values())
        assert r["n_matches"] == matches
        assert r["n_matches"] <= r["driver_df"]  # probes only prune
        dmin = min(dfs.values())
        assert r["driver_selectivity_ppm"] == (
            0 if dmin == 0 else matches * 1_000_000 // dmin
        )
