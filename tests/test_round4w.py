"""Round-4w operators: threshold-sweep calibration, Neyman allocation,
streaming feed-silence alarm.

Properties proven: the sweep matches a brute-force per-threshold filter
and is monotone (tightening never keeps more); Neyman quotas match a
hand computation, sum EXACTLY to the budget (the largest-remainder
guarantee float rounding breaks), and shift budget toward the
higher-variance stratum on a planted fixture; the silence alarm fires
exactly on the dying feed with the right first-silent window, stays
quiet for steady and late-starting feeds, and never flags windows
before a feed's first activity.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _tc(text: str) -> int:
    return len([t for t in text.split(" ") if t])


def test_threshold_sweep_matches_bruteforce(spark):
    from watermark_remove_spark.queries import _Q177_THRESHOLDS, q177_threshold_sweep

    docs = duckdb.sql(f"SELECT lang, text FROM '{SF}/documents.parquet'").fetchall()
    per_lang: dict[str, list[int]] = {}
    for lang, tx in docs:
        per_lang.setdefault(lang, []).append(_tc(tx))
    expect = {}
    for lang, tcs in per_lang.items():
        td, tt = len(tcs), sum(tcs)
        for t in _Q177_THRESHOLDS:
            kept = [x for x in tcs if x >= t]
            if kept:
                expect[(lang, t)] = (
                    len(kept),
                    sum(kept),
                    len(kept) * 1_000_000 // td,
                    sum(kept) * 1_000_000 // tt,
                )

    got = {
        (r["lang"], r["threshold"]): (
            r["n_kept"],
            r["tokens_kept"],
            r["doc_share_ppm"],
            r["token_share_ppm"],
        )
        for r in q177_threshold_sweep(spark, SF).collect()
    }
    assert got == expect
    # monotone: tightening the threshold never keeps more
    for lang in per_lang:
        ks = [got[(lang, t)][0] for t in _Q177_THRESHOLDS if (lang, t) in got]
        assert ks == sorted(ks, reverse=True)
    # the sweep actually discriminates somewhere
    assert len({v[0] for v in got.values()}) > 1


def test_neyman_allocation_exact(spark):
    from watermark_remove_spark.queries import _Q178_BUDGET, q178_neyman_allocation

    docs = duckdb.sql(f"SELECT lang, text FROM '{SF}/documents.parquet'").fetchall()
    strata: dict[str, list[int]] = {}
    for lang, tx in docs:
        strata.setdefault(lang, []).append(_tc(tx))
    wt = {}
    for lang, xs in strata.items():
        n, sx, sxx = len(xs), sum(xs), sum(x * x for x in xs)
        wt[lang] = math.isqrt(n * sxx - sx * sx)
    wtot = sum(wt.values())
    base = {l: _Q178_BUDGET * w // wtot for l, w in wt.items()}
    rem = {l: _Q178_BUDGET * wt[l] % wtot for l in wt}
    extra = _Q178_BUDGET - sum(base.values())
    order = sorted(wt, key=lambda l: (-rem[l], l))
    quota = {
        l: base[l] + (1 if i < extra else 0) for i, l in enumerate(order)
    }

    got = {r["lang"]: r for r in q178_neyman_allocation(spark, SF).collect()}
    assert {l: r["weight"] for l, r in got.items()} == wt
    assert {l: r["quota"] for l, r in got.items()} == quota
    assert sum(r["quota"] for r in got.values()) == _Q178_BUDGET  # exact


def test_neyman_shifts_budget_to_spread(spark, tmp_path):
    """Equal-size strata, one with 10x the length spread -> it gets a
    visibly larger quota."""
    from watermark_remove_spark.queries import q178_neyman_allocation

    rows = []
    for i in range(100):
        rows.append(
            {
                "doc_id": i,
                "text": " ".join(["w"] * (50 + (i % 2) * 2)),  # tc 50/52
                "lang": "narrow",
                "source": "s",
                "n_chars": 100,
            }
        )
    for i in range(100):
        rows.append(
            {
                "doc_id": 1000 + i,
                "text": " ".join(["w"] * (10 + (i % 10) * 20)),  # tc 10..190
                "lang": "wide",
                "source": "s",
                "n_chars": 100,
            }
        )
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)
    got = {r["lang"]: r["quota"] for r in q178_neyman_allocation(spark, str(tmp_path)).collect()}
    assert got["wide"] > 10 * got["narrow"]
    assert got["wide"] + got["narrow"] == 1000


def test_feed_silence_alarm(spark):
    from watermark_remove_spark.queries import (
        STATIC_T0_EPOCH,
        q179_streaming_feed_silence,
    )

    got = {r["feed"]: r for r in q179_streaming_feed_silence(spark, SF).collect()}
    assert set(got) == {"steady", "dying", "late_start"}
    s, d, l = got["steady"], got["dying"], got["late_start"]
    # steady: expected in all 5 windows, never silent
    assert (s["n_expected"], s["n_silent"], s["alarm"]) == (5, 0, False)
    assert s["first_silent_ws"] is None
    # dying: active in windows 0-1, silent 2-4, alarm with the right onset
    assert (d["n_expected"], d["n_silent"], d["alarm"]) == (5, 3, True)
    assert d["first_silent_ws"] == STATIC_T0_EPOCH + 2 * 600
    # late_start: expectation begins at its FIRST activity (window 2) —
    # windows 0-1 are not silence
    assert (l["n_expected"], l["n_silent"], l["alarm"]) == (3, 0, False)
