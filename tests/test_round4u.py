"""Round-4u operators: last-touch attribution, Roaring container
planning, percent-rank normalization.

Properties proven: attribution matches a per-user replay including the
'(none)' and equal-timestamp cases; container planning matches
Roaring's rule with both container types live and roaring never costing
more than naive; percent-rank matches a sort-based reconstruction with
ties sharing the min rank and the bounds 0 <= ppm <= 1e6 tight.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_last_touch_matches_replay(spark):
    from watermark_remove_spark.queries import q174_last_touch_attribution

    rows = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, ts, eid, et in rows:
        by_user.setdefault(u, []).append((ts, eid, et))
    expect: dict[str, int] = {}
    for seq in by_user.values():
        last = None
        for _, _, et in seq:
            if et == "purchase":
                ch = last if last is not None else "(none)"
                expect[ch] = expect.get(ch, 0) + 1
            else:
                last = et
    total = sum(expect.values())

    got = {
        r["channel"]: (r["n_conversions"], r["share_ppm"])
        for r in q174_last_touch_attribution(spark, SF).collect()
    }
    assert {k: v[0] for k, v in got.items()} == expect
    for ch, (n, ppm) in got.items():
        assert ppm == n * 1_000_000 // total
    assert len(got) >= 3  # several channels earn credit in real data


def test_last_touch_none_and_ties(spark, tmp_path):
    """A purchase with no preceding touch -> '(none)'; equal
    timestamps resolve by event_id."""
    from watermark_remove_spark.queries import q174_last_touch_attribution

    t = pd.Timestamp(2024, 5, 1, 12)
    rows = [
        # user 1: purchase first -> (none)
        {"event_id": 1, "ts": t, "user_id": 1, "event_type": "purchase"},
        # user 2: view and purchase at the SAME ts; view has lower id
        {"event_id": 2, "ts": t, "user_id": 2, "event_type": "view"},
        {"event_id": 3, "ts": t, "user_id": 2, "event_type": "purchase"},
        # user 3: click then later purchase
        {"event_id": 4, "ts": t, "user_id": 3, "event_type": "click"},
        {"event_id": 5, "ts": t + pd.Timedelta(minutes=5), "user_id": 3, "event_type": "purchase"},
    ]
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)

    got = {
        r["channel"]: r["n_conversions"]
        for r in q174_last_touch_attribution(spark, str(tmp_path)).collect()
    }
    assert got == {"(none)": 1, "view": 1, "click": 1}


def test_roaring_audit_matches_rule(spark):
    from watermark_remove_spark.queries import (
        _Q175_ARR_MAX,
        _Q175_W,
        q175_roaring_container_audit,
    )

    rows = duckdb.sql(
        f"SELECT source, doc_id FROM '{SF}/documents.parquet'"
    ).fetchall()
    chunks: dict[tuple[str, int], int] = {}
    for src, did in rows:
        chunks[(src, did // _Q175_W)] = chunks.get((src, did // _Q175_W), 0) + 1
    expect: dict[str, list[int]] = {}
    for (src, _), n in chunks.items():
        e = expect.setdefault(src, [0, 0, 0, 0, 0])
        e[0] += 1
        is_arr = n < _Q175_ARR_MAX
        e[1] += is_arr
        e[2] += not is_arr
        e[3] += 2 * n if is_arr else _Q175_W // 8
        e[4] += 8 * n

    got = {r["source"]: r for r in q175_roaring_container_audit(spark, SF).collect()}
    assert set(got) == set(expect)
    arrays = bitmaps = 0
    for src, (nc, na, nb, rb, nvb) in expect.items():
        r = got[src]
        assert (r["n_chunks"], r["n_array"], r["n_bitmap"]) == (nc, na, nb)
        assert (r["roaring_bytes"], r["naive_bytes"]) == (rb, nvb)
        assert r["savings_ppm"] == (nvb - rb) * 1_000_000 // nvb
        assert rb <= nvb  # roaring never loses at these widths
        arrays += na
        bitmaps += nb
    assert arrays > 0 and bitmaps > 0  # both container types exercised


def test_percent_rank_matches_sort(spark):
    from watermark_remove_spark.queries import q176_percent_rank_normalization

    rows = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_lang: dict[str, list[int]] = {}
    for _, lang, n in rows:
        by_lang.setdefault(lang, []).append(n)
    expect = {}
    for did, lang, n in rows:
        vals = by_lang[lang]
        below = sum(v < n for v in vals)
        expect[did] = below * 1_000_000 // max(len(vals) - 1, 1)

    got = {
        r["doc_id"]: r["pct_ppm"]
        for r in q176_percent_rank_normalization(spark, SF).collect()
    }
    assert got == expect
    assert min(got.values()) == 0
    assert max(got.values()) == 1_000_000  # the unique max hits exactly 1e6
    # ties share the min rank: duplicated lengths map to equal ppm
    from collections import Counter

    for lang, vals in by_lang.items():
        c = Counter(vals)
        if any(v > 1 for v in c.values()):
            break
    else:
        raise AssertionError("fixture has no tied lengths; tie rule untested")
