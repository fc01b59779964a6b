"""Round-4n operators: zone-map skipping audit, per-stratum exact-k
priority sampling, sliding bitmap distinct rollup.

Properties proven against brute force: the two-step clustered layout
equals a true global sort and the clustered layout actually skips
files the arrival layout cannot, the stratified sample is the true
per-group top-k with hard quotas, and the rollup's 3-hour popcounts
equal real sliding distinct set sizes.
"""

from __future__ import annotations

import hashlib

import duckdb

SF = "/root/testdata/sf0.001"


def _h52(s: str, salt: str) -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:13], 16)


def test_zone_map_audit_layouts_and_skipping(spark):
    from watermark_remove_spark.queries import (
        _Q153_ROWS_PER_FILE,
        q153_zone_map_skipping_audit,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    rpf = _Q153_ROWS_PER_FILE
    layouts = {
        "arrival": {(d, la, n): d // rpf for d, la, n in docs},
        "clustered": {
            row: i // rpf
            for i, row in enumerate(
                sorted(docs, key=lambda r: (r[1], r[2], r[0]))
            )
        },
    }
    preds = {
        "nc_100_150": (
            lambda la, n: 100 <= n <= 150,
            lambda z: z["min_nc"] <= 150 and z["max_nc"] >= 100,
        ),
        "lang_es": (
            lambda la, n: la == "es",
            lambda z: z["min_lang"] <= "es" <= z["max_lang"],
        ),
        "en_long": (
            lambda la, n: la == "en" and n > 300,
            lambda z: z["min_lang"] <= "en" <= z["max_lang"] and z["max_nc"] > 300,
        ),
    }
    got = {
        (r["layout"], r["predicate"]): r
        for r in q153_zone_map_skipping_audit(spark, SF).collect()
    }
    assert len(got) == 6
    for layout, assign in layouts.items():
        zones: dict[int, dict] = {}
        for (d, la, n), f in assign.items():
            z = zones.setdefault(
                f, {"n": 0, "min_nc": n, "max_nc": n, "min_lang": la, "max_lang": la}
            )
            z["n"] += 1
            z["min_nc"] = min(z["min_nc"], n)
            z["max_nc"] = max(z["max_nc"], n)
            z["min_lang"] = min(z["min_lang"], la)
            z["max_lang"] = max(z["max_lang"], la)
        for pname, (row_pred, zone_pred) in preds.items():
            r = got[(layout, pname)]
            assert r["n_files"] == len(zones)
            scanned = [f for f, z in zones.items() if zone_pred(z)]
            assert r["files_scanned"] == len(scanned)
            assert r["rows_in_scanned_files"] == sum(zones[f]["n"] for f in scanned)
            matched = sum(row_pred(la, n) for _, la, n in docs)
            assert r["rows_matched"] == matched
            # zone maps are sound: scanned files hold every match
            assert r["rows_in_scanned_files"] >= r["rows_matched"]
    # the clustered rewrite must actually pay: fewer files scanned for
    # the lang predicate than arrival order
    assert (
        got[("clustered", "lang_es")]["files_scanned"]
        < got[("arrival", "lang_es")]["files_scanned"]
    )


def test_stratified_sample_is_per_group_topk_with_quota(spark):
    from watermark_remove_spark.queries import (
        _Q148_M,
        _Q154_K,
        q154_stratified_topk_sample,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    strata: dict[str, list[tuple[int, int]]] = {}
    for d, la, n in docs:
        prio = (n * _Q148_M) // (_h52(str(d), "prio#") + 1)
        strata.setdefault(la, []).append((d, prio))

    got: dict[str, list] = {}
    for r in q154_stratified_topk_sample(spark, SF).collect():
        got.setdefault(r["lang"], []).append(r)
    assert set(got) == set(strata)
    for lang, items in strata.items():
        expect = sorted(items, key=lambda t: (-t[1], t[0]))[: _Q154_K]
        rows = sorted(got[lang], key=lambda r: r["rk"])
        assert len(rows) == min(_Q154_K, len(items))  # hard quota
        assert [(r["doc_id"], r["priority"]) for r in rows] == expect
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))


def test_sliding_bitmap_rollup_equals_true_sliding_distinct(spark):
    from watermark_remove_spark.queries import q155_sliding_bitmap_distinct_rollup

    rows = duckdb.sql(
        f"""SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT), user_id
            FROM '{SF}/events.parquet'"""
    ).fetchall()
    per_hour: dict[int, set[int]] = {}
    for h, u in rows:
        per_hour.setdefault(h, set()).add(u)

    got = {
        r["hour_epoch"]: r
        for r in q155_sliding_bitmap_distinct_rollup(spark, SF).collect()
    }
    assert set(got) == set(per_hour)
    wider = 0
    for h, users in per_hour.items():
        sliding = users | per_hour.get(h - 3600, set()) | per_hour.get(h - 7200, set())
        r = got[h]
        assert r["n_distinct_1h"] == len(users)
        assert r["n_distinct_3h"] == len(sliding)
        assert r["n_words_3h"] == len({u // 64 for u in sliding})
        wider += len(sliding) > len(users)
    assert wider > 0  # the trailing window genuinely adds users somewhere
