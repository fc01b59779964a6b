"""Round-4zs operators: majority-vote NULL imputation, bitemporal
as-of lookup, OLS forecast backtest.

Properties proven: imputation equals a Python modal-vote replay, the
unrepairable class (fully-null source) is live and never guessed; the
bitemporal grid matches a Python two-axis filter, every probe hits
EXACTLY one row, corrections are invisible to pre-correction readers
and visible after; the backtest prediction equals the hand OLS
formula and the training window provably excludes the test day.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def test_majority_imputation(spark):
    from watermark_remove_spark.queries import q243_majority_imputation

    rows = {r["source"]: r for r in q243_majority_imputation(spark, SF).collect()}

    docs = duckdb.sql(
        f"SELECT doc_id, source, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for did, src, lang in docs:
        eff = None if (did % 13 == 0 or src == "src7") else lang
        by_src[src].append(eff)

    assert set(rows) == set(by_src)
    for src, langs in by_src.items():
        nn = [x for x in langs if x is not None]
        modal = (
            min(
                (l for l in set(nn)),
                key=lambda l: (-nn.count(l), l),
            )
            if nn
            else None
        )
        r = rows[src]
        n_nulls = sum(1 for x in langs if x is None)
        assert r["n_rows"] == len(langs)
        assert r["n_nulls"] == n_nulls
        assert r["modal_lang"] == modal
        assert r["n_imputed"] == (n_nulls if modal is not None else 0)
        assert r["n_residual"] == (n_nulls if modal is None else 0)
    # the unrepairable class is live and never guessed
    assert rows["src7"]["modal_lang"] is None
    assert rows["src7"]["n_residual"] == rows["src7"]["n_rows"]
    assert sum(r["n_imputed"] for r in rows.values()) > 0


def test_bitemporal_lookup(spark):
    from watermark_remove_spark.queries import q244_bitemporal_lookup

    rows = {
        (r["source"], r["tx_asof"], r["valid_at"]): r
        for r in q244_bitemporal_lookup(spark, SF).collect()
    }
    srcs = [
        s
        for (s,) in duckdb.sql(
            f"SELECT DISTINCT source FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    FAR = 9_000_000_000
    for src in srcs:
        s = int(src[3:])
        if s % 3 == 0:
            dim = [(0, FAR, 100, FAR, 1)]
        else:
            dim = [
                (0, FAR, 100, 200, 1),
                (0, 1000, 200, FAR, 1),
                (1000, FAR, 200, FAR, 2),
            ]
        for tx in (150, 250):
            for v in (500, 1500):
                hits = [
                    tier
                    for vf, vt, tf, tt, tier in dim
                    if tf <= tx < tt and vf <= v < vt
                ]
                r = rows[(src, tx, v)]
                assert len(hits) == 1 and r["n_matches"] == 1
                assert r["tier"] == hits[0]
    # corrections invisible before tx 200, visible after
    corrected = next(s for s in srcs if int(s[3:]) % 3 != 0)
    assert rows[(corrected, 150, 1500)]["tier"] == 1
    assert rows[(corrected, 250, 1500)]["tier"] == 2
    # grid complete
    assert len(rows) == 4 * len(srcs)


def test_forecast_backtest(spark):
    from watermark_remove_spark.queries import q245_forecast_backtest

    rows = {r["event_type"]: r for r in q245_forecast_backtest(spark, SF).collect()}
    assert rows

    daily = defaultdict(Counter)
    for et, d in duckdb.sql(
        f"SELECT event_type, ts::DATE FROM '{SF}/events.parquet'"
    ).fetchall():
        daily[et][d] += 1
    d0 = min(d for c in daily.values() for d in c)
    for et, c in daily.items():
        pts = sorted((int((d - d0).days), y) for d, y in c.items())
        xt, y_actual = pts[-1]
        train = pts[:-1]
        n = len(train)
        sx = sum(x for x, _ in train)
        sy = sum(y for _, y in train)
        sxy = sum(x * y for x, y in train)
        sxx = sum(x * x for x, _ in train)
        s_num = n * sxy - sx * sy
        i_num = sy * sxx - sx * sxy
        den = n * sxx - sx * sx
        pred_num = i_num + s_num * xt
        err_num = pred_num - y_actual * den
        sign = (err_num > 0) - (err_num < 0)
        r = rows[et]
        assert r["n_train_days"] == n  # test day excluded from training
        assert (r["x_test"], r["y_actual"]) == (xt, y_actual)
        assert (r["pred_num"], r["den"]) == (pred_num, den)
        assert r["err_milli"] == sign * ((1000 * abs(err_num)) // den)
