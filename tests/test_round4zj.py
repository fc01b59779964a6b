"""Round-4zj operators: mutual eps-NN pairs, discrete hazard table
with right-censoring, streaming sequence-gap audit.

Properties proven: mutual-NN pairs equal a brute-force Python
reciprocal-NN over the eps radius graph (and the reciprocal filter is
non-vacuous: strictly fewer pairs than one-directional NNs); the
hazard table reconciles against a Python life-table with censoring
(at-risk telescoping, both churned and censored mass present, at-risk
sums to the user count); the streaming gap audit equals the
arithmetic timeline (holes counted exactly, redelivered duplicates
NOT counted, completeness ppm exact).
"""

from __future__ import annotations

from collections import defaultdict
from datetime import date

import duckdb

SF = "/root/testdata/sf0.001"


def test_mutual_nn_matches_bruteforce(spark):
    from watermark_remove_spark.queries import _Q210_EPS, q216_mutual_nn_pairs

    rows = q216_mutual_nn_pairs(spark, SF).collect()
    assert rows

    pts = {
        v: (x, y)
        for v, x, y in duckdb.sql(
            f"""SELECT vec_id, embedding[1]::DOUBLE, embedding[2]::DOUBLE
                FROM '{SF}/embeddings.parquet'"""
        ).fetchall()
    }
    eps2 = _Q210_EPS * _Q210_EPS
    neigh = defaultdict(list)
    ids = sorted(pts)
    for i, a in enumerate(ids):
        xa, ya = pts[a]
        for b in ids[i + 1 :]:
            xb, yb = pts[b]
            d2 = (xa - xb) ** 2 + (ya - yb) ** 2
            if d2 <= eps2:
                d = round(d2**0.5, 6)
                neigh[a].append((d, b))
                neigh[b].append((d, a))
    nn = {s: min(lst) for s, lst in neigh.items()}
    expected = {
        (s, t)
        for s, (d, t) in nn.items()
        if s < t and t in nn and nn[t][1] == s
    }

    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert got == expected
    # reciprocity genuinely filters: fewer mutual pairs than NN edges
    assert 0 < len(got) < len(nn)
    for r in rows:
        d, t = nn[r["id_a"]]
        assert t == r["id_b"] and abs(d - r["dist"]) < 1e-9


def test_hazard_table_life_accounting(spark):
    from watermark_remove_spark.queries import (
        _Q217_END_DAY,
        _Q217_T0,
        q217_discrete_hazard_table,
    )

    rows = sorted(
        q217_discrete_hazard_table(spark, SF).collect(),
        key=lambda r: r["d"],
    )
    assert rows

    t0 = date.fromisoformat(_Q217_T0)
    per_user = duckdb.sql(
        f"""SELECT user_id, min(ts)::DATE, max(ts)::DATE
            FROM '{SF}/events.parquet' GROUP BY 1"""
    ).fetchall()
    durs = defaultdict(lambda: [0, 0])  # d -> [churned, censored]
    for _, fdt, ldt in per_user:
        fd, ld = (fdt - t0).days, (ldt - t0).days
        durs[ld - fd + 1][1 if ld >= _Q217_END_DAY else 0] += 1

    assert {r["d"] for r in rows} == set(durs)
    # at-risk telescopes: at_risk(d) = at_risk(next) + events at d
    total = sum(c + z for c, z in durs.values())
    running = total
    for r in rows:  # ascending d
        assert r["n_churned"] == durs[r["d"]][0]
        assert r["n_censored"] == durs[r["d"]][1]
        assert r["n_at_risk"] == running
        running -= r["n_churned"] + r["n_censored"]
        assert (
            r["hazard_ppm"]
            == r["n_churned"] * 1_000_000 // r["n_at_risk"]
        )
    assert running == 0
    assert sum(r["n_censored"] for r in rows) > 0  # censoring real
    assert sum(r["n_churned"] for r in rows) > 0  # churn real


def test_streaming_seq_gaps_exact(spark):
    from watermark_remove_spark.queries import (
        _Q218_NA,
        _Q218_NB,
        q218_streaming_sequence_gaps,
    )

    rows = q218_streaming_sequence_gaps(spark, SF).collect()
    assert rows

    expected = defaultdict(list)
    for s in range(_Q218_NA):
        if s % 19 != 7:
            expected[(s * 4 // 600 * 600, "feed_a")].append(s)
    for s in range(_Q218_NB):
        if s % 23 != 5:
            expected[(s * 8 // 600 * 600, "feed_b")].append(s)

    from watermark_remove_spark.queries import STATIC_T0_EPOCH

    got = {
        (r["window_start_epoch"] - STATIC_T0_EPOCH, r["feed"]): r
        for r in rows
    }
    assert set(got) == set(expected)
    some_missing = False
    for k, seqs in expected.items():
        r = got[k]
        span = max(seqs) - min(seqs) + 1
        assert r["n_received"] == len(seqs)  # duplicates NOT counted
        assert r["seq_min"] == min(seqs) and r["seq_max"] == max(seqs)
        assert r["n_missing"] == span - len(seqs)
        assert r["completeness_ppm"] == len(seqs) * 1_000_000 // span
        some_missing = some_missing or r["n_missing"] > 0
    assert some_missing  # the holes are really on the audit
