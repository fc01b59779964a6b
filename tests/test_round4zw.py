"""Round-4zw operators: integer power-iteration PCA, Simpson's-paradox
mix-shift audit, per-type trend R^2 admission gate.

Properties proven: the 3-step power iterate equals a numpy integer
replay bit-for-bit and the iterate is actually normalized (max |v| =
1024) with a positive Rayleigh quotient (Gram is PSD); the Simpson
audit's cells reconcile with a Python contingency replay, every
direction obeys the cross-multiplication algebra, and the reversed
flag equals strict sign opposition; the R^2 gate equals a
Fraction-exact moment replay evaluated through the same float64
expression, R^2 lands in [0, 1e6], and slope_dir is the exact sign of
the covariance numerator.
"""

from __future__ import annotations

from collections import defaultdict
from fractions import Fraction
import math

import duckdb

SF = "/root/testdata/sf0.001"


def test_power_iteration_pca(spark):
    import numpy as np

    from watermark_remove_spark.queries import q285_power_iteration_pca

    got = [tuple(r) for r in q285_power_iteration_pca(spark, SF).collect()]
    assert len(got) == 64

    vecs = duckdb.sql(
        f"SELECT embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    Q = np.array(
        [[int(round(float(x) * 128)) for x in v] for (v,) in vecs],
        dtype=object,
    )
    A = Q.T @ Q  # exact integer Gram, object dtype = unbounded ints

    def norm(r):
        s = max(abs(int(x)) for x in r)
        return np.array(
            [(1 if int(x) >= 0 else -1) * (abs(int(x)) * 1024 // s) for x in r],
            dtype=object,
        )

    r1 = A @ np.ones(64, dtype=object)
    v1 = norm(r1)
    r2 = A @ v1
    v2 = norm(r2)
    r3 = A @ v2
    v3 = norm(r3)
    num = int(v2 @ r3)
    den = int(v2 @ v2)
    lam = math.floor(1000.0 * float(num) / float(den))

    exp = [
        (i + 1, int(v3[i]), int(r3[i]), lam) for i in range(64)
    ]
    assert got == exp
    # the iterate really is renormalized, and the Gram is PSD
    assert max(abs(v) for (_, v, _, _) in got) == 1024
    assert got[0][3] > 0


def test_simpsons_audit(spark):
    from watermark_remove_spark.queries import q286_simpsons_audit

    got = {r["stratum"]: tuple(r) for r in q286_simpsons_audit(spark, SF).collect()}
    assert len(got) == 24

    cells = defaultdict(lambda: [0, 0, 0, 0])  # n_a, s_a, n_b, s_b
    for uid, h, et in duckdb.sql(
        f"""SELECT user_id, extract(hour FROM ts), event_type
            FROM '{SF}/events.parquet'
            WHERE event_type IN ('view', 'purchase')"""
    ).fetchall():
        c = cells[int(h)]
        off = 0 if uid % 2 == 0 else 2
        c[off] += 1
        if et == "purchase":
            c[off + 1] += 1

    t_na = sum(c[0] for c in cells.values())
    t_sa = sum(c[1] for c in cells.values())
    t_nb = sum(c[2] for c in cells.values())
    t_sb = sum(c[3] for c in cells.values())
    odir = (t_sa * t_nb > t_sb * t_na) - (t_sa * t_nb < t_sb * t_na)

    for h, (n_a, s_a, n_b, s_b) in cells.items():
        sdir = (s_a * n_b > s_b * n_a) - (s_a * n_b < s_b * n_a)
        exp = (
            h, n_a, s_a, n_b, s_b,
            s_a * 1000000 // n_a, s_b * 1000000 // n_b,
            odir, sdir, int(sdir * odir == -1),
        )
        assert got[h] == exp
    # both cohorts live in every stratum (the comparison is non-vacuous)
    assert all(r[1] > 0 and r[3] > 0 for r in got.values())


def test_trend_r2_gate(spark):
    from watermark_remove_spark.queries import q287_trend_r2_gate

    got = {r["event_type"]: tuple(r) for r in q287_trend_r2_gate(spark, SF).collect()}
    assert len(got) == 5

    moments = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for et, ts, val in duckdb.sql(
        f"SELECT event_type, ts, value FROM '{SF}/events.parquet'"
    ).fetchall():
        x = int(math.floor(ts.timestamp())) - 1704067200
        y = int(round(val * 100))
        m = moments[et]
        m[0] += 1
        m[1] += x
        m[2] += y
        m[3] += x * x
        m[4] += y * y
        m[5] += x * y

    for et, (n, sx, sy, sxx, syy, sxy) in moments.items():
        num = n * sxy - sx * sy
        den1 = n * sxx - sx * sx
        den2 = n * syy - sy * sy
        r2_ppm = math.floor(
            float(num) * float(num) / (float(den1) * float(den2)) * 1000000.0
        )
        exp = (et, n, (num > 0) - (num < 0), r2_ppm, int(r2_ppm >= 10000))
        assert got[et] == exp
        # R^2 is a genuine coefficient of determination
        assert 0 <= r2_ppm <= 1000000
        # exact-arithmetic sanity: num^2/(den1*den2) <= 1 (Cauchy-Schwarz)
        assert Fraction(num * num, den1 * den2) <= 1
