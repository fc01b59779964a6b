"""HDR-histogram quantile sketch (functions/histogram.py, q71/q72).

The DuckDB oracle proves the sketch is ENGINE-EXACT (q71/q72
hash-green); these tests prove it is a correct quantile sketch — the
reported lower bound brackets the exact nearest-rank quantile within
the 1/16 relative-error bound — plus the lossless merge contract,
bin/lower inverse consistency, and the NULL/negative filter rule.
"""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from watermark_remove_spark.functions.histogram import (
    SUB,
    TOP,
    hist_bin_expr,
    hist_bins,
    hist_lower_expr,
    hist_merge_bins,
    hist_quantiles,
)

SF01 = "/root/testdata/sf0.01"


def _py_bin(v: int) -> int:
    shift = max(v.bit_length() - 5, 0)
    return shift * SUB + (v >> shift)


def _py_lower(b: int) -> int:
    if b < TOP:
        return b
    return ((b % SUB) + SUB) << (b // SUB - 1)


def test_bin_lower_inverse_and_monotone(spark):
    """Python/Spark bin parity on a boundary-heavy value set; lower()
    is the exact smallest preimage of each bin; bins are monotone."""
    vals = sorted(
        {0, 1, 15, 16, 31, 32, 33, 62, 63, 64, 1000, 2**20, 2**41 + 12345}
    )
    df = spark.createDataFrame([Row(v=v) for v in vals])
    got = (
        df.select("v", hist_bin_expr(F.col("v").cast("long")).alias("b"))
        .withColumn("lower", hist_lower_expr(F.col("b")))
        .orderBy("v")
        .collect()
    )
    prev_b = -1
    for r in got:
        assert r.b == _py_bin(r.v), (r.v, r.b)
        assert r.lower == _py_lower(r.b)
        assert r.lower <= r.v, "lower bound must not exceed the value"
        assert _py_bin(r.lower) == r.b, "lower() must land back in its bin"
        assert r.b >= prev_b, "binning must be monotone"
        prev_b = r.b


def test_quantiles_bracket_exact_within_relative_error(spark):
    """p50/p90/p99 lower bounds must bracket the exact nearest-rank
    quantile: lower <= exact and exact < lower * (1 + 1/16) + 1
    (log-linear layout guarantees sub-bucket width <= lower/16)."""
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    sk = {r.source: r for r in hist_quantiles(docs, ["source"], "n_chars").collect()}
    import math

    pdf = docs.select("source", "n_chars").toPandas()
    for src, g in pdf.groupby("source"):
        vals = sorted(int(x) for x in g.n_chars)
        n = len(vals)
        for pct, name in ((50, "p50"), (90, "p90"), (99, "p99")):
            exact = vals[math.ceil(pct / 100 * n) - 1]
            lo = getattr(sk[src], name)
            assert lo <= exact, (src, name, lo, exact)
            assert exact <= lo + max(lo // SUB, 1), (src, name, lo, exact)
        assert sk[src].n_values == n


def test_merge_is_lossless_and_order_free(spark):
    """Bin tables of disjoint splits merge by plain sum to exactly the
    full-corpus bin table — the rollup contract that lets 1000
    executors sketch independently and combine."""
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    parts = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    merged = hist_merge_bins(
        parts[0]
        .transform(lambda d: hist_bins(d, ["source"], "n_chars"))
        .unionAll(hist_bins(parts[1], ["source"], "n_chars"))
        .unionAll(hist_bins(parts[2], ["source"], "n_chars")),
        ["source"],
    )
    full = hist_bins(docs, ["source"], "n_chars")
    assert merged.exceptAll(full).count() == 0
    assert full.exceptAll(merged).count() == 0


def test_null_and_negative_values_excluded(spark):
    """NULL and negative values are not sketch members: they carry no
    defined bin, and counting them would shift every quantile rank."""
    rows = [Row(g="a", v=v) for v in [1, 2, 3, None, -5, -1, 10]]
    out = hist_quantiles(spark.createDataFrame(rows), ["g"], "v").collect()
    assert len(out) == 1
    assert out[0].n_values == 4  # 1, 2, 3, 10
    assert out[0].p50 == 2
