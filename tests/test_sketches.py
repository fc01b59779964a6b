"""Portable-HLL accuracy + incremental-dedup / trending non-vacuity.

The DuckDB oracle proves the sketch is ENGINE-EXACT (q49 hash-green);
these tests prove it's a correct HLL — the estimate tracks the exact
distinct count within the theoretical error band — and that q50/q51
fire on real data.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"


def test_hll_accuracy_vs_exact(spark):
    from watermark_remove_spark.functions.sketches import (
        hll_corrected_estimate,
        hll_distinct,
    )

    ev = spark.read.parquet(f"{SF01}/events.parquet")
    est = {
        r.event_type: r.estimate
        for r in hll_corrected_estimate(
            hll_distinct(ev, ["event_type"], "user_id")
        ).collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, n in exact.items():
        # 1.04/sqrt(256) ~ 6.5% std error; allow 4 sigma
        assert abs(est[k] - n) <= max(4 * 1.04 / 16 * n, 8.0), (k, est[k], n)


def test_hll_python_register_parity(spark):
    """Registers computed independently in Python match the Spark
    output's scaled-integer sum — three-way agreement with the DuckDB
    oracle proves no engine-specific hashing leaked in."""
    import hashlib

    from watermark_remove_spark.functions.sketches import (
        K,
        M_REGISTERS,
        P,
        hll_distinct,
    )

    vals = [f"user{i}" for i in range(1000)]
    df = spark.createDataFrame([(v,) for v in vals], ["v"]).withColumn(
        "g", F.lit("all")
    )
    row = hll_distinct(df, ["g"], "v").first()

    regs: dict[int, int] = {}
    for v in vals:
        h = int(hashlib.md5(f"hll#{v}".encode()).hexdigest()[:15], 16)
        b, w = h & (M_REGISTERS - 1), h >> P
        rho = K if w == 0 else K - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(1 << (K - m) for m in regs.values()) + (M_REGISTERS - len(regs)) * (
        1 << K
    )
    assert row.register_scale_sum == s
    assert row.empty_registers == M_REGISTERS - len(regs)


def test_hll_null_values_do_not_bias(spark):
    """NULL values are not distinct-set members: a frame with injected
    NULLs must produce the IDENTICAL sketch (every output bit) as the
    non-null subset — without the filter a NULL occupied a register row
    that contributed no sum term, deflating register_scale_sum."""
    from watermark_remove_spark.functions.sketches import hll_distinct

    vals = [(f"user{i}",) for i in range(500)]
    clean = spark.createDataFrame(vals, ["v"]).withColumn("g", F.lit("all"))
    dirty = spark.createDataFrame(
        vals + [(None,)] * 25, schema="v string"
    ).withColumn("g", F.lit("all"))
    a = hll_distinct(clean, ["g"], "v").first()
    b = hll_distinct(dirty, ["g"], "v").first()
    assert (a.register_scale_sum, a.empty_registers, a.estimate_raw) == (
        b.register_scale_sum,
        b.empty_registers,
        b.estimate_raw,
    )


def test_incremental_dedup_non_vacuous(spark):
    from watermark_remove_spark.queries import q50_incremental_dedup

    rows = q50_incremental_dedup(spark, SF01).collect()
    n_new = sum(r.n_new for r in rows)
    n_seen = sum(r.n_seen for r in rows)
    assert all(r.n_seen + r.n_novel == r.n_new for r in rows)
    assert 0 < n_seen < n_new, "gate must both admit and reject"


def test_incremental_dedup_blocks_exact_dupe(spark):
    """A new doc that is byte-identical to a prior doc MUST be seen."""
    import os
    import tempfile

    import pandas as pd

    tmp = tempfile.mkdtemp(prefix="wrs-incdedup-")
    text = " ".join(f"w{i}" for i in range(50))
    other = " ".join(f"x{i}" for i in range(50))
    pd.DataFrame(
        {
            "doc_id": [0, 1, 3],
            "text": [text, text, other],  # 1 duplicates prior 0; 3 is novel
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(text), len(text), len(other)],
        }
    ).to_parquet(os.path.join(tmp, "documents.parquet"), index=False)
    from watermark_remove_spark.queries import q50_incremental_dedup

    r = q50_incremental_dedup(spark, tmp).first()
    assert (r.n_new, r.n_seen, r.n_novel) == (2, 1, 1)


def test_trending_tokens_shape(spark):
    from watermark_remove_spark.queries import q51_trending_tokens

    rows = q51_trending_tokens(spark, SF01).collect()
    by_hour: dict[int, list] = {}
    for r in rows:
        by_hour.setdefault(r.hour_id, []).append(r)
    assert len(by_hour) > 1
    for hour, rs in by_hour.items():
        ranks = sorted(r.rank for r in rs)
        assert ranks == list(range(1, len(ranks) + 1))
        ordered = sorted(rs, key=lambda r: r.rank)
        # counts non-increasing with rank; ties broken by token asc
        for a, b in zip(ordered, ordered[1:]):
            assert a.n > b.n or (a.n == b.n and a.token < b.token)


def test_streaming_windowed_hll_accuracy(spark):
    """q53's raw estimate is oracle-exact by construction; this proves
    the CORRECTED estimate tracks the true per-window distinct count
    (small-range linear counting dominates at fixture scale)."""
    import pandas as pd  # noqa: F401

    from watermark_remove_spark.functions.sketches import hll_corrected_estimate
    from watermark_remove_spark.queries import (
        _derived_pages_pandas,
        q53_streaming_windowed_hll,
    )

    sf = "/root/testdata/sf0.001"
    out = hll_corrected_estimate(q53_streaming_windowed_hll(spark, sf))
    est = {(r.window_start_epoch, r.lang): r.estimate for r in out.collect()}

    pages, _ = _derived_pages_pandas(sf)
    pages = pages.assign(
        ws=(pages["warc_ts"].astype("int64") // 10**9 // 600) * 600
    )
    exact = pages.groupby(["ws", "lang"])["url"].nunique()
    assert set(est) == set(exact.index)
    for k, n in exact.items():
        assert abs(est[k] - n) <= max(0.25 * n, 3.0), (k, est[k], n)


def test_bloom_no_false_negatives_and_some_false_positives(spark):
    """Bloom soundness: every build key passes; at fixture sizing some
    non-members also pass (the FPR the oracle must reproduce)."""
    from watermark_remove_spark.queries import q54_bloom_join_pruning

    rows = q54_bloom_join_pruning(spark, SF01).collect()
    ev = spark.read.parquet(f"{SF01}/events.parquet")
    exact = {
        r.event_type: r.n
        for r in ev.where(F.col("user_id") % 7 == 0)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert sum(r.n_bloom_candidates for r in rows) > sum(
        r.n_exact_hits for r in rows
    ), "sizing must yield observable false positives"
    for r in rows:
        assert r.n_exact_hits == exact.get(r.event_type, 0)  # no false negatives
        assert r.n_exact_hits <= r.n_bloom_candidates <= r.n_events


def test_bloom_python_parity(spark):
    """The collected bitmap equals an independent Python construction."""
    import hashlib

    from watermark_remove_spark.functions.bloom import (
        BF_BITS,
        BF_K,
        BF_WORDS,
        bloom_build_words,
    )

    keys = [str(k) for k in range(0, 150, 7)]
    df = spark.createDataFrame([(k,) for k in keys], ["user_id"])
    words = bloom_build_words(df, "user_id")

    py = [0] * BF_WORDS
    for k in keys:
        for i in range(BF_K):
            p = int(hashlib.md5(f"bf{i}#{k}".encode()).hexdigest()[:15], 16) % BF_BITS
            py[p // 64] |= 1 << (p % 64)
    # Spark words are signed longs; compare as 64-bit patterns
    assert [w & ((1 << 64) - 1) for w in words] == py


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

def test_cms_estimate_dominates_true_count(spark):
    from collections import Counter

    from pyspark.sql import functions as F

    from watermark_remove_spark.functions.sketches import (
        CMS_DEPTH,
        CMS_WIDTH,
        cms_point_estimate,
        cms_sketch,
    )

    vals = [f"tok{i % 97}" for i in range(5000)] + ["hot"] * 400 + [None] * 5
    df = spark.createDataFrame([(v,) for v in vals], "v: string")
    sketch = cms_sketch(df, "v")
    rows = sketch.collect()
    assert len(rows) <= CMS_DEPTH * CMS_WIDTH
    # total counted mass per depth row == number of non-NULL values
    per_depth = {d: 0 for d in range(CMS_DEPTH)}
    for r in rows:
        per_depth[r["depth"]] += r["c"]
    assert set(per_depth.values()) == {5000 + 400}

    truth = Counter(v for v in vals if v is not None)
    cands = df.where(F.col("v").isNotNull()).distinct()
    est = {r["v"]: r["cms_est"] for r in cms_point_estimate(sketch, cands, "v").collect()}
    assert set(est) == set(truth)
    for tok, true_n in truth.items():
        assert est[tok] >= true_n  # one-sided error, always
    # the heavy hitter is far from any collision mass at this size
    assert est["hot"] == truth["hot"]
