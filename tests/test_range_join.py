"""range_join_bucketed: chunked equi-join range join.

Two guarantees: (1) results equal the naive inequality join on a
corpus with edge cases (interval boundaries, multi-chunk intervals,
overlapping intervals, key isolation); (2) the plan joins on an equi
key — no BroadcastNestedLoopJoin, which is what Spark plans for a
bare range predicate and what dies at scale.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from watermark_remove_spark.operators.joins import range_join_bucketed


@pytest.fixture(scope="module")
def fixture(spark):
    base = pd.Timestamp("2026-01-01")

    def t(sec):
        return base + pd.Timedelta(seconds=sec)

    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "user_id": [1, 1, 1, 1, 2, 2, 3],
                "ts": [
                    t(0),      # == interval start (inclusive)
                    t(899),    # just inside
                    t(900),    # == interval end (exclusive) -> out
                    t(2500),   # inside the long interval
                    t(100),    # right key, no interval for user 2 at t
                    t(5000),   # inside user-2 interval
                    t(100),    # user 3: no intervals at all
                ],
                "value": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
            }
        )
    )
    intervals = spark.createDataFrame(
        pd.DataFrame(
            {
                "iid": [10, 11, 12, 13],
                "user_id": [1, 1, 1, 2],
                "start_ts": [t(0), t(2000), t(2400), t(4900)],
                "end_ts": [t(900), t(3800), t(2600), t(5100)],
            }
        )
    )
    return facts, intervals


def test_matches_naive_range_join(spark, fixture):
    facts, intervals = fixture
    got = {
        (r.iid, r.user_id, pd.Timestamp(r.ts))
        for r in range_join_bucketed(
            facts, intervals, "ts", "start_ts", "end_ts",
            keys=["user_id"], bucket_seconds=600,
        ).collect()
    }
    naive = facts.alias("f").join(
        intervals.alias("i"),
        (F.col("f.user_id") == F.col("i.user_id"))
        & (F.col("f.ts") >= F.col("i.start_ts"))
        & (F.col("f.ts") < F.col("i.end_ts")),
    )
    want = {
        (r["iid"], r["user_id"], pd.Timestamp(r["ts"]))
        for r in naive.select("i.iid", "f.user_id", "f.ts").collect()
    }
    assert got == want
    # non-vacuous shape checks: boundary inclusion/exclusion and the
    # overlapping-interval double match
    assert (10, 1, pd.Timestamp("2026-01-01 00:00:00")) in got  # t == start in
    assert all(x[0] != 10 or x[2] != pd.Timestamp("2026-01-01 00:15:00") for x in got)
    assert (11, 1, pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=2500)) in got
    assert (12, 1, pd.Timestamp("2026-01-01") + pd.Timedelta(seconds=2500)) in got


def test_keyless_matches_naive(spark, fixture):
    """keys=[] (global intervals, no partition column) still matches
    the naive join — the chunk is then the ONLY equi key."""
    facts, intervals = fixture
    got = {
        (r.iid, r.user_id, pd.Timestamp(r.ts))
        for r in range_join_bucketed(
            facts, intervals.drop("user_id"), "ts", "start_ts", "end_ts",
            bucket_seconds=600,
        ).collect()
    }
    naive = facts.alias("f").join(
        intervals.drop("user_id").alias("i"),
        (F.col("f.ts") >= F.col("i.start_ts")) & (F.col("f.ts") < F.col("i.end_ts")),
    )
    want = {
        (r["iid"], r["user_id"], pd.Timestamp(r["ts"]))
        for r in naive.select("i.iid", "f.user_id", "f.ts").collect()
    }
    assert got == want


def test_no_nested_loop_join(spark, fixture):
    facts, intervals = fixture
    for ks, ints in [(["user_id"], intervals), ([], intervals.drop("user_id"))]:
        out = range_join_bucketed(
            facts, ints, "ts", "start_ts", "end_ts", keys=ks, bucket_seconds=600
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan
    # the naive KEYLESS range join, by contrast, IS a nested-loop plan
    # — the shape the operator exists to avoid.  (With an equi key
    # present Spark can hash-join and post-filter, but that still
    # hinges on one side broadcasting or the key being selective; the
    # chunked form is safe in both regimes.)
    naive = facts.alias("f").join(
        intervals.drop("user_id").alias("i"),
        (F.col("f.ts") >= F.col("i.start_ts")) & (F.col("f.ts") < F.col("i.end_ts")),
    )
    naive_plan = naive._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in naive_plan


def test_unsupported_how_raises(spark, fixture):
    """right/full would emit one null-extended row per chunk REPLICA of
    an unmatched interval (intervals are exploded across chunks) —
    silent duplication, so the operator refuses them loudly."""
    facts, intervals = fixture
    for how in ("right", "full", "outer", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="unsupported"):
            range_join_bucketed(
                facts, intervals, "ts", "start_ts", "end_ts",
                keys=["user_id"], bucket_seconds=600, how=how,
            )


def test_semi_and_anti_match_naive(spark, fixture):
    """semi/anti are replication-safe (facts live in one chunk) and
    must equal the naive forms."""
    facts, intervals = fixture
    naive_cond_join = facts.alias("f").join(
        intervals.alias("i"),
        (F.col("f.user_id") == F.col("i.user_id"))
        & (F.col("f.ts") >= F.col("i.start_ts"))
        & (F.col("f.ts") < F.col("i.end_ts")),
    )
    matched = {
        (r["user_id"], pd.Timestamp(r["ts"]))
        for r in naive_cond_join.select("f.user_id", "f.ts").collect()
    }
    all_facts = {(r.user_id, pd.Timestamp(r.ts)) for r in facts.collect()}
    semi = range_join_bucketed(
        facts, intervals, "ts", "start_ts", "end_ts",
        keys=["user_id"], bucket_seconds=600, how="left_semi",
    )
    anti = range_join_bucketed(
        facts, intervals, "ts", "start_ts", "end_ts",
        keys=["user_id"], bucket_seconds=600, how="left_anti",
    )
    assert {(r.user_id, pd.Timestamp(r.ts)) for r in semi.collect()} == matched
    assert {
        (r.user_id, pd.Timestamp(r.ts)) for r in anti.collect()
    } == all_facts - matched


def test_mixed_interval_lengths_bounded(spark):
    """Heterogeneous intervals (15-min incidents among 30-day validity
    windows): auto-sized bucket (bucket_seconds=None) keeps the
    interval side's chunk replication bounded at max_replication while
    matching the naive join exactly.  With the q43-style fixed 900 s
    bucket a 30-day interval would replicate into 2881 chunks."""
    base = pd.Timestamp("2026-01-01")

    def t(sec):
        return base + pd.Timedelta(seconds=sec)

    month = 30 * 24 * 3600
    ivals = pd.DataFrame(
        {
            "iid": list(range(12)),
            "user_id": [1] * 6 + [2] * 6,
            "start_ts": [t(i * 1800) for i in range(5)] + [t(0)]
            + [t(i * 1800) for i in range(5)] + [t(900)],
            "end_ts": [t(i * 1800 + 900) for i in range(5)] + [t(month)]
            + [t(i * 1800 + 900) for i in range(5)] + [t(900 + month)],
        }
    )
    facts = pd.DataFrame(
        {
            "user_id": [1, 1, 1, 2, 2, 2],
            "ts": [t(450), t(1200), t(month - 10), t(950), t(3600), t(month + 800)],
            "value": [1.0] * 6,
        }
    )
    fdf, idf = spark.createDataFrame(facts), spark.createDataFrame(ivals)
    max_rep = 16
    got = {
        (r.iid, r.user_id, pd.Timestamp(r.ts))
        for r in range_join_bucketed(
            fdf, idf, "ts", "start_ts", "end_ts",
            keys=["user_id"], bucket_seconds=None, max_replication=max_rep,
        ).collect()
    }
    naive = fdf.alias("f").join(
        idf.alias("i"),
        (F.col("f.user_id") == F.col("i.user_id"))
        & (F.col("f.ts") >= F.col("i.start_ts"))
        & (F.col("f.ts") < F.col("i.end_ts")),
    )
    want = {
        (r["iid"], r["user_id"], pd.Timestamp(r["ts"]))
        for r in naive.select("i.iid", "f.user_id", "f.ts").collect()
    }
    assert got == want and len(got) > 0
    # replication bound: replay the operator's own sizing rule and count
    # the exploded interval side directly
    lens = sorted((ivals["end_ts"] - ivals["start_ts"]).dt.total_seconds())
    bucket = max(int(max(lens[len(lens) // 2], lens[-1] / max_rep)), 1)
    n_chunks = (
        (ivals["end_ts"] - base).dt.total_seconds().sub(1e-6).floordiv(bucket)
        - (ivals["start_ts"] - base).dt.total_seconds().floordiv(bucket)
        + 1
    )
    assert n_chunks.max() <= max_rep + 1, n_chunks.tolist()


def test_left_join_null_extends_unmatched_facts(spark, fixture):
    """how='left' must keep facts with no interval (null-extended) —
    the exact predicate lives in the join condition, not a post-filter
    that would silently turn the outer join back into an inner one."""
    facts, intervals = fixture
    out = range_join_bucketed(
        facts, intervals, "ts", "start_ts", "end_ts",
        keys=["user_id"], bucket_seconds=600, how="left",
    )
    rows = out.collect()
    # every fact appears at least once
    assert {(r.user_id, pd.Timestamp(r.ts)) for r in rows} == {
        (r.user_id, pd.Timestamp(r.ts)) for r in facts.collect()
    }
    # user 3 (no intervals) and user 1 @t900 (boundary-exclusive) are
    # null-extended, matched rows carry their interval
    base = pd.Timestamp("2026-01-01")
    by = {(r.user_id, pd.Timestamp(r.ts)): r for r in rows}
    assert by[(3, base + pd.Timedelta(seconds=100))].iid is None
    assert by[(1, base + pd.Timedelta(seconds=900))].iid is None
    assert by[(1, base)].iid == 10
    # inner results are exactly the non-null subset
    inner = range_join_bucketed(
        facts, intervals, "ts", "start_ts", "end_ts",
        keys=["user_id"], bucket_seconds=600,
    ).count()
    assert sum(1 for r in rows if r.iid is not None) == inner
