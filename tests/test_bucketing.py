"""Co-located join via bucketing: the scan satisfies the join's
required distribution, so the physical plan carries ZERO Exchange
(shuffle) nodes — the pattern that keeps the template⨝pages or
dedup-keeper joins shuffle-free on a 100-TB corpus."""

from __future__ import annotations

from pyspark.sql import functions as F

from watermark_remove_spark.operators.joins import write_bucketed


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        a = spark.range(10_000).select(
            F.col("id").alias("user_id"), (F.col("id") % 97).alias("v")
        )
        b = spark.range(5_000).select(
            F.col("id").alias("user_id"), (F.col("id") % 13).alias("w")
        )
        write_bucketed(a, "bkt_a", "user_id", n_buckets=8)
        write_bucketed(b, "bkt_b", "user_id", n_buckets=8)
        ta, tb = spark.table("bkt_a"), spark.table("bkt_b")

        joined = ta.join(tb, "user_id")
        plan = _physical_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # co-located: zero shuffles
        assert joined.count() == 5_000

        # control: the same join on non-bucketed data DOES shuffle
        plain = a.join(b, "user_id")
        assert "Exchange" in _physical_plan(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set("spark.sql.adaptive.enabled", old_aqe)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
