"""AQE skew-join: the runtime re-plan path that complements the manual
salting of operators/skew.py.  A mega-key join partition is split by
AdaptiveSparkPlan (skew=true on the SortMergeJoin) without any code
change — the 'heavy domain' safety net when skew is discovered at run
time rather than known up front."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # test-scale thresholds so a ~few-MB hot partition counts as skewed
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "16KB",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # one mega-domain (~90% of rows) + a long tail
        big = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit("mega.example.com"))
            .otherwise(F.concat(F.lit("d"), (F.col("id") % 1000).cast("string")))
            .alias("domain"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        dim = spark.range(1001).select(
            F.when(F.col("id") == 1000, F.lit("mega.example.com"))
            .otherwise(F.concat(F.lit("d"), F.col("id").cast("string")))
            .alias("domain"),
            F.col("id").alias("meta"),
        )
        # keep the incompressible payload: shuffle-size metrics see
        # compressed bytes, and 180k copies of one domain string
        # compress to nothing — the sha2 payload makes the hot
        # partition genuinely heavy, like real page text would
        joined = big.join(dim, "domain").select("domain", "payload", "meta")
        # collect THIS df so its own AdaptiveSparkPlan is finalized
        # (count() would execute a different QueryExecution)
        rows = joined.collect()
        assert len(rows) == 200_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
