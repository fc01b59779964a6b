"""Partition pruning evidence: a lang-partitioned corpus layout must
prune non-matching partitions AT PLANNING (PartitionFilters on the
scan), and residual predicates must still push to parquet.

At 100 TB the corpus is laid out hive-partitioned (lang=/dt=); a scan
that lists every partition for a single-lang query re-reads the world.
This pins the behavior the layout is designed for.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _formatted_plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_partition_pruning_and_residual_pushdown(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "bylang")
    docs.write.partitionBy("lang").parquet(out)

    part = spark.read.parquet(out)
    q = part.where((F.col("lang") == "en") & (F.col("n_chars") > 100)).select(
        "doc_id", "n_chars"
    )
    plan = _formatted_plan(q)

    # lang reaches PartitionFilters (pruned at listing, not post-scan)
    assert "PartitionFilters" in plan
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "lang" in pf
    # the non-partition predicate still pushes to the parquet reader
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "n_chars" in pushed
    # and values are right
    expected = docs.where(
        (F.col("lang") == "en") & (F.col("n_chars") > 100)
    ).count()
    assert q.count() == expected


def test_pruned_scan_never_touches_other_partitions(spark, tmp_path):
    """Behavioral proof, stronger than any plan string: corrupt every
    non-en partition's files on disk — a query filtered to lang=en
    must still succeed (the pruned scan never opens those files),
    while an unpruned full scan must fail on the garbage."""
    import glob

    import pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "bylang2")
    docs.write.partitionBy("lang").parquet(out)
    expected_en = docs.where(F.col("lang") == "en").count()
    schema = spark.read.parquet(out).schema  # before corruption

    for f in glob.glob(f"{out}/lang=*/*.parquet"):
        if "/lang=en/" not in f:
            with open(f, "wb") as fh:
                fh.write(b"not a parquet file")

    # explicit schema: loading must not open any footer; only the
    # pruned partition's files are ever read
    part = spark.read.schema(schema).parquet(out)
    assert part.where(F.col("lang") == "en").count() == expected_en
    with pytest.raises(Exception):
        part.count()
