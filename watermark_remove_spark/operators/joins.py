"""O-15/O-16/O-17: joins — broadcast, semi/anti, and batch as-of.

The streaming watermark-bounded stream-stream join lives in
``streaming/pipeline.py``; this module holds the batch forms the
correctness harness cross-checks, plus the as-of (latest template
version at event time) resolution used by both.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """O-16: explicit broadcast of the small dim — no shuffle of the
    big side, regardless of autoBroadcastJoinThreshold."""
    return big.join(F.broadcast(small), on, how)


def semi_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """O-17 left_semi: rows of df with a match — no duplication."""
    return df.join(keys, on, "left_semi")


def anti_join(df: DataFrame, keys: DataFrame, on) -> DataFrame:
    """O-17 left_anti: 'pages with no template' diagnostics."""
    return df.join(keys, on, "left_anti")


def asof_join_latest(
    left: DataFrame,
    right: DataFrame,
    partition_col: str = "domain",
    left_ts: str = "warc_ts",
    right_ts: str = "valid_from",
) -> DataFrame:
    """Batch as-of join: for each left row, the single right row with
    the greatest ``right_ts <= left_ts`` in the same partition key.

    Strategy: range-join then latest-wins via row_number — the right
    side (template changelog: a few versions per domain) is tiny, so
    the range join broadcasts and the window dedup touches only
    left×versions rows, never exploding beyond #versions per row.
    """
    # a synthetic row id makes the dedup window safe for DUPLICATE
    # left rows (e.g. pre-dedup pages): without it, N identical left
    # rows would collapse to one output row — silent data loss
    left = left.withColumn("__rid", F.monotonically_increasing_id())
    r = right.select(
        F.col(partition_col).alias("__k"), F.col(right_ts).alias("__vf"), *[
            c for c in right.columns if c not in (partition_col, right_ts)
        ]
    )
    joined = left.join(
        F.broadcast(r),
        (left[partition_col] == F.col("__k")) & (F.col("__vf") <= left[left_ts]),
        "left",
    )
    w = Window.partitionBy(F.col("__rid")).orderBy(F.col("__vf").desc())
    # per-row-id partitioning is heavy at scale; callers with a unique
    # key should prefer asof_join_latest_by_key
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__k", "__rid")
        .withColumnRenamed("__vf", right_ts)
    )


def asof_join_latest_by_key(
    left: DataFrame,
    right: DataFrame,
    unique_key: list[str],
    partition_col: str = "domain",
    left_ts: str = "warc_ts",
    right_ts: str = "valid_from",
) -> DataFrame:
    """As-of join where ``unique_key`` identifies left rows — the
    window dedup partitions on the key columns only (cheap)."""
    extra = [c for c in right.columns if c not in (partition_col, right_ts)]
    r = right.select(
        F.col(partition_col).alias("__k"), F.col(right_ts).alias("__vf"), *extra
    )
    joined = left.join(
        F.broadcast(r),
        (left[partition_col] == F.col("__k")) & (F.col("__vf") <= left[left_ts]),
        "left",
    )
    w = Window.partitionBy(*unique_key).orderBy(F.col("__vf").desc_nulls_last())
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__k")
        .withColumnRenamed("__vf", right_ts)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    The 100-TB co-location pattern: two tables bucketed identically on
    the join key are joined WITHOUT any Exchange (and, when sorted,
    without a Sort) — the scan itself satisfies the join's required
    distribution.  The plan guarantee is asserted in
    ``tests/test_bucketing.py::test_bucketed_join_is_shuffle_free``.
    """
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, key)
    if sort:
        w = w.sortBy(key)
    w.saveAsTable(table)
