"""O-21: salted two-phase aggregation for mega-domain skew.

``north_star``: "Skewed mega-domains are handled by salted repartition
before the windowed hash-aggregate."  One fixture domain holds ~40% of
all rows; at 1000 executors a naive groupBy(domain) would send 40% of
the corpus through one task.  Salting splits each hot key across S
partitions for the expensive partial aggregate, then merges the S
partials — the second shuffle moves only #groups × S rows.

The salted plan is semantically identical to the naive one (asserted
in tests) for any algebraic aggregate (count/sum/min/max); exact
count-distinct is NOT salt-mergeable — use approx_count_distinct (HLL
sketches merge) or a two-step distinct-then-count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def salted_window_domain_agg(
    pages: DataFrame,
    salt_buckets: int = 16,
    window: str = "10 minutes",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """Per (window, domain): n_pages, total_chars — salted two-phase.

    Phase 1: groupBy(window, domain, salt) partial agg after an
    explicit repartition on the salted key (breaks the hot partition).
    Phase 2: groupBy(window, domain) merge of the ≤S partials.
    """
    salted = pages.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets)).cast("int")
    ).repartition(F.col("domain"), F.col("__salt"))

    partial = salted.groupBy(
        F.window(F.col(ts_col), window).alias("w"), "domain", "__salt"
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.length(text_col)).alias("pc"),
    )

    return (
        partial.groupBy("w", "domain")
        .agg(F.sum("pn").alias("n_pages"), F.sum("pc").alias("total_chars"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "domain",
            "n_pages",
            "total_chars",
        )
    )


def salted_window_domain_agg_stream(
    pages: DataFrame,
    salt_buckets: int = 16,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "warc_ts",
    text_col: str = "clean_text",
) -> DataFrame:
    """Streaming form of O-21 (north_star: 'salted repartition before
    the windowed hash-aggregate'): chained stateful aggregations —
    partial agg keyed (window, domain, salt) splits a mega-domain's
    rows across S state partitions; the final agg merges the <=S
    partials per (window, domain).  Spark 4 supports chained windowed
    aggregations in append mode; both stages share one watermark.
    """
    salted = (
        pages.withWatermark(ts_col, watermark)
        .withColumn("__salt", F.pmod(F.xxhash64(F.col("url")), F.lit(salt_buckets)).cast("int"))
        .repartition(F.col("domain"), F.col("__salt"))
    )
    partial = salted.groupBy(
        F.window(F.col(ts_col), window).alias("w"), "domain", "__salt"
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.length(text_col)).alias("pc"),
    )
    return (
        partial.groupBy(F.window(F.col("w"), window).alias("w2"), "domain")
        .agg(F.sum("pn").alias("n_pages"), F.sum("pc").alias("total_chars"))
        .select(
            F.col("w2.start").alias("window_start"),
            F.col("w2.end").alias("window_end"),
            "domain",
            "n_pages",
            "total_chars",
        )
    )


def naive_window_domain_agg(
    pages: DataFrame,
    window: str = "10 minutes",
    ts_col: str = "warc_ts",
    text_col: str = "text",
) -> DataFrame:
    """The unsalted plan — equivalence oracle for the salted one."""
    return (
        pages.groupBy(F.window(F.col(ts_col), window).alias("w"), "domain")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length(text_col)).alias("total_chars"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "domain",
            "n_pages",
            "total_chars",
        )
    )
