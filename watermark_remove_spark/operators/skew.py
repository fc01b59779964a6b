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


_SALTED_JOIN_HOWS = frozenset({"inner", "left", "leftouter", "left_outer"})


def salted_equi_join(
    big: DataFrame,
    dim: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Skew-safe equi-join for a dim table too big to broadcast but
    cheap to replicate S×: the big side gets ``salt = hash(row) % S``
    and the dim side is exploded into S replicas, so the shuffle key
    becomes (key, salt) and a hot key spreads across S partitions
    instead of melting one task — the standard salting answer when the
    40%-of-corpus mega-key meets a sort-merge join at 1000 executors
    (AQE skew-split handles the sorted-run case; explicit salting is
    the deterministic-plan form and works pre-shuffle).

    Semantically identical to ``big.join(dim, on, how)`` for inner and
    left joins: each big row carries exactly ONE salt so it matches
    (or null-extends) exactly once.  right/full outer would emit one
    null-extended row PER dim replica — rejected, like
    range_join_bucketed does.
    """
    if how not in _SALTED_JOIN_HOWS:
        raise ValueError(
            f"salted_equi_join supports {sorted(_SALTED_JOIN_HOWS)}, got {how!r}"
        )
    cols = salt_from or [c for c in big.columns]
    big_s = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salt_buckets)).cast("int")
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return big_s.join(dim_s, [on, "__salt"], how).drop("__salt")
