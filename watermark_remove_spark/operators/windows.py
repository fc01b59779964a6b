"""O-18/O-19/O-22/O-23: event-time windows, sessions, analytic windows.

Batch and streaming share the same builders: each takes a DataFrame
(bounded or streaming) and returns the aggregated DataFrame; streaming
callers apply ``withWatermark`` first (O-24).

Scale notes
-----------
- Tumbling/sliding aggs are single-shuffle hash aggregates; Catalyst
  inserts the partial (map-side) aggregation automatically.
- ``exact`` distinct counting shuffles url strings; the bench path uses
  ``approx_count_distinct`` (HLL, mergeable, no extra shuffle).
- Sliding windows multiply rows by window/slide — keep the projection
  minimal before the explode (Spark expands inside the Expand node).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def lang_window_agg(
    pages: DataFrame,
    window: str = "10 minutes",
    slide: str | None = None,
    ts_col: str = "warc_ts",
    text_col: str = "clean_text",
    exact_distinct: bool = True,
) -> DataFrame:
    """Per (event-time window, lang): n_pages, total_chars, n_urls."""
    w = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    n_urls: Column = (
        F.count_distinct(F.col("url")) if exact_distinct else F.approx_count_distinct("url")
    )
    return (
        pages.groupBy(w.alias("w"), "lang")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum(F.length(text_col)).alias("total_chars"),
            n_urls.alias("n_urls"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
            "total_chars",
            "n_urls",
        )
    )


def domain_session_agg(
    pages: DataFrame, gap: str = "5 minutes", ts_col: str = "warc_ts"
) -> DataFrame:
    """Built-in ``session_window`` variant of O-19 (the
    applyInPandasWithState variant lives in streaming/sessions.py).

    session_end = last event + gap (Spark semantics; oracle matches).
    """
    return (
        pages.groupBy(F.session_window(F.col(ts_col), gap).alias("sw"), "domain")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            "domain",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_pages",
        )
    )


def top_k_domains_per_window(
    window_counts: DataFrame, k: int = 5, order_col: str = "n_pages"
) -> DataFrame:
    """O-22 ranking: row_number over (window) ordered by count desc.

    Deterministic tie-break on domain so engine == oracle exactly.
    """
    w = Window.partitionBy("window_start").orderBy(
        F.col(order_col).desc(), F.col("domain").asc()
    )
    return (
        window_counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .drop("rk")
    )


def lang_domain_rollup(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """O-23 rollup: per-(lang, domain) + per-lang + grand totals in one
    pass (Catalyst Expand node, single shuffle)."""
    return (
        pages.rollup("lang", "domain")
        .agg(F.count(F.lit(1)).alias("n_pages"), F.sum(F.length(text_col)).alias("total_chars"))
        .select("lang", "domain", "n_pages", "total_chars")
    )
