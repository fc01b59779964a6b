"""Portable HDR-style histogram quantile sketch — bounded-state,
mergeable, and INTEGER-EXACT, so the driver's DuckDB oracle can check
every output bit like an exact query.

Exact quantiles need a full sort (q36); on an unbounded stream or a
100 TB corpus the engine needs a sketch.  Spark's own options are
``percentile_approx`` (KMV/GK black box — un-checkable by an external
oracle, and unusable in streaming aggregation) or nothing.  This
sketch fixes every degree of freedom with pure integer arithmetic:

- bin id for a non-negative BIGINT v (HdrHistogram / DDSketch-family
  log-linear layout, 4 sub-bucket bits):
      bl    = length(bin(v))          -- bit length, unpadded in BOTH engines
      shift = max(bl - 5, 0)
      bin   = shift * 16 + (v >> shift)
  i.e. values < 32 are exact; above that each power-of-two range is
  split into 16 linear sub-buckets -> relative error <= 1/16, and at
  most 16 + 16*59 bins for the full BIGINT range (bounded state);
- bin lower bound (the reported quantile value — a real attainable
  input value, not an interpolation):
      lower(b) = b                                if b < 32
               = ((b % 16) + 16) << (b / 16 - 1)  otherwise
- quantile rule (nearest-rank): the p-th percentile is the lower
  bound of the first bin whose cumulative count reaches
  ceil(p/100 * N), with the ceiling computed in INTEGER arithmetic:
      target_p = (N * p + 99) div 100
  so there is no float anywhere in the checked surface.

The per-(group, bin) count table is the MERGEABLE intermediate:
counts of a finer grouping roll up to a coarser one by plain ``sum``
— the same lossless-rollup contract as ``hll_registers``
(sketches.py).  Reference scaffold has no sketches (282-LoC
PIL/FastAPI app, SURVEY.md §0); engine-native depth per the graft
mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

SUB_BITS = 4
SUB = 1 << SUB_BITS            # 16 linear sub-buckets per octave
TOP = 2 * SUB                  # values < 32 map to themselves

# (percent, output column) — the checked quantile surface
DEFAULT_QS: tuple[tuple[int, str], ...] = ((50, "p50"), (90, "p90"), (99, "p99"))


def hist_bin_expr(v: Column) -> Column:
    """Log-linear bin id for a non-negative BIGINT column (callers
    filter negatives/NULLs; a negative value has no defined bin)."""
    bl = F.length(F.bin(v))
    shift = F.greatest(bl - F.lit(SUB_BITS + 1), F.lit(0)).cast("int")
    return (
        shift.cast("long") * SUB + F.call_function("shiftright", v, shift)
    ).cast("long")


def hist_lower_expr(b: Column) -> Column:
    """Lower bound of bin ``b`` — the smallest input value mapping to
    it (exact inverse of :func:`hist_bin_expr` on bin boundaries)."""
    return F.when(b < TOP, b).otherwise(
        F.call_function(
            "shiftleft", (b % SUB) + SUB, (b / SUB - 1).cast("int")
        ).cast("long")
    )


def hist_bins(df: DataFrame, group_cols: list[str], value_col: str) -> DataFrame:
    """Per-group bin-count table (group_cols..., __b, __c) — the
    mergeable intermediate.  One fixed-width-key shuffle with map-side
    combine; output bounded at <= 960 rows per group regardless of
    input size (the 100 TB property)."""
    v = F.col(value_col).cast("long")
    return (
        df.where(v.isNotNull() & (v >= 0))
        .select(*group_cols, hist_bin_expr(v).alias("__b"))
        .groupBy(*group_cols, "__b")
        .agg(F.count(F.lit(1)).alias("__c"))
    )


def hist_merge_bins(bins: DataFrame, group_cols: list[str]) -> DataFrame:
    """Roll a bin table up to a coarser grouping — lossless (counts
    are additive), no rescan of the raw data."""
    return bins.groupBy(*group_cols, "__b").agg(F.sum("__c").alias("__c"))


def hist_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: tuple[tuple[int, str], ...] = DEFAULT_QS,
) -> DataFrame:
    """Batch quantiles from the sketch: per group, each requested
    percentile's bin lower bound (BIGINT) plus n_values and n_bins.

    Two linear shuffles: the bin count (bounded per group), then a
    per-group sort of <= 960 bin rows for the cumulative walk — the
    sort is over SKETCH rows, never data rows."""
    bins = hist_bins(df, group_cols, value_col)
    w = Window.partitionBy(*group_cols).orderBy("__b")
    wall = Window.partitionBy(*group_cols)
    cum = bins.select(
        *group_cols,
        "__b",
        "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wall).alias("__total"),
    )
    lower = hist_lower_expr(F.col("__b"))
    aggs = [
        F.min(
            F.when(
                F.col("__cum") >= F.expr(f"(__total * {pct} + 99) div 100"),
                lower,
            )
        ).alias(name)
        for pct, name in qs
    ]
    return cum.groupBy(*group_cols).agg(
        *aggs,
        F.max("__total").alias("n_values"),
        F.count(F.lit(1)).alias("n_bins"),
    )


def hist_quantiles_windowed_stream(
    stream: DataFrame,
    value_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("lang",),
    ts_col: str = "warc_ts",
    qs: tuple[tuple[int, str], ...] = DEFAULT_QS,
) -> DataFrame:
    """STREAMING windowed quantiles: chained stateful aggregations
    (the q53 ``hll_windowed_stream`` pattern) — stage 1 counts per
    (window, group, bin) with state bounded at <= 960 rows per group,
    stage 2 collects the bin rows into a sorted array and walks the
    cumulative sum with an integer fold (``F.aggregate``) per
    percentile.  No window functions (illegal on streams), no floats,
    no Python.  Append mode: rows are final when the watermark closes
    the window."""
    v = F.col(value_col).cast("long")
    regs = (
        stream.where(v.isNotNull() & (v >= 0))
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            *group_cols,
            hist_bin_expr(v).alias("__b"),
        )
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    agg = regs.groupBy(F.window(F.col("w"), window).alias("w2"), *group_cols).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("__b").alias("b"), F.col("__c").alias("c")))
        ).alias("__bins"),
        F.sum("__c").alias("n_values"),
        F.count(F.lit(1)).alias("n_bins"),
    )

    def q_col(pct: int) -> Column:
        target = F.expr(f"(n_values * {pct} + 99) div 100")
        zero = F.struct(
            F.lit(0).cast("long").alias("cum"), F.lit(-1).cast("long").alias("ans")
        )
        fold = F.aggregate(
            F.col("__bins"),
            zero,
            lambda acc, x: F.when(acc.ans >= 0, acc).otherwise(
                F.struct(
                    (acc.cum + x.c).alias("cum"),
                    F.when(
                        acc.cum + x.c >= target, hist_lower_expr(x.b)
                    ).otherwise(F.lit(-1).cast("long")).alias("ans"),
                )
            ),
        )
        return fold.getField("ans")

    return agg.select(
        F.col("w2.start").alias("window_start"),
        *group_cols,
        *[q_col(pct).alias(name) for pct, name in qs],
        "n_values",
        "n_bins",
    )


def duck_hist_bin(v: str) -> str:
    """DuckDB SQL mirror of :func:`hist_bin_expr` — THE one copy
    (ORACLE_Q71/Q72/Q80 all format this; a binning change that missed
    an inline copy would silently de-sync quantiles from boundaries).
    The 5 / 16 constants are SUB_BITS+1 / SUB with SUB_BITS=4."""
    return (
        f"greatest(length(bin({v})) - 5, 0) * 16"
        f" + ({v} >> greatest(length(bin({v})) - 5, 0))"
    )
