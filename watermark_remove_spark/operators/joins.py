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


_RANGE_JOIN_HOWS = frozenset(
    {
        "inner",
        "left", "leftouter", "left_outer",
        "semi", "leftsemi", "left_semi",
        "anti", "leftanti", "left_anti",
    }
)


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    keys: list[str] | None = None,
    bucket_seconds: int | None = 900,
    how: str = "inner",
    max_replication: int = 64,
) -> DataFrame:
    """Range (interval-containment) join that stays an EQUI-join.

    Matches each fact row to every interval row with
    ``start <= fact_ts < end`` (and equal ``keys``, if given).  Spark
    plans a bare inequality join as BroadcastNestedLoopJoin — O(n*m)
    and a scale-killer when neither side is small.  The chunked
    strategy makes it shuffle-partitionable: quantize time into
    ``bucket_seconds`` chunks, replicate each interval into every
    chunk it overlaps (``sequence`` + ``explode``), tag each fact with
    its single chunk, and join on (keys..., chunk) equality WITH the
    exact range predicate in the join condition (so ``how='left'``
    correctly null-extends unmatched facts).  Each fact lives in
    exactly one chunk, so a (fact, interval) pair meets at most once —
    no dedup needed.

    ``how`` is restricted to joins where the INTERVAL side's chunk
    replication cannot duplicate output: inner, the left-* family
    (facts live in exactly one chunk), and semi/anti.  ``right`` or
    ``full`` would emit one null-extended row PER chunk replica of an
    unmatched interval — silently duplicated output — so they raise.
    Interval-side outer semantics are expressible as two passes:
    the inner join plus an anti-join of intervals against its
    matched interval ids.

    Pick ``bucket_seconds`` near the TYPICAL interval length: an
    interval spans ~(len/bucket + 1) chunks, so the replication factor
    stays ~2; buckets much smaller than intervals inflate the
    interval side, much larger ones inflate the per-chunk join
    fan-out.  Both effects are data-linear, never quadratic.

    ``bucket_seconds=None`` auto-sizes from the interval-length
    distribution in ONE bounded aggregate (median + max, 2 scalar
    values collected): bucket = max(median_len, max_len /
    ``max_replication``) — typical intervals replicate ~2× while a
    heterogeneous long tail (30-day validity intervals among 15-min
    incidents) is capped at ``max_replication`` replicas instead of
    exploding into thousands of chunks
    (tests/test_range_join.py::test_mixed_interval_lengths_bounded).

    ``tests/test_range_join.py`` asserts the plan contains a real
    equi-join (SortMergeJoin/ShuffledHashJoin path available — no
    BroadcastNestedLoopJoin) and that results equal the naive range
    join.
    """
    hw = how.lower().replace("_", "").replace("outer", "")
    if hw not in {"inner", "left", "semi", "leftsemi", "anti", "leftanti"}:
        raise ValueError(
            f"range_join_bucketed: how={how!r} unsupported — interval "
            "chunk replication would duplicate null-extended output for "
            f"right/full joins; allowed: {sorted(_RANGE_JOIN_HOWS)}"
        )
    keys = keys or []
    if bucket_seconds is None:
        len_s = (
            F.unix_micros(F.col(end_col).cast("timestamp"))
            - F.unix_micros(F.col(start_col).cast("timestamp"))
        ) / 1_000_000.0
        stats = intervals.agg(
            F.percentile_approx(len_s, 0.5).alias("med"),
            F.max(len_s).alias("mx"),
        ).first()
        med = float(stats["med"] or 0.0)
        mx = float(stats["mx"] or 0.0)
        bucket_seconds = max(int(max(med, mx / max_replication)), 1)
    w_us = int(bucket_seconds) * 1_000_000

    def us(col):
        # cast: parquet TIMESTAMP_NTZ columns (pandas-written fixtures)
        # are rejected by unix_micros; the session tz is pinned UTC so
        # the cast is a pure type change, applied uniformly to all
        # three time columns
        return F.unix_micros(F.col(col).cast("timestamp"))

    f = facts.withColumn("__chunk", F.floor(us(fact_ts) / w_us))
    i = (
        intervals.withColumn(
            "__chunk",
            F.explode(
                F.sequence(
                    F.floor(us(start_col) / w_us),
                    # end is exclusive: last chunk holds end - 1 microsecond
                    F.floor((us(end_col) - 1) / w_us),
                )
            ),
        )
    )
    # The exact range predicate is part of the JOIN CONDITION, not a
    # post-join filter: a post-filter silently turns any outer join
    # back into an inner one (null-extended rows fail the predicate).
    # Spark still extracts the equalities for an equi-join plan and
    # evaluates the range residual at the join — asserted NLJ-free in
    # tests/test_range_join.py and tools/explain_audit.py.
    i2 = i
    for k in keys:
        i2 = i2.withColumnRenamed(k, f"__r_{k}")
    i2 = i2.withColumnRenamed("__chunk", "__r_chunk")
    cond = F.col("__chunk") == F.col("__r_chunk")
    for k in keys:
        cond = cond & (f[k] == F.col(f"__r_{k}"))
    cond = (
        cond
        & (f[fact_ts] >= F.col(start_col))
        & (f[fact_ts] < F.col(end_col))
    )
    joined = f.join(i2, cond, how)
    return joined.drop("__chunk", "__r_chunk", *[f"__r_{k}" for k in keys])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 900,
) -> DataFrame:
    """Interval x interval OVERLAP join that stays an EQUI-join.

    Matches every (left, right) pair whose half-open intervals
    overlap: ``l_start < r_end AND r_start < l_end`` (plus equal
    ``keys`` if given).  The sibling of :func:`range_join_bucketed`
    (point-in-interval): here BOTH sides are intervals, so both sides
    chunk-explode and a pair would meet once per SHARED chunk — the
    dedup discipline is to emit the pair only in the chunk containing
    the overlap's first instant, ``floor(max(l_start, r_start) /
    bucket)``, which both sides can compute inside the join
    condition, so each overlapping pair meets EXACTLY once and no
    post-join distinct is needed.  Inner join only (outer semantics
    over replicated chunks would need the two-pass form documented on
    range_join_bucketed).

    Same scale shape as range_join_bucketed: replication per row is
    ~(interval_len / bucket + 1), the join itself is a plain
    (keys..., chunk) equi-join with the exact overlap predicate as a
    residual — never a BroadcastNestedLoopJoin."""
    keys = keys or []
    w_us = int(bucket_seconds) * 1_000_000

    def us(side, col):
        return F.unix_micros(side[col].cast("timestamp"))

    def chunked(df, start, end, prefix):
        return df.withColumn(
            f"__{prefix}chunk",
            F.explode(
                F.sequence(
                    F.floor(F.unix_micros(F.col(start).cast("timestamp")) / w_us),
                    F.floor(
                        (F.unix_micros(F.col(end).cast("timestamp")) - 1) / w_us
                    ),
                )
            ),
        )

    lf = chunked(left, l_start, l_end, "l")
    rf = chunked(right, r_start, r_end, "r")
    for k in keys:
        rf = rf.withColumnRenamed(k, f"__r_{k}")
    cond = F.col("__lchunk") == F.col("__rchunk")
    for k in keys:
        cond = cond & (lf[k] == F.col(f"__r_{k}"))
    cond = (
        cond
        & (us(lf, l_start) < us(rf, r_end))
        & (us(rf, r_start) < us(lf, l_end))
        # meet-once discipline: only the chunk holding the overlap's
        # first instant emits the pair
        & (
            F.floor(
                F.greatest(us(lf, l_start), us(rf, r_start)) / w_us
            )
            == F.col("__lchunk")
        )
    )
    joined = lf.join(rf, cond, "inner")
    out = joined.drop("__lchunk", "__rchunk")
    for k in keys:
        out = out.drop(f"__r_{k}")
    return out


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


def asof_join_union_merge(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    fact_ts: str,
    dim_ts: str,
    dim_cols: list[str],
) -> DataFrame:
    """As-of join where BOTH sides are big: tagged union + running
    last-non-null window — zero joins, ONE shuffle on the key.

    ``asof_join_latest*`` broadcast the dim side; at 100 TB the dim
    (e.g. a rate/template changelog with 10^9 versions) may itself
    dwarf executor memory, and a range join would replicate intervals.
    The union-merge form sorts each key's partition of the UNION of
    both relations by (ts, side) — dim rows sort BEFORE facts at equal
    ts, so ``fact.ts >= dim.ts`` ties attribute inclusively — and
    carries each dim column forward with last(ignorenulls) over an
    unbounded-preceding row frame.  Facts with no preceding dim row
    come out null-extended (left-join semantics).

    Contract: ``dim`` must be unique per (key, dim_ts) — pre-aggregate
    otherwise (at equal ts the carried value would depend on intra-ts
    order) — and ``dim_cols`` must be disjoint from fact columns.
    """
    overlap = set(dim_cols) & set(facts.columns)
    if overlap:
        raise ValueError(f"dim_cols overlap fact columns: {sorted(overlap)}")
    if key not in facts.columns or fact_ts not in facts.columns:
        raise ValueError(f"facts must carry {key!r} and {fact_ts!r}")
    d = dim.select(
        F.col(key), F.col(dim_ts).alias(fact_ts), *dim_cols
    ).withColumn("__side", F.lit(0))
    f = facts.withColumn("__side", F.lit(1))
    u = f.unionByName(d, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(fact_ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in dim_cols:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.where(F.col("__side") == 1).drop("__side")
