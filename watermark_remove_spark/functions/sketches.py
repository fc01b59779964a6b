"""Portable HyperLogLog — an approximate-distinct sketch whose every
output bit is ENGINE-EXACT, so the driver's DuckDB oracle can check it
like any exact query.

Spark's built-in ``approx_count_distinct`` is a black-box HLL++ whose
estimate depends on internal hashing — un-checkable by an external
oracle.  This implementation fixes every degree of freedom:

- hash: the repo's portable 60-bit md5 scheme (``portable_hash``);
- p = 8 -> m = 256 registers; bucket = h & 255, w = h >> 8 (52 bits);
- rho(w) = leading-zero rank = 53 - bitlength(w)  (w == 0 -> 53),
  computed via ``length(bin(w))`` — unpadded in BOTH engines;
- the harmonic sum is kept in SCALED INTEGER form:
      S = sum_j 2^(53 - M_j)   (empty registers contribute 2^53)
  max 256 * 2^53 = 2^61 < 2^63, so S is exact BIGINT arithmetic in
  both engines — no float accumulation order to diverge;
- raw estimate = alpha_m * m^2 * 2^53 / S: ONE double division of two
  exactly-agreed values -> bit-identical.

The standard small-range (linear counting) correction needs ln(),
whose last-ulp behavior is libm-specific, so the oracle-checked
surface exposes (register_scale_sum, empty_registers, estimate_raw)
and :func:`hll_corrected_estimate` applies the correction for users
(accuracy asserted in pytest, not hash-compared).

Reference scaffold has no sketches (282-LoC PIL/FastAPI app, see
SURVEY.md §1); this is engine-native depth per the graft mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .portable_hash import md5_i64_expr

P = 8
M_REGISTERS = 1 << P          # 256
W_BITS = 60 - P               # 52 usable bits after the bucket
K = W_BITS + 1                # 53: rho range is 1..53
ALPHA = 0.7213 / (1.0 + 1.079 / M_REGISTERS)
# alpha * m^2 * 2^K, precomputed in Python and inlined as ONE double
# literal on both engines (never re-derived in either engine's
# arithmetic): repr() round-trips the exact float64
A_SCALED = ALPHA * M_REGISTERS * M_REGISTERS * float(1 << K)


def hll_bucket_expr(value: Column, salt: str = "hll#") -> Column:
    return md5_i64_expr(value, salt=salt).bitwiseAND(F.lit(M_REGISTERS - 1))


def hll_rho_expr(value: Column, salt: str = "hll#") -> Column:
    w = F.shiftright(md5_i64_expr(value, salt=salt), P)
    return F.when(w == F.lit(0), F.lit(K)).otherwise(
        F.lit(K) - F.length(F.bin(w))
    )


def hll_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt: str = "hll#",
) -> DataFrame:
    """Per-group HLL: (register_scale_sum BIGINT, empty_registers
    BIGINT, estimate_raw DOUBLE).

    Two linear shuffles: (group, bucket) register max — bounded at
    m=256 rows per group regardless of input size, the whole point of
    a sketch at 100 TB — then the per-group fold.  Register maxes
    combine map-side, so the shuffle carries at most m rows per group
    per partition."""
    regs = hll_registers(df, group_cols, value_col, salt)
    return hll_fold_registers(regs, group_cols)


def hll_registers(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    salt: str = "hll#",
) -> DataFrame:
    """Per-group register table (group_cols..., __b, __m) — the
    MERGEABLE intermediate: registers of a finer grouping roll up to a
    coarser one by a plain ``max`` per (coarse group, __b), losslessly
    (max is associative/idempotent) — no rescan of the raw data."""
    v = F.col(value_col).cast("string")
    # NULL values are NOT members of the distinct set: a NULL hashes to
    # a NULL bucket, which would occupy a register row that contributes
    # no sum term — register_scale_sum would lose one register's 2^K
    # mass and bias the estimate (round-3 advice; both engines filter).
    return (
        df.where(F.col(value_col).isNotNull())
        .select(
            *group_cols,
            hll_bucket_expr(v, salt).alias("__b"),
            hll_rho_expr(v, salt).alias("__r"),
        )
        .groupBy(*group_cols, "__b")
        .agg(F.max("__r").alias("__m"))
    )


def hll_fold_registers(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """Fold a register table into the oracle-checked sketch triple
    (register_scale_sum, empty_registers, estimate_raw) per group."""
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({K} - __m AS INT))")
    agg = regs.groupBy(*group_cols).agg(
        F.sum(term).cast("long").alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    s = F.col("__s_present") + (
        (F.lit(M_REGISTERS) - F.col("__n_present")) * F.lit(1 << K)
    )
    return agg.select(
        *group_cols,
        s.cast("long").alias("register_scale_sum"),
        (F.lit(M_REGISTERS) - F.col("__n_present")).cast("long").alias("empty_registers"),
        (F.lit(A_SCALED) / s.cast("double")).alias("estimate_raw"),
    )


def hll_windowed_stream(
    stream: DataFrame,
    value_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("lang",),
    ts_col: str = "warc_ts",
    salt: str = "hll#",
) -> DataFrame:
    """STREAMING windowed approximate-distinct with the portable HLL:
    chained stateful aggregations (the ``skew.py`` Spark-4 pattern,
    both stages under one watermark) — stage 1 maxes rho per (window,
    group, bucket), stage 2 folds the <=m register rows per (window,
    group) into the scaled-integer sum.

    Spark's streaming aggregation cannot hold ``count_distinct`` state
    (unbounded); its ``approx_count_distinct`` is un-checkable.  This
    keeps state BOUNDED at m=256 rows per (window, group) AND every
    output bit oracle-exact.  Append mode: rows are final when the
    watermark closes the window."""
    v = F.col(value_col).cast("string")
    # same NULL-membership rule as hll_distinct (see comment there)
    regs = (
        stream.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            *group_cols,
            hll_bucket_expr(v, salt).alias("__b"),
        )
        .agg(F.max(hll_rho_expr(v, salt)).alias("__m"))
    )
    term = F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({K} - __m AS INT))")
    agg = regs.groupBy(F.window(F.col("w"), window).alias("w2"), *group_cols).agg(
        F.sum(term).cast("long").alias("__s_present"),
        F.count(F.lit(1)).alias("__n_present"),
    )
    s = F.col("__s_present") + (
        (F.lit(M_REGISTERS) - F.col("__n_present")) * F.lit(1 << K)
    )
    return agg.select(
        F.col("w2.start").alias("window_start"),
        *group_cols,
        s.cast("long").alias("register_scale_sum"),
        (F.lit(M_REGISTERS) - F.col("__n_present")).cast("long").alias("empty_registers"),
        (F.lit(A_SCALED) / s.cast("double")).alias("estimate_raw"),
    )


def hll_corrected_estimate(df: DataFrame) -> DataFrame:
    """Standard HLL small-range correction over :func:`hll_distinct`
    output: linear counting m*ln(m/V) when estimate_raw <= 2.5m and
    empty registers remain.  Uses ln() -> NOT oracle-hash-safe; for
    human consumption and the pytest accuracy bound."""
    m = float(M_REGISTERS)
    lc = F.lit(m) * F.log(F.lit(m) / F.col("empty_registers").cast("double"))
    corrected = F.when(
        (F.col("estimate_raw") <= F.lit(2.5 * m)) & (F.col("empty_registers") > 0),
        lc,
    ).otherwise(F.col("estimate_raw"))
    return df.withColumn("estimate", corrected)


def duck_hll_sql(table: str, group_cols: list[str], value_col: str, salt: str = "hll#") -> str:
    """DuckDB mirror of :func:`hll_distinct` (same registers, same
    scaled-integer sum, same single final division)."""
    g = ", ".join(group_cols)
    hv = f"(('0x' || substr(md5('{salt}' || {value_col}::VARCHAR), 1, 15))::BIGINT)"
    return f"""
WITH br AS (
  SELECT {g}, {hv} & {M_REGISTERS - 1} AS b,
         CASE WHEN ({hv} >> {P}) = 0 THEN {K}
              ELSE {K} - length(bin({hv} >> {P})) END AS r
  FROM {table}
  WHERE {value_col} IS NOT NULL
), regs AS (
  SELECT {g}, b, max(r) AS m FROM br GROUP BY {g}, b
), agg AS (
  SELECT {g},
         CAST(sum(1::BIGINT << ({K} - m)) AS BIGINT) AS s_present,
         count(*) AS n_present
  FROM regs GROUP BY {g}
)
SELECT {g},
       CAST(s_present + (256 - n_present) * (1::BIGINT << {K}) AS BIGINT) AS register_scale_sum,
       CAST(256 - n_present AS BIGINT) AS empty_registers,
       CAST({A_SCALED!r} AS DOUBLE)
         / CAST(s_present + (256 - n_present) * (1::BIGINT << {K}) AS DOUBLE) AS estimate_raw
FROM agg
"""


# ---------------------------------------------------------------------------
# Count-Min sketch — the third portable sketch (HLL = distincts, Bloom =
# membership, CMS = frequencies).  Point-query estimates with the classic
# one-sided error (estimate >= true count), every counter bit-exact in
# both engines: integer increments only, d portable hash rows.
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512           # 2^9 buckets per row


def cms_bucket_exprs(value: Column) -> list[Column]:
    """One bucket column per depth row: md5-portable hash salted per
    row, masked to the width.  The hash family differs per row only by
    the salt string — exactly reproducible in SQL as
    ``md5('cms' || d || '#' || value)``."""
    from .portable_hash import md5_i64_expr

    return [
        md5_i64_expr(value, salt=f"cms{d}#").bitwiseAND(F.lit(CMS_WIDTH - 1))
        for d in range(CMS_DEPTH)
    ]


def cms_sketch(df: DataFrame, value_col: str) -> DataFrame:
    """Build the (depth, bucket, c) counter table: ONE posexplode of
    the d bucket ids per row, then one map-side-combinable count
    shuffle keyed on the fixed-width (depth, bucket) pair.  The sketch
    is at most d*w rows (2048 here) regardless of input size — the
    point of a sketch at 100 TB."""
    v = F.col(value_col).cast("string")
    return (
        df.where(F.col(value_col).isNotNull())
        .select(F.posexplode(F.array(*cms_bucket_exprs(v))).alias("depth", "bucket"))
        .groupBy("depth", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_point_estimate(
    sketch: DataFrame, candidates: DataFrame, value_col: str
) -> DataFrame:
    """min over the d counters each candidate hashes to.  The sketch
    side is <= d*w rows -> broadcast; the probe is a map-side hash
    join, no shuffle of the candidate set."""
    v = F.col(value_col).cast("string")
    probes = candidates.select(
        value_col,
        F.posexplode(F.array(*cms_bucket_exprs(v))).alias("depth", "bucket"),
    )
    return (
        probes.join(F.broadcast(sketch), ["depth", "bucket"])
        .groupBy(value_col)
        .agg(F.min("c").cast("long").alias("cms_est"))
    )


def duck_cms_sql(values_cte: str, value_expr: str = "v") -> str:
    """DuckDB mirror: ``values_cte`` must define ``vals({value_expr})``
    (one row per occurrence, NULLs excluded); yields CTEs ``sketch``
    and a ``cms_est(v, cms_est)`` relation body the caller composes."""
    hv = (
        f"(('0x' || substr(md5('cms' || d.d::VARCHAR || '#' || {value_expr}::VARCHAR),"
        f" 1, 15))::BIGINT) & {CMS_WIDTH - 1}"
    )
    return f"""sketch AS (
  SELECT d.d AS depth, {hv} AS bucket, CAST(count(*) AS BIGINT) AS c
  FROM vals, (SELECT unnest(range({CMS_DEPTH})) AS d) d
  GROUP BY 1, 2
)"""


def cms_windowed_stream(
    stream: DataFrame,
    value_col: str,
    window: str = "30 minutes",
    watermark: str = "10 minutes",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """STREAMING per-window Count-Min sketch: one stateful windowed
    aggregation whose state is bounded at d*w = 2048 counter rows per
    window regardless of stream volume — the frequency analog of
    ``hll_windowed_stream``.  Counters are plain integer sums
    (order-free, merge-associative), so every emitted counter is
    bit-exact vs a batch recount; append mode emits a window's
    counters once the watermark closes it.

    The caller probes the drained sketch batch-side (broadcast, see
    ``cms_point_estimate``) — the monitoring pattern: the stream
    maintains the sketch, dashboards probe it after window close."""
    v = F.col(value_col).cast("string")
    return (
        stream.withWatermark(ts_col, watermark)
        .where(F.col(value_col).isNotNull())
        .select(
            F.col(ts_col),
            F.posexplode(F.array(*cms_bucket_exprs(v))).alias("depth", "bucket"),
        )
        .groupBy(F.window(F.col(ts_col), window).alias("w"), "depth", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(F.col("w.start").alias("window_start"), "depth", "bucket", "c")
    )


# ---------------------------------------------------------------------------
# Bucket-min / occupancy distinct sketch — the min-based complement of
# the rho-based HLL above, and the streaming counterpart of the KMV
# bottom-k sketch (queries.py q142).  The 52-bit hash space is split
# into B buckets by h % B; each bucket keeps its MINIMUM hash.  min is
# idempotent and merge-associative, so the streaming form is two
# chained stateful aggregations with state bounded at B rows per
# (window, group).  The oracle-checked surface is pure-integer:
# n_present (bucket occupancy — the linear-counting statistic, Whang
# et al.) and min_sum (the raw sketch mass; sum <= 256 * 2^52 = 2^60,
# exact BIGINT).  The estimate itself needs ln(), whose last-ulp
# behavior is libm-specific, so — exactly like hll_corrected_estimate
# — :func:`mincount_lc_estimate` applies linear counting for users and
# pytest brackets its accuracy; the hash-compared columns stay
# integer.  (A naive per-bucket sum of M div (min+1) is NOT exposed:
# its expectation is harmonic — ~ln M per single-item bucket — so it
# over-estimates sparse windows by ~36x; occupancy carries the sparse
# regime instead.)
# ---------------------------------------------------------------------------

MC_BUCKETS = 256
MC_HEX = 13                   # 13 hex chars -> 52-bit hash
MC_MAX = 1 << (4 * MC_HEX)


def mc_hash_expr(value: Column, salt: str = "mc#") -> Column:
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), value)), 1, MC_HEX), 16, 10
    ).cast("bigint")


def mincount_windowed_stream(
    stream: DataFrame,
    value_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("lang",),
    ts_col: str = "warc_ts",
    salt: str = "mc#",
) -> DataFrame:
    """STREAMING windowed bucket-min distinct sketch: stage 1 mins the
    52-bit hash per (window, group, h % B) — idempotent, so replayed
    rows cannot move it; stage 2 folds the <= B bucket rows into
    (n_present, min_sum) per (window, group).  State is bounded at
    B = 256 rows per group on an unbounded stream, and every output
    bit is integer arithmetic both engines reproduce exactly."""
    v = F.col(value_col).cast("string")
    h = mc_hash_expr(v, salt)
    regs = (
        stream.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            *group_cols,
            (h % MC_BUCKETS).alias("__b"),
        )
        .agg(F.min(h).alias("__m"))
    )
    agg = regs.groupBy(F.window(F.col("w"), window).alias("w2"), *group_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_present"),
        F.sum("__m").cast("long").alias("min_sum"),
    )
    return agg.select(
        F.col("w2.start").alias("window_start"), *group_cols, "n_present", "min_sum"
    )


def mincount_lc_estimate(df: DataFrame) -> DataFrame:
    """Linear-counting estimate over the sketch's occupancy column:
    n_hat = B * ln(B / (B - n_present)) — accurate while occupancy is
    below ~all-full (n <~ B ln B ~ 1400 at B=256; size B up for bigger
    windows).  Uses ln() -> NOT oracle-hash-safe; for human consumption
    and the pytest accuracy bound, the hll_corrected_estimate split."""
    b = float(MC_BUCKETS)
    full = F.col("n_present") >= F.lit(MC_BUCKETS)
    lc = F.lit(b) * F.log(
        F.lit(b) / (F.lit(b) - F.col("n_present").cast("double"))
    )
    return df.withColumn(
        "estimate", F.when(full, F.lit(None).cast("double")).otherwise(lc)
    )


# ---------------------------------------------------------------------------
# Streaming windowed bottom-k distinct sample (Gibbons-style distinct
# sampling in bucket-min form).  Two chained stateful aggregations:
# stage 1 pins, per (window, group, h % SMP_BUCKETS), the smallest
# (hash, value) struct — idempotent (a replayed row cannot move a
# min) and merge-associative — so state is bounded at SMP_BUCKETS
# rows per (window, group) on an unbounded stream; stage 2 sorts the
# <= SMP_BUCKETS bucket-mins and keeps the SMP_K smallest as the
# window's uniform sample over DISTINCT values (duplicates cannot
# bias it: the min is a set function).  Every kept element is a pure
# function of the input SET, so a batch oracle recomputes the same k
# rows bit-for-bit — unlike rand()-based sampling.
# ---------------------------------------------------------------------------

SMP_BUCKETS = 64
SMP_K = 8


def bottomk_windowed_stream(
    stream: DataFrame,
    value_col: str,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    group_cols: tuple[str, ...] = ("lang",),
    ts_col: str = "warc_ts",
    salt: str = "smp#",
    k: int = SMP_K,
    buckets: int = SMP_BUCKETS,
) -> DataFrame:
    """Per (window, group): array of the k lexicographically smallest
    (hash, value) bucket-min structs — a deterministic uniform sample
    of the window's distinct values with state bounded at `buckets`
    rows per group."""
    v = F.col(value_col).cast("string")
    h = mc_hash_expr(v, salt)
    regs = (
        stream.where(F.col(value_col).isNotNull())
        .withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window).alias("w"),
            *group_cols,
            (h % buckets).alias("__b"),
        )
        .agg(F.min(F.struct(h.alias("h"), v.alias("v"))).alias("__mn"))
    )
    agg = regs.groupBy(F.window(F.col("w"), window).alias("w2"), *group_cols).agg(
        F.slice(F.array_sort(F.collect_list("__mn")), 1, k).alias("sample")
    )
    return agg.select(
        F.col("w2.start").alias("window_start"), *group_cols, "sample"
    )
