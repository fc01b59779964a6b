"""Registry block q161-q212 — split verbatim from the
single-module catalog (round-4 verdict #2); execution order,
names and behavior identical to the original queries.py."""
from __future__ import annotations

from .block_q131_q176 import *  # noqa: F401,F403
from .block_q131_q176 import __all__ as _prev_all



ORACLE_Q161 = """
WITH firsts AS (
  SELECT user_id, event_type, min(ts) AS t
  FROM events WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2
),
lat AS (
  -- floor(epoch(...)) to mirror Spark unix_timestamp's truncation;
  -- a bare epoch()::BIGINT cast ROUNDS in DuckDB and coin-flips
  -- boundary rows on microsecond-bearing timestamps (the q184 bug)
  SELECT v.t::DATE AS cohort_day,
         (floor(epoch(p.t))::BIGINT - floor(epoch(v.t))::BIGINT) // 3600
           AS lat_h
  FROM firsts v JOIN firsts p USING (user_id)
  WHERE v.event_type = 'view' AND p.event_type = 'purchase'
    AND p.t >= v.t
),
hist AS (
  SELECT cohort_day, lat_h, count(*) AS cnt FROM lat GROUP BY 1, 2
),
cum AS (
  SELECT cohort_day, lat_h, cnt,
         sum(cnt) OVER (PARTITION BY cohort_day ORDER BY lat_h) AS cum,
         sum(cnt) OVER (PARTITION BY cohort_day) AS tot
  FROM hist
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(max(tot) AS BIGINT) AS n_users,
       CAST(min(CASE WHEN 100 * cum >= 50 * tot THEN lat_h END) AS BIGINT)
         AS p50_hours,
       CAST(min(CASE WHEN 100 * cum >= 90 * tot THEN lat_h END) AS BIGINT)
         AS p90_hours
FROM cum GROUP BY cohort_day
"""


# ---------------------------------------------------------------------------
# q162: per-file Bloom-filter data-skipping audit (point-lookup planning)
# ---------------------------------------------------------------------------

_Q162_FILE_W = 64  # docs per simulated file (row bucket)
_Q162_BITS = 64  # deliberately UNDERSIZED (q54 discipline): real FPs at fixture scale
_Q162_K = 2


def q162_bloom_file_skipping_audit(spark, sf_dir):
    """Per-file Bloom-filter data-skipping audit — the point-lookup
    complement of q153's zone maps (zones prune RANGE predicates on
    clustered columns; equality lookups on unclustered keys need
    per-file Bloom filters — what Parquet bloom_filter_enabled and
    Iceberg's bloom write properties do): simulate files as fixed
    64-doc buckets, build each file's DELIBERATELY UNDERSIZED 64-bit / 2-hash Bloom (the
    q54 discipline — FPs must actually occur at fixture scale for the
    oracle to reproduce them; production sizes ~10 bits/key) over its
    docs' HEAD TOKENS (functions/bloom.py construction — portable md5
    positions, UBIGINT-safe words), and replay a 10-key point-lookup
    workload: a file is scanned iff its bloom says maybe.  Output per
    key: files truly containing it, bloom-maybe files (false positives
    = wasted scans, reproduced bit-for-bit by the oracle — the q54
    discipline), and the scan fraction in ppm.

    Scale shape: bloom build is ONE (file, word) bit_or agg (the
    corpus never shuffles wider than a position); the workload is a
    broadcast key relation probed against the per-file word rows via
    a word-index equi-join; exact containment is a semi-style join of
    the distinct (file, head) relation."""
    docs = _t(spark, sf_dir, "documents")
    first_line = F.element_at(F.split(F.col("text"), "\n", -1), 1)
    heads = docs.select(
        F.expr(f"doc_id div {_Q162_FILE_W}").alias("f"),
        F.element_at(tokens_expr(first_line), 1).alias("head"),
    )
    pos = heads.select(
        "f",
        F.explode(
            F.array(
                *[
                    (md5_i64_expr(F.col("head"), f"bf{i}#") % _Q162_BITS)
                    for i in range(_Q162_K)
                ]
            )
        ).alias("p"),
    )
    words = (
        pos.select(
            "f",
            F.expr("p div 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias("m"),
        )
        .groupBy("f", "w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    keys = spark.createDataFrame(
        [(k,) for k in _Q162_WORKLOAD], "key string"
    ).select(
        "key",
        *[
            (md5_i64_expr(F.col("key"), f"bf{i}#") % _Q162_BITS).alias(f"p{i}")
            for i in range(_Q162_K)
        ],
    )
    # per (file, key): every probe position must find its bit set;
    # join words on the word index of each position
    probes = keys.select(
        "key", F.explode(F.array(*[F.col(f"p{i}") for i in range(_Q162_K)])).alias("p")
    )
    tests = (
        words.join(
            F.broadcast(probes), F.col("w") == F.expr("p div 64")
        )
        .withColumn(
            "hit", F.expr("(shiftright(bits, CAST(p % 64 AS INT)) & 1) = 1")
        )
        .groupBy("f", "key")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.expr("CASE WHEN hit THEN 1 ELSE 0 END")).alias("n_hit"),
        )
        .withColumn("maybe", F.expr(f"n_probes = {_Q162_K} AND n_hit = {_Q162_K}"))
    )
    truth = heads.distinct().withColumnRenamed("head", "key").withColumn(
        "present", F.lit(1)
    )
    nf = docs.agg(
        F.countDistinct(F.expr(f"doc_id div {_Q162_FILE_W}")).alias("n_files")
    )
    return (
        tests.join(truth, ["f", "key"], "left")
        .groupBy("key")
        .agg(
            F.sum(F.expr("CASE WHEN maybe THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_maybe"),
            F.sum(F.coalesce(F.col("present"), F.lit(0)))
            .cast("bigint")
            .alias("n_true"),
            F.sum(
                F.expr(
                    "CASE WHEN maybe AND present IS NULL THEN 1 ELSE 0 END"
                )
            )
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .crossJoin(F.broadcast(nf))
        .select(
            "key",
            F.col("n_files").cast("bigint").alias("n_files"),
            "n_maybe",
            "n_true",
            "n_false_pos",
            F.expr("CAST((n_maybe * 1000000) div n_files AS BIGINT)").alias(
                "scan_ppm"
            ),
        )
    )


# 10-key point-lookup workload: head tokens spanning rare -> common
_Q162_WORKLOAD = [
    "big", "group", "small", "order", "window",
    "stream", "batch", "spark", "line", "hash",
]


def _oracle_q162() -> str:
    keys = ", ".join(f"('{k}')" for k in _Q162_WORKLOAD)
    hp = lambda expr, i: f"({duck_md5_i64(expr, salt=f'bf{i}#')} % {_Q162_BITS})"
    return f"""
WITH heads AS (
  SELECT doc_id // {_Q162_FILE_W} AS f,
         (list_filter(string_split(string_split(text, chr(10))[1], ' '),
                      t -> t <> ''))[1] AS head
  FROM documents
),
pos AS (
  SELECT f, unnest([{', '.join(hp('head', i) for i in range(_Q162_K))}]) AS p
  FROM heads
),
words AS (
  SELECT f, p // 64 AS w, bit_or(1::UBIGINT << CAST(p % 64 AS INT)) AS bits
  FROM pos GROUP BY 1, 2
),
keys(key) AS (VALUES {keys}),
probes AS (
  SELECT key, unnest([{', '.join(hp('key', i) for i in range(_Q162_K))}]) AS p
  FROM keys
),
tests AS (
  SELECT w.f, pr.key,
         count(*) AS n_probes,
         sum(CASE WHEN ((w.bits >> CAST(pr.p % 64 AS INT)) & 1) = 1
                  THEN 1 ELSE 0 END) AS n_hit
  FROM words w JOIN probes pr ON w.w = pr.p // 64
  GROUP BY 1, 2
),
truth AS (SELECT DISTINCT f, head AS key FROM heads),
nf AS (SELECT count(DISTINCT f) AS n_files FROM heads)
SELECT t.key, CAST(nf.n_files AS BIGINT) AS n_files,
       CAST(sum(CASE WHEN t.n_probes = {_Q162_K} AND t.n_hit = {_Q162_K}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_maybe,
       CAST(sum(CASE WHEN tr.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_true,
       CAST(sum(CASE WHEN t.n_probes = {_Q162_K} AND t.n_hit = {_Q162_K}
                      AND tr.key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_false_pos,
       CAST((sum(CASE WHEN t.n_probes = {_Q162_K} AND t.n_hit = {_Q162_K}
                      THEN 1 ELSE 0 END) * 1000000) // nf.n_files AS BIGINT)
         AS scan_ppm
FROM tests t
LEFT JOIN truth tr ON tr.f = t.f AND tr.key = t.key
CROSS JOIN nf
GROUP BY t.key, nf.n_files
"""


ORACLE_Q162 = _oracle_q162()


# ---------------------------------------------------------------------------
# q177: quality-filter threshold sweep (calibration lattice)
# ---------------------------------------------------------------------------

_Q177_THRESHOLDS = [5, 10, 20, 40, 80]  # min-token-count candidates


def q177_threshold_sweep(spark, sf_dir):
    """Quality-gate CALIBRATION sweep: for every candidate min-token
    threshold, the docs and token mass each language would keep — the
    pass a pipeline runs BEFORE freezing q97's cascade thresholds
    ("what does tightening from 20 to 40 tokens actually cost per
    language?").  All five thresholds are evaluated in ONE corpus
    pass: the corpus collapses to a grouped (lang, token-count)
    relation first, and the threshold lattice joins against THAT
    (bounded domain × 5 thresholds), so adding a sixth threshold
    costs nothing corpus-side.

    Scale shape: one linear (lang, tc) hash agg with map-side
    partials; the sweep is a broadcast join of the 5-row threshold
    relation against the grouped relation; shares are integer ppm
    against per-lang totals computed on the same grouped relation."""
    docs = _t(spark, sf_dir, "documents")
    tc = docs.groupBy(
        "lang", token_count_expr(F.col("text")).alias("tc")
    ).agg(F.count(F.lit(1)).alias("n_docs"))
    tot = tc.groupBy("lang").agg(
        F.sum("n_docs").alias("tot_docs"),
        F.sum(F.expr("tc * n_docs")).alias("tot_tokens"),
    )
    th = spark.createDataFrame(
        [(t,) for t in _Q177_THRESHOLDS], "threshold int"
    )
    kept = (
        tc.crossJoin(F.broadcast(th))
        .where(F.col("tc") >= F.col("threshold"))
        .groupBy("lang", "threshold")
        .agg(
            F.sum("n_docs").alias("n_kept"),
            F.sum(F.expr("tc * n_docs")).alias("tokens_kept"),
        )
    )
    return kept.join(tot, "lang").select(
        "lang",
        F.col("threshold").cast("bigint").alias("threshold"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("tokens_kept").cast("bigint").alias("tokens_kept"),
        F.expr("CAST((n_kept * 1000000) div tot_docs AS BIGINT)").alias(
            "doc_share_ppm"
        ),
        F.expr("CAST((tokens_kept * 1000000) div tot_tokens AS BIGINT)").alias(
            "token_share_ppm"
        ),
    )


ORACLE_Q177 = f"""
WITH tc AS (
  SELECT lang,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS tc,
         count(*) AS n_docs
  FROM documents GROUP BY 1, 2
),
tot AS (
  SELECT lang, sum(n_docs) AS tot_docs, sum(tc * n_docs) AS tot_tokens
  FROM tc GROUP BY 1
),
th(threshold) AS (VALUES {', '.join(f'({t})' for t in _Q177_THRESHOLDS)}),
kept AS (
  SELECT lang, threshold, sum(n_docs) AS n_kept,
         sum(tc * n_docs) AS tokens_kept
  FROM tc, th WHERE tc >= threshold GROUP BY 1, 2
)
SELECT lang, CAST(threshold AS BIGINT) AS threshold,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(tokens_kept AS BIGINT) AS tokens_kept,
       CAST((n_kept * 1000000) // tot_docs AS BIGINT) AS doc_share_ppm,
       CAST((tokens_kept * 1000000) // tot_tokens AS BIGINT) AS token_share_ppm
FROM kept JOIN tot USING (lang)
"""


# ---------------------------------------------------------------------------
# q178: Neyman allocation with largest-remainder apportionment
# ---------------------------------------------------------------------------

_Q178_BUDGET = 1000  # total sample budget to allocate across strata


def q178_neyman_allocation(spark, sf_dir):
    """Variance-optimal (Neyman) sample allocation across language
    strata, integer-exact end to end: each stratum's weight is
    N_h·σ_h = floor(sqrt(N_h·Σx² − (Σx)²)) over doc token counts
    (the identity (N·Σx²−(Σx)²) = N²σ²_pop makes the scaled variance
    an integer, and its isqrt IS N·σ floored), and the 1000-doc
    budget is split ∝ weight by the LARGEST-REMAINDER method — floor
    every exact share, then hand the leftover seats to the largest
    remainders (count desc, lang asc) — the classic apportionment
    that guarantees Σ quotas = budget exactly, no float rounding
    drift.  q154 enforces a FIXED per-stratum K and q112 matches a
    target distribution; this COMPUTES the statistically optimal
    budget when strata differ in spread.  sqrt-on-integers note: both
    engines take IEEE-754 sqrt of the same exact double (< 2^52), so
    floor(sqrt(x)) is bit-identical cross-engine.

    Scale shape: ONE corpus-linear (lang) moment agg; every later
    step (weights, shares, remainder ranking) runs on the 5-row
    strata relation."""
    docs = _t(spark, sf_dir, "documents")
    tc = token_count_expr(F.col("text"))
    strata = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum(tc.cast("bigint")).alias("sx"),
        F.sum(F.expr("CAST(0 AS BIGINT)") + tc.cast("bigint") * tc.cast("bigint")).alias("sxx"),
    )
    w = strata.withColumn(
        "wt",
        F.expr("CAST(floor(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE))) AS BIGINT)"),
    )
    tot = w.agg(F.sum("wt").alias("wtot"))
    shares = w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "nh",
        "wt",
        F.expr(f"({_Q178_BUDGET} * wt) div wtot").alias("base"),
        F.expr(f"({_Q178_BUDGET} * wt) % wtot").alias("rem"),
    )
    leftover = shares.agg(
        (F.lit(_Q178_BUDGET) - F.sum("base")).alias("extra")
    )
    wrk = Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    return (
        shares.crossJoin(F.broadcast(leftover))
        .withColumn("rk", F.row_number().over(wrk))
        .select(
            "lang",
            F.col("nh").cast("bigint").alias("n_docs"),
            F.col("wt").cast("bigint").alias("weight"),
            F.expr("CAST(base + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS BIGINT)").alias(
                "quota"
            ),
        )
    )


ORACLE_Q178 = f"""
WITH strata AS (
  SELECT lang, count(*) AS nh,
         sum(len(list_filter(string_split(text, ' '), t -> t <> ''))) AS sx,
         sum(CAST(len(list_filter(string_split(text, ' '), t -> t <> '')) AS BIGINT)
             * len(list_filter(string_split(text, ' '), t -> t <> ''))) AS sxx
  FROM documents GROUP BY 1
),
w AS (
  SELECT lang, nh,
         CAST(floor(sqrt(CAST(nh * sxx - sx * sx AS DOUBLE))) AS BIGINT) AS wt
  FROM strata
),
tot AS (SELECT sum(wt) AS wtot FROM w),
shares AS (
  SELECT lang, nh, wt,
         ({_Q178_BUDGET} * wt) // wtot AS base,
         ({_Q178_BUDGET} * wt) % wtot AS rem
  FROM w, tot
),
leftover AS (SELECT {_Q178_BUDGET} - sum(base) AS extra FROM shares)
SELECT lang, CAST(nh AS BIGINT) AS n_docs, CAST(wt AS BIGINT) AS weight,
       CAST(base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang ASC)
                          <= extra THEN 1 ELSE 0 END AS BIGINT) AS quota
FROM shares, leftover
"""


# ---------------------------------------------------------------------------
# q179: STREAMING feed-silence alarm (missing-window detection)
# ---------------------------------------------------------------------------

_Q179_N = 360


def q179_streaming_feed_silence(spark, sf_dir):
    """STREAMING feed-silence detection: windowed per-feed counts are
    maintained as bounded stream state, and after the drain a
    time-spine audit finds the windows where a PREVIOUSLY-ACTIVE feed
    went quiet — the alarm that catches a dead producer, which count-
    based monitors (q78's mix drift, q126's bursts) structurally
    cannot see: an absent feed contributes no rows to compare.  A
    feed's expected spine runs from its FIRST active window to the
    global last window; silent = expected but absent.  q102 gap-fills
    a batch time series with values; this detects the gaps as the
    signal, fed by streaming state.

    Fixture timeline is pure arithmetic: feed 'steady' fires in all 5
    windows; feed 'dying' stops after window 1 (silent 2..4); feed
    'late_start' begins at window 2 (windows 0..1 are NOT silence —
    before first activity there is no expectation).  Watermark pushers
    flush every real window.

    Scale shape: the stream side is ONE windowed stateful agg (state =
    one count row per (window, feed)); the spine explode and the
    anti-join both run on the drained AGGREGATED relation (windows ×
    feeds — metadata scale)."""
    import pandas as pd

    from ..sources.pages import stream_events_files, write_batch_files

    t0 = pd.Timestamp(STATIC_T0_EPOCH, unit="s")

    def ev_batch(rows, id0):
        return pd.DataFrame(
            {
                "event_id": [id0 + j for j in range(len(rows))],
                "ts": [t0 + pd.Timedelta(seconds=s) for _, s in rows],
                "user_id": [0] * len(rows),
                "event_type": [f for f, _ in rows],
                "value": [0.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )

    rows = []
    for i in range(_Q179_N):
        s = i * 8  # 0..2872 s -> windows 0..4 (600 s each)
        win = s // 600
        rows.append(("steady", s))
        if win <= 1:
            rows.append(("dying", s + 1))
        if win >= 2:
            rows.append(("late_start", s + 2))
    rows.sort(key=lambda r: r[1])
    half = len(rows) // 2
    batches = [
        ev_batch(rows[:half], 0),
        ev_batch(rows[half:], 10000),
        ev_batch([("steady", 7200), ("steady", 7207)], 20000),
        ev_batch([("steady", 7214), ("steady", 7221)], 25000),
    ]
    src = _q_tmpdir("wrs-q-silence-")
    write_batch_files(batches, src)

    stream = stream_events_files(spark, src, 1).withWatermark("ts", "10 minutes")
    counts = stream.groupBy(
        F.window("ts", "10 minutes").alias("w"), F.col("event_type").alias("feed")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    out = _drain(
        counts.select(
            F.unix_timestamp("w.start").cast("bigint").alias("ws"), "feed", "cnt"
        ),
        spark,
    ).where(F.col("ws") < STATIC_T0_EPOCH + 3600)
    first = out.groupBy("feed").agg(F.min("ws").alias("first_ws"))
    last = out.agg(F.max("ws").alias("last_ws"))
    spine = first.crossJoin(F.broadcast(last)).select(
        "feed",
        F.explode(
            F.expr("sequence(first_ws, last_ws, 600)")
        ).alias("ws"),
    )
    return (
        spine.join(out.select("ws", "feed", "cnt"), ["feed", "ws"], "left")
        .groupBy("feed")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_expected"),
            F.sum(F.expr("CASE WHEN cnt IS NULL THEN 1 ELSE 0 END"))
            .cast("bigint")
            .alias("n_silent"),
            F.min(
                F.when(F.col("cnt").isNull(), F.col("ws"))
            ).cast("bigint").alias("first_silent_ws"),
            F.expr("CAST(max(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) = 1 AS BOOLEAN)").alias(
                "alarm"
            ),
        )
    )


ORACLE_Q179 = f"""
WITH ev AS (
  SELECT 'steady' AS feed, u.i * 8 AS s
  FROM UNNEST(range({_Q179_N})) u(i)
  UNION ALL
  SELECT 'dying', u.i * 8 + 1 FROM UNNEST(range({_Q179_N})) u(i)
  WHERE (u.i * 8) // 600 <= 1
  UNION ALL
  SELECT 'late_start', u.i * 8 + 2 FROM UNNEST(range({_Q179_N})) u(i)
  WHERE (u.i * 8) // 600 >= 2
),
counts AS (
  SELECT feed, {STATIC_T0_EPOCH} + (s // 600) * 600 AS ws, count(*) AS cnt
  FROM ev GROUP BY 1, 2
),
first AS (SELECT feed, min(ws) AS first_ws FROM counts GROUP BY 1),
last AS (SELECT max(ws) AS last_ws FROM counts),
spine AS (
  SELECT feed, unnest(range(first_ws, last_ws + 600, 600)) AS ws
  FROM first, last
)
SELECT sp.feed, CAST(count(*) AS BIGINT) AS n_expected,
       CAST(sum(CASE WHEN c.cnt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_silent,
       CAST(min(CASE WHEN c.cnt IS NULL THEN sp.ws END) AS BIGINT)
         AS first_silent_ws,
       max(CASE WHEN c.cnt IS NULL THEN 1 ELSE 0 END) = 1 AS alarm
FROM spine sp LEFT JOIN counts c ON c.feed = sp.feed AND c.ws = sp.ws
GROUP BY sp.feed
"""


# ---------------------------------------------------------------------------
# q180: seasonal-profile anomaly detection (hour-of-day baseline)
# ---------------------------------------------------------------------------


def q180_seasonal_anomaly(spark, sf_dir):
    """Seasonality-aware anomaly detection: each (event type,
    hour-of-day) cell gets a baseline — the MEDIAN daily count for
    that hour across the month (nearest-rank over the grouped count
    relation, the q143 discipline) — and every day's actual count is
    classified against it with cross-multiplied integer bounds:
    high if 2·cnt > 3·median (>1.5×), low if 2·cnt < median
    (<0.5×).  The monitor that neither q126 (adjacent-window burst —
    blind to "every midnight looks like a burst vs 11 pm") nor q144
    (CUSUM level shift — blind to time-of-day shape) can replace:
    the baseline is the SAME hour's history, so diurnal shape is
    modeled away.

    Scale shape: ONE corpus-linear (type, date, hour) hash agg; the
    median and the classification run on the grouped (type, hour,
    count) relation (bounded: types × 24 hours × distinct counts);
    output is the types × 24 profile."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("d"),
        F.hour("ts").alias("how"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    dist = daily.groupBy("event_type", "how", "cnt").agg(
        F.count(F.lit(1)).alias("nd")
    )
    wcum = Window.partitionBy("event_type", "how").orderBy("cnt")
    wall = Window.partitionBy("event_type", "how")
    med = (
        dist.withColumn("cum", F.sum("nd").over(wcum))
        .withColumn("tot", F.sum("nd").over(wall))
        .groupBy("event_type", "how")
        .agg(
            F.min(
                F.when(F.expr("100 * cum >= 50 * tot"), F.col("cnt"))
            ).alias("median_cnt"),
            F.max("tot").alias("n_days"),
        )
    )
    flagged = daily.join(med, ["event_type", "how"]).select(
        "event_type",
        "how",
        "median_cnt",
        "n_days",
        F.expr("CASE WHEN 2 * cnt > 3 * median_cnt THEN 1 ELSE 0 END").alias("hi"),
        F.expr("CASE WHEN 2 * cnt < median_cnt THEN 1 ELSE 0 END").alias("lo"),
    )
    return flagged.groupBy("event_type", F.col("how").cast("bigint").alias("hour")).agg(
        F.max("median_cnt").cast("bigint").alias("median_cnt"),
        F.max("n_days").cast("bigint").alias("n_days"),
        F.sum("hi").cast("bigint").alias("n_high"),
        F.sum("lo").cast("bigint").alias("n_low"),
    )


ORACLE_Q180 = """
WITH daily AS (
  SELECT event_type, ts::DATE AS d, extract(hour FROM ts) AS how,
         count(*) AS cnt
  FROM events GROUP BY 1, 2, 3
),
dist AS (
  SELECT event_type, how, cnt, count(*) AS nd FROM daily GROUP BY 1, 2, 3
),
med AS (
  SELECT event_type, how,
         min(CASE WHEN 100 * cum >= 50 * tot THEN cnt END) AS median_cnt,
         max(tot) AS n_days
  FROM (
    SELECT event_type, how, cnt,
           sum(nd) OVER (PARTITION BY event_type, how ORDER BY cnt) AS cum,
           sum(nd) OVER (PARTITION BY event_type, how) AS tot
    FROM dist
  ) GROUP BY 1, 2
)
SELECT d.event_type, CAST(d.how AS BIGINT) AS hour,
       CAST(max(m.median_cnt) AS BIGINT) AS median_cnt,
       CAST(max(m.n_days) AS BIGINT) AS n_days,
       CAST(sum(CASE WHEN 2 * d.cnt > 3 * m.median_cnt THEN 1 ELSE 0 END)
            AS BIGINT) AS n_high,
       CAST(sum(CASE WHEN 2 * d.cnt < m.median_cnt THEN 1 ELSE 0 END)
            AS BIGINT) AS n_low
FROM daily d JOIN med m ON m.event_type = d.event_type AND m.how = d.how
GROUP BY d.event_type, d.how
"""


# ---------------------------------------------------------------------------
# q181: more-like-this lexical retrieval (doc-as-query expansion)
# ---------------------------------------------------------------------------

_Q181_ANCHORS = [0, 7, 13]  # anchor doc ids (the "seed" documents)
_Q181_W = 1_000_000_000  # inverse-df weight numerator
_Q181_K = 5


def q181_more_like_this(spark, sf_dir):
    """More-like-this retrieval: rank the corpus against ANCHOR
    DOCUMENTS (doc-as-query, Lucene's MLT shape) by rare-token
    evidence — score(d, anchor) = Σ over shared distinct tokens of
    1e9 div df(token), so sharing one rare token outweighs sharing
    ten ubiquitous ones (the q156 inverse-frequency evidence rule,
    applied to retrieval).  The seed-expansion primitive of corpus
    curation ("find me more documents like these three good ones") —
    q105 ranks against TERM queries, q20/q24 against embedding space;
    this is the lexical doc-query member.

    Scale shape: anchors' distinct-token relations are metadata-scale
    and BROADCAST into the postings equi-join (the corpus never
    shuffles on more than a matched token); df joins on the
    fixed-width token key; per-(anchor, doc) scores are one hash agg
    and top-k is a rank window over candidates only."""
    docs = _t_wide(spark, sf_dir, "documents")
    postings = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(F.split(F.col("text"), "\n", -1), tokens_expr)
                )
            )
        ).alias("token"),
    )
    dfr = postings.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    anchors = postings.where(
        F.col("doc_id").isin(_Q181_ANCHORS)
    ).select(F.col("doc_id").alias("anchor_id"), "token")
    scored = (
        postings.join(F.broadcast(anchors), "token")
        .where(F.col("doc_id") != F.col("anchor_id"))
        .join(dfr, "token")
        .groupBy("anchor_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.sum(F.expr(f"{_Q181_W} div df")).alias("score"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("score").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _Q181_K)
        .select(
            F.col("anchor_id").cast("bigint").alias("anchor_id"),
            F.col("rk").cast("bigint").alias("rk"),
            "doc_id",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.col("score").cast("bigint").alias("score"),
        )
    )


ORACLE_Q181 = f"""
WITH postings AS (
  SELECT doc_id,
         unnest(list_distinct(flatten(list_transform(
           string_split(text, chr(10)),
           ln -> list_filter(string_split(ln, ' '), t -> t <> ''))))) AS token
  FROM documents
),
dfr AS (SELECT token, count(*) AS df FROM postings GROUP BY 1),
anchors AS (
  SELECT doc_id AS anchor_id, token FROM postings
  WHERE doc_id IN ({', '.join(str(a) for a in _Q181_ANCHORS)})
),
scored AS (
  SELECT a.anchor_id, p.doc_id, count(*) AS n_shared,
         sum({_Q181_W} // d.df) AS score
  FROM postings p
  JOIN anchors a USING (token)
  JOIN dfr d USING (token)
  WHERE p.doc_id <> a.anchor_id
  GROUP BY 1, 2
)
SELECT CAST(anchor_id AS BIGINT) AS anchor_id, CAST(rk AS BIGINT) AS rk,
       doc_id, CAST(n_shared AS BIGINT) AS n_shared,
       CAST(score AS BIGINT) AS score
FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY score DESC, doc_id ASC) AS rk
  FROM scored
) WHERE rk <= {_Q181_K}
"""


# ---------------------------------------------------------------------------
# q182: dictionary-encoding advisor (column layout economics)
# ---------------------------------------------------------------------------


def q182_dictionary_encoding_advisor(spark, sf_dir):
    """Column-encoding advisor — the parquet/ORC layout decision the
    writer makes per column (PLAIN vs DICTIONARY), priced exactly:
    plain = Σ byte-length of every value; dictionary = Σ byte-length
    of DISTINCT values + the bit-packed index stream
    ceil(n·bits(ndv) / 8), where bits(ndv) = length of the binary
    representation of ndv−1 (0 for a constant column) — both engines
    compute it as length(bin(ndv−1)), bit-identical.  Completes the
    storage-economics family: q169 prices posting gaps, q175 prices
    bitmap containers, q153 prices zone clustering — this prices the
    value encoding itself.

    Scale shape: the corpus is melted ONCE into (column, value) pairs
    (one Generate — the q131 pattern) and ONE hash agg yields
    per-value counts; totals, NDV, and byte models all derive from
    that grouped relation."""
    docs = _t(spark, sf_dir, "documents")
    melted = docs.select(
        F.explode(
            F.array(
                F.struct(F.lit("lang").alias("col"), F.col("lang").alias("val")),
                F.struct(F.lit("source").alias("col"), F.col("source").alias("val")),
                F.struct(
                    F.lit("n_chars").alias("col"),
                    F.col("n_chars").cast("string").alias("val"),
                ),
            )
        ).alias("kv")
    ).select("kv.col", "kv.val")
    vals = melted.groupBy("col", "val").agg(F.count(F.lit(1)).alias("cnt"))
    agg = vals.groupBy("col").agg(
        F.sum("cnt").alias("n"),
        F.count(F.lit(1)).alias("ndv"),
        F.sum(F.expr("cnt * length(val)")).alias("plain_bytes"),
        F.sum(F.expr("length(val)")).alias("dict_value_bytes"),
    )
    return agg.select(
        "col",
        F.col("n").cast("bigint").alias("n"),
        F.col("ndv").cast("bigint").alias("ndv"),
        F.col("plain_bytes").cast("bigint").alias("plain_bytes"),
        F.expr(
            "CAST(dict_value_bytes"
            " + (n * (CASE WHEN ndv <= 1 THEN 0"
            "          ELSE length(bin(ndv - 1)) END) + 7) div 8 AS BIGINT)"
        ).alias("dict_bytes"),
        F.expr(
            "CAST(dict_value_bytes"
            " + (n * (CASE WHEN ndv <= 1 THEN 0"
            "          ELSE length(bin(ndv - 1)) END) + 7) div 8"
            " < plain_bytes AS BOOLEAN)"
        ).alias("choose_dict"),
    )


ORACLE_Q182 = """
WITH melted AS (
  SELECT 'lang' AS col, lang AS val FROM documents
  UNION ALL
  SELECT 'source', source FROM documents
  UNION ALL
  SELECT 'n_chars', CAST(n_chars AS VARCHAR) FROM documents
),
vals AS (SELECT col, val, count(*) AS cnt FROM melted GROUP BY 1, 2),
agg AS (
  SELECT col, sum(cnt) AS n, count(*) AS ndv,
         sum(cnt * length(val)) AS plain_bytes,
         sum(length(val)) AS dict_value_bytes
  FROM vals GROUP BY 1
)
SELECT col, CAST(n AS BIGINT) AS n, CAST(ndv AS BIGINT) AS ndv,
       CAST(plain_bytes AS BIGINT) AS plain_bytes,
       CAST(dict_value_bytes
            + (n * (CASE WHEN ndv <= 1 THEN 0
                     ELSE length(bin(ndv - 1)) END) + 7) // 8 AS BIGINT)
         AS dict_bytes,
       dict_value_bytes
         + (n * (CASE WHEN ndv <= 1 THEN 0
                  ELSE length(bin(ndv - 1)) END) + 7) // 8
         < plain_bytes AS choose_dict
FROM agg
"""


# ---------------------------------------------------------------------------
# q183: dedup yield accounting (raw -> exact -> near-dup funnel)
# ---------------------------------------------------------------------------


def q183_dedup_yield(spark, sf_dir):
    """Dedup YIELD accounting — the three-level token funnel a corpus
    team reports after every crawl: raw tokens, tokens surviving
    EXACT dedup (content-hash min-id keeper, the q15/q35 rule), and
    tokens surviving NEAR-dup dedup (q62's components over the exact
    keepers, min-id keeper per cluster, the q114 policy) — per
    language, with the final yield in ppm.  q15/q62/q114 each FIND or
    DECIDE one level; this prices the whole pipeline's data loss in
    one oracle-checked statement, which is the number that actually
    gets reviewed ("near-dedup costs us 3% of German").

    Scale shape: exact level is one fixed-width content-hash agg +
    join; near level reuses q62's candidate machinery RESTRICTED to
    exact keepers (dedup levels compose — near-dup never re-scans
    documents exact dedup already dropped); the three per-lang
    aggregates are joins of LANG-scale relations."""
    from ..operators.graph import connected_components

    docs = _t_wide(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        "lang",
        "text",
        token_count_expr(F.col("text")).cast("bigint").alias("tc"),
        F.md5("text").alias("h"),
    ).localCheckpoint(eager=True)
    keep1 = base.groupBy("h").agg(F.min("doc_id").alias("doc_id"))
    kept1 = base.join(keep1, ["h", "doc_id"]).localCheckpoint(eager=True)
    edges = _q62_edges(kept1.select("doc_id", "text"))
    comps = connected_components(edges, "src", "dst")
    drop2 = comps.where(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept2 = kept1.join(drop2, "doc_id", "left_anti")

    raw = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("tc").alias("tokens_raw")
    )
    l1 = kept1.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_exact"), F.sum("tc").alias("tokens_exact")
    )
    l2 = kept2.groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs_near"), F.sum("tc").alias("tokens_near")
    )
    return (
        raw.join(l1, "lang")
        .join(l2, "lang")
        .select(
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("tokens_raw").cast("bigint").alias("tokens_raw"),
            F.col("docs_exact").cast("bigint").alias("docs_exact"),
            F.col("tokens_exact").cast("bigint").alias("tokens_exact"),
            F.col("docs_near").cast("bigint").alias("docs_near"),
            F.col("tokens_near").cast("bigint").alias("tokens_near"),
            F.expr(
                "CAST((tokens_near * 1000000) div tokens_raw AS BIGINT)"
            ).alias("yield_ppm"),
        )
    )


ORACLE_Q183 = f"""
WITH RECURSIVE base AS (
  SELECT doc_id, lang, text,
         CAST(len(list_filter(string_split(text, ' '), t -> t <> ''))
              AS BIGINT) AS tc,
         md5(text) AS h
  FROM documents
),
keep1 AS (SELECT h, min(doc_id) AS doc_id FROM base GROUP BY h),
kept1 AS (SELECT b.* FROM base b JOIN keep1 k ON k.h = b.h AND k.doc_id = b.doc_id),
nd AS (SELECT count(*) AS n FROM kept1),
shings AS (
  SELECT doc_id, unnest(list_distinct({_DUCK_SHINGLES.format(col='text')})) AS shingle
  FROM kept1
), dfq AS (
  SELECT shingle, count(*) AS df FROM shings GROUP BY 1
), keptsh AS (
  SELECT s.doc_id, s.shingle
  FROM shings s JOIN dfq USING (shingle), nd
  WHERE 10 * dfq.df < nd.n
), edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst
  FROM keptsh a JOIN keptsh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2 HAVING count(*) >= 3
),
sym AS (
  SELECT src AS a, dst AS b FROM edges WHERE src <> dst
  UNION
  SELECT dst AS a, src AS b FROM edges WHERE src <> dst
),
reach(node, label) AS (
  SELECT a, a FROM sym
  UNION
  SELECT s.a, r.label FROM reach r JOIN sym s ON s.b = r.node
),
comp AS (SELECT node, min(label) AS component FROM reach GROUP BY node),
drop2 AS (SELECT node AS doc_id FROM comp WHERE node <> component),
kept2 AS (
  SELECT k.* FROM kept1 k LEFT JOIN drop2 d ON d.doc_id = k.doc_id
  WHERE d.doc_id IS NULL
),
raw AS (SELECT lang, count(*) AS n_docs, sum(tc) AS tokens_raw FROM base GROUP BY 1),
l1 AS (SELECT lang, count(*) AS docs_exact, sum(tc) AS tokens_exact FROM kept1 GROUP BY 1),
l2 AS (SELECT lang, count(*) AS docs_near, sum(tc) AS tokens_near FROM kept2 GROUP BY 1)
SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(tokens_raw AS BIGINT) AS tokens_raw,
       CAST(docs_exact AS BIGINT) AS docs_exact,
       CAST(tokens_exact AS BIGINT) AS tokens_exact,
       CAST(docs_near AS BIGINT) AS docs_near,
       CAST(tokens_near AS BIGINT) AS tokens_near,
       CAST((tokens_near * 1000000) // tokens_raw AS BIGINT) AS yield_ppm
FROM raw JOIN l1 USING (lang) JOIN l2 USING (lang)
"""


# ---------------------------------------------------------------------------
# q184: transition dwell-time percentiles
# ---------------------------------------------------------------------------


def q184_transition_dwell(spark, sf_dir):
    """Per-transition dwell-time distribution: for every adjacent
    event-type pair in a user's (ts, event_id)-ordered history, the
    p50/p90 of minutes spent between the two events — q129 counts
    HOW OFTEN each transition happens, q161 measures one end-to-end
    latency; this profiles EVERY edge's timing, the micro-structure
    behind funnel staging decisions ("users stall 10× longer between
    click and purchase than between view and click").  Percentiles
    are nearest-rank over the grouped (pair, minutes) relation — the
    q143/q180 discipline, never a sort of the event relation.

    Scale shape: ONE lag-window pass partitioned by user (parallel),
    ONE (pair, minutes) hash agg, windows over the bounded grouped
    relation."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    hops = ev.select(
        F.lag("event_type").over(w).alias("prev_type"),
        F.col("event_type").alias("curr_type"),
        (
            (F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)))
            / F.lit(60)
        ).cast("bigint").alias("gap_min"),
    ).where(F.col("prev_type").isNotNull())
    dist = hops.groupBy("prev_type", "curr_type", "gap_min").agg(
        F.count(F.lit(1)).alias("nd")
    )
    wcum = Window.partitionBy("prev_type", "curr_type").orderBy("gap_min")
    wall = Window.partitionBy("prev_type", "curr_type")
    cum = dist.withColumn("cum", F.sum("nd").over(wcum)).withColumn(
        "tot", F.sum("nd").over(wall)
    )
    return cum.groupBy("prev_type", "curr_type").agg(
        F.max("tot").cast("bigint").alias("n_hops"),
        F.min(F.when(F.expr("100 * cum >= 50 * tot"), F.col("gap_min")))
        .cast("bigint")
        .alias("p50_min"),
        F.min(F.when(F.expr("100 * cum >= 90 * tot"), F.col("gap_min")))
        .cast("bigint")
        .alias("p90_min"),
    )


ORACLE_Q184 = """
WITH hops AS (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type,
         event_type AS curr_type,
         (floor(epoch(ts))::BIGINT
          - floor(epoch(lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)))::BIGINT)
           // 60 AS gap_min
  FROM events
),
dist AS (
  SELECT prev_type, curr_type, gap_min, count(*) AS nd
  FROM hops WHERE prev_type IS NOT NULL GROUP BY 1, 2, 3
),
cum AS (
  SELECT prev_type, curr_type, gap_min, nd,
         sum(nd) OVER (PARTITION BY prev_type, curr_type ORDER BY gap_min)
           AS cum,
         sum(nd) OVER (PARTITION BY prev_type, curr_type) AS tot
  FROM dist
)
SELECT prev_type, curr_type, CAST(max(tot) AS BIGINT) AS n_hops,
       CAST(min(CASE WHEN 100 * cum >= 50 * tot THEN gap_min END) AS BIGINT)
         AS p50_min,
       CAST(min(CASE WHEN 100 * cum >= 90 * tot THEN gap_min END) AS BIGINT)
         AS p90_min
FROM cum GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q185: STREAMING unknown-key DLQ (referential guard at ingest)
# ---------------------------------------------------------------------------

_Q185_N = 400


def q185_streaming_unknown_key_dlq(spark, sf_dir):
    """STREAMING referential ingest guard: every event is checked
    against the known-entity dimension AS IT ARRIVES (stream-static
    LEFT join — stateless, re-planned per micro-batch), and rows
    referencing UNKNOWN keys are counted per window as the dead-letter
    signal — unknown_ppm spiking is how a producer-side id-space bug
    announces itself.  q52 quarantines rows whose CONTENT fails the
    parse contract; q152 audits referential integrity in BATCH after
    the fact; this is the streaming form where the unmatched rows ARE
    the signal, caught before they poison downstream joins.

    Fixture: user ids cycle 0..99 against a dimension that knows only
    ids with id % 7 != 0 (the q100 arithmetic-fixture discipline) —
    exactly the multiples of 7 are unknown, every window.  Watermark
    pushers are KNOWN users (the q147 rule: rows driving the
    watermark must survive every predicate; a LEFT join keeps them
    regardless).

    Scale shape: dimension broadcast per batch; ONE windowed stateful
    agg with two conditional counts — no state beyond the window
    rows."""
    import pandas as pd

    from ..sources.pages import stream_events_files, write_batch_files

    t0 = pd.Timestamp(STATIC_T0_EPOCH, unit="s")

    def ev_batch(rows, id0):
        return pd.DataFrame(
            {
                "event_id": [id0 + j for j in range(len(rows))],
                "ts": [t0 + pd.Timedelta(seconds=s) for _, s in rows],
                "user_id": [u for u, _ in rows],
                "event_type": ["crawl"] * len(rows),
                "value": [0.0] * len(rows),
                "props": ["{}"] * len(rows),
            }
        )

    half = _Q185_N // 2
    batches = [
        ev_batch([(i % 100, i * 7) for i in range(half)], 0),
        ev_batch([(i % 100, i * 7) for i in range(half, _Q185_N)], 10000),
        ev_batch([(1, 7200), (2, 7207)], 20000),
        ev_batch([(3, 7214), (4, 7221)], 25000),
    ]
    src = _q_tmpdir("wrs-q-dlq-")
    write_batch_files(batches, src)

    dim = (
        spark.range(100)
        .select(F.col("id").alias("known_id"))
        .where(F.expr("id % 7 != 0"))
    )
    stream = stream_events_files(spark, src, 1).withWatermark("ts", "10 minutes")
    joined = stream.join(
        F.broadcast(dim), F.col("user_id") == F.col("known_id"), "left"
    )
    agg = joined.groupBy(F.window("ts", "10 minutes").alias("w")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.expr("CASE WHEN known_id IS NULL THEN 1 ELSE 0 END")).alias(
            "n_unknown"
        ),
    )
    out = _drain(
        agg.select(
            F.unix_timestamp("w.start").cast("bigint").alias("window_start_epoch"),
            F.col("n_events").cast("bigint").alias("n_events"),
            F.col("n_unknown").cast("bigint").alias("n_unknown"),
            F.expr(
                "CAST((n_unknown * 1000000) div n_events AS BIGINT)"
            ).alias("unknown_ppm"),
        ),
        spark,
    )
    return out.where(F.col("window_start_epoch") < STATIC_T0_EPOCH + 3600)


ORACLE_Q185 = f"""
WITH ev AS (
  SELECT CAST(u.i % 100 AS BIGINT) AS user_id,
         {STATIC_T0_EPOCH} + u.i * 7 AS epoch
  FROM UNNEST(range({_Q185_N})) AS u(i)
),
agg AS (
  SELECT (epoch // 600) * 600 AS ws, count(*) AS n_events,
         sum(CASE WHEN user_id % 7 = 0 THEN 1 ELSE 0 END) AS n_unknown
  FROM ev GROUP BY 1
)
SELECT ws AS window_start_epoch, CAST(n_events AS BIGINT) AS n_events,
       CAST(n_unknown AS BIGINT) AS n_unknown,
       CAST((n_unknown * 1000000) // n_events AS BIGINT) AS unknown_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# q186: STREAMING percolator (stored-query alerting over a doc stream)
# ---------------------------------------------------------------------------

# stored queries: (qid, term, bit); a doc matches a query iff it
# contains ALL the query's terms.  Terms chosen to exist in the corpus
# vocabulary; q_c's rare pair keeps match counts sparse.
_Q186_QUERIES: list[tuple[str, str, int]] = [
    ("q_a", "data", 1),
    ("q_a", "crawl", 2),
    ("q_b", "stream", 1),
    ("q_b", "window", 2),
    ("q_b", "join", 4),
    ("q_c", "vector", 1),
    ("q_c", "spark", 2),
]


def q186_streaming_percolator(spark, sf_dir):
    """STREAMING percolator — Elasticsearch's reverse search as a
    Spark plan: STORED queries (each a set of required terms) are
    matched against the incoming page stream, emitting per-window
    match counts per query — the saved-search / alerting primitive.
    A page matches iff it contains ALL the query's terms, computed
    replay-safely with a BIT TRICK: each (query, term) carries a bit,
    the first stateful agg bit_or's the bits seen per (window, query,
    page) (bit_or is idempotent — replays cannot double-set), and a
    page matches when its bits equal the query's full mask (max'd
    through the same agg — constant per query, so max is exact).
    q170 tags docs against ANY-phrase blocklists in batch; this
    requires ALL-terms conjunctions and runs ON THE STREAM.

    Scale shape: the broadcast query-term join prunes the exploded
    token stream MAP-SIDE to query-relevant tokens only (a vanishing
    fraction — the q105 vocabulary-prune argument), then TWO chained
    stateful aggs (the q150 pattern), state bounded at (queries ×
    candidate pages) per window."""
    from ..sources.pages import stream_pages_files

    src, _ = _derived_stream_fixture(spark, sf_dir)
    stream = stream_pages_files(spark, src, 1)
    qt = spark.createDataFrame(
        _Q186_QUERIES, "qid string, term string, bit int"
    )
    masks = (
        qt.groupBy("qid").agg(F.sum("bit").alias("mask"))
        .join(qt, "qid")
        .select("qid", "term", "bit", "mask")
    )
    toks = stream.withWatermark("warc_ts", "10 minutes").select(
        "warc_ts",
        "url",
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(F.split(F.col("text"), "\n", -1), tokens_expr)
                )
            )
        ).alias("term"),
    )
    cand = toks.join(F.broadcast(masks), "term")
    per_doc = cand.groupBy(
        F.window("warc_ts", "10 minutes").alias("w"), "qid", "url"
    ).agg(
        F.expr("bit_or(bit)").alias("bits"), F.max("mask").alias("mask")
    )
    agg = per_doc.groupBy(
        F.window(F.col("w"), "10 minutes").alias("w2"), F.col("qid")
    ).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        F.sum(F.expr("CASE WHEN bits = mask THEN 1 ELSE 0 END")).alias(
            "n_matches"
        ),
    )
    out = _drain(
        agg.select(
            F.unix_timestamp("w2.start").cast("bigint").alias("window_start_epoch"),
            "qid",
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            F.col("n_matches").cast("bigint").alias("n_matches"),
        ),
        spark,
    )
    return out.where(
        F.col("window_start_epoch")
        < F.unix_timestamp(F.lit("2027-01-01").cast("timestamp"))
    )


def _oracle_q186() -> str:
    qvals = ", ".join(f"('{q}', '{t}', {b})" for q, t, b in _Q186_QUERIES)
    return f"""
WITH pages AS (
{_DUCK_DERIVED_PAGES}
), qt(qid, term, bit) AS (VALUES {qvals}),
masks AS (SELECT qid, sum(bit) AS mask FROM qt GROUP BY 1),
toks AS (
  SELECT (CAST(epoch(warc_ts) AS BIGINT) // 600) * 600 AS ws, url,
         unnest(list_distinct(flatten(list_transform(
           string_split(text, chr(10)),
           ln -> list_filter(string_split(ln, ' '), t -> t <> ''))))) AS term
  FROM pages
),
per_doc AS (
  SELECT t.ws, q.qid, t.url, bit_or(q.bit) AS bits, max(m.mask) AS mask
  FROM toks t JOIN qt q USING (term) JOIN masks m ON m.qid = q.qid
  GROUP BY 1, 2, 3
)
SELECT ws AS window_start_epoch, qid,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(sum(CASE WHEN bits = mask THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matches
FROM per_doc GROUP BY 1, 2
"""


ORACLE_Q186 = _oracle_q186()


# ---------------------------------------------------------------------------
# q187: rate-based bot detection
# ---------------------------------------------------------------------------

_Q187_RATE_MAX = 5  # events in any single minute
_Q187_CONC_PPM = 400_000  # burst concentration threshold


def q187_bot_detection(spark, sf_dir):
    """Rate-based bot/abuse detection: per user, the two classic
    integer signals — peak per-minute event rate (humans do not emit
    6 events in one minute for hours) and burst CONCENTRATION (the
    share of all events landing in the user's single busiest minute,
    in ppm) — with a flag when either exceeds its threshold.  q11/q28
    build sessions and q55 per-user features; this is the ADVERSARIAL
    read of the same history, the ingest-abuse gate a crawl pipeline
    runs before letting behavioral data into training.

    Scale shape: ONE (user, minute) hash agg with map-side partials,
    then ONE user-level agg over the minute relation; thresholds are
    cross-multiplied integers."""
    ev = _t(spark, sf_dir, "events")
    per_min = ev.groupBy(
        "user_id", F.expr("CAST(unix_timestamp(ts) div 60 AS BIGINT)").alias("m")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return per_min.groupBy("user_id").agg(
        F.sum("cnt").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("active_minutes"),
        F.max("cnt").cast("bigint").alias("peak_per_min"),
        F.expr("CAST((max(cnt) * 1000000) div sum(cnt) AS BIGINT)").alias(
            "burst_ppm"
        ),
        F.expr(
            f"CAST(max(cnt) > {_Q187_RATE_MAX}"
            f" OR (max(cnt) * 1000000) div sum(cnt) > {_Q187_CONC_PPM}"
            " AS BOOLEAN)"
        ).alias("flagged"),
    )


ORACLE_Q187 = f"""
WITH per_min AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 60 AS m, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n_events,
       CAST(count(*) AS BIGINT) AS active_minutes,
       CAST(max(cnt) AS BIGINT) AS peak_per_min,
       CAST((max(cnt) * 1000000) // sum(cnt) AS BIGINT) AS burst_ppm,
       (max(cnt) > {_Q187_RATE_MAX}
        OR (max(cnt) * 1000000) // sum(cnt) > {_Q187_CONC_PPM}) AS flagged
FROM per_min GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# q188: AND-query index intersection planner
# ---------------------------------------------------------------------------

_Q188_QUERIES: list[tuple[str, str]] = [
    ("qa", "data"), ("qa", "crawl"), ("qa", "web"),
    ("qb", "stream", ), ("qb", "window"),
    ("qc", "vector"), ("qc", "spark"), ("qc", "hash"),
]


def q188_intersection_planner(spark, sf_dir):
    """AND-query index-intersection PLANNING audit: for each stored
    conjunctive query, the driving-term decision an index executor
    makes — scan the RAREST term's posting list and probe the others —
    priced against ground truth: df of the rarest and commonest term,
    the estimated scan cost (min df — the driver list), the TRUE
    intersection size, and the selectivity of the intersection vs the
    driver list in ppm (how much the probes actually pruned).  q146
    forecasts equi-JOIN sizes from key histograms; this is the IR
    twin for conjunctive posting intersections — the decision inside
    every AND query at 100 TB.

    Scale shape: one distinct-postings explode pruned MAP-SIDE to
    query terms (broadcast join); df from the pruned relation; the
    true intersection via per-(query, doc) distinct-term counts
    compared to the query's term count — all hash aggs on candidate
    rows only."""
    docs = _t_wide(spark, sf_dir, "documents")
    qt = spark.createDataFrame(_Q188_QUERIES, "qid string, term string")
    qsz = qt.groupBy("qid").agg(F.count(F.lit(1)).alias("n_terms"))
    postings = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(F.split(F.col("text"), "\n", -1), tokens_expr)
                )
            )
        ).alias("term"),
    ).join(F.broadcast(qt), "term")
    # LEFT join from the query-term list so a term with ZERO postings
    # keeps df=0 (an empty driver list = an empty intersection) rather
    # than silently dropping out of the min/max.
    dfr = qt.join(
        postings.groupBy("qid", "term").agg(F.count(F.lit(1)).alias("df")),
        ["qid", "term"],
        "left",
    ).withColumn("df", F.coalesce(F.col("df"), F.lit(0)))
    plan = dfr.groupBy("qid").agg(
        F.min("df").alias("df_min"), F.max("df").alias("df_max")
    )
    matched = (
        postings.groupBy("qid", "doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .join(F.broadcast(qsz), "qid")
        .where(F.col("nt") == F.col("n_terms"))
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_matches"))
    )
    return (
        plan.join(qsz, "qid")
        .join(matched, "qid", "left")
        .select(
            "qid",
            F.col("n_terms").cast("bigint").alias("n_terms"),
            F.col("df_min").cast("bigint").alias("driver_df"),
            F.col("df_max").cast("bigint").alias("widest_df"),
            F.coalesce(F.col("n_matches"), F.lit(0))
            .cast("bigint")
            .alias("n_matches"),
            F.expr(
                "CAST(CASE WHEN df_min = 0 THEN 0 ELSE"
                " (coalesce(n_matches, 0) * 1000000) div df_min END"
                " AS BIGINT)"
            ).alias("driver_selectivity_ppm"),
        )
    )


def _oracle_q188() -> str:
    qvals = ", ".join(f"('{q}', '{t}')" for q, t in _Q188_QUERIES)
    return f"""
WITH qt(qid, term) AS (VALUES {qvals}),
qsz AS (SELECT qid, count(*) AS n_terms FROM qt GROUP BY 1),
postings AS (
  SELECT p.doc_id, q.qid, q.term
  FROM (
    SELECT doc_id,
           unnest(list_distinct(flatten(list_transform(
             string_split(text, chr(10)),
             ln -> list_filter(string_split(ln, ' '), t -> t <> ''))))) AS term
    FROM documents
  ) p JOIN qt q USING (term)
),
dfc AS (SELECT qid, term, count(*) AS df FROM postings GROUP BY 1, 2),
dfr AS (
  SELECT q.qid, q.term, coalesce(c.df, 0) AS df
  FROM qt q LEFT JOIN dfc c ON c.qid = q.qid AND c.term = q.term
),
plan AS (SELECT qid, min(df) AS df_min, max(df) AS df_max FROM dfr GROUP BY 1),
matched AS (
  SELECT qid, count(*) AS n_matches FROM (
    SELECT p.qid, p.doc_id
    FROM postings p
    GROUP BY 1, 2
    HAVING count(DISTINCT p.term)
           = (SELECT n_terms FROM qsz WHERE qsz.qid = p.qid)
  ) GROUP BY 1
)
SELECT p.qid, CAST(s.n_terms AS BIGINT) AS n_terms,
       CAST(p.df_min AS BIGINT) AS driver_df,
       CAST(p.df_max AS BIGINT) AS widest_df,
       CAST(coalesce(m.n_matches, 0) AS BIGINT) AS n_matches,
       CAST(CASE WHEN p.df_min = 0 THEN 0 ELSE
            (coalesce(m.n_matches, 0) * 1000000) // p.df_min END AS BIGINT)
         AS driver_selectivity_ppm
FROM plan p JOIN qsz s USING (qid) LEFT JOIN matched m ON m.qid = p.qid
"""


ORACLE_Q188 = _oracle_q188()


# ---------------------------------------------------------------------------
# q189: SymSpell deletion-neighborhood spelling-correction join
# ---------------------------------------------------------------------------

# dirty query-log mentions to resolve against the corpus vocabulary.
# The list deliberately exercises every lookup outcome: deletion /
# insertion / substitution typos (ed=1), an exact hit (ed=0), a
# transposition ('csan' vs 'scan') that SHARES a deletion variant but
# fails the plain-levenshtein<=1 filter (proving the verify step is
# real, not vacuous), and pure garbage with zero candidates.
_Q189_MENTIONS: list[str] = [
    "strem",    # 'stream' with a deleted char  -> ed 1
    "windoww",  # 'window' + inserted char      -> ed 1
    "scann",    # 'scan' + inserted char        -> ed 1
    "qery",     # 'query' with a deleted char   -> ed 1
    "botch",    # 'batch' with a substitution   -> ed 1
    "batch",    # exact vocabulary hit          -> ed 0
    "csan",     # 'scan' transposed: candidate via shared variant, ed 2 -> dropped
    "zzzz",     # garbage: no shared variant at all
]


def _q189_variants_spark(col: str) -> str:
    """Spark SQL fragment: the SymSpell edit-1 deletion neighborhood of
    ``col`` — the string itself plus every single-character deletion
    (distinct, empty string dropped so length-1 tokens stay safe)."""
    return (
        f"array_distinct(filter(concat(array({col}),"
        f" transform(sequence(1, length({col})),"
        f" i -> concat(substring({col}, 1, i-1), substring({col}, i+1, 10000)))),"
        " v -> v <> ''))"
    )


def _q189_variants_duck(col: str) -> str:
    """DuckDB mirror of :func:`_q189_variants_spark`."""
    return (
        f"list_distinct(list_filter(list_concat([{col}],"
        f" list_transform(range(1, length({col}) + 1),"
        f" i -> substr({col}, 1, i-1) || substr({col}, i+1, 10000))),"
        " v -> v <> ''))"
    )


def q189_symspell_edit1_join(spark, sf_dir):
    """SymSpell spelling-correction lookup: dirty mentions are resolved
    against the corpus vocabulary under edit distance <= 1 WITHOUT an
    all-pairs levenshtein scan — both sides explode their edit-1
    DELETION NEIGHBORHOOD (the string plus every single-char deletion)
    and candidates come from an equi-join on the shared variant, which
    is COMPLETE for ed<=1 (a deletion shares the deleted form; an
    insertion is its mirror; a substitution at position i shares the
    both-sides-delete-i form).  The exact levenshtein predicate then
    filters inside the candidate set (a transposition shares a variant
    at ed=2 and must be dropped), and one window picks the best
    suggestion per mention by (ed, df DESC, token).  q89 blocks fuzzy
    linkage on a FIRST-4-CHARS prefix — incomplete when the typo hits
    the prefix; the deletion-neighborhood generator has no such blind
    spot for ed<=1, at the cost of a (len+1)-way explode.

    Scale shape: the vocabulary-side explode is linear in token length
    (len+1 variants/token, never quadratic); the only shuffle is the
    fixed-width variant equi-join with the mention side BROADCAST —
    the all-pairs scan never happens."""
    docs = _t_wide(spark, sf_dir, "documents")
    vocab = docs.select(
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(F.split(F.col("text"), "\n", -1), tokens_expr)
                )
            )
        ).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    mentions = spark.createDataFrame(
        [(m,) for m in _Q189_MENTIONS], "mention string"
    )
    mvar = mentions.select(
        "mention",
        F.explode(F.expr(_q189_variants_spark("mention"))).alias("variant"),
    )
    vvar = vocab.select(
        "tok",
        "df",
        F.explode(F.expr(_q189_variants_spark("tok"))).alias("variant"),
    )
    cand = (
        vvar.join(F.broadcast(mvar), "variant")
        .select("mention", "tok", "df")
        .distinct()
        .withColumn("ed", F.levenshtein("mention", "tok"))
        .where(F.col("ed") <= 1)
    )
    w = Window.partitionBy("mention").orderBy(
        F.col("ed"), F.col("df").desc(), F.col("tok")
    )
    best = cand.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return mentions.join(best, "mention", "left").select(
        "mention",
        F.col("tok").alias("suggestion"),
        F.col("ed").cast("bigint").alias("edit_distance"),
        F.col("df").cast("bigint").alias("suggestion_df"),
    )


def _oracle_q189() -> str:
    mvals = ", ".join(f"('{m}')" for m in _Q189_MENTIONS)
    return f"""
WITH vocab AS (
  SELECT tok, count(*) AS df FROM (
    SELECT doc_id, unnest(list_distinct(flatten(list_transform(
             string_split(text, chr(10)),
             ln -> list_filter(string_split(ln, ' '), t -> t <> ''))))) AS tok
    FROM documents
  ) GROUP BY 1
),
mentions(mention) AS (VALUES {mvals}),
mvar AS (
  SELECT mention, unnest({_q189_variants_duck('mention')}) AS variant
  FROM mentions
),
vvar AS (
  SELECT tok, df, unnest({_q189_variants_duck('tok')}) AS variant FROM vocab
),
cand AS (
  SELECT DISTINCT m.mention, v.tok, v.df
  FROM mvar m JOIN vvar v USING (variant)
),
scored AS (
  SELECT mention, tok, df, levenshtein(mention, tok) AS ed
  FROM cand WHERE levenshtein(mention, tok) <= 1
),
best AS (
  SELECT mention, tok, ed, df,
         row_number() OVER (PARTITION BY mention ORDER BY ed, df DESC, tok)
           AS rn
  FROM scored
)
SELECT m.mention, b.tok AS suggestion, CAST(b.ed AS BIGINT) AS edit_distance,
       CAST(b.df AS BIGINT) AS suggestion_df
FROM mentions m LEFT JOIN best b ON b.mention = m.mention AND b.rn = 1
"""


ORACLE_Q189 = _oracle_q189()


# ---------------------------------------------------------------------------
# q190: distributed top-k scatter-gather fetch-depth audit
# ---------------------------------------------------------------------------

_Q190_K = 20
_Q190_SHARDS = 8


def q190_shard_topk_audit(spark, sf_dir):
    """Distributed top-k scatter-gather audit: q08 ANSWERS a top-k;
    this audits the two-phase contract every sharded executor relies
    on — each shard returns its local top-k', the gather merges them —
    by computing, for each global top-k row, WHICH shard holds it and
    its LOCAL rank there, plus ``fetch_depth`` = max local rank over
    the winners: the minimal uniform per-shard k' that makes the
    scatter-gather lossless.  fetch_depth == k means one shard owns
    the whole head (skew — gather degenerates to that shard); a
    fetch_depth near ceil(k/shards) certifies the head is spread and
    per-shard fetches can shrink ~shards-fold.

    Scale shape: local ranks are a window per shard (embarrassingly
    parallel — each shard sorts only its own rows); the global head
    is orderBy+limit (TakeOrdered, never a single-partition total
    sort of the full relation); the final join broadcasts the k-row
    head; the only unpartitioned window runs on k rows."""
    docs = _t(spark, sf_dir, "documents")
    sharded = docs.select(
        "doc_id",
        "n_chars",
        (
            md5_i64_expr(F.col("doc_id").cast("string"), salt="shard#")
            % _Q190_SHARDS
        ).alias("shard"),
    )
    w_local = Window.partitionBy("shard").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    local = sharded.withColumn("local_rank", F.row_number().over(w_local))
    head = sharded.orderBy(F.col("n_chars").desc(), F.col("doc_id")).limit(
        _Q190_K
    )
    w_glob = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    head = head.withColumn("global_rank", F.row_number().over(w_glob))
    joined = local.join(
        F.broadcast(head.select("doc_id", "global_rank")), "doc_id"
    )
    w_all = Window.partitionBy()
    return joined.select(
        F.col("global_rank").cast("bigint").alias("global_rank"),
        "doc_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.col("shard").cast("bigint").alias("shard"),
        F.col("local_rank").cast("bigint").alias("local_rank"),
        F.max(F.col("local_rank").cast("bigint"))
        .over(w_all)
        .alias("fetch_depth"),
    )


ORACLE_Q190 = f"""
WITH sharded AS (
  SELECT doc_id, n_chars,
         {duck_md5_i64("CAST(doc_id AS VARCHAR)", salt="shard#")}
           % {_Q190_SHARDS} AS shard
  FROM documents
),
local AS (
  SELECT doc_id, n_chars, shard,
         row_number() OVER (PARTITION BY shard
                            ORDER BY n_chars DESC, doc_id) AS local_rank
  FROM sharded
),
head AS (
  SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id)
           AS global_rank
  FROM sharded ORDER BY n_chars DESC, doc_id LIMIT {_Q190_K}
)
SELECT CAST(h.global_rank AS BIGINT) AS global_rank, l.doc_id,
       CAST(l.n_chars AS BIGINT) AS n_chars, CAST(l.shard AS BIGINT) AS shard,
       CAST(l.local_rank AS BIGINT) AS local_rank,
       CAST(max(l.local_rank) OVER () AS BIGINT) AS fetch_depth
FROM local l JOIN head h USING (doc_id)
"""


# ---------------------------------------------------------------------------
# q191: co-occurrence item-item similarity (capped pair mining)
# ---------------------------------------------------------------------------

_Q191_CAP = 12     # max items kept per user before pair mining
_Q191_MIN_CO = 3   # pair support floor


def q191_coclick_similarity(spark, sf_dir):
    """Item-item co-occurrence similarity over user behavior (the
    recommender / related-queries primitive): users' event items
    (props.k) are pair-mined per user and scored with the squared
    cosine of the co-occurrence counts, in ppm.  The scale trick is
    the PER-USER CAP before the self-join: a power-law user with 10^5
    items would alone emit 10^10 pairs; capping each user to a
    DETERMINISTIC portable-hash-ordered sample of <= {_Q191_CAP} items
    bounds every user's contribution at cap^2 pairs (the DISCO /
    Twitter "WTF" discipline), making the pair explosion linear in
    users.  q98 mines token PMI WITHIN documents; this mines
    co-occurrence ACROSS a user dimension with the cap as the
    load-bearing scale device, and squared cosine keeps the score
    integer-exact (no sqrt).

    Scale shape: one user-key equi-self-join on the capped relation
    (bounded fan-out cap^2 per user), then one (item_a, item_b) hash
    agg; item marginals join on fixed-width item keys."""
    ev = _t(spark, sf_dir, "events")
    ui = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy(
        md5_i64_expr(F.col("item").cast("string"), salt="cap#"), F.col("item")
    )
    capped = (
        ui.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _Q191_CAP)
        .drop("rn")
    )
    n = capped.groupBy("item").agg(F.count(F.lit(1)).alias("n_users"))
    a = capped.select("user_id", F.col("item").alias("item_a"))
    b = capped.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("co"))
        .where(F.col("co") >= _Q191_MIN_CO)
    )
    na = n.select(F.col("item").alias("item_a"), F.col("n_users").alias("n_a"))
    nb = n.select(F.col("item").alias("item_b"), F.col("n_users").alias("n_b"))
    return (
        co.join(na, "item_a")
        .join(nb, "item_b")
        .select(
            "item_a",
            "item_b",
            F.col("co").cast("bigint").alias("co_users"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.expr(
                "CAST((co * co * 1000000) div (n_a * n_b) AS BIGINT)"
            ).alias("cos2_ppm"),
        )
    )


ORACLE_Q191 = f"""
WITH ui AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
),
capped AS (
  SELECT user_id, item FROM (
    SELECT user_id, item,
           row_number() OVER (
             PARTITION BY user_id
             ORDER BY {duck_md5_i64("CAST(item AS VARCHAR)", salt="cap#")},
                      item) AS rn
    FROM ui
  ) WHERE rn <= {_Q191_CAP}
),
n AS (SELECT item, count(*) AS n_users FROM capped GROUP BY 1),
co AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS co
  FROM capped a JOIN capped b
    ON a.user_id = b.user_id AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= {_Q191_MIN_CO}
)
SELECT c.item_a, c.item_b, CAST(c.co AS BIGINT) AS co_users,
       CAST(na.n_users AS BIGINT) AS n_a, CAST(nb.n_users AS BIGINT) AS n_b,
       CAST((c.co * c.co * 1000000) // (na.n_users * nb.n_users) AS BIGINT)
         AS cos2_ppm
FROM co c JOIN n na ON na.item = c.item_a JOIN n nb ON nb.item = c.item_b
"""


# ---------------------------------------------------------------------------
# q192: STREAMING MinHash feed-similarity audit
# ---------------------------------------------------------------------------

_Q192_K = 16  # signature width (seeds)


def _q192_min_exprs() -> list:
    return [
        F.min(md5_i64_expr(F.col("tok"), salt=f"mh{i}#")).alias(f"h{i}")
        for i in range(_Q192_K)
    ]


def q192_streaming_minhash_feed_similarity(spark, sf_dir):
    """STREAMING MinHash feed-similarity audit: per event-time window,
    each source feed maintains a k={_Q192_K} bottom-hash SIGNATURE of
    its token set inside ONE stateful agg — ``min`` per seed is
    duplicate-insensitive, replay-IDEMPOTENT (exactly the property an
    at-least-once stream needs) and mergeable, so the state is k
    bigints per (window, source) regardless of volume.  The batch side
    then estimates cross-feed Jaccard as matching-seed-fraction and
    AUDITS it against the exact Jaccard recomputed from the same
    corpus derivation — the content-overlap drift monitor between
    crawl feeds.  q149's streamed min-sketch estimates CARDINALITY of
    one keyed stream; this keeps a full signature per feed to measure
    SIMILARITY BETWEEN feeds, with ground truth in the same result.
    q22 mines batch doc-pair candidates; nothing here ever joins docs.

    Scale shape: stream side is one windowed stateful agg (k min
    registers per group); the audit side is a window-key equi-self-
    join of the tiny signature relation plus one shared-token
    equi-join for the exact value — no all-pairs doc work anywhere."""
    from ..sources.pages import stream_pages_files

    src, _ = _derived_stream_fixture(spark, sf_dir)
    stream = stream_pages_files(spark, src, 1)
    toks = stream.withWatermark("warc_ts", "10 minutes").select(
        "warc_ts",
        F.regexp_extract("url", "https://([^.]+)\\.", 1).alias("source"),
        F.explode(
            F.array_distinct(
                F.flatten(
                    F.transform(F.split(F.col("text"), "\n", -1), tokens_expr)
                )
            )
        ).alias("tok"),
    )
    mins = toks.groupBy(
        F.window("warc_ts", "10 minutes").alias("w"), "source"
    ).agg(*_q192_min_exprs())
    sig = _drain(
        mins.select(
            F.unix_timestamp("w.start").cast("bigint").alias("ws"),
            "source",
            *[f"h{i}" for i in range(_Q192_K)],
        ),
        spark,
    ).where(
        F.col("ws")
        < F.unix_timestamp(F.lit("2027-01-01").cast("timestamp"))
    )
    a = sig.select(
        "ws",
        F.col("source").alias("source_a"),
        *[F.col(f"h{i}").alias(f"a{i}") for i in range(_Q192_K)],
    )
    b = sig.select(
        "ws",
        F.col("source").alias("source_b"),
        *[F.col(f"h{i}").alias(f"b{i}") for i in range(_Q192_K)],
    )
    match_expr = " + ".join(
        f"IF(a{i} = b{i}, 1, 0)" for i in range(_Q192_K)
    )
    est = (
        a.join(b, "ws")
        .where(F.col("source_a") < F.col("source_b"))
        .select(
            "ws",
            "source_a",
            "source_b",
            F.expr(f"CAST({match_expr} AS BIGINT)").alias("sig_matches"),
        )
    )
    # exact ground truth from the same pure-function page derivation
    docs = _t(spark, sf_dir, "documents")
    dt = (
        docs.select(
            (
                (F.lit(STATIC_T0_EPOCH) + F.col("doc_id") * 47)
                .cast("bigint")
                - (F.lit(STATIC_T0_EPOCH) + F.col("doc_id") * 47) % 600
            ).alias("ws"),
            "source",
            F.explode(
                F.array_distinct(
                    F.flatten(
                        F.transform(
                            F.split(
                                F.concat(
                                    F.lit("wm-header "),
                                    F.col("source"),
                                    F.lit(" common header line\n"),
                                    F.col("text"),
                                    F.lit("\nwm-footer "),
                                    F.col("source"),
                                    F.lit(" shared footer line"),
                                ),
                                "\n",
                                -1,
                            ),
                            tokens_expr,
                        )
                    )
                )
            ).alias("tok"),
        )
        .distinct()
    )
    sizes = dt.groupBy("ws", "source").agg(F.count(F.lit(1)).alias("n"))
    ta = dt.select("ws", F.col("source").alias("source_a"), "tok")
    tb = dt.select("ws", F.col("source").alias("source_b"), "tok")
    inter = (
        ta.join(tb, ["ws", "tok"])
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("ws", "source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    na = sizes.select(
        "ws", F.col("source").alias("source_a"), F.col("n").alias("n_a")
    )
    nb = sizes.select(
        "ws", F.col("source").alias("source_b"), F.col("n").alias("n_b")
    )
    truth = (
        est.join(na, ["ws", "source_a"])
        .join(nb, ["ws", "source_b"])
        .join(inter, ["ws", "source_a", "source_b"], "left")
        .withColumn("n_inter", F.coalesce(F.col("n_inter"), F.lit(0)))
    )
    return truth.select(
        F.col("ws").alias("window_start_epoch"),
        "source_a",
        "source_b",
        "sig_matches",
        F.expr(
            f"CAST((sig_matches * 1000000) div {_Q192_K} AS BIGINT)"
        ).alias("est_jaccard_ppm"),
        F.expr(
            "CAST((n_inter * 1000000) div (n_a + n_b - n_inter) AS BIGINT)"
        ).alias("true_jaccard_ppm"),
    )


def _oracle_q192() -> str:
    mins = ",\n         ".join(
        f"min({duck_md5_i64('tok', salt=f'mh{i}#')}) AS h{i}"
        for i in range(_Q192_K)
    )
    matches = " + ".join(
        f"CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END"
        for i in range(_Q192_K)
    )
    return f"""
WITH pages AS (
{_DUCK_DERIVED_PAGES}
), toks AS (
  SELECT (CAST(epoch(warc_ts) AS BIGINT) // 600) * 600 AS ws, source,
         unnest(list_distinct(flatten(list_transform(
           string_split(text, chr(10)),
           ln -> list_filter(string_split(ln, ' '), t -> t <> ''))))) AS tok
  FROM pages
),
sig AS (
  SELECT ws, source,
         {mins}
  FROM toks GROUP BY 1, 2
),
est AS (
  SELECT a.ws, a.source AS source_a, b.source AS source_b,
         {matches} AS sig_matches
  FROM sig a JOIN sig b ON a.ws = b.ws AND a.source < b.source
),
dt AS (SELECT DISTINCT ws, source, tok FROM toks),
sizes AS (SELECT ws, source, count(*) AS n FROM dt GROUP BY 1, 2),
inter AS (
  SELECT a.ws, a.source AS source_a, b.source AS source_b,
         count(*) AS n_inter
  FROM dt a JOIN dt b
    ON a.ws = b.ws AND a.tok = b.tok AND a.source < b.source
  GROUP BY 1, 2, 3
)
SELECT e.ws AS window_start_epoch, e.source_a, e.source_b,
       CAST(e.sig_matches AS BIGINT) AS sig_matches,
       CAST((e.sig_matches * 1000000) // {_Q192_K} AS BIGINT)
         AS est_jaccard_ppm,
       CAST((coalesce(i.n_inter, 0) * 1000000)
            // (na.n + nb.n - coalesce(i.n_inter, 0)) AS BIGINT)
         AS true_jaccard_ppm
FROM est e
JOIN sizes na ON na.ws = e.ws AND na.source = e.source_a
JOIN sizes nb ON nb.ws = e.ws AND nb.source = e.source_b
LEFT JOIN inter i
  ON i.ws = e.ws AND i.source_a = e.source_a AND i.source_b = e.source_b
"""


ORACLE_Q192 = _oracle_q192()


# ---------------------------------------------------------------------------
# q193: content-defined chunking (CDC) storage-dedup audit
# ---------------------------------------------------------------------------

_Q193_MOD = 8  # boundary when hash(tok) % MOD == 0 -> ~MOD-token chunks

# one MAP-SIDE pass per document inside codegen: a higher-order fold
# builds the variable-width chunk list; only chunk strings leave the row
_Q193_CHUNKS_EXPR = (
    "aggregate("
    " filter(split(replace(text, '\\n', ' '), ' '), t -> t <> ''),"
    " named_struct('chunks', cast(array() as array<string>),"
    "              'cur', cast(array() as array<string>)),"
    " (acc, t) -> IF("
    "   CAST(conv(substring(md5(concat('cdc#', t)), 1, 15), 16, 10) AS BIGINT)"
    f"   % {_Q193_MOD} = 0,"
    "   named_struct('chunks', array_append(acc.chunks,"
    "                  array_join(array_append(acc.cur, t), ' ')),"
    "                'cur', cast(array() as array<string>)),"
    "   named_struct('chunks', acc.chunks,"
    "                'cur', array_append(acc.cur, t))),"
    " acc -> IF(size(acc.cur) > 0,"
    "   array_append(acc.chunks, array_join(acc.cur, ' ')), acc.chunks))"
)


def q193_cdc_chunking(spark, sf_dir):
    """Content-defined chunking (CDC) storage-dedup audit: documents
    are cut into VARIABLE-width chunks at content-derived boundaries
    (after any token whose hash % {_Q193_MOD} == 0 — the rolling-hash
    cut rule of LBFS/restic/borg), then per-source chunk-level
    duplication is measured.  CDC's defining property over fixed-size
    blocks is SHIFT RESISTANCE: inserting one token re-cuts only the
    chunk it lands in, every boundary after the next cut point
    realigns, so shared suffixes still dedup (pytest perturbs one doc
    and proves locality).  q32's winnowing selects representative
    fingerprints FOR doc-level near-dup; q86 dedups fixed structural
    paragraphs; this defines the chunk boundaries themselves from
    content — the storage/transfer dedup primitive.

    Scale shape: the chunker is a per-row higher-order fold (ONE pass
    per doc, map-side, zero shuffle); only chunk fingerprints reach
    the per-source hash agg."""
    docs = _t_wide(spark, sf_dir, "documents")
    chunks = docs.select(
        "source", F.explode(F.expr(_Q193_CHUNKS_EXPR)).alias("chunk")
    )
    return (
        chunks.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.countDistinct(
                md5_i64_expr(F.col("chunk"), salt="chunk#")
            ).alias("n_distinct_chunks"),
            F.sum(F.size(F.split(F.col("chunk"), " ", -1)))
            .cast("bigint")
            .alias("total_tokens"),
        )
        .select(
            "source",
            F.col("n_chunks").cast("bigint").alias("n_chunks"),
            F.col("n_distinct_chunks").cast("bigint").alias(
                "n_distinct_chunks"
            ),
            F.expr(
                "CAST(((n_chunks - n_distinct_chunks) * 1000000)"
                " div n_chunks AS BIGINT)"
            ).alias("dup_ppm"),
            "total_tokens",
            F.expr(
                "CAST((total_tokens * 1000) div n_chunks AS BIGINT)"
            ).alias("avg_chunk_tokens_milli"),
        )
    )


ORACLE_Q193 = f"""
WITH toks AS (
  SELECT doc_id, source, unnest(tk) AS tok, generate_subscripts(tk, 1) AS pos
  FROM (SELECT doc_id, source,
               list_filter(string_split(replace(text, chr(10), ' '), ' '),
                           t -> t <> '') AS tk
        FROM documents)
),
marked AS (
  SELECT doc_id, source, tok, pos,
         CASE WHEN ('0x' || substr(md5('cdc#' || tok), 1, 15))::BIGINT
                   % {_Q193_MOD} = 0 THEN 1 ELSE 0 END AS b
  FROM toks
),
chunked AS (
  SELECT doc_id, source, tok, pos,
         coalesce(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) AS chunk_id
  FROM marked
),
chunks AS (
  SELECT doc_id, source, chunk_id,
         string_agg(tok, ' ' ORDER BY pos) AS chunk, count(*) AS n_toks
  FROM chunked GROUP BY 1, 2, 3
)
SELECT source, CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(count(DISTINCT ('0x' || substr(md5('chunk#' || chunk), 1, 15))
                    ::BIGINT) AS BIGINT) AS n_distinct_chunks,
       CAST(((count(*) - count(DISTINCT ('0x' || substr(md5('chunk#' ||
              chunk), 1, 15))::BIGINT)) * 1000000) // count(*) AS BIGINT)
         AS dup_ppm,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST((sum(n_toks) * 1000) // count(*) AS BIGINT)
         AS avg_chunk_tokens_milli
FROM chunks GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q194: position-bias COEC (clicks over expected clicks)
# ---------------------------------------------------------------------------

_Q194_POSITIONS = 10
_Q194_MIN_IMPR = 5


def q194_position_bias_coec(spark, sf_dir):
    """Position-bias-corrected engagement (COEC — clicks over expected
    clicks): raw CTR rewards items shown at position 1; COEC divides
    each item's clicks by the clicks EXPECTED from the positions it
    was actually shown at (sum of per-position baseline CTR over its
    impressions), so a coec_ppm above 1e6 means the item out-performs
    its slots — the de-biased relevance signal ranking evals feed on.
    Impression position is the deterministic event_id % {_Q194_POSITIONS}
    + 1 slot.  Everything stays integer: baseline CTR in ppm, expected
    clicks as a ppm SUM, COEC as clicks*1e12 // expected_ppm.  q187
    reads rates adversarially, q176 rank-normalizes scores; neither
    corrects for exposure position.

    Scale shape: the position baseline is a {_Q194_POSITIONS}-row agg
    broadcast back; one per-item hash agg after a map-side join —
    two linear passes, no windows."""
    ev = _t(spark, sf_dir, "events")
    impr = (
        ev.where(F.col("event_type").isin("view", "click"))
        .select(
            (F.col("event_id") % _Q194_POSITIONS + 1).alias("pos"),
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
            F.when(F.col("event_type") == "click", F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_click"),
        )
        .where(F.col("item").isNotNull())
    )
    base = (
        impr.groupBy("pos")
        .agg(
            F.count(F.lit(1)).alias("imps"),
            F.sum("is_click").alias("clicks"),
        )
        .select(
            "pos",
            F.expr("CAST((clicks * 1000000) div imps AS BIGINT)").alias(
                "ctr_ppm"
            ),
        )
    )
    return (
        impr.join(F.broadcast(base), "pos")
        .groupBy("item")
        .agg(
            F.count(F.lit(1)).alias("n_impr"),
            F.sum("is_click").alias("n_clicks"),
            F.sum("ctr_ppm").alias("expected_clicks_ppm"),
        )
        .where(F.col("n_impr") >= _Q194_MIN_IMPR)
        .select(
            "item",
            F.col("n_impr").cast("bigint").alias("n_impr"),
            F.col("n_clicks").cast("bigint").alias("n_clicks"),
            F.col("expected_clicks_ppm")
            .cast("bigint")
            .alias("expected_clicks_ppm"),
            F.expr(
                "CAST(CASE WHEN expected_clicks_ppm = 0 THEN NULL"
                " ELSE (n_clicks * 1000000000000) div expected_clicks_ppm"
                " END AS BIGINT)"
            ).alias("coec_ppm"),
        )
    )


ORACLE_Q194 = f"""
WITH impr AS (
  SELECT (event_id % {_Q194_POSITIONS}) + 1 AS pos,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click
  FROM events
  WHERE event_type IN ('view', 'click')
    AND json_extract_string(props, '$.k') IS NOT NULL
),
base AS (
  SELECT pos, (sum(is_click) * 1000000) // count(*) AS ctr_ppm
  FROM impr GROUP BY 1
),
agg AS (
  SELECT i.item, count(*) AS n_impr, sum(i.is_click) AS n_clicks,
         sum(b.ctr_ppm) AS expected_clicks_ppm
  FROM impr i JOIN base b USING (pos)
  GROUP BY 1 HAVING count(*) >= {_Q194_MIN_IMPR}
)
SELECT item, CAST(n_impr AS BIGINT) AS n_impr,
       CAST(n_clicks AS BIGINT) AS n_clicks,
       CAST(expected_clicks_ppm AS BIGINT) AS expected_clicks_ppm,
       CAST(CASE WHEN expected_clicks_ppm = 0 THEN NULL
            ELSE (n_clicks * 1000000000000) // expected_clicks_ppm END
            AS BIGINT) AS coec_ppm
FROM agg
"""


# ---------------------------------------------------------------------------
# q195: language-ID granularity audit (doc-level vs per-line majority)
# ---------------------------------------------------------------------------


def q195_langid_granularity_audit(spark, sf_dir):
    """Language-ID GRANULARITY audit (the CCNet question: classify the
    document or its paragraphs?): per doc, the doc-level lang-ID
    (q17's marker argmax over the whole text) is compared against the
    MAJORITY VOTE of per-line lang-IDs, with the line-level mixture
    (share of lines disagreeing with the majority, ppm) as the
    code-switching / boilerplate-contamination signal — a doc whose
    doc-level call disagrees with its line majority is exactly the doc
    a coarse classifier mis-routes into the wrong training bucket.
    q17 answers at ONE granularity and q124 scores predictions against
    LABELS; this measures the granularity disagreement itself, no
    labels involved.  Runs over the DERIVED PAGES (body + boilerplate
    header/footer lines — the raw documents are single-line, and the
    page form is exactly where granularity bites: boilerplate lines
    vote 'und' against an 'en' body).

    Scale shape: one line explode -> (doc, line_lang) hash agg ->
    per-doc window on the grouped relation (never raw lines); the
    doc-level lang is computed in the same scan."""
    docs = _t_wide(spark, sf_dir, "documents")
    page_text = F.concat(
        F.lit("wm-header "),
        F.col("source"),
        F.lit(" common header line\n"),
        F.col("text"),
        F.lit("\nwm-footer "),
        F.col("source"),
        F.lit(" shared footer line"),
    )
    # NOTE: lang_id_expr builds a named struct internally; Spark's
    # generator rewrite strips struct field names when the expression
    # shares a projection with explode(), so each lang-ID lives in its
    # own stage.
    lines = (
        docs.withColumn("page_text", page_text)
        .withColumn("doc_lang", lang_id_expr(F.col("page_text")))
        .select(
            "doc_id",
            "doc_lang",
            F.explode(F.split(F.col("page_text"), "\n", -1)).alias("line"),
        )
        .withColumn("line_lang", lang_id_expr(F.col("line")))
    )
    per = lines.groupBy("doc_id", "doc_lang", "line_lang").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("c").desc(), F.col("line_lang")
    )
    tot = per.groupBy("doc_id", "doc_lang").agg(F.sum("c").alias("n_lines"))
    top = per.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return top.join(tot, ["doc_id", "doc_lang"]).select(
        "doc_id",
        "doc_lang",
        F.col("line_lang").alias("majority_line_lang"),
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("c").cast("bigint").alias("n_majority_lines"),
        F.expr(
            "CAST(((n_lines - c) * 1000000) div n_lines AS BIGINT)"
        ).alias("mixture_ppm"),
        (F.col("doc_lang") == F.col("line_lang")).alias("granularity_agree"),
    )


def _duck_lang_case() -> str:
    return """CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
            WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
            WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
            WHEN h_es >= h_fr THEN 'es'
            ELSE 'fr' END"""


ORACLE_Q195 = f"""
WITH pages AS (
{_DUCK_DERIVED_PAGES}
), dp AS (
  SELECT doc_id, replace(' ' || lower(text) || ' ', chr(10), ' ') AS padded
  FROM pages
), dl AS (
  SELECT doc_id, {_duck_lang_case()} AS doc_lang
  FROM (SELECT doc_id, {_duck_hits('de')} AS h_de, {_duck_hits('en')} AS h_en,
               {_duck_hits('es')} AS h_es, {_duck_hits('fr')} AS h_fr
        FROM dp)
), lp AS (
  SELECT doc_id, replace(' ' || lower(line) || ' ', chr(10), ' ') AS padded
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS line
        FROM pages)
), ll AS (
  SELECT doc_id, {_duck_lang_case()} AS line_lang
  FROM (SELECT doc_id, {_duck_hits('de')} AS h_de, {_duck_hits('en')} AS h_en,
               {_duck_hits('es')} AS h_es, {_duck_hits('fr')} AS h_fr
        FROM lp)
), per AS (
  SELECT doc_id, line_lang, count(*) AS c FROM ll GROUP BY 1, 2
), tot AS (
  SELECT doc_id, sum(c) AS n_lines FROM per GROUP BY 1
), top AS (
  SELECT doc_id, line_lang, c FROM (
    SELECT doc_id, line_lang, c,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY c DESC, line_lang) AS rn
    FROM per) WHERE rn = 1
)
SELECT d.doc_id, d.doc_lang, t.line_lang AS majority_line_lang,
       CAST(n.n_lines AS BIGINT) AS n_lines,
       CAST(t.c AS BIGINT) AS n_majority_lines,
       CAST(((n.n_lines - t.c) * 1000000) // n.n_lines AS BIGINT)
         AS mixture_ppm,
       d.doc_lang = t.line_lang AS granularity_agree
FROM dl d JOIN top t ON t.doc_id = d.doc_id JOIN tot n ON n.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# q196: retraction-aware incremental second-moment maintenance
# ---------------------------------------------------------------------------


def q196_retraction_variance(spark, sf_dir):
    """Incremental (n, sum, sum-of-squares) maintenance under a CDC
    change stream WITH DELETIONS: the per-(lang, source) second-moment
    state is refreshed by adding SIGNED contributions (+1 per insert,
    -1 per retraction) to the stored base partials — count/sum/sumsq
    form an abelian GROUP, so deletes are exact, which is precisely
    what q74's monoid merge (min/max by least/greatest) cannot do: a
    retracted max is unrecoverable without a rescan, a retracted
    second moment is one subtraction.  The query carries its own
    audit: the maintained state is compared against a from-scratch
    recompute over the final membership, and the integer-exact scaled
    second moment m2 = n*sumsq - sum^2 (= n^2 * variance) is derived
    from exactly-agreed integers.  Split discipline follows q74: base
    = hash-bucketed 80% minus ALL 'fr' rows, inserts = the complement
    (so not-matched-insert is exercised), deletes = base rows with
    hash bucket < 2 (so matched-retract is exercised; pytest asserts
    both non-vacuous).

    Scale shape: the scan reads only base + delta in production (here
    both derive from one table); merge moves #groups rows through one
    full-outer join; the audit recompute is the oracle's job, not a
    production cost."""
    docs = _t(spark, sf_dir, "documents").select(
        "lang",
        "source",
        F.col("n_chars").cast("bigint").alias("x"),
        (
            md5_i64_expr(F.col("doc_id").cast("string"), salt="rv#") % 10
        ).alias("h"),
    )
    is_base = (F.col("h") < 8) & (F.col("lang") != "fr")
    base = docs.where(is_base)
    state0 = base.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum("x").alias("s0"),
        F.sum(F.col("x") * F.col("x")).alias("q0"),
    )
    changes = (
        docs.where(~is_base)
        .withColumn("sign", F.lit(1))
        .unionByName(
            docs.where(is_base & (F.col("h") < 2)).withColumn(
                "sign", F.lit(-1)
            )
        )
    )
    delta = changes.groupBy("lang", "source").agg(
        F.sum("sign").alias("dn"),
        F.sum(F.col("sign") * F.col("x")).alias("ds"),
        F.sum(F.col("sign") * F.col("x") * F.col("x")).alias("dq"),
    )
    merged = (
        state0.join(delta, ["lang", "source"], "full_outer")
        .select(
            "lang",
            "source",
            (
                F.coalesce(F.col("n0"), F.lit(0))
                + F.coalesce(F.col("dn"), F.lit(0))
            ).alias("n_docs"),
            (
                F.coalesce(F.col("s0"), F.lit(0))
                + F.coalesce(F.col("ds"), F.lit(0))
            ).alias("sum_chars"),
            (
                F.coalesce(F.col("q0"), F.lit(0))
                + F.coalesce(F.col("dq"), F.lit(0))
            ).alias("sumsq_chars"),
        )
    )
    final = (
        docs.where((F.col("h") >= 2) | (F.col("lang") == "fr"))
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("fn"),
            F.sum("x").alias("fs"),
            F.sum(F.col("x") * F.col("x")).alias("fq"),
        )
    )
    return (
        merged.join(final, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("sum_chars").cast("bigint").alias("sum_chars"),
            F.col("sumsq_chars").cast("bigint").alias("sumsq_chars"),
            F.expr(
                "CAST(n_docs * sumsq_chars - sum_chars * sum_chars"
                " AS BIGINT)"
            ).alias("m2"),
            (
                (F.col("n_docs") == F.coalesce(F.col("fn"), F.lit(0)))
                & (F.col("sum_chars") == F.coalesce(F.col("fs"), F.lit(0)))
                & (F.col("sumsq_chars") == F.coalesce(F.col("fq"), F.lit(0)))
            ).alias("matches_recompute"),
        )
    )


_Q196_HASH = duck_md5_i64("CAST(doc_id AS VARCHAR)", salt="rv#")

ORACLE_Q196 = f"""
WITH d AS (
  SELECT lang, source, CAST(n_chars AS BIGINT) AS x,
         {_Q196_HASH} % 10 AS h
  FROM documents
),
state0 AS (
  SELECT lang, source, count(*) AS n0, sum(x) AS s0, sum(x * x) AS q0
  FROM d WHERE h < 8 AND lang <> 'fr' GROUP BY 1, 2
),
changes AS (
  SELECT lang, source, x, 1 AS sign FROM d WHERE h >= 8 OR lang = 'fr'
  UNION ALL
  SELECT lang, source, x, -1 AS sign
  FROM d WHERE h < 2 AND lang <> 'fr'
),
delta AS (
  SELECT lang, source, sum(sign) AS dn, sum(sign * x) AS ds,
         sum(sign * x * x) AS dq
  FROM changes GROUP BY 1, 2
),
merged AS (
  SELECT coalesce(s.lang, t.lang) AS lang,
         coalesce(s.source, t.source) AS source,
         coalesce(s.n0, 0) + coalesce(t.dn, 0) AS n_docs,
         coalesce(s.s0, 0) + coalesce(t.ds, 0) AS sum_chars,
         coalesce(s.q0, 0) + coalesce(t.dq, 0) AS sumsq_chars
  FROM state0 s FULL OUTER JOIN delta t
    ON s.lang = t.lang AND s.source = t.source
),
final AS (
  SELECT lang, source, count(*) AS fn, sum(x) AS fs, sum(x * x) AS fq
  FROM d WHERE h >= 2 OR lang = 'fr' GROUP BY 1, 2
)
SELECT m.lang, m.source, CAST(m.n_docs AS BIGINT) AS n_docs,
       CAST(m.sum_chars AS BIGINT) AS sum_chars,
       CAST(m.sumsq_chars AS BIGINT) AS sumsq_chars,
       CAST(m.n_docs * m.sumsq_chars - m.sum_chars * m.sum_chars AS BIGINT)
         AS m2,
       (m.n_docs = coalesce(f.fn, 0) AND m.sum_chars = coalesce(f.fs, 0)
        AND m.sumsq_chars = coalesce(f.fq, 0)) AS matches_recompute
FROM merged m LEFT JOIN final f
  ON f.lang = m.lang AND f.source = m.source
"""


# ---------------------------------------------------------------------------
# q197: perceptual average-hash (aHash) media near-dup detection
# ---------------------------------------------------------------------------

_Q197_PIX = 60      # pooled "pixels" (60 = portable-hash bigint width)
_Q197_BANDS = 4     # 4 x 15-bit bands -> complete for hamming <= 3
_Q197_HAM_MAX = _Q197_BANDS - 1


def _q197_ahash_udf():
    """The vectorized aHash media kernel — see functions/ahash.py for
    the numpy implementation and the performance history (two
    pure-Catalyst HOF versions measured 625 s / 493 s at sf0.1; the
    Arrow-batched kernel ~2 s, bit-identical semantics)."""
    from ..functions.ahash import ahash_udf

    return ahash_udf


def _q197_pix_duck(col: str) -> str:
    L = f"length({col})"
    P = _Q197_PIX
    return (
        f"list_transform(range(0, {P}), j -> "
        f"CASE WHEN ((j+1) * {L}) // {P} <= (j * {L}) // {P} THEN 0 "
        f"ELSE list_sum(list_transform("
        f"range((j * {L}) // {P} + 1, ((j+1) * {L}) // {P} + 1),"
        f" i -> ord(substr({col}, CAST(i AS INT), 1))))"
        f" // (((j+1) * {L}) // {P} - (j * {L}) // {P}) END)"
    )


def q197_ahash_media_dedup(spark, sf_dir):
    """Perceptual average-hash (aHash) media near-duplicate detection —
    the image-dedup pipeline stage, with the DECODE step replaced by a
    deterministic byte-pooling stand-in (real decoders are stubbed,
    Pillow absent — operators/multimodal.py documents the seam; the
    hashing, banding and verification below are the production
    plumbing unchanged): payloads pool into {_Q197_PIX} "pixels"
    (integer mean of byte values per equal segment), a bit is set
    where pixel*{_Q197_PIX} > sum(pixels) (the aHash
    brighter-than-mean rule, integer-exact), and near-dup candidates
    come from a {_Q197_BANDS}x15-bit BAND equi-join — pigeonhole-
    COMPLETE for hamming <= {_Q197_HAM_MAX} — then exact
    bit_count(XOR) verifies.  The fixture plants same-length tail
    substitutions (hamming 0-1, found) AND tail APPENDS (every pool
    boundary shifts, hamming 14+, correctly rejected — aHash is
    robust to local edits, not to geometry changes, exactly like the
    real thing).  q23 simhashes TOKEN sets; this hashes raw payload
    bytes — the modality where no tokens exist.

    Scale shape: hashing is per-row map-side HOF work; candidates are
    a fixed-width band equi-join (never all-pairs); the XOR verify
    runs on candidates only."""
    docs = _t_wide(spark, sf_dir, "documents")
    media = (
        docs.select(
            F.col("doc_id").alias("media_id"),
            F.col("text").alias("payload"),
        )
        .unionByName(
            docs.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 100000).alias("media_id"),
                F.concat(
                    F.expr("substring(text, 1, length(text) - 3)"),
                    F.lit(" zz"),
                ).alias("payload"),
            )
        )
        .unionByName(
            docs.where(F.col("doc_id") % 50 == 0).select(
                (F.col("doc_id") + 200000).alias("media_id"),
                F.concat(F.col("text"), F.lit(" zz")).alias("payload"),
            )
        )
    )
    hashed = media.select(
        "media_id", _q197_ahash_udf()(F.col("payload")).alias("ahash")
    )
    bands = hashed.select(
        "media_id",
        "ahash",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_Q197_BANDS - 1}), b ->"
                " named_struct('b', b,"
                " 'v', shiftrightunsigned(ahash, CAST(b * 15 AS INT))"
                " % 32768))"
            )
        ).alias("bd"),
    ).select(
        "media_id", "ahash", F.col("bd.b").alias("b"), F.col("bd.v").alias("v")
    )
    left = bands.select(
        F.col("media_id").alias("id_a"),
        F.col("ahash").alias("ahash_a"),
        "b",
        "v",
    )
    right = bands.select(
        F.col("media_id").alias("id_b"),
        F.col("ahash").alias("ahash_b"),
        "b",
        "v",
    )
    pairs = (
        left.join(right, ["b", "v"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ahash_a", "ahash_b")
        .distinct()
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.expr("CAST(bit_count(ahash_a ^ ahash_b) AS BIGINT)").alias(
            "hamming"
        ),
    ).where(F.col("hamming") <= _Q197_HAM_MAX)


def _oracle_q197() -> str:
    return f"""
WITH media AS (
  SELECT doc_id AS media_id, text AS payload FROM documents
  UNION ALL
  SELECT doc_id + 100000,
         substr(text, 1, length(text) - 3) || ' zz'
  FROM documents WHERE doc_id % 50 = 0
  UNION ALL
  SELECT doc_id + 200000, text || ' zz'
  FROM documents WHERE doc_id % 50 = 0
),
pixed AS (
  SELECT media_id, {_q197_pix_duck('payload')} AS pix FROM media
),
hashed AS (
  SELECT media_id,
         list_sum(list_transform(range(0, {_Q197_PIX}), j ->
           CASE WHEN pix[j+1] * {_Q197_PIX} > list_sum(pix)
                THEN (1::BIGINT << j) ELSE 0::BIGINT END)) AS ahash
  FROM pixed
),
bands AS (
  SELECT media_id, ahash, b, (ahash >> (b * 15)) % 32768 AS v
  FROM hashed, (SELECT unnest(range(0, {_Q197_BANDS})) AS b)
),
pairs AS (
  SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
         a.ahash AS ahash_a, b.ahash AS ahash_b
  FROM bands a JOIN bands b
    ON a.b = b.b AND a.v = b.v AND a.media_id < b.media_id
)
SELECT id_a, id_b,
       CAST(bit_count(xor(ahash_a, ahash_b)) AS BIGINT) AS hamming
FROM pairs
WHERE bit_count(xor(ahash_a, ahash_b)) <= {_Q197_HAM_MAX}
"""


ORACLE_Q197 = _oracle_q197()


# ---------------------------------------------------------------------------
# q198: TPC-H Q7-shaped cross-nation shipping volume
# ---------------------------------------------------------------------------


def q198_cross_nation_volume(spark, sf_dir):
    """TPC-H Q7-shaped cross-nation volume: revenue shipped between
    every DISTINCT (supplier nation, customer nation) pair by ship
    year, date-bounded.  q138 covers the Q5 shape (same-nation
    colocation through a region filter); Q7's twist is the DOUBLE
    nation dimension — the same tiny table joined twice under two
    roles with an inequality between the roles — plus a year
    extraction on the fact side.  (The classic two-nation literal
    filter is dropped: at test SF it selects zero rows; the full pair
    matrix keeps the aggregate non-vacuous and strictly harder.)

    Scale shape: supplier/customer/nation are dimension-scale and
    broadcast — nation twice under different roles; lineitem is
    touched once with the ship-date filter pushed to the scan; one
    hash agg on (supp_nation, cust_nation, year); revenue sums in
    DECIMAL — shuffle-order-exact."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1996-12-31").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"),
        F.col("n_name").alias("supp_nation"),
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"),
        F.col("n_name").alias("cust_nation"),
    )
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("decimal(18,4)")
    joined = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count(F.lit(1)).cast("bigint").alias("n_items"),
    )


ORACLE_Q198 = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(
         CAST(l_extendedprice AS DECIMAL(18,2)) *
         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
  AND n1.n_name <> n2.n_name
GROUP BY 1, 2, 3
"""


# ---------------------------------------------------------------------------
# q199: HITS hubs & authorities (integer, fixed-iteration)
# ---------------------------------------------------------------------------


def q199_user_hits(spark, sf_dir):
    """Fixed-iteration (3) integer HITS over the q63 user transition
    graph: hubs point at good authorities, authorities are pointed at
    by good hubs — the mutual-reinforcement fixpoint, versus
    PageRank's damped random walk (one score + teleport).  HITS needs
    NO division at all: pure BIGINT sums every iteration, parallel
    edges acting as weights, so all 3 unrolled iterations sit
    bit-exact on the oracle (operators/graph.py:hits_integer /
    duck_hits_sql).  The delta vs q63 is the algorithm, not the
    fixture: different fixpoint, different join pattern (alternating
    u-keyed and v-keyed aggregations), and the hub/authority SPLIT
    itself — a crawl-frontier ranker wants authorities, a seed-list
    builder wants hubs.

    Scale shape: two fixed-width equi-join + hash-agg shuffles per
    iteration over the edge relation; node/edge relations
    localCheckpoint'd once (the q62/q63 iterative-lineage
    discipline)."""
    from ..operators.graph import hits_integer

    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    edges = (
        ev.select("user_id", F.lead("user_id").over(w).alias("next_user"))
        .where(
            F.col("next_user").isNotNull()
            & (F.col("next_user") != F.col("user_id"))
        )
        .select(
            F.col("user_id").alias("src"), F.col("next_user").alias("dst")
        )
    )
    return hits_integer(edges, iterations=3).select(
        F.col("node").alias("user_id"), "hub_score", "auth_score"
    )


def _oracle_q199() -> str:
    from ..operators.graph import duck_hits_sql

    edges_cte = """edges AS (
  SELECT src, dst FROM (
    SELECT user_id AS src,
           lead(user_id) OVER (PARTITION BY event_type ORDER BY ts, event_id) AS dst
    FROM events
  ) WHERE dst IS NOT NULL AND dst <> src
)"""
    sql = duck_hits_sql(edges_cte, iterations=3)
    return sql.replace("SELECT n.node,", "SELECT n.node AS user_id,", 1)


ORACLE_Q199 = _oracle_q199()


# ---------------------------------------------------------------------------
# q200: crawl novelty-decay curve (Heaps-law telemetry)
# ---------------------------------------------------------------------------

_Q200_BATCH = 50  # docs per crawl batch


def q200_novelty_decay(spark, sf_dir):
    """Crawl novelty-decay curve (Heaps-law telemetry): the corpus is
    read as a sequence of crawl batches (doc_id div {_Q200_BATCH}) and
    each batch is scored by how much of its shingle vocabulary is NEW
    — first seen in that batch — plus the cumulative distinct-shingle
    count: the curve whose flattening says "this crawl has dried up,
    stop paying for it".  q88 ranks the vocabulary by FREQUENCY (the
    tokenizer-sizing curve); q119 diffs exactly TWO snapshots; this
    profiles first-occurrence mass across the whole crawl TIMELINE.

    Scale shape: one (shingle -> min batch) hash agg over the
    exploded distinct grams, one (gram, batch) distinct, two
    batch-scale joins; the running total windows over the tiny
    per-batch relation, never raw grams."""
    docs = _t_wide(spark, sf_dir, "documents")
    grams = docs.select(
        (F.col("doc_id") / _Q200_BATCH).cast("bigint").alias("batch"),
        F.explode(
            F.array_distinct(doc_shingles_expr(F.col("text")))
        ).alias("gram"),
    )
    gb = grams.distinct()
    first = gb.groupBy("gram").agg(F.min("batch").alias("first_batch"))
    per_batch = gb.groupBy("batch").agg(F.count(F.lit(1)).alias("n_grams"))
    novel = first.groupBy(F.col("first_batch").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    w = Window.orderBy("batch").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_batch.join(novel, "batch", "left")
        .withColumn("n_novel", F.coalesce(F.col("n_novel"), F.lit(0)))
        .select(
            F.col("batch").cast("bigint").alias("batch"),
            F.col("n_grams").cast("bigint").alias("n_grams"),
            F.col("n_novel").cast("bigint").alias("n_novel"),
            F.expr(
                "CAST((n_novel * 1000000) div n_grams AS BIGINT)"
            ).alias("novelty_ppm"),
            F.sum("n_novel").over(w).cast("bigint").alias("cum_vocab"),
        )
    )


ORACLE_Q200 = f"""
WITH grams AS (
  SELECT DISTINCT doc_id // {_Q200_BATCH} AS batch, gram FROM (
    SELECT doc_id,
           unnest(list_distinct({_DUCK_SHINGLES.format(col='text')})) AS gram
    FROM documents)
),
first AS (SELECT gram, min(batch) AS first_batch FROM grams GROUP BY 1),
per_batch AS (SELECT batch, count(*) AS n_grams FROM grams GROUP BY 1),
novel AS (
  SELECT first_batch AS batch, count(*) AS n_novel FROM first GROUP BY 1
)
SELECT CAST(p.batch AS BIGINT) AS batch,
       CAST(p.n_grams AS BIGINT) AS n_grams,
       CAST(coalesce(v.n_novel, 0) AS BIGINT) AS n_novel,
       CAST((coalesce(v.n_novel, 0) * 1000000) // p.n_grams AS BIGINT)
         AS novelty_ppm,
       CAST(sum(coalesce(v.n_novel, 0))
              OVER (ORDER BY p.batch
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_vocab
FROM per_batch p LEFT JOIN novel v ON v.batch = p.batch
"""


# ---------------------------------------------------------------------------
# q201: bipartite butterfly (4-cycle) cohesion census
# ---------------------------------------------------------------------------


def q201_butterfly_cohesion(spark, sf_dir):
    """Bipartite butterfly (4-cycle) census over the user x item
    two-mode graph (item = props.k): for every item pair, the number
    of co-visiting users (wedges w), the exact butterfly count
    C(w, 2) — two users both touching both items, the smallest
    bipartite cohesion motif — and a normalised cohesion_ppm =
    butterflies / C(min(deg_i, deg_j), 2), the achieved share of the
    maximum motifs the sparser endpoint allows.  The delta vs q191
    (capped co-click cosine): q191 SCORES pairs for recommendation
    with a sampled/capped generator; this is the exact MOTIF CENSUS —
    the bipartite analog of q68/q165's triangle counting (3-cycles
    don't exist in bipartite graphs; butterflies are the clustering
    primitive there, Sanei-Mehri et al., KDD'18) — used to audit
    co-visitation density / collusion rings, where a sampled cap
    would bias the count itself.

    Scale shape: wedges are generated from the USER side (item pairs
    per user) because the item catalog is the bounded side of a web
    two-mode graph (users ~10^9, items/templates ~10^5) — per-user
    pair fan-out is C(catalog, 2) worst-case, and production
    butterfly counting picks the wedge side by the smaller sum of
    squared degrees (the q191 cap is the SCORING answer; the census
    answer is side selection).  After the one user-keyed equi-join,
    everything is (item, item)-pair hash aggs + a broadcast-size
    degree join; butterflies come from wedge COUNTS, never enumerated
    4-tuples."""
    ev = _t(spark, sf_dir, "events")
    edges = (
        ev.select(
            "user_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("item"),
        )
        .where(F.col("item").isNotNull())
        .distinct()
    )
    deg = edges.groupBy("item").agg(F.count(F.lit(1)).alias("deg"))
    e1 = edges.select("user_id", F.col("item").alias("item_i"))
    e2 = edges.select("user_id", F.col("item").alias("item_j"))
    wedges = (
        e1.join(e2, "user_id")
        .where(F.col("item_i") < F.col("item_j"))
        .groupBy("item_i", "item_j")
        .agg(F.count(F.lit(1)).alias("wedges"))
        .where(F.col("wedges") >= 2)
    )
    di = F.broadcast(deg.select(F.col("item").alias("item_i"), F.col("deg").alias("deg_i")))
    dj = F.broadcast(deg.select(F.col("item").alias("item_j"), F.col("deg").alias("deg_j")))
    return (
        wedges.join(di, "item_i")
        .join(dj, "item_j")
        .select(
            "item_i",
            "item_j",
            F.col("deg_i").cast("bigint").alias("deg_i"),
            F.col("deg_j").cast("bigint").alias("deg_j"),
            F.col("wedges").cast("bigint").alias("wedges"),
            F.expr("CAST((wedges * (wedges - 1)) div 2 AS BIGINT)").alias(
                "butterflies"
            ),
            F.expr(
                "CAST(((wedges * (wedges - 1)) div 2) * 1000000 div "
                "((least(deg_i, deg_j) * (least(deg_i, deg_j) - 1)) div 2) "
                "AS BIGINT)"
            ).alias("cohesion_ppm"),
        )
    )


ORACLE_Q201 = """
WITH edges AS (
  SELECT DISTINCT user_id,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS item
  FROM events
  WHERE json_extract_string(props, '$.k') IS NOT NULL
),
deg AS (SELECT item, count(*) AS deg FROM edges GROUP BY 1),
wedges AS (
  SELECT e1.item AS item_i, e2.item AS item_j, count(*) AS wedges
  FROM edges e1 JOIN edges e2
    ON e1.user_id = e2.user_id AND e1.item < e2.item
  GROUP BY 1, 2 HAVING count(*) >= 2
)
SELECT w.item_i, w.item_j,
       CAST(di.deg AS BIGINT) AS deg_i,
       CAST(dj.deg AS BIGINT) AS deg_j,
       CAST(w.wedges AS BIGINT) AS wedges,
       CAST((w.wedges * (w.wedges - 1)) // 2 AS BIGINT) AS butterflies,
       CAST(((w.wedges * (w.wedges - 1)) // 2) * 1000000 //
            ((least(di.deg, dj.deg) * (least(di.deg, dj.deg) - 1)) // 2)
            AS BIGINT) AS cohesion_ppm
FROM wedges w
JOIN deg di ON di.item = w.item_i
JOIN deg dj ON dj.item = w.item_j
"""


# ---------------------------------------------------------------------------
# q202: session landing/exit-page analytics with bounce rate
# ---------------------------------------------------------------------------


def q202_landing_exit_analytics(spark, sf_dir):
    """Session landing/exit analytics (the web-analytics entry-page
    report): events are sessionized per user with the q11 5-minute
    gap rule under deterministic (ts, event_id) ordering, each
    session is labelled with its LANDING (first) and EXIT (last)
    event type, and per landing type the report emits session count,
    single-event bounce count, bounce_ppm, and the modal exit type
    (most sessions; ties broken alphabetically).  q11 emits the
    session extents, q65/q135 match fixed in-session patterns,
    q184 profiles transition timing — none attribute sessions to
    their ENTRY point, which is what landing-page quality / crawl
    entry-point analysis consumes.

    Scale shape: one user-keyed window shuffle (lag + cumsum + the
    first/last window all share the user partitioning), one
    session-scale distinct, then TYPE²-bounded aggregations — the
    raw event relation is touched by exactly one Exchange."""
    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(wo)
    marked = ev.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(
            prev.isNull()
            | (F.unix_timestamp("ts") - F.unix_timestamp(prev) > 300),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = marked.withColumn(
        "session_id",
        F.sum("new_session").over(
            wo.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    ws = Window.partitionBy("user_id", "session_id").orderBy(
        "ts", "event_id"
    )
    wall = ws.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    sessions = numbered.select(
        "user_id",
        "session_id",
        F.first("event_type").over(ws).alias("landing"),
        F.last("event_type").over(wall).alias("exit"),
        F.count(F.lit(1)).over(wall).alias("n_events"),
    ).distinct()
    per_le = sessions.groupBy("landing", "exit").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0)).alias(
            "n_bounces"
        ),
    )
    wr = Window.partitionBy("landing").orderBy(
        F.col("n_sessions").desc(), F.col("exit").asc()
    )
    return (
        per_le.withColumn("rnk", F.row_number().over(wr))
        .groupBy("landing")
        .agg(
            F.sum("n_sessions").cast("bigint").alias("n_sessions"),
            F.sum("n_bounces").cast("bigint").alias("n_bounces"),
            F.max(F.when(F.col("rnk") == 1, F.col("exit"))).alias(
                "top_exit"
            ),
            F.max(F.when(F.col("rnk") == 1, F.col("n_sessions")))
            .cast("bigint")
            .alias("top_exit_sessions"),
        )
        .withColumn(
            "bounce_ppm",
            F.expr("CAST(n_bounces * 1000000 div n_sessions AS BIGINT)"),
        )
        .select(
            "landing",
            "n_sessions",
            "n_bounces",
            "bounce_ppm",
            "top_exit",
            "top_exit_sessions",
        )
    )


ORACLE_Q202 = """
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > INTERVAL 5 minutes
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sessions AS (
  SELECT DISTINCT user_id, session_id,
         first_value(event_type) OVER ws AS landing,
         last_value(event_type) OVER
           (PARTITION BY user_id, session_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS exit,
         count(*) OVER
           (PARTITION BY user_id, session_id) AS n_events
  FROM numbered
  WINDOW ws AS (PARTITION BY user_id, session_id ORDER BY ts, event_id)
), per_le AS (
  SELECT landing, exit, count(*) AS n_sessions,
         sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS n_bounces
  FROM sessions GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY landing
                               ORDER BY n_sessions DESC, exit) AS rnk
  FROM per_le
)
SELECT landing,
       CAST(sum(n_sessions) AS BIGINT) AS n_sessions,
       CAST(sum(n_bounces) AS BIGINT) AS n_bounces,
       CAST(sum(n_bounces) * 1000000 // sum(n_sessions) AS BIGINT) AS bounce_ppm,
       max(CASE WHEN rnk = 1 THEN exit END) AS top_exit,
       CAST(max(CASE WHEN rnk = 1 THEN n_sessions END) AS BIGINT)
         AS top_exit_sessions
FROM ranked GROUP BY 1
"""


# ---------------------------------------------------------------------------
# q203: autocomplete prefix top-k completion table
# ---------------------------------------------------------------------------

_Q203_MAXP = 5  # longest indexed prefix
_Q203_TOPK = 3  # completions kept per prefix


def q203_autocomplete_topk(spark, sf_dir):
    """Type-ahead completion table (the search-box autocomplete
    primitive): the corpus vocabulary is aggregated once (token ->
    corpus frequency), every distinct term is exploded into its
    prefixes of length 1..{_Q203_MAXP}, and per prefix the top
    {_Q203_TOPK} completions by (frequency DESC, token ASC) are kept
    — the table a serving tier loads verbatim.  q101/q140 do
    longest-prefix ROUTING of a URL against a small rule set; this
    builds the inverse artifact — a ranked completion index over the
    whole vocabulary — and q51's trending ranks tokens per window,
    not per prefix.

    Scale shape: the explosion happens on the AGGREGATED vocab
    relation (Heaps-law bounded, ~10^7 terms at 100 TB), never the
    10^12-token raw stream — one token hash agg, then a <=
    {_Q203_MAXP}x vocab-scale explode and a rank over (prefix) groups
    of the pre-aggregated counts (the q51 discipline)."""
    docs = _t_wide(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split(F.col("text"), "[ \n]+"), lambda t: t != F.lit("")
            )
        ).alias("token")
    )
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    pref = vocab.select(
        "token",
        "freq",
        F.explode(
            F.sequence(
                F.lit(1), F.least(F.length("token"), F.lit(_Q203_MAXP))
            )
        ).alias("plen"),
    ).select(
        F.expr("substring(token, 1, plen)").alias("prefix"),
        F.col("token").alias("completion"),
        "freq",
    )
    wr = Window.partitionBy("prefix").orderBy(
        F.col("freq").desc(), F.col("completion").asc()
    )
    return (
        pref.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= _Q203_TOPK)
        .select(
            "prefix",
            F.col("rank").cast("int").alias("rank"),
            "completion",
            F.col("freq").cast("bigint").alias("freq"),
        )
    )


ORACLE_Q203 = f"""
WITH toks AS (
  SELECT unnest(list_filter(regexp_split_to_array(text, '[ \n]+'),
                            t -> t <> '')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*) AS freq FROM toks GROUP BY 1),
pref AS (
  SELECT substring(token, 1, plen) AS prefix, token AS completion, freq
  FROM (SELECT token, freq,
               unnest(range(1, least(length(token), {_Q203_MAXP}) + 1))
                 AS plen
        FROM vocab)
),
ranked AS (
  SELECT prefix, completion, freq,
         row_number() OVER (PARTITION BY prefix
                            ORDER BY freq DESC, completion) AS rnk
  FROM pref
)
SELECT prefix, CAST(rnk AS INTEGER) AS rank, completion,
       CAST(freq AS BIGINT) AS freq
FROM ranked WHERE rnk <= {_Q203_TOPK}
"""


# ---------------------------------------------------------------------------
# q204: classifier calibration audit (reliability bins + gap)
# ---------------------------------------------------------------------------


def q204_langid_calibration(spark, sf_dir):
    """Classifier calibration audit (reliability diagram + per-bin
    ECE terms) for an en-stopword-DENSITY classifier: each doc's
    CONFIDENCE that it is English is its en-marker hits per token,
    scaled by 20 and capped (conf_ppm = least(1e6, hits*20*1e6 div
    tokens) — a density of >= 1 marker per 20 tokens reads as
    certainty); the ground-truth LABEL is the stored lang column.
    Docs are bucketed into 10 confidence bins and each bin reports
    count, mean confidence, observed accuracy and the |confidence -
    accuracy| gap — the per-bin terms of Expected Calibration Error,
    the go/no-go artifact before a classifier's scores are used as
    sampling weights (a mis-calibrated quality scorer silently
    reweights the corpus).  q124 builds the confusion MATRIX (hard
    argmax errors); this audits the SCORES themselves — a classifier
    can have fine accuracy and useless probabilities.

    All integer-exact: bin = least(9, conf*10 div 1e6),
    accuracy/mean in ppm by integer division — bit-identical in both
    engines.

    Scale shape: pure map-side marker counting (Catalyst string ops,
    no UDF) + ONE 10-group hash agg; nothing but the scan touches
    the 10^12-doc relation."""
    from ..functions.text import stopword_hits_expr, token_count_expr

    docs = _t_wide(spark, sf_dir, "documents")
    scored = docs.select(
        (F.col("lang") == "en").cast("int").alias("is_en"),
        stopword_hits_expr(F.col("text"), "en").alias("h_en"),
        token_count_expr(F.col("text")).alias("toks"),
    ).where(F.col("toks") > 0)
    conf = F.expr(
        "CAST(least(1000000, h_en * 20 * 1000000 div toks) AS BIGINT)"
    )
    binned = scored.select(
        F.least(
            F.lit(9), (conf * 10 / F.lit(1000000)).cast("bigint")
        ).alias("bin"),
        conf.alias("conf_ppm"),
        "is_en",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("conf_ppm").alias("sum_conf"),
            F.sum("is_en").alias("n_pos"),
        )
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.expr("CAST(sum_conf div n_docs AS BIGINT)").alias(
                "mean_conf_ppm"
            ),
            F.expr("CAST(n_pos * 1000000 div n_docs AS BIGINT)").alias(
                "acc_ppm"
            ),
            F.expr(
                "CAST(abs(sum_conf div n_docs - "
                "n_pos * 1000000 div n_docs) AS BIGINT)"
            ).alias("gap_ppm"),
        )
    )


def _oracle_q204() -> str:
    return f"""
WITH p AS (
  SELECT lang, replace(' ' || lower(text) || ' ', chr(10), ' ') AS padded,
         len(list_filter(string_split(text, ' '), t -> t <> '')) AS toks
  FROM documents
), scored AS (
  SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_en,
         {_duck_hits('en')} AS h_en, toks
  FROM p
), binned AS (
  SELECT least(9, least(1000000, h_en * 20 * 1000000 // toks) * 10
                  // 1000000) AS bin,
         least(1000000, h_en * 20 * 1000000 // toks) AS conf_ppm, is_en
  FROM scored WHERE toks > 0
)
SELECT CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(conf_ppm) // count(*) AS BIGINT) AS mean_conf_ppm,
       CAST(sum(is_en) * 1000000 // count(*) AS BIGINT) AS acc_ppm,
       CAST(abs(sum(conf_ppm) // count(*) -
                sum(is_en) * 1000000 // count(*)) AS BIGINT) AS gap_ppm
FROM binned GROUP BY 1
"""


ORACLE_Q204 = _oracle_q204()


# ---------------------------------------------------------------------------
# q205: CIDR longest-prefix-match policy join
# ---------------------------------------------------------------------------

# prefix lengths the synthetic rule table uses; the LPM join explodes
# each address into exactly these len(.)-many candidate prefixes
_Q205_PLENS = [8, 12, 16, 20, 24]
_Q205_KNUTH = 2654435761  # Knuth multiplicative-hash constant
_Q205_SPACE = 4294967296  # 2^32


def q205_cidr_lpm_join(spark, sf_dir):
    """CIDR longest-prefix-match policy join (IP geolocation /
    blocklist routing): every client address is attributed to the
    MOST SPECIFIC matching network rule, /24 beating /16 beating /8 —
    the classic router-FIB semantics a crawl pipeline runs to tag
    fetches with network owner / geo / block status.  Addresses are
    derived deterministically from user_id (Knuth multiplicative hash
    into the 2^32 space) and the rule table from the nation dimension
    (nationkey-seeded base, prefix length cycling /8../24), so both
    engines rebuild identical inputs with pure integer arithmetic.
    q101 routes URL PATHS by string-prefix depth over '/'-segments;
    this is the numeric-interval twin: bit-prefix containment over an
    address space, where the candidate set is built by integer
    division (ip div 2^(32-plen)) — no string ops at all.

    Scale shape: the rule table is metadata-scale (broadcast); each
    address explodes into exactly len(_Q205_PLENS)=5 candidate
    prefixes joined equi on (plen, prefix) — bounded fan-out like
    q101's depth-3 chain; the winner is one row_number over the
    per-address candidate group (plen DESC, action ASC for
    collision determinism); unmatched addresses fall to 'default'
    via a left join from the address relation."""
    ev = _t(spark, sf_dir, "events")
    ips = ev.select("user_id").distinct().select(
        "user_id",
        F.expr(
            f"CAST(pmod(user_id * {_Q205_KNUTH}, {_Q205_SPACE}) AS BIGINT)"
        ).alias("ip"),
    )
    nat = _t(spark, sf_dir, "nation")
    rules = nat.select(
        F.expr(f"CAST(8 + (n_nationkey % 5) * 4 AS BIGINT)").alias("plen"),
        F.expr(
            f"CAST(pmod(n_nationkey * {_Q205_KNUTH}, {_Q205_SPACE}) div "
            f"shiftleft(CAST(1 AS BIGINT), 32 - (8 + (n_nationkey % 5) * 4)) "
            f"AS BIGINT)"
        ).alias("prefix"),
        F.col("n_name").alias("action"),
    )
    cand = ips.select(
        "user_id",
        "ip",
        F.explode(
            F.array(*[F.lit(p) for p in _Q205_PLENS])
        ).alias("plen"),
    ).withColumn(
        "ip_pref",
        F.expr("CAST(ip div shiftleft(CAST(1 AS BIGINT), 32 - plen) AS BIGINT)"),
    )
    matched = cand.join(
        F.broadcast(rules),
        (cand["plen"] == rules["plen"]) & (cand["ip_pref"] == rules["prefix"]),
    ).select("user_id", cand["plen"].alias("mplen"), "action")
    wr = Window.partitionBy("user_id").orderBy(
        F.col("mplen").desc(), F.col("action").asc()
    )
    best = (
        matched.withColumn("rnk", F.row_number().over(wr))
        .where(F.col("rnk") == 1)
        .select("user_id", F.col("mplen").alias("matched_plen"), "action")
    )
    return (
        ips.join(best, "user_id", "left")
        .select(
            "user_id",
            "ip",
            F.coalesce(F.col("matched_plen"), F.lit(0))
            .cast("bigint")
            .alias("matched_plen"),
            F.coalesce(F.col("action"), F.lit("default")).alias("action"),
        )
    )


ORACLE_Q205 = f"""
WITH ips AS (
  SELECT user_id, (user_id * {_Q205_KNUTH}) % {_Q205_SPACE} AS ip
  FROM (SELECT DISTINCT user_id FROM events)
),
rules AS (
  SELECT 8 + (n_nationkey % 5) * 4 AS plen,
         ((n_nationkey * {_Q205_KNUTH}) % {_Q205_SPACE})
           // (1::BIGINT << (32 - (8 + (n_nationkey % 5) * 4))) AS prefix,
         n_name AS action
  FROM nation
),
cand AS (
  SELECT user_id, ip, plen,
         ip // (1::BIGINT << (32 - plen)) AS ip_pref
  FROM ips, (SELECT unnest({_Q205_PLENS}) AS plen)
),
matched AS (
  SELECT c.user_id, c.plen AS mplen, r.action,
         row_number() OVER (PARTITION BY c.user_id
                            ORDER BY c.plen DESC, r.action ASC) AS rnk
  FROM cand c JOIN rules r ON c.plen = r.plen AND c.ip_pref = r.prefix
)
SELECT i.user_id, CAST(i.ip AS BIGINT) AS ip,
       CAST(coalesce(m.mplen, 0) AS BIGINT) AS matched_plen,
       coalesce(m.action, 'default') AS action
FROM ips i LEFT JOIN (SELECT * FROM matched WHERE rnk = 1) m
  ON m.user_id = i.user_id
"""


# ---------------------------------------------------------------------------
# q206: TPC-H Q10 returned-item revenue top-20
# ---------------------------------------------------------------------------


def q206_returned_item_revenue(spark, sf_dir):
    """TPC-H Q10 (returned-item revenue): customers who returned the
    most revenue in a quarter — orders in [1995-10-01, 1996-01-01)
    joined to their RETURNED lineitems (l_returnflag='R'), revenue
    summed DECIMAL-exact per customer, top 20 by (revenue DESC,
    custkey ASC).  Completes the TPC-H join-shape family: q01=Q1
    (scan agg), q138=Q5 (star), q198=Q7 (two-role dim); Q10's twist
    is the selective FACT-side filter on BOTH fact tables (date on
    orders, returnflag on lineitem) feeding a top-k — the "worst
    customers" report.

    Scale shape: both fact filters pushed to the scans, customer /
    nation dims broadcast, ONE hash agg on custkey, and the top-20 is
    a TakeOrderedAndProject (no global sort materialisation).
    Deterministic: DECIMAL sums + custkey tiebreak."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    rev = (
        F.col("l_extendedprice").cast(DEC)
        * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
    ).cast("decimal(18,4)")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


ORACLE_Q206 = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(
         CAST(l_extendedprice AS DECIMAL(18,2)) *
         (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


# ---------------------------------------------------------------------------
# q207: STREAMING windowed bottom-k distinct sample
# ---------------------------------------------------------------------------


def q207_streaming_windowed_sample(spark, sf_dir):
    """STREAMING windowed bottom-k distinct sample — the missing
    streaming member of the sampling family (q47/q76/q148/q154 are
    all batch): per (10-min window, lang), a deterministic uniform
    sample of k=8 distinct urls kept as the k smallest of 64
    bucket-min (hash, url) structs (Gibbons' distinct-sampling
    discipline — `functions/sketches.py:bottomk_windowed_stream`).
    Both stages are idempotent/merge-associative min-folds, so state
    is BOUNDED at 64 rows per (window, lang) on an unbounded stream
    and replays cannot move any kept element; q149 folds the same
    bucket-mins into a COUNT (distinct sketch), this keeps the
    PAYLOADS (the "show me 8 example pages per window per lang" that
    every monitoring dashboard and labeling queue runs).  Unlike
    rand()-sampling, every kept row is a pure function of the input
    SET — bit-reproducible on the oracle.

    Scale shape: two chained stateful hash aggs (the q53/q149
    pattern); the sample array rides the exactly-once sink and is
    exploded AFTER the drain on the committed, window-closed rows.
    Same sentinel-pinned derived stream as q53/q149."""
    from ..functions.sketches import bottomk_windowed_stream
    from ..sources.pages import stream_pages_files

    src, _ = _derived_stream_fixture(spark, sf_dir)
    stream = stream_pages_files(spark, src, 1)
    out = _drain(bottomk_windowed_stream(stream, "url"), spark)
    return (
        out.where(
            F.col("window_start") < F.lit("2027-01-01").cast("timestamp")
        )
        .select(
            F.unix_timestamp("window_start")
            .cast("bigint")
            .alias("window_start_epoch"),
            "lang",
            F.posexplode("sample").alias("pos", "s"),
        )
        .select(
            "window_start_epoch",
            "lang",
            (F.col("pos") + 1).cast("int").alias("rank"),
            F.col("s.h").cast("bigint").alias("sample_hash"),
            F.col("s.v").alias("url"),
        )
    )


def _oracle_q207() -> str:
    from ..functions.sketches import MC_HEX, SMP_BUCKETS, SMP_K

    hv = f"(('0x' || substr(md5('smp#' || url), 1, {MC_HEX}))::BIGINT)"
    return f"""
WITH pages AS (
{_DUCK_DERIVED_PAGES}
), br AS (
  SELECT CAST(floor(epoch(warc_ts) / 600) AS BIGINT) * 600 AS ws, lang,
         {hv} % {SMP_BUCKETS} AS b, {hv} AS h, url
  FROM pages
  WHERE url IS NOT NULL
), regs AS (
  SELECT ws, lang, b, h, url,
         row_number() OVER (PARTITION BY ws, lang, b
                            ORDER BY h, url) AS rb
  FROM br
), topk AS (
  SELECT ws, lang, h, url,
         row_number() OVER (PARTITION BY ws, lang ORDER BY h, url) AS rk
  FROM regs WHERE rb = 1
)
SELECT ws AS window_start_epoch, lang, CAST(rk AS INTEGER) AS rank,
       CAST(h AS BIGINT) AS sample_hash, url
FROM topk WHERE rk <= {SMP_K}
"""


ORACLE_Q207 = _oracle_q207()


# ---------------------------------------------------------------------------
# q208: group-atomic k-fold construction + cross-fold contamination
# ---------------------------------------------------------------------------

_Q208_K = 5  # folds


def q208_kfold_contamination(spark, sf_dir):
    """Group-atomic k-fold construction with a cross-fold CONTENT
    contamination matrix: folds are assigned by a portable hash of
    the GROUP key (source) — layout-independent, so re-partitioning
    a 100-TB corpus never reshuffles the folds and no source ever
    straddles folds — and then the thing q103 does NOT check is
    audited: text shared BETWEEN groups still leaks across
    group-atomic folds, so per fold pair the report counts distinct
    shingles present on both sides plus the shingle-Jaccard in ppm —
    the dedup-aware CV audit ("fold 2 shares 4% of its vocabulary
    with fold 0, cross-validation scores are optimistic by
    construction").  q103 audits group-straddling of one 3-way
    split; this builds K folds and measures CONTENT leakage between
    every pair.

    Scale shape: fold assignment is map-side; the contamination
    matrix needs ONE distinct (gram, fold) relation (grams explode
    from docs once) and a gram-keyed self-join whose fan-out is
    bounded by K=5 folds per gram — K(K-1)/2 output rows total; the
    5-row per-fold stats broadcast back onto the 10-row matrix."""
    docs = _t_wide(spark, sf_dir, "documents")
    fold = (md5_i64_expr(F.col("source"), salt="fold#") % _Q208_K).alias(
        "fold"
    )
    gf = (
        docs.select(
            fold,
            F.explode(
                F.array_distinct(doc_shingles_expr(F.col("text")))
            ).alias("gram"),
        )
        .distinct()
    )
    fold_stats = gf.groupBy("fold").agg(F.count(F.lit(1)).alias("n_grams"))
    doc_stats = docs.select(fold).groupBy("fold").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    a = gf.select(F.col("fold").alias("fold_a"), "gram")
    b = gf.select(F.col("fold").alias("fold_b"), "gram")
    shared = (
        a.join(b, "gram")
        .where(F.col("fold_a") < F.col("fold_b"))
        .groupBy("fold_a", "fold_b")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    sa = F.broadcast(
        fold_stats.join(doc_stats, "fold").select(
            F.col("fold").alias("fold_a"),
            F.col("n_docs").alias("n_docs_a"),
            F.col("n_grams").alias("n_grams_a"),
        )
    )
    sb = F.broadcast(
        fold_stats.join(doc_stats, "fold").select(
            F.col("fold").alias("fold_b"),
            F.col("n_docs").alias("n_docs_b"),
            F.col("n_grams").alias("n_grams_b"),
        )
    )
    return (
        shared.join(sa, "fold_a")
        .join(sb, "fold_b")
        .select(
            F.col("fold_a").cast("bigint").alias("fold_a"),
            F.col("fold_b").cast("bigint").alias("fold_b"),
            F.col("n_docs_a").cast("bigint").alias("n_docs_a"),
            F.col("n_docs_b").cast("bigint").alias("n_docs_b"),
            F.col("n_grams_a").cast("bigint").alias("n_grams_a"),
            F.col("n_grams_b").cast("bigint").alias("n_grams_b"),
            F.col("n_shared_grams").cast("bigint").alias("n_shared_grams"),
            F.expr(
                "CAST(n_shared_grams * 1000000 div "
                "(n_grams_a + n_grams_b - n_shared_grams) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
    )


def _oracle_q208() -> str:
    fold = f"({duck_md5_i64('source', 'fold#')}) % {_Q208_K}"
    return f"""
WITH gf AS (
  SELECT DISTINCT {fold} AS fold,
         unnest(list_distinct({_DUCK_SHINGLES.format(col='text')})) AS gram
  FROM documents
),
fold_stats AS (SELECT fold, count(*) AS n_grams FROM gf GROUP BY 1),
doc_stats AS (
  SELECT {fold} AS fold, count(*) AS n_docs FROM documents GROUP BY 1
),
shared AS (
  SELECT a.fold AS fold_a, b.fold AS fold_b, count(*) AS n_shared_grams
  FROM gf a JOIN gf b ON a.gram = b.gram AND a.fold < b.fold
  GROUP BY 1, 2
)
SELECT CAST(s.fold_a AS BIGINT) AS fold_a,
       CAST(s.fold_b AS BIGINT) AS fold_b,
       CAST(da.n_docs AS BIGINT) AS n_docs_a,
       CAST(db.n_docs AS BIGINT) AS n_docs_b,
       CAST(fa.n_grams AS BIGINT) AS n_grams_a,
       CAST(fb.n_grams AS BIGINT) AS n_grams_b,
       CAST(s.n_shared_grams AS BIGINT) AS n_shared_grams,
       CAST(s.n_shared_grams * 1000000 //
            (fa.n_grams + fb.n_grams - s.n_shared_grams) AS BIGINT)
         AS jaccard_ppm
FROM shared s
JOIN fold_stats fa ON fa.fold = s.fold_a
JOIN fold_stats fb ON fb.fold = s.fold_b
JOIN doc_stats da ON da.fold = s.fold_a
JOIN doc_stats db ON db.fold = s.fold_b
"""


ORACLE_Q208 = _oracle_q208()


# ---------------------------------------------------------------------------
# q209: leakage-safe supervised label construction (churn)
# ---------------------------------------------------------------------------

# cutoff sits on the LAST observed day of the fixture (events span
# 2024-01-01..01-30) with a 1-day label horizon: the synthetic users
# are too uniformly active (max inter-event gap ~4 days) for a longer
# horizon to ever label anyone churned.  Real deployments must also
# respect right-censoring — the horizon may not extend past observed
# data, exactly the constraint that forces this cutoff.
_Q209_CUTOFF = "2024-01-30 00:00:00"
_Q209_FEAT_DAYS = 7
_Q209_HORIZON_DAYS = 1


def q209_churn_training_set(spark, sf_dir):
    """Supervised training-set CONSTRUCTION with leakage-safe
    temporal boundaries (the label-engineering step upstream of every
    churn/abandonment model): features are aggregated STRICTLY from
    the 7 days before the cutoff, the churn label ("no activity in
    the 10 days from the cutoff") STRICTLY from after it, and the
    population is exactly the users active in the feature window —
    the three clauses whose violation is the classic target-leakage
    bug.  q103 AUDITS a split; q127 reports cohort retention
    aggregates; this EMITS the per-user (features, label) relation a
    trainer consumes.  Features: event count, distinct types,
    DECIMAL-exact value sum, recency minutes (integer) — every
    column deterministic.

    Scale shape: both time filters push to the scan; one user-keyed
    hash agg for features; the label is a left join against the
    distinct post-cutoff actives (semi-join sized); no window
    functions, no UDFs."""
    ev = _t(spark, sf_dir, "events")
    cut = F.lit(_Q209_CUTOFF).cast("timestamp")
    feat_lo = cut - F.expr(f"INTERVAL {_Q209_FEAT_DAYS} DAYS")
    lab_hi = cut + F.expr(f"INTERVAL {_Q209_HORIZON_DAYS} DAYS")
    feats = (
        ev.where((F.col("ts") >= feat_lo) & (F.col("ts") < cut))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.max(F.unix_timestamp("ts")).alias("last_epoch"),
        )
        .withColumn(
            "recency_min",
            F.expr(
                f"CAST((unix_timestamp(TIMESTAMP '{_Q209_CUTOFF}') "
                f"- last_epoch) div 60 AS BIGINT)"
            ),
        )
        .drop("last_epoch")
    )
    alive = (
        ev.where((F.col("ts") >= cut) & (F.col("ts") < lab_hi))
        .select("user_id")
        .distinct()
        .withColumn("__alive", F.lit(1))
    )
    return feats.join(alive, "user_id", "left").select(
        "user_id",
        "n_events",
        "n_types",
        "sum_value",
        "recency_min",
        F.when(F.col("__alive").isNull(), 1)
        .otherwise(0)
        .cast("int")
        .alias("churned"),
    )


ORACLE_Q209 = f"""
WITH feats AS (
  SELECT user_id,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
         CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
         CAST((epoch(TIMESTAMP '{_Q209_CUTOFF}')::BIGINT
               - floor(epoch(max(ts)))::BIGINT) // 60 AS BIGINT)
           AS recency_min
  FROM events
  WHERE ts >= TIMESTAMP '{_Q209_CUTOFF}' - INTERVAL {_Q209_FEAT_DAYS} DAYS
    AND ts <  TIMESTAMP '{_Q209_CUTOFF}'
  GROUP BY 1
),
alive AS (
  SELECT DISTINCT user_id FROM events
  WHERE ts >= TIMESTAMP '{_Q209_CUTOFF}'
    AND ts <  TIMESTAMP '{_Q209_CUTOFF}' + INTERVAL {_Q209_HORIZON_DAYS} DAYS
)
SELECT f.user_id, f.n_events, f.n_types, f.sum_value, f.recency_min,
       CAST(CASE WHEN a.user_id IS NULL THEN 1 ELSE 0 END AS INTEGER)
         AS churned
FROM feats f LEFT JOIN alive a ON a.user_id = f.user_id
"""


# ---------------------------------------------------------------------------
# q210: grid-bucketed epsilon-neighborhood (spatial) join
# ---------------------------------------------------------------------------

_Q210_EPS = 0.05


def q210_grid_epsilon_join(spark, sf_dir):
    """Grid-bucketed epsilon-neighborhood join — the SPATIAL-join
    primitive (all pairs within euclidean distance eps in the
    embedding's first-2-dim projection): each point gets a grid cell
    of side eps, ONE side explodes into its 3x3 neighborhood, and
    the candidate join is pure (cell_x, cell_y) EQUALITY with the
    exact distance predicate as a residual — the eps-ball can never
    straddle past an adjacent cell, so recall is exact, and because
    the un-exploded side stays in its own cell each pair meets
    EXACTLY once (no post-join distinct).  This is the geo/DBSCAN-
    neighborhood workhorse q24/q31/q34 (LSH/IVF, approximate by
    design) don't provide: an EXACT radius join that still never
    goes near a CartesianProduct.

    Scale shape: bounded 9x explode on one side, fixed-width
    (cell, cell) equi-join, distance residual in the join condition;
    fan-out per cell is density-bounded (eps sized to the data —
    points per cell ~ n*eps^2/area).  Floats stay deterministic:
    the predicate is the same IEEE double expression in both
    engines and the emitted distance is rounded (q20 discipline)."""
    emb = _t(spark, sf_dir, "embeddings")
    eps = _Q210_EPS
    pts = emb.select(
        "vec_id",
        F.col("embedding").getItem(0).cast("double").alias("x"),
        F.col("embedding").getItem(1).cast("double").alias("y"),
    )
    a = (
        pts.select(
            F.col("vec_id").alias("id_a"),
            F.col("x").alias("xa"),
            F.col("y").alias("ya"),
        )
        .withColumn("__dx", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .withColumn("__dy", F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))))
        .select(
            "id_a",
            "xa",
            "ya",
            (F.floor(F.col("xa") / eps) + F.col("__dx")).alias("cx"),
            (F.floor(F.col("ya") / eps) + F.col("__dy")).alias("cy"),
        )
    )
    b = pts.select(
        F.col("vec_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.floor(F.col("x") / eps).alias("cx"),
        F.floor(F.col("y") / eps).alias("cy"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(b, ["cx", "cy"])
        .where((F.col("id_a") < F.col("id_b")) & (d2 <= F.lit(eps * eps)))
        .select(
            "id_a",
            "id_b",
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
    )


ORACLE_Q210 = f"""
WITH pts AS (
  SELECT vec_id, embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
  FROM embeddings
),
a AS (
  SELECT vec_id AS id_a, x AS xa, y AS ya,
         floor(x / {_Q210_EPS}) + dx.dx AS cx,
         floor(y / {_Q210_EPS}) + dy.dy AS cy
  FROM pts, (SELECT unnest([-1, 0, 1]) AS dx) dx,
            (SELECT unnest([-1, 0, 1]) AS dy) dy
),
b AS (
  SELECT vec_id AS id_b, x AS xb, y AS yb,
         floor(x / {_Q210_EPS}) AS cx, floor(y / {_Q210_EPS}) AS cy
  FROM pts
)
SELECT id_a, id_b,
       round(sqrt((xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)), 6) AS dist
FROM a JOIN b USING (cx, cy)
WHERE id_a < id_b
  AND (xa - xb) * (xa - xb) + (ya - yb) * (ya - yb)
      <= {_Q210_EPS} * {_Q210_EPS}
"""


# ---------------------------------------------------------------------------
# q211: interval-interval overlap join (sessions x incidents)
# ---------------------------------------------------------------------------


def q211_session_incident_overlap(spark, sf_dir):
    """Interval x interval OVERLAP join with overlap-duration
    accounting: user sessions (q11's 5-min-gap windows) joined to a
    deterministic incident calendar (incident j = [T0 + j*28h, +5h),
    one per nation row) wherever the two intervals overlap, emitting
    the overlap in integer seconds — the "which sessions were
    degraded, and for how long" attribution every incident
    post-mortem runs.  q43's range join matches POINTS to intervals;
    here BOTH sides are intervals, which breaks the each-fact-in-one-
    chunk dedup guarantee — `operators/joins.py:interval_overlap_join`
    restores meet-exactly-once by emitting a pair only in the chunk
    holding the overlap's FIRST instant (computable inside the join
    condition by both sides), still a pure chunk equi-join.

    Scale shape: sessions replicate ~(len/900s + 1) ~ 1-2 chunks,
    the 25-row incident side ~20 chunks each; the join is
    (chunk)-equality with the overlap + meet-once residuals; overlap
    math is integer microseconds — bit-exact."""
    from ..operators.joins import interval_overlap_join

    ev = _t(spark, sf_dir, "events")
    sessions = (
        ev.groupBy(F.session_window("ts", "5 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("sw.start").alias("s_start"),
            F.col("sw.end").alias("s_end"),
        )
    )
    incidents = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").cast("bigint").alias("incident_id"),
        F.expr(
            "CAST(TIMESTAMP '2024-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, n_nationkey * 28, 0, 0) AS TIMESTAMP)"
        ).alias("i_start"),
        F.expr(
            "CAST(TIMESTAMP '2024-01-01 00:00:00' "
            "+ make_interval(0, 0, 0, 0, n_nationkey * 28 + 5, 0, 0) AS TIMESTAMP)"
        ).alias("i_end"),
    )
    joined = interval_overlap_join(
        sessions, incidents, "s_start", "s_end", "i_start", "i_end"
    )
    return joined.select(
        "user_id",
        F.unix_timestamp("s_start").cast("bigint").alias("session_start_epoch"),
        "incident_id",
        F.expr(
            "CAST((least(unix_micros(CAST(s_end AS TIMESTAMP)), "
            "unix_micros(CAST(i_end AS TIMESTAMP))) "
            "- greatest(unix_micros(CAST(s_start AS TIMESTAMP)), "
            "unix_micros(CAST(i_start AS TIMESTAMP)))) "
            "div 1000000 AS BIGINT)"
        ).alias("overlap_seconds"),
    )


ORACLE_Q211 = """
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER w > INTERVAL 5 minutes
                   OR lag(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), numbered AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sessions AS (
  SELECT user_id, min(ts) AS s_start, max(ts) + INTERVAL 5 minutes AS s_end
  FROM numbered GROUP BY user_id, session_id
), incidents AS (
  SELECT CAST(n_nationkey AS BIGINT) AS incident_id,
         TIMESTAMP '2024-01-01 00:00:00'
           + n_nationkey * INTERVAL 28 hours AS i_start,
         TIMESTAMP '2024-01-01 00:00:00'
           + (n_nationkey * 28 + 5) * INTERVAL 1 hour AS i_end
  FROM nation
)
SELECT s.user_id,
       CAST(floor(epoch(s.s_start)) AS BIGINT) AS session_start_epoch,
       i.incident_id,
       CAST((least(epoch_us(s.s_end), epoch_us(i.i_end))
             - greatest(epoch_us(s.s_start), epoch_us(i.i_start)))
            // 1000000 AS BIGINT) AS overlap_seconds
FROM sessions s JOIN incidents i
  ON s.s_start < i.i_end AND i.i_start < s.s_end
"""


# ---------------------------------------------------------------------------
# q212: per-entity periodicity detection (cron/bot rhythm)
# ---------------------------------------------------------------------------

_Q212_BIN_S = 1800  # 30-min inter-arrival bins


def q212_periodicity_detection(spark, sf_dir):
    """Per-entity PERIODICITY detection: each user's inter-event gaps
    are binned to 30 minutes and the modal bin's share of all gaps
    (periodicity_ppm) is the rhythm score — a cron job or scripted
    crawler fires at a near-constant interval (one bin holds almost
    all its gaps) while organic users spread across bins.  q187
    flags RATE (too many events); this flags REGULARITY, which
    catches slow bots q187's thresholds never see, and q184 profiles
    transition TIMING between event types, not per-entity rhythm.

    Scale shape: ONE user-keyed window shuffle for the lag, then a
    (user, bin) hash agg, then per-user aggs/rank over the
    gap-HISTOGRAM relation (bins per user <= observed spread, never
    the raw event relation) — the q143/q184 grouped-percentile
    discipline.  All integer: gaps in microseconds div binned."""
    ev = _t(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        ev.select(
            "user_id",
            (
                (
                    F.unix_micros(F.col("ts").cast("timestamp"))
                    - F.unix_micros(
                        F.lag(F.col("ts").cast("timestamp")).over(wo)
                    )
                )
                / F.lit(_Q212_BIN_S * 1_000_000)
            )
            .cast("bigint")
            .alias("bin"),
        )
        .where(F.col("bin").isNotNull())
    )
    hist = gaps.groupBy("user_id", "bin").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.col("cnt").desc(), F.col("bin").asc()
    )
    return (
        hist.withColumn("rnk", F.row_number().over(wr))
        .groupBy("user_id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_gaps"),
            F.max(F.when(F.col("rnk") == 1, F.col("bin")))
            .cast("bigint")
            .alias("modal_bin"),
            F.max(F.when(F.col("rnk") == 1, F.col("cnt")))
            .cast("bigint")
            .alias("modal_count"),
        )
        .withColumn(
            "periodicity_ppm",
            F.expr("CAST(modal_count * 1000000 div n_gaps AS BIGINT)"),
        )
    )


ORACLE_Q212 = f"""
WITH gaps AS (
  SELECT user_id,
         (epoch_us(ts) - epoch_us(lag(ts) OVER
            (PARTITION BY user_id ORDER BY ts, event_id)))
           // {_Q212_BIN_S * 1_000_000} AS bin
  FROM events
), hist AS (
  SELECT user_id, bin, count(*) AS cnt
  FROM gaps WHERE bin IS NOT NULL GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY cnt DESC, bin ASC) AS rnk
  FROM hist
)
SELECT user_id,
       CAST(sum(cnt) AS BIGINT) AS n_gaps,
       CAST(max(CASE WHEN rnk = 1 THEN bin END) AS BIGINT) AS modal_bin,
       CAST(max(CASE WHEN rnk = 1 THEN cnt END) AS BIGINT) AS modal_count,
       CAST(max(CASE WHEN rnk = 1 THEN cnt END) * 1000000
            // sum(cnt) AS BIGINT) AS periodicity_ppm
FROM ranked GROUP BY 1
"""


__all__ = _prev_all + [
    'ORACLE_Q161',
    '_Q162_FILE_W',
    '_Q162_BITS',
    '_Q162_K',
    'q162_bloom_file_skipping_audit',
    '_Q162_WORKLOAD',
    '_oracle_q162',
    'ORACLE_Q162',
    '_Q177_THRESHOLDS',
    'q177_threshold_sweep',
    'ORACLE_Q177',
    '_Q178_BUDGET',
    'q178_neyman_allocation',
    'ORACLE_Q178',
    '_Q179_N',
    'q179_streaming_feed_silence',
    'ORACLE_Q179',
    'q180_seasonal_anomaly',
    'ORACLE_Q180',
    '_Q181_ANCHORS',
    '_Q181_W',
    '_Q181_K',
    'q181_more_like_this',
    'ORACLE_Q181',
    'q182_dictionary_encoding_advisor',
    'ORACLE_Q182',
    'q183_dedup_yield',
    'ORACLE_Q183',
    'q184_transition_dwell',
    'ORACLE_Q184',
    '_Q185_N',
    'q185_streaming_unknown_key_dlq',
    'ORACLE_Q185',
    '_Q186_QUERIES',
    'q186_streaming_percolator',
    '_oracle_q186',
    'ORACLE_Q186',
    '_Q187_RATE_MAX',
    '_Q187_CONC_PPM',
    'q187_bot_detection',
    'ORACLE_Q187',
    '_Q188_QUERIES',
    'q188_intersection_planner',
    '_oracle_q188',
    'ORACLE_Q188',
    '_Q189_MENTIONS',
    '_q189_variants_spark',
    '_q189_variants_duck',
    'q189_symspell_edit1_join',
    '_oracle_q189',
    'ORACLE_Q189',
    '_Q190_K',
    '_Q190_SHARDS',
    'q190_shard_topk_audit',
    'ORACLE_Q190',
    '_Q191_CAP',
    '_Q191_MIN_CO',
    'q191_coclick_similarity',
    'ORACLE_Q191',
    '_Q192_K',
    '_q192_min_exprs',
    'q192_streaming_minhash_feed_similarity',
    '_oracle_q192',
    'ORACLE_Q192',
    '_Q193_MOD',
    '_Q193_CHUNKS_EXPR',
    'q193_cdc_chunking',
    'ORACLE_Q193',
    '_Q194_POSITIONS',
    '_Q194_MIN_IMPR',
    'q194_position_bias_coec',
    'ORACLE_Q194',
    'q195_langid_granularity_audit',
    '_duck_lang_case',
    'ORACLE_Q195',
    'q196_retraction_variance',
    '_Q196_HASH',
    'ORACLE_Q196',
    '_Q197_PIX',
    '_Q197_BANDS',
    '_Q197_HAM_MAX',
    '_q197_ahash_udf',
    '_q197_pix_duck',
    'q197_ahash_media_dedup',
    '_oracle_q197',
    'ORACLE_Q197',
    'q198_cross_nation_volume',
    'ORACLE_Q198',
    'q199_user_hits',
    '_oracle_q199',
    'ORACLE_Q199',
    '_Q200_BATCH',
    'q200_novelty_decay',
    'ORACLE_Q200',
    'q201_butterfly_cohesion',
    'ORACLE_Q201',
    'q202_landing_exit_analytics',
    'ORACLE_Q202',
    '_Q203_MAXP',
    '_Q203_TOPK',
    'q203_autocomplete_topk',
    'ORACLE_Q203',
    'q204_langid_calibration',
    '_oracle_q204',
    'ORACLE_Q204',
    '_Q205_PLENS',
    '_Q205_KNUTH',
    '_Q205_SPACE',
    'q205_cidr_lpm_join',
    'ORACLE_Q205',
    'q206_returned_item_revenue',
    'ORACLE_Q206',
    'q207_streaming_windowed_sample',
    '_oracle_q207',
    'ORACLE_Q207',
    '_Q208_K',
    'q208_kfold_contamination',
    '_oracle_q208',
    'ORACLE_Q208',
    '_Q209_CUTOFF',
    '_Q209_FEAT_DAYS',
    '_Q209_HORIZON_DAYS',
    'q209_churn_training_set',
    'ORACLE_Q209',
    '_Q210_EPS',
    'q210_grid_epsilon_join',
    'ORACLE_Q210',
    'q211_session_incident_overlap',
    'ORACLE_Q211',
    '_Q212_BIN_S',
    'q212_periodicity_detection',
    'ORACLE_Q212',
]
