"""Registry block q257-q300 — split verbatim from the
single-module catalog (round-4 verdict #2); execution order,
names and behavior identical to the original queries.py."""
from __future__ import annotations

from .block_q213_q257 import *  # noqa: F401,F403
from .block_q213_q257 import __all__ as _prev_all



ORACLE_Q257 = """
WITH feats AS (
  SELECT lang, f.feature AS feature, f.value AS value
  FROM documents,
       UNNEST([
         {'feature': 'len_bucket',
          'value': least(CAST(floor(n_chars / 400) AS BIGINT), 4)},
         {'feature': 'has_digit',
          'value': CAST(regexp_matches(text, '[0-9]') AS BIGINT)},
         {'feature': 'has_sentence_punct',
          'value': CAST((contains(text, '!') OR contains(text, '?'))
                        AS BIGINT)}
       ]) AS t(f)
),
vc AS (
  SELECT feature, value, lang, count(*) AS n_vc
  FROM feats GROUP BY 1, 2, 3
),
per_v AS (
  SELECT feature, value, sum(n_vc * n_vc) AS s_v, sum(n_vc) AS n_v
  FROM vc GROUP BY 1, 2
),
child AS (
  SELECT feature, sum((100000000 * s_v) // n_v) AS child_x1e8,
         sum(n_v) AS n
  FROM per_v GROUP BY 1
),
parent AS (
  SELECT feature, sum(n_c * n_c) AS p
  FROM (SELECT feature, lang, sum(n_vc) AS n_c FROM vc GROUP BY 1, 2)
  GROUP BY 1
)
SELECT feature, CAST(n AS BIGINT) AS n,
       CAST((10 * (child_x1e8 - ((100000000 * p) // n))) // n AS BIGINT)
         AS gain_ppb
FROM child JOIN parent USING (feature)
ORDER BY feature
"""


# q258: market-basket association rules (support / confidence / lift)

def q258_association_rules(spark, sf_dir):
    """Market-basket association-rule mining over orders as baskets of
    part BRANDS: for every ordered brand pair (a -> b, a != b), the
    support count n_ab, confidence_ppm = 1e6*n_ab/n_a and lift_x1000 =
    1000*n_ab*N/(n_a*n_b) — all in truncating integer arithmetic (the
    q98 PMI discipline) so the rule ranking is bit-exact.  Rules below
    a support floor of 5 co-occurring baskets are pruned BEFORE any
    join touches them.

    Scale shape: the brand dimension lands on the fact table via one
    partkey equi-join; baskets become (orderkey, brand) DISTINCT rows
    (one shuffle, map-side combine); the pair generator is a SELF
    equi-join on orderkey — both sides share the same hash
    partitioning, so AQE plans one Exchange feeding both inputs, and
    per-basket fanout is bounded by basket size (max 7 lineitems), not
    by corpus size.  Brand marginals (<=25 rows) and the 1-row basket
    total broadcast onto the surviving pairs."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    items = (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_orderkey").alias("basket"), F.col("p_brand").alias("brand"))
        .distinct()
    )
    a = items.select("basket", F.col("brand").alias("a"))
    b = items.select("basket", F.col("brand").alias("b"))
    pairs = (
        a.join(b, "basket")
        .where(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
        .where(F.col("n_ab") >= 5)
    )
    marg = items.groupBy("brand").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    n_baskets = items.select("basket").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total")
    )
    return (
        pairs.join(
            F.broadcast(marg.select(F.col("brand").alias("a"), F.col("cnt").alias("n_a"))),
            "a",
        )
        .join(
            F.broadcast(marg.select(F.col("brand").alias("b"), F.col("cnt").alias("n_b"))),
            "b",
        )
        .join(F.broadcast(n_baskets))
        .select(
            "a",
            "b",
            "n_ab",
            F.expr("(1000000 * n_ab) div n_a").alias("confidence_ppm"),
            F.expr("(1000 * n_ab * n_total) div (n_a * n_b)").alias("lift_x1000"),
        )
        .orderBy(F.col("lift_x1000").desc(), F.col("n_ab").desc(), "a", "b")
        .limit(40)
    )


ORACLE_Q258 = """
WITH items AS (
  SELECT DISTINCT l_orderkey AS basket, p_brand AS brand
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
pairs AS (
  SELECT x.brand AS a, y.brand AS b, count(*) AS n_ab
  FROM items x JOIN items y ON x.basket = y.basket AND x.brand <> y.brand
  GROUP BY 1, 2 HAVING count(*) >= 5
),
marg AS (SELECT brand, count(*) AS cnt FROM items GROUP BY 1),
tot AS (SELECT count(DISTINCT basket) AS n_total FROM items)
SELECT a, b, CAST(n_ab AS BIGINT) AS n_ab,
       CAST((1000000 * n_ab) // ma.cnt AS BIGINT) AS confidence_ppm,
       CAST((1000 * n_ab * n_total) // (ma.cnt * mb.cnt) AS BIGINT) AS lift_x1000
FROM pairs
JOIN marg ma ON ma.brand = a
JOIN marg mb ON mb.brand = b
CROSS JOIN tot
ORDER BY lift_x1000 DESC, n_ab DESC, a, b
LIMIT 40
"""


# q259: lag-k autocorrelation of the daily order-count series

def q259_autocorrelation(spark, sf_dir):
    """Autocorrelation function (lags 1..7) of the daily order-count
    time series — the periodicity probe a capacity planner runs before
    fitting any seasonal model.  Integer-exact ACF: with daily counts
    x_t, n days and S = sum x, the mean-centered products use the
    n-scaled residuals (n*x_t - S), so numerator_k = sum over
    CALENDAR-lag-k pairs of (n*x_t - S)(n*x_{t-k} - S) and the
    denominator sum_t (n*x_t - S)^2 are both exact BIGINTs; acf_ppm =
    (1e6*num_k) div den with truncate-toward-zero division verified
    identical in both engines (negative numerators occur).  Lag is by
    CALENDAR day (join on date arithmetic), not row offset, so missing
    days do not silently shift the series.

    Scale shape: the raw fact table collapses to a <=2500-row daily
    series in ONE map-side-combinable shuffle; the 7-lag pair join,
    the moment fold and the final division all run at series scale.
    This is the general pattern for distributed ACF: aggregate first,
    correlate the aggregate."""
    orders = _t(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.date_trunc("DAY", F.col("o_orderdate")).alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    mom = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s"),
    )
    centered = daily.join(F.broadcast(mom)).select(
        "d", (F.col("n") * F.col("x") - F.col("s")).alias("r"), "n", "s"
    )
    den = centered.agg(F.sum(F.col("r") * F.col("r")).cast("bigint").alias("den"))
    lags = spark.range(1, 8).select(F.col("id").cast("int").alias("lag"))
    lagged = centered.select(F.col("d").alias("d2"), F.col("r").alias("r2"))
    num = (
        centered.join(F.broadcast(lags))
        .join(
            lagged,
            F.col("d2") == F.col("d") - F.expr("make_interval(0,0,0,lag,0,0,0)"),
        )
        .groupBy("lag")
        .agg(F.sum(F.col("r") * F.col("r2")).cast("bigint").alias("num"))
    )
    return (
        num.join(F.broadcast(den))
        .select(
            "lag",
            F.expr("(1000000 * num) div den").cast("bigint").alias("acf_ppm"),
        )
        .orderBy("lag")
    )


ORACLE_Q259 = """
WITH daily AS (
  SELECT date_trunc('day', o_orderdate) AS d, count(*) AS x
  FROM orders GROUP BY 1
),
mom AS (SELECT count(*) AS n, sum(x) AS s FROM daily),
centered AS (
  SELECT d, n * x - s AS r FROM daily CROSS JOIN mom
),
den AS (SELECT sum(r * r) AS den FROM centered),
num AS (
  SELECT lag, sum(c.r * c2.r) AS num
  FROM centered c
  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) lags
  JOIN centered c2 ON c2.d = c.d - to_days(CAST(lag AS INTEGER))
  GROUP BY 1
)
SELECT CAST(lag AS INTEGER) AS lag,
       CAST((1000000 * num) // den AS BIGINT) AS acf_ppm
FROM num CROSS JOIN den
ORDER BY lag
"""


# q260: leave-one-out target encoding (per-row, broadcast group stats)

def q260_target_encoding(spark, sf_dir):
    """Leave-one-out target encoding of the customer market segment
    against the binary target 'order finished' (o_orderstatus = 'F')
    — the standard high-cardinality-categorical encoder for gradient
    models, built the only way that scales: per-segment target sums
    (one tiny agg) broadcast back onto the fact rows, each row's own
    label subtracted map-side: loo_ppm = (1e6*(S - y)) div (n - 1).
    Exactness: the encoding is integer-quantized, and because y is
    binary the per-row encodings take exactly two values per segment,
    so the audit output groups by (segment, y) and proves the whole
    per-row map is correct from 10 rows — count, the encoding, and
    the raw (S, n) it came from.

    Scale shape: one custkey fact-dim equi-join, one map-side-
    combinable segment agg (5 groups, broadcast back), per-row
    arithmetic entirely map-side, and a final bounded-key audit agg.
    No per-row state, no window over the fact table, nothing the
    optimizer cannot pipeline into the scan."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey", (F.col("o_orderstatus") == "F").cast("bigint").alias("y")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    rows = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select("c_mktsegment", "y")
    stats = rows.groupBy("c_mktsegment").agg(
        F.sum("y").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    enc = rows.join(F.broadcast(stats), "c_mktsegment").select(
        "c_mktsegment",
        "y",
        F.expr("(1000000 * (s - y)) div (n - 1)").alias("loo_ppm"),
        "s",
        "n",
    )
    return (
        enc.groupBy("c_mktsegment", "y", "loo_ppm", "s", "n")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
        .orderBy("c_mktsegment", "y")
    )


ORACLE_Q260 = """
WITH rows_ AS (
  SELECT c_mktsegment, CAST(o_orderstatus = 'F' AS BIGINT) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
),
stats AS (
  SELECT c_mktsegment, sum(y) AS s, count(*) AS n
  FROM rows_ GROUP BY 1
)
SELECT c_mktsegment, y,
       CAST((1000000 * (s - y)) // (n - 1) AS BIGINT) AS loo_ppm,
       CAST(s AS BIGINT) AS s, CAST(n AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_rows
FROM rows_ JOIN stats USING (c_mktsegment)
GROUP BY 1, 2, 3, 4, 5
ORDER BY c_mktsegment, y
"""


# q261: Kolmogorov-Smirnov two-sample statistic (integer-exact D)

def q261_ks_two_sample(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov distance between the l_discount
    distributions of finished ('F') vs open ('O') lineitems — the
    distribution-drift test with no distributional assumptions at all.
    Integer-exact over the small value domain: with per-value counts
    and cumulative counts cum1_v / cum2_v, the KS statistic at common
    denominator n1*n2 is D_scaled = max_v |n2*cum1_v - n1*cum2_v|
    (= n1*n2*D) — a pure BIGINT, no empirical-CDF floats anywhere.
    The argmax value (smallest v attaining the max) is emitted too so
    the drift report says WHERE the CDFs diverge most.

    Scale shape: identical to q255's rank-sum skeleton — one bounded-
    key count shuffle (11 distinct discounts), a cumulative window
    over the <=11-row domain, a 1-row fold.  The raw fact rows are
    never sorted or ranked globally."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_linestatus").isin("F", "O")
    )
    per_v = li.groupBy(
        (F.col("l_discount") * 100).cast("bigint").alias("v")
    ).agg(
        F.sum(F.when(F.col("l_linestatus") == "F", 1).otherwise(0))
        .cast("bigint")
        .alias("c1"),
        F.sum(F.when(F.col("l_linestatus") == "O", 1).otherwise(0))
        .cast("bigint")
        .alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.select(
        "v",
        F.sum("c1").over(w).alias("cum1"),
        F.sum("c2").over(w).alias("cum2"),
    )
    tot = cum.agg(
        F.max("cum1").cast("bigint").alias("n1"),
        F.max("cum2").cast("bigint").alias("n2"),
    )
    gaps = cum.join(F.broadcast(tot)).select(
        "v",
        "n1",
        "n2",
        F.abs(F.col("n2") * F.col("cum1") - F.col("n1") * F.col("cum2")).alias(
            "gap"
        ),
    )
    best = gaps.agg(F.max("gap").alias("d_scaled"))
    return (
        gaps.join(F.broadcast(best), F.col("gap") == F.col("d_scaled"))
        .groupBy("n1", "n2", "d_scaled")
        .agg(F.min("v").cast("bigint").alias("argmax_discount_x100"))
        .select(
            "n1",
            "n2",
            F.col("d_scaled").cast("bigint").alias("d_scaled"),
            "argmax_discount_x100",
        )
    )


ORACLE_Q261 = """
WITH per_v AS (
  SELECT CAST(l_discount * 100 AS BIGINT) AS v,
         sum(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS c2
  FROM lineitem WHERE l_linestatus IN ('F','O') GROUP BY 1
),
cum AS (
  SELECT v,
         sum(c1) OVER (ORDER BY v) AS cum1,
         sum(c2) OVER (ORDER BY v) AS cum2
  FROM per_v
),
tot AS (SELECT max(cum1) AS n1, max(cum2) AS n2 FROM cum),
gaps AS (
  SELECT v, n1, n2, abs(n2 * cum1 - n1 * cum2) AS gap
  FROM cum CROSS JOIN tot
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(max(gap) AS BIGINT) AS d_scaled,
       CAST(min(v) FILTER (WHERE gap = (SELECT max(gap) FROM gaps))
            AS BIGINT) AS argmax_discount_x100
FROM gaps GROUP BY 1, 2
"""


# q262: multinomial Naive Bayes training (Laplace-smoothed, rational)

def q262_naive_bayes_model(spark, sf_dir):
    """Multinomial Naive Bayes TRAINING over the documents corpus:
    the per-(lang, token) Laplace-smoothed likelihoods and per-lang
    priors a lang-ID classifier consumes.  Probabilities stay exact
    rationals at ppb scale: lik_ppb = (1e9*(n_tc + 1)) div (N_c + V)
    with V the global vocabulary size, prior_ppm = (1e6*docs_c) div
    docs_total — no log(), no floats, so the emitted model is bit-
    identical across engines (a consumer takes logs of the ppb values
    at serve time).  Output is the model rows for the 20 most frequent
    tokens overall (deterministic (count, token) order) x 5 langs,
    plus per-class totals so the consumer can reconstruct smoothing
    for unseen tokens.

    Scale shape: one (lang, token) count shuffle with map-side combine
    does ALL the work; vocabulary size, class totals and the top-20
    token list are derived from that one aggregate (vocab-scale, not
    corpus-scale) and broadcast back.  Training is embarrassingly
    parallel — this is why NB is the classic first distributed text
    classifier."""
    docs = _t_wide(spark, sf_dir, "documents")
    tok = docs.select(
        "lang", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    tc = tok.groupBy("lang", "token").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tc")
    )
    class_tot = tc.groupBy("lang").agg(F.sum("n_tc").cast("bigint").alias("n_c"))
    vocab = tc.select("token").distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("v")
    )
    top = (
        tc.groupBy("token")
        .agg(F.sum("n_tc").cast("bigint").alias("n_t"))
        .orderBy(F.col("n_t").desc(), "token")
        .limit(20)
    )
    priors = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("docs_c"))
    docs_tot = priors.agg(F.sum("docs_c").cast("bigint").alias("docs_total"))
    # dense (top-token x lang) grid so absent counts smooth to 1/(N_c+V)
    grid = top.crossJoin(F.broadcast(class_tot))
    return (
        grid.join(tc, ["token", "lang"], "left")
        .join(F.broadcast(vocab))
        .join(F.broadcast(priors), "lang")
        .join(F.broadcast(docs_tot))
        .select(
            "lang",
            "token",
            F.coalesce(F.col("n_tc"), F.lit(0)).cast("bigint").alias("n_tc"),
            F.expr("(1000000000 * (coalesce(n_tc, 0) + 1)) div (n_c + v)")
            .cast("bigint")
            .alias("lik_ppb"),
            F.col("n_c").alias("class_tokens"),
            F.expr("(1000000 * docs_c) div docs_total")
            .cast("bigint")
            .alias("prior_ppm"),
        )
        .orderBy("lang", "token")
    )


ORACLE_Q262 = """
WITH tok AS (
  SELECT lang,
         unnest(list_filter(string_split(text, ' '), t -> t <> ''))
           AS token
  FROM documents
),
tc AS (SELECT lang, token, count(*) AS n_tc FROM tok GROUP BY 1, 2),
class_tot AS (SELECT lang, sum(n_tc) AS n_c FROM tc GROUP BY 1),
vocab AS (SELECT count(DISTINCT token) AS v FROM tc),
top AS (
  SELECT token, sum(n_tc) AS n_t FROM tc GROUP BY 1
  ORDER BY n_t DESC, token LIMIT 20
),
priors AS (SELECT lang, count(*) AS docs_c FROM documents GROUP BY 1),
docs_tot AS (SELECT sum(docs_c) AS docs_total FROM priors)
SELECT lang, token,
       CAST(coalesce(n_tc, 0) AS BIGINT) AS n_tc,
       CAST((1000000000 * (coalesce(n_tc, 0) + 1)) // (n_c + v) AS BIGINT)
         AS lik_ppb,
       CAST(n_c AS BIGINT) AS class_tokens,
       CAST((1000000 * docs_c) // docs_total AS BIGINT) AS prior_ppm
FROM top
CROSS JOIN class_tot
LEFT JOIN tc USING (token, lang)
CROSS JOIN vocab
JOIN priors USING (lang)
CROSS JOIN docs_tot
ORDER BY lang, token
"""


# q263: TPC-H Q9 shape — profit by nation and order year

def q263_nation_profit(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year): for
    parts whose name mentions a colour, profit per supplier nation per
    order year, profit = extendedprice*(1-discount) minus a retail-
    price-based cost proxy (this corpus has no partsupp table, so
    cost = 0.6 * p_retailprice * l_quantity — deterministic and
    declared, preserving Q9's join/aggregate skeleton: a 5-table
    star with two fact-side equi-joins and three broadcast dims).
    Decimal-exact money math end to end (the q01 discipline).

    Scale shape: part filter is pushed to the part scan and that
    pruned dim is broadcast (fact rows drop before shuffling);
    orders joins on the fact key l_orderkey (the one big shuffle);
    supplier/nation broadcast; the final agg is bounded-key
    (nation x year)."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").rlike("green|blue|red"))
        .select("p_partkey", "p_retailprice")
    )
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # narrow (9,2) unit casts keep the 3-factor product's result
    # precision well under 38 in BOTH engines, so no precision-loss
    # rescaling (and thus no rounding) can ever kick in; the true
    # values carry <=4 decimal places, so the final (18,4) cast is
    # exact too
    D9 = "decimal(9,2)"
    amount = (
        F.col("l_extendedprice").cast(D9)
        * (F.lit(1).cast(D9) - F.col("l_discount").cast(D9))
        - F.lit(0.6).cast(D9)
        * F.col("p_retailprice").cast(D9)
        * F.col("l_quantity").cast(D9)
    ).cast("decimal(18,4)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(
            F.sum(amount).cast("double").alias("profit"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


ORACLE_Q263 = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(
         CAST(l_extendedprice AS DECIMAL(9,2))
           * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2)))
         - CAST(0.6 AS DECIMAL(9,2))
           * CAST(p_retailprice AS DECIMAL(9,2))
           * CAST(l_quantity AS DECIMAL(9,2))
         AS DECIMAL(18,4))) AS DOUBLE) AS profit,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE regexp_matches(p_name, 'green|blue|red')
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# q264: TPC-H Q15 shape — top supplier(s) by windowed revenue, ties kept

def q264_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): revenue per supplier over a
    3-month ship window, returning every supplier whose revenue EQUALS
    the global maximum — the tie-keeping semantics that distinguish
    Q15 from a plain top-1 (LIMIT 1 would silently drop co-leaders).
    Revenue sums through DECIMAL so the max-equality join compares
    exact values, never float-rounded ones.

    Scale shape: one supplier-key agg over the date-pruned fact scan;
    the 1-row global max broadcasts back onto the supplier aggregate
    (supplier-scale, not fact-scale); supplier names broadcast.  The
    classic view+subquery formulation decorrelates to exactly this:
    agg once, max once, equality-join."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            (
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).cast("decimal(18,4)")
        ).alias("revenue")
    )
    top = rev.agg(F.max("revenue").alias("max_rev"))
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), F.col("revenue") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q264 = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2))
                     - CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(18,4))) AS revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name,
       CAST(revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE revenue = (SELECT max(revenue) FROM rev)
ORDER BY s_suppkey
"""


# q265: CRDT state merge — G-counter max-merge + LWW register

def q265_crdt_merge(spark, sf_dir):
    """CRDT convergence audit: two divergent replicas' states merged
    with the algebra a conflict-free replicated datatype defines —
    G-counter merge is per-replica-slot MAX (then total = sum of
    slots), last-writer-wins register merge is the event with the
    greatest (ts, event_id) — exercised over the events corpus with
    replica slots = event_id mod 5 and the two divergent snapshots =
    even/odd event_ids (each snapshot saw only half the writes, as
    after a network partition).  Both merge operators are associative
    + commutative + idempotent aggregates, which is exactly why they
    distribute: Spark's partial aggregation IS the CRDT merge.

    Scale shape: one (user, replica-slot) count shuffle (map-side
    combinable), a greatest() merge at slot scale, a user-scale sum;
    the LWW pick is one row_number window partitioned BY USER (keys
    spread across the cluster — no global sort).  Output is
    user-scale."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("key"),
        (F.col("event_id") % 5).alias("slot"),
        (F.col("event_id") % 2 == 0).alias("in_a"),
        "ts",
        "event_id",
        "event_type",
    )
    slots = ev.groupBy("key", "slot").agg(
        F.sum(F.when(F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("cnt_a"),
        F.sum(F.when(~F.col("in_a"), 1).otherwise(0)).cast("bigint").alias("cnt_b"),
    )
    gcounter = slots.groupBy("key").agg(
        F.sum(F.greatest("cnt_a", "cnt_b")).cast("bigint").alias("merged_total"),
        F.sum("cnt_a").cast("bigint").alias("replica_a_total"),
        F.sum("cnt_b").cast("bigint").alias("replica_b_total"),
    )
    w = Window.partitionBy("key").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    lww = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "key",
            F.col("event_type").alias("lww_value"),
            # ts is TIMESTAMP_NTZ; the session tz is UTC so the cast to
            # TIMESTAMP is a wall-clock no-op and unix_micros is exact
            F.unix_micros(F.col("ts").cast("timestamp")).alias("lww_ts_us"),
        )
    )
    return (
        gcounter.join(lww, "key")
        .select(
            F.col("key").cast("bigint").alias("key"),
            "merged_total",
            "replica_a_total",
            "replica_b_total",
            "lww_value",
            "lww_ts_us",
        )
        .orderBy("key")
    )


ORACLE_Q265 = """
WITH ev AS (
  SELECT user_id AS key, event_id % 5 AS slot,
         event_id % 2 = 0 AS in_a, ts, event_id, event_type
  FROM events
),
slots AS (
  SELECT key, slot,
         sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS cnt_a,
         sum(CASE WHEN NOT in_a THEN 1 ELSE 0 END) AS cnt_b
  FROM ev GROUP BY 1, 2
),
gcounter AS (
  SELECT key, sum(greatest(cnt_a, cnt_b)) AS merged_total,
         sum(cnt_a) AS replica_a_total, sum(cnt_b) AS replica_b_total
  FROM slots GROUP BY 1
),
lww AS (
  SELECT key, event_type AS lww_value,
         epoch_us(ts) AS lww_ts_us
  FROM (SELECT key, event_type, ts,
               row_number() OVER (PARTITION BY key
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ev)
  WHERE rn = 1
)
SELECT CAST(key AS BIGINT) AS key,
       CAST(merged_total AS BIGINT) AS merged_total,
       CAST(replica_a_total AS BIGINT) AS replica_a_total,
       CAST(replica_b_total AS BIGINT) AS replica_b_total,
       lww_value, CAST(lww_ts_us AS BIGINT) AS lww_ts_us
FROM gcounter JOIN lww USING (key)
ORDER BY key
"""


# q266: NDCG@5 ranking-quality evaluation (integer-exact DCG weights)

def q266_ndcg_ranking_quality(spark, sf_dir):
    """Offline ranking-quality evaluation: NDCG@5 of a
    popularity-trained recommender, integer-exact.  Train/test split
    by time (first half of the event range trains, second half is
    ground truth); the model ranks each user's event types by training
    count (ties by type name); a type is RELEVANT if the user touched
    it in the test half with value >= 50.  The 1/log2(rank+1) DCG
    discounts — the one place NDCG needs floats — are replaced by
    their ppm-scaled literal values (1000000, 630929, 500000, 430676,
    386852), so DCG, ideal DCG and ndcg_ppm = (1e6*dcg) div idcg are
    all BIGINT arithmetic and the hash compare is exact.  Users with
    no relevant type are excluded (IDCG would be 0).

    Scale shape: one (user, type) training count shuffle; rank via a
    user-partitioned window over <=5 types per user; ground truth is a
    second (user, type) aggregate equi-joined on the SAME key layout;
    IDCG comes from the per-user relevant-type count (bounded 1..5)
    mapped through the same literal table.  Everything after the two
    count shuffles is user-scale."""
    ev = _t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; UTC session tz makes the cast micros-exact
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    bounds = ev.agg(
        F.min(ts_us).alias("t0"),
        F.max(ts_us).alias("t1"),
    )
    tagged = ev.join(F.broadcast(bounds)).withColumn(
        "is_train",
        ts_us * 2 < F.col("t0") + F.col("t1"),
    )
    ranked = (
        tagged.where(F.col("is_train"))
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("cnt").desc(), "event_type"
                )
            ),
        )
        .where(F.col("rank") <= 5)
    )
    truth = (
        tagged.where(~F.col("is_train") & (F.col("value") >= 50))
        .select("user_id", "event_type")
        .distinct()
        .withColumn("rel", F.lit(1))
    )
    wts = F.expr(
        "element_at(array(1000000, 630929, 500000, 430676, 386852), rank)"
    )
    scored = (
        ranked.join(truth, ["user_id", "event_type"], "left")
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.col("rel").isNotNull(), wts).otherwise(0)
            )
            .cast("bigint")
            .alias("dcg_ppm")
        )
    )
    # ideal DCG: all the user's relevant types stacked at the top ranks
    cumw = F.expr(
        "element_at(array(1000000, 1630929, 2130929, 2561605, 2948457),"
        " cast(least(n_rel, 5) as int))"
    )
    ideal = (
        truth.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_rel"))
        .select("user_id", cumw.cast("bigint").alias("idcg_ppm"))
    )
    return (
        scored.join(ideal, "user_id")
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            "dcg_ppm",
            "idcg_ppm",
            F.expr("(1000000 * dcg_ppm) div idcg_ppm")
            .cast("bigint")
            .alias("ndcg_ppm"),
        )
        .orderBy("user_id")
    )


ORACLE_Q266 = """
WITH bounds AS (
  SELECT epoch_us(min(ts)) AS t0, epoch_us(max(ts)) AS t1 FROM events
),
tagged AS (
  SELECT user_id, event_type, value,
         epoch_us(ts) * 2 < t0 + t1 AS is_train
  FROM events CROSS JOIN bounds
),
ranked AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY count(*) DESC, event_type) AS rank
  FROM tagged WHERE is_train GROUP BY user_id, event_type
  QUALIFY rank <= 5
),
truth AS (
  SELECT DISTINCT user_id, event_type
  FROM tagged WHERE NOT is_train AND value >= 50
),
scored AS (
  SELECT r.user_id,
         sum(CASE WHEN t.event_type IS NOT NULL
                  THEN [1000000, 630929, 500000, 430676, 386852][r.rank]
                  ELSE 0 END) AS dcg_ppm
  FROM ranked r
  LEFT JOIN truth t ON t.user_id = r.user_id
                   AND t.event_type = r.event_type
  GROUP BY 1
),
ideal AS (
  SELECT user_id,
         [1000000, 1630929, 2130929, 2561605, 2948457]
           [CAST(least(count(*), 5) AS INT)] AS idcg_ppm
  FROM truth GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(dcg_ppm AS BIGINT) AS dcg_ppm,
       CAST(idcg_ppm AS BIGINT) AS idcg_ppm,
       CAST((1000000 * dcg_ppm) // idcg_ppm AS BIGINT) AS ndcg_ppm
FROM scored JOIN ideal USING (user_id)
ORDER BY user_id
"""


# q267: TPC-H Q16 shape — supplier-relationship counts with NOT-IN anti-join

def q267_supplier_relationship(spark, sf_dir):
    """TPC-H Q16 shape (parts/supplier relationship): how many
    distinct suppliers can provide parts of each (brand, size) class,
    EXCLUDING blacklisted suppliers — the NOT IN (subquery) that every
    optimizer must turn into an anti-join.  This corpus has no
    partsupp table, so the part-supplier relation is the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem, and the
    blacklist is suppliers with negative account balance (deterministic
    stand-in for Q16's complaint-comment scan).  Brands are filtered
    out (<> 'Brand#45') part-side, Q16 style.

    Scale shape: the pair relation is one DISTINCT shuffle over the
    projected fact columns; the blacklist (supplier-scale) broadcasts
    as a LEFT ANTI join BEFORE the expensive countDistinct; part dims
    broadcast onto the surviving pairs; the final agg groups bounded
    (brand x size) keys.  Anti-join placement is load-bearing: pruning
    suppliers first shrinks the distinct-count input."""
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("bad_key")
    )
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") != "Brand#45")
        .select("p_partkey", "p_brand", "p_size")
    )
    kept = pairs.join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("bad_key"), "left_anti"
    )
    return (
        kept.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", F.col("p_size")
        )
        .limit(50)
    )


ORACLE_Q267 = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
)
SELECT p_brand, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#45'
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2
ORDER BY supplier_cnt DESC, p_brand, p_size
LIMIT 50
"""


# q268: event-sourcing ledger replay (SET resets + ADD deltas)

def q268_ledger_replay(spark, sf_dir):
    """Event-sourcing state reconstruction: each user's current
    balance replayed from an append-only op log where 'signup' events
    are SET ops (balance := value) and 'purchase' events are ADD ops
    (balance += value) — the fold every event-sourced system runs at
    snapshot time.  The distributed trick: a fold over ordered ops
    per key does NOT need ordered execution — balance = (value of the
    LAST set) + (sum of adds strictly AFTER it), which is one window
    max and one conditional aggregate.  Money is exact integer cents
    ((9,2) decimal x100); op order is (ts, event_id) so same-timestamp
    ops replay deterministically.

    Scale shape: one user-partitioned window pass to locate the last
    SET (keys spread across executors), then a single map-side-
    combinable conditional agg — the naive per-key sequential replay
    (collect + loop) is exactly what this query proves unnecessary.
    Users with ADDs but no SET fold from 0 (left join + coalesce)."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("signup", "purchase")
    ).select(
        "user_id",
        "event_type",
        (F.col("value").cast("decimal(9,2)") * 100)
        .cast("bigint")
        .alias("cents"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
        "event_id",
    )
    sets = ev.where(F.col("event_type") == "signup")
    w = Window.partitionBy("user_id").orderBy(
        F.col("t_us").desc(), F.col("event_id").desc()
    )
    last_set = (
        sets.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("cents").alias("set_cents"),
            F.col("t_us").alias("set_t_us"),
            F.col("event_id").alias("set_eid"),
        )
    )
    adds = ev.where(F.col("event_type") == "purchase")
    folded = (
        adds.join(last_set, "user_id", "left")
        .where(
            F.col("set_t_us").isNull()
            | (F.col("t_us") > F.col("set_t_us"))
            | (
                (F.col("t_us") == F.col("set_t_us"))
                & (F.col("event_id") > F.col("set_eid"))
            )
        )
        .groupBy("user_id")
        .agg(
            F.sum("cents").cast("bigint").alias("adds_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_adds_applied"),
        )
    )
    return (
        last_set.select("user_id", "set_cents")
        .join(folded, "user_id", "full")
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            (
                F.coalesce(F.col("set_cents"), F.lit(0))
                + F.coalesce(F.col("adds_cents"), F.lit(0))
            )
            .cast("bigint")
            .alias("balance_cents"),
            F.coalesce(F.col("n_adds_applied"), F.lit(0))
            .cast("bigint")
            .alias("n_adds_applied"),
        )
        .orderBy("user_id")
    )


ORACLE_Q268 = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS cents,
         epoch_us(ts) AS t_us, event_id
  FROM events WHERE event_type IN ('signup', 'purchase')
),
last_set AS (
  SELECT user_id, cents AS set_cents, t_us AS set_t_us,
         event_id AS set_eid
  FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                     ORDER BY t_us DESC, event_id DESC)
                    AS rn
        FROM ev WHERE event_type = 'signup')
  WHERE rn = 1
),
folded AS (
  SELECT a.user_id, sum(a.cents) AS adds_cents,
         count(*) AS n_adds_applied
  FROM ev a LEFT JOIN last_set s USING (user_id)
  WHERE a.event_type = 'purchase'
    AND (s.set_t_us IS NULL OR a.t_us > s.set_t_us
         OR (a.t_us = s.set_t_us AND a.event_id > s.set_eid))
  GROUP BY 1
)
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(coalesce(set_cents, 0) + coalesce(adds_cents, 0) AS BIGINT)
         AS balance_cents,
       CAST(coalesce(n_adds_applied, 0) AS BIGINT) AS n_adds_applied
FROM last_set FULL JOIN folded USING (user_id)
ORDER BY user_id
"""


# q269: weighted median over a bounded value domain (per group)

def q269_weighted_median(spark, sf_dir):
    """Exact weighted median (and weighted quartiles) of l_quantity
    per return flag, weighted by extended price in integer cents —
    'the quantity at which half the revenue mass sits below' — the
    weighted quantile a pricing analyst actually wants, computed the
    only way that scales: per-(group, value) weight totals (bounded
    keys: 3 flags x 50 quantities), then a cumulative-weight walk over
    the tiny domain; the weighted p-quantile is the smallest value
    whose doubled cumulative weight reaches 2*p*total (all integer —
    no interpolation, lower-weighted-quantile semantics, exact in both
    engines).

    Scale shape: ONE map-side-combinable shuffle on bounded (flag,
    qty) keys does all fact-table work; the window walk and the
    quantile picks run on <=150 rows.  Weighted quantiles via global
    sort (percentile_cont over raw rows) would shuffle the whole fact
    table; this never does."""
    li = _t(spark, sf_dir, "lineitem")
    per_v = li.groupBy(
        F.col("l_returnflag").alias("flag"),
        F.col("l_quantity").cast("bigint").alias("v"),
    ).agg(
        F.sum((F.col("l_extendedprice").cast(DEC) * 100).cast("bigint"))
        .cast("bigint")
        .alias("w")
    )
    win = Window.partitionBy("flag").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = per_v.select(
        "flag", "v", F.sum("w").over(win).alias("cumw")
    )
    tot = per_v.groupBy("flag").agg(F.sum("w").alias("totw"))
    j = cum.join(F.broadcast(tot), "flag")
    pick = lambda num, den: F.min(  # noqa: E731
        F.when(F.col("cumw") * den >= F.col("totw") * num, F.col("v"))
    )
    return (
        j.groupBy("flag")
        .agg(
            pick(1, 4).cast("bigint").alias("wq25"),
            pick(1, 2).cast("bigint").alias("wmedian"),
            pick(3, 4).cast("bigint").alias("wq75"),
            F.max("totw").cast("bigint").alias("total_weight_cents"),
        )
        .orderBy("flag")
    )


ORACLE_Q269 = """
WITH per_v AS (
  SELECT l_returnflag AS flag, CAST(l_quantity AS BIGINT) AS v,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT))
           AS w
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT flag, v,
         sum(w) OVER (PARTITION BY flag ORDER BY v) AS cumw
  FROM per_v
),
tot AS (SELECT flag, sum(w) AS totw FROM per_v GROUP BY 1)
SELECT flag,
       CAST(min(CASE WHEN cumw * 4 >= totw * 1 THEN v END) AS BIGINT) AS wq25,
       CAST(min(CASE WHEN cumw * 2 >= totw * 1 THEN v END) AS BIGINT) AS wmedian,
       CAST(min(CASE WHEN cumw * 4 >= totw * 3 THEN v END) AS BIGINT) AS wq75,
       CAST(max(totw) AS BIGINT) AS total_weight_cents
FROM cum JOIN tot USING (flag)
GROUP BY flag
ORDER BY flag
"""


# q270: TPC-H Q20 shape — nested semi-join (high-volume part suppliers)

def q270_excess_volume_suppliers(spark, sf_dir):
    """TPC-H Q20 shape (potential part promotion): suppliers whose
    1997 shipped volume of red parts exceeded 300 units — the
    doubly-nested IN (SELECT ... IN (SELECT ...)) that decorrelates to
    a filtered join + HAVING + semi-join chain.  The inner part filter
    is a name scan; the middle block aggregates fact rows per
    supplier; the outer block keeps only suppliers passing the volume
    floor (4 of 10 qualify at sf0.001 — both branches live).

    Scale shape: the red-part dim is filtered FIRST and broadcast into
    the fact scan (fact rows drop before any shuffle); the per-
    supplier aggregate is one bounded-key shuffle; the final
    supplier-table probe is a broadcast LEFT SEMI join — supplier
    attributes never shuffle.  Quantity sums through DECIMAL so the
    HAVING threshold compares exactly."""
    part = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").rlike("red"))
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate") == 1997
    )
    heavy = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).alias("vol"))
        .where(F.col("vol") > F.lit(300).cast(DEC))
    )
    sup = _t(spark, sf_dir, "supplier")
    return (
        semi_join(sup, heavy, sup.s_suppkey == heavy.l_suppkey)
        .select(
            F.col("s_suppkey").cast("bigint").alias("s_suppkey"),
            "s_name",
            F.col("s_acctbal").alias("s_acctbal"),
        )
        .orderBy("s_suppkey")
    )


ORACLE_Q270 = """
SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE year(l_shipdate) = 1997
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE regexp_matches(p_name, 'red'))
  GROUP BY l_suppkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2)))
           > CAST(300 AS DECIMAL(18,2))
)
ORDER BY s_suppkey
"""


# q271: Allen interval-algebra classification of session x incident pairs

def q271_allen_interval_algebra(spark, sf_dir):
    """Allen's interval algebra over operational data: every user
    session (5-minute inactivity gap, endpoints coarsened to whole
    minutes so boundary coincidences are live) is classified against
    every error incident (15-minute bucket holding >= 2 error events)
    within a 30-minute horizon, into the 13 Allen relations
    (precedes/meets/overlaps/starts/during/finishes/equals and
    inverses).  Coarsening makes every interval proper (end = last
    minute + 1), which the algebra requires.  Output: relation ->
    pair count — the interval-semantics audit behind any
    'did the session touch the outage?' attribution.

    Scale shape: sessions come from one user-partitioned lag window
    (q11's shape); incidents from one bounded-key bucket agg; the
    pair generator is the q43 chunked-equi-join discipline — sessions
    explode into the 15-minute buckets covering their horizon and join
    incidents ON THE BUCKET (never a nested-loop theta join), then
    exact horizon + relation predicates run on the deduped pairs.
    The DuckDB oracle uses the naive theta join — same result, which
    is the point: the chunking is a pure execution strategy."""
    ev = _t(spark, sf_dir, "events")
    ts_s = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    sess = (
        ev.select("user_id", "ts", "event_id")
        .withColumn("prev_us", F.lag(ts_s).over(w))
        .withColumn(
            "new_sess",
            (F.col("prev_us").isNull())
            | (ts_s - F.col("prev_us") > 300_000_000),
        )
        .withColumn(
            "sess_id",
            F.sum(F.col("new_sess").cast("int")).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(
            (F.floor(F.min(ts_s) / 60_000_000) * 60).alias("s1"),
            ((F.floor(F.max(ts_s) / 60_000_000) + 1) * 60).alias("e1"),
        )
    )
    inc = (
        ev.where(F.col("event_type") == "error")
        .groupBy((F.floor(ts_s / 900_000_000) * 900).alias("s2"))
        .agg(F.count(F.lit(1)).alias("n_err"))
        .where(F.col("n_err") >= 2)
        .select("s2", (F.col("s2") + 900).alias("e2"))
    )
    H = 1800
    sb = sess.select(
        "user_id",
        "sess_id",
        "s1",
        "e1",
        # low edge extends one extra bucket: the horizon predicate is
        # on e2 = s2 + 900, so qualifying incidents START as early as
        # s1 - H - 900
        F.explode(
            F.sequence(
                F.floor((F.col("s1") - H - 900) / 900).cast("bigint"),
                F.floor((F.col("e1") + H) / 900).cast("bigint"),
            )
        ).alias("bucket"),
    )
    ib = inc.withColumn("bucket", F.floor(F.col("s2") / 900).cast("bigint"))
    pairs = (
        sb.join(ib, "bucket")
        .select("user_id", "sess_id", "s1", "e1", "s2", "e2")
        .distinct()
        .where((F.col("s1") <= F.col("e2") + H) & (F.col("s2") <= F.col("e1") + H))
    )
    rel = (
        F.when(F.col("e1") < F.col("s2"), "precedes")
        .when(F.col("s1") > F.col("e2"), "preceded_by")
        .when(F.col("e1") == F.col("s2"), "meets")
        .when(F.col("s1") == F.col("e2"), "met_by")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") == F.col("e2")), "equals")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")), "starts")
        .when((F.col("s1") == F.col("s2")) & (F.col("e1") > F.col("e2")), "started_by")
        .when((F.col("e1") == F.col("e2")) & (F.col("s1") > F.col("s2")), "finishes")
        .when((F.col("e1") == F.col("e2")) & (F.col("s1") < F.col("s2")), "finished_by")
        .when((F.col("s1") > F.col("s2")) & (F.col("e1") < F.col("e2")), "during")
        .when((F.col("s1") < F.col("s2")) & (F.col("e1") > F.col("e2")), "contains")
        .when((F.col("s1") < F.col("s2")) & (F.col("e1") < F.col("e2")), "overlaps")
        .otherwise("overlapped_by")
    )
    return (
        pairs.select(rel.alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .orderBy("relation")
    )


ORACLE_Q271 = """
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t_us FROM events
),
marked AS (
  SELECT user_id, t_us,
         CASE WHEN lag(t_us) OVER
                (PARTITION BY user_id ORDER BY t_us, event_id) IS NULL
              OR t_us - lag(t_us) OVER
                (PARTITION BY user_id ORDER BY t_us, event_id)
                 > 300000000
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
),
sess AS (
  SELECT user_id, sess_id,
         floor(min(t_us) / 60000000) * 60 AS s1,
         (floor(max(t_us) / 60000000) + 1) * 60 AS e1
  FROM (SELECT user_id, t_us,
               sum(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY t_us
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM marked)
  GROUP BY user_id, sess_id
),
inc AS (
  SELECT floor(t_us / 900000000) * 900 AS s2,
         floor(t_us / 900000000) * 900 + 900 AS e2
  FROM ev WHERE event_type = 'error'
  GROUP BY 1, 2 HAVING count(*) >= 2
),
pairs AS (
  SELECT DISTINCT user_id, sess_id, s1, e1, s2, e2
  FROM sess JOIN inc ON s1 <= e2 + 1800 AND s2 <= e1 + 1800
)
SELECT CASE
         WHEN e1 < s2 THEN 'precedes'
         WHEN s1 > e2 THEN 'preceded_by'
         WHEN e1 = s2 THEN 'meets'
         WHEN s1 = e2 THEN 'met_by'
         WHEN s1 = s2 AND e1 = e2 THEN 'equals'
         WHEN s1 = s2 AND e1 < e2 THEN 'starts'
         WHEN s1 = s2 AND e1 > e2 THEN 'started_by'
         WHEN e1 = e2 AND s1 > s2 THEN 'finishes'
         WHEN e1 = e2 AND s1 < s2 THEN 'finished_by'
         WHEN s1 > s2 AND e1 < e2 THEN 'during'
         WHEN s1 < s2 AND e1 > e2 THEN 'contains'
         WHEN s1 < s2 AND e1 < e2 THEN 'overlaps'
         ELSE 'overlapped_by'
       END AS relation,
       CAST(count(*) AS BIGINT) AS n_pairs
FROM pairs
GROUP BY 1
ORDER BY relation
"""


# q272: rendezvous (highest-random-weight) hashing shard audit

def q272_rendezvous_hashing(spark, sf_dir):
    """Rendezvous (highest-random-weight) hashing audit: every
    document is assigned to the shard maximizing the portable 60-bit
    hash of (doc_id # shard), under an 8-shard and a 9-shard
    configuration, and the audit proves HRW's minimal-disruption
    property ON THIS CORPUS: a document moves ONLY to the newly added
    shard, never between surviving shards (n_moved_away sums to the
    new shard's population; every old shard keeps the rest).  This is
    the assignment discipline for sticky routing / cache sharding
    where consistent-hash rings would be the alternative.

    Scale shape: purely map-side — each doc explodes into 9 (shard,
    weight) rows computed from literals + the portable md5 (no
    shuffle until the final bounded-key count); the per-doc argmax is
    a max_by aggregate on doc_id (one shuffle of slim rows; at
    production scale this is the one unavoidable exchange and it
    carries 16 bytes/row).  Ties in the 60-bit hash are
    cryptographically negligible and both engines see identical
    hashes, so argmax is deterministic."""
    docs = _t_wide(spark, sf_dir, "documents").select("doc_id")
    shards9 = [f"shard{i}" for i in range(9)]
    weighted = docs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).alias("shard"),
                    md5_i64_expr(
                        F.concat(
                            F.col("doc_id").cast("string"),
                            F.lit("#" + s),
                        )
                    ).alias("h"),
                )
                for s in shards9
            ])
        ).alias("sw"),
    ).select("doc_id", F.col("sw.shard").alias("shard"), F.col("sw.h").alias("h"))
    a9 = weighted.groupBy("doc_id").agg(
        F.max_by("shard", "h").alias("assign9")
    )
    a8 = (
        weighted.where(F.col("shard") != "shard8")
        .groupBy("doc_id")
        .agg(F.max_by("shard", "h").alias("assign8"))
    )
    both = a9.join(a8, "doc_id")
    return (
        both.groupBy(F.col("assign9").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_assigned_9"),
            F.sum((F.col("assign8") == F.col("assign9")).cast("int"))
            .cast("bigint")
            .alias("n_stayed"),
            F.sum((F.col("assign8") != F.col("assign9")).cast("int"))
            .cast("bigint")
            .alias("n_moved_in"),
        )
        .orderBy("shard")
    )


_DUCK_HRW_H = duck_md5_i64("CAST(doc_id AS VARCHAR) || '#' || shard")

ORACLE_Q272 = f"""
WITH weighted AS (
  SELECT doc_id, shard, {_DUCK_HRW_H} AS h
  FROM documents,
       UNNEST(['shard0','shard1','shard2','shard3','shard4',
               'shard5','shard6','shard7','shard8']) AS t(shard)
),
a9 AS (
  SELECT doc_id, arg_max(shard, h) AS assign9 FROM weighted GROUP BY 1
),
a8 AS (
  SELECT doc_id, arg_max(shard, h) AS assign8
  FROM weighted WHERE shard <> 'shard8' GROUP BY 1
)
SELECT assign9 AS shard,
       CAST(count(*) AS BIGINT) AS n_assigned_9,
       CAST(sum(CASE WHEN assign8 = assign9 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_stayed,
       CAST(sum(CASE WHEN assign8 <> assign9 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_moved_in
FROM a9 JOIN a8 USING (doc_id)
GROUP BY 1
ORDER BY shard
"""


# q273: TPC-H Q11 shape — global-fraction threshold (important parts)

def q273_important_parts(spark, sf_dir):
    """TPC-H Q11 shape (important stock identification): parts whose
    total revenue exceeds 0.1% OF THE WHOLE CORPUS's revenue — the
    correlated scalar-subquery-over-SUM that decorrelates into one
    per-key aggregate plus a 1-row global aggregate broadcast back as
    a HAVING threshold.  Distinct from q264 (Q15), which keeps ties of
    the MAX; here the threshold is a *fraction of the global total*,
    so the global scalar participates in arithmetic, not equality.
    The fraction compare is integer-exact: ``revenue * 1600 > global``
    in DECIMAL (fraction 1/1600, sized so the filter is discriminative
    at test scale: ~12% of parts pass at sf0.01) — no float ratio
    anywhere.

    Scale shape: one part-key agg over the fact scan (map-side
    partials); the global total re-aggregates the slim per-part
    relation (never a second fact scan); the 1-row result broadcasts
    into a map-side filter; part names arrive by broadcast.  At 100 TB
    the only fact-scale exchange is the first part-key shuffle."""
    li = _t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(
            (
                F.col("l_extendedprice").cast(DEC)
                * (F.lit(1).cast(DEC) - F.col("l_discount").cast(DEC))
            ).cast("decimal(18,4)")
        ).alias("revenue")
    )
    total = rev.agg(
        F.sum(F.col("revenue").cast("decimal(28,4)")).alias("global_rev")
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        rev.join(F.broadcast(total))
        .where(
            F.col("revenue").cast("decimal(28,4)") * 1600 > F.col("global_rev")
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            F.col("p_partkey").cast("bigint").alias("p_partkey"),
            "p_name",
            F.col("revenue").cast("double").alias("part_revenue"),
        )
        .orderBy("p_partkey")
    )


ORACLE_Q273 = """
WITH rev AS (
  SELECT l_partkey,
         sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                  AS DECIMAL(18,4))) AS revenue
  FROM lineitem GROUP BY l_partkey
),
total AS (
  SELECT sum(CAST(revenue AS DECIMAL(28,4))) AS global_rev FROM rev
)
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name,
       CAST(revenue AS DOUBLE) AS part_revenue
FROM rev
CROSS JOIN total
JOIN part ON l_partkey = p_partkey
WHERE CAST(revenue AS DECIMAL(28,4)) * 1600 > global_rev
ORDER BY p_partkey
"""


# q274: gaps-and-islands longest active-day streak

def q274_activity_streaks(spark, sf_dir):
    """Longest consecutive-active-day streak per user, reported as a
    distribution (max-streak length -> how many users), via the
    classic gaps-and-islands rank-difference trick: distinct active
    days per user, ``day_number - row_number`` is constant exactly
    within a run of consecutive days, so one groupBy on that constant
    yields streak lengths with NO self-join and NO iteration.  The
    engagement/retention metric behind "7-day streak" product
    features, and the canonical islands idiom q106/q218 do NOT cover
    (those detect value-change islands and sequence gaps; this one is
    calendar-consecutiveness of deduplicated days).

    Scale shape: distinct (user, day) collapses the fact table first
    (the only fact-scale shuffle); both windows and the island
    aggregate share the SAME user-key partitioning so AQE plans one
    Exchange; the final distribution agg is streak-length-scale
    (bounded by days in the corpus)."""
    ev = _t(spark, sf_dir, "events")
    days = (
        ev.select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
                "day_num"
            ),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_num")
    streaks = (
        days.withColumn("rn", F.row_number().over(w))
        .withColumn("island", F.col("day_num") - F.col("rn"))
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("streak_len"))
    )
    return (
        streaks.groupBy("user_id")
        .agg(F.max("streak_len").alias("max_streak"))
        .groupBy("max_streak")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("max_streak")
    )


ORACLE_Q274 = """
WITH days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num
  FROM events
),
streaks AS (
  SELECT user_id,
         day_num - row_number() OVER (PARTITION BY user_id ORDER BY day_num)
           AS island
  FROM days
),
lens AS (
  SELECT user_id, island, count(*) AS streak_len
  FROM streaks GROUP BY user_id, island
),
per_user AS (
  SELECT user_id, max(streak_len) AS max_streak FROM lens GROUP BY user_id
)
SELECT max_streak, CAST(count(*) AS BIGINT) AS n_users
FROM per_user
GROUP BY max_streak
ORDER BY max_streak
"""


# q275: running-peak max drawdown (integer-cents exact)

def q275_max_drawdown(spark, sf_dir):
    """Maximum drawdown per user over a SIGNED cash flow ordered by
    time — purchases credit the balance, error-flagged transactions
    reverse (debit) their value, so the running sum genuinely rises
    and falls: cumulative balance, its running peak (cummax), and the
    largest peak-to-trough gap — the risk metric every billing/fraud/
    treasury pipeline computes, and a double window-on-window
    composition (cumsum feeding cummax) no earlier query exercises.
    (An unsigned purchases-only flow would be monotone and the
    drawdown identically zero — the signed flow is what makes the
    operator non-degenerate, pytest-asserted.)  All arithmetic is
    integer CENTS (value -> DECIMAL(9,2) -> *100 -> BIGINT) so the
    running sums are exact and both engines agree bit-for-bit; output
    is the top 20 users by drawdown with a deterministic tie-break.

    Scale shape: one user-key Exchange serves BOTH frame windows (same
    partitioning, same ordering — Spark plans consecutive Window
    nodes over a single sort); the top-20 is TakeOrderedAndProject
    (per-partition heap + 20-row driver merge), never a global sort."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "error")
    )
    cents = (
        F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(-1))
        * (F.col("value").cast("decimal(9,2)") * 100).cast("bigint")
    )
    wcum = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bal = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(cents).over(wcum).alias("balance_cents"),
    )
    peaked = bal.withColumn(
        "peak_cents", F.max("balance_cents").over(wcum)
    )
    return (
        peaked.groupBy("user_id")
        .agg(
            F.max(F.col("peak_cents") - F.col("balance_cents"))
            .cast("bigint")
            .alias("max_drawdown_cents"),
            F.max("peak_cents").cast("bigint").alias("peak_balance_cents"),
        )
        .orderBy(F.desc("max_drawdown_cents"), "user_id")
        .limit(20)
    )


ORACLE_Q275 = """
WITH cents AS (
  SELECT user_id, ts, event_id,
         (CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END)
         * CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS c
  FROM events WHERE event_type IN ('purchase', 'error')
),
bal AS (
  SELECT user_id, ts, event_id,
         sum(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS balance_cents
  FROM cents
),
peaked AS (
  SELECT user_id, balance_cents,
         max(balance_cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS peak_cents
  FROM bal
)
SELECT user_id,
       CAST(max(peak_cents - balance_cents) AS BIGINT) AS max_drawdown_cents,
       CAST(max(peak_cents) AS BIGINT) AS peak_balance_cents
FROM peaked
GROUP BY user_id
ORDER BY max_drawdown_cents DESC, user_id
LIMIT 20
"""


# q276: TPC-H Q4 shape — EXISTS late-shipment order priority check

def q276_priority_check(spark, sf_dir):
    """TPC-H Q4 shape (order priority checking): count orders per
    priority, restricted to orders in a one-quarter date window that
    have AT LEAST ONE late lineitem (shipped more than 30 days after
    the order date) — the canonical correlated EXISTS that planners
    turn into a left-semi join.  The fixture lineitem carries no
    commit/receipt dates, so lateness is l_shipdate > o_orderdate +
    30 days, which preserves the exact Q4 plan shape: date-filtered
    orders, a correlated predicate touching BOTH sides, semi-join,
    group-count (tpch spec Q4; fixture schema per TESTDATA.md).

    Scale shape: the orders date filter pushes to the parquet scan;
    the semi join keys on l_orderkey so the correlated date compare
    rides the join condition (no post-filter materialization); output
    is one tiny priority-count aggregate.  At 100 TB both scans prune
    on the date window and the only wide exchange is the orderkey
    semi join — left-semi emits each order at most once, so no
    DISTINCT pass is needed."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).cast("bigint").alias("order_count"))
        .orderBy("o_orderpriority")
    )


ORACLE_Q276 = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01'
  AND o_orderdate <  TIMESTAMP '1995-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# q277: Kendall tau-b rank concordance from contingency cells

def q277_kendall_tau(spark, sf_dir):
    """Kendall tau-b rank concordance between l_quantity and
    l_discount — the tie-robust ordinal-association companion to
    q256's Spearman rho.  Naive Kendall is an O(n^2) all-pairs scan;
    here both variables have small value domains (<=50 x <=11), so the
    fact table collapses to a <=550-cell contingency FIRST and the
    pair census runs cell-by-cell: concordant mass C = sum over cell
    pairs (x2>x1 AND y2>y1) of n1*n2, discordant D likewise with
    y2<y1 — a deliberate 550x550 self-join over the AGGREGATE (3*10^5
    cell pairs of metadata, never row pairs).  Tie corrections n1,n2
    come from the exact marginals; tau_b = (C-D)/sqrt((n0-nx)(n0-ny))
    is evaluated once in float64 from exact DECIMAL(38,0) integers
    (conversion + * / sqrt all IEEE correctly-rounded, so bits match
    across engines; q256's discipline), floored at ppm.

    Scale shape: ONE map-side-combinable contingency shuffle over the
    fact scan; everything after runs on <=550 rows (the self-join is
    the documented metadata-scale broadcast NLJ, like the 16-centroid
    collect in similarity.py); marginals and the final fold are
    1-row-scale."""
    li = _t(spark, sf_dir, "lineitem")
    cells = li.groupBy(
        F.col("l_quantity").cast("bigint").alias("x"),
        (F.col("l_discount") * 100).cast("bigint").alias("y"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    D38 = "decimal(38,0)"
    c1 = cells.select(
        F.col("x").alias("x1"), F.col("y").alias("y1"), F.col("cnt").alias("n1")
    )
    c2 = cells.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("cnt").alias("n2")
    )
    pairs = c1.join(
        F.broadcast(c2), (F.col("x2") > F.col("x1")) & (F.col("y2") != F.col("y1"))
    )
    cd = pairs.agg(
        F.sum(
            F.when(F.col("y2") > F.col("y1"), F.col("n1").cast(D38) * F.col("n2"))
            .otherwise(F.lit(0))
        ).cast(D38).alias("conc"),
        F.sum(
            F.when(F.col("y2") < F.col("y1"), F.col("n1").cast(D38) * F.col("n2"))
            .otherwise(F.lit(0))
        ).cast(D38).alias("disc"),
    )
    xm = cells.groupBy("x").agg(F.sum("cnt").alias("tx")).agg(
        F.sum(F.col("tx").cast(D38) * (F.col("tx") - 1)).cast(D38).alias("nx2")
    )
    ym = cells.groupBy("y").agg(F.sum("cnt").alias("ty")).agg(
        F.sum(F.col("ty").cast(D38) * (F.col("ty") - 1)).cast(D38).alias("ny2")
    )
    tot = cells.agg(F.sum("cnt").cast(D38).alias("n"))
    return (
        cd.join(F.broadcast(xm))
        .join(F.broadcast(ym))
        .join(F.broadcast(tot))
        .select(
            F.col("n").cast("bigint").alias("n_rows"),
            F.col("conc").cast("bigint").alias("concordant_pairs"),
            F.col("disc").cast("bigint").alias("discordant_pairs"),
            F.floor(
                (F.col("conc").cast("double") - F.col("disc").cast("double"))
                / F.sqrt(
                    (
                        (F.col("n") * (F.col("n") - 1) - F.col("nx2")).cast("double")
                    )
                    * (
                        (F.col("n") * (F.col("n") - 1) - F.col("ny2")).cast("double")
                    )
                )
                * F.lit(2000000.0)
            ).cast("bigint").alias("tau_b_ppm"),
        )
    )


ORACLE_Q277 = """
WITH cells AS (
  SELECT CAST(l_quantity AS BIGINT) AS x,
         CAST(l_discount * 100 AS BIGINT) AS y,
         count(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
cd AS (
  SELECT
    CAST(sum(CASE WHEN c2.y > c1.y
             THEN CAST(c1.cnt AS DECIMAL(38,0)) * c2.cnt ELSE 0 END)
         AS DECIMAL(38,0)) AS conc,
    CAST(sum(CASE WHEN c2.y < c1.y
             THEN CAST(c1.cnt AS DECIMAL(38,0)) * c2.cnt ELSE 0 END)
         AS DECIMAL(38,0)) AS disc
  FROM cells c1 JOIN cells c2 ON c2.x > c1.x AND c2.y <> c1.y
),
xm AS (
  SELECT CAST(sum(CAST(tx AS DECIMAL(38,0)) * (tx - 1)) AS DECIMAL(38,0)) AS nx2
  FROM (SELECT x, sum(cnt) AS tx FROM cells GROUP BY x)
),
ym AS (
  SELECT CAST(sum(CAST(ty AS DECIMAL(38,0)) * (ty - 1)) AS DECIMAL(38,0)) AS ny2
  FROM (SELECT y, sum(cnt) AS ty FROM cells GROUP BY y)
),
tot AS (SELECT CAST(sum(cnt) AS DECIMAL(38,0)) AS n FROM cells)
SELECT CAST(n AS BIGINT) AS n_rows,
       CAST(conc AS BIGINT) AS concordant_pairs,
       CAST(disc AS BIGINT) AS discordant_pairs,
       CAST(floor(
         (CAST(conc AS DOUBLE) - CAST(disc AS DOUBLE))
         / sqrt(CAST(n * (n - 1) - nx2 AS DOUBLE)
                * CAST(n * (n - 1) - ny2 AS DOUBLE))
         * 2000000.0
       ) AS BIGINT) AS tau_b_ppm
FROM cd, xm, ym, tot
"""


# q278: rolling exact-median anomaly gate (window-of-5 purchase values)

def q278_rolling_median_gate(spark, sf_dir):
    """Rolling exact-median spike gate: for each user's purchase
    stream (ordered by ts, event_id), the median of the TRAILING FIVE
    purchase amounts, and a row is flagged when its amount exceeds 4x
    that rolling median — the classic order-of-magnitude fraud/billing
    spike detector that a global median (q269) or a global MAD gate
    (q213) cannot express because the baseline must travel WITH the
    stream.  Median-of-5 is computed exactly as the 3rd element of the
    sorted trailing window (collect_list -> sort_array -> element_at;
    DuckDB mirror: list() window -> list_sort -> [3]) in integer
    cents, so there is no interpolation and no float anywhere; the
    first four rows of each user (incomplete window) are excluded on
    both sides by row_number >= 5.  Output: per user, rows scored,
    rows flagged, and the worst spike ratio in ppm (floor of
    cents*1e6 div median_cents — integer division), for users with at
    least one flag.

    Scale shape: ONE user_id Exchange serves the row_number window,
    the trailing collect_list window, and the final per-user aggregate
    (same partitioning + ordering -> consecutive Window nodes over a
    single sort, then a partial-agg); trailing state is bounded at 5
    values/row by the frame, so memory per task is O(partition),
    never O(user history)."""
    ev = _t(spark, sf_dir, "events").where(F.col("event_type") == "purchase")
    cents = (F.col("value").cast("decimal(9,2)") * 100).cast("bigint")
    w5 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, 0)
    )
    wn = Window.partitionBy("user_id").orderBy("ts", "event_id")
    scored = (
        ev.select("user_id", "ts", "event_id", cents.alias("c"))
        .withColumn("rn", F.row_number().over(wn))
        .withColumn(
            "med", F.element_at(F.sort_array(F.collect_list("c").over(w5)), 3)
        )
        .where(F.col("rn") >= 5)
    )
    flagged = scored.withColumn(
        "is_spike",
        (F.col("c") > 4 * F.col("med")) & (F.col("med") > 0),
    )
    return (
        flagged.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_scored"),
            F.sum(F.col("is_spike").cast("bigint")).cast("bigint").alias("n_spikes"),
            F.max(
                F.when(
                    F.col("med") > 0,
                    F.expr("c * 1000000 div med"),
                )
            ).cast("bigint").alias("worst_ratio_ppm"),
        )
        .where(F.col("n_spikes") > 0)
        .orderBy("user_id")
    )


ORACLE_Q278 = """
WITH cents AS (
  SELECT user_id, ts, event_id,
         CAST(CAST(value AS DECIMAL(9,2)) * 100 AS BIGINT) AS c
  FROM events WHERE event_type = 'purchase'
),
scored AS (
  SELECT user_id, c,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         list_sort(list(c) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW))[3]
           AS med
  FROM cents
),
flagged AS (
  SELECT user_id, c, med,
         (c > 4 * med AND med > 0) AS is_spike
  FROM scored WHERE rn >= 5
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_scored,
       CAST(sum(CASE WHEN is_spike THEN 1 ELSE 0 END) AS BIGINT) AS n_spikes,
       CAST(max(CASE WHEN med > 0 THEN c * 1000000 // med END) AS BIGINT)
         AS worst_ratio_ppm
FROM flagged
GROUP BY user_id
HAVING sum(CASE WHEN is_spike THEN 1 ELSE 0 END) > 0
ORDER BY user_id
"""


# q279: sequential early-stopping audit (first-passage random walk)

def q279_sequential_stopping(spark, sf_dir):
    """Sequential-test early-stopping audit: each experiment bucket
    accumulates a +/-1 evidence walk (purchase = success, click =
    failure) in event-time order and DECIDES at the first moment the
    walk hits +B or -B — the integer-exact skeleton of an SPRT with
    symmetric log-likelihood increments (p1/p0 = 2 makes each step
    exactly +/-1 unit of ln 2, so thresholds are integers and no
    logarithm is ever evaluated).  The audit reports, per experiment:
    the decision (accept/reject/running), how many observations the
    sequential rule needed, and the walk's final value — i.e. how much
    sample the early stop saved vs the fixed-horizon test.  First
    passage is found with windows, not iteration: cumulative sum,
    row_number ordered by time among the threshold-crossing rows, keep
    the first.

    Scale shape: one experiment-key Exchange serves the cumsum window,
    the crossing row_number, and the per-experiment fold (same
    partitioning throughout); state per row is O(1).  The experiment
    key is a pure function of user_id so the fixture is deterministic
    at every SF."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("purchase", "click")
    )
    step = F.when(F.col("event_type") == "purchase", F.lit(1)).otherwise(F.lit(-1))
    bound = 25
    wcum = (
        Window.partitionBy("exp_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wn = Window.partitionBy("exp_id").orderBy("ts", "event_id")
    walked = (
        ev.select(
            (F.col("user_id") % 16).alias("exp_id"),
            "ts",
            "event_id",
            step.alias("step"),
        )
        .withColumn("walk", F.sum("step").over(wcum))
        .withColumn("rn", F.row_number().over(wn))
    )
    crossing = walked.where(F.abs(F.col("walk")) >= bound)
    first_cross = (
        crossing.groupBy("exp_id")
        .agg(F.min("rn").alias("decide_at"))
        .join(
            crossing.select("exp_id", F.col("rn").alias("decide_at"), "walk"),
            ["exp_id", "decide_at"],
        )
        .select(
            "exp_id",
            F.lit(True).alias("decided"),
            F.col("decide_at").cast("bigint").alias("n_obs_used"),
            F.when(F.col("walk") >= bound, F.lit("accept"))
            .otherwise(F.lit("reject"))
            .alias("decision"),
            F.col("walk").cast("bigint").alias("walk_at_stop"),
        )
    )
    totals = walked.groupBy("exp_id").agg(
        F.max("rn").alias("n_total"), F.max_by("walk", "rn").alias("final_walk")
    )
    return (
        totals.join(first_cross, "exp_id", "left")
        .select(
            F.col("exp_id").cast("bigint").alias("exp_id"),
            F.coalesce(F.col("decision"), F.lit("running")).alias("decision"),
            F.coalesce(F.col("n_obs_used"), F.col("n_total"))
            .cast("bigint")
            .alias("n_obs_used"),
            F.col("n_total").cast("bigint").alias("n_total"),
            F.coalesce(F.col("walk_at_stop"), F.col("final_walk"))
            .cast("bigint")
            .alias("walk_value"),
        )
        .orderBy("exp_id")
    )


ORACLE_Q279 = """
WITH ev AS (
  SELECT user_id % 16 AS exp_id, ts, event_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS step
  FROM events WHERE event_type IN ('purchase', 'click')
),
walked AS (
  SELECT exp_id, ts, event_id,
         sum(step) OVER (PARTITION BY exp_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING) AS walk,
         row_number() OVER (PARTITION BY exp_id ORDER BY ts, event_id) AS rn
  FROM ev
),
first_cross AS (
  SELECT exp_id, decide_at, walk FROM (
    SELECT exp_id, rn AS decide_at, walk,
           row_number() OVER (PARTITION BY exp_id ORDER BY rn) AS k
    FROM walked WHERE abs(walk) >= 25
  ) WHERE k = 1
),
totals AS (
  SELECT exp_id, max(rn) AS n_total,
         arg_max(walk, rn) AS final_walk
  FROM walked GROUP BY exp_id
)
SELECT CAST(t.exp_id AS BIGINT) AS exp_id,
       coalesce(CASE WHEN f.walk >= 25 THEN 'accept'
                     WHEN f.walk <= -25 THEN 'reject' END,
                'running') AS decision,
       CAST(coalesce(f.decide_at, t.n_total) AS BIGINT) AS n_obs_used,
       CAST(t.n_total AS BIGINT) AS n_total,
       CAST(coalesce(f.walk, t.final_walk) AS BIGINT) AS walk_value
FROM totals t LEFT JOIN first_cross f ON t.exp_id = f.exp_id
ORDER BY exp_id
"""


# q280: Good-Turing frequency-of-frequencies spectrum

def q280_good_turing_spectrum(spark, sf_dir):
    """Good-Turing frequency-of-frequencies table over the corpus
    vocabulary: N_r = how many distinct tokens occur exactly r times,
    plus the Good-Turing adjusted count r* = (r+1) * N_{r+1} / N_r
    (emitted as ppm via exact integer floor-division) — the smoothing
    statistic a language-model estimator needs to reserve probability
    mass for unseen events, and the single-table summary that tells a
    corpus engineer whether the token tail is Zipf-healthy or
    duplication-inflated.  Complements q87 (rank-based rarity) and
    q109 (Kneser-Ney continuation counts); neither computes the N_r
    spectrum or the GT adjustment.

    Scale shape: token counts are one map-side-combinable shuffle;
    the spectrum re-aggregates the VOCABULARY relation (metadata-scale
    vs the corpus); the lead() for N_{r+1} runs over the spectrum
    itself (hundreds of rows) in a single-partition window that is
    explicitly bounded, not a disguised global sort of data."""
    docs = _t(spark, sf_dir, "documents")
    tokens = docs.select(
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok")
    ).where(F.col("tok") != "")
    counts = tokens.groupBy("tok").agg(F.count(F.lit(1)).alias("r"))
    spectrum = counts.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    wlead = Window.orderBy("r")
    return (
        spectrum.withColumn("r_next", F.lead("r").over(wlead))
        .withColumn("n_next", F.lead("n_r").over(wlead))
        .select(
            F.col("r").cast("bigint").alias("r"),
            F.col("n_r").cast("bigint").alias("n_r"),
            F.when(
                F.col("r_next") == F.col("r") + 1,
                F.expr("(r + 1) * n_next * 1000000 div n_r"),
            )
            .cast("bigint")
            .alias("gt_adjusted_ppm"),
        )
        .orderBy("r")
    )


ORACLE_Q280 = """
WITH tokens AS (
  SELECT unnest(string_split_regex(lower(text), '\\s+')) AS tok
  FROM documents
),
counts AS (
  SELECT tok, count(*) AS r FROM tokens WHERE tok <> '' GROUP BY tok
),
spectrum AS (
  SELECT r, count(*) AS n_r FROM counts GROUP BY r
),
led AS (
  SELECT r, n_r,
         lead(r) OVER (ORDER BY r) AS r_next,
         lead(n_r) OVER (ORDER BY r) AS n_next
  FROM spectrum
)
SELECT CAST(r AS BIGINT) AS r, CAST(n_r AS BIGINT) AS n_r,
       CAST(CASE WHEN r_next = r + 1
                 THEN (r + 1) * n_next * 1000000 // n_r END AS BIGINT)
         AS gt_adjusted_ppm
FROM led
ORDER BY r
"""


# q281: effective language count per source (inverse Simpson)

def q281_effective_languages(spark, sf_dir):
    """Effective language count per source — the inverse Simpson index
    1 / sum(p_i^2) of each source's language mix, computed EXACTLY as
    floor(N^2 * 1e6 / sum(c_i^2)) in integers — the monoculture audit
    that tells a corpus curator whether a source contributes genuine
    language diversity or one language with trace noise (an effective
    count of 1.0x means monolingual; k means k balanced languages).
    Complements q125, which measures inequality ACROSS sources of the
    whole corpus (Lorenz/Gini); this measures mix WITHIN each source,
    and the two disagree exactly when a big source is internally
    diverse.  Also reports the dominant language and its exact share
    in ppm.

    Scale shape: one (source, lang) contingency shuffle with map-side
    combine (cells = sources x langs, metadata-scale); everything
    after runs on cells.  No window over raw rows, no float sums."""
    docs = _t(spark, sf_dir, "documents")
    cells = docs.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    return (
        cells.groupBy("source")
        .agg(
            F.sum("c").alias("n_docs"),
            F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
            F.max_by("lang", F.struct(F.col("c"), F.col("lang"))).alias(
                "dominant_lang"
            ),
            F.max("c").alias("dom_c"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("dominant_lang"),
            F.expr("dom_c * 1000000 div n_docs").cast("bigint").alias(
                "dominant_share_ppm"
            ),
            F.expr("n_docs * n_docs * 1000000 div sum_sq")
            .cast("bigint")
            .alias("effective_langs_ppm"),
        )
        .orderBy("source")
    )


ORACLE_Q281 = """
WITH cells AS (
  SELECT source, lang, count(*) AS c
  FROM documents GROUP BY source, lang
),
ranked AS (
  SELECT source, lang, c,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, lang DESC) AS k
  FROM cells
),
agg AS (
  SELECT source, sum(c) AS n_docs, sum(c * c) AS sum_sq
  FROM cells GROUP BY source
)
SELECT a.source,
       CAST(a.n_docs AS BIGINT) AS n_docs,
       r.lang AS dominant_lang,
       CAST(r.c * 1000000 // a.n_docs AS BIGINT) AS dominant_share_ppm,
       CAST(a.n_docs * a.n_docs * 1000000 // a.sum_sq AS BIGINT)
         AS effective_langs_ppm
FROM agg a JOIN ranked r ON a.source = r.source AND r.k = 1
ORDER BY a.source
"""


# q282: Wilson lower-bound small-sample-safe conversion ranking

def q282_wilson_ranking(spark, sf_dir):
    """Small-sample-safe conversion ranking: campaigns (the ``k``
    property of each event) ranked by the WILSON SCORE LOWER BOUND of
    their purchase-per-(view+purchase) rate at z=1.96 — the ranking
    rule that stops a 2-for-2 newcomer from outranking a seasoned
    980-for-2000 campaign, which a raw-rate sort (or q176's percent
    ranks) happily gets wrong.  Successes and trials are exact
    integers off one aggregate; the bound is then ONE fixed float64
    expression evaluated identically in both engines from those exact
    integers — int->double conversion, + * / and sqrt are all IEEE
    correctly-rounded, and the expression tree is mirrored
    parenthesis-for-parenthesis in the oracle, so the resulting bits
    (and the ppm floor) match bit-for-bit (q256's discipline).

    Scale shape: ONE map-side-combinable (campaign) aggregate over the
    fact scan — the JSON k extraction is pure Catalyst (get_json_object
    -> bigint); the Wilson arithmetic runs on the campaign relation
    (metadata-scale).  The final sort is output-sized."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    agg = ev.groupBy(
        F.get_json_object("props", "$.k").cast("bigint").alias("campaign")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("s"),
    )
    z2 = F.lit(3.8416)
    n = F.col("n").cast("double")
    p = F.col("s").cast("double") / n
    lb = (
        p
        + z2 / (2.0 * n)
        - F.lit(1.96) * F.sqrt((p * (F.lit(1.0) - p) + z2 / (4.0 * n)) / n)
    ) / (F.lit(1.0) + z2 / n)
    return (
        agg.select(
            "campaign",
            F.col("n").cast("bigint").alias("trials"),
            F.col("s").cast("bigint").alias("successes"),
            F.expr("s * 1000000 div n").cast("bigint").alias("raw_rate_ppm"),
            F.floor(lb * F.lit(1000000.0)).cast("bigint").alias("wilson_lb_ppm"),
        )
        .orderBy(F.desc("wilson_lb_ppm"), "campaign")
    )


ORACLE_Q282 = """
WITH agg AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS campaign,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY 1
)
SELECT campaign,
       CAST(n AS BIGINT) AS trials,
       CAST(s AS BIGINT) AS successes,
       CAST(s * 1000000 // n AS BIGINT) AS raw_rate_ppm,
       CAST(floor(
         ((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
          + 3.8416 / (2.0 * CAST(n AS DOUBLE))
          - 1.96 * sqrt(((CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                         * (1.0 - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                         + 3.8416 / (4.0 * CAST(n AS DOUBLE)))
                        / CAST(n AS DOUBLE)))
         / (1.0 + 3.8416 / CAST(n AS DOUBLE))
         * 1000000.0
       ) AS BIGINT) AS wilson_lb_ppm
FROM agg
ORDER BY wilson_lb_ppm DESC, campaign
"""


# q283: token dispersion audit — Fano factor over doc-id shards

def q283_token_dispersion(spark, sf_dir):
    """Template-token detector via dispersion: for every token with
    corpus frequency >= 100, the FANO FACTOR (variance-to-mean ratio)
    of its count across 64 deterministic doc-id shards, in exact ppm —
    a Poisson-spread token scores ~1e6; boilerplate/template tokens
    concentrate in few shards and score far higher.  This is Church's
    burstiness signal reduced to integers: with shard sums S and
    sum-of-squares SS over B=64 shards (absent shards counted as 0 —
    they are: SS only ever ADDS mass, and both S and B are exact),
    VMR_ppm = (B*SS - S^2) * 1e6 // (B*S).  Complements q87/q280
    (frequency-based) and q126 (event-rate bursts): none measures
    WHERE a token's mass sits.

    Scale shape: one (token, shard) count shuffle with map-side
    combine, one token re-aggregate of that cell relation; the >=100
    support filter bounds the output to the frequent vocabulary and
    the top-100 is TakeOrderedAndProject.  Zero floats anywhere."""
    docs = _t(spark, sf_dir, "documents")
    cells = (
        docs.select(
            (F.col("doc_id") % 64).alias("shard"),
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
        )
        .where(F.col("tok") != "")
        .groupBy("tok", "shard")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        cells.groupBy("tok")
        .agg(
            F.sum("c").alias("s"),
            F.sum(F.col("c") * F.col("c")).alias("ss"),
            F.count(F.lit(1)).alias("n_shards"),
        )
        .where(F.col("s") >= 100)
        .select(
            "tok",
            F.col("s").cast("bigint").alias("freq"),
            F.col("n_shards").cast("bigint").alias("n_shards"),
            F.expr("(64 * ss - s * s) * 1000000 div (64 * s)")
            .cast("bigint")
            .alias("fano_ppm"),
        )
        .orderBy(F.desc("fano_ppm"), "tok")
        .limit(100)
    )


ORACLE_Q283 = """
WITH cells AS (
  SELECT tok, doc_id % 64 AS shard, count(*) AS c
  FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  )
  WHERE tok <> ''
  GROUP BY tok, shard
)
SELECT tok,
       CAST(sum(c) AS BIGINT) AS freq,
       CAST(count(*) AS BIGINT) AS n_shards,
       CAST((64 * sum(c * c) - sum(c) * sum(c)) * 1000000
            // (64 * sum(c)) AS BIGINT) AS fano_ppm
FROM cells
GROUP BY tok
HAVING sum(c) >= 100
ORDER BY fano_ppm DESC, tok
LIMIT 100
"""


# q284: multi-window SLO burn-rate alerting

def q284_burn_rate_alerts(spark, sf_dir):
    """Multi-window error-budget burn-rate alerting (the SRE-workbook
    pattern): page only when BOTH the fast 1-hour window AND its
    containing slow 6-hour window burn the 20% error budget faster
    than their thresholds (fast > 1.4x budget, slow > 1.1x budget) —
    the two-window AND is what suppresses both blips (fast trips,
    slow doesn't) and stale pages (slow trips on history, fast has
    recovered).  Ratios are exact integer ppm; no rates are floats.
    Distinct from q126 (trailing-baseline spike z-test) and q187
    (per-user rate caps): this gates on an absolute budget at two
    simultaneous resolutions.

    Scale shape: ONE fact-scan aggregate to 1-hour cells; the 6-hour
    tier REAGGREGATES the hourly cells (hierarchical rollup — the
    fact table is never scanned twice), and the fast->slow join keys
    on the slow window over metadata-scale relations (broadcast).  At
    100 TB this is the streaming-rollup cost model: hours/day x keys,
    not rows."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        (F.expr("unix_timestamp(ts) div 3600") * 3600).alias("fast_w")
    ).agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("event_type") == "error").cast("bigint")).alias("errors"),
    )
    slow = (
        hourly.groupBy((F.expr("fast_w div 21600") * 21600).alias("slow_w"))
        .agg(F.sum("total").alias("s_total"), F.sum("errors").alias("s_errors"))
    )
    fast = hourly.select(
        "fast_w",
        (F.expr("fast_w div 21600") * 21600).alias("slow_w"),
        "total",
        "errors",
        F.expr("errors * 1000000 div total").alias("fast_ppm"),
    )
    return (
        fast.join(F.broadcast(slow), "slow_w")
        .withColumn("slow_ppm", F.expr("s_errors * 1000000 div s_total"))
        .where(
            (F.col("fast_ppm") > 280000) & (F.col("slow_ppm") > 220000)
        )
        .select(
            F.col("slow_w").cast("bigint").alias("slow_window_start"),
            F.col("fast_w").cast("bigint").alias("fast_window_start"),
            F.col("errors").cast("bigint").alias("fast_errors"),
            F.col("total").cast("bigint").alias("fast_total"),
            F.col("fast_ppm").cast("bigint").alias("fast_burn_ppm"),
            F.col("slow_ppm").cast("bigint").alias("slow_burn_ppm"),
        )
        .orderBy("fast_window_start")
    )


ORACLE_Q284 = """
WITH hourly AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 3600) * 3600 AS fast_w,
         count(*) AS total,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS errors
  FROM events GROUP BY 1
),
slow AS (
  SELECT (fast_w // 21600) * 21600 AS slow_w,
         sum(total) AS s_total, sum(errors) AS s_errors
  FROM hourly GROUP BY 1
)
SELECT CAST(s.slow_w AS BIGINT) AS slow_window_start,
       CAST(h.fast_w AS BIGINT) AS fast_window_start,
       CAST(h.errors AS BIGINT) AS fast_errors,
       CAST(h.total AS BIGINT) AS fast_total,
       CAST(h.errors * 1000000 // h.total AS BIGINT) AS fast_burn_ppm,
       CAST(s.s_errors * 1000000 // s.s_total AS BIGINT) AS slow_burn_ppm
FROM hourly h JOIN slow s ON (h.fast_w // 21600) * 21600 = s.slow_w
WHERE h.errors * 1000000 // h.total > 280000
  AND s.s_errors * 1000000 // s.s_total > 220000
ORDER BY fast_window_start
"""


# q285: top principal component via integer power iteration

def q285_power_iteration_pca(spark, sf_dir):
    """Top principal direction of the embedding corpus via THREE
    integer power-iteration steps over the 64x64 Gram matrix — the
    spectral summary a curation pipeline uses to detect a degenerate
    embedding space (one direction swallowing the variance).  Vectors
    are quantized to integer units q = round(x*128) (|x| < 0.6 in this
    corpus, so |q| <= 77 — the q235 micro-unit discipline), making the
    Gram matrix A = Q^T Q EXACT bigints.  Each iterate renormalizes to
    +/-1024 with sign-explicit integer division (sign(r) * (|r|*1024
    div s), s = max|r|) so negative-operand div/`//` semantics never
    matter cross-engine.  The Rayleigh quotient lambda = v2^T A v2 /
    v2^T v2 is emitted in milli-units from the two exact integer
    moments via one float64 divide (q256 discipline: int64->double is
    correctly rounded in both engines).  The output is DEFINED as the
    3-step iterate — deterministic whether or not iteration has
    converged, and sign-pinned by the all-ones start.

    Scale shape: ONE map-side d^2-cell outer-product expansion (n*d^2
    rows before partial aggregation, d=64) into a (i,j)-keyed hash agg
    — the canonical distributed Gram computation; the 4096-cell Gram
    relation is localCheckpoint'ed once, and all three iterate joins
    run broadcast on <=64-row vectors.  Headroom: exact while
    n*77^2*1024 < 2^63 / 64, i.e. beyond 10^12 rows."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.select(
        F.expr(
            "transform(CAST(embedding AS ARRAY<DOUBLE>), "
            "x -> CAST(round(x * 128) AS BIGINT))"
        ).alias("qv")
    )
    xi = q.select(F.posexplode("qv").alias("i0", "qi"), F.col("qv"))
    cells = (
        xi.select("i0", "qi", F.posexplode("qv").alias("j0", "qj"))
        .groupBy("i0", "j0")
        .agg(F.sum(F.col("qi") * F.col("qj")).alias("a"))
        .select(
            (F.col("i0") + 1).alias("i"),
            (F.col("j0") + 1).alias("j"),
            "a",
        )
        .localCheckpoint(eager=True)  # 4096 rows; Gram scan runs ONCE
    )

    def _normalize(r):
        s = r.agg(F.max(F.abs(F.col("r"))).alias("s"))
        return r.crossJoin(F.broadcast(s)).select(
            "i",
            (
                F.when(F.col("r") >= 0, F.lit(1)).otherwise(F.lit(-1))
                * F.expr("(abs(r) * 1024) div s")
            ).alias("v"),
        )

    def _mul(v):
        vj = v.select(F.col("i").alias("j"), F.col("v").alias("vj"))
        return (
            cells.join(F.broadcast(vj), "j")
            .groupBy("i")
            .agg(F.sum(F.col("a") * F.col("vj")).alias("r"))
        )

    r1 = cells.groupBy("i").agg(F.sum("a").alias("r"))
    v1 = _normalize(r1)
    r2 = _mul(v1)
    v2 = _normalize(r2)
    r3 = _mul(v2)
    v3 = _normalize(r3)
    lam = (
        v2.join(r3, "i")
        .agg(
            F.sum(F.col("v") * F.col("r")).alias("num"),
            F.sum(F.col("v") * F.col("v")).alias("den"),
        )
        .select(
            F.floor(
                F.lit(1000.0) * F.col("num").cast("double")
                / F.col("den").cast("double")
            ).cast("bigint").alias("lambda_milli")
        )
    )
    return (
        v3.join(r3, "i")
        .crossJoin(F.broadcast(lam))
        .select(
            F.col("i").cast("bigint").alias("component"),
            F.col("v").cast("bigint").alias("unit_1024"),
            F.col("r").cast("bigint").alias("raw_score"),
            "lambda_milli",
        )
        .orderBy("component")
    )


ORACLE_Q285 = """
WITH q AS (
  SELECT list_transform(embedding::DOUBLE[],
                        x -> CAST(round(x * 128) AS BIGINT)) AS qv
  FROM embeddings
),
cells AS (
  SELECT i.range AS i, j.range AS j,
         sum(qv[CAST(i.range AS INT)] * qv[CAST(j.range AS INT)]) AS a
  FROM q, range(1, 65) i, range(1, 65) j
  GROUP BY 1, 2
),
r1 AS (SELECT i, sum(a) AS r FROM cells GROUP BY i),
v1 AS (
  SELECT i, (CASE WHEN r >= 0 THEN 1 ELSE -1 END)
            * ((abs(r) * 1024) // (SELECT max(abs(r)) FROM r1)) AS v
  FROM r1
),
r2 AS (
  SELECT c.i, sum(c.a * v.v) AS r
  FROM cells c JOIN v1 v ON c.j = v.i GROUP BY c.i
),
v2 AS (
  SELECT i, (CASE WHEN r >= 0 THEN 1 ELSE -1 END)
            * ((abs(r) * 1024) // (SELECT max(abs(r)) FROM r2)) AS v
  FROM r2
),
r3 AS (
  SELECT c.i, sum(c.a * v.v) AS r
  FROM cells c JOIN v2 v ON c.j = v.i GROUP BY c.i
),
v3 AS (
  SELECT i, (CASE WHEN r >= 0 THEN 1 ELSE -1 END)
            * ((abs(r) * 1024) // (SELECT max(abs(r)) FROM r3)) AS v
  FROM r3
),
lam AS (
  SELECT CAST(floor(1000.0 * CAST(sum(v2.v * r3.r) AS DOUBLE)
                    / CAST(sum(v2.v * v2.v) AS DOUBLE)) AS BIGINT)
           AS lambda_milli
  FROM v2 JOIN r3 USING (i)
)
SELECT CAST(v3.i AS BIGINT) AS component,
       CAST(v3.v AS BIGINT) AS unit_1024,
       CAST(r3.r AS BIGINT) AS raw_score,
       lam.lambda_milli
FROM v3 JOIN r3 USING (i), lam
ORDER BY component
"""


# q286: Simpson's-paradox mix-shift audit

def q286_simpsons_audit(spark, sf_dir):
    """Simpson's-paradox audit of the purchase-conversion comparison
    between two user cohorts (user_id parity): the overall rate
    comparison CAN reverse inside hour-of-day strata when cohort
    traffic mix differs by hour — the classic aggregation trap an A/B
    readout must check before shipping a conclusion.  All directions
    are CROSS-MULTIPLIED integer comparisons (s_a*n_b vs s_b*n_a) —
    no rate is ever a float — and ppm rates are exact integer floor
    divisions for reporting only.  Emits every stratum with its
    cohort cells, both directions, and a `reversed` flag (strict sign
    opposition), so the result is non-vacuous regardless of whether
    the paradox fires in a given corpus.  Distinct from q282 (Wilson
    small-sample ranking) and q78 (distribution drift): this audits
    the STRATIFICATION structure of a comparison, not its sampling
    error or its marginals.

    Scale shape: ONE (cohort, hour) map-side-combinable aggregate over
    the fact scan; the 48-cell relation then pivots via a conditional
    re-aggregate and broadcasts against the 1-row overall direction.
    Output is stratum-bounded (24 rows)."""
    ev = _t(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "purchase")
    )
    cells = ev.groupBy(
        (F.col("user_id") % 2).alias("cohort"),
        F.hour("ts").alias("stratum"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("s"),
    )
    strata = cells.groupBy("stratum").agg(
        F.sum(F.when(F.col("cohort") == 0, F.col("n")).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("cohort") == 0, F.col("s")).otherwise(0)).alias("s_a"),
        F.sum(F.when(F.col("cohort") == 1, F.col("n")).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("cohort") == 1, F.col("s")).otherwise(0)).alias("s_b"),
    )
    overall = strata.agg(
        F.sum("n_a").alias("t_n_a"),
        F.sum("s_a").alias("t_s_a"),
        F.sum("n_b").alias("t_n_b"),
        F.sum("s_b").alias("t_s_b"),
    ).select(
        F.signum(
            (F.col("t_s_a") * F.col("t_n_b") - F.col("t_s_b") * F.col("t_n_a"))
            .cast("double")
        ).cast("bigint").alias("overall_dir")
    )
    return (
        strata.crossJoin(F.broadcast(overall))
        .select(
            F.col("stratum").cast("bigint").alias("stratum"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("s_a").cast("bigint").alias("s_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.col("s_b").cast("bigint").alias("s_b"),
            F.expr("s_a * 1000000 div n_a").cast("bigint").alias("rate_a_ppm"),
            F.expr("s_b * 1000000 div n_b").cast("bigint").alias("rate_b_ppm"),
            "overall_dir",
            F.signum(
                (F.col("s_a") * F.col("n_b") - F.col("s_b") * F.col("n_a"))
                .cast("double")
            ).cast("bigint").alias("stratum_dir"),
        )
        .withColumn(
            "reversed",
            (F.col("stratum_dir") * F.col("overall_dir") == -1).cast("int"),
        )
        .orderBy("stratum")
    )


ORACLE_Q286 = """
WITH cells AS (
  SELECT user_id % 2 AS cohort,
         CAST(extract(hour FROM ts) AS BIGINT) AS stratum,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS s
  FROM events
  WHERE event_type IN ('view', 'purchase')
  GROUP BY 1, 2
),
strata AS (
  SELECT stratum,
         sum(CASE WHEN cohort = 0 THEN n ELSE 0 END) AS n_a,
         sum(CASE WHEN cohort = 0 THEN s ELSE 0 END) AS s_a,
         sum(CASE WHEN cohort = 1 THEN n ELSE 0 END) AS n_b,
         sum(CASE WHEN cohort = 1 THEN s ELSE 0 END) AS s_b
  FROM cells GROUP BY stratum
),
overall AS (
  SELECT CAST(sign(sum(s_a) * sum(n_b) - sum(s_b) * sum(n_a)) AS BIGINT)
           AS overall_dir
  FROM strata
)
SELECT CAST(stratum AS BIGINT) AS stratum,
       CAST(n_a AS BIGINT) AS n_a,
       CAST(s_a AS BIGINT) AS s_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(s_b AS BIGINT) AS s_b,
       CAST(s_a * 1000000 // n_a AS BIGINT) AS rate_a_ppm,
       CAST(s_b * 1000000 // n_b AS BIGINT) AS rate_b_ppm,
       overall_dir,
       CAST(sign(s_a * n_b - s_b * n_a) AS BIGINT) AS stratum_dir,
       CAST(CASE WHEN CAST(sign(s_a * n_b - s_b * n_a) AS BIGINT)
                      * overall_dir = -1
            THEN 1 ELSE 0 END AS INT) AS reversed
FROM strata, overall
ORDER BY stratum
"""


# q287: per-type value-trend R^2 admission gate

def q287_trend_r2_gate(spark, sf_dir):
    """Linear-trend STRENGTH gate per event type: the OLS R^2 of
    value (exact cents) against event time (epoch seconds, fixed-
    origin-shifted) — the model-admission check a metrics pipeline
    runs before it is allowed to extrapolate a trend (q245 FORECASTS
    with OLS; this decides whether the fit explains anything at all).
    The six moments (n, Sx, Sy, Sxx, Syy, Sxy) accumulate as exact
    DECIMAL(38,0) integers; R^2 = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)
    * (n*Syy - Sy^2)) is then evaluated in float64 from those exact
    moments (num^2 can exceed 38 digits, so each factor converts to
    double FIRST — decimal->double is correctly rounded in both
    engines, and *, /, floor are IEEE-identical: the q256 discipline).
    Slope direction is the exact integer sign of the covariance
    numerator, never a float.

    Scale shape: ONE map-side-combinable (event_type) aggregate over
    the fact scan — six sums, no window, no join; the R^2 arithmetic
    runs on the #types-row relation.  The fixed epoch origin
    (2024-01-01) keeps Sxx small without a data-dependent pre-pass."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_timestamp(ts) - 1704067200").alias("x"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("y"),
    )
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("sy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(38,0)") * F.col("y")).alias("syy"),
        F.sum(F.col("x").cast("decimal(38,0)") * F.col("y")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den1 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den2 = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    r2 = (
        num.cast("double") * num.cast("double")
        / (den1.cast("double") * den2.cast("double"))
    )
    return (
        m.select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.signum(num.cast("double")).cast("bigint").alias("slope_dir"),
            F.floor(r2 * F.lit(1000000.0)).cast("bigint").alias("r2_ppm"),
        )
        .withColumn("admitted", (F.col("r2_ppm") >= 10000).cast("int"))
        .orderBy("event_type")
    )


ORACLE_Q287 = """
WITH base AS (
  SELECT event_type,
         CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS x,
         CAST(round(value * 100) AS BIGINT) AS y
  FROM events
),
m AS (
  SELECT event_type,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
         CAST(sum(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * x) AS DECIMAL(38,0)) AS sxx,
         CAST(sum(CAST(y AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS syy,
         CAST(sum(CAST(x AS DECIMAL(38,0)) * y) AS DECIMAL(38,0)) AS sxy
  FROM base GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n,
       CAST(sign(CAST(n * sxy - sx * sy AS DOUBLE)) AS BIGINT) AS slope_dir,
       CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
                  * CAST(n * sxy - sx * sy AS DOUBLE)
                  / (CAST(n * sxx - sx * sx AS DOUBLE)
                     * CAST(n * syy - sy * sy AS DOUBLE))
                  * 1000000.0) AS BIGINT) AS r2_ppm,
       CAST(CASE WHEN floor(CAST(n * sxy - sx * sy AS DOUBLE)
                            * CAST(n * sxy - sx * sy AS DOUBLE)
                            / (CAST(n * sxx - sx * sx AS DOUBLE)
                               * CAST(n * syy - sy * sy AS DOUBLE))
                            * 1000000.0) >= 10000
            THEN 1 ELSE 0 END AS INT) AS admitted
FROM m
ORDER BY event_type
"""


# q288: one-way ANOVA F gate across event types

def q288_anova_gate(spark, sf_dir):
    """One-way ANOVA over the five event types' value distributions
    (exact cents): the F statistic and the eta-squared effect size —
    the k-group generalization of q255/q261's two-sample tests, and
    the metric-review gate that decides whether "event type explains
    spend" before anyone ships per-type budgets.  The fifteen moments
    (n, S, SS per type) are EXACT integers off ONE conditional
    aggregate; because S_g^2 overflows int64, the between/within sums
    of squares are assembled in float64 — with the five per-group
    terms pivoted into ONE row and summed under EXPLICIT
    parenthesization ((((t_click+t_error)+t_purchase)+t_signup)+
    t_view), so the float fold order is pinned and both engines
    produce identical bits (the q256 discipline extended to a k-term
    sum; a groupBy-then-SUM of float terms would be order-
    nondeterministic).  The five types are a closed set in this corpus
    (pytest-asserted), so the pivot is total.

    Scale shape: ONE map-side-combinable aggregate over the fact scan
    produces the single 15-column row; everything after is scalar
    arithmetic.  No window, no join, no second scan."""
    ev = _t(spark, sf_dir, "events")
    cents = F.expr("CAST(round(value * 100) AS BIGINT)")
    types = ["click", "error", "purchase", "signup", "view"]
    aggs = []
    for t in types:
        cond = F.col("event_type") == t
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n_{t}"),
            F.sum(F.when(cond, cents).otherwise(0)).cast("bigint").alias(f"s_{t}"),
            F.sum(F.when(cond, cents * cents).otherwise(0))
            .cast("bigint")
            .alias(f"ss_{t}"),
        ]
    m = ev.agg(*aggs)
    term = lambda t: (  # noqa: E731
        f"(CAST(s_{t} AS DOUBLE) * CAST(s_{t} AS DOUBLE) / CAST(n_{t} AS DOUBLE))"
    )
    terms = f"(((({term('click')} + {term('error')}) + {term('purchase')}) + {term('signup')}) + {term('view')})"
    n_tot = " + ".join(f"n_{t}" for t in types)
    s_tot = " + ".join(f"s_{t}" for t in types)
    ss_tot = " + ".join(f"ss_{t}" for t in types)
    ssb = (
        f"({terms} - CAST({s_tot} AS DOUBLE) * CAST({s_tot} AS DOUBLE)"
        f" / CAST({n_tot} AS DOUBLE))"
    )
    ssw = f"(CAST({ss_tot} AS DOUBLE) - {terms})"
    return m.select(
        F.expr(n_tot).cast("bigint").alias("n_total"),
        F.expr(f"CAST(floor(1000.0 * {ssb} * CAST(({n_tot}) - 5 AS DOUBLE)"
               f" / ({ssw} * 4.0)) AS BIGINT)").alias("f_milli"),
        F.expr(f"CAST(floor(1000000.0 * {ssb} / ({ssb} + {ssw})) AS BIGINT)")
        .alias("eta2_ppm"),
        F.expr(f"({s_tot}) div ({n_tot})").cast("bigint").alias("grand_mean_cents"),
    )


def _oracle_q288():
    types = ["click", "error", "purchase", "signup", "view"]
    cols = ", ".join(
        f"""sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS n_{t},
         sum(CASE WHEN event_type = '{t}' THEN c ELSE 0 END) AS s_{t},
         sum(CASE WHEN event_type = '{t}' THEN c * c ELSE 0 END) AS ss_{t}"""
        for t in types
    )
    term = lambda t: (  # noqa: E731
        f"(CAST(s_{t} AS DOUBLE) * CAST(s_{t} AS DOUBLE) / CAST(n_{t} AS DOUBLE))"
    )
    terms = f"(((({term('click')} + {term('error')}) + {term('purchase')}) + {term('signup')}) + {term('view')})"
    n_tot = " + ".join(f"n_{t}" for t in types)
    s_tot = " + ".join(f"s_{t}" for t in types)
    ss_tot = " + ".join(f"ss_{t}" for t in types)
    ssb = (
        f"({terms} - CAST({s_tot} AS DOUBLE) * CAST({s_tot} AS DOUBLE)"
        f" / CAST({n_tot} AS DOUBLE))"
    )
    ssw = f"(CAST({ss_tot} AS DOUBLE) - {terms})"
    return f"""
WITH base AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS c FROM events
),
m AS (SELECT {cols} FROM base)
SELECT CAST({n_tot} AS BIGINT) AS n_total,
       CAST(floor(1000.0 * {ssb} * CAST(({n_tot}) - 5 AS DOUBLE)
                  / ({ssw} * 4.0)) AS BIGINT) AS f_milli,
       CAST(floor(1000000.0 * {ssb} / ({ssb} + {ssw})) AS BIGINT) AS eta2_ppm,
       CAST(({s_tot}) // ({n_tot}) AS BIGINT) AS grand_mean_cents
FROM m
"""


# q289: bipartite k-core peeling over the doc-token graph

def q289_bipartite_kcore(spark, sf_dir):
    """Three synchronous rounds of bipartite k-core peeling (k=3) over
    the document-TRIGRAM graph restricted to the mid-frequency band
    (3 <= df <= 20): iteratively discard documents touching fewer than
    3 surviving band trigrams and trigrams surviving in fewer than 3
    documents — the dense-community extraction that topic-coherence
    and template-mining pipelines run (a phrase that survives the core
    is SHARED STRUCTURE, not incidental).  Trigrams, not unigrams: the
    corpus's unigram vocabulary is tiny and saturated (every token's
    df is huge), so the unigram graph has no mid-frequency band — the
    trigram space is combinatorial and the band is populated at every
    SF.  Each round is SYNCHRONOUS: round r keeps exactly the
    endpoints whose degree in the round r-1 edge set is >= 3, so the
    result is deterministic and engine-independent (asynchronous
    peeling is order-dependent).  Emits the (docs, grams, edges)
    census after rounds 0..3 — the convergence profile IS the output,
    well-defined whether or not the core has stabilized by round 3
    (q285's fixed-step discipline).

    Scale shape: the df band filter bounds the edge relation before
    any iteration (mid-frequency phrases x small df cap); each
    round is two bounded-key degree aggregates + two semi joins on
    fixed-width keys, localCheckpoint'ed so round r+1 never replays
    round r's lineage.  Iteration count is FIXED (3), not data-driven
    — no driver-side convergence loop."""
    docs = _t_wide(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tok0 = docs.select("doc_id", F.explode(grams).alias("tok")).distinct()
    band = (
        tok0.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .where((F.col("df") >= 3) & (F.col("df") <= 20))
        .select("tok")
    )
    edges = tok0.join(band, "tok").localCheckpoint(eager=True)

    def census(e, r):
        return e.agg(
            F.lit(r).cast("bigint").alias("round"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.countDistinct("tok").cast("bigint").alias("n_tokens"),
            F.count(F.lit(1)).cast("bigint").alias("n_edges"),
        )

    out = census(edges, 0)
    for r in (1, 2, 3):
        keep_d = (
            edges.groupBy("doc_id").agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= 3).select("doc_id")
        )
        keep_t = (
            edges.groupBy("tok").agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= 3).select("tok")
        )
        edges = (
            edges.join(keep_d, "doc_id", "left_semi")
            .join(keep_t, "tok", "left_semi")
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(census(edges, r))
    return out.orderBy("round")


ORACLE_Q289 = """
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
tok0 AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                  i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS tok
    FROM toks WHERE len(ts) >= 3
  )
),
band AS (
  SELECT tok FROM tok0 GROUP BY tok
  HAVING count(*) BETWEEN 3 AND 20
),
e0 AS (SELECT t.doc_id, t.tok FROM tok0 t JOIN band USING (tok)),
d1 AS (SELECT doc_id FROM e0 GROUP BY 1 HAVING count(*) >= 3),
t1 AS (SELECT tok FROM e0 GROUP BY 1 HAVING count(*) >= 3),
e1 AS (SELECT e0.doc_id, e0.tok FROM e0
       JOIN d1 USING (doc_id) JOIN t1 USING (tok)),
d2 AS (SELECT doc_id FROM e1 GROUP BY 1 HAVING count(*) >= 3),
t2 AS (SELECT tok FROM e1 GROUP BY 1 HAVING count(*) >= 3),
e2 AS (SELECT e1.doc_id, e1.tok FROM e1
       JOIN d2 USING (doc_id) JOIN t2 USING (tok)),
d3 AS (SELECT doc_id FROM e2 GROUP BY 1 HAVING count(*) >= 3),
t3 AS (SELECT tok FROM e2 GROUP BY 1 HAVING count(*) >= 3),
e3 AS (SELECT e2.doc_id, e2.tok FROM e2
       JOIN d3 USING (doc_id) JOIN t3 USING (tok))
SELECT * FROM (
  SELECT CAST(0 AS BIGINT) AS round,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT tok) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_edges FROM e0
  UNION ALL
  SELECT 1, count(DISTINCT doc_id), count(DISTINCT tok), count(*) FROM e1
  UNION ALL
  SELECT 2, count(DISTINCT doc_id), count(DISTINCT tok), count(*) FROM e2
  UNION ALL
  SELECT 3, count(DISTINCT doc_id), count(DISTINCT tok), count(*) FROM e3
) ORDER BY round
"""


# q290: in-domain data selection (Moore-Lewis shape, integer-linearized)

def q290_indomain_selection(spark, sf_dir):
    """In-domain training-data selection in the Moore-Lewis shape:
    rank every document by how much its unigram distribution resembles
    the in-domain corpus (lang='en') versus the general corpus.  Each
    token carries a LINEARIZED likelihood ratio in exact integer
    x1000 units — w = (c_in+1)(N_gen+V)*1000 div ((c_gen+1)(N_in+V)),
    add-one smoothed on both sides — and a document scores the
    length-normalized sum of (w - 1000) over its token occurrences.
    Near w ~= 1000 this is the first-order expansion of the
    cross-entropy difference Moore-Lewis thresholds on; unlike the
    log form it is EXACTLY reproducible cross-engine (ln() is not
    correctly rounded in either engine's libm, so a log-based score
    could flip orderings at the last ulp).  Distinct from q151 (binary
    bigram hit-rate) and q61 (distinctive terms): this scores every
    doc against a DOMAIN, the data-selection step that builds a
    domain-adapted training mix.  Top-25 under a pinned total order.

    Scale shape: ONE (lang-tagged) token count shuffle builds both
    LMs; the weight table is vocabulary-scale and joins the per-doc
    token counts on the fixed-width token key; per-doc folds are one
    map-side-combinable aggregate.  Headroom: the x1000 product stays
    under 2^63 past 10^9-token corpora; beyond that, drop the scale
    factor or lift to DECIMAL(38,0)."""
    docs = _t_wide(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    per_doc = toks.groupBy("doc_id", "lang", "tok").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gen = per_doc.groupBy("tok").agg(F.sum("cnt").alias("c_gen"))
    ind = (
        per_doc.where(F.col("lang") == "en")
        .groupBy("tok")
        .agg(F.sum("cnt").alias("c_in"))
    )
    lm = gen.join(ind, "tok", "left").na.fill({"c_in": 0})
    tot = lm.agg(
        F.sum("c_gen").alias("n_gen"),
        F.sum("c_in").alias("n_in"),
        F.count(F.lit(1)).alias("v"),
    )
    w = lm.crossJoin(F.broadcast(tot)).select(
        "tok",
        F.expr(
            "(c_in + 1) * (n_gen + v) * 1000 div ((c_gen + 1) * (n_in + v))"
        ).alias("w_x1000"),
    )
    scored = (
        per_doc.join(w, "tok")
        .groupBy("doc_id", "lang")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_tokens"),
            F.sum(F.col("cnt") * (F.col("w_x1000") - 1000)).alias("raw"),
        )
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.expr(
                "(CASE WHEN raw >= 0 THEN 1 ELSE -1 END)"
                " * (abs(raw) div n_tokens)"
            ).cast("bigint").alias("score_x1000"),
        )
    )
    return scored.orderBy(F.desc("score_x1000"), "doc_id").limit(25)


ORACLE_Q290 = """
WITH toks AS (
  SELECT doc_id, lang, tok FROM (
    SELECT doc_id, lang,
           unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
per_doc AS (
  SELECT doc_id, lang, tok, count(*) AS cnt FROM toks GROUP BY 1, 2, 3
),
lm AS (
  SELECT tok, sum(cnt) AS c_gen,
         sum(CASE WHEN lang = 'en' THEN cnt ELSE 0 END) AS c_in
  FROM per_doc GROUP BY tok
),
tot AS (
  SELECT sum(c_gen) AS n_gen, sum(c_in) AS n_in, count(*) AS v FROM lm
),
w AS (
  SELECT tok,
         (c_in + 1) * (n_gen + v) * 1000 // ((c_gen + 1) * (n_in + v))
           AS w_x1000
  FROM lm, tot
),
scored AS (
  SELECT p.doc_id, p.lang,
         sum(p.cnt) AS n_tokens,
         sum(p.cnt * (w.w_x1000 - 1000)) AS raw
  FROM per_doc p JOIN w USING (tok)
  GROUP BY 1, 2
)
SELECT doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST((CASE WHEN raw >= 0 THEN 1 ELSE -1 END)
            * (abs(raw) // n_tokens) AS BIGINT) AS score_x1000
FROM scored
ORDER BY score_x1000 DESC, doc_id
LIMIT 25
"""


# q291: lead-lag cross-correlation of two event series

def q291_leadlag_xcorr(spark, sf_dir):
    """Cross-correlation between the HOURLY error-count series and the
    hourly purchase-count series at calendar lags -6..+6 — the lead-lag
    probe an SRE runs to answer "do error bursts LEAD purchase drops,
    or trail them?" (q259 is the self-ACF of one series; this
    correlates TWO series and the lag SIGN is the finding).  Integer-
    exact numerators via the n-scaling trick: with n hours, Sx, Sy the
    series sums, num_k = sum over calendar-lag-k pairs of
    (n*x_t - Sx)(n*y_{t+k} - Sy) is an exact BIGINT; the normalizer
    sqrt(den_x*den_y) is one IEEE-correctly-rounded sqrt, so
    ccf_ppm = floor(1e6 * num_k / sqrt(den_x*den_y)) reproduces
    bit-for-bit cross-engine.  Pairs are matched by CALENDAR hour
    (epoch-hour arithmetic join), not row offset, so silent gaps in
    either series never shift the alignment.  n_pairs is emitted per
    lag so partial-overlap lags are visibly thinner.

    Scale shape: the fact table collapses to one <=10^4-row hourly
    series in ONE conditional map-side-combinable shuffle; the 13-lag
    pair join, moment folds and divisions all run at series scale —
    aggregate first, correlate the aggregate."""
    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.where(F.col("event_type").isin("error", "purchase"))
        .groupBy(
            (F.unix_timestamp("ts") - (F.unix_timestamp("ts") % 3600))
            .cast("bigint")
            .alias("h")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    mom = hourly.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    lags = spark.range(-6, 7).select(F.col("id").cast("bigint").alias("lag"))
    pairs = (
        hourly.alias("a")
        .join(lags)
        .join(
            hourly.alias("b"),
            F.col("b.h") == F.col("a.h") + F.col("lag") * 3600,
        )
        .crossJoin(F.broadcast(mom))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(
                (F.col("n") * F.col("a.x") - F.col("sx"))
                * (F.col("n") * F.col("b.y") - F.col("sy"))
            ).cast("bigint").alias("num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(mom))
        .select(
            "lag",
            "n_pairs",
            "num",
            F.expr(
                "CAST(floor(1e6 * CAST(num AS DOUBLE) / sqrt("
                "CAST(n * sxx - sx * sx AS DOUBLE)"
                " * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT)"
            ).alias("ccf_ppm"),
        )
        .orderBy("lag")
    )


ORACLE_Q291 = """
WITH hourly AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT)
          - CAST(floor(epoch(ts)) AS BIGINT) % 3600) AS h,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS x,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events WHERE event_type IN ('error', 'purchase') GROUP BY 1
),
mom AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM hourly
),
lags AS (SELECT unnest(range(-6, 7)) AS lag),
pairs AS (
  SELECT lag,
         CAST(count(*) AS BIGINT) AS n_pairs,
         CAST(sum((n * a.x - sx) * (n * b.y - sy)) AS BIGINT) AS num
  FROM hourly a, lags, mom
  JOIN hourly b ON b.h = a.h + lag * 3600
  GROUP BY lag
)
SELECT CAST(lag AS BIGINT) AS lag, n_pairs, num,
       CAST(floor(1e6 * CAST(num AS DOUBLE) / sqrt(
            CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(n * syy - sy * sy AS DOUBLE))) AS BIGINT) AS ccf_ppm
FROM pairs, mom
ORDER BY lag
"""


# q292: delete-one-bucket jackknife SE for a ratio metric

def q292_jackknife_ratio(spark, sf_dir):
    """Delete-one-bucket jackknife standard error for the corpus error
    RATE (errors/events) over B=8 fixed user buckets — the resampling
    uncertainty machinery an experimentation platform runs when the
    metric is a RATIO (a per-row variance formula is wrong for ratios;
    the delta method needs derivatives; the jackknife needs neither).
    The 16 per-bucket moments (n_i, e_i) are exact BIGINTs off ONE
    conditional aggregate; each leave-one-out estimate
    theta_(i) = (E - e_i)/(N - n_i) and the variance
    (B-1)/B * sum_i (theta_(i) - theta_bar)^2 are assembled in float64
    with the 8-term sums EXPLICITLY parenthesized left-to-right in
    bucket order (the q288 pinned-fold discipline), so both engines
    produce identical bits.  Buckets are user_id % 8 (8, not 16: the smallest test corpus has only 15 distinct users, and an EMPTY bucket would degenerate its leave-out estimate to the full-sample ratio) — deterministic,
    layout-independent, and the unit of independence (users, not
    events — event-level jackknife would understate clustered
    variance).

    Scale shape: ONE map-side-combinable aggregate produces the single
    16-column moment row; everything after is scalar float arithmetic
    on the driver plan, zero further shuffles."""
    ev = _t(spark, sf_dir, "events")
    b = 8
    aggs = []
    for i in range(b):
        cond = F.col("user_id") % b == i
        aggs += [
            F.sum(F.when(cond, 1).otherwise(0)).cast("bigint").alias(f"n_{i}"),
            F.sum(
                F.when(cond & (F.col("event_type") == "error"), 1).otherwise(0)
            ).cast("bigint").alias(f"e_{i}"),
        ]
    m = ev.agg(*aggs)
    n_tot = " + ".join(f"n_{i}" for i in range(b))
    e_tot = " + ".join(f"e_{i}" for i in range(b))
    theta = lambda i: (  # noqa: E731
        f"(CAST(({e_tot}) - e_{i} AS DOUBLE) / CAST(({n_tot}) - n_{i} AS DOUBLE))"
    )
    tsum = theta(0)
    for i in range(1, b):
        tsum = f"({tsum} + {theta(i)})"
    tbar = f"({tsum} / 8.0)"
    sq = lambda i: f"(({theta(i)} - {tbar}) * ({theta(i)} - {tbar}))"  # noqa: E731
    ssq = sq(0)
    for i in range(1, b):
        ssq = f"({ssq} + {sq(i)})"
    return m.select(
        F.expr(n_tot).cast("bigint").alias("n_events"),
        F.expr(e_tot).cast("bigint").alias("n_errors"),
        F.expr(f"(({e_tot}) * 1000000) div ({n_tot})")
        .cast("bigint")
        .alias("theta_ppm"),
        F.expr(
            f"CAST(floor(1e6 * sqrt((7.0 / 8.0) * {ssq})) AS BIGINT)"
        ).alias("jk_se_ppm"),
    )


def _oracle_q292():
    b = 8
    cols = ", ".join(
        f"""sum(CASE WHEN user_id % {b} = {i} THEN 1 ELSE 0 END) AS n_{i},
         sum(CASE WHEN user_id % {b} = {i} AND event_type = 'error'
                  THEN 1 ELSE 0 END) AS e_{i}"""
        for i in range(b)
    )
    n_tot = " + ".join(f"n_{i}" for i in range(b))
    e_tot = " + ".join(f"e_{i}" for i in range(b))
    theta = lambda i: (  # noqa: E731
        f"(CAST(({e_tot}) - e_{i} AS DOUBLE) / CAST(({n_tot}) - n_{i} AS DOUBLE))"
    )
    tsum = theta(0)
    for i in range(1, b):
        tsum = f"({tsum} + {theta(i)})"
    tbar = f"({tsum} / 8.0)"
    sq = lambda i: f"(({theta(i)} - {tbar}) * ({theta(i)} - {tbar}))"  # noqa: E731
    ssq = sq(0)
    for i in range(1, b):
        ssq = f"({ssq} + {sq(i)})"
    return f"""
WITH m AS (SELECT {cols} FROM events)
SELECT CAST({n_tot} AS BIGINT) AS n_events,
       CAST({e_tot} AS BIGINT) AS n_errors,
       CAST((({e_tot}) * 1000000) // ({n_tot}) AS BIGINT) AS theta_ppm,
       CAST(floor(1e6 * sqrt((7.0 / 8.0) * {ssq})) AS BIGINT) AS jk_se_ppm
FROM m
"""


# q293: total-variation drift of per-source token distributions

def q293_source_tv_drift(spark, sf_dir):
    """Total-variation distance between each source's unigram
    distribution and the corpus-wide distribution — the drift gate a
    corpus curator runs before admitting a new feed into the training
    mix (TV is the STRICTEST f-divergence bound: it directly bounds
    how much any downstream expectation can shift).  Exact integer
    numerator: TV(s) = sum_t |c_st * N - C_t * N_s| over 2*N_s*N, so
    tv_ppm = (1e6 * num) div (2*N_s*N) touches no floats at all —
    unlike chi-square (q167, which weights by 1/expected) or
    inverse-Simpson (q281, which profiles ONE distribution), TV
    compares each source against the pooled reference with a metric
    that is exactly representable.  Also emits each source's
    share-weighted contribution so a tiny exotic feed cannot dominate
    the alert.  Headroom: c*N stays under 2^63 to ~10^9-token corpora
    per source x 10^9 pooled; past that lift the products to
    DECIMAL(38,0).

    Scale shape: ONE (source, token) count shuffle; global token
    counts REAGGREGATE the cells (hierarchical rollup — one corpus
    scan); the |...| fold joins the vocabulary-scale cell table to the
    vocabulary-scale reference on the fixed-width token key."""
    docs = _t_wide(spark, sf_dir, "documents")
    toks = docs.select(
        "source",
        F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    cells = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    ref = cells.groupBy("tok").agg(F.sum("c").alias("ct"))
    per_src = cells.groupBy("source").agg(F.sum("c").alias("ns"))
    tot = per_src.agg(F.sum("ns").alias("n"))
    # a token absent from a source still contributes C_t * N_s to the
    # numerator: fold the present-token part, then add the missing mass
    # (N - sum of present C_t) * N_s.
    present = (
        cells.join(ref, "tok")
        .join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tot))
        .groupBy("source")
        .agg(
            F.sum(
                F.abs(F.col("c") * F.col("n") - F.col("ct") * F.col("ns"))
            ).cast("bigint").alias("num_present"),
            F.sum(F.col("ct")).cast("bigint").alias("ct_present"),
        )
    )
    return (
        present.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("ns").cast("bigint").alias("n_tokens"),
            F.expr(
                "(1000000 * (num_present + (n - ct_present) * ns))"
                " div (2 * ns * n)"
            ).cast("bigint").alias("tv_ppm"),
            F.expr(
                "((1000000 * (num_present + (n - ct_present) * ns))"
                " div (2 * ns * n) * ns) div n"
            ).cast("bigint").alias("weighted_tv_ppm"),
        )
        .orderBy(F.desc("tv_ppm"), "source")
    )


ORACLE_Q293 = """
WITH toks AS (
  SELECT source, tok FROM (
    SELECT source, unnest(string_split_regex(lower(text), '\\s+')) AS tok
    FROM documents
  ) WHERE tok <> ''
),
cells AS (SELECT source, tok, count(*) AS c FROM toks GROUP BY 1, 2),
ref AS (SELECT tok, sum(c) AS ct FROM cells GROUP BY tok),
per_src AS (SELECT source, sum(c) AS ns FROM cells GROUP BY source),
tot AS (SELECT sum(ns) AS n FROM per_src),
present AS (
  SELECT cells.source,
         CAST(sum(abs(c * n - ct * ns)) AS BIGINT) AS num_present,
         CAST(sum(ct) AS BIGINT) AS ct_present
  FROM cells
  JOIN ref USING (tok) JOIN per_src USING (source), tot
  GROUP BY cells.source
)
SELECT source,
       CAST(ns AS BIGINT) AS n_tokens,
       CAST((1000000 * (num_present + (n - ct_present) * ns))
            // (2 * ns * n) AS BIGINT) AS tv_ppm,
       CAST(((1000000 * (num_present + (n - ct_present) * ns))
            // (2 * ns * n) * ns) // n AS BIGINT) AS weighted_tv_ppm
FROM present JOIN per_src USING (source), tot
ORDER BY tv_ppm DESC, source
"""


# q294: capture-recapture population estimate (Chapman)

def q294_capture_recapture(spark, sf_dir):
    """Capture-recapture estimate of the TOTAL user population from
    two observation windows — the coverage question a crawl operator
    asks ("how many users/hosts exist that we have NOT yet seen?"),
    answered with the Lincoln-Petersen/Chapman estimator ecology uses
    for animal counts.  Capture 1 = users active before the timeline
    midpoint, capture 2 = after; the overlap m is the recapture.
    Chapman's (n1+1)(n2+1) div (m+1) - 1 is bias-corrected and never
    divides by zero; both estimators and the recapture-coverage ratio
    are EXACT integer arithmetic (no floats anywhere).  The midpoint
    is (min+max) div 2 epoch-seconds — a pure function of the data,
    no wall clock.

    Scale shape: one min/max agg (map-side), one per-user
    flag-OR aggregate, one final fold — two linear shuffles on the
    fact table, output is a single row."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        ((F.min(F.unix_timestamp("ts")) + F.max(F.unix_timestamp("ts")))
         / F.lit(2)).cast("bigint").alias("mid")
    )
    per_user = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.unix_timestamp("ts") < F.col("mid"), 1).otherwise(0)
            ).alias("c1"),
            F.max(
                F.when(F.unix_timestamp("ts") >= F.col("mid"), 1).otherwise(0)
            ).alias("c2"),
        )
    )
    m = per_user.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("seen"),
    )
    return m.select(
        "n1",
        "n2",
        "m",
        "seen",
        F.expr("(n1 * n2) div m").cast("bigint").alias("lincoln_petersen"),
        F.expr("((n1 + 1) * (n2 + 1)) div (m + 1) - 1")
        .cast("bigint")
        .alias("chapman"),
        F.expr("(m * 1000000) div n2").cast("bigint").alias("recapture_ppm"),
    )


ORACLE_Q294 = """
WITH b AS (
  SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
          + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
  FROM events
),
per_user AS (
  SELECT user_id,
         max(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) < mid
                  THEN 1 ELSE 0 END) AS c1,
         max(CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) >= mid
                  THEN 1 ELSE 0 END) AS c2
  FROM events, b GROUP BY user_id
),
m AS (
  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
         CAST(sum(c1 * c2) AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS seen
  FROM per_user
)
SELECT n1, n2, m, seen,
       CAST((n1 * n2) // m AS BIGINT) AS lincoln_petersen,
       CAST(((n1 + 1) * (n2 + 1)) // (m + 1) - 1 AS BIGINT) AS chapman,
       CAST((m * 1000000) // n2 AS BIGINT) AS recapture_ppm
FROM m
"""


# q295: Cochran-Armitage trend test (activity deciles -> conversion)

def q295_cochran_armitage(spark, sf_dir):
    """Cochran-Armitage test for TREND in conversion across ordered
    activity deciles — the dose-response question behind "does more
    engagement cause more purchases?", which a chi-square (q167) is
    blind to because it ignores the ORDERING of the exposure levels.
    Users are ranked into 10 deciles by event count under a pinned
    total order (count, user_id) via ntile — both engines define ntile
    identically (earlier buckets absorb remainders).  With scores
    s_i = i-1, responders r_i, sizes n_i, totals R, N: the N-scaled
    statistic T = N*Σs_i*r_i − R*Σs_i*n_i and the N²-scaled variance
    V = R(N−R)(N*Σn_i*s_i² − (Σs_i*n_i)²) are EXACT BIGINTs off the
    10-row decile table; z² = N·T²/V in milli-units via one pinned
    float64 expression (N·T² overflows int64 at scale — converted
    factor-by-factor to double FIRST, the q287 discipline).  The trend
    SIGN is exact-integer from T alone.

    Scale shape: one per-user agg, one 10-bucket window rank at
    user-table scale, one 10-row moment fold — nothing after the first
    shuffle touches the fact table again."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("value") >= 95.0),
                1,
            ).otherwise(0)
        ).alias("resp"),
    )
    w = Window.orderBy("cnt", "user_id")
    dec = users.select(
        (F.ntile(10).over(w) - 1).alias("s"), "resp"
    )
    cells = dec.groupBy("s").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_i"),
        F.sum("resp").cast("bigint").alias("r_i"),
    )
    mom = cells.agg(
        F.sum("n_i").cast("bigint").alias("n"),
        F.sum("r_i").cast("bigint").alias("r"),
        F.sum(F.col("s") * F.col("r_i")).cast("bigint").alias("sr"),
        F.sum(F.col("s") * F.col("n_i")).cast("bigint").alias("sn"),
        F.sum(F.col("s") * F.col("s") * F.col("n_i"))
        .cast("bigint")
        .alias("ssn"),
    )
    return mom.select(
        "n",
        "r",
        F.expr("n * sr - r * sn").cast("bigint").alias("t_scaled"),
        F.expr("r * (n - r) * (n * ssn - sn * sn)")
        .cast("bigint")
        .alias("v_scaled"),
        F.expr(
            "CAST(floor(1000.0 * CAST(n AS DOUBLE)"
            " * CAST(n * sr - r * sn AS DOUBLE)"
            " * CAST(n * sr - r * sn AS DOUBLE)"
            " / CAST(r * (n - r) * (n * ssn - sn * sn) AS DOUBLE))"
            " AS BIGINT)"
        ).alias("z2_milli"),
        F.expr(
            "CASE WHEN n * sr - r * sn > 0 THEN 1"
            " WHEN n * sr - r * sn < 0 THEN -1 ELSE 0 END"
        ).cast("bigint").alias("trend_sign"),
    )


ORACLE_Q295 = """
WITH users AS (
  SELECT user_id, count(*) AS cnt,
         max(CASE WHEN event_type = 'purchase' AND value >= 95.0
                  THEN 1 ELSE 0 END) AS resp
  FROM events GROUP BY user_id
),
dec AS (
  SELECT ntile(10) OVER (ORDER BY cnt, user_id) - 1 AS s, resp FROM users
),
cells AS (
  SELECT s, count(*) AS n_i, sum(resp) AS r_i FROM dec GROUP BY s
),
mom AS (
  SELECT sum(n_i) AS n, sum(r_i) AS r, sum(s * r_i) AS sr,
         sum(s * n_i) AS sn, sum(s * s * n_i) AS ssn
  FROM cells
)
SELECT CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS r,
       CAST(n * sr - r * sn AS BIGINT) AS t_scaled,
       CAST(r * (n - r) * (n * ssn - sn * sn) AS BIGINT) AS v_scaled,
       CAST(floor(1000.0 * CAST(n AS DOUBLE)
            * CAST(n * sr - r * sn AS DOUBLE)
            * CAST(n * sr - r * sn AS DOUBLE)
            / CAST(r * (n - r) * (n * ssn - sn * sn) AS DOUBLE))
            AS BIGINT) AS z2_milli,
       CAST(CASE WHEN n * sr - r * sn > 0 THEN 1
                 WHEN n * sr - r * sn < 0 THEN -1 ELSE 0 END
            AS BIGINT) AS trend_sign
FROM mom
"""


# q296: difference-in-differences incident-impact estimate

def q296_diff_in_diff(spark, sf_dir):
    """Difference-in-differences estimate of a rollout's effect on the
    error rate: treated = odd user_id (the deterministic hash split an
    experimentation platform assigns), periods split at the timeline
    midpoint — DiD subtracts the control group's period-over-period
    drift from the treated group's, the standard causal design when a
    raw before/after would be confounded by seasonality.  The four
    (group, period) cells are exact BIGINT (n, e) pairs off ONE
    conditional aggregate; each rate in integer ppm with truncating
    division pinned in both engines; did_ppm = (t2−t1)−(c2−c1) and the
    parallel-trends pre-gap t1−c1 are then exact integer arithmetic —
    no floats anywhere in the whole query.

    Scale shape: one min/max agg + ONE map-side-combinable conditional
    aggregate over the fact scan; the output is a single row."""
    ev = _t(spark, sf_dir, "events")
    bounds = ev.agg(
        ((F.min(F.unix_timestamp("ts")) + F.max(F.unix_timestamp("ts")))
         / F.lit(2)).cast("bigint").alias("mid")
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        (F.col("user_id") % 2 == 1).alias("treated"),
        (F.unix_timestamp("ts") >= F.col("mid")).alias("post"),
        (F.col("event_type") == "error").cast("int").alias("err"),
    )
    aggs = []
    for g, gname in ((False, "c"), (True, "t")):
        for p, pname in ((False, "1"), (True, "2")):
            cond = (F.col("treated") == g) & (F.col("post") == p)
            aggs += [
                F.sum(F.when(cond, 1).otherwise(0))
                .cast("bigint")
                .alias(f"n_{gname}{pname}"),
                F.sum(F.when(cond, F.col("err")).otherwise(0))
                .cast("bigint")
                .alias(f"e_{gname}{pname}"),
            ]
    m = tagged.agg(*aggs)
    rate = lambda c: f"((e_{c} * 1000000) div n_{c})"  # noqa: E731
    return m.select(
        F.expr("n_c1 + n_c2 + n_t1 + n_t2").cast("bigint").alias("n_events"),
        F.expr(rate("c1")).cast("bigint").alias("c1_ppm"),
        F.expr(rate("c2")).cast("bigint").alias("c2_ppm"),
        F.expr(rate("t1")).cast("bigint").alias("t1_ppm"),
        F.expr(rate("t2")).cast("bigint").alias("t2_ppm"),
        F.expr(
            f"({rate('t2')} - {rate('t1')}) - ({rate('c2')} - {rate('c1')})"
        ).cast("bigint").alias("did_ppm"),
        F.expr(f"{rate('t1')} - {rate('c1')}")
        .cast("bigint")
        .alias("pretrend_gap_ppm"),
    )


def _oracle_q296():
    cells = []
    for g, gname in (("0", "c"), ("1", "t")):
        for p, pname in (("<", "1"), (">=", "2")):
            cond = (
                f"user_id % 2 = {g} AND"
                f" CAST(floor(epoch(ts)) AS BIGINT) {p} mid"
            )
            cells.append(
                f"sum(CASE WHEN {cond} THEN 1 ELSE 0 END) AS n_{gname}{pname},"
                f" sum(CASE WHEN {cond} AND event_type = 'error'"
                f" THEN 1 ELSE 0 END) AS e_{gname}{pname}"
            )
    rate = lambda c: f"((e_{c} * 1000000) // n_{c})"  # noqa: E731
    return f"""
WITH b AS (
  SELECT (CAST(floor(epoch(min(ts))) AS BIGINT)
          + CAST(floor(epoch(max(ts))) AS BIGINT)) // 2 AS mid
  FROM events
),
m AS (SELECT {', '.join(cells)} FROM events, b)
SELECT CAST(n_c1 + n_c2 + n_t1 + n_t2 AS BIGINT) AS n_events,
       CAST({rate('c1')} AS BIGINT) AS c1_ppm,
       CAST({rate('c2')} AS BIGINT) AS c2_ppm,
       CAST({rate('t1')} AS BIGINT) AS t1_ppm,
       CAST({rate('t2')} AS BIGINT) AS t2_ppm,
       CAST(({rate('t2')} - {rate('t1')}) - ({rate('c2')} - {rate('c1')})
            AS BIGINT) AS did_ppm,
       CAST({rate('t1')} - {rate('c1')} AS BIGINT) AS pretrend_gap_ppm
FROM m
"""


# q297: cross-lingual anchor-trigram alignment candidates

def q297_crosslingual_anchors(spark, sf_dir):
    """Cross-lingual document-alignment candidate mining via ANCHOR
    trigrams — rare phrases (2 <= df <= 10) that appear in MORE THAN
    ONE language, the classic pre-embedding signal (names, numbers,
    code fragments) that parallel-corpus pipelines use to shortlist
    translation pairs before any expensive scoring.  Candidate pairs
    are cross-language doc pairs sharing an anchor, scored by the
    number of DISTINCT shared anchors; top-20 under a pinned
    (score desc, doc_a, doc_b) total order.  Trigrams, not unigrams:
    this corpus's unigram vocabulary is saturated across all five
    languages (df is huge for every token), so unigram anchors do not
    exist at any SF — the combinatorial trigram space is where rarity
    lives (the q289 finding).

    Scale shape: the df<=10 cap bounds the per-anchor fan-out at
    C(10,2)=45 pairs BEFORE the pair join — the candidate generator is
    a bounded-key equi-join, never all-pairs (the LSH/banding
    discipline); anchor mining is two linear shuffles over the
    trigram explosion."""
    docs = _t_wide(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    grams = F.when(
        F.size(toks) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 2),
            lambda i: F.concat_ws(
                " ",
                F.element_at(toks, i),
                F.element_at(toks, i + 1),
                F.element_at(toks, i + 2),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    tri = docs.select(
        "doc_id", "lang", F.explode(grams).alias("g")
    ).distinct()
    anchors = (
        tri.groupBy("g")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.countDistinct("lang").alias("nl"),
        )
        .where((F.col("df") >= 2) & (F.col("df") <= 10) & (F.col("nl") >= 2))
        .select("g")
    )
    hits = tri.join(anchors, "g")
    a, b = hits.alias("a"), hits.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col("a.lang") < F.col("b.lang")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("a.lang").alias("lang_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("b.lang").alias("lang_b"),
        )
        .agg(F.countDistinct("a.g").cast("bigint").alias("shared_anchors"))
    )
    return pairs.orderBy(
        F.desc("shared_anchors"), "doc_a", "doc_b"
    ).limit(20)


ORACLE_Q297 = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
tri AS (
  SELECT DISTINCT doc_id, lang, g FROM (
    SELECT doc_id, lang,
           unnest(list_transform(range(1, greatest(len(ts) - 1, 1)),
                  i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2])) AS g
    FROM toks WHERE len(ts) >= 3
  )
),
anchors AS (
  SELECT g FROM tri GROUP BY g
  HAVING count(DISTINCT doc_id) BETWEEN 2 AND 10
     AND count(DISTINCT lang) >= 2
),
hits AS (SELECT tri.doc_id, tri.lang, tri.g FROM tri JOIN anchors USING (g))
SELECT a.doc_id AS doc_a, a.lang AS lang_a,
       b.doc_id AS doc_b, b.lang AS lang_b,
       CAST(count(DISTINCT a.g) AS BIGINT) AS shared_anchors
FROM hits a JOIN hits b ON a.g = b.g AND a.lang < b.lang
GROUP BY 1, 2, 3, 4
ORDER BY shared_anchors DESC, doc_a, doc_b
LIMIT 20
"""


# q298: next-fit compaction bin-packing plan

def q298_compaction_binning(spark, sf_dir):
    """Small-file compaction plan via NEXT-FIT bin packing: within
    each source partition, files (docs; bytes = octet length of text)
    are packed in stable doc_id order into target-size bins with
    bin_id = (exclusive running byte total) div target — the
    one-window-pass packing law a table-maintenance service uses to
    turn 10^6 small files into ~target-sized compaction groups without
    a driver-side loop (first-fit-decreasing packs tighter but is
    inherently sequential; next-fit is prefix-sum-parallel, which is
    the 100-TB answer).  Per source: file count, bin count, total
    bytes, the largest bin, and the mean fill ratio in ppm of target —
    all EXACT integers.  Deterministic: packing order is doc_id, a
    stable key, never file-listing order.

    Scale shape: ONE window prefix-sum per source partition, one
    (source, bin) agg, one per-source rollup — the plan is computed
    where the data lives, no collect."""
    target = 2048
    docs = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    files = docs.select(
        "source",
        "doc_id",
        F.octet_length("text").cast("bigint").alias("bytes"),
    ).withColumn(
        "bin_id",
        ((F.sum("bytes").over(w) - F.col("bytes")) / target)
        .cast("bigint"),
    )
    bins = files.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_files"),
        F.sum("bytes").cast("bigint").alias("bin_bytes"),
    )
    return (
        bins.groupBy("source")
        .agg(
            F.sum("n_files").cast("bigint").alias("n_files"),
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.sum("bin_bytes").cast("bigint").alias("total_bytes"),
            F.max("bin_bytes").cast("bigint").alias("max_bin_bytes"),
        )
        .select(
            "source",
            "n_files",
            "n_bins",
            "total_bytes",
            "max_bin_bytes",
            F.expr(f"(total_bytes * 1000000) div (n_bins * {target})")
            .cast("bigint")
            .alias("fill_ppm"),
        )
        .orderBy("source")
    )


ORACLE_Q298 = """
WITH files AS (
  SELECT source, doc_id, CAST(strlen(text) AS BIGINT) AS bytes,
         CAST((sum(strlen(text)) OVER (PARTITION BY source
                ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
               - strlen(text)) // 2048 AS BIGINT) AS bin_id
  FROM documents
),
bins AS (
  SELECT source, bin_id, count(*) AS n_files, sum(bytes) AS bin_bytes
  FROM files GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n_files) AS BIGINT) AS n_files,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(bin_bytes) AS BIGINT) AS total_bytes,
       CAST(max(bin_bytes) AS BIGINT) AS max_bin_bytes,
       CAST((sum(bin_bytes) * 1000000) // (count(*) * 2048) AS BIGINT)
         AS fill_ppm
FROM bins GROUP BY source
ORDER BY source
"""


# q299: minimum covering window proximity scoring

def q299_min_window_proximity(spark, sf_dir):
    """Minimum covering window for the 3-term query {scan, window,
    join}: per matching document, the length of the SHORTEST token
    span containing all three terms — the "sloppy phrase" proximity
    signal a search engine ranks by when the exact phrase (q96) is too
    strict.  Implemented as the LINEAR-SCAN algorithm, not a 3-way
    position join: order the term hits by position per doc, track the
    last-seen position of each term via three conditional running
    maxima in ONE window pass, and wherever all three are live the
    candidate window is pos − least(last_a, last_b, last_c) + 1; the
    document's answer is the min candidate.  Exact integers
    throughout; top-20 by (min_window asc, doc_id).

    Scale shape: one explode filtered to the 3 terms (the scan stays
    proportional to HITS, not tokens), ONE window pass per doc, one
    agg — O(hits log hits) per doc versus the O(tf^3) positional
    join; this is the form that survives pathological term
    frequencies."""
    terms = ("scan", "window", "join")
    docs = _t_wide(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower(F.col("text")), r"\s+"), lambda t: t != F.lit("")
    )
    hits = docs.select(
        "doc_id",
        "lang",
        F.posexplode(toks).alias("pos", "tok"),
    ).where(F.col("tok").isin(*terms))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lasts = hits.select(
        "doc_id",
        "lang",
        "pos",
        *[
            F.max(F.when(F.col("tok") == t, F.col("pos"))).over(w).alias(f"l{i}")
            for i, t in enumerate(terms)
        ],
    )
    cand = lasts.where(
        F.col("l0").isNotNull()
        & F.col("l1").isNotNull()
        & F.col("l2").isNotNull()
    ).select(
        "doc_id",
        "lang",
        (F.col("pos") - F.least("l0", "l1", "l2") + 1).alias("win"),
    )
    return (
        cand.groupBy("doc_id", "lang")
        .agg(
            F.min("win").cast("bigint").alias("min_window"),
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        )
        .orderBy("min_window", "doc_id")
        .limit(20)
    )


ORACLE_Q299 = """
WITH toks AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(lower(text), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
hits AS (
  SELECT doc_id, lang, pos, tok FROM (
    SELECT doc_id, lang,
           generate_subscripts(ts, 1) - 1 AS pos,
           unnest(ts) AS tok
    FROM toks
  ) WHERE tok IN ('scan', 'window', 'join')
),
lasts AS (
  SELECT doc_id, lang, pos,
         max(CASE WHEN tok = 'scan' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS l0,
         max(CASE WHEN tok = 'window' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS l1,
         max(CASE WHEN tok = 'join' THEN pos END)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS UNBOUNDED PRECEDING) AS l2
  FROM hits
)
SELECT doc_id, lang,
       CAST(min(pos - least(l0, l1, l2) + 1) AS BIGINT) AS min_window,
       CAST(count(*) AS BIGINT) AS n_candidates
FROM lasts
WHERE l0 IS NOT NULL AND l1 IS NOT NULL AND l2 IS NOT NULL
GROUP BY doc_id, lang
ORDER BY min_window, doc_id
LIMIT 20
"""


# q300: dyadic-weight EWMA control chart (exact integers)

def q300_ewma_control_chart(spark, sf_dir):
    """EWMA control chart over the DENSE hourly event-count series
    with DYADIC weights: the smoothed baseline for hour t is
    s_prev = sum_{k=1..8} x_{t-k} * 2^(8-k) — i.e. alpha = 1/2
    truncated at 8 taps, so every weight is a power of two and the
    whole chart is EXACT integer arithmetic (the textbook
    float-recursive EWMA is order-dependent and never bit-reproducible
    across engines; the dyadic form is, and 8 taps leave < 0.4% of the
    mass behind).  The series is DENSIFIED over an explicit generated
    hour spine (min..max) with missing hours as x=0 — a silent hour IS
    zero traffic, and treating it as a missing tap would silently
    shorten the chart's memory exactly when a drop alert matters most.
    Weights sum to 255, so the spike test is the cross-multiplied
    comparison 255*x_t > 2*s_prev and the drop test 510*x_t < s_prev —
    no division until the reported ratio_ppm.  Only hours with the
    full 8-hour history (t >= min+8h) AND a live baseline (s_prev > 0)
    are scored — a fully-dead 8-hour window is a feed-silence alarm
    (q179's job), not a ratio.

    Scale shape: the fact table collapses to one hourly series in ONE
    map-side-combinable agg; the spine generation, 8-tap join, fold
    and tests run at series scale (q291's aggregate-first
    discipline)."""
    ev = _t(spark, sf_dir, "events")
    obs = ev.groupBy(
        (F.unix_timestamp("ts") - (F.unix_timestamp("ts") % 3600))
        .cast("bigint")
        .alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    bounds = obs.agg(
        F.min("h").alias("h_min"), F.max("h").alias("h_max")
    )
    spine = bounds.select(
        F.explode(
            F.sequence(F.col("h_min"), F.col("h_max"), F.lit(3600))
        ).alias("h")
    )
    hourly = (
        spine.join(obs, "h", "left")
        .select("h", F.coalesce("x", F.lit(0)).cast("bigint").alias("x"))
        .localCheckpoint(eager=True)
    )
    a, b = hourly.alias("a"), hourly.alias("b")
    scored = (
        a.join(
            b,
            (F.col("b.h") >= F.col("a.h") - 8 * 3600)
            & (F.col("b.h") <= F.col("a.h") - 3600),
        )
        .groupBy(F.col("a.h").alias("h"), F.col("a.x").alias("x"))
        .agg(
            F.count(F.lit(1)).alias("taps"),
            F.sum(
                F.col("b.x")
                * F.pow(
                    F.lit(2.0),
                    (8 - (F.col("a.h") - F.col("b.h")) / 3600).cast("int"),
                ).cast("bigint")
            ).cast("bigint").alias("s_prev"),
        )
        .where((F.col("taps") == 8) & (F.col("s_prev") > 0))
    )
    return (
        scored.select(
            "h",
            "x",
            "s_prev",
            F.expr("(x * 255 * 1000000) div s_prev")
            .cast("bigint")
            .alias("ratio_ppm"),
            F.expr(
                "CASE WHEN 255 * x > 2 * s_prev THEN 'spike'"
                " WHEN 510 * x < s_prev THEN 'drop' ELSE 'ok' END"
            ).alias("state"),
        )
        .orderBy(F.desc("ratio_ppm"), "h")
        .limit(20)
    )


ORACLE_Q300 = """
WITH obs AS (
  SELECT (CAST(floor(epoch(ts)) AS BIGINT)
          - CAST(floor(epoch(ts)) AS BIGINT) % 3600) AS h,
         CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1
),
b AS (SELECT min(h) AS h_min, max(h) AS h_max FROM obs),
spine AS (
  SELECT unnest(range(h_min, h_max + 1, 3600)) AS h FROM b
),
hourly AS (
  SELECT spine.h, coalesce(obs.x, 0) AS x
  FROM spine LEFT JOIN obs ON obs.h = spine.h
),
scored AS (
  SELECT a.h, a.x, count(*) AS taps,
         CAST(sum(b.x * CAST(pow(2.0, 8 - (a.h - b.h) / 3600)
                   AS BIGINT)) AS BIGINT) AS s_prev
  FROM hourly a
  JOIN hourly b ON b.h >= a.h - 8 * 3600 AND b.h <= a.h - 3600
  GROUP BY a.h, a.x
)
SELECT h, x, s_prev,
       CAST((x * 255 * 1000000) // s_prev AS BIGINT) AS ratio_ppm,
       CASE WHEN 255 * x > 2 * s_prev THEN 'spike'
            WHEN 510 * x < s_prev THEN 'drop' ELSE 'ok' END AS state
FROM scored WHERE taps = 8 AND s_prev > 0
ORDER BY ratio_ppm DESC, h
LIMIT 20
"""


__all__ = _prev_all + [
    'ORACLE_Q257',
    'q258_association_rules',
    'ORACLE_Q258',
    'q259_autocorrelation',
    'ORACLE_Q259',
    'q260_target_encoding',
    'ORACLE_Q260',
    'q261_ks_two_sample',
    'ORACLE_Q261',
    'q262_naive_bayes_model',
    'ORACLE_Q262',
    'q263_nation_profit',
    'ORACLE_Q263',
    'q264_top_supplier',
    'ORACLE_Q264',
    'q265_crdt_merge',
    'ORACLE_Q265',
    'q266_ndcg_ranking_quality',
    'ORACLE_Q266',
    'q267_supplier_relationship',
    'ORACLE_Q267',
    'q268_ledger_replay',
    'ORACLE_Q268',
    'q269_weighted_median',
    'ORACLE_Q269',
    'q270_excess_volume_suppliers',
    'ORACLE_Q270',
    'q271_allen_interval_algebra',
    'ORACLE_Q271',
    'q272_rendezvous_hashing',
    '_DUCK_HRW_H',
    'ORACLE_Q272',
    'q273_important_parts',
    'ORACLE_Q273',
    'q274_activity_streaks',
    'ORACLE_Q274',
    'q275_max_drawdown',
    'ORACLE_Q275',
    'q276_priority_check',
    'ORACLE_Q276',
    'q277_kendall_tau',
    'ORACLE_Q277',
    'q278_rolling_median_gate',
    'ORACLE_Q278',
    'q279_sequential_stopping',
    'ORACLE_Q279',
    'q280_good_turing_spectrum',
    'ORACLE_Q280',
    'q281_effective_languages',
    'ORACLE_Q281',
    'q282_wilson_ranking',
    'ORACLE_Q282',
    'q283_token_dispersion',
    'ORACLE_Q283',
    'q284_burn_rate_alerts',
    'ORACLE_Q284',
    'q285_power_iteration_pca',
    'ORACLE_Q285',
    'q286_simpsons_audit',
    'ORACLE_Q286',
    'q287_trend_r2_gate',
    'ORACLE_Q287',
    'q288_anova_gate',
    '_oracle_q288',
    'q289_bipartite_kcore',
    'ORACLE_Q289',
    'q290_indomain_selection',
    'ORACLE_Q290',
    'q291_leadlag_xcorr',
    'ORACLE_Q291',
    'q292_jackknife_ratio',
    '_oracle_q292',
    'q293_source_tv_drift',
    'ORACLE_Q293',
    'q294_capture_recapture',
    'ORACLE_Q294',
    'q295_cochran_armitage',
    'ORACLE_Q295',
    'q296_diff_in_diff',
    '_oracle_q296',
    'q297_crosslingual_anchors',
    'ORACLE_Q297',
    'q298_compaction_binning',
    'ORACLE_Q298',
    'q299_min_window_proximity',
    'ORACLE_Q299',
    'q300_ewma_control_chart',
    'ORACLE_Q300',
]
