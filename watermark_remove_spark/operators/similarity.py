"""Similarity search over embedding columns (training-data pipeline):
brute-force cosine top-k baseline + LSH-bucketed scale path +
embedding-cosine near-duplicate detection.

Brute force is the correctness baseline: broadcast the (small) query
set against the corpus — a broadcast nested-loop whose inner math is
pure Catalyst (zip_with/aggregate), no Python.

The scale path is random-hyperplane LSH (SimHash for vectors): b
signed projections → b-bit bucket; near vectors collide w.h.p.  The
hyperplanes are deterministic pseudo-vectors derived from xxhash64 so
no external randomness or model is needed.  At 100 TB the bucket join
is an equi-join on an int key — shuffle-partitionable, never O(n²).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import cosine_expr


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus,
    cosine, row_number ≤ k.  Deterministic tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    scored = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    ).crossJoin(F.broadcast(q))
    scored = scored.where(F.col("neighbor_id") != F.col("query_id")).withColumn(
        "cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _hyperplane_sign(vec, plane_id: int):
    """Sign of <v, h_p> where h_p[i] = deterministic ±1 pseudo-plane:
    sign derived from xxhash64(plane_id # dim_index).  Computed as an
    aggregate over the vector with posexplode-free zip on indices."""
    idx = F.sequence(F.lit(0), F.size(vec) - 1)
    signs = F.transform(
        idx,
        lambda i: F.when(
            F.pmod(F.xxhash64(F.concat(F.lit(f"hp{plane_id}#"), i.cast("string"))), F.lit(2)) == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    dot = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x * s), F.lit(0.0), lambda a, v: a + v
    )
    return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket_expr(vec, n_planes: int = 8):
    """b-bit random-hyperplane bucket id (int)."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec, p)
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 6,
) -> DataFrame:
    """Approximate top-k: compare only within the query's LSH bucket.

    Recall is traded for a bucket-equi-join; tested against the brute
    force baseline for recall@k, not exactness.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        lsh_bucket_expr(F.col(vec_col), n_planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        lsh_bucket_expr(F.col(vec_col), n_planes).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.withColumn("cosine", F.round(cosine_expr(F.col("qv"), F.col("cv")), 6))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _centroid_assign_exprs(vec, centroids: list[list[float]]):
    """Distance columns to each centroid (literal arrays, JVM math)."""
    dists = []
    for c in centroids:
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(vec, lit, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, v: a + v,
        )
        dists.append(d)
    return dists


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF-flat approximate top-k (the second scale path next to LSH):

    - coarse quantizer: n_centroids deterministic sample vectors
      (lowest xxhash64(id) — seedless, reproducible, no external model);
    - every corpus vector is assigned to its nearest centroid (inverted
      list id) with pure Catalyst arithmetic;
    - a query probes its n_probe nearest lists only, so the search join
      is an equi-join on the small int list id — never a cross join.

    At 100 TB the inverted lists are the partitioning key: corpus
    bucketed by list id makes the probe join shuffle-free on the big
    side.
    """
    centroids = [
        [float(x) for x in r.v]
        for r in corpus.select(
            F.col(vec_col).cast("array<double>").alias("v"),
            F.xxhash64(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    ]

    def with_lists(df, n_lists):
        v = F.col(vec_col).cast("array<double>")
        dists = _centroid_assign_exprs(v, centroids)
        darr = F.array(*dists)
        ranked = F.slice(
            F.transform(
                F.array_sort(
                    F.transform(
                        darr,
                        lambda d, i: F.struct(d.alias("d"), i.alias("i")),
                    )
                ),
                lambda s: s["i"],
            ),
            1,
            n_lists,
        )
        return df.withColumn("__lists", ranked)

    c = with_lists(corpus, 1).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        F.element_at("__lists", 1).alias("list_id"),
    )
    q = with_lists(queries, n_probe).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode("__lists").alias("list_id"),
    )
    scored = c.join(F.broadcast(q), "list_id").where(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = scored.withColumn(
        "cosine",
        F.round(cosine_expr(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>")), 6),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
        .distinct()
    )


def embedding_near_dupes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-join + verify."""
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        lsh_bucket_expr(F.col(vec_col), n_planes).alias("bucket"),
    )
    a, b = c.alias("a"), c.alias("b")
    pairs = (
        a.join(b, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
        .distinct()
    )
    return pairs
