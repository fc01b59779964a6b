"""Similarity search over embedding columns (training-data pipeline):
brute-force cosine top-k baseline + LSH-bucketed scale path +
embedding-cosine near-duplicate detection.

Brute force is the correctness baseline: broadcast the (small) query
set against the corpus — a broadcast nested-loop whose inner math is
pure Catalyst (zip_with/aggregate), no Python.

The scale path is random-hyperplane LSH (SimHash for vectors): b
signed projections → b-bit bucket; near vectors collide w.h.p.  The
hyperplanes are deterministic ±1 pseudo-vectors derived from the
portable md5 hash (``functions.portable_hash.plane_signs``) and
materialized as LITERAL arrays — no per-row hashing at all, and the
same literals are embeddable in the DuckDB oracle (ORACLE_Q24).  At
100 TB the bucket join is an equi-join on an int key —
shuffle-partitionable, never O(n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.portable_hash import md5_i64_expr, plane_signs
from ..functions.vectors import cosine_expr


def _vec_dim(df: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from one row (bounded driver action —
    metadata-scale, like reading a table schema)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row.d is None or row.d <= 0:
        raise ValueError(f"cannot infer dimension of vector column {vec_col!r}")
    return int(row.d)


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


def _hyperplane_sign(vec: Column, plane_id: int, dim: int) -> Column:
    """Sign-bit of <v, h_p> where h_p = plane_signs(plane_id, dim), a
    literal ±1 array.  x * (±1) is exact, so the only rounding is the
    sequential sum — identical fold order in Spark and DuckDB."""
    signs = F.array(*[F.lit(s) for s in plane_signs(plane_id, dim)])
    dot = F.aggregate(
        F.zip_with(vec, signs, lambda x, s: x * s), F.lit(0.0), lambda a, v: a + v
    )
    return F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0))


def lsh_bucket_expr(vec: Column, n_planes: int, dim: int) -> Column:
    """b-bit random-hyperplane bucket id (int).

    NULL — not bucket 0 — for vectors whose length differs from the
    planes' ``dim``: zip_with null-pads a shorter side, the dot goes
    null, and every sign would read 0, silently colliding all
    mismatched vectors into one mega-bucket.  A null bucket instead
    drops the row from the bucket equi-join (no false results); the
    caller's corpus row-1 dim is the contract."""
    bucket = F.lit(0)
    for p in range(n_planes):
        bucket = bucket * 2 + _hyperplane_sign(vec, p, dim)
    return F.when(F.size(vec) == dim, bucket)


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
    force baseline for recall@k, not exactness; values are exactly
    DuckDB-mirrorable (ORACLE_Q24) via the literal hyperplanes.
    """
    dim = _vec_dim(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
        lsh_bucket_expr(F.col(vec_col).cast("array<double>"), n_planes, dim).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
        lsh_bucket_expr(F.col(vec_col).cast("array<double>"), n_planes, dim).alias("bucket"),
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


def _centroid_dists_expr(vec, centroids: list[list[float]]):
    """array<double> of squared distances to every centroid.

    ONE ``transform`` over a constant array<array<double>> (Catalyst
    constant-folds the nested literal into a single Literal) holding
    ONE zip_with+aggregate — not n_centroids separate aggregate
    expressions, whose combined tree made analysis/codegen take
    seconds per plan (the round-1 'giant expression tree' trap, hit
    again here in round 2 at 16 centroids x 64 dims).  Same sequential
    fold per element, so distance bits and tie-breaks are unchanged."""
    cent_lit = F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])
    return F.transform(
        cent_lit,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda a, v: a + v,
        ),
    )


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
            md5_i64_expr(F.col(id_col).cast("string"), salt="ivf#").alias("h"),
        )
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    ]

    def with_lists(df, n_lists):
        v = F.col(vec_col).cast("array<double>")
        darr = _centroid_dists_expr(v, centroids)
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
    # no trailing distinct: row_number is unique per (query_id, rk)
    # already — a distinct here would be a pure extra shuffle
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def embedding_near_dupes(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-join + verify."""
    dim = _vec_dim(corpus, vec_col)
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
        lsh_bucket_expr(F.col(vec_col).cast("array<double>"), n_planes, dim).alias("bucket"),
    )
    a, b = c.alias("a"), c.alias("b")
    # each id hashes to exactly ONE bucket, so a pair can meet in at
    # most one bucket — no distinct needed (it was an extra shuffle)
    pairs = (
        a.join(b, "bucket")
        .where(F.col("a.id") < F.col("b.id"))
        .withColumn("cosine", F.round(cosine_expr(F.col("a.v"), F.col("b.v")), 6))
        .where(F.col("cosine") >= threshold)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"), "cosine")
    )
    return pairs
