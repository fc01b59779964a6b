"""Incremental materialized-view maintenance: merge a delta batch's
partial aggregates into an existing aggregate state table.

This is the BATCH form of the engine's exactly-once MERGE story
(streaming/sink.py's IcebergMergeSink seam): a corpus-level aggregate
(the "materialized view") is kept current by aggregating ONLY the new
batch and full-outer-merging the partials onto the stored state —
never re-scanning the historical corpus.  At 100 TB the difference is
a full-corpus scan + shuffle per refresh versus a delta-sized scan
plus a join whose left side is #groups rows (metadata-scale relative
to the corpus).

Correctness rests on the aggregates being ALGEBRAIC (decomposable into
commutative monoid partials): COUNT and SUM merge by +, MIN/MAX by
least/greatest.  AVG is derived at read time from (sum, count) —
storing a float average would make merges order-sensitive and break
bit-exactness.  Reference parity: the reference scaffold re-runs its whole
model on every request with no state carried between calls
(api/main.py:33-59); this operator is the incremental counterpart a
stream of batches needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# output column -> merge function (the matching source expressions
# live in agg_state; both must list the same metric columns)
_MERGE_FNS = {
    "n_docs": lambda a, b: a + b,
    "sum_chars": lambda a, b: a + b,
    "min_doc_id": F.least,
    "max_doc_id": F.greatest,
}


def agg_state(df: DataFrame, keys: list[str]) -> DataFrame:
    """Aggregate a (delta or base) slice of ``documents`` into the
    monoid partials the view maintains.  One hash-aggregate shuffle on
    ``keys``; all partials are integer-exact."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("n_chars").cast("bigint")).alias("sum_chars"),
        F.min("doc_id").alias("min_doc_id"),
        F.max("doc_id").alias("max_doc_id"),
    )


def merge_agg_state(base: DataFrame, delta: DataFrame, keys: list[str]) -> DataFrame:
    """MERGE the delta partials into the base state (upsert semantics):
    matched keys combine monoid-wise, unmatched keys insert.

    Implementation is a full-outer join on the group keys with
    null-safe monoid combination — exactly what an Iceberg
    ``MERGE INTO ... WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT``
    compiles to, expressed engine-neutrally.  The join shuffles only
    #groups + #delta-groups rows, never corpus rows."""
    b = base.alias("b")
    d = delta.alias("d")
    cond = None
    for k in keys:
        c = F.col(f"b.{k}").eqNullSafe(F.col(f"d.{k}"))
        cond = c if cond is None else (cond & c)
    joined = b.join(d, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"b.{k}"), F.col(f"d.{k}")).alias(k) for k in keys
    ]
    for m, fn in _MERGE_FNS.items():
        bc, dc = F.col(f"b.{m}"), F.col(f"d.{m}")
        out_cols.append(
            F.when(bc.isNull(), dc)
            .when(dc.isNull(), bc)
            .otherwise(fn(bc, dc))
            .alias(m)
        )
    return joined.select(*out_cols)
