"""SCD2 / CDC upsert without MERGE (O-11 family).

The reference's artifact versioning is one-file-per-request
(``api/main.py:39-40`` uuid temp names); the engine's mask/template
changelog needs real slowly-changing-dimension semantics: apply a
batch of updates to a versioned dimension, closing superseded rows
and keeping full history.

No Delta/Iceberg MERGE is available offline (SURVEY header), and the
public guide pattern is the portable emulation: union the incoming
versions with the existing ones, resolve same-instant conflicts
(updates win), and recompute ``valid_to`` as ``lead(valid_from)`` per
key.  Every step is a partial-aggregated shuffle/window on the
dimension key — no driver loops, no MERGE dependency — and the whole
transform is expressible in ANSI SQL, so it is oracle-checked exactly
(q39).

Scale note: dimensions are small relative to the fact stream (domains,
not pages); the two windows shuffle only the dimension.  With an
actual Iceberg catalog the same plan feeds ``MERGE INTO`` via
``IcebergMergeSink``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    op_col: str | None = None,
    dim_op_col: str | None = None,
    keep_tombstones: bool = False,
) -> DataFrame:
    """Return the new SCD2 table: ``dim`` (history, ``end_col`` may be
    stale) + ``updates`` (new versions, no ``end_col``), with
    ``end_col`` recomputed as the next version's ``ts_col`` (NULL for
    the current row).  An update at an instant that already has a
    version replaces it (updates win).

    CDC deletes (round-2 verdict #5): pass ``op_col`` naming a column
    in ``updates`` with values ``'upsert' | 'delete'`` — any OTHER
    value (including NULL) is normalized to upsert, never silently
    treated as a tombstone.  A delete is a
    TOMBSTONE event: it closes whatever version is active at its
    timestamp (that version's ``end_col`` becomes the delete's
    ``ts_col``) and emits no successor row — the key's history simply
    stops until a later upsert re-opens it.  Conflict rules, in order:
    changelog beats existing dim at the same instant; among changelog
    rows at one instant, delete beats upsert (a retraction overrides a
    concurrent update).  A delete with no active version is a no-op.
    Attribute columns of delete rows are ignored (may be NULL).

    Still one union + two dimension-keyed windows — deletes ride the
    same ``lead`` that closes superseded versions, so the plan shape
    (and the 100-TB posture) is unchanged.

    INCREMENTAL (CDC-loop) use: a one-shot apply may drop tombstones
    from the output, but a foreachBatch loop that re-applies batch
    after batch MUST carry them forward — without the tombstone row, a
    later batch's re-opening upsert would recompute the closed
    version's ``end_col`` past the delete (lead() no longer sees the
    tombstone) and silently resurrect it.  Pass
    ``keep_tombstones=True`` to retain delete rows (marked in a
    ``cdc_op`` output column) as loop state, and ``dim_op_col`` naming
    that column when feeding the state back in as ``dim``.  The final
    read filters ``cdc_op != 'delete'``.  Note same-instant conflicts
    across batches resolve by recency (``updates`` beat ``dim``);
    chronological micro-batches make same-instant conflicts
    intra-batch by construction, where delete-beats-upsert applies."""
    if dim_op_col is None:
        d = dim.drop(end_col).withColumn("__pri", F.lit(0)).withColumn(
            "__op", F.lit("upsert")
        )
    else:
        dnorm = F.when(F.col(dim_op_col) == "delete", F.lit("delete")).otherwise(
            F.lit("upsert")
        )
        d = (
            dim.drop(end_col)
            .withColumn("__op", dnorm)
            .drop(dim_op_col)
            .withColumn("__pri", F.lit(0))
        )
    if op_col is None:
        u = updates.withColumn("__pri", F.lit(1)).withColumn("__op", F.lit("upsert"))
    else:
        # normalize: anything that is not literally 'delete' (including
        # NULL or a typo'd op) is an upsert.  Without this, an
        # unrecognized op would be filtered by the final
        # `__op != 'delete'` (NULL-safe-false) yet still close the
        # prior version via lead() — a malformed changelog row acting
        # as a silent tombstone.
        norm = F.when(F.col(op_col) == "delete", F.lit("delete")).otherwise(
            F.lit("upsert")
        )
        u = (
            updates.withColumn("__op_norm", norm)
            .drop(op_col)
            .withColumnRenamed("__op_norm", "__op")
            .withColumn("__pri", F.lit(1))
        )
    versions = d.unionByName(u)
    w_dup = Window.partitionBy(*key_cols, ts_col).orderBy(
        F.col("__pri").desc(), (F.col("__op") == "delete").cast("int").desc()
    )
    dedup = (
        versions.withColumn("__rn", F.row_number().over(w_dup))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__pri")
    )
    w = Window.partitionBy(*key_cols).orderBy(ts_col)
    closed = dedup.withColumn(end_col, F.lead(ts_col).over(w))
    if keep_tombstones:
        return closed.withColumnRenamed("__op", "cdc_op")
    return closed.where(F.col("__op") != "delete").drop("__op")
