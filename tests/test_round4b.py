"""Non-vacuity + semantics tests for the round-4b operators (q73-q81):
duplicate-n-gram rate, incremental MV maintenance, stream-stream
interval join, weighted sampling, z-order layout, drift monitor,
index-backed retrieval, sketch-driven range partitioning, per-source
representation cap.

Each query is hash-checked against DuckDB by the driver; these tests
pin what the hash can't: that the fixtures actually exercise both
sides of every gate (a trivially-empty branch would still hash-match),
and the operator-level invariants the oracle doesn't see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_duplicate_ngram_rate_non_vacuous(spark):
    from watermark_remove_spark.queries import q73_duplicate_ngram_rate

    out = q73_duplicate_ngram_rate(spark, SF).cache()
    rows = out.count()
    assert rows > 0
    # both gate sides populated: duplicated mass exists, but no doc is
    # 100% duplicate-free-or-full on the whole corpus
    assert out.where(F.col("dup_grams") > 0).count() > 0
    assert out.where(F.col("dup_grams") < F.col("total_grams")).count() > 0
    # keep gate fires both ways
    keeps = {r["keep"] for r in out.select("keep").distinct().collect()}
    assert keeps == {0, 1}
    # dup mass never exceeds total mass
    assert out.where(F.col("dup_grams") > F.col("total_grams")).count() == 0
    out.unpersist()


def test_incremental_mv_merge_equals_scratch(spark):
    from watermark_remove_spark.operators.incremental import (
        agg_state,
        merge_agg_state,
    )

    from watermark_remove_spark.functions.portable_hash import md5_i64_expr

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keys = ["lang", "source"]
    is_base = (
        md5_i64_expr(F.col("doc_id").cast("string"), salt="mv#") % 10 < 8
    ) & (F.col("lang") != "fr")
    base = agg_state(docs.where(is_base), keys)
    delta_rows = docs.where(~is_base)
    delta = agg_state(delta_rows, keys)

    # non-vacuity: the delta must exercise BOTH merge paths
    base_keys = {tuple(r) for r in base.select(*keys).collect()}
    delta_keys = {tuple(r) for r in delta.select(*keys).collect()}
    assert delta_keys - base_keys, "no not-matched-insert keys in delta"
    assert delta_keys & base_keys, "no matched-update keys in delta"

    merged = merge_agg_state(base, delta, keys)
    scratch = agg_state(docs, keys)
    assert merged.exceptAll(scratch).count() == 0
    assert scratch.exceptAll(merged).count() == 0


def test_incremental_mv_merge_empty_delta_is_identity(spark):
    from watermark_remove_spark.operators.incremental import (
        agg_state,
        merge_agg_state,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    keys = ["lang"]
    base = agg_state(docs, keys)
    empty = agg_state(docs.where(F.lit(False)), keys)
    merged = merge_agg_state(base, empty, keys)
    assert merged.exceptAll(base).count() == 0
    assert base.exceptAll(merged).count() == 0


def test_streaming_interval_join_rejects_ambiguous_columns(spark):
    from watermark_remove_spark.streaming.pipeline import streaming_interval_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.select("user_id", "ts", "event_id")
    right = ev.select("user_id", "ts", "event_id")
    with pytest.raises(ValueError, match="both sides"):
        streaming_interval_join(left, right, left_ts="ts", right_ts="ts")


def test_weighted_sample_rate_tracks_weight(spark):
    from watermark_remove_spark.queries import q76_weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    total = docs.count()
    out = q76_weighted_sample(spark, SF).cache()
    kept = out.count()
    # non-vacuous, non-total
    assert 0 < kept < total
    # inclusion probability is n_chars/1000: the kept set must skew long.
    kept_avg = out.agg(F.avg("n_chars")).first()[0]
    all_avg = docs.agg(F.avg("n_chars")).first()[0]
    assert kept_avg > all_avg, "weighted sample failed to skew toward heavy rows"
    # determinism: a second evaluation yields the identical membership
    again = q76_weighted_sample(spark, SF)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0
    out.unpersist()


def test_zorder_buckets_bound_both_dims(spark):
    from watermark_remove_spark.queries import q77_zorder_layout

    out = q77_zorder_layout(spark, SF).cache()
    assert out.count() > 1
    # the skipping bound: a 16-bit z-prefix fixes the high 8 bits of
    # each 16-bit dim, so per-bucket spans are < 256 on BOTH dims...
    assert out.where((F.col("x_span") > 255) | (F.col("y_span") > 255)).count() == 0
    # ...while the data's global y span is much wider (else the bound
    # would be vacuous)
    g = out.agg(
        (F.max("max_y") - F.min("min_y")).alias("gy"),
    ).first()
    assert g["gy"] > 255
    out.unpersist()


def test_zvalue_interleave_inverse_roundtrip(spark):
    """z-value must be invertible: de-interleaving even/odd bits
    recovers (x, y) exactly — pinned in the JVM, not just in Python."""
    from watermark_remove_spark.functions.zorder import zvalue_expr

    df = spark.range(1000).select(
        (F.col("id") * 7919 % 65536).alias("x"),
        (F.col("id") * 104729 % 65536).alias("y"),
    )
    z = df.select("x", "y", zvalue_expr(F.col("x"), F.col("y")).alias("z"))
    back_x = sum(
        F.shiftleft(F.shiftright(F.col("z"), 2 * i).bitwiseAND(F.lit(1)), i)
        for i in range(16)
    )
    back_y = sum(
        F.shiftleft(F.shiftright(F.col("z"), 2 * i + 1).bitwiseAND(F.lit(1)), i)
        for i in range(16)
    )
    bad = z.where((back_x != F.col("x")) | (back_y != F.col("y"))).count()
    assert bad == 0


def test_drift_monitor_non_vacuous(spark):
    from watermark_remove_spark.queries import q78_drift_monitor

    out = q78_drift_monitor(spark, SF).cache()
    assert out.count() > 1
    # at least one window actually drifts, and none double-counts:
    # l1 <= total_cur + total_prev always
    assert out.where(F.col("l1") > 0).count() > 0
    assert out.where(
        F.col("l1") > F.col("total_cur") + F.col("total_prev")
    ).count() == 0
    # a first window (no predecessor) scores full mass: drift_pct 100
    first = out.orderBy("window_epoch").first()
    assert first["total_prev"] == 0 and first["drift_pct"] == 100
    out.unpersist()


def test_index_retrieval_scores_and_order(spark):
    from watermark_remove_spark.queries import q79_index_retrieval

    rows = q79_index_retrieval(spark, SF).collect()
    assert 0 < len(rows) <= 10
    # probe docs never retrieve themselves
    assert all(r["doc_id"] not in (0, 1) for r in rows)
    # deterministic total order: score desc, doc_id asc
    key = [(-r["score"], r["doc_id"]) for r in rows]
    assert key == sorted(key)
    assert rows[0]["score"] >= 1


def test_sketch_range_partition_buckets_disjoint(spark):
    from watermark_remove_spark.queries import q80_sketch_range_partition

    rows = sorted(
        q80_sketch_range_partition(spark, SF).collect(),
        key=lambda r: r["bucket"],
    )
    assert len(rows) >= 3  # quartiles may merge only under extreme skew
    total = sum(r["n_docs"] for r in rows)
    # every bucket non-empty and no bucket hoards the corpus
    assert all(r["n_docs"] > 0 for r in rows)
    assert max(r["n_docs"] for r in rows) < total
    # bucket value-ranges are DISJOINT (bin ids are monotone in value)
    for lo, hi in zip(rows, rows[1:]):
        assert lo["max_chars"] < hi["min_chars"]


def test_domain_cap_respects_cap_and_determinism(spark):
    from watermark_remove_spark.queries import q81_domain_cap

    out = q81_domain_cap(spark, SF).cache()
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 10 for r in per)
    # the cap binds (fixtures carry >10 docs per source)
    assert any(r["count"] == 10 for r in per)
    again = q81_domain_cap(spark, SF)
    assert out.exceptAll(again).count() == 0
    assert again.exceptAll(out).count() == 0
    out.unpersist()


def test_streaming_outer_attribution_emits_both_sides(spark):
    """The outer join's entire point: matched rows AND watermark-
    expired unmatched rows (null purchase) both emit, exactly once."""
    from watermark_remove_spark.queries import q82_streaming_outer_attribution

    out = q82_streaming_outer_attribution(spark, SF).cache()
    n = out.count()
    views = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("event_type") == "view")
        .count()
    )
    assert n >= views  # every view emits at least once
    assert out.where(F.col("purchase_id").isNull()).count() > 0
    assert out.where(F.col("purchase_id").isNotNull()).count() > 0
    # an unmatched view emits exactly once (no duplicate null rows)
    dup_nulls = (
        out.where(F.col("purchase_id").isNull())
        .groupBy("view_id")
        .count()
        .where(F.col("count") > 1)
        .count()
    )
    assert dup_nulls == 0
    out.unpersist()


def test_streaming_interval_join_rejects_unknown_how(spark):
    # fullOuter became a supported type in round 4f (q121); rightOuter
    # alone stays rejected — its one-sided eviction analysis is the
    # mirrored case callers should express as a side swap instead.
    from watermark_remove_spark.streaming.pipeline import streaming_interval_join

    ev = spark.read.parquet(f"{SF}/events.parquet")
    left = ev.select("user_id", F.col("ts").alias("lts"))
    right = ev.select("user_id", F.col("ts").alias("rts"))
    with pytest.raises(ValueError, match="not supported"):
        streaming_interval_join(
            left, right, left_ts="lts", right_ts="rts", how="rightOuter"
        )


def test_containment_scores_non_vacuous(spark):
    from watermark_remove_spark.queries import q83_containment_scores

    out = q83_containment_scores(spark, SF).cache()
    assert out.count() > 0
    # graded: scores exist strictly between the extremes
    assert out.where((F.col("containment_pct") > 0) & (F.col("containment_pct") < 100)).count() > 0
    # overlap never exceeds the doc's own gram count
    assert out.where(F.col("n_overlap") > F.col("n_grams")).count() == 0
    # both flag outcomes occur
    flags = {r["blocked"] for r in out.select("blocked").distinct().collect()}
    assert flags == {0, 1}
    out.unpersist()


def test_sink_incremental_read_partitions_the_view(spark, tmp_path):
    """as-of(k) + incremental(from=k) == full view, exactly; the diff
    honors bounds, returns empty past the head, and raises once vacuum
    prunes a batch dir inside the requested range."""
    from watermark_remove_spark.streaming.sink import ParquetLedgerSink

    sink = ParquetLedgerSink(str(tmp_path / "out"))
    for b in range(4):
        df = spark.range(b * 10, b * 10 + 10).selectExpr("id", "id * 2 AS v")
        sink.write_batch(df, b)

    inc = sink.read_incremental(spark, from_batch=1)
    assert {r.id for r in inc.collect()} == set(range(20, 40))
    # bounded diff (from, to]
    assert sink.read_incremental(spark, 0, 2).count() == 20
    # partition property vs the as-of read
    asof = sink.read_committed(spark, as_of_batch=1)
    assert asof.count() + inc.count() == sink.read_committed(spark).count()
    # nothing past the head
    assert sink.read_incremental(spark, from_batch=3).count() == 0

    # a to_batch beyond the committed head must refuse, not truncate:
    # a consumer checkpointing the REQUESTED bound would skip batches
    # 4..5 forever once they commit
    with pytest.raises(RuntimeError, match="beyond the committed head"):
        sink.read_incremental(spark, 1, 5)

    sink.compact(spark)
    sink.vacuum(tmp_min_age_sec=0.0)
    with pytest.raises(RuntimeError, match="pruned by vacuum"):
        sink.read_incremental(spark, from_batch=1)
