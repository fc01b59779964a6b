"""Round-4d operators: filter-cascade ordering, overlap-chunking
coverage/containment invariants.

q99's chunk-count formula max(1, ceil((n-16)/48)) carries two proofs
the oracle hash alone can't localize if they break: every token is
covered by some chunk, and no chunk is fully contained in its
predecessor (the naive ceil(n/48) emits contained runt chunks whenever
n mod 48 lands inside the 16-token overlap).  Both reduce to the
per-document identity sum(chunk tokens) = n + 16*(n_chunks - 1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from watermark_remove_spark.queries import (
    q97_filter_cascade,
    q99_overlap_chunking,
)

SF = "/root/testdata/sf0.001"


def test_cascade_first_reason_wins(spark):
    # every gate must be non-vacuous on the fixture AND the shares must
    # account for the whole corpus (first-match semantics: no doc is
    # double-counted, no doc is dropped)
    rows = {r["reason"]: r.asDict() for r in q97_filter_cascade(spark, SF).collect()}
    assert set(rows) == {"too_short", "too_long", "lang_filtered", "repetitive", "kept"}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    # a too-short zh doc exists in the fixture; it must be tagged
    # too_short (rule 1), never lang_filtered (rule 3)
    tk = F.split(F.trim(F.col("text")), r"\s+")
    short_zh = docs.where((F.size(tk) < 20) & (F.col("lang") == "zh")).count()
    assert short_zh > 0, "fixture lost its short zh docs — reorder test invalid"


def test_overlap_chunking_coverage_no_containment(spark):
    chunks = q99_overlap_chunking(spark, SF)
    per_doc = chunks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nc"), F.sum("n_tok").alias("tok_sum")
    )
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda t: t != "")).alias("n"),
    )
    j = docs.join(per_doc, "doc_id", "left").collect()
    assert len(j) > 0
    multi = 0
    for r in j:
        if r["n"] == 0:
            assert r["nc"] is None  # empty doc -> zero chunks
            continue
        # coverage + no-containment in one identity: each of the nc-1
        # overlaps re-counts exactly 16 tokens, no more (a contained
        # runt chunk would re-count its full length)
        assert r["tok_sum"] == r["n"] + 16 * (r["nc"] - 1), r
        multi += r["nc"] > 1
    assert multi > 0, "fixture has no multi-chunk docs — overlap untested"
