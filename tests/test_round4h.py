"""Round-4h operators: ANALYZE-style exact column statistics and
bitmap-index audience set algebra.

The oracle hash proves Spark == DuckDB on the full expressions; these
tests prove the shared answers have the operators' defining *shapes*:
stats accounting identities (n_nulls + non-null mass == n_rows, NDV
counts injected nulls out, MCV tie-break is deterministic smallest-
value) and exact bitmap algebra on hand-built sets, including users
that share a 62-bit word and users in different words.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _write_docs(spark, rows, tmp):
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )
    df.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")


def test_column_stats_accounting(spark):
    from watermark_remove_spark.queries import q131_column_statistics

    # doc_id 0 and 13 hit the %13 null injection on lang; lang values
    # chosen so two candidates tie on count and the SMALLER string
    # must win the MCV slot ("aa" vs "bb", 2 each after injection).
    rows = [
        (0, "t0", "zz", "s1", 5),   # lang nulled (0 % 13 == 0)
        (13, "t13", "zz", "s1", 5),  # lang nulled (13 % 13 == 0)
        (1, "t1", "aa", "s1", 7),
        (2, "t2", "aa", "s2", 7),
        (3, "t3", "bb", "s2", 9),
        (4, "t4", "bb", "s2", 9),
    ]
    tmp = tempfile.mkdtemp(prefix="wrs-q131-")
    _write_docs(spark, rows, tmp)
    got = {r["col_name"]: r for r in q131_column_statistics(spark, tmp).collect()}
    assert set(got) == {"doc_id", "lang", "source", "n_chars", "text_md5"}

    lang = got["lang"]
    assert lang["n_rows"] == 6
    assert lang["n_nulls"] == 2          # the two injected nulls
    assert lang["n_distinct"] == 2       # aa, bb — zz rows were nulled
    assert lang["top_val"] == "aa"       # tie (2 vs 2) -> smallest value
    assert lang["top_n"] == 2
    assert (lang["min_val"], lang["max_val"]) == ("aa", "bb")

    did = got["doc_id"]
    assert did["n_nulls"] == 0
    assert did["n_distinct"] == 6
    # zero-padded encoding preserves numeric order: min is doc 0, max 13
    assert did["min_val"].endswith("0") and int(did["min_val"]) == 0
    assert int(did["max_val"]) == 13

    txt = got["text_md5"]
    assert txt["n_distinct"] == 6        # all texts unique -> digest NDV exact
    assert txt["top_n"] == 1


def test_column_stats_every_column_accounts_all_rows(spark):
    from watermark_remove_spark.queries import q131_column_statistics

    rows = q131_column_statistics(spark, SF).collect()
    n = {r["col_name"]: r["n_rows"] for r in rows}
    assert len(set(n.values())) == 1, f"row counts diverge across columns: {n}"
    for r in rows:
        assert r["n_distinct"] <= r["n_rows"] - r["n_nulls"]
        assert r["top_n"] >= 1


def test_bitmap_algebra_exact_sets(spark):
    from watermark_remove_spark.queries import q132_bitmap_audience_algebra

    # A = {1, 2, 62}, B = {2, 62, 100}: users 1/2 share word 0, user 62
    # lands in word 1 bit 0, user 100 in word 1 bit 38 — the algebra
    # must be exact across word boundaries.  |A∩B| = 2, |A∪B| = 4.
    from datetime import datetime

    ev = []
    for i, (t, users) in enumerate([("a", [1, 2, 62]), ("b", [2, 62, 100])]):
        for j, u in enumerate(users):
            ev.append((i * 10 + j, datetime(2026, 3, 1), u, t, 0.0, "{}"))
    df = spark.createDataFrame(
        ev, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    tmp = tempfile.mkdtemp(prefix="wrs-q132-")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = q132_bitmap_audience_algebra(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"]) == (3, 3)
    assert r["n_common"] == 2
    assert r["n_union"] == 4
    assert r["jaccard_ppm"] == 500000


def test_bitmap_cardinalities_match_distinct_counts(spark):
    from watermark_remove_spark.queries import q132_bitmap_audience_algebra

    out = q132_bitmap_audience_algebra(spark, SF).collect()
    assert out, "no audience pairs"
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for r in out:
        assert r["n_a"] == exact[r["type_a"]]
        assert r["n_b"] == exact[r["type_b"]]
        assert 0 <= r["n_common"] <= min(r["n_a"], r["n_b"])
        assert r["n_union"] == r["n_a"] + r["n_b"] - r["n_common"]
