"""Round-4h operators: ANALYZE-style exact column statistics, bitmap
audience set algebra, streaming LEFT SEMI interval join, sorted-
neighborhood blocking, and the loose timeout funnel.

The oracle hash proves Spark == DuckDB on the full expressions; these
tests prove the shared answers have the operators' defining *shapes*:
stats accounting identities (n_nulls + non-null mass == n_rows, NDV
counts injected nulls out, MCV tie-break is deterministic smallest-
value), exact bitmap algebra on hand-built sets including users that
share a 62-bit word, semi-join no-fanout, SN bounded per-mention
fan-out, and loose-funnel semantics vs per-step timeouts.
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


def test_streaming_semi_join_no_fanout(spark):
    # A view with MANY matching purchases must emit exactly once —
    # the defining property a semi join adds over q75's inner form.
    from watermark_remove_spark.queries import q133_streaming_semi_attribution

    rows = q133_streaming_semi_attribution(spark, SF).collect()
    assert rows, "no converted views"
    ids = [r["view_id"] for r in rows]
    assert len(ids) == len(set(ids)), "semi join fanned out a view"
    ev = spark.read.parquet(f"{SF}/events.parquet")
    n_views = ev.where(F.col("event_type") == "view").count()
    assert len(ids) < n_views, "every view converted — predicate vacuous"


def test_sorted_neighborhood_shape(spark):
    from watermark_remove_spark.queries import q134_sorted_neighborhood_pairs

    rows = q134_sorted_neighborhood_pairs(spark, SF).collect()
    assert rows, "no candidate pairs"
    seen = set()
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["dist"] <= 2
        key = (r["id_a"], r["id_b"], r["name_a"], r["name_b"])
        assert key not in seen, "duplicate pair across passes survived distinct"
        seen.add(key)
    # skew-proof fan-out: each mention generates <= 2 neighbors per
    # pass x 2 passes = at most 4 pairs where it is the LEFT element
    from collections import Counter

    left_counts = Counter()
    for r in rows:
        left_counts[r["id_a"]] += 1
        left_counts[r["id_b"]] += 1
    assert max(left_counts.values()) <= 8


def test_funnel_loose_vs_timeout(spark, tmp_path):
    # user 1: view -> unrelated event -> click (30 min) -> purchase
    # (30 min later): converts under the LOOSE semantics (q65's strict
    # CEP would reject the intervening event).  user 2: click arrives
    # 2 h after the view — times out at the click step.
    from datetime import datetime, timedelta

    from watermark_remove_spark.queries import q135_funnel_with_timeouts

    t0 = datetime(2026, 3, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, "view", 0.0, "{}"),
        (2, t0 + timedelta(minutes=5), 1, "pageping", 0.0, "{}"),
        (3, t0 + timedelta(minutes=30), 1, "click", 0.0, "{}"),
        (4, t0 + timedelta(minutes=60), 1, "purchase", 0.0, "{}"),
        (5, t0, 2, "view", 0.0, "{}"),
        (6, t0 + timedelta(hours=2), 2, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    tmp = str(tmp_path / "ev")
    df.write.mode("overwrite").parquet(f"{tmp}/events.parquet")
    out = q135_funnel_with_timeouts(spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_entered"] == 2
    assert r["n_clicked"] == 1      # user 2 timed out
    assert r["n_purchased"] == 1    # user 1 converted despite pageping
    assert r["conv_ppm"] == 500000


def test_cdc_incremental_apply_keeps_tombstones(spark):
    # One key: v1 @ Jan 1, DELETE @ Jan 5 (batch 1), re-opening v2
    # @ Jan 9 (batch 2).  The incremental loop must keep v1 closed at
    # the DELETE (Jan 5) — a loop that drops tombstones between
    # batches recomputes v1.valid_to = Jan 9 and resurrects 4 days.
    from datetime import datetime

    from watermark_remove_spark.operators.scd2 import scd2_apply

    dim = spark.createDataFrame(
        [("k1", "v1", datetime(2026, 1, 1), None, "upsert")],
        "source string, fp string, valid_from timestamp, valid_to timestamp, cdc_op string",
    )
    b1 = spark.createDataFrame(
        [("k1", None, datetime(2026, 1, 5), "delete")],
        "source string, fp string, valid_from timestamp, op string",
    )
    b2 = spark.createDataFrame(
        [("k1", "v2", datetime(2026, 1, 9), "upsert")],
        "source string, fp string, valid_from timestamp, op string",
    )
    s1 = scd2_apply(dim, b1, ["source"], ts_col="valid_from", op_col="op",
                    dim_op_col="cdc_op", keep_tombstones=True)
    s2 = scd2_apply(s1, b2, ["source"], ts_col="valid_from", op_col="op",
                    dim_op_col="cdc_op", keep_tombstones=True)
    rows = {
        r["fp"]: r for r in s2.where(F.col("cdc_op") != "delete").collect()
    }
    assert rows["v1"]["valid_to"] == datetime(2026, 1, 5), "tombstone lost: v1 resurrected"
    assert rows["v2"]["valid_to"] is None


def test_streaming_cdc_apply_matches_oneshot(spark):
    from watermark_remove_spark.queries import (
        q41_scd2_cdc_deletes,
        q136_streaming_cdc_apply,
    )

    one = sorted(map(tuple, q41_scd2_cdc_deletes(spark, SF).collect()))
    inc = sorted(map(tuple, q136_streaming_cdc_apply(spark, SF).collect()))
    assert inc == one


def test_prefix_filter_complete_vs_bruteforce(spark):
    # The prefix filter is a PROVEN-complete pruning: its output must
    # equal the brute-force all-pairs Jaccard >= 3/4 join exactly.
    from watermark_remove_spark.functions.shingles import doc_shingles_expr
    from watermark_remove_spark.queries import q137_prefix_filter_simjoin

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sets = {
        r["doc_id"]: set(r["sh"])
        for r in docs.select(
            "doc_id", doc_shingles_expr(F.col("text")).alias("sh")
        ).collect()
    }
    ids = sorted(sets)
    brute = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 4 * inter >= 3 * union:
                brute.add((a, b, inter))
    got = {
        (r["id_a"], r["id_b"], r["n_inter"])
        for r in q137_prefix_filter_simjoin(spark, SF).collect()
    }
    assert got == brute, "prefix filter dropped or invented a pair"


def test_star_join_shape(spark):
    from watermark_remove_spark.queries import q138_regional_supplier_volume

    rows = q138_regional_supplier_volume(spark, "/root/testdata/sf0.01").collect()
    assert rows, "no regional volume"
    for r in rows:
        assert r["r_name"] in ("ASIA", "EUROPE")
        assert r["revenue"] > 0
        assert r["n_items"] >= 1
