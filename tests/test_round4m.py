"""Round-4m operators: streaming exact bitmap distinct, LM hit-rate
scoring, referential-integrity audit.

Properties proven against brute force: the bitmap popcount equals the
true set size with real duplicates present, the hit-ppm matches a
Python reimplementation and has spread, and the FK audit detects
DELIBERATELY injected orphans and unused parents (the clean TPC-H
tables can never exercise the orphan path).
"""

from __future__ import annotations

import pandas as pd

import duckdb

SF = "/root/testdata/sf0.001"


def test_streaming_bitmap_distinct_is_exact_with_duplicates(spark):
    from watermark_remove_spark.queries import _Q150_N, q150_streaming_bitmap_distinct

    t0 = 1767225600
    ev = [(i % 100, t0 + i * 5) for i in range(_Q150_N)] + [
        (3 * i, t0 + 2400 + i) for i in range(100)
    ]
    per_window: dict[int, list[int]] = {}
    for u, ts in ev:
        per_window.setdefault(ts // 600 * 600, []).append(u)

    got = {
        r["window_start_epoch"]: r
        for r in q150_streaming_bitmap_distinct(spark, SF).collect()
    }
    assert set(got) == set(per_window)
    dup_windows = 0
    for w, users in per_window.items():
        distinct = set(users)
        assert got[w]["n_distinct"] == len(distinct)
        assert got[w]["n_words"] == len({u // 64 for u in distinct})
        dup_windows += len(users) > len(distinct)
    # the fixture must actually contain within-window duplicates, or
    # exactness-under-dups is untested
    assert dup_windows > 0


def test_lm_hit_scoring_matches_brute_force(spark):
    from watermark_remove_spark.queries import q151_lm_hit_scoring

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    table: dict[tuple[str, str], int] = {}
    doc_pairs: dict[int, list[tuple[str, str]]] = {}
    for doc_id, text in rows:
        toks = [t for t in text.split(" ") if t]
        ps = list(zip(toks, toks[1:]))
        if ps:
            doc_pairs[doc_id] = ps
            for p in ps:
                table[p] = table.get(p, 0) + 1
    known = {p for p, c in table.items() if c >= 3}

    got = {r["doc_id"]: r for r in q151_lm_hit_scoring(spark, SF).collect()}
    assert set(got) == set(doc_pairs)
    ppms = []
    for doc_id, ps in doc_pairs.items():
        hits = sum(p in known for p in ps)
        r = got[doc_id]
        assert r["n_bigrams"] == len(ps)
        assert r["n_hits"] == hits
        assert r["hit_ppm"] == hits * 1_000_000 // len(ps)
        ppms.append(r["hit_ppm"])
    assert min(ppms) < max(ppms)  # the signal separates documents


def test_fk_audit_detects_injected_orphans(spark, tmp_path):
    from watermark_remove_spark.queries import q152_referential_integrity_audit

    sf = str(tmp_path)
    # minimal schema copies with DELIBERATE violations:
    # - orders 900/901 reference customer 99 (absent) -> 2 orphan rows
    # - customer 3 places no orders -> 1 unused parent
    # - lineitem edge kept clean -> zeros must stay zeros
    pd.DataFrame({"r_regionkey": [0, 1]}).to_parquet(f"{sf}/region.parquet")
    pd.DataFrame({"n_nationkey": [0, 1], "n_regionkey": [0, 7]}).to_parquet(
        f"{sf}/nation.parquet"
    )
    pd.DataFrame({"c_custkey": [1, 2, 3], "c_nationkey": [0, 1, 1]}).to_parquet(
        f"{sf}/customer.parquet"
    )
    pd.DataFrame(
        {"o_orderkey": [10, 11, 900, 901], "o_custkey": [1, 2, 99, 99]}
    ).to_parquet(f"{sf}/orders.parquet")
    pd.DataFrame({"l_orderkey": [10, 10, 11]}).to_parquet(f"{sf}/lineitem.parquet")
    pd.DataFrame({"s_suppkey": [1], "s_nationkey": [0]}).to_parquet(
        f"{sf}/supplier.parquet"
    )

    got = {
        r["fk_edge"]: r for r in q152_referential_integrity_audit(spark, sf).collect()
    }
    oc = got["orders->customer"]
    assert (oc["orphan_rows"], oc["orphan_keys"]) == (2, 1)
    assert oc["unused_parents"] == 1  # customer 3
    assert oc["parents_referenced"] == 2
    lo = got["lineitem->orders"]
    assert (lo["orphan_rows"], lo["orphan_keys"]) == (0, 0)
    assert lo["unused_parents"] == 2  # orders 900/901 have no lineitems
    nr = got["nation->region"]
    assert (nr["orphan_rows"], nr["orphan_keys"]) == (1, 1)  # regionkey 7
    assert nr["unused_parents"] == 1  # region 1 unreferenced


def test_fk_audit_clean_on_generated_data(spark):
    from watermark_remove_spark.queries import q152_referential_integrity_audit

    for r in q152_referential_integrity_audit(spark, SF).collect():
        assert r["orphan_rows"] == 0, f"{r['fk_edge']} has orphans in testdata"
        assert r["parents_referenced"] + r["unused_parents"] == r["parent_keys"]
        assert r["child_keys"] <= r["child_rows"]
