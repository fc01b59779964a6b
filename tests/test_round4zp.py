"""Round-4zp operators: two-pass exact global quantiles, int8
embedding quantization, one-pass multi-distinct (Expand) aggregate.

Properties proven: the bucket-located quantiles equal a full Python
sort's nearest-rank picks (and the located buckets are a strict slice
of the corpus — the two-pass point); quantization reconciles against a
Python replay, every row's error certificate holds (err < scale, i.e.
relative error <= 1/127), and negative components exercise the
sign-explicit division; the multi-distinct counts equal Python set
sizes and the physical plan really is a single-pass Expand.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import Decimal

import duckdb

SF = "/root/testdata/sf0.001"


def test_exact_global_quantiles(spark):
    from watermark_remove_spark.queries import q234_exact_global_quantiles

    rows = {r["p"]: r for r in q234_exact_global_quantiles(spark, SF).collect()}
    assert set(rows) == {50, 90, 99}

    vals = sorted(
        int(Decimal(f"{x:.2f}") * 100)
        for (x,) in duckdb.sql(
            f"SELECT l_extendedprice FROM '{SF}/lineitem.parquet'"
        ).fetchall()
    )
    n = len(vals)
    buckets_hit = set()
    for p in (50, 90, 99):
        r = (n * p + 99) // 100
        assert rows[p]["n_rows"] == n
        assert rows[p]["value_e2"] == vals[r - 1]
        buckets_hit.add(vals[r - 1] // 4096)
    # the pass-2 slice is a strict subset of the corpus
    in_slice = sum(1 for v in vals if v // 4096 in buckets_hit)
    assert 0 < in_slice < n


def test_embedding_quantization_certificate(spark):
    from watermark_remove_spark.queries import q235_embedding_quantization

    rows = {r["vec_id"]: r for r in q235_embedding_quantization(spark, SF).collect()}
    assert rows

    emb = duckdb.sql(
        f"SELECT vec_id, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchall()
    saw_negative = False
    for vid, vec in emb:
        # Python round is banker's; replicate HALF_UP like both engines
        def half_up(x):
            return int(Decimal(repr(x * 1e6)).quantize(0, rounding="ROUND_HALF_UP"))

        s = [half_up(x) for x in vec]
        if any(x < 0 for x in s):
            saw_negative = True
        scale = max(max(abs(x) for x in s), 1)
        q = [(1 if x >= 0 else -1) * ((abs(x) * 127) // scale) for x in s]
        checksum = sum(qi * (i + 1) for i, qi in enumerate(q))
        max_err = max(abs(127 * a - b * scale) for a, b in zip(s, q))
        r = rows[vid]
        assert r["scale"] == scale
        assert r["q_checksum"] == checksum
        assert r["max_err_scaled"] == max_err
        assert r["err_ok"] == 1 and max_err < scale
        assert all(-127 <= qi <= 127 for qi in q)
    assert saw_negative  # sign-explicit division path exercised


def test_multi_distinct_expand_plan(spark):
    from watermark_remove_spark.queries import q236_multi_distinct_profile

    df = q236_multi_distinct_profile(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan  # the one-pass multi-distinct strategy

    rows = {r["event_type"]: r for r in df.collect()}
    ev = duckdb.sql(
        f"SELECT event_type, user_id, ts::DATE FROM '{SF}/events.parquet'"
    ).fetchall()
    agg = defaultdict(lambda: [0, set(), set(), set()])
    for et, uid, d in ev:
        a = agg[et]
        a[0] += 1
        a[1].add(uid)
        a[2].add(d)
        a[3].add((uid, d))
    assert set(rows) == set(agg)
    for et, (n, us, ds, uds) in agg.items():
        r = rows[et]
        assert (r["n_events"], r["nd_users"], r["nd_days"], r["nd_user_days"]) == (
            n,
            len(us),
            len(ds),
            len(uds),
        )
