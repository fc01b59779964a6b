"""Round-4i operators: dual-feed streaming union with cross-feed
dedup, URL prefix-lattice rollup, and bounded k-hop reachability.

The oracle hash proves Spark == DuckDB on the full expressions; these
tests prove the operators' defining *shapes*: the unioned stream's
answer equals the batch answer over DISTINCT events (the cross-feed
duplicates really are removed, not double-counted), the prefix
lattice obeys its containment identities (every level partitions the
corpus; children sum to their parent), and the 3-hop reach counts
match a brute-force Python BFS with exact per-hop distances.
"""

from __future__ import annotations

from collections import deque

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_stream_union_equals_batch_distinct(spark):
    from watermark_remove_spark.queries import q139_multi_source_stream_union

    got = {
        (r["window_epoch"], r["event_type"]): r["n"]
        for r in q139_multi_source_stream_union(spark, SF).collect()
    }
    want = {
        (r["window_epoch"], r["event_type"]): r["n"]
        for r in (
            spark.read.parquet(f"{SF}/events.parquet")
            .dropDuplicates(["event_id"])
            .groupBy(
                F.unix_timestamp(F.date_trunc("hour", "ts")).alias("window_epoch"),
                "event_type",
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .collect()
        )
    }
    assert got == want, "unioned-stream counts diverge from batch distinct"
    # the overlap rows (event_id % 10 == 5) must exist, or the
    # cross-feed dedup path was never exercised
    n_overlap = (
        spark.read.parquet(f"{SF}/events.parquet")
        .where(F.col("event_id") % 10 == 5)
        .count()
    )
    assert n_overlap > 0, "fixture has no cross-feed duplicate rows"


def test_url_rollup_containment(spark):
    from watermark_remove_spark.queries import q140_url_hierarchy_rollup

    rows = q140_url_hierarchy_rollup(spark, SF).collect()
    n_docs_total = spark.read.parquet(f"{SF}/documents.parquet").count()
    by_level: dict[int, list] = {}
    for r in rows:
        by_level.setdefault(r["level"], []).append(r)
    assert sorted(by_level) == [1, 2, 3]
    # each level partitions the corpus: every doc contributes exactly
    # one prefix per level
    for lvl, lrows in by_level.items():
        assert sum(r["n_docs"] for r in lrows) == n_docs_total, lvl
        assert sum(r["total_chars"] for r in lrows) == sum(
            x["total_chars"] for x in by_level[1]
        )
    # children sum to their parent (prefix containment)
    parent_docs = {r["prefix"]: r["n_docs"] for r in by_level[2]}
    child_sum: dict[str, int] = {}
    for r in by_level[3]:
        parent = r["prefix"].rsplit("/", 1)[0]
        child_sum[parent] = child_sum.get(parent, 0) + r["n_docs"]
    assert child_sum == parent_docs


def test_khop_matches_brute_bfs(spark):
    from watermark_remove_spark.queries import (
        _q62_edges,
        _t_wide,
        q141_khop_reachability,
    )

    docs = _t_wide(spark, SF, "documents")
    edges = [
        (r["src"], r["dst"])
        for r in _q62_edges(docs, min_shared=2).collect()
    ]
    assert edges, "fixture produced no near-dup edges"
    adj: dict[int, set[int]] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def bfs_reach(src: int) -> tuple[int, int, int]:
        dist = {src: 0}
        q = deque([src])
        while q:
            u = q.popleft()
            if dist[u] == 3:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        reach = [0, 0, 0]
        for v, d in dist.items():
            if v == src:
                continue
            for k in range(d, 4):
                if k >= 1:
                    reach[k - 1] += 1
        return tuple(reach)

    want = {s: bfs_reach(s) for s in adj}
    got = {
        r["doc_id"]: (r["reach_1"], r["reach_2"], r["reach_3"])
        for r in q141_khop_reachability(spark, SF).collect()
    }
    assert got == want, "k-hop reach counts diverge from brute BFS"
    for r1, r2, r3 in got.values():
        assert r1 <= r2 <= r3, "reach counts not monotone in hop"
