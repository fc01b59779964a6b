"""Round-4e operators: BM25 integer-kernel retrieval invariants.

The oracle hash proves Spark == DuckDB; these tests prove the shared
answer has BM25's *shape* — dense top-k ranks, non-increasing scores,
and the tf-saturation property (more occurrences of a query term never
lower a doc's term score) that distinguishes BM25 from raw tf ranking.
"""

from __future__ import annotations

from watermark_remove_spark.queries import _Q105_QUERIES, q105_bm25_retrieval

SF = "/root/testdata/sf0.001"


def test_bm25_topk_shape(spark):
    rows = q105_bm25_retrieval(spark, SF).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert set(by_q) == {q for q, _ in _Q105_QUERIES}, "a query matched nothing"
    n_terms_per_q = {}
    for q, _t in _Q105_QUERIES:
        n_terms_per_q[q] = n_terms_per_q.get(q, 0) + 1
    full_match = 0
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        scores = [r["score_milli"] for r in rs]
        assert scores == sorted(scores, reverse=True), (qid, scores)
        assert all(s > 0 for s in scores)
        for r in rs:
            assert 1 <= r["n_terms"] <= n_terms_per_q[qid]
            full_match += r["n_terms"] == n_terms_per_q[qid]
    assert full_match > 0, "no top-5 doc matches all its query's terms"


def test_bm25_kernel_tf_saturation(spark):
    # the integer kernel must be monotone non-decreasing in tf and
    # saturating: the marginal gain of tf 1->2 exceeds that of 9->10
    # (k1 damping) — the property a raw-tf ranking lacks.
    a, n, dl, idf = 30_000, 500, 60, 1_000
    def s(tf):
        return (idf * 22 * tf * a) // (10 * tf * a + 3 * a + 9 * n * dl)
    vals = [s(tf) for tf in range(1, 11)]
    assert vals == sorted(vals), vals
    assert (vals[1] - vals[0]) > (vals[9] - vals[8]) > 0, vals
