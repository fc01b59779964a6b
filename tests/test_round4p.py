"""Round-4p operators: asymmetric shingle containment (quote
detection).

Properties proven against brute force / constructed fixtures:
containment detects a planted wholesale quote at exactly 1e6 ppm in the
contained direction while Jaccard-style symmetric evidence stays low,
and matches a Python set-algebra reconstruction on real fixtures.
(The round-4p pagerank and streaming-histogram-quantile queries were
retired as duplicates of q63/q72; their tests went with them.)
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"



def test_containment_detects_planted_quote(spark, tmp_path):
    """A short doc quoted wholesale inside a long one scores 1e6 ppm
    containment in the quoted direction — while the reverse direction
    (and symmetric Jaccard evidence) stays far below it."""
    from watermark_remove_spark.queries import q160_shingle_containment

    quote = "alpha beta gamma delta epsilon zeta"
    long_doc = "\n".join(
        [quote]
        + [f"host{i} filler{i} extra{i} pad{i} tail{i}" for i in range(10)]
    )
    # 30 unique filler docs so the shared shingles survive 10*df < n
    fillers = [
        {
            "doc_id": 100 + i,
            "text": f"uniq{i}a uniq{i}b uniq{i}c uniq{i}d uniq{i}e",
            "lang": "en",
            "source": "s",
            "n_chars": 40,
        }
        for i in range(30)
    ]
    rows = [
        {"doc_id": 1, "text": quote, "lang": "en", "source": "s", "n_chars": 36},
        {"doc_id": 2, "text": long_doc, "lang": "en", "source": "s", "n_chars": 400},
    ] + fillers
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    got = {(r["doc_a"], r["doc_b"]): r for r in q160_shingle_containment(spark, str(tmp_path)).collect()}
    assert (1, 2) in got
    r = got[(1, 2)]
    assert r["cont_a_in_b_ppm"] == 1_000_000  # every quote shingle is in the long doc
    assert r["cont_b_in_a_ppm"] < 200_000  # the reverse direction is weak
    assert r["inter"] == r["n_a"] == 4  # 6 tokens -> 4 k=3 shingles


def test_containment_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q160_MIN_SET,
        _Q160_T_PPM,
        q160_shingle_containment,
    )
    from watermark_remove_spark.spec import shingles

    docs = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    sets = {
        d: {s for ln in tx.split("\n") for s in shingles(ln)} for d, tx in docs
    }
    n = len(docs)
    df: dict[str, int] = {}
    for ss in sets.values():
        for s in ss:
            df[s] = df.get(s, 0) + 1
    kept = {d: {s for s in ss if 10 * df[s] < n} for d, ss in sets.items()}
    ids = sorted(kept)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            na, nb = len(kept[a]), len(kept[b])
            if na < _Q160_MIN_SET or nb < _Q160_MIN_SET:
                continue
            inter = len(kept[a] & kept[b])
            ca, cb = inter * 1_000_000 // na, inter * 1_000_000 // nb
            if inter and max(ca, cb) >= _Q160_T_PPM:
                expect[(a, b)] = (inter, na, nb, ca, cb)

    got = {
        (r["doc_a"], r["doc_b"]): (
            r["inter"],
            r["n_a"],
            r["n_b"],
            r["cont_a_in_b_ppm"],
            r["cont_b_in_a_ppm"],
        )
        for r in q160_shingle_containment(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0  # non-vacuous on real fixtures


