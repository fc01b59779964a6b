"""Round-4zg operators: streaming windowed bottom-k distinct sample,
group-atomic k-fold contamination matrix, churn training-set
construction.

Properties proven: the streaming sample equals a Python bottom-k-of-
bucket-mins reconstruction from the derived-page timeline (hashes
ascending, ranks contiguous, <= k rows per group) and is
duplicate-insensitive by construction; the k-fold matrix reconciles
against a Python shingle/fold reconstruction, folds are group-atomic,
and contamination is non-vacuous (some pair shares grams); the churn
set reconciles against a Python reimplementation with leakage-safe
boundaries (no feature row after cutoff, labels only from the
horizon) and both label classes present.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict
from datetime import datetime, timedelta

import duckdb

SF = "/root/testdata/sf0.001"


def _mc_hash(s: str, salt: str) -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:13], 16)


def test_streaming_sample_matches_python(spark):
    from watermark_remove_spark.functions.sketches import SMP_BUCKETS, SMP_K
    from watermark_remove_spark.queries import q207_streaming_windowed_sample

    rows = q207_streaming_windowed_sample(spark, SF).collect()
    assert rows

    docs = duckdb.sql(
        f"SELECT doc_id, source, lang FROM '{SF}/documents.parquet'"
    ).fetchall()
    t0 = datetime(2026, 1, 1)
    bucket_min = {}
    for doc_id, source, lang in docs:
        url = f"https://{source}.example.com/p/{doc_id}"
        ts = t0 + timedelta(seconds=47 * doc_id)
        ws = int(ts.timestamp()) // 600 * 600
        h = _mc_hash(url, "smp#")
        key = (ws, lang, h % SMP_BUCKETS)
        cur = bucket_min.get(key)
        if cur is None or (h, url) < cur:
            bucket_min[key] = (h, url)
    expected = defaultdict(list)
    for (ws, lang, _b), hv in bucket_min.items():
        expected[(ws, lang)].append(hv)
    for k in expected:
        expected[k] = sorted(expected[k])[:SMP_K]

    got = defaultdict(list)
    for r in rows:
        got[(r["window_start_epoch"], r["lang"])].append(
            (r["rank"], r["sample_hash"], r["url"])
        )
    assert set(got) == set(expected)
    for k, lst in got.items():
        lst.sort()
        assert [r for r, _, _ in lst] == list(range(1, len(lst) + 1))
        assert [(h, u) for _, h, u in lst] == expected[k]
        hashes = [h for _, h, _ in lst]
        assert hashes == sorted(hashes)


def test_kfold_contamination_reconciles(spark):
    from watermark_remove_spark.functions.portable_hash import md5_i64_py
    from watermark_remove_spark.functions.shingles import doc_shingles_expr  # noqa: F401
    from watermark_remove_spark.queries import _Q208_K, q208_kfold_contamination

    rows = q208_kfold_contamination(spark, SF).collect()
    assert rows
    assert any(r["n_shared_grams"] > 0 for r in rows)  # non-vacuous

    def shingles(text):
        out = set()
        for ln in text.split("\n"):
            toks = [t for t in ln.split(" ") if t]
            if not toks:
                continue
            if len(toks) <= 3:
                out.add(" ".join(toks))
            else:
                out.update(
                    " ".join(toks[i : i + 3])
                    for i in range(len(toks) - 2)
                )
        return out

    docs = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    fold_grams = defaultdict(set)
    fold_docs = defaultdict(int)
    source_fold = {}
    for source, text in docs:
        f = md5_i64_py("fold#" + source) % _Q208_K
        # group atomicity: one source -> one fold, always
        assert source_fold.setdefault(source, f) == f
        fold_docs[f] += 1
        fold_grams[f] |= shingles(text)

    got = {(r["fold_a"], r["fold_b"]): r for r in rows}
    pairs = {
        (a, b)
        for a in fold_grams
        for b in fold_grams
        if a < b and fold_grams[a] & fold_grams[b]
    }
    assert set(got) == pairs
    for (a, b), r in got.items():
        inter = len(fold_grams[a] & fold_grams[b])
        union = len(fold_grams[a] | fold_grams[b])
        assert r["n_shared_grams"] == inter
        assert r["n_grams_a"] == len(fold_grams[a])
        assert r["n_grams_b"] == len(fold_grams[b])
        assert r["n_docs_a"] == fold_docs[a]
        assert r["n_docs_b"] == fold_docs[b]
        assert r["jaccard_ppm"] == inter * 1_000_000 // union


def test_churn_set_leakage_safe(spark):
    from watermark_remove_spark.queries import (
        _Q209_CUTOFF,
        _Q209_FEAT_DAYS,
        _Q209_HORIZON_DAYS,
        q209_churn_training_set,
    )

    rows = q209_churn_training_set(spark, SF).collect()
    assert rows
    labels = {r["churned"] for r in rows}
    assert labels <= {0, 1} and len(labels) == 2  # both classes present

    cut = datetime.fromisoformat(_Q209_CUTOFF)
    lo = cut - timedelta(days=_Q209_FEAT_DAYS)
    hi = cut + timedelta(days=_Q209_HORIZON_DAYS)
    ev = duckdb.sql(
        f"SELECT user_id, ts, event_type, value FROM '{SF}/events.parquet'"
    ).fetchall()
    feats = defaultdict(lambda: [0, set(), 0, None])  # n, types, cents, last
    alive = set()
    for u, ts, et, v in ev:
        if lo <= ts < cut:
            f = feats[u]
            f[0] += 1
            f[1].add(et)
            f[2] += round(v * 10**6)
            f[3] = max(f[3], ts) if f[3] else ts
        elif cut <= ts < hi:
            alive.add(u)

    got = {r["user_id"]: r for r in rows}
    assert set(got) == set(feats)  # population = feature-window actives
    for u, (n, types, micro, last) in feats.items():
        r = got[u]
        assert r["n_events"] == n
        assert r["n_types"] == len(types)
        assert abs(r["sum_value"] - micro / 10**6) < 1e-6
        assert r["recency_min"] == int(
            (cut.timestamp() - int(last.timestamp())) // 60
        )
        assert r["churned"] == (0 if u in alive else 1)
