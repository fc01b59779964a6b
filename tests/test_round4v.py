"""Round-4v operators (filling the retired q159/q161/q162 slots):
tokenizer OOV-rate audit, conversion-latency percentiles, per-file
Bloom data-skipping audit.

Properties proven: OOV rates match a brute-force vocab induction and
the vocab cut is non-vacuous (real OOV mass in every lang); latency
percentiles match a per-user replay with the censoring rule honored;
the Bloom audit never misses a truly-containing file (no false
negatives — the property that makes skipping SAFE), reproduces false
positives exactly on an adversarial fixture, and scan_ppm prices them.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _tokens(text: str) -> list[str]:
    return [t for ln in text.split("\n") for t in ln.split(" ") if t]


def test_oov_rate_matches_bruteforce(spark):
    from watermark_remove_spark.queries import _Q159_VOCAB_K, q159_oov_rate_audit

    docs = duckdb.sql(f"SELECT lang, text FROM '{SF}/documents.parquet'").fetchall()
    tf: dict[str, int] = {}
    for _, tx in docs:
        for t in _tokens(tx):
            tf[t] = tf.get(t, 0) + 1
    vocab = {
        t
        for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_Q159_VOCAB_K
        ]
    }
    stats: dict[str, list] = {}
    for lang, tx in docs:
        s = stats.setdefault(lang, [0, 0, set(), set()])
        for t in _tokens(tx):
            s[0] += 1
            s[2].add(t)
            if t not in vocab:
                s[1] += 1
                s[3].add(t)

    got = {r["lang"]: r for r in q159_oov_rate_audit(spark, SF).collect()}
    assert set(got) == set(stats)
    for lang, (nt, no, types, oovt) in stats.items():
        r = got[lang]
        assert (r["n_tokens"], r["n_oov_tokens"]) == (nt, no)
        assert (r["n_types"], r["n_oov_types"]) == (len(types), len(oovt))
        assert r["oov_ppm"] == no * 1_000_000 // nt
        assert 0 < r["oov_ppm"] < 1_000_000  # the cut is non-vacuous


def test_conversion_latency_matches_replay(spark):
    from watermark_remove_spark.queries import q161_conversion_latency

    rows = duckdb.sql(
        f"""SELECT user_id, event_type, min(ts) FROM '{SF}/events.parquet'
            WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2"""
    ).fetchall()
    firsts: dict[int, dict[str, object]] = {}
    for u, et, t in rows:
        firsts.setdefault(u, {})[et] = t
    per_day: dict[str, list[int]] = {}
    for ets in firsts.values():
        if "view" in ets and "purchase" in ets and ets["purchase"] >= ets["view"]:
            tv, tp = ets["view"], ets["purchase"]
            lat = (int(tp.timestamp()) - int(tv.timestamp())) // 3600
            per_day.setdefault(tv.strftime("%Y-%m-%d"), []).append(lat)

    def nearest_rank(vals, pct):
        vs = sorted(vals)
        cum = 0
        from collections import Counter

        c = Counter(vs)
        for v in sorted(c):
            cum += c[v]
            if 100 * cum >= pct * len(vs):
                return v
        raise AssertionError

    got = {r["cohort_day"]: r for r in q161_conversion_latency(spark, SF).collect()}
    assert set(got) == set(per_day)
    for day, lats in per_day.items():
        r = got[day]
        assert r["n_users"] == len(lats)
        assert r["p50_hours"] == nearest_rank(lats, 50)
        assert r["p90_hours"] == nearest_rank(lats, 90)
    # real spread somewhere: p50 < p90 for at least one cohort
    assert any(r["p50_hours"] < r["p90_hours"] for r in got.values())


def test_bloom_skipping_no_false_negatives(spark):
    from watermark_remove_spark.queries import (
        _Q162_FILE_W,
        _Q162_WORKLOAD,
        q162_bloom_file_skipping_audit,
    )

    docs = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    containing: dict[str, set[int]] = {k: set() for k in _Q162_WORKLOAD}
    for did, tx in docs:
        head = [t for t in tx.split("\n")[0].split(" ") if t][0]
        if head in containing:
            containing[head].add(did // _Q162_FILE_W)

    got = {r["key"]: r for r in q162_bloom_file_skipping_audit(spark, SF).collect()}
    assert set(got) == set(_Q162_WORKLOAD)
    for k, r in got.items():
        assert r["n_true"] == len(containing[k])
        assert r["n_maybe"] >= r["n_true"]  # blooms never miss (safe to skip)
        assert r["n_false_pos"] == r["n_maybe"] - r["n_true"]
        assert r["scan_ppm"] == r["n_maybe"] * 1_000_000 // r["n_files"]
    # some key skips some file: the audit is not vacuous
    assert any(r["n_maybe"] < r["n_files"] for r in got.values())


def test_bloom_skipping_false_positives_reproduced(spark, tmp_path):
    """Adversarial fixture: 64 single-doc... rather, files whose heads
    saturate the 64-bit bloom so absent keys collide — false positives
    must appear and be priced, never hidden."""
    from watermark_remove_spark.queries import (
        _Q162_FILE_W,
        _Q162_WORKLOAD,
        q162_bloom_file_skipping_audit,
    )

    rows = []
    # one file (docs 0..63) containing 40 distinct heads that are NOT
    # in the workload -> ~62% of bloom bits set -> collisions likely
    for i in range(64):
        rows.append(
            {
                "doc_id": i,
                "text": f"filler{i % 40} tail tail",
                "lang": "en",
                "source": "s",
                "n_chars": 20,
            }
        )
    # a second file that truly contains one workload key
    rows.append(
        {
            "doc_id": 64,
            "text": "order something else",
            "lang": "en",
            "source": "s",
            "n_chars": 20,
        }
    )
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    got = {
        r["key"]: r
        for r in q162_bloom_file_skipping_audit(spark, str(tmp_path)).collect()
    }
    assert got["order"]["n_true"] == 1  # the true file is always found
    assert got["order"]["n_maybe"] >= 1
    # the saturated file produces at least one false positive overall
    assert sum(r["n_false_pos"] for r in got.values()) > 0
    assert all(r["n_maybe"] >= r["n_true"] for r in got.values())
