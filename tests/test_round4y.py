"""Round-4y operators: dedup yield accounting, transition dwell-time
percentiles, streaming unknown-key DLQ.

Properties proven: the yield funnel matches a brute-force three-level
reconstruction on a fixture with PLANTED exact dups and a near-dup
cluster (each level drops exactly the planted rows, monotone by
construction); dwell percentiles match a per-user replay; the DLQ
counts exactly the planted unknown keys per window with the right ppm.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_dedup_yield_planted_funnel(spark, tmp_path):
    from watermark_remove_spark.queries import q183_dedup_yield

    # 40 unique-content docs (~8 tokens each), plus:
    # - exact dups: docs 100, 101 repeat doc 0's text verbatim
    # - a near-dup cluster: docs 200, 201 share >= 3 rare shingles with
    #   doc 1 but are not byte-identical
    mk = lambda i: " ".join(f"u{i}w{j}" for j in range(8))
    near_base = "alpha beta gamma delta epsilon zeta eta theta"
    rows = (
        [{"doc_id": 1, "text": near_base, "lang": "en", "source": "s", "n_chars": 40}]
        + [
            {"doc_id": i, "text": mk(i), "lang": "en", "source": "s", "n_chars": 40}
            for i in range(2, 41)
        ]
        + [
            {"doc_id": 100, "text": mk(2), "lang": "en", "source": "s", "n_chars": 40},
            {"doc_id": 101, "text": mk(2), "lang": "en", "source": "s", "n_chars": 40},
            {
                "doc_id": 200,
                "text": near_base + " extra1",
                "lang": "en",
                "source": "s",
                "n_chars": 44,
            },
            {
                "doc_id": 201,
                "text": near_base + " extra2",
                "lang": "en",
                "source": "s",
                "n_chars": 44,
            },
        ]
    )
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    r = {x["lang"]: x for x in q183_dedup_yield(spark, str(tmp_path)).collect()}["en"]
    n = len(rows)
    tokens_raw = 8 * 40 + 8 * 2 + 9 * 2  # 40 uniques + 2 exact dups + 2 near
    assert (r["n_docs"], r["tokens_raw"]) == (n, tokens_raw)
    # exact level drops exactly the two byte-identical clones
    assert r["docs_exact"] == n - 2
    assert r["tokens_exact"] == tokens_raw - 16
    # near level additionally drops the two near-dups (keeper doc 1)
    assert r["docs_near"] == n - 4
    assert r["tokens_near"] == tokens_raw - 16 - 18
    assert r["yield_ppm"] == r["tokens_near"] * 1_000_000 // tokens_raw
    # funnel is monotone
    assert r["n_docs"] >= r["docs_exact"] >= r["docs_near"]


def test_dedup_yield_clean_corpus_identity(spark):
    """On the real fixture (no byte-identical texts) the exact level
    is the identity and the near level drops exactly the non-keeper
    members of q62-style clusters."""
    from watermark_remove_spark.queries import q183_dedup_yield

    got = {r["lang"]: r for r in q183_dedup_yield(spark, SF).collect()}
    tot = duckdb.sql(
        f"SELECT lang, count(*) FROM '{SF}/documents.parquet' GROUP BY 1"
    ).fetchall()
    for lang, n in tot:
        r = got[lang]
        assert r["n_docs"] == r["docs_exact"] == n  # no exact dups in fixture
        assert r["docs_near"] <= n
        assert 0 < r["yield_ppm"] <= 1_000_000
    # near-dedup actually bites somewhere on the real corpus
    assert any(r["docs_near"] < r["docs_exact"] for r in got.values())


def test_transition_dwell_matches_replay(spark):
    from watermark_remove_spark.queries import q184_transition_dwell

    rows = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{SF}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict[int, list] = {}
    for u, ts, eid, et in rows:
        by_user.setdefault(u, []).append((ts, eid, et))
    gaps: dict[tuple[str, str], list[int]] = {}
    for seq in by_user.values():
        for (t1, _, e1), (t2, _, e2) in zip(seq, seq[1:]):
            g = (int(t2.timestamp()) - int(t1.timestamp())) // 60
            gaps.setdefault((e1, e2), []).append(g)

    def nr(vals, pct):
        vs = sorted(vals)
        cum = 0
        from collections import Counter

        c = Counter(vs)
        for v in sorted(c):
            cum += c[v]
            if 100 * cum >= pct * len(vs):
                return v
        raise AssertionError

    got = {
        (r["prev_type"], r["curr_type"]): r
        for r in q184_transition_dwell(spark, SF).collect()
    }
    assert set(got) == set(gaps)
    for pair, vals in gaps.items():
        r = got[pair]
        assert r["n_hops"] == len(vals)
        assert r["p50_min"] == nr(vals, 50)
        assert r["p90_min"] == nr(vals, 90)
    assert any(r["p50_min"] < r["p90_min"] for r in got.values())


def test_streaming_dlq_counts_planted_unknowns(spark):
    from watermark_remove_spark.queries import (
        _Q185_N,
        STATIC_T0_EPOCH,
        q185_streaming_unknown_key_dlq,
    )

    expect: dict[int, list[int]] = {}
    for i in range(_Q185_N):
        ws = STATIC_T0_EPOCH + (i * 7 // 600) * 600
        e = expect.setdefault(ws, [0, 0])
        e[0] += 1
        e[1] += (i % 100) % 7 == 0

    got = {
        r["window_start_epoch"]: r
        for r in q185_streaming_unknown_key_dlq(spark, SF).collect()
    }
    assert set(got) == set(expect)
    for ws, (ne, nu) in expect.items():
        r = got[ws]
        assert (r["n_events"], r["n_unknown"]) == (ne, nu)
        assert r["unknown_ppm"] == nu * 1_000_000 // ne
        assert 0 < r["n_unknown"] < r["n_events"]  # signal present, not total
