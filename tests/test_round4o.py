"""Round-4o operators: frequency-weighted record linkage, integer-exact
A/B chi-square guardrail, Luhn-style extractive summarization.

Properties proven against brute force / planted effects: linkage scores
equal an itertools reconstruction and the block purge cap really drops
oversized blocks whole; the chi-square decision fires exactly on a
planted treatment effect (and nowhere else) with the statistic matching
the hand formula; the extracted chunk is the true Luhn argmax.
"""

from __future__ import annotations

import itertools

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _toks(text: str) -> list[str]:
    return [t for t in text.split(" ") if t]


def test_record_linkage_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q156_BLOCK_CAP,
        _Q156_BUCKET,
        _Q156_T,
        _Q156_W,
        q156_record_linkage_scores,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text, lang, source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    recs = [
        {
            "doc_id": d,
            "lang": la,
            "source": src,
            "blk": n // _Q156_BUCKET,
            "tok_cnt": len(_toks(tx)),
            "head": _toks(tx)[0],
        }
        for d, tx, la, src, n in docs
    ]
    freq = {
        "source": {},
        "tok_cnt": {},
        "head": {},
    }
    for r in recs:
        for f in freq:
            freq[f][r[f]] = freq[f].get(r[f], 0) + 1
    blocks: dict[tuple, list[dict]] = {}
    for r in recs:
        blocks.setdefault((r["lang"], r["blk"]), []).append(r)
    expect = {}
    for members in blocks.values():
        if len(members) > _Q156_BLOCK_CAP:
            continue
        for a, b in itertools.combinations(
            sorted(members, key=lambda r: r["doc_id"]), 2
        ):
            score = sum(
                _Q156_W // freq[f][a[f]] if a[f] == b[f] else 0
                for f in ("source", "tok_cnt", "head")
            )
            n_agree = sum(a[f] == b[f] for f in ("source", "tok_cnt", "head"))
            if score >= _Q156_T:
                expect[(a["doc_id"], b["doc_id"])] = (score, n_agree)

    got = {
        (r["doc_a"], r["doc_b"]): (r["score"], r["n_agree"])
        for r in q156_record_linkage_scores(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0  # non-vacuous on real fixtures
    assert len({v[1] for v in got.values()}) > 1  # agreement evidence varies


def test_record_linkage_block_purge_cap(spark, tmp_path):
    """Blocks over the cap are dropped WHOLE: an oversized block of
    mutually-identical records contributes zero pairs, while a small
    block still links."""
    from watermark_remove_spark.queries import (
        _Q156_BLOCK_CAP,
        q156_record_linkage_scores,
    )

    n_big = _Q156_BLOCK_CAP + 1
    rows = [
        # one oversized block: identical fields => would all match
        {
            "doc_id": i,
            "text": "alpha beta",
            "lang": "en",
            "source": "srcX",
            "n_chars": 100,
        }
        for i in range(n_big)
    ] + [
        # one small block of two agreeing docs
        {
            "doc_id": 1000,
            "text": "alpha beta",
            "lang": "de",
            "source": "srcY",
            "n_chars": 200,
        },
        {
            "doc_id": 1001,
            "text": "alpha beta",
            "lang": "de",
            "source": "srcY",
            "n_chars": 205,
        },
    ]
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)
    got = q156_record_linkage_scores(spark, str(tmp_path)).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in got} == {(1000, 1001)}
    assert got[0]["n_agree"] == 3


def test_experiment_guardrail_planted_effect(spark, tmp_path):
    from watermark_remove_spark.queries import q157_experiment_guardrail

    rows = []
    eid = 0
    for u in range(100):
        cohort, arm = u % 5, u % 2
        for day in range(5):
            if cohort == 0:
                conv = arm == 1  # planted effect: treatment always converts
            else:
                conv = day in (0, 2, 4)  # balanced across arms
            rows.append(
                {
                    "event_id": eid,
                    "ts": pd.Timestamp(2024, 1, 1 + day, 12),
                    "user_id": u,
                    "event_type": "purchase" if conv else "view",
                }
            )
            eid += 1
    df = pd.DataFrame(rows)
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(f"{tmp_path}/events.parquet", index=False)

    got = {r["cohort"]: r for r in q157_experiment_guardrail(spark, str(tmp_path)).collect()}
    assert set(got) == set(range(5))
    r0 = got[0]
    assert (r0["conv_t"], r0["nonconv_t"], r0["conv_c"], r0["nonconv_c"]) == (
        50,
        0,
        0,
        50,
    )
    # hand formula: N*1000*(ad-bc)^2 // ((a+b)(c+d)(a+c)(b+d))
    a, b, c, d = 50, 0, 0, 50
    num = (a + b + c + d) * 1000 * (a * d - b * c) ** 2
    den = (a + b) * (c + d) * (a + c) * (b + d)
    assert r0["chi2_milli"] == num // den == 100_000
    assert r0["significant"] is True
    for k in range(1, 5):
        assert got[k]["significant"] is False
        assert got[k]["chi2_milli"] == 0  # ad == bc in the balanced cohorts


def test_extractive_summary_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q158_CHUNK,
        _Q158_SCALE,
        _Q158_TOP_TYPES,
        q158_extractive_summary,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    tf: dict[str, int] = {}
    for _, tx in docs:
        for t in _toks(tx):
            tf[t] = tf.get(t, 0) + 1
    sig = {
        t
        for t, _ in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :_Q158_TOP_TYPES
        ]
    }
    expect = {}
    for d, tx in docs:
        toks = _toks(tx)
        best = None
        for ci in range(0, (len(toks) + _Q158_CHUNK - 1) // _Q158_CHUNK):
            chunk = toks[ci * _Q158_CHUNK : (ci + 1) * _Q158_CHUNK]
            n_sig = sum(t in sig for t in chunk)
            score = n_sig * n_sig * _Q158_SCALE // len(chunk)
            key = (-score, ci)
            if best is None or key < best[0]:
                best = (key, ci, n_sig, len(chunk), score, " ".join(chunk))
        expect[d] = best[1:]

    got = {
        r["doc_id"]: (
            r["chunk_idx"],
            r["n_sig"],
            r["chunk_len"],
            r["score"],
            r["summary"],
        )
        for r in q158_extractive_summary(spark, SF).collect()
    }
    assert got == expect
    # the argmax is non-trivial: not every doc's best chunk is its first
    assert any(v[0] > 0 for v in got.values())
    assert len({v[3] for v in got.values()}) > 1  # score spread
