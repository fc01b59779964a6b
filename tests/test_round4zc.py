"""Round-4zc operators: lang-ID granularity audit, retraction-aware
second-moment maintenance, perceptual aHash media dedup.

Properties proven: the per-line majority vote and mixture ppm match a
Python reimplementation of the marker heuristic at both granularities
(with at least one genuinely mixed doc); the signed-delta maintenance
equals the from-scratch recompute on every group with both the
matched-retract and not-matched-insert paths non-vacuous; the aHash
band join finds EXACTLY the brute-force hamming<=3 pairs (pigeonhole
completeness), all planted same-length substitutions are found, and
all planted appends are rejected.
"""

from __future__ import annotations

import duckdb

from watermark_remove_spark.functions.portable_hash import md5_i64_py

SF = "/root/testdata/sf0.001"

MARKERS = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "des"],
}


def _lang_py(text: str) -> str:
    padded = (" " + text.lower() + " ").replace("\n", " ")
    hits = {
        lang: sum(padded.count(f" {w} ") for w in ws)
        for lang, ws in MARKERS.items()
    }
    best = min((-h, lang) for lang, h in hits.items())
    return best[1] if best[0] < 0 else "und"


def test_langid_granularity_bruteforce(spark):
    from watermark_remove_spark.queries import q195_langid_granularity_audit

    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    expect = {}
    for doc_id, source, body in rows:
        text = (
            f"wm-header {source} common header line\n"
            + body
            + f"\nwm-footer {source} shared footer line"
        )
        doc_lang = _lang_py(text)
        votes: dict[str, int] = {}
        for ln in text.split("\n"):
            lang = _lang_py(ln)
            votes[lang] = votes.get(lang, 0) + 1
        maj, c = min(votes.items(), key=lambda kv: (-kv[1], kv[0]))
        n = sum(votes.values())
        expect[doc_id] = (
            doc_lang, maj, n, c, (n - c) * 1_000_000 // n, doc_lang == maj,
        )
    got = {
        r["doc_id"]: (
            r["doc_lang"], r["majority_line_lang"], r["n_lines"],
            r["n_majority_lines"], r["mixture_ppm"], r["granularity_agree"],
        )
        for r in q195_langid_granularity_audit(spark, SF).collect()
    }
    assert got == expect
    # the audit is non-trivial: mixed docs exist, and the doc-level
    # call disagrees with the line majority somewhere
    assert any(v[4] > 0 for v in got.values())
    assert any(not v[5] for v in got.values())
    assert any(v[5] for v in got.values())


def test_retraction_variance_paths_nonvacuous(spark):
    from watermark_remove_spark.queries import q196_retraction_variance

    rows = duckdb.sql(
        f"SELECT doc_id, lang, source, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    n_del = sum(
        1
        for d, lang, _, _ in rows
        if lang != "fr" and md5_i64_py(f"rv#{d}") % 10 < 2
    )
    n_ins = sum(
        1
        for d, lang, _, _ in rows
        if lang == "fr" or md5_i64_py(f"rv#{d}") % 10 >= 8
    )
    assert n_del > 0 and n_ins > 0  # both change paths exercised

    out = q196_retraction_variance(spark, SF).collect()
    assert all(r["matches_recompute"] for r in out)
    # exact recompute check in python for every group
    final: dict[tuple[str, str], list[int]] = {}
    for d, lang, source, x in rows:
        if lang == "fr" or md5_i64_py(f"rv#{d}") % 10 >= 2:
            s = final.setdefault((lang, source), [0, 0, 0])
            s[0] += 1
            s[1] += x
            s[2] += x * x
    got = {
        (r["lang"], r["source"]): (
            r["n_docs"], r["sum_chars"], r["sumsq_chars"], r["m2"],
        )
        for r in out
    }
    # maintained state may keep retracted-to-zero groups the recompute
    # never sees — they must be exactly (0, 0, 0, 0)
    assert set(final) <= set(got)
    for k, (n, s, q) in final.items():
        assert got[k] == (n, s, q, n * q - s * s)
    zero_groups = set(got) - set(final)
    for k in zero_groups:
        assert got[k] == (0, 0, 0, 0)
    assert zero_groups  # the retract-to-zero edge is actually exercised
    # m2 = n^2 * variance >= 0 always
    assert all(v[3] >= 0 for v in got.values())


def _pix(t: str, P: int) -> list[int]:
    L = len(t)
    out = []
    for j in range(P):
        lo, hi = j * L // P, (j + 1) * L // P
        out.append(
            0 if hi <= lo else sum(ord(c) for c in t[lo:hi]) // (hi - lo)
        )
    return out


def _ahash(t: str, P: int) -> int:
    p = _pix(t, P)
    tot = sum(p)
    return sum((1 << j) for j in range(P) if p[j] * P > tot)


def test_ahash_band_join_complete(spark):
    from watermark_remove_spark.queries import (
        _Q197_HAM_MAX,
        _Q197_PIX,
        q197_ahash_media_dedup,
    )

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    hashes: dict[int, int] = {}
    planted, rejected = [], []
    for d, t in rows:
        hashes[d] = _ahash(t, _Q197_PIX)
        if d % 50 == 0:
            hashes[d + 100000] = _ahash(t[:-3] + " zz", _Q197_PIX)
            hashes[d + 200000] = _ahash(t + " zz", _Q197_PIX)
            planted.append((d, d + 100000))
            rejected.append((d, d + 200000))
    ids = sorted(hashes)
    expect = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(hashes[a] ^ hashes[b]).count("1")
            if h <= _Q197_HAM_MAX:
                expect[(a, b)] = h
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in q197_ahash_media_dedup(spark, SF).collect()
    }
    # pigeonhole completeness: band candidates lose NOTHING at <= 3
    assert got == expect
    for p in planted:
        assert p in got, p  # every same-length substitution found
    for p in rejected:
        assert p not in got, p  # every append (geometry change) rejected
