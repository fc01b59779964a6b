"""Round-4s operators: equi-depth histograms, posting-list varint
economics, multi-pattern blocklist tagging.

Properties proven: equi-depth buckets match a brute-force nearest-rank
construction, are contiguous/ordered, and depth is balanced up to the
heaviest single value's multiplicity; varint accounting matches an
exact LEB128 byte-count reconstruction on a fixture that exercises all
three density bands and 1/2/3-byte gaps; the blocklist tagger matches a
brute-force gram scan, flags exactly the pii/toxic categories as
blocked, and catches a 3-token phrase a bigram-only tagger would miss.
"""

from __future__ import annotations

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _line_grams(text: str, k: int) -> list[str]:
    out = []
    for ln in text.split("\n"):
        toks = [t for t in ln.split(" ") if t]
        if not toks:
            continue
        if len(toks) <= k:
            out.append(" ".join(toks))
        else:
            out.extend(
                " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
            )
    return out


def test_equidepth_matches_bruteforce(spark):
    from watermark_remove_spark.queries import _Q168_B, q168_equidepth_histogram

    vals = sorted(
        v
        for (v,) in duckdb.sql(
            f"SELECT n_chars FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    n = len(vals)
    # nearest-rank bucket per distinct value
    from collections import Counter

    cnt = Counter(vals)
    cum, buckets = 0, {}
    for v in sorted(cnt):
        cum += cnt[v]
        buckets.setdefault((cum - 1) * _Q168_B // n + 1, []).append((v, cnt[v]))
    expect = {
        b: (vs[0][0], vs[-1][0], sum(c for _, c in vs), len(vs))
        for b, vs in buckets.items()
    }

    got = {
        r["bucket"]: (r["lo"], r["hi"], r["n_rows"], r["ndv"])
        for r in q168_equidepth_histogram(spark, SF).collect()
    }
    assert got == expect
    assert len(got) == _Q168_B  # enough NDV to fill every bucket here
    # buckets are contiguous, ordered, and cover all rows
    bs = sorted(got)
    for a, b in zip(bs, bs[1:]):
        assert got[a][1] < got[b][0]
    assert sum(v[2] for v in got.values()) == n
    # depth balance: no bucket exceeds N/B by more than the heaviest value
    heaviest = max(cnt.values())
    assert all(v[2] <= n // _Q168_B + heaviest for v in got.values())


def test_varint_audit_matches_bruteforce(spark, tmp_path):
    """Fixture exercises all three density bands and 1/2/3-byte gaps:
    'common' appears in every doc (gap 1), 'mid' in 1/4 of docs,
    'rare' twice with a >= 16384 doc_id gap (3-byte varint)."""
    from watermark_remove_spark.queries import q169_posting_compression_audit

    rows = []
    for i in range(40):
        txt = "common" + (" mid" if i % 4 == 0 else "")
        rows.append(
            {"doc_id": i, "text": txt, "lang": "en", "source": "s", "n_chars": 9}
        )
    for did in (100, 20000):  # gap 19900 -> 3-byte varint
        rows.append(
            {"doc_id": did, "text": "rare common", "lang": "en", "source": "s", "n_chars": 11}
        )
    pd.DataFrame(rows).to_parquet(f"{tmp_path}/documents.parquet", index=False)

    def varint(g: int) -> int:
        return 1 if g < 128 else 2 if g < 16384 else 3 if g < 2097152 else 4

    postings = {"common": list(range(40)) + [100, 20000], "mid": list(range(0, 40, 4)), "rare": [100, 20000]}
    n = 42
    expect: dict[str, list[int]] = {}
    for tok, ids in postings.items():
        df = len(ids)
        band = "rare" if df * 10 < n else "mid" if df * 2 < n else "common"
        gaps = [ids[0] + 1] + [b - a for a, b in zip(ids, ids[1:])]
        e = expect.setdefault(band, [0, 0, 0])
        e[0] += 1
        e[1] += len(gaps)
        e[2] += sum(varint(g) for g in gaps)

    got = {
        r["band"]: r for r in q169_posting_compression_audit(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(expect) == {"rare", "mid", "common"}
    for band, (ntok, npost, vbytes) in expect.items():
        r = got[band]
        assert (r["n_tokens"], r["n_postings"], r["varint_bytes"]) == (
            ntok,
            npost,
            vbytes,
        )
        assert r["raw_bytes"] == 8 * npost
        assert r["savings_ppm"] == (8 * npost - vbytes) * 1_000_000 // (8 * npost)
    # the dense list really saves more than the rare one
    assert got["common"]["savings_ppm"] > got["rare"]["savings_ppm"]


def test_blocklist_tagger_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q170_BLOCKLIST,
        q170_blocklist_tagger,
    )

    docs = duckdb.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall()
    bl = dict(_Q170_BLOCKLIST)
    expect = {}
    for did, tx in docs:
        grams = set(_line_grams(tx, 2)) | set(_line_grams(tx, 3))
        hits = {p: c for p, c in bl.items() if p in grams}
        if hits:
            mask = 0
            for c in hits.values():
                mask |= c
            expect[did] = (len(hits), mask, (mask & 3) != 0)

    got = {
        r["doc_id"]: (r["n_phrases"], r["cat_mask"], r["blocked"])
        for r in q170_blocklist_tagger(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0
    # non-vacuity across the policy surface: some blocked, some
    # spam-only (cat 4, not blocked), and the trigram pattern fires
    assert any(b for _, _, b in got.values())
    assert any(m == 4 and not b for _, m, b in got.values())
    tri = [
        did
        for did, tx in docs
        if "big order scan" in set(_line_grams(tx, 3))
    ]
    assert tri and all(got[d][1] & 4 for d in tri)
