"""Round-4zi operators: MAD robust outlier gate, redirect-chain
resolution via pointer doubling, KWIC concordance extraction.

Properties proven: MAD table equals a Python two-stage nearest-rank
reimplementation, and an injected contaminated group flags exactly
its planted outliers while a clean tight group flags none (the
shape-adaptivity q104's fixed-percentile clipping can't have); the
redirect map equals a Python pointer-walk (terminals, exact hop
counts, cycle flags; chains of length 1..3 and 2-cycles all
present); KWIC rows equal a Python concordancer (every occurrence,
aligned contexts, boundary truncation at line edges).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

SF = "/root/testdata/sf0.001"


def _median(xs):
    xs = sorted(xs)
    return xs[(len(xs) + 1) // 2 - 1]


def test_mad_gate_reconciles_and_adapts(spark):
    import pandas as pd

    from watermark_remove_spark.queries import q213_mad_outlier_gate

    rows = q213_mad_outlier_gate(spark, SF).collect()
    assert rows

    docs = duckdb.sql(
        f"SELECT lang, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    by_lang = defaultdict(list)
    for lang, text in docs:
        by_lang[lang].append(len([t for t in text.split(" ") if t]))
    got = {r["lang"]: r for r in rows}
    assert set(got) == set(by_lang)
    for lang, xs in by_lang.items():
        med = _median(xs)
        mad = _median([abs(x - med) for x in xs])
        out = sum(1 for x in xs if abs(x - med) > 3 * mad)
        r = got[lang]
        assert r["median_tokens"] == med
        assert r["mad_tokens"] == mad
        assert r["n_docs"] == len(xs)
        assert r["n_outliers"] == out
        assert r["outlier_ppm"] == out * 1_000_000 // len(xs)

    # shape adaptivity on a synthetic corpus: a tight clean group
    # flags nothing; a contaminated one flags exactly its plants
    import tempfile

    d = tempfile.mkdtemp()
    rows_syn = []
    for i in range(40):
        rows_syn.append(("clean", "w " * 100))  # all ~100 tokens
    for i in range(40):
        rows_syn.append(("dirty", "w " * (95 + i % 11)))
    for i in range(4):
        rows_syn.append(("dirty", "w " * 5000))  # planted spam walls
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(rows_syn)),
            "text": [t.strip() for _, t in rows_syn],
            "lang": [l for l, _ in rows_syn],
            "source": ["s"] * len(rows_syn),
            "n_chars": [len(t) for _, t in rows_syn],
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        f"{d}/documents.parquet"
    )
    out = {r["lang"]: r for r in q213_mad_outlier_gate(spark, d).collect()}
    assert out["clean"]["n_outliers"] == 0
    assert out["dirty"]["n_outliers"] == 4


def test_redirect_resolution_matches_walk(spark):
    from watermark_remove_spark.queries import q214_redirect_resolution

    rows = q214_redirect_resolution(spark, SF).collect()
    assert rows

    ids = [
        i
        for (i,) in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]

    def red(u):
        if u % 100 == 97:
            return u + 1
        if u % 100 == 98:
            return u - 1
        if u % 10 in (1, 2, 3):
            return u - 1
        return None

    expected = {}
    for u in ids:
        cur, hops = u, 0
        seen = set()
        while red(cur) is not None and cur not in seen:
            seen.add(cur)
            cur = red(cur)
            hops += 1
        if red(cur) is None:
            expected[u] = (cur, hops, 0)
        else:
            expected[u] = (-1, -1, 1)

    got = {
        r["url_id"]: (r["terminal_id"], r["hops"], r["is_cycle"])
        for r in rows
    }
    assert got == expected
    # fixture really exercises chains of every length and cycles
    hop_set = {h for _, h, c in expected.values() if c == 0}
    assert {0, 1, 2, 3} <= hop_set
    assert any(c == 1 for _, _, c in expected.values())


def test_kwic_matches_python_concordancer(spark):
    from watermark_remove_spark.queries import (
        _Q215_CTX,
        _Q215_TERM,
        q215_kwic_concordance,
    )

    rows = q215_kwic_concordance(spark, SF).collect()
    assert rows

    expected = set()
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        for ln, line in enumerate(text.split("\n")):
            toks = [t for t in line.split(" ") if t]
            for p, t in enumerate(toks, start=1):
                if t == _Q215_TERM:
                    left = " ".join(toks[max(0, p - 1 - _Q215_CTX) : p - 1])
                    right = " ".join(toks[p : p + _Q215_CTX])
                    expected.add((doc_id, ln, p, left, right))

    got = {
        (r["doc_id"], r["line_no"], r["pos"], r["left_ctx"], r["right_ctx"])
        for r in rows
    }
    assert len(got) == len(rows)  # no duplicate emissions
    assert got == expected
    # boundary truncation is exercised (some context shorter than CTX)
    assert any(len(l.split(" ")) < _Q215_CTX or l == "" for _, _, _, l, _ in got)
