"""Round-4zb operators: streaming MinHash feed-similarity audit,
content-defined chunking, position-bias COEC.

Properties proven: the streamed per-(window, source) signatures and
both jaccard columns equal a full brute-force reconstruction from the
derived pages (estimates non-degenerate: interior match counts exist);
CDC chunking matches a Python mirror and is SHIFT-RESISTANT (a
non-boundary token insertion changes exactly one chunk); COEC matches
the exact integer algebra with the position baseline applied
impression-by-impression.
"""

from __future__ import annotations

import duckdb

from watermark_remove_spark.functions.portable_hash import md5_i64_py

SF = "/root/testdata/sf0.001"


def _derived_docs():
    rows = duckdb.sql(
        f"SELECT doc_id, source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    out = []
    for doc_id, source, text in rows:
        full = (
            f"wm-header {source} common header line\n"
            + text
            + f"\nwm-footer {source} shared footer line"
        )
        toks = {t for ln in full.split("\n") for t in ln.split(" ") if t}
        out.append((doc_id, source, toks))
    return out


def test_streaming_minhash_feed_similarity_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q192_K,
        STATIC_T0_EPOCH,
        q192_streaming_minhash_feed_similarity,
    )

    union: dict[tuple[int, str], set[str]] = {}
    for doc_id, source, toks in _derived_docs():
        ws = STATIC_T0_EPOCH + (doc_id * 47 // 600) * 600
        union.setdefault((ws, source), set()).update(toks)
    sig = {
        k: [
            min(md5_i64_py(f"mh{i}#{t}") for t in toks)
            for i in range(_Q192_K)
        ]
        for k, toks in union.items()
    }
    expect = {}
    for (ws, sa), ta in union.items():
        for (ws2, sb), tb in union.items():
            if ws2 != ws or not sa < sb:
                continue
            m = sum(
                sig[(ws, sa)][i] == sig[(ws, sb)][i] for i in range(_Q192_K)
            )
            inter = len(ta & tb)
            expect[(ws, sa, sb)] = (
                m,
                m * 1_000_000 // _Q192_K,
                inter * 1_000_000 // len(ta | tb),
            )

    got = {
        (r["window_start_epoch"], r["source_a"], r["source_b"]): (
            r["sig_matches"], r["est_jaccard_ppm"], r["true_jaccard_ppm"],
        )
        for r in q192_streaming_minhash_feed_similarity(spark, SF).collect()
    }
    assert got == expect
    matches = [v[0] for v in got.values()]
    # non-degenerate: the estimator actually discriminates
    assert any(0 < m < _Q192_K for m in matches)
    assert any(v[2] > 0 for v in got.values())


def _chunks_py(text: str, mod: int) -> list[str]:
    toks = [t for t in text.replace("\n", " ").split(" ") if t]
    out: list[str] = []
    cur: list[str] = []
    for t in toks:
        cur.append(t)
        if md5_i64_py(f"cdc#{t}") % mod == 0:
            out.append(" ".join(cur))
            cur = []
    if cur:
        out.append(" ".join(cur))
    return out


def test_cdc_chunking_matches_python_mirror(spark):
    from pyspark.sql import functions as F

    from watermark_remove_spark.queries import _Q193_CHUNKS_EXPR, _Q193_MOD

    texts = [
        t for (t,) in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet' LIMIT 25"
        ).fetchall()
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r[0] for r in df.select(F.expr(_Q193_CHUNKS_EXPR)).collect()
    ]
    assert got == [_chunks_py(t, _Q193_MOD) for t in texts]


def test_cdc_chunking_shift_resistance():
    from watermark_remove_spark.queries import _Q193_MOD

    (base,) = duckdb.sql(
        f"SELECT text FROM '{SF}/documents.parquet' WHERE doc_id = 3"
    ).fetchall()[0:1][0]
    toks = [t for t in base.replace("\n", " ").split(" ") if t]
    assert len(toks) > 10
    # insert a NON-boundary token mid-document: exactly one chunk may
    # change, every other chunk is byte-identical (shift resistance —
    # a fixed-width blocker would shift every later block)
    ins = "zqx"
    assert md5_i64_py(f"cdc#{ins}") % _Q193_MOD != 0
    pert = " ".join(toks[:5] + [ins] + toks[5:])
    c0 = _chunks_py(" ".join(toks), _Q193_MOD)
    c1 = _chunks_py(pert, _Q193_MOD)
    assert len(c0) == len(c1)
    diffs = [i for i, (a, b) in enumerate(zip(c0, c1)) if a != b]
    assert len(diffs) == 1


def test_coec_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q194_MIN_IMPR,
        _Q194_POSITIONS,
        q194_position_bias_coec,
    )

    rows = duckdb.sql(
        f"""SELECT event_id, event_type,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
            FROM '{SF}/events.parquet'
            WHERE event_type IN ('view', 'click')
              AND json_extract_string(props, '$.k') IS NOT NULL"""
    ).fetchall()
    pos_stats: dict[int, list[int]] = {}
    for eid, et, item in rows:
        p = eid % _Q194_POSITIONS + 1
        s = pos_stats.setdefault(p, [0, 0])
        s[0] += 1
        s[1] += et == "click"
    ctr = {p: c * 1_000_000 // n for p, (n, c) in pos_stats.items()}
    per: dict[int, list[int]] = {}
    for eid, et, item in rows:
        p = eid % _Q194_POSITIONS + 1
        s = per.setdefault(item, [0, 0, 0])
        s[0] += 1
        s[1] += et == "click"
        s[2] += ctr[p]
    expect = {
        item: (
            n, c, e,
            None if e == 0 else c * 1_000_000_000_000 // e,
        )
        for item, (n, c, e) in per.items()
        if n >= _Q194_MIN_IMPR
    }
    got = {
        r["item"]: (
            r["n_impr"], r["n_clicks"], r["expected_clicks_ppm"],
            r["coec_ppm"],
        )
        for r in q194_position_bias_coec(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0
    # the de-biasing is non-trivial: some item's COEC differs from
    # what raw CTR ranking would imply (expected != n_impr * const)
    assert len({v[2] * 1000 // v[0] for v in got.values()}) > 1
