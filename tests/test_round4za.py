"""Round-4za operators: SymSpell edit-1 correction join, distributed
top-k fetch-depth audit, capped co-occurrence similarity.

Properties proven: the deletion-neighborhood candidate generator is
complete for ed<=1 and the levenshtein filter is non-vacuous (the
transposition 'csan' reaches the candidate set and is dropped); the
fetch-depth audit equals a brute-force shard/rank reconstruction and
respects its pigeonhole bounds; pair mining matches brute force with
the per-user cap provably binding on at least one user.
"""

from __future__ import annotations

import duckdb

from watermark_remove_spark.functions.portable_hash import md5_i64_py

SF = "/root/testdata/sf0.001"


def _vocab_df() -> dict[str, int]:
    rows = duckdb.sql(
        f"""
        SELECT tok, count(*) FROM (
          SELECT doc_id, unnest(list_distinct(flatten(list_transform(
                   string_split(text, chr(10)),
                   ln -> list_filter(string_split(ln, ' '), t -> t <> ''))))) AS tok
          FROM '{SF}/documents.parquet') GROUP BY 1
        """
    ).fetchall()
    return dict(rows)


def _deletions(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))} - {""}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_symspell_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q189_MENTIONS,
        q189_symspell_edit1_join,
    )

    vocab = _vocab_df()
    got = {
        r["mention"]: (r["suggestion"], r["edit_distance"], r["suggestion_df"])
        for r in q189_symspell_edit1_join(spark, SF).collect()
    }
    assert set(got) == set(_Q189_MENTIONS)
    for m in _Q189_MENTIONS:
        # brute force over the FULL vocabulary — the operator's
        # candidate generator must lose nothing at ed<=1
        scored = sorted(
            (
                (_lev(m, t), -df, t)
                for t, df in vocab.items()
                if _lev(m, t) <= 1
            )
        )
        if scored:
            ed, ndf, tok = scored[0]
            assert got[m] == (tok, ed, -ndf), m
        else:
            assert got[m] == (None, None, None), m
    # the planted outcomes all occur
    assert got["batch"][1] == 0
    assert got["strem"] == ("stream", 1, vocab["stream"])
    assert got["csan"] == (None, None, None)
    # ...and csan is dropped by the FILTER, not missed by the
    # generator: it shares a deletion variant with 'scan'
    assert _deletions("csan") & _deletions("scan")
    assert _lev("csan", "scan") == 2


def test_shard_topk_audit_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q190_K,
        _Q190_SHARDS,
        q190_shard_topk_audit,
    )

    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
    ).fetchall()
    order = sorted(docs, key=lambda r: (-r[1], r[0]))
    shard = {d: md5_i64_py(f"shard#{d}") % _Q190_SHARDS for d, _ in docs}
    local_rank: dict[int, int] = {}
    seen: dict[int, int] = {}
    for d, _ in order:
        seen[shard[d]] = seen.get(shard[d], 0) + 1
        local_rank[d] = seen[shard[d]]
    head = order[:_Q190_K]
    expect = {
        d: (g + 1, n, shard[d], local_rank[d])
        for g, (d, n) in enumerate(head)
    }
    fetch_depth = max(local_rank[d] for d, _ in head)

    rows = q190_shard_topk_audit(spark, SF).collect()
    assert len(rows) == _Q190_K
    for r in rows:
        assert expect[r["doc_id"]] == (
            r["global_rank"], r["n_chars"], r["shard"], r["local_rank"],
        )
        assert r["fetch_depth"] == fetch_depth
    # pigeonhole sanity: k' is between ceil(k/shards) and k
    assert -(-_Q190_K // _Q190_SHARDS) <= fetch_depth <= _Q190_K


def test_coclick_matches_bruteforce(spark):
    from watermark_remove_spark.queries import (
        _Q191_CAP,
        _Q191_MIN_CO,
        q191_coclick_similarity,
    )

    rows = duckdb.sql(
        f"""SELECT DISTINCT user_id,
                   CAST(json_extract_string(props, '$.k') AS BIGINT)
            FROM '{SF}/events.parquet'
            WHERE json_extract_string(props, '$.k') IS NOT NULL"""
    ).fetchall()
    per: dict[int, list[int]] = {}
    for u, k in rows:
        per.setdefault(u, []).append(k)
    # the cap must actually bind somewhere or the scale device is
    # untested fiction
    assert any(len(v) > _Q191_CAP for v in per.values())
    co: dict[tuple[int, int], int] = {}
    n: dict[int, int] = {}
    for items in per.values():
        kept = sorted(items, key=lambda k: (md5_i64_py(f"cap#{k}"), k))[
            :_Q191_CAP
        ]
        for it in kept:
            n[it] = n.get(it, 0) + 1
        kept = sorted(kept)
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                p = (kept[i], kept[j])
                co[p] = co.get(p, 0) + 1
    expect = {
        p: (c, n[p[0]], n[p[1]], c * c * 1_000_000 // (n[p[0]] * n[p[1]]))
        for p, c in co.items()
        if c >= _Q191_MIN_CO
    }
    got = {
        (r["item_a"], r["item_b"]): (
            r["co_users"], r["n_a"], r["n_b"], r["cos2_ppm"],
        )
        for r in q191_coclick_similarity(spark, SF).collect()
    }
    assert got == expect
    assert len(got) > 0
