"""Round-4j operators: KMV bottom-k distinct sketch with set algebra
and token-weighted exact percentiles.

The oracle hash proves Spark == DuckDB on the full expressions; these
tests prove the operators' defining *properties* against brute-force
Python: the threshold-pruned bottom-k really is the global bottom-k
(the pre-filter provably loses nothing), the KMV estimators bracket
the exact distinct counts, and the weighted percentile satisfies the
nearest-rank inequalities on exact token mass.
"""

from __future__ import annotations

import hashlib

import duckdb

SF = "/root/testdata/sf0.001"


def _h52(s: str, salt: str) -> int:
    return int(hashlib.md5((salt + s).encode()).hexdigest()[:13], 16)


def test_kmv_bottom_k_is_exact_and_estimates_bracket(spark):
    from watermark_remove_spark.queries import _Q142_K, q142_kmv_distinct_algebra

    rows = duckdb.sql(
        f"SELECT event_type, user_id FROM '{SF}/events.parquet'"
    ).fetchall()
    exact: dict[str, set[int]] = {}
    hashes: dict[str, set[int]] = {}
    for et, uid in rows:
        exact.setdefault(et, set()).add(uid)
        hashes.setdefault(et, set()).add(_h52(str(uid), "kmv#"))

    got = {
        (r["type_a"], r["type_b"]): r
        for r in q142_kmv_distinct_algebra(spark, SF).collect()
    }
    types = sorted(exact)
    assert got, "no audience pairs produced"
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            r = got[(a, b)]
            for side, est in ((a, r["est_a"]), (b, r["est_b"])):
                n = len(exact[side])
                if n < _Q142_K:
                    assert est == n  # sketch is exact below capacity
                else:
                    # brute-force KMV from the full hash set must agree
                    # (proves the bucket-min threshold pruned nothing)
                    hk = sorted(hashes[side])[_Q142_K - 1]
                    assert est == (_Q142_K - 1) * (1 << 52) // hk
                    assert abs(est - n) <= 0.5 * n  # accuracy bracket
            nu = len(exact[a] | exact[b])
            assert abs(r["est_union"] - nu) <= max(0.5 * nu, 5)
            ni = len(exact[a] & exact[b])
            assert abs(r["est_inter"] - ni) <= max(0.6 * nu, 5)


def test_weighted_percentiles_nearest_rank_property(spark):
    from watermark_remove_spark.queries import q143_token_weighted_percentiles

    rows = duckdb.sql(
        f"""SELECT lang, n_chars,
                   len(list_filter(string_split(text, ' '), t -> t <> ''))
            FROM '{SF}/documents.parquet'"""
    ).fetchall()
    mass: dict[str, dict[int, int]] = {}
    for lang, n_chars, tok in rows:
        mass.setdefault(lang, {}).setdefault(n_chars, 0)
        mass[lang][n_chars] += tok

    got = {r["lang"]: r for r in q143_token_weighted_percentiles(spark, SF).collect()}
    assert set(got) == set(mass)
    for lang, per_val in mass.items():
        total = sum(per_val.values())
        r = got[lang]
        assert r["total_tokens"] == total
        for col, num, den in (("wp50_chars", 1, 2), ("wp90_chars", 9, 10)):
            v = r[col]
            at_or_below = sum(w for x, w in per_val.items() if x <= v)
            below = sum(w for x, w in per_val.items() if x < v)
            # nearest-rank: v is the SMALLEST value whose cumulative
            # token mass reaches the target fraction
            assert at_or_below * den >= total * num
            assert below * den < total * num
        assert r["wp50_chars"] <= r["wp90_chars"]
