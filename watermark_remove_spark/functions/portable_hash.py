"""Engine-portable 60-bit hashing (md5-derived) for oracle-checked
operators.

``xxhash64`` is the fastest JVM-side hash but has no DuckDB
counterpart, which left the MinHash/SimHash/LSH queries un-checkable
by the driver's SQL oracle in round 1 (verdict #4).  The portable
scheme used on oracle-checked paths is: **first 15 hex chars of
md5(salt || value), parsed base-16 → BIGINT** (60 bits, always
positive, fits bigint in both engines):

- Spark:   ``conv(substring(md5(s), 1, 15), 16, 10)::bigint``
- DuckDB:  ``('0x' || substr(md5(s), 1, 15))::BIGINT``
- Python:  ``int(hashlib.md5(s).hexdigest()[:15], 16)``

All three are bit-identical (cross-checked in tests).  The streaming
extraction hot path keeps xxhash64 (perf-critical, its oracle works on
shingle strings, not hashes).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, functions as F


def md5_i64_expr(col: Column, salt: str = "") -> Column:
    """Spark side: 60-bit md5-derived bigint of (salt || col)."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")


def duck_md5_i64(expr: str, salt: str = "") -> str:
    """DuckDB SQL fragment mirroring :func:`md5_i64_expr`."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, 15))::BIGINT)"


def md5_i64_py(s: str) -> int:
    """Python mirror (for precomputed literals, e.g. hyperplane signs)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def plane_signs(plane_id: int, dim: int) -> list[float]:
    """Deterministic ±1 pseudo-hyperplane for random-projection LSH.

    Derived from the portable hash, so Spark, DuckDB and Python all see
    the exact same plane; materialized as literals (the signs depend
    only on (plane, dim-index), never on data — zero per-row hashing).
    """
    return [
        1.0 if md5_i64_py(f"hp{plane_id}#{i}") % 2 == 0 else -1.0
        for i in range(dim)
    ]


MERSENNE_P = (1 << 31) - 1


def md5_i28_expr(col: Column, salt: str = "") -> Column:
    """28-bit portable hash (first 7 hex chars) — the base value x for
    the universal-hash permutation family.  28 bits keep a*x + b under
    2^60, so the arithmetic never overflows int64 in either engine
    (DuckDB ERRORS on bigint overflow; Java would silently wrap —
    either way the engines would diverge)."""
    s = F.concat(F.lit(salt), col) if salt else col
    return F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint")


def duck_md5_i28(expr: str, salt: str = "") -> str:
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"(('0x' || substr(md5({inner}), 1, 7))::BIGINT)"


def perm_coeffs(i: int) -> tuple[int, int]:
    """Deterministic (a, b) for permutation i of the universal family
    h_i(x) = (a*x + b) mod (2^31 - 1) — ONE md5 per shingle feeds all
    permutations (the 32-md5s-per-shingle variant benchmarked 2.6x
    slower end to end)."""
    a = md5_i64_py(f"mha{i}") % (MERSENNE_P - 1) + 1
    b = md5_i64_py(f"mhb{i}") % MERSENNE_P
    return a, b


# hex-char bit membership: HEX_BIT_CHARS[r] = hex digits whose bit r is
# set — lets both engines test "bit r of a hex digit" with a plain IN
# list, no base conversion (used by the portable SimHash)
HEX_BIT_CHARS: list[str] = [
    "13579bdf",  # bit 0 (LSB)
    "2367abef",  # bit 1
    "4567cdef",  # bit 2
    "89abcdef",  # bit 3
]
