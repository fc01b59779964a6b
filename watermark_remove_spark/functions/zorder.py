"""Z-order (Morton) interleaving for multi-dimensional data layout.

A 100 TB table can be min/max-pruned on only ONE sort dimension; a
Z-order curve interleaves the bits of two dimensions so files clustered
by z-value carry TIGHT min/max ranges on BOTH — the layout trick behind
Delta/Iceberg ``OPTIMIZE ZORDER BY`` data skipping.  This module
computes the z-value as a pure-Catalyst integer expression (zero
Python, zero shuffle — a map-side column any writer can
``repartitionByRange`` on) and the matching DuckDB fragment so the
layout math itself sits on the driver's exact oracle.

Bit interleave for 16-bit x, y:
    z = sum_i ((x>>i & 1) << 2i  |  (y>>i & 1) << 2i+1)

All arithmetic is bigint shifts/adds — bit-identical in Spark, DuckDB
and Python.  Literal shift amounts only (PySpark's shiftright needs a
literal numBits), unrolled over the 16 bit positions; Catalyst
constant-folds the masks so the expression stays inside whole-stage
codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

BITS = 16


def zvalue_expr(x: Column, y: Column, bits: int = BITS) -> Column:
    """bigint z-value interleaving the low ``bits`` bits of x and y.

    Callers clamp/bucket their dims into [0, 2^bits) first; the
    expression masks defensively so out-of-range inputs cannot collide
    across bit positions."""
    terms = []
    for i in range(bits):
        xb = F.shiftright(x.cast("bigint"), i).bitwiseAND(F.lit(1))
        yb = F.shiftright(y.cast("bigint"), i).bitwiseAND(F.lit(1))
        terms.append(
            F.shiftleft(xb, 2 * i) + F.shiftleft(yb, 2 * i + 1)
        )
    z = terms[0]
    for t in terms[1:]:
        z = z + t
    return z.cast("bigint")


def duck_zvalue(x: str, y: str, bits: int = BITS) -> str:
    """DuckDB SQL fragment mirroring :func:`zvalue_expr` exactly."""
    terms = [
        f"(((({x}) >> {i}) & 1) << {2 * i}) + (((({y}) >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"
