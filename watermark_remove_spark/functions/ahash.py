"""Vectorized perceptual aHash kernel (q197's media 'decode+feature'
step) — an Arrow-batched pandas UDF, the task-mandated shape for
payload kernels (operators/multimodal.py is the same seam).

Per row: pool the payload's character codes into ``AHASH_PIX`` integer
means (floor), set bit j where ``pix[j] * PIX > sum(pix)`` (the aHash
brighter-than-mean rule).

This replaced two pure-Catalyst higher-order-function versions:
``ascii(substring(col, i, 1))`` per character is O(L^2) per document
(625 s at sf0.1), and a split(seg,'')-based O(L) form still ran an
INTERPRETED per-character lambda (493 s).  numpy sums the same bytes
in C (~2 s).  Semantics are bit-identical to the DuckDB mirror (ord of
each character, floor division): payloads are ASCII in this corpus, so
utf-8 bytes == character codes — checked per row, with an exact
per-character ord fallback for any non-ASCII payload.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf

AHASH_PIX = 60  # pooled "pixels" (60 = portable-hash bigint width)


@pandas_udf("long")
def ahash_udf(payload: pd.Series) -> pd.Series:
    P = AHASH_PIX
    out = np.empty(len(payload), dtype=np.int64)
    for k, s in enumerate(payload):
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8)
        if len(b) != len(s):  # non-ASCII: exact character fallback
            b = np.array([ord(c) for c in s], dtype=np.int64)
        else:
            b = b.astype(np.int64)
        L = len(b)
        pix = np.zeros(P, dtype=np.int64)
        for j in range(P):
            lo, hi = (j * L) // P, ((j + 1) * L) // P
            if hi > lo:
                pix[j] = int(b[lo:hi].sum()) // (hi - lo)
        ptot = int(pix.sum())
        h = 0
        for j in range(P):
            if pix[j] * P > ptot:
                h |= 1 << j
        out[k] = h
    return pd.Series(out)
