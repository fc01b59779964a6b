"""O-8/O-9/O-10: mask mining + watermark (boilerplate) removal.

Reference contract being re-expressed (never implemented there):
"Generating a mask for the watermark ... LaMa is an inpainting model
and needs a mask" (reference ``core/lama_wrapper.py:46-52``); the
placeholder transform was grayscale conversion (``:53-54``).  Here the
mask is a per-domain set of xxhash64 shingle hashes and "inpainting"
is deletion of fully-masked lines (normative SPEC in ``spec.py``).

Scale design
------------
- **Mining is 100% JVM**: shingling via Catalyst higher-order functions,
  per-doc ``array_distinct`` BEFORE the explode (map-side dedup), then
  one hash-aggregate ``groupBy(domain, shingle_hash).count()``.  Since
  shingle hash-sets are distinct per doc, ``count(*)`` IS the document
  frequency — no count_distinct(url) shuffle of url strings needed.
- **Masks are small** (boilerplate per domain is bounded) → the
  mask⨝pages join is a broadcast join (O-16), no shuffle of the 100 TB
  pages side.
- **Application** has two interchangeable, parity-tested forms:
  ``clean_pages_expr`` (pure Catalyst, zero Python — the fast path) and
  ``clean_pages_udf`` (vectorized Arrow pandas UDF — the form mandated
  by BASELINE.json:north_star).  Byte-identical outputs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

from ..spec import DEFAULT_SHINGLE_K, MaskConfig, clean_text
from ..functions.shingles import (
    clean_text_expr,
    doc_distinct_shingle_hashes_expr,
    domain_expr,
)

MASK_SCHEMA = "domain string, mask array<bigint>"


def with_domain(pages: DataFrame, url_col: str = "url") -> DataFrame:
    return pages.withColumn("domain", domain_expr(F.col(url_col)))


def mine_masks(pages: DataFrame, cfg: MaskConfig | None = None) -> DataFrame:
    """pages(url, text, ...) -> masks(domain, mask array<bigint> sorted).

    Document frequency = number of distinct urls of the domain whose
    text contains the shingle; mask = hashes with df >= theta * n_pages
    and n_pages >= min_pages.  One wide shuffle on (domain, hash) plus
    one tiny one on domain; both benefit from partial aggregation.
    """
    cfg = cfg or MaskConfig()
    base = with_domain(pages).select("domain", "url", "text")
    # distinct urls only: duplicate (url) rows must not inflate df
    docs = base.dropDuplicates(["domain", "url"])

    counts = (
        docs.select(
            "domain",
            F.explode(doc_distinct_shingle_hashes_expr(F.col("text"), cfg.shingle_k)).alias("h"),
        )
        .groupBy("domain", "h")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    domain_sizes = docs.groupBy("domain").agg(F.count(F.lit(1)).alias("n_pages"))

    return (
        counts.join(F.broadcast(domain_sizes), "domain")
        .where((F.col("n_pages") >= cfg.min_pages) & (F.col("df") >= cfg.theta * F.col("n_pages")))
        .groupBy("domain")
        .agg(F.sort_array(F.collect_set("h")).alias("mask"))
    )


def join_masks(pages: DataFrame, masks: DataFrame) -> DataFrame:
    """Broadcast-join the small mask table onto the big pages side."""
    p = with_domain(pages)
    return p.join(F.broadcast(masks), "domain", "left")


def make_clean_text_udf(k: int = DEFAULT_SHINGLE_K):
    """The mandated vectorized Arrow pandas UDF (north_star: 'inside a
    vectorized pandas/Arrow UDF ... no per-row Python').  Arrow batches
    of (text, mask) come in; the kernel applies the SPEC; per-batch the
    domain mask is usually one of a handful of values, so the frozenset
    conversion is cached across rows."""

    @F.pandas_udf(StringType())
    def extract_clean_text(text: pd.Series, mask: pd.Series) -> pd.Series:
        cache: dict[int, frozenset[int]] = {}

        def mask_set(m) -> frozenset[int]:
            if m is None:
                return frozenset()
            key = id(m)
            got = cache.get(key)
            if got is None:
                got = frozenset(int(x) for x in m)
                cache[key] = got
            return got

        return pd.Series(
            [
                None if t is None else clean_text(t, mask_set(m), k)
                for t, m in zip(text, mask)
            ],
            dtype=object,
        )

    return extract_clean_text


def clean_pages_udf(pages: DataFrame, masks: DataFrame, k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """O-8 via pandas UDF (spec-direct reference form): adds
    ``clean_text``.  The kernel re-hashes every shingle in Python —
    byte-exactness anchor for tests, NOT the hot path (use
    clean_pages_udf_fast)."""
    udf = make_clean_text_udf(k)
    return join_masks(pages, masks).withColumn("clean_text", udf(F.col("text"), F.col("mask")))


def clean_pages_udf_fast(
    pages: DataFrame,
    masks: DataFrame,
    k: int = DEFAULT_SHINGLE_K,
    carry_cols: tuple[str, ...] = ("url", "warc_ts", "domain", "lang"),
) -> DataFrame:
    """O-8 production path: JVM shingle hashing + numpy membership in
    an Arrow ``mapInPandas`` node.  Byte-identical to clean_pages_udf /
    the oracle (cross-tested).

    Why mapInPandas and not a scalar pandas UDF: a Python UDF whose
    arguments contain higher-order-function lambdas cannot be extracted
    out of a collapsed aggregate projection by Catalyst
    (INTERNAL_ERROR: Cannot evaluate expression) — a map node sits in
    the plan and composes with any downstream operator.  Bonus: the
    fat __lines/__lh arrays never cross back from Python; only
    clean_text does.
    """
    import numpy as np

    from ..functions.shingles import line_shingles_expr

    joined = join_masks(pages, masks)
    lines = F.split(F.col("text"), "\n", -1)
    line_hashes = F.transform(
        lines,
        lambda ln: F.transform(line_shingles_expr(ln, k), lambda s: F.xxhash64(s)),
    )
    stage = joined.select(
        *carry_cols, lines.alias("__lines"), line_hashes.alias("__lh"), "mask"
    )
    out_schema = ", ".join(
        f"{c} {t}"
        for c, t in [(c, dict(joined.dtypes)[c]) for c in carry_cols]
    ) + ", clean_text string"

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            out = [None] * n
            mask_cache: dict[int, np.ndarray] = {}
            for i, (lns, lhs, mask) in enumerate(
                zip(pdf["__lines"], pdf["__lh"], pdf["mask"])
            ):
                if lns is None:
                    continue
                if mask is None or len(mask) == 0:
                    out[i] = "\n".join(lns)
                    continue
                key = id(mask)
                m = mask_cache.get(key)
                if m is None:
                    m = np.asarray(mask, dtype=np.int64)
                    mask_cache[key] = m
                lens = np.fromiter((len(h) for h in lhs), dtype=np.int64, count=len(lhs))
                total = int(lens.sum())
                if total == 0:
                    out[i] = "\n".join(lns)
                    continue
                flat = np.concatenate(
                    [np.asarray(h, dtype=np.int64) for h in lhs if len(h)]
                )
                hits = np.isin(flat, m)
                nz = lens > 0
                offsets = np.zeros(len(lhs), dtype=np.int64)
                np.cumsum(lens[:-1], out=offsets[1:])
                allhit = np.zeros(len(lhs), dtype=bool)
                allhit[nz] = np.minimum.reduceat(hits, offsets[nz]).astype(bool)
                masked = nz & allhit
                out[i] = "\n".join(ln for ln, dead in zip(lns, masked) if not dead)
            res = pdf[list(carry_cols)].copy()
            res["clean_text"] = out
            yield res

    return stage.mapInPandas(kernel, out_schema)


def clean_pages_expr(pages: DataFrame, masks: DataFrame, k: int = DEFAULT_SHINGLE_K) -> DataFrame:
    """O-8 via pure Catalyst expressions: zero Python in the hot path."""
    joined = join_masks(pages, masks)
    return joined.withColumn("clean_text", clean_text_expr(F.col("text"), F.col("mask"), k))


def quarantine_split(cleaned: DataFrame) -> tuple[DataFrame, DataFrame]:
    """O-err: malformed rows must not kill the stream (SURVEY §2.8).

    Rows whose text is null (undecodable html upstream) are routed to a
    quarantine output; the reference instead 500s per request
    (``api/main.py:61-70``)."""
    ok = cleaned.where(F.col("clean_text").isNotNull())
    bad = cleaned.where(F.col("clean_text").isNull()).withColumn(
        "error", F.lit("null_text")
    )
    return ok, bad


def decode_html_expr(html: Column) -> Column:
    """binary html -> text (UTF-8).  Spark's decode substitutes U+FFFD
    for malformed bytes rather than throwing, so a corrupt page yields
    degraded text instead of a dead stream (SURVEY §2.8 contract)."""
    return F.decode(html, "UTF-8")
