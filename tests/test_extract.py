"""Flagship operator tests: mask mining + extraction vs the oracle.

The byte-exactness contract (BASELINE.json:input_hint): extracted
clean_text per url is byte-identical to the reference (pandas oracle)
extractor, for BOTH the pandas-UDF path and the pure-Catalyst path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from watermark_remove_spark.spec import MaskConfig, domain_of, shingles, tokenize
from watermark_remove_spark.oracle import oracle_extract, oracle_mine_masks
from watermark_remove_spark.operators.extract import (
    clean_pages_expr,
    clean_pages_udf,
    mine_masks,
)
from watermark_remove_spark.functions.shingles import (
    doc_shingles_expr,
    line_shingles_expr,
    tokens_expr,
)

CFG = MaskConfig()


def test_tokenize_and_shingle_expr_parity(spark):
    lines = [
        "",
        "   ",
        "one",
        "one two",
        "one two three",
        "one two three four five",
        "  leading and   multiple   spaces  ",
        "tab\tis one token here",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    rows = df.select(
        "line",
        tokens_expr(F.col("line")).alias("toks"),
        line_shingles_expr(F.col("line")).alias("sh"),
    ).collect()
    for r in rows:
        assert list(r.toks) == tokenize(r.line), r.line
        assert list(r.sh) == shingles(r.line), r.line


def test_doc_shingles_expr_parity(spark):
    text = "header one two three\n\ncontent a b c d\nfooter x y"
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(doc_shingles_expr(F.col("text")).alias("s")).collect()[0].s
    want = [s for ln in text.split("\n") for s in shingles(ln)]
    assert list(got) == want


def test_mine_masks_matches_oracle(spark, corpus, pages_sdf):
    want = oracle_mine_masks(corpus.pages, CFG)
    got_rows = mine_masks(pages_sdf, CFG).collect()
    got = {r.domain: frozenset(r.mask) for r in got_rows}
    # oracle includes empty-mask domains; engine omits them — align
    want = {d: m for d, m in want.items() if m}
    assert got == want


def test_masks_cover_templates_only(spark, corpus, pages_sdf):
    """Every template line of a big-enough domain is fully masked; the
    random content blocks are not."""
    masks = oracle_mine_masks(corpus.pages, CFG)
    counts = corpus.pages["url"].map(domain_of).value_counts()
    from watermark_remove_spark.hashing import xxhash64_str

    versions_per_domain = corpus.domain_templates.groupby("domain")["valid_from"].nunique()
    checked = 0
    for _, row in corpus.domain_templates.iterrows():
        dom = row["domain"]
        if counts.get(dom, 0) < 30 or versions_per_domain[dom] > 1:
            continue  # small domains may miss min_pages; versioned split df below theta
        hs = [xxhash64_str(s) for s in shingles(row["template_line"])]
        assert all(h in masks[dom] for h in hs), (dom, row["template_kind"])
        checked += 1
    assert checked >= 3


def test_clean_udf_byte_identical_to_oracle(spark, corpus, pages_sdf):
    masks_oracle = oracle_mine_masks(corpus.pages, CFG)
    golden = oracle_extract(corpus.pages, masks_oracle, CFG)
    golden_map = {
        (u, t): c for u, t, c in zip(golden["url"], golden["warc_ts"], golden["clean_text"])
    }

    masks = mine_masks(pages_sdf, CFG)
    out = clean_pages_udf(pages_sdf, masks).select("url", "warc_ts", "clean_text").collect()
    assert len(out) == len(corpus.pages)
    for r in out:
        want = golden_map[(r.url, r.warc_ts.replace(tzinfo=None) if r.warc_ts.tzinfo else r.warc_ts)]
        assert r.clean_text.encode("utf-8") == want.encode("utf-8"), r.url


def test_clean_fast_udf_byte_identical(spark, corpus, pages_sdf):
    """Production mapInPandas path == spec-direct pandas UDF path,
    byte for byte (including null/empty/maskless rows)."""
    from watermark_remove_spark.operators.extract import clean_pages_udf_fast

    masks = mine_masks(pages_sdf, CFG)
    slow = clean_pages_udf(pages_sdf, masks).select("url", "warc_ts", "clean_text")
    fast = clean_pages_udf_fast(pages_sdf, masks).select("url", "warc_ts", "clean_text")
    assert slow.exceptAll(fast).count() == 0
    assert fast.exceptAll(slow).count() == 0
    # composes with downstream aggregation (the Catalyst-extraction
    # failure mode that motivated mapInPandas)
    total = fast.selectExpr("sum(length(clean_text)) as t").collect()[0].t
    assert total > 0


def test_clean_expr_equals_clean_udf(spark, pages_sdf):
    masks = mine_masks(pages_sdf, CFG)
    a = clean_pages_udf(pages_sdf, masks).select("url", "warc_ts", "clean_text")
    b = clean_pages_expr(pages_sdf, masks).select("url", "warc_ts", "clean_text")
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_templates_removed_content_kept(spark, corpus, pages_sdf):
    masks = mine_masks(pages_sdf, CFG)
    out = clean_pages_expr(pages_sdf, masks)
    # no header/footer/overlay marker survives for big stable domains
    big = out.where(F.col("domain") == "d04.example.com")  # unversioned, non-mega
    survivors = big.where(
        F.col("clean_text").rlike("header-|footer-|overlay-")
    ).count()
    assert survivors == 0
    # content not wiped: average clean length > 0
    row = big.select(F.avg(F.length("clean_text")).alias("l")).collect()[0]
    assert row.l > 0
