"""Property tests for the normative SPEC + hasher (pure Python, no
Spark session — fast, and safe to run alongside benchmarks)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from watermark_remove_spark.hashing import to_signed64, xxhash64_bytes, xxhash64_str
from watermark_remove_spark.spec import (
    MaskConfig,
    clean_text,
    doc_shingle_hash_set,
    domain_of,
    line_is_masked,
    shingle_hashes,
    shingles,
    tokenize,
)

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300
)
line_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\n"),
    max_size=120,
)


@given(line_st)
def test_tokenize_no_empties_and_reversible_count(line):
    toks = tokenize(line)
    assert all(t and " " not in t for t in toks)


@given(line_st)
def test_shingles_cardinality(line):
    toks = tokenize(line)
    sh = shingles(line, 3)
    if len(toks) == 0:
        assert sh == []
    elif len(toks) <= 3:
        assert sh == [" ".join(toks)]
    else:
        assert len(sh) == len(toks) - 2
        assert all(len(s.split(" ")) == 3 for s in sh)


@given(text_st)
def test_clean_text_empty_mask_is_identity(text):
    assert clean_text(text, frozenset()) == text


@given(text_st)
def test_clean_text_full_mask_keeps_tokenless_lines(text):
    mask = frozenset(doc_shingle_hash_set(text))
    out = clean_text(text, mask)
    # every surviving line has no tokens (blank/space-only lines kept)
    assert all(not tokenize(ln) for ln in (out.split("\n") if out else []))


@given(text_st, text_st)
def test_clean_idempotent(a, b):
    mask = frozenset(doc_shingle_hash_set(b))
    once = clean_text(a, mask)
    assert clean_text(once, mask) == once


@given(line_st)
def test_line_masked_iff_all_hashes_in_mask(line):
    hs = shingle_hashes(line)
    assert line_is_masked(line, frozenset(hs)) == bool(hs)
    if len(hs) > 1:
        assert not line_is_masked(line, frozenset(hs[1:]))


@given(st.binary(max_size=200), st.integers(min_value=0, max_value=2**64 - 1))
@settings(max_examples=200)
def test_xxhash64_in_range_and_deterministic(data, seed):
    h1 = xxhash64_bytes(data, seed)
    h2 = xxhash64_bytes(data, seed)
    assert h1 == h2
    assert 0 <= h1 < 2**64


def test_xxhash64_known_vectors():
    # standard XXH64 test vectors (seed 0): public reference values
    assert xxhash64_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert xxhash64_bytes(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert xxhash64_bytes(b"abc", 0) == 0x44BC2CF5AD770999


@given(st.text(max_size=100))
def test_signed_unsigned_roundtrip(s):
    u = xxhash64_bytes(s.encode("utf-8"))
    sg = to_signed64(u)
    assert -(2**63) <= sg < 2**63
    assert sg % (1 << 64) == u


def test_domain_of():
    assert domain_of("https://d01.example.com/p/1") == "d01.example.com"
    assert domain_of("http://host:8080/x") == "host"
    assert domain_of("host/path") == "host"


def test_mask_config_defaults_stable():
    cfg = MaskConfig()
    assert (cfg.shingle_k, cfg.theta, cfg.min_pages) == (3, 0.6, 3)
