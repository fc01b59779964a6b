"""Text-analysis scalar functions for the training-data pipeline:
language-ID heuristic, quality scoring, token counting, fingerprints.

All pure Catalyst expressions (O-14 surface) so they run inside
whole-stage codegen over 100 TB; each has an exact ANSI-SQL oracle in
``__spark_entry__.oracle_sql`` (DuckDB-checked), which constrains the
building blocks to portable ones: length/replace/lower/split
arithmetic, no engine-specific regex behavior on the checked path.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

DEFAULT_FP_WINDOW = 5

# tiny per-language stopword marker sets — a deterministic n-gram/stopword
# heuristic, not a model (no external data allowed in the sandbox)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "de": ["der", "und", "die"],
    "es": ["el", "los", "que"],
    "fr": ["le", "les", "des"],
}


def token_count_expr(text: Column) -> Column:
    """Number of space-separated tokens (spec.tokenize cardinality).

    Portable formulation: size of split-on-space with empties removed.
    """
    return F.size(F.filter(F.split(text, " ", -1), lambda t: t != F.lit("")))


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of needle via length arithmetic — identical
    semantics in Spark and DuckDB (both count non-overlapping)."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def stopword_hits_expr(text: Column, lang: str) -> Column:
    """Count of marker-word occurrences (padded, lowercased)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    # normalize newlines to spaces so line boundaries count as separators
    padded = F.replace(padded, F.lit("\n"), F.lit(" "))
    total = None
    for wword in LANG_MARKERS[lang]:
        c = _count_occurrences(padded, f" {wword} ")
        total = c if total is None else total + c
    return total


def lang_id_expr(text: Column) -> Column:
    """Heuristic language ID: argmax of marker-hit counts; 'und' if no
    marker hits at all.  Deterministic tie-break = lexicographic lang.

    NOTE on overlap: ' the ' style padded counting undercounts for
    adjacent stopwords ('the the') — acceptable for a heuristic and
    identical in the SQL oracle (same formula).
    """
    scored = [
        F.struct((-stopword_hits_expr(text, lang)).alias("neg"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ]
    best = F.array_min(F.array(*scored))
    return F.when(best["neg"] < 0, best["lang"]).otherwise(F.lit("und"))


def quality_score_expr(text: Column) -> Column:
    """Deterministic quality score in [0,1]:
    0.4 * length_score (chars/500 capped at 1)
    + 0.4 * mean-token-length score (accepted band 3..10 chars,
      hardcoded identically in ORACLE_Q19/Q35)
    + 0.2 * non-empty-line ratio.
    """
    n_chars = F.length(text)
    n_tokens = token_count_expr(text)
    lines = F.split(text, "\n", -1)
    n_lines = F.size(lines)
    non_empty = F.size(F.filter(lines, lambda l: F.length(l) > 0))
    length_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    mean_tok = F.when(n_tokens > 0, (n_chars - (n_tokens - 1)) / n_tokens).otherwise(F.lit(0.0))
    tok_score = F.when((mean_tok >= 3.0) & (mean_tok <= 10.0), F.lit(1.0)).otherwise(F.lit(0.5))
    line_ratio = F.when(n_lines > 0, non_empty / n_lines).otherwise(F.lit(0.0))
    return F.round(
        F.lit(0.4) * length_score + F.lit(0.4) * tok_score + F.lit(0.2) * line_ratio, 6
    )


def doc_fingerprint_expr(text: Column) -> Column:
    """64-bit document fingerprint: xxhash64 of the full text —
    content-addressed identity for exact dedup (O-25 batch analog)."""
    return F.xxhash64(text)


def bpe_ish_token_count_expr(text: Column) -> Column:
    """BPE-ish token estimate: word pieces split on whitespace AND
    letter/digit/punct boundaries (a cheap deterministic proxy for
    subword tokenizer counts — the regex is the public GPT-2-style
    pretokenizer shape, simplified to be engine-portable)."""
    pieces = F.regexp_extract_all(
        text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), 0
    )
    return F.size(pieces)


def rolling_fingerprint_expr(text: Column, k: int = DEFAULT_FP_WINDOW) -> Column:
    """Rolling-hash document fingerprint (winnowing-style): the MINIMUM
    xxhash64 over all k-token windows — robust to local edits outside
    the minimizing window, fully Catalyst."""
    from .shingles import kgram_windows_expr, tokens_expr

    # whole-text token stream (fingerprints span line breaks by design)
    windows = kgram_windows_expr(tokens_expr(text), k)
    return F.array_min(F.transform(windows, lambda w: F.xxhash64(w)))


def rolling_fingerprint_md5_expr(text: Column, k: int = DEFAULT_FP_WINDOW) -> Column:
    """Portable rolling fingerprint (q32 oracle path): the MINIMUM md5
    hex string over all k-token windows — same winnowing robustness as
    :func:`rolling_fingerprint_expr`, but lexicographic-min over
    fixed-width hex is identical in Spark and DuckDB."""
    from .shingles import kgram_windows_expr, tokens_expr

    windows = kgram_windows_expr(tokens_expr(text), k)
    return F.array_min(F.transform(windows, lambda w: F.md5(w)))


def md5_fingerprint_expr(text: Column) -> Column:
    """Portable hex fingerprint (md5) — identical in DuckDB, used on
    oracle-checked paths where xxhash64 has no SQL counterpart."""
    return F.md5(text)
