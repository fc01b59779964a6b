"""Higher-order-function payload-kernel audit (round-4 verdict #5).

Catalyst higher-order functions (transform/aggregate/filter/zip_with/
exists/forall) run their lambda INTERPRETED per array element — fine
over bounded domains, a scale hazard when the element count is
proportional to payload (text) length.  q197's aHash pooling kernel
was exactly that class: an interpreted per-character lambda measured
at 625 s at sf0.1 until it moved to an Arrow pandas UDF
(functions/ahash.py, 66x).

This tool enumerates every HOF call site in the package (both the
pyspark `F.<hof>(...)` form and `<hof>(...)` inside F.expr/SQL
strings), classifies the iteration domain, and prints the audit
table that BENCH/HOF_AUDIT.md records:

- per-char   — elements = characters of a payload string (q197 class)
- per-token  — elements = whitespace tokens of a payload string
- per-line   — elements = newline-split lines of a payload string
- per-dim    — elements = fixed embedding dimensions (64)
- bounded    — literal arrays, per-group top-K lists, spine rows,
               shingle/k-gram lists already bounded upstream

Classification is keyword-based on the HOF's first argument and
surrounding context; sites it cannot classify are listed as REVIEW so
a human (or the next round) decides.  Measured cost classes for the
non-bounded sites live in BENCH/HOF_AUDIT.md next to the r-round
bench timings of their owning queries.
"""

from __future__ import annotations

import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(ROOT, "watermark_remove_spark")

HOFS = ("transform", "aggregate", "filter", "zip_with", "exists", "forall")
CALL = re.compile(
    r"(?:F\.(?:" + "|".join(HOFS) + r")\s*\(|[^\w.](?:" + "|".join(HOFS) + r")\s*\()"
)

RULES: list[tuple[str, str]] = [
    # (regex on the site context, class)
    (r"sequence\(1,\s*length|split\([^)]*,\s*''\)", "per-char"),
    (r"sequence\(\s*[01],\s*\d+\s*\)", "bounded"),  # literal fixed range
    (r"sequence\(0,\s*\{[A-Z_0-9]*(BANDS|BINS|BUCKETS|K)\b", "bounded"),  # constant fan-out
    (
        r"tokens_expr|split\(replace\(text|filter\(split\(|\btoks\b|\btok\b"
        r"|size\(split\(\w+,\s*' '\)\)",
        "per-token",
    ),
    (r"split\((F\.col\()?[\"']?text[\"']?\)?,\s*[\"']\\+n", "per-line"),
    (r"\blines\b", "per-line"),
    (
        r"\bqv\b|\bsv\b|\bvec\b|embedding|\bdims\b|\bcomps\b"
        r"|zip_with\(\s*(q|s|qa|qb|ya|yb|pq|mus)\s*[,\[]"
        r"|transform\(\s*(q|s)\s*,|\bmus\[",
        "per-dim",
    ),
    (r"F\.array\(|array\(\s*struct|F\.lit|literal|spine|F\.sequence\(\s*F\.lit", "bounded"),
    (r"doc_shingles_expr|kgram_windows_expr|shingle", "bounded"),
    (r"collect_list|collect_set|slice\(|array_sort|sort_array|top_?k|postings", "bounded"),
]

# A SQL-string HOF site must look like code (a lambda arrow or a
# nested array function), else it is docstring prose that merely
# contains the word — "one bounded aggregate (median + max)".
CODEISH = re.compile(r"->|F\.|_expr|lambda|zip_with|sequence\(|named_struct")


def classify(ctx: str) -> str:
    for pat, cls in RULES:
        if re.search(pat, ctx):
            return cls
    return "REVIEW"


def main() -> None:
    rows = []
    for dirpath, _dirs, files in os.walk(PKG):
        if "__pycache__" in dirpath:
            continue
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            lines = open(path).read().splitlines()
            for i, line in enumerate(lines):
                if not CALL.search(line):
                    continue
                # skip DuckDB oracle mirrors (list_transform etc. run
                # on the oracle side, not in the engine) and comments
                stripped = line.strip()
                if stripped.startswith("#") or "list_" in line:
                    continue
                ctx = "\n".join(lines[max(0, i - 3) : i + 6])
                if not re.search(r"F\.(?:" + "|".join(HOFS) + r")\s*\(", line) and not (
                    CODEISH.search(ctx) and re.search(r"[\"']", line)
                ):
                    continue  # docstring prose, not a call site
                rel = os.path.relpath(path, ROOT)
                rows.append((rel, i + 1, classify(ctx), stripped[:72]))

    counts: dict[str, int] = {}
    for _, _, cls, _ in rows:
        counts[cls] = counts.get(cls, 0) + 1
    print(f"{len(rows)} HOF sites: " + ", ".join(f"{k}={v}" for k, v in sorted(counts.items())))
    print()
    print("| file:line | class | site |")
    print("|---|---|---|")
    for rel, ln, cls, snip in rows:
        print(f"| {rel}:{ln} | {cls} | `{snip}` |")
    n_review = counts.get("REVIEW", 0)
    if n_review:
        print(f"\n{n_review} sites need manual review", file=sys.stderr)


if __name__ == "__main__":
    main()
