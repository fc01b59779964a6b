"""Pure-pandas ORACLE — the trust anchor every Spark operator is
tested against (SURVEY §5.1).

Mirrors the reference's test pattern — synthesize input, run the
transform, assert on the artifact (reference ``lama_wrapper.py:67-117``
``__main__`` smoke block) — but with exact golden values, not mere
file-existence.  Deliberately slow and simple: plain dict/loop pandas,
no Spark imports, only ``spec.py`` shared (the normative contract).
"""

from __future__ import annotations

import pandas as pd

from .spec import (
    MaskConfig,
    clean_text,
    doc_shingle_hash_set,
    domain_of,
    line_is_masked,  # noqa: F401  (re-export for tests)
)


def oracle_mine_masks(pages: pd.DataFrame, cfg: MaskConfig | None = None) -> dict[str, frozenset[int]]:
    """domain -> frozenset of boilerplate shingle hashes per the spec."""
    cfg = cfg or MaskConfig()
    by_domain_docs: dict[str, int] = {}
    df_counts: dict[str, dict[int, int]] = {}
    seen_urls: dict[str, set[str]] = {}
    for url, text in zip(pages["url"], pages["text"]):
        dom = domain_of(url)
        urls = seen_urls.setdefault(dom, set())
        if url in urls:
            continue  # document frequency counts distinct urls
        urls.add(url)
        by_domain_docs[dom] = by_domain_docs.get(dom, 0) + 1
        counts = df_counts.setdefault(dom, {})
        for h in doc_shingle_hash_set(text, cfg.shingle_k):
            counts[h] = counts.get(h, 0) + 1
    masks: dict[str, frozenset[int]] = {}
    for dom, counts in df_counts.items():
        n = by_domain_docs[dom]
        if n < cfg.min_pages:
            masks[dom] = frozenset()
            continue
        thr = cfg.theta * n
        masks[dom] = frozenset(h for h, c in counts.items() if c >= thr)
    return masks


def oracle_extract(pages: pd.DataFrame, masks: dict[str, frozenset[int]], cfg: MaskConfig | None = None) -> pd.DataFrame:
    """(url, warc_ts, clean_text) golden frame, byte-exact contract."""
    cfg = cfg or MaskConfig()
    out = []
    for url, ts, text in zip(pages["url"], pages["warc_ts"], pages["text"]):
        mask = masks.get(domain_of(url), frozenset())
        out.append({"url": url, "warc_ts": ts, "clean_text": clean_text(text, mask, cfg.shingle_k)})
    return pd.DataFrame(out)


def oracle_dedup(pages: pd.DataFrame) -> pd.DataFrame:
    """Exactly one row per (url, warc_ts) — first occurrence wins."""
    return pages.drop_duplicates(subset=["url", "warc_ts"], keep="first").reset_index(drop=True)


def _floor_ts(ts: pd.Series, minutes: float) -> pd.Series:
    return ts.dt.floor(f"{int(minutes * 60)}s")


def oracle_tumbling_lang_windows(
    clean: pd.DataFrame, pages: pd.DataFrame, window_minutes: int = 10
) -> pd.DataFrame:
    """Per (window, lang): n_pages, total_chars of clean_text, n_urls.

    ``clean`` is oracle_extract output joined with pages for lang.
    Exact distinct count (the Spark side uses exact count_distinct too
    in golden tests; approx_count_distinct is bench-only).
    """
    df = clean.merge(pages[["url", "warc_ts", "lang"]], on=["url", "warc_ts"], how="inner")
    df = df.drop_duplicates(subset=["url", "warc_ts"], keep="first")
    df["window_start"] = _floor_ts(df["warc_ts"], window_minutes)
    g = (
        df.groupby(["window_start", "lang"], as_index=False)
        .agg(
            n_pages=("url", "size"),
            total_chars=("clean_text", lambda s: int(sum(len(x) for x in s))),
            n_urls=("url", "nunique"),
        )
        .sort_values(["window_start", "lang"])
        .reset_index(drop=True)
    )
    g["window_end"] = g["window_start"] + pd.Timedelta(minutes=window_minutes)
    return g[["window_start", "window_end", "lang", "n_pages", "total_chars", "n_urls"]]


def oracle_sliding_lang_windows(
    clean: pd.DataFrame, pages: pd.DataFrame, window_minutes: int = 10, slide_minutes: int = 5
) -> pd.DataFrame:
    """Sliding windows = union of per-offset tumbling assignments,
    matching Spark ``window(ts, '10 minutes', '5 minutes')``: a row at t
    belongs to every [start, start+W) with start ≡ 0 (mod slide) and
    start in (t-W, t]."""
    df = clean.merge(pages[["url", "warc_ts", "lang"]], on=["url", "warc_ts"], how="inner")
    df = df.drop_duplicates(subset=["url", "warc_ts"], keep="first")
    n_offsets = window_minutes // slide_minutes
    parts = []
    for i in range(n_offsets):
        p = df.copy()
        shifted = p["warc_ts"] - pd.Timedelta(minutes=slide_minutes * i)
        p["window_start"] = _floor_ts(shifted, window_minutes) + pd.Timedelta(minutes=slide_minutes * i)
        parts.append(p)
    all_ = pd.concat(parts, ignore_index=True)
    g = (
        all_.groupby(["window_start", "lang"], as_index=False)
        .agg(
            n_pages=("url", "size"),
            total_chars=("clean_text", lambda s: int(sum(len(x) for x in s))),
            n_urls=("url", "nunique"),
        )
        .sort_values(["window_start", "lang"])
        .reset_index(drop=True)
    )
    g["window_end"] = g["window_start"] + pd.Timedelta(minutes=window_minutes)
    return g[["window_start", "window_end", "lang", "n_pages", "total_chars", "n_urls"]]


def oracle_domain_sessions(pages: pd.DataFrame, gap_minutes: int = 5) -> pd.DataFrame:
    """Gap-based sessions per domain, Spark ``session_window`` semantics:
    session_end = last event ts + gap."""
    df = pages.drop_duplicates(subset=["url", "warc_ts"], keep="first").copy()
    df["domain"] = df["url"].map(domain_of)
    df = df.sort_values(["domain", "warc_ts"])
    gap = pd.Timedelta(minutes=gap_minutes)
    rows = []
    for dom, grp in df.groupby("domain"):
        start = end = None
        n = 0
        for ts in grp["warc_ts"]:
            if start is None:
                start, end, n = ts, ts, 1
            elif ts - end <= gap:
                end, n = ts, n + 1
            else:
                rows.append({"domain": dom, "session_start": start, "session_end": end + gap, "n_pages": n})
                start, end, n = ts, ts, 1
        if start is not None:
            rows.append({"domain": dom, "session_start": start, "session_end": end + gap, "n_pages": n})
    return pd.DataFrame(rows).sort_values(["domain", "session_start"]).reset_index(drop=True)


def oracle_asof_template_version(
    pages: pd.DataFrame, domain_templates: pd.DataFrame
) -> pd.DataFrame:
    """Latest template version in force at each page's warc_ts (per
    domain): the as-of resolution golden for the stream-stream join."""
    tmpl = (
        domain_templates[["domain", "valid_from"]]
        .drop_duplicates()
        .sort_values(["domain", "valid_from"])
    )
    out = []
    for url, ts in zip(pages["url"], pages["warc_ts"]):
        dom = domain_of(url)
        cand = tmpl[(tmpl["domain"] == dom) & (tmpl["valid_from"] <= ts)]
        vf = cand["valid_from"].max() if len(cand) else pd.NaT
        out.append({"url": url, "warc_ts": ts, "domain": dom, "template_valid_from": vf})
    return pd.DataFrame(out)
