"""Deterministic synthetic `pages` + `domain_templates` generator.

No external data anywhere (sandbox rule): the Common-Crawl-shaped input
table mandated by ``BASELINE.json:input_hint`` —
``(url string, warc_ts timestamp, html binary, text string, lang
string)`` — is synthesised here with a fixed seed, mirroring the
reference's own test approach of synthesising its input (the dummy
image in reference ``core/lama_wrapper.py:87-90``).

Properties engineered into the data (per FIXTURES.md):
- zipf-skewed domain sizes with one mega-domain (~40% of rows) to
  exercise the salted aggregate (SURVEY §2 O-21);
- per-(domain, version) header/footer/overlay templates with version
  switches mid-stream for several domains (as-of join, O-15);
- ~2% exact duplicate (url, warc_ts) rows (streaming dedup, O-25);
- ~5% rows permuted >watermark-delay out of order (late data, O-24).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from .hashing import xxhash64_str
from .spec import DEFAULT_SHINGLE_K, shingles

BASE_TS = pd.Timestamp("2026-01-01T00:00:00")
LANGS = ["en", "de", "zh", "es", "fr"]

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "crawl", "web",
    "page", "data", "token", "stream", "window", "batch", "shard",
]


@dataclass
class PagesConfig:
    n_pages: int = 2000
    n_domains: int = 20
    seed: int = 42
    mega_domain_share: float = 0.4
    dup_frac: float = 0.02
    late_frac: float = 0.05
    late_shift_minutes: float = 30.0
    mean_gap_seconds: float = 6.0
    content_blocks: tuple[int, int] = (3, 8)
    tokens_per_block: tuple[int, int] = (4, 12)
    overlay_prob: float = 0.8
    shingle_k: int = DEFAULT_SHINGLE_K
    # fraction of the time axis at which listed domains switch templates
    version_switch_at: float = 0.5
    n_versioned_domains: int = 4


def _tokens(rng: np.random.Generator, n: int) -> list[str]:
    return [_WORDS[i] for i in rng.integers(0, len(_WORDS), n)]


def _template_line(rng: np.random.Generator, kind: str, domain: str, version: int) -> str:
    # long, distinctive, stable per (domain, kind, version)
    body = " ".join(_tokens(rng, 8))
    return f"{kind}-{domain}-v{version} {body} {kind}-end"


@dataclass
class SyntheticCorpus:
    pages: pd.DataFrame
    domain_templates: pd.DataFrame
    config: PagesConfig = field(repr=False, default_factory=PagesConfig)


def generate_corpus(cfg: PagesConfig | None = None) -> SyntheticCorpus:
    """Build the deterministic corpus; same cfg -> byte-identical output."""
    cfg = cfg or PagesConfig()
    rng = np.random.default_rng(cfg.seed)

    domains = [f"d{i:02d}.example.com" for i in range(cfg.n_domains)]

    # zipf-ish weights with a forced mega-domain at index 0
    w = 1.0 / np.arange(1, cfg.n_domains + 1) ** 1.2
    w = w / w.sum() * (1.0 - cfg.mega_domain_share)
    weights = np.concatenate([[cfg.mega_domain_share], w[1:] / w[1:].sum() * (1 - cfg.mega_domain_share)])
    weights = weights / weights.sum()

    # templates: versioned per domain; first cfg.n_versioned_domains switch mid-stream
    total_span = cfg.n_pages * cfg.mean_gap_seconds
    switch_ts = BASE_TS + pd.Timedelta(seconds=total_span * cfg.version_switch_at)
    tmpl_rows = []
    tmpl_lines: dict[tuple[str, int], dict[str, str]] = {}
    for di, dom in enumerate(domains):
        n_versions = 2 if di < cfg.n_versioned_domains else 1
        for v in range(1, n_versions + 1):
            trng = np.random.default_rng(cfg.seed * 1_000_003 + di * 101 + v)
            kinds = {
                "header": _template_line(trng, "header", dom, v),
                "footer": _template_line(trng, "footer", dom, v),
                "overlay": _template_line(trng, "overlay", dom, v),
            }
            tmpl_lines[(dom, v)] = kinds
            valid_from = BASE_TS if v == 1 else switch_ts
            for kind, line in kinds.items():
                hs = [xxhash64_str(s) for s in shingles(line, cfg.shingle_k)]
                tmpl_rows.append(
                    {
                        "domain": dom,
                        "valid_from": valid_from,
                        "template_kind": kind,
                        "template_line": line,
                        "shingle_hashes": hs,
                    }
                )
    domain_templates = pd.DataFrame(tmpl_rows)

    # pages
    dom_idx = rng.choice(cfg.n_domains, size=cfg.n_pages, p=weights)
    gaps = rng.exponential(cfg.mean_gap_seconds, size=cfg.n_pages)
    ts = BASE_TS + pd.to_timedelta(np.cumsum(gaps), unit="s").round("ms")
    lang_idx = rng.integers(0, len(LANGS), size=cfg.n_pages)

    urls, htmls, texts = [], [], []
    per_domain_seq = {d: 0 for d in domains}
    for i in range(cfg.n_pages):
        dom = domains[dom_idx[i]]
        per_domain_seq[dom] += 1
        page_id = per_domain_seq[dom]
        url = f"https://{dom}/p/{page_id}"
        version = 2 if (dom_idx[i] < cfg.n_versioned_domains and ts[i] >= switch_ts) else 1
        kinds = tmpl_lines[(dom, version)]
        nb = int(rng.integers(cfg.content_blocks[0], cfg.content_blocks[1] + 1))
        blocks = [
            " ".join(_tokens(rng, int(rng.integers(cfg.tokens_per_block[0], cfg.tokens_per_block[1] + 1))))
            for _ in range(nb)
        ]
        lines = [kinds["header"], *blocks]
        if rng.random() < cfg.overlay_prob:
            lines.append(kinds["overlay"])
        lines.append(kinds["footer"])
        text = "\n".join(lines)
        urls.append(url)
        htmls.append(text.encode("utf-8"))
        texts.append(text)

    pages = pd.DataFrame(
        {
            "url": urls,
            "warc_ts": ts,
            "html": htmls,
            "text": texts,
            "lang": [LANGS[j] for j in lang_idx],
        }
    )

    # late arrivals: shift some rows' *position* in the stream without
    # changing event time (simulated by shuffling arrival order later);
    # here we instead push ~late_frac of event times backwards so they
    # arrive out of order relative to the monotone stream position.
    n_late = int(cfg.n_pages * cfg.late_frac)
    if n_late:
        late_pos = rng.choice(cfg.n_pages, size=n_late, replace=False)
        pages.loc[late_pos, "warc_ts"] = pages.loc[late_pos, "warc_ts"] - pd.Timedelta(
            minutes=cfg.late_shift_minutes
        )

    # exact duplicates of earlier rows
    n_dup = int(cfg.n_pages * cfg.dup_frac)
    if n_dup:
        dup_src = rng.choice(cfg.n_pages, size=n_dup, replace=False)
        pages = pd.concat([pages, pages.iloc[dup_src]], ignore_index=True)

    pages = pages.reset_index(drop=True)
    return SyntheticCorpus(pages=pages, domain_templates=domain_templates, config=cfg)


def write_corpus_parquet(corpus: SyntheticCorpus, out_dir: str) -> dict[str, str]:
    """Persist pages/domain_templates as parquet for Spark & DuckDB."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = {
        "pages": os.path.join(out_dir, "pages.parquet"),
        "domain_templates": os.path.join(out_dir, "domain_templates.parquet"),
    }
    # pandas defaults to TIMESTAMP(NANOS), which Spark's parquet reader
    # rejects — coerce to microseconds (Spark's native precision)
    kw = {"index": False, "coerce_timestamps": "us", "allow_truncated_timestamps": True}
    corpus.pages.to_parquet(paths["pages"], **kw)
    corpus.domain_templates.to_parquet(paths["domain_templates"], **kw)
    return paths
