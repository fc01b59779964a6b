"""Two-cluster-size scaling evidence (BASELINE.md protocol):

Runs the identical streaming flagship job on the identical input at
N = local[8] and 4N = local[32] (fresh subprocess each — fresh JVM,
fresh session), reports sustained pages/sec at both and
efficiency = (T_4N / T_N) / 4, and writes BENCH/BASELINE.md.

Usage: python tools/scaling_bench.py [--pages 200000] [--runs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
from datetime import datetime, timezone

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def run_level(cpus: int, src: str, n_pages: int, files_per_trigger: int) -> dict:
    cmd = [
        sys.executable,
        os.path.join(ROOT, "tools", "stream_throughput_job.py"),
        "--cpus", str(cpus),
        "--src", src,
        "--n-pages", str(n_pages),
        "--files-per-trigger", str(files_per_trigger),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, cwd=ROOT, timeout=3600
    )
    for line in out.stdout.strip().splitlines()[::-1]:
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise RuntimeError(f"no JSON from cpus={cpus}: {out.stdout[-500:]} {out.stderr[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--files", type=int, default=8)
    ap.add_argument("--runs", type=int, default=2, help="keep best per level")
    args = ap.parse_args()

    from watermark_remove_spark.fixtures import PagesConfig, generate_corpus
    from watermark_remove_spark.sources.pages import write_batch_files

    tmp = tempfile.mkdtemp(prefix="wrs-scaling-")
    src = os.path.join(tmp, "pages")
    corpus = generate_corpus(
        PagesConfig(n_pages=args.pages, n_domains=50, seed=42, mean_gap_seconds=1.0)
    )
    pages = corpus.pages
    per = (len(pages) + args.files - 1) // args.files
    batches = [pages.iloc[i * per : (i + 1) * per] for i in range(args.files)]
    write_batch_files([b for b in batches if len(b)], src)
    n_pages = len(pages)
    print(f"corpus: {n_pages} pages in {args.files} micro-batch files at {src}")

    results = {}
    for cpus in (8, 32):
        best = None
        for r in range(args.runs):
            res = run_level(cpus, src, n_pages, 1)
            print(f"local[{cpus}] run {r}: {res}")
            if best is None or res["pages_per_sec"] > best["pages_per_sec"]:
                best = res
        results[cpus] = best

    t8, t32 = results[8]["pages_per_sec"], results[32]["pages_per_sec"]
    eff = (t32 / t8) / 4.0
    summary = {
        "throughput_local8_pages_per_sec": t8,
        "throughput_local32_pages_per_sec": t32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "target": 0.8,
        "pages": n_pages,
    }
    print(json.dumps(summary))

    os.makedirs(os.path.join(ROOT, "BENCH"), exist_ok=True)
    md = os.path.join(ROOT, "BENCH", "BASELINE.md")
    with open(md, "w") as f:
        f.write(f"""# BENCH/BASELINE.md — scaling-efficiency evidence

Protocol (BASELINE.md §sandbox): identical streaming flagship job
(mask broadcast join + pandas-UDF extraction + streaming dedup +
tumbling window agg + exactly-once ledger sink) on identical
deterministic synthetic input ({n_pages} pages, {args.files}
micro-batch files), at two parallelism levels in fresh JVMs.

Generated: {datetime.now(timezone.utc).isoformat()}

| level | pages/sec | stream wall sec | batches |
|---|---|---|---|
| N = local[8], shuffle=8 | {t8} | {results[8]['stream_sec']} | {results[8]['batches']} |
| 4N = local[32], shuffle=32 | {t32} | {results[32]['stream_sec']} | {results[32]['batches']} |

**efficiency = (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target >= 0.8 per BASELINE.json north_rule)
""")
    print(f"wrote {md}")


if __name__ == "__main__":
    main()
