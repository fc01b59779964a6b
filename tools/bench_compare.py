"""Diff two bench.py JSON artifacts (per-round regression triage).

Usage: python tools/bench_compare.py OLD.json NEW.json [--ratio 1.5]

Accepts either a raw bench.py output line or a driver BENCH_rN.json
wrapper (with the payload under "parsed").  Prints regressions
(new > max(ratio*old, old+2s)), improvements (inverse, old > 2s),
entries only in one artifact, and the flagship delta.  Exit 1 if any
regression is found, so a round script can gate on it.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    try:
        d = json.loads(txt)
    except json.JSONDecodeError:
        d = json.loads(txt.splitlines()[-1])
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--ratio", type=float, default=1.5)
    args = ap.parse_args()

    old, new = load(args.old), load(args.new)
    qo, qn = old.get("queries", {}), new.get("queries", {})
    num = lambda d: {k: v for k, v in d.items() if isinstance(v, (int, float))}
    qo, qn = num(qo), num(qn)

    shared = sorted(set(qo) & set(qn))
    reg = [
        (k, qo[k], qn[k])
        for k in shared
        if qn[k] > max(args.ratio * qo[k], qo[k] + 2)
    ]
    imp = [
        (k, qo[k], qn[k])
        for k in shared
        if qo[k] > 2 and qo[k] > max(args.ratio * qn[k], qn[k] + 2)
    ]
    print(
        f"entries: old={len(qo)} new={len(qn)} shared={len(shared)} "
        f"only-old={sorted(set(qo) - set(qn))or '[]'} "
        f"only-new={sorted(set(qn) - set(qo)) or '[]'}"
    )
    print(f"total: {old.get('value')} -> {new.get('value')} sec; "
          f"flagship pages/s: {old.get('pages_per_sec')} -> {new.get('pages_per_sec')}")
    print(f"regressions (> {args.ratio}x and > +2s): {len(reg)}")
    for k, a, b in sorted(reg, key=lambda t: -(t[2] / t[1])):
        print(f"  {k}: {a:.2f} -> {b:.2f}  ({b / a:.2f}x)")
    print(f"improvements (> {args.ratio}x of >2s entries): {len(imp)}")
    for k, a, b in sorted(imp, key=lambda t: t[2] / t[1]):
        print(f"  {k}: {a:.2f} -> {b:.2f}  ({b / a:.2f}x)")
    sys.exit(1 if reg else 0)


if __name__ == "__main__":
    main()
