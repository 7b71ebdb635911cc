"""Perf-regression gate: diff two bench JSON files (bench.py /
bench_subset.py / BENCH_LOCAL_r0N.json shapes all accepted) and flag
per-query deltas beyond a threshold.

Usage:
    python tools/bench_diff.py OLD.json NEW.json [--pct 10] [--abs 0.3]

A query is flagged only when BOTH the relative delta exceeds --pct
percent AND the absolute delta exceeds --abs seconds (sub-second
queries jitter ±30% run-to-run; see memory/bench-protocol). Exit code
1 if any regression is flagged — wire it into the pre-commit loop for
every perf rewrite: benchmark the touched operator's consumers before
and after, and keep the rewrite only if this gate passes.
"""

from __future__ import annotations

import argparse
import json
import sys


def load(path: str, key: str = "queries") -> dict[str, float]:
    with open(path) as f:
        obj = json.load(f)
    q = obj.get(key, obj if key == "queries" else {})
    return {k: float(v) for k, v in q.items() if v is not None}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--pct", type=float, default=10.0)
    ap.add_argument("--abs", dest="abs_", type=float, default=0.3)
    ap.add_argument(
        "--key",
        default="queries",
        help="which per-query map to diff: queries (spark sec, default),"
        " duckdb (twin sec), or ratio (spark/duckdb — the"
        " drift-controlled number; use --abs 0.0 with it)",
    )
    ap.add_argument(
        "--min-secs",
        type=float,
        default=0.0,
        help="with --key ratio: ignore queries where either engine"
        " spends less than this in either file (sub-100ms twin"
        " denominators make ratios hypersensitive — same-code runs"
        " calibrated at 1.18x median jitter, BENCH_PAIR_NOTES_r08.md;"
        " 0.2 is the adjudication rule)",
    )
    args = ap.parse_args()
    old, new = load(args.old, args.key), load(args.new, args.key)
    if args.key == "ratio" and args.min_secs > 0:
        keep = set(old) | set(new)
        for path in (args.old, args.new):
            for col in ("queries", "duckdb"):
                secs = load(path, col)
                keep &= {k for k in keep if secs.get(k, 0.0) >= args.min_secs}
        old = {k: v for k, v in old.items() if k in keep}
        new = {k: v for k, v in new.items() if k in keep}
    shared = sorted(set(old) & set(new))
    regs, wins = [], []
    for k in shared:
        d = new[k] - old[k]
        pct = 100.0 * d / old[k] if old[k] else 0.0
        if d > args.abs_ and pct > args.pct:
            regs.append((k, old[k], new[k], pct))
        elif -d > args.abs_ and -pct > args.pct:
            wins.append((k, old[k], new[k], pct))
    t_old, t_new = sum(old[k] for k in shared), sum(new[k] for k in shared)
    print(
        f"shared={len(shared)} total {t_old:.1f}s -> {t_new:.1f}s "
        f"({100 * (t_new - t_old) / t_old:+.1f}%)"
    )
    for tag, rows in (("REGRESSION", regs), ("win", wins)):
        for k, o, n, pct in sorted(rows, key=lambda r: -abs(r[3])):
            print(f"  {tag:10s} {k:32s} {o:7.3f} -> {n:7.3f}  ({pct:+.0f}%)")
    only_old = set(old) - set(new)
    only_new = set(new) - set(old)
    if only_old:
        print(f"  only in old: {sorted(only_old)}")
    if only_new:
        print(f"  only in new: {sorted(only_new)}")
    return 1 if regs else 0


if __name__ == "__main__":
    sys.exit(main())
