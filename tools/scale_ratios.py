#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and print per-query
time ratios, flagging super-linear queries.

Usage: python3 tools/scale_ratios.py <bench_small.txt> <bench_big.txt> [factor]

A query is flagged when ratio > factor * SLACK (default factor 10; slack
2x absorbs constant-cost amortization loss and run noise). Queries under
MIN_SEC in the small run are reported but not flagged (timer noise
dominates sub-100ms readings).
"""
import json
import sys

SLACK = 2.0
MIN_SEC = 0.15


def load(path):
    for line in open(path):
        line = line.strip()
        if line.startswith("[info] {"):
            line = line[len("[info] "):]
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main(small_path, big_path, factor=10.0):
    a, b = load(small_path), load(big_path)
    qa, qb = a["queries"], b["queries"]
    print(f"{'query':42s} {'small':>8s} {'big':>8s} {'ratio':>7s}  flag")
    flags = []
    for q in sorted(qa, key=lambda q: -(qb.get(q, 0) or 0)):
        ta, tb = qa[q], qb.get(q)
        if tb is None or ta < 0 or tb < 0:
            print(f"{q:42s} {ta:8.2f} {str(tb):>8s}    FAIL")
            flags.append((q, "failed"))
            continue
        ratio = tb / ta if ta > 0 else float("inf")
        flag = ""
        if ta >= MIN_SEC and ratio > factor * SLACK:
            flag = "SUPER-LINEAR"
            flags.append((q, f"{ratio:.1f}x"))
        elif ta < MIN_SEC and ratio > factor * SLACK:
            flag = "(fast-query, noisy)"
        print(f"{q:42s} {ta:8.2f} {tb:8.2f} {ratio:7.2f}  {flag}")
    ca, cb = a.get("canary", {}), b.get("canary", {})
    print(f"\ntotals: small {a['value']:.1f}s (failed {a['failed']}) | "
          f"big {b['value']:.1f}s (failed {b['failed']})")
    print(f"canaries: small {ca.get('start'):.3f}->{ca.get('end'):.3f} | "
          f"big {cb.get('start'):.3f}->{cb.get('end'):.3f}")
    if flags:
        print("\nFLAGGED:", flags)
    else:
        print("\nclean bill: no super-linear headline at this factor")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2],
         float(sys.argv[3]) if len(sys.argv) > 3 else 10.0)
