#!/usr/bin/env python3
"""Compare two Bench JSON lines (e.g. sf0.1 vs sf1) and print per-query
time ratios, flagging super-linear queries.

Usage: python3 tools/scale_ratios.py <bench_small.txt> <bench_big.txt> \
           [factor] [--json SCALE_rN.json]

A query is flagged when ratio > factor * SLACK (default factor 10; slack
2x absorbs constant-cost amortization loss and run noise). Queries under
MIN_SEC in the small run are reported but not flagged (timer noise
dominates sub-100ms readings).

A SECOND tier closes the gap the first one leaves (r14: labelprop read
13.2x per 10x data on a 1.96s base -- too big to be fixed-overhead
noise, under the 20x threshold): ratio > TIER2_RATIO on a small-run base
>= TIER2_MIN_SEC flags too. Sub-second bases stay exempt from tier 2 --
there, job overhead amortization dominates the ratio.

--json writes the sweep as a checked-in, diffable artifact: one record
per entry (small/big seconds + ratio + flag) plus the run metadata, so
the round-over-round scale story is a file, not a PLANS.md table a
reader has to trust. Warm-up discipline lives in the PRODUCER
(graft.tools.TimeEntries runs the index/layout builds and an input-cache
warmer untimed before the sweep), so a cold one-time build can't
masquerade as a super-linear operator here.
"""
import json
import sys

SLACK = 2.0
MIN_SEC = 0.15
TIER2_RATIO = 12.0
TIER2_MIN_SEC = 0.5

# Entries whose super-linear WALL is adjudicated by a ShuffleStats
# ledger read (PLANS.md carries the full argument): the flag still
# fires -- discipline first -- but the artifact carries the verdict so
# a reader can tell "open regression" from "pinned by design".
_KNN_ANCHOR = (
    "exact-kNN O(n^2) oracle anchor (require-gated, <=1M rows; "
    "production path is the bucketed knnJoin): shuffle records grow "
    "exactly 10x per 10x data (r15 ledger, sf0.1->sf1: knn_exact "
    "18,032->180,032; knn_recall/gate 96,026->960,033; labelprop "
    "38,507->382,511) -- the wall superlinearity is the UNSHUFFLED "
    "map-local all-pairs cosine stream (4M->400M candidates BY "
    "DESIGN) + its top-k sort working set, which the require gate "
    "bounds and a cluster never runs at corpus scale")
ADJUDICATED = {
    "x_graph_labelprop": _KNN_ANCHOR,
    "x_sim_knn_exact": _KNN_ANCHOR,
    "x_sim_knn_recall": _KNN_ANCHOR,
    "x_sim_knn_recall_gate": _KNN_ANCHOR,
}


def load(path):
    for line in open(path):
        line = line.strip()
        if line.startswith("[info] {"):
            line = line[len("[info] "):]
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    raise SystemExit(f"no bench JSON line in {path}")


def main(small_path, big_path, factor=10.0, json_out=None):
    a, b = load(small_path), load(big_path)
    qa, qb = a["queries"], b["queries"]
    print(f"{'query':42s} {'small':>8s} {'big':>8s} {'ratio':>7s}  flag")
    flags = []
    records = {}
    for q in sorted(qa, key=lambda q: -(qb.get(q, 0) or 0)):
        ta, tb = qa[q], qb.get(q)
        if tb is None or ta < 0 or tb < 0:
            print(f"{q:42s} {ta:8.2f} {str(tb):>8s}    FAIL")
            flags.append((q, "failed"))
            records[q] = {"small_sec": ta, "big_sec": tb, "ratio": None,
                          "flag": "failed"}
            continue
        ratio = tb / ta if ta > 0 else float("inf")
        flag = ""
        if ta >= MIN_SEC and ratio > factor * SLACK:
            flag = "SUPER-LINEAR"
            flags.append((q, f"{ratio:.1f}x"))
        elif ta >= TIER2_MIN_SEC and ratio > TIER2_RATIO:
            flag = "SUPER-LINEAR-T2"
            flags.append((q, f"{ratio:.1f}x (tier2)"))
        elif ta < MIN_SEC and ratio > factor * SLACK:
            flag = "(fast-query, noisy)"
        adjudication = ADJUDICATED.get(q) if flag.startswith("SUPER") else None
        if adjudication:
            flag += " [adjudicated]"
        print(f"{q:42s} {ta:8.2f} {tb:8.2f} {ratio:7.2f}  {flag}")
        records[q] = {"small_sec": round(ta, 3), "big_sec": round(tb, 3),
                      "ratio": round(ratio, 2) if ratio != float("inf") else None,
                      "flag": flag or None,
                      **({"adjudication": adjudication} if adjudication else {})}
    if json_out:
        with open(json_out, "w") as f:
            json.dump({
                "small_sf": a.get("sf"), "big_sf": b.get("sf"),
                "data_factor": factor, "flag_threshold": factor * SLACK,
                "min_sec": MIN_SEC,
                "tier2_ratio": TIER2_RATIO, "tier2_min_sec": TIER2_MIN_SEC,
                "n_entries": len(records),
                "n_flagged": len([q for q, r in flags if r != "failed"
                                  and not r.startswith("(")]),
                "n_adjudicated": len([q for q, r in records.items()
                                      if r.get("adjudication")]),
                "n_failed": len([q for q, r in flags if r == "failed"]),
                "total_small_sec": round(a["value"], 1),
                "total_big_sec": round(b["value"], 1),
                "entries": records,
            }, f, indent=1, sort_keys=True)
        print(f"\nwrote {json_out} ({len(records)} entries)")
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    main(argv[0], argv[1],
         float(argv[2]) if len(argv) > 2 else 10.0,
         json_out=json_out)
