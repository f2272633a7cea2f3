"""Aggregate convergence-parity replications (PARITY_r3.jsonl) into the
BASELINE.md verdict table: inter-framework |delta| per replication vs the
chaos-floor DISTRIBUTION (VERDICT r2 item 1 — the 0.1 dB fidelity clause
judged with enough replications to survive estimator-variance scrutiny).

Usage: python tools/parity_report.py [path.jsonl]
"""

import json
import sys

import numpy as np


def main(path="PARITY_r3.jsonl"):
    recs = [json.loads(l) for l in open(path) if l.strip()]
    deltas = {}
    floors = {}
    for r in recs:
        h = r["head"]
        if r.get("delta") is not None:
            deltas.setdefault(h, []).append((r["seed"], r["delta"]))
        floors.setdefault(h, []).extend(r["floors"].values())
    for h in sorted(deltas):
        ds = [d for _, d in deltas[h]]
        fs = floors.get(h, [])
        print(f"head={h}: {len(ds)} paired replications, "
              f"{len(fs)} chaos-floor samples")
        for s, d in deltas[h]:
            print(f"  seed {s}: |delta| {d:.3f} dB")
        print(f"  deltas  mean {np.mean(ds):.3f}  min {np.min(ds):.3f}  "
              f"max {np.max(ds):.3f}")
        if fs:
            print(f"  floors  mean {np.mean(fs):.3f}  min {np.min(fs):.3f} "
                  f" max {np.max(fs):.3f}  (n={len(fs)})")
            # the statistical question: are the inter-framework deltas
            # distinguishable from intra-framework chaos? Rank each delta
            # within the pooled floor sample
            for s, d in deltas[h]:
                frac = float(np.mean(np.asarray(fs) >= d))
                print(f"  seed {s}: {frac * 100:.0f}% of floor samples "
                      f">= this delta")
            ok = np.mean(ds) <= max(0.1, 1.5 * np.mean(fs))
            print(f"  verdict: mean|delta| {np.mean(ds):.3f} vs "
                  f"1.5x mean floor {1.5 * np.mean(fs):.3f} -> "
                  f"{'INDISTINGUISHABLE' if ok else 'DISTINGUISHABLE'}")


if __name__ == "__main__":
    main(*sys.argv[1:])
