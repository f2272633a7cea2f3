"""Aggregate convergence-parity replications (PARITY_r3.jsonl) into the
BASELINE.md verdict table: inter-framework |delta| per replication vs the
chaos-floor DISTRIBUTION (VERDICT r2 item 1 / r3 item 2 — the 0.1 dB
fidelity clause judged with enough replications to survive a hostile
read).

Round-4 upgrades (VERDICT r3 items 2/3):
- floors stratified by |perturbation magnitude| and by framework side
  (JAX-perturbed vs TORCH-perturbed inits) instead of one pooled mean;
- the primary criterion is RANK-based: for each paired inter-framework
  delta, the fraction of 1e-7-magnitude floor samples that exceed it,
  plus a Mann-Whitney U test of deltas vs the 1e-7 floor sample;
- the legacy mean-vs-1.5x-mean gate is still printed for continuity.

Record formats accepted: round-3 {"floors": {str(p): delta}} dicts and
round-4 {"floors": [[p, delta], ...], "torch_floors": [[p, delta], ...]}
pair lists (pairs preserve duplicate magnitudes — ADVICE r3 low).

Usage: python tools/parity_report.py [path.jsonl]
"""

import json
import sys

import numpy as np


def _floor_pairs(rec, key):
    """Normalize a record's floor field to [(perturbation, delta), ...]."""
    raw = rec.get(key) or []
    if isinstance(raw, dict):
        return [(float(p), d) for p, d in raw.items()]
    return [(float(p), d) for p, d in raw]


def _stratify(pairs):
    """(perturbation, delta) list -> {magnitude: [delta, ...]}."""
    out = {}
    for p, d in pairs:
        out.setdefault(abs(p), []).append(d)
    return out


def _mannwhitney(xs, ys):
    """Two-sided Mann-Whitney U p-value (exact for tiny n via scipy)."""
    try:
        from scipy.stats import mannwhitneyu

        return float(mannwhitneyu(xs, ys, alternative="two-sided").pvalue)
    except Exception:
        return None


def main(path="PARITY_r3.jsonl"):
    lines = [l.strip() for l in open(path) if l.strip()]
    # exact-duplicate records are replays of one measurement, not
    # independent samples (observed once, r5: a bit-identical seed-10
    # line appeared twice); keep the first and say so
    dups = len(lines) - len(dict.fromkeys(lines))
    if dups:
        print(f"WARNING: dropped {dups} exact-duplicate record(s)")
    recs = [json.loads(l) for l in dict.fromkeys(lines)]
    deltas = {}
    jax_floors = {}      # head -> [(p, delta)]
    torch_floors = {}
    for r in recs:
        h = r["head"]
        if r.get("delta") is not None:
            deltas.setdefault(h, []).append((r["seed"], r["delta"]))
        jax_floors.setdefault(h, []).extend(_floor_pairs(r, "floors"))
        torch_floors.setdefault(h, []).extend(
            _floor_pairs(r, "torch_floors"))

    for h in sorted(deltas):
        ds = [d for _, d in deltas[h]]
        jf, tf = jax_floors.get(h, []), torch_floors.get(h, [])
        pooled = [d for _, d in jf] + [d for _, d in tf]
        print(f"head={h}: {len(ds)} paired replications, "
              f"{len(jf)} jax-floor + {len(tf)} torch-floor samples")
        for s, d in deltas[h]:
            print(f"  seed {s}: |delta| {d:.3f} dB")
        print(f"  deltas  mean {np.mean(ds):.3f}  min {np.min(ds):.3f}  "
              f"max {np.max(ds):.3f}")

        # magnitude-stratified floor table, per framework side
        print("  chaos floors by |perturbation| magnitude:")
        for side, pairs in (("jax", jf), ("torch", tf)):
            for mag, vals in sorted(_stratify(pairs).items()):
                svals = " ".join(f"{v:.3f}" for v in sorted(vals))
                print(f"    {side:5s} {mag:g}: [{svals}]  "
                      f"mean {np.mean(vals):.3f} (n={len(vals)})")

        # PRIMARY criterion: rank the deltas inside the smallest-magnitude
        # (1e-7) floor sample, both frameworks pooled — the hostile-read
        # floor: smallest perturbation, framework-symmetric
        strict = (_stratify(jf).get(1e-7, [])
                  + _stratify(tf).get(1e-7, []))
        if strict:
            exceed = [float(np.mean(np.asarray(strict) >= d)) for d in ds]
            for (s, d), frac in zip(deltas[h], exceed):
                print(f"  seed {s}: {frac * 100:.0f}% of 1e-7 floor "
                      f"samples >= this delta")
            p = _mannwhitney(ds, strict)
            med_d, med_f = np.median(ds), np.median(strict)
            indist = med_d <= med_f or (p is not None and p > 0.05)
            p_str = f"{p:.3f}" if p is not None else "n/a (scipy missing)"
            print(f"  1e-7-only rank verdict: median|delta| {med_d:.3f} "
                  f"vs median floor {med_f:.3f} "
                  f"(n={len(strict)}), Mann-Whitney p={p_str} -> "
                  f"{'INDISTINGUISHABLE' if indist else 'DISTINGUISHABLE'}"
                  )
        # legacy pooled-mean gate (continuity with rounds 2-3)
        if pooled:
            ok = np.mean(ds) <= max(0.1, 1.5 * np.mean(pooled))
            print(f"  pooled-mean verdict: mean|delta| {np.mean(ds):.3f} "
                  f"vs 1.5x mean floor {1.5 * np.mean(pooled):.3f} -> "
                  f"{'INDISTINGUISHABLE' if ok else 'DISTINGUISHABLE'}")


if __name__ == "__main__":
    main(*sys.argv[1:])
