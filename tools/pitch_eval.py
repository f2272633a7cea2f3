"""Pitch-transposition evaluation (VERDICT r4 item 2 — the reference
family's flagship VC capability: `decode --f0-factor` must actually move
the generated pitch by the requested factor).

For each eval utterance and each (factor, gen_dir) pair:
- PER-FRAME F0 ratio: estimate_f0 on the generated wav (wide range so
  transposed pitch stays measurable), divided frame-by-frame by the
  conditioning features' own F0 track on frames voiced in BOTH; the
  utterance statistic is the MEDIAN of those per-frame ratios, compared
  to the requested factor (done criterion: within ~5% per utterance).
  Per-frame, not median-vs-median: voicing detection is timbre- and
  pitch-dependent, so an utterance whose F0 glides over a wide span can
  lose its low-pitch segments on one side only, and the two medians then
  compare DIFFERENT segments (measured: a 90-370 Hz glide utterance read
  ratio 2.8 at factor 1.0 under median-vs-median, 1.00 per-frame);
- MCD of the generated wav against a TRANSPOSED ORACLE — the classical
  source-filter resynthesis (ops/synthesis.world_synthesis, peak_norm:
  the phase-coherent pulse excitation overshoots [-1,1] on loud low-F0
  utterances and hard clipping destroys measurable pitch) of the
  reference's own world features with lf0 shifted by ln(factor): the
  feature-chain floor for what a perfectly conditioned vocoder should
  emit at the new pitch.

Measurement-chain validation (2026-08-21, CPU): with
data.envelope_smoothing=true features, the transposed ORACLE's per-frame
ratio hits the factor within 1.1% on every eval utterance at factors
0.7/1.0/1.3. WITHOUT envelope smoothing it reads ~1.0 regardless of the
factor on half the utterances: the unsmoothed mcep envelope of dense
synthetic harmonics carries the ORIGINAL F0 as comb ripple, which
re-imposes the old periodicity on the transposed excitation. Pitch-
transposition runs must therefore extract features with
data.envelope_smoothing=true.

Usage:
  python tools/pitch_eval.py --ref-scp S --config C \
      --pair 0.7:/path/gen_0.7 --pair 1.3:/path/gen_1.3 [--json OUT]
"""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# CPU is ample for the measurement chain (feature extraction, F0
# estimation, classical synthesis) and keeps this tool off the chip while
# TPU training/serving jobs hold it
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp  # noqa: E402


def median_f0(wav, sr, hop, f0_min=50.0, f0_max=600.0):
    from shallow_wavenet_tpu.ops.f0 import estimate_f0

    f0, vuv = estimate_f0(jnp.asarray(wav), sr, hop, f0_min=f0_min,
                          f0_max=f0_max)
    f0, vuv = np.asarray(f0), np.asarray(vuv)
    v = vuv > 0.5
    return float(np.median(f0[v])) if v.any() else None


def frame_ratio(gen, ref_lf0, ref_vuv, sr, hop,
                f0_min=50.0, f0_max=600.0):
    """Median over frames of gen-F0 / feature-F0 on frames voiced in both
    tracks; (ratio | None, n_common_frames)."""
    from shallow_wavenet_tpu.ops.f0 import estimate_f0

    f0g, vg = estimate_f0(jnp.asarray(gen), sr, hop, f0_min=f0_min,
                          f0_max=f0_max)
    f0g, vg = np.asarray(f0g), np.asarray(vg)
    n = min(len(f0g), len(ref_lf0))
    both = (np.asarray(ref_vuv)[:n] > 0.5) & (vg[:n] > 0.5)
    if both.sum() < 3:
        return None, int(both.sum())
    r = f0g[:n][both] / np.exp(np.asarray(ref_lf0)[:n][both])
    return float(np.median(r)), int(both.sum())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ref-scp", required=True)
    ap.add_argument("--config", required=True)
    ap.add_argument("--pair", action="append", required=True,
                    help="FACTOR:GEN_DIR, repeatable")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from shallow_wavenet_tpu.bin.feature_extract import extract_one
    from shallow_wavenet_tpu.bin.mcd_eval import eval_pair
    from shallow_wavenet_tpu.config import Config
    from shallow_wavenet_tpu.data.audio_io import read_wav
    from shallow_wavenet_tpu.data.dataset import read_file_list
    from shallow_wavenet_tpu.ops.synthesis import world_synthesis

    cfg = Config.from_json(Path(args.config).read_text())
    sr, hop = cfg.data.sample_rate, cfg.data.hop_length
    out = {"pairs": []}
    for spec in args.pair:
        f_str, _, gdir = spec.partition(":")
        factor = float(f_str)
        rows = []
        for wp in read_file_list(args.ref_scp):
            gp = Path(gdir) / Path(wp).name
            if not gp.exists():
                print(f"missing {gp}; skipped")
                continue
            ref, _ = read_wav(wp, target_sr=sr)
            gen, _ = read_wav(gp, target_sr=sr)
            feats = np.array(extract_one(wp, cfg))   # UN-normalized
            ratio, n_fr = frame_ratio(gen, feats[:, 0], feats[:, 1],
                                      sr, hop)
            # transposed oracle: reference world features, lf0 shifted
            f2 = feats.copy()
            voiced = f2[:, 1] > 0.5
            f2[voiced, 0] += np.log(factor)
            oracle = np.asarray(world_synthesis(
                f2, jax.random.key(0), sr, hop,
                cfg.noise_shaping.mcep_order, cfg.noise_shaping.alpha,
                t_len=len(ref), n_bap=cfg.data.n_bap, per_band=False,
                peak_norm=True))
            m = eval_pair(oracle[: len(gen)], gen, cfg)
            rows.append({
                "utt": Path(wp).name, "ratio": ratio,
                "n_common_frames": n_fr, "factor": factor,
                "ratio_err_pct": (abs(ratio / factor - 1) * 100
                                  if ratio else None),
                "mcd_vs_transposed_oracle": m["mcd_db"],
            })
            print(f"factor {factor}: {Path(wp).name}  per-frame ratio "
                  f"{ratio and round(ratio, 3)} over {n_fr} frames "
                  f"(err {rows[-1]['ratio_err_pct'] and round(rows[-1]['ratio_err_pct'], 1)}%)  "
                  f"MCD-vs-oracle {m['mcd_db']:.2f} dB")
        errs = [r["ratio_err_pct"] for r in rows
                if r["ratio_err_pct"] is not None]
        print(f"factor {factor}: mean |ratio error| "
              f"{np.mean(errs):.1f}%  worst {np.max(errs):.1f}%"
              if errs else f"factor {factor}: no measurable utterances")
        out["pairs"].append({"factor": factor, "gen_dir": gdir,
                             "rows": rows})
    if args.json:
        Path(args.json).write_text(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
