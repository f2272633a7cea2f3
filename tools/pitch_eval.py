"""Pitch-transposition evaluation (VERDICT r4 item 2 — the reference
family's flagship VC capability: `decode --f0-factor` must actually move
the generated pitch by the requested factor).

For each eval utterance and each (factor, gen_dir) pair:
- median F0 over voiced frames of the REFERENCE (wide estimator range so
  transposed pitch stays measurable) and of the GENERATED wav;
- ratio = median_gen / median_ref, compared to the requested factor (the
  done criterion: within ~5% per utterance);
- MCD of the generated wav against a TRANSPOSED ORACLE — the classical
  source-filter resynthesis (ops/synthesis.world_synthesis) of the
  reference's own world features with lf0 shifted by ln(factor): the
  feature-chain floor for what a perfectly conditioned vocoder should
  emit at the new pitch.

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
import jax.numpy as jnp


def median_f0(wav, sr, hop, f0_min=50.0, f0_max=600.0):
    from shallow_wavenet_tpu.ops.f0 import estimate_f0

    f0, vuv = estimate_f0(jnp.asarray(wav), sr, hop, f0_min=f0_min,
                          f0_max=f0_max)
    f0, vuv = np.asarray(f0), np.asarray(vuv)
    v = vuv > 0.5
    return float(np.median(f0[v])) if v.any() else None


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
            mr = median_f0(ref, sr, hop)
            mg = median_f0(gen, sr, hop)
            ratio = (mg / mr) if (mr and mg) else None
            # transposed oracle: reference world features, lf0 shifted
            feats = np.array(extract_one(wp, cfg))   # UN-normalized
            voiced = feats[:, 1] > 0.5
            feats[voiced, 0] += np.log(factor)
            oracle = np.asarray(world_synthesis(
                feats, jax.random.key(0), sr, hop,
                cfg.noise_shaping.mcep_order, cfg.noise_shaping.alpha,
                t_len=len(ref), n_bap=cfg.data.n_bap, per_band=False))
            m = eval_pair(oracle[: len(gen)], gen, cfg)
            rows.append({
                "utt": Path(wp).name, "ref_median_f0": mr,
                "gen_median_f0": mg, "ratio": ratio, "factor": factor,
                "ratio_err_pct": (abs(ratio / factor - 1) * 100
                                  if ratio else None),
                "mcd_vs_transposed_oracle": m["mcd_db"],
            })
            print(f"factor {factor}: {Path(wp).name}  ref F0 "
                  f"{mr and round(mr, 1)}  gen F0 {mg and round(mg, 1)}  "
                  f"ratio {ratio and round(ratio, 3)} "
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
