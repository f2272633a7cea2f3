"""MCD evaluation CLI (SURVEY.md §5.5 eval job; metric of BASELINE.json:2).

Mel-cepstral distortion between reference wavs (scp) and generated wavs
(<gen-dir>/<name>), computed with the in-repo mcep analyzer (SURVEY.md
§A.5) — frame-aligned copy-synthesis, no DTW.
"""

from __future__ import annotations

import argparse
import json
import logging
from pathlib import Path

import numpy as np

from shallow_wavenet_tpu.bin.common import (
    add_config_args, resolve_config, setup_logging,
)
from shallow_wavenet_tpu.data.audio_io import read_wav
from shallow_wavenet_tpu.data.dataset import read_file_list

log = logging.getLogger("mcd_eval")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ref-scp", required=True)
    p.add_argument("--gen-dir", required=True)
    p.add_argument("--out", default=None, help="write JSON summary here")
    add_config_args(p)
    args = p.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)

    import jax.numpy as jnp
    from shallow_wavenet_tpu.ops.mcep import mcd, mcep_analysis

    ns = cfg.noise_shaping
    per_utt = {}
    for wp in read_file_list(args.ref_scp):
        gen_path = Path(args.gen_dir) / Path(wp).name
        if not gen_path.exists():
            log.warning("missing generated wav: %s", gen_path)
            continue
        ref, _ = read_wav(wp)
        gen, _ = read_wav(gen_path)
        mc_r = mcep_analysis(jnp.asarray(ref), cfg.data.n_fft,
                             cfg.data.hop_length, cfg.data.win_length,
                             ns.mcep_order, ns.alpha)
        mc_g = mcep_analysis(jnp.asarray(gen), cfg.data.n_fft,
                             cfg.data.hop_length, cfg.data.win_length,
                             ns.mcep_order, ns.alpha)
        per_utt[Path(wp).name] = float(mcd(mc_r, mc_g))
        log.info("%s: MCD %.3f dB", Path(wp).name, per_utt[Path(wp).name])

    summary = {
        "mcd_db_mean": float(np.mean(list(per_utt.values()))) if per_utt else None,
        "per_utterance": per_utt,
    }
    log.info("mean MCD: %s dB over %d utterances", summary["mcd_db_mean"],
             len(per_utt))
    if args.out:
        Path(args.out).write_text(json.dumps(summary, indent=2))
    return summary


if __name__ == "__main__":
    main()
