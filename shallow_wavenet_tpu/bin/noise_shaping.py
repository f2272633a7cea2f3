"""Noise shaping CLI (components C4/C5; reference `src/bin/noise_shaping.py`,
call stack SURVEY.md §3.5).

Pre-emphasis: filter training waveforms with the MLSA filter built from
-mag * avg_mcep (whitening direction, c0 zeroed); the model then trains on
spectrally flattened audio so its modeling noise lands under the speech
envelope after restoration. `--inv` applies the inverse (+mag * avg_mcep)
to generated waveforms (stage 6 de-emphasis).

Uses the native C++ filter (native/mlsa.cc) when available, else the JAX
lax.scan implementation — both realize the identical Pade structure.
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from shallow_wavenet_tpu.bin.common import (
    add_config_args, resolve_config, setup_logging,
)
from shallow_wavenet_tpu.data.audio_io import read_wav, write_wav
from shallow_wavenet_tpu.data.dataset import read_file_list
from shallow_wavenet_tpu.data.hdf5_io import read_hdf5

log = logging.getLogger("noise_shaping")


def shaping_coefficients(stats_path: str, mag: float, alpha: float
                         ) -> np.ndarray:
    """mc2b(-mag * avg_mcep) with c0 zeroed (pure shaping, no global gain
    from the corpus energy)."""
    avg = read_hdf5(stats_path, "avg_mcep").astype(np.float64)
    avg[0] = 0.0
    from shallow_wavenet_tpu.utils.native import mc2b_native, native_available

    c = -mag * avg
    if native_available():
        return mc2b_native(c, alpha)
    import jax.numpy as jnp
    from shallow_wavenet_tpu.ops.mlsa import mc2b

    return np.asarray(mc2b(jnp.asarray(c), alpha), np.float64)


def filter_waveform(x: np.ndarray, b: np.ndarray, alpha: float,
                    pade_order: int, inverse: bool) -> np.ndarray:
    from shallow_wavenet_tpu.utils.native import (
        mlsa_filter_native, native_available,
    )

    if native_available():
        return mlsa_filter_native(x, b, alpha, pade_order, inverse)
    import jax.numpy as jnp
    from shallow_wavenet_tpu.ops.mlsa import mlsa_filter

    return np.asarray(
        mlsa_filter(jnp.asarray(x), jnp.asarray(b, jnp.float32), alpha,
                    pade_order, inverse)
    )


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-scp", required=True)
    p.add_argument("--stats", required=True, help="stats.h5 with avg_mcep")
    p.add_argument("--outdir", required=True)
    p.add_argument("--inv", action="store_true",
                   help="inverse filter (de-emphasis restoration)")
    p.add_argument("--indir", default=None,
                   help="read wavs from <indir>/<name> instead of scp paths "
                        "(restoring generated audio)")
    add_config_args(p)
    args = p.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)
    ns = cfg.noise_shaping

    b = shaping_coefficients(args.stats, ns.mag, ns.alpha)
    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for wp in read_file_list(args.wav_scp):
        src = Path(args.indir) / Path(wp).name if args.indir else Path(wp)
        x, sr = read_wav(src, target_sr=cfg.data.sample_rate)
        if not args.inv and cfg.data.highpass_cutoff > 0:
            from shallow_wavenet_tpu.ops.filters import highpass

            x = highpass(x, sr, cfg.data.highpass_cutoff)
        y = filter_waveform(x, b, ns.alpha, ns.pade_order, args.inv)
        peak = np.abs(y).max()
        if peak > 1.0:
            log.warning("%s: peak %.3f after filtering — clipping", src, peak)
            y = np.clip(y, -1.0, 1.0)
        write_wav(outdir / Path(wp).name, y, sr)
        log.info("%s -> %s (%s)", src, outdir / Path(wp).name,
                 "de-emphasis" if args.inv else "pre-emphasis")


if __name__ == "__main__":
    main()
