"""Feature extraction CLI (component C2; reference `src/bin/feature_extract.py`,
unmountable — SURVEY.md §0/§3.2).

wav scp -> per-utterance HDF5 with dataset 'feats' (log-mel, (T//hop, n_mels)).
Frames are trimmed to exactly T//hop so waveform and features stay aligned
sample-for-frame (the centered STFT otherwise yields one extra frame).
"""

from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from shallow_wavenet_tpu.bin.common import (
    add_config_args, feats_path_for, resolve_config, setup_logging,
)
from shallow_wavenet_tpu.data.audio_io import read_wav
from shallow_wavenet_tpu.data.dataset import read_file_list
from shallow_wavenet_tpu.data.hdf5_io import write_hdf5

log = logging.getLogger("feature_extract")


def extract_one(wav_path: str, cfg, numpy_only: bool = False) -> np.ndarray:
    wav, sr = read_wav(wav_path)
    if sr != cfg.data.sample_rate:
        # real corpora arrive at arbitrary rates — resample on load, like
        # the reference family's data-prep resample step (VERDICT r1 item 4)
        from shallow_wavenet_tpu.data.audio_io import resample

        log.info("%s: resampling %d -> %d Hz", wav_path, sr,
                 cfg.data.sample_rate)
        wav = resample(wav, sr, cfg.data.sample_rate)
        sr = cfg.data.sample_rate
    if cfg.data.highpass_cutoff > 0:
        from shallow_wavenet_tpu.ops.filters import highpass

        wav = highpass(wav, sr, cfg.data.highpass_cutoff)
    n_frames = len(wav) // cfg.data.hop_length

    def with_energy(feats: np.ndarray) -> np.ndarray:
        """data.energy_feature: append the frame log-RMS channel
        (ops/energy.py) — numpy on BOTH worker paths, bit-identical."""
        if not cfg.data.energy_feature:
            return feats
        from shallow_wavenet_tpu.ops.energy import frame_log_energy

        e = frame_log_energy(wav, cfg.data.hop_length, feats.shape[0])
        return np.concatenate([feats, e], axis=-1)

    if cfg.data.feature_type == "world":
        if numpy_only:
            # pooled workers: native C++ twin (utils/native.py — the
            # reference's WORLD/SPTK-in-a-worker-pool shape, SURVEY.md §3.2)
            from shallow_wavenet_tpu.utils.native import world_features_native

            return with_energy(world_features_native(wav, cfg))
        import jax.numpy as jnp

        # WORLD-equivalent path (C12): log-F0 + vuv + mcep + band ap
        from shallow_wavenet_tpu.ops.f0 import (
            band_aperiodicity, estimate_f0, log_f0,
        )
        from shallow_wavenet_tpu.ops.mcep import mcep_analysis

        x = jnp.asarray(wav)
        f0, vuv = estimate_f0(x, sr, cfg.data.hop_length,
                              f0_min=cfg.data.f0_min, f0_max=cfg.data.f0_max)
        lf0 = log_f0(f0, vuv)
        mc = mcep_analysis(x, cfg.data.n_fft, cfg.data.hop_length,
                           cfg.data.win_length, cfg.noise_shaping.mcep_order,
                           cfg.noise_shaping.alpha,
                           f0_hz=(f0 * vuv if cfg.data.envelope_smoothing
                                  else None),
                           sample_rate=sr)
        bap = band_aperiodicity(x, f0, sr, cfg.data.hop_length,
                                n_bands=cfg.data.n_bap)
        n = min(lf0.shape[0], mc.shape[0], bap.shape[0], n_frames)
        feats = jnp.concatenate(
            [lf0[:n, None], vuv[:n, None], mc[:n], bap[:n]], axis=-1
        )
        return with_energy(np.asarray(feats))
    if numpy_only:
        # pooled workers: pure-numpy mirror, no jax import (spawn-cheap)
        from shallow_wavenet_tpu.ops.stft import log_mel_spectrogram_np

        return with_energy(log_mel_spectrogram_np(
            wav, sr, cfg.data.n_fft, cfg.data.hop_length,
            cfg.data.win_length, cfg.data.n_mels, cfg.data.fmin,
            cfg.data.fmax,
        )[:n_frames])
    import jax.numpy as jnp

    from shallow_wavenet_tpu.ops import log_mel_spectrogram

    mel = log_mel_spectrogram(
        jnp.asarray(wav), sr, cfg.data.n_fft, cfg.data.hop_length,
        cfg.data.win_length, cfg.data.n_mels, cfg.data.fmin, cfg.data.fmax,
    )
    return with_energy(np.asarray(mel)[:n_frames])


class _cpu_worker_env:
    """Spawned children inherit env at creation: strip accelerator plugin
    vars so workers never try to claim the (single) TPU the parent or a
    training job may hold."""

    _VARS = ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS", "TPU_NAME")

    def __enter__(self):
        import os

        self._saved = {v: os.environ.pop(v) for v in self._VARS
                       if v in os.environ}
        os.environ["JAX_PLATFORMS"] = "cpu"
        return self

    def __exit__(self, *exc):
        import os

        os.environ.pop("JAX_PLATFORMS", None)
        os.environ.update(self._saved)


def _process_one(wp: str, cfg, outdir: str,
                 numpy_only: bool = False) -> tuple[str, tuple]:
    feats = extract_one(wp, cfg, numpy_only=numpy_only)
    write_hdf5(feats_path_for(wp, outdir), "feats", feats)
    return wp, feats.shape


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--wav-scp", required=True)
    p.add_argument("--outdir", required=True)
    p.add_argument("--num-workers", type=int, default=1,
                   help="multiprocessing pool size (the reference's "
                        "per-utterance pool, SURVEY.md §3.2)")
    add_config_args(p)
    args = p.parse_args(argv)
    setup_logging()
    cfg = resolve_config(args)

    paths = read_file_list(args.wav_scp)
    Path(args.outdir).mkdir(parents=True, exist_ok=True)
    if args.num_workers > 1:
        import functools
        import multiprocessing as mp

        if cfg.data.feature_type == "world":
            # build the native library ONCE in the parent; spawned workers
            # then dlopen the finished .so instead of racing `make`
            from shallow_wavenet_tpu.utils.native import load_native

            load_native()
        ctx = mp.get_context("spawn")  # fork breaks jax runtimes
        with _cpu_worker_env(), ctx.Pool(args.num_workers) as pool:
            for wp, shape in pool.map(
                functools.partial(_process_one, cfg=cfg, outdir=args.outdir,
                                  numpy_only=True),
                paths,
            ):
                log.info("%s -> %s %s", wp, feats_path_for(wp, args.outdir),
                         shape)
    else:
        for wp in paths:
            _, shape = _process_one(wp, cfg, args.outdir)
            log.info("%s -> %s %s", wp, feats_path_for(wp, args.outdir),
                     shape)
    log.info("extracted %d utterances", len(paths))


if __name__ == "__main__":
    main()
