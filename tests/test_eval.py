"""Objective-eval metrics (bin/mcd_eval.eval_pair): MCD, F0 RMSE, V/UV
error, LSD."""

import numpy as np

from shallow_wavenet_tpu.bin.mcd_eval import eval_pair
from shallow_wavenet_tpu.config import get_config


def harmonic(f0, sr, dur, n_harm=6, seed=0):
    t = np.arange(int(sr * dur)) / sr
    rng = np.random.default_rng(seed)
    x = sum((0.5 ** k) * np.sin(2 * np.pi * f0 * (k + 1) * t
                                + rng.uniform(0, 2 * np.pi))
            for k in range(n_harm))
    return (0.3 * x / np.max(np.abs(x))).astype(np.float32)


def test_eval_pair_identity():
    cfg = get_config("shallow_laplace_single")
    x = harmonic(150.0, cfg.data.sample_rate, 0.6)
    m = eval_pair(x, x.copy(), cfg)
    assert m["mcd_db"] < 1e-4
    assert m["f0_rmse_hz"] == 0.0
    assert m["vuv_error_rate"] == 0.0
    assert m["lsd_db"] < 1e-4


def test_eval_pair_detects_pitch_shift():
    cfg = get_config("shallow_laplace_single")
    sr = cfg.data.sample_rate
    ref = harmonic(150.0, sr, 0.6)
    gen = harmonic(158.0, sr, 0.6, seed=1)
    m = eval_pair(ref, gen, cfg)
    # 1200*log2(158/150) = 90 cents; allow estimator quantization slack
    assert m["f0_rmse_cents"] is not None
    assert 40.0 < m["f0_rmse_cents"] < 160.0
    assert m["f0_rmse_hz"] > 3.0
    assert m["vuv_error_rate"] < 0.3


def test_eval_pair_degrades_with_noise():
    cfg = get_config("shallow_laplace_single")
    sr = cfg.data.sample_rate
    ref = harmonic(180.0, sr, 0.5)
    rng = np.random.default_rng(3)
    gen = (ref + 0.05 * rng.standard_normal(ref.shape)).astype(np.float32)
    m = eval_pair(ref, gen, cfg)
    assert m["mcd_db"] > 0.5
    assert m["lsd_db"] > 1.0
