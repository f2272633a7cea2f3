"""Deep baseline config (BASELINE config 5): full-depth stack works through
forward + AR generation; the Pallas kernel correctly declines (VMEM budget)
and decoding falls back to the scan path."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.config import get_config
from shallow_wavenet_tpu.models import WaveNet, extract_plain_params
from shallow_wavenet_tpu.models.generate import generate_fast
from shallow_wavenet_tpu.ops.ar_kernel import pallas_supported


def deep_cfg():
    cfg = get_config("deep_baseline").model
    # fp32 on CPU for test determinism
    return dataclasses.replace(cfg, compute_dtype="float32")


def test_deep_config_shape():
    cfg = deep_cfg()
    assert len(cfg.dilations) == 30
    assert max(cfg.dilations) == 512
    assert cfg.receptive_field == 1 + 3 * 1023


def test_deep_not_pallas_but_scan_generates():
    cfg = deep_cfg()
    m = WaveNet(cfg)
    rng = np.random.default_rng(0)
    B, F = 2, 2
    hop = int(np.prod(cfg.upsample_factors))
    x = jnp.asarray(rng.uniform(-1, 1, (B, F * hop - 1)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, F, cfg.aux_channels)), jnp.float32)
    v = m.init(jax.random.key(0), x, c)
    y = m.apply(v, x, c)
    assert y.shape == (B, F * hop - 1, 2)
    assert bool(jnp.all(jnp.isfinite(y)))

    # beyond-capacity requests must still be rejected by the static gate
    # (the budget is now the physical 128 MB/core, so the deep config fits
    # at small batches; batch 96 fp32 resident — 162 MB — does not)
    assert not pallas_supported(cfg, batch=96, chunk=64)
    pp = extract_plain_params(v, cfg)
    c_up = m.apply(v, c, method="upsample_cond")
    wav = generate_fast(pp, cfg, c_up, jax.random.key(1))
    assert wav.shape == (B, F * hop)
    assert bool(jnp.all(jnp.isfinite(wav)))
