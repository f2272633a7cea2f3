"""Model-layer tests: shapes, causality, receptive field, torch parity
(SURVEY.md §4.1, §4.3)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_wavenet_tpu.config import ModelConfig
from shallow_wavenet_tpu.models import WaveNet, extract_plain_params
from shallow_wavenet_tpu.models import heads

from tests import torch_miniref


def tiny_cfg(**kw) -> ModelConfig:
    base = dict(
        n_stacks=1, stack_size=4, residual_channels=16, gate_channels=32,
        skip_channels=24, aux_channels=8, head="laplace",
        upsample_factors=(2, 5), cond_channels=12, compute_dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def randomize_head(v, seed=99):
    """head2 is zero-init (outputs identically 0 at init); give it random
    weights so perturbation-based tests see signal."""
    import jax.numpy as jnp
    k = jax.random.key(seed)
    p = v["params"]
    hw = p["head2"]["kernel"]
    p = dict(p)
    p["head2"] = {
        "kernel": jax.random.normal(k, hw.shape, hw.dtype) * 0.05,
        "bias": p["head2"]["bias"],
    }
    return {"params": p}


def make_inputs(cfg, B=2, F=8, seed=0):
    rng = np.random.default_rng(seed)
    H = int(np.prod(cfg.upsample_factors))
    T = F * H - 1
    if cfg.head == "softmax":
        x = jnp.asarray(rng.integers(0, cfg.quantize_channels, (B, T)), jnp.int32)
    else:
        x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, F, cfg.aux_channels)), jnp.float32)
    spk = jnp.zeros((B,), jnp.int32)
    return x, c, spk


@pytest.mark.parametrize("head", ["softmax", "laplace"])
def test_forward_shapes(head):
    cfg = tiny_cfg(head=head)
    m = WaveNet(cfg)
    x, c, _ = make_inputs(cfg)
    v = m.init(jax.random.key(0), x, c)
    y = m.apply(v, x, c)
    out_dim = cfg.quantize_channels if head == "softmax" else 2
    assert y.shape == (x.shape[0], x.shape[1], out_dim)
    assert y.dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(y)))


def test_causality():
    cfg = tiny_cfg()
    m = WaveNet(cfg)
    x, c, _ = make_inputs(cfg, F=12)
    v = randomize_head(m.init(jax.random.key(0), x, c))
    y = m.apply(v, x, c)
    j = 40
    x2 = x.at[:, j].set(0.5)
    y2 = m.apply(v, x2, c)
    diff = np.abs(np.asarray(y - y2)).max(axis=(0, 2))
    changed = np.nonzero(diff > 0)[0]
    assert changed.size and changed[0] == j


def test_receptive_field_matches_config():
    cfg = tiny_cfg()
    m = WaveNet(cfg)
    x, c, _ = make_inputs(cfg, F=12)
    v = randomize_head(m.init(jax.random.key(0), x, c))
    y = m.apply(v, x, c)
    j = 20
    x2 = x.at[:, j].set(0.9)
    y2 = m.apply(v, x2, c)
    diff = np.abs(np.asarray(y - y2)).max(axis=(0, 2))
    changed = np.nonzero(diff > 0)[0]
    # influence of x[j] must end exactly at j + receptive_field - 1
    assert changed[-1] == j + cfg.receptive_field - 1


def test_speaker_embedding_changes_output():
    cfg = tiny_cfg(n_speakers=3)
    m = WaveNet(cfg)
    x, c, spk = make_inputs(cfg)
    v = randomize_head(m.init(jax.random.key(0), x, c, spk))
    y0 = m.apply(v, x, c, spk)
    y1 = m.apply(v, x, c, spk + 1)
    assert float(np.abs(np.asarray(y0 - y1)).max()) > 0


@pytest.mark.parametrize("head", ["softmax", "laplace"])
def test_torch_parity(head):
    """JAX forward == PyTorch mini-ref forward, fp32, rtol 1e-5 (§4.1)."""
    cfg = tiny_cfg(head=head, n_stacks=2, stack_size=3)
    m = WaveNet(cfg)
    x, c, _ = make_inputs(cfg, B=3, F=10, seed=42)
    v = m.init(jax.random.key(7), x, c)
    y_jax = np.asarray(m.apply(v, x, c))
    y_torch = torch_miniref.forward(
        jax.tree.map(np.asarray, v["params"]), cfg, np.asarray(x), np.asarray(c)
    )
    np.testing.assert_allclose(y_jax, y_torch, rtol=1e-5, atol=1e-5)


def test_torch_parity_with_speaker():
    cfg = tiny_cfg(n_speakers=4)
    m = WaveNet(cfg)
    x, c, _ = make_inputs(cfg)
    spk = jnp.asarray([1, 3], jnp.int32)
    v = m.init(jax.random.key(0), x, c, spk)
    y_jax = np.asarray(m.apply(v, x, c, spk))
    y_torch = torch_miniref.forward(
        jax.tree.map(np.asarray, v["params"]), cfg, np.asarray(x),
        np.asarray(c), np.asarray(spk)
    )
    np.testing.assert_allclose(y_jax, y_torch, rtol=1e-5, atol=1e-5)


def test_extract_plain_params_shapes():
    cfg = tiny_cfg()
    m = WaveNet(cfg)
    x, c, _ = make_inputs(cfg)
    v = m.init(jax.random.key(0), x, c)
    pp = extract_plain_params(v, cfg)
    L = len(cfg.dilations)
    assert pp["conv_w"].shape == (L, cfg.kernel_size, cfg.residual_channels,
                                  cfg.gate_channels)
    assert pp["skip_w"].shape == (L, cfg.gate_channels // 2, cfg.skip_channels)
    assert pp["head2_w"].shape == (cfg.skip_channels, 2)


# ---- heads ---------------------------------------------------------------

def test_softmax_loss_matches_manual():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    tgt = jnp.asarray(rng.integers(0, 8, (2, 5)), jnp.int32)
    got = float(heads.softmax_loss(logits, tgt))
    lp = jax.nn.log_softmax(logits)
    want = float(-np.mean([lp[b, t, tgt[b, t]] for b in range(2) for t in range(5)]))
    assert abs(got - want) < 1e-5


def test_laplace_loss_minimized_at_target():
    tgt = jnp.full((1, 4), 0.3)
    out_good = jnp.stack([jnp.full((1, 4), 0.3), jnp.full((1, 4), -3.0)], -1)
    out_bad = jnp.stack([jnp.full((1, 4), -0.5), jnp.full((1, 4), -3.0)], -1)
    assert float(heads.laplace_loss(out_good, tgt)) < float(
        heads.laplace_loss(out_bad, tgt))


def test_laplace_sampling_statistics():
    mu, log_b = 0.25, -2.0
    out = jnp.tile(jnp.asarray([mu, log_b]), (20000, 1, 1)).reshape(20000, 1, 2)
    s = heads.sample_laplace(out[:, 0, :], jax.random.key(0))
    b = np.exp(log_b)
    assert abs(float(jnp.mean(s)) - mu) < 0.01
    # Laplace variance = 2 b^2
    assert abs(float(jnp.var(s)) - 2 * b * b) < 0.01


def test_softmax_sampling_statistics():
    logits = jnp.log(jnp.asarray([0.7, 0.2, 0.1]))
    s = heads.sample_softmax(jnp.tile(logits, (30000, 1)), jax.random.key(1))
    freq = np.bincount(np.asarray(s), minlength=3) / 30000
    np.testing.assert_allclose(freq, [0.7, 0.2, 0.1], atol=0.02)


def test_masked_losses():
    logits = jnp.zeros((1, 6, 4))
    tgt = jnp.zeros((1, 6), jnp.int32)
    mask = jnp.asarray([[0, 0, 0, 1, 1, 1]], jnp.float32)
    full = heads.softmax_loss(logits, tgt)
    masked = heads.softmax_loss(logits, tgt, mask)
    np.testing.assert_allclose(float(full), float(masked), rtol=1e-6)


def test_repeat_smooth_stage_equals_repeat_plus_conv():
    """The collapsed phase-matmul upsampler stage == repeat(f) + SAME
    conv(2f+1) with the SAME parameter tree (fp32 regrouping tolerance) —
    the checkpoint-compatibility contract of RepeatSmoothStage."""
    import flax.linen as nn

    from shallow_wavenet_tpu.models.wavenet import RepeatSmoothStage

    rng = np.random.default_rng(0)
    for f, c_dim in ((4, 16), (5, 64), (2, 8)):
        c = jnp.asarray(rng.standard_normal((3, 7, c_dim)), jnp.float32)
        stage = RepeatSmoothStage(f, c_dim)
        v = stage.init(jax.random.key(0), c)
        y = stage.apply(v, c)
        ref = nn.Conv(c_dim, kernel_size=(2 * f + 1,), padding="SAME")
        y_ref = ref.apply({"params": v["params"]}, jnp.repeat(c, f, axis=1))
        assert y.shape == y_ref.shape
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   atol=1e-5)


def test_fold_taps_matches_unfolded():
    """model.fold_taps=True (one K=k*R contraction per conv) must produce
    the same outputs from the same parameter tree as the per-tap sum —
    the MXU-depth training probe's correctness contract (config.py
    model.fold_taps)."""
    cfg = tiny_cfg()
    cfg_f = dataclasses.replace(cfg, fold_taps=True)
    x, c, spk = make_inputs(cfg)
    m, mf = WaveNet(cfg), WaveNet(cfg_f)
    v = randomize_head(m.init(jax.random.key(0), x, c))
    y = m.apply(v, x, c)
    yf = mf.apply(v, x, c)           # identical tree, folded compute
    np.testing.assert_allclose(np.asarray(y), np.asarray(yf),
                               rtol=2e-5, atol=2e-6)
