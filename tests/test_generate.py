"""Fast-vs-naive AR generation equivalence — the single most important
correctness test for component C8 (SURVEY.md §4.2; P: arXiv 1611.09482
"the two are mathematically equivalent")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from shallow_wavenet_tpu.models import WaveNet, extract_plain_params
from shallow_wavenet_tpu.models.generate import (
    generate_fast,
    generate_naive,
    seed_feedback,
)

from tests.test_model import tiny_cfg


def setup_gen(head, F=4, B=2, seed=0):
    cfg = tiny_cfg(head=head, n_stacks=2, stack_size=3)
    m = WaveNet(cfg)
    rng = np.random.default_rng(seed)
    H = int(np.prod(cfg.upsample_factors))
    T = F * H - 1
    if head == "softmax":
        x = jnp.asarray(rng.integers(0, 256, (B, T)), jnp.int32)
    else:
        x = jnp.asarray(rng.uniform(-1, 1, (B, T)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((B, F, cfg.aux_channels)), jnp.float32)
    v = m.init(jax.random.key(3), x, c)
    pp = extract_plain_params(v, cfg)
    c_up = m.apply(v, c, method="upsample_cond")
    return cfg, m, v, pp, c_up


@pytest.mark.parametrize("head", ["softmax", "laplace"])
@pytest.mark.parametrize("mode", ["greedy", "sample"])
def test_fast_equals_naive(head, mode):
    cfg, m, v, pp, c_up = setup_gen(head)
    key = jax.random.key(11)
    fast = np.asarray(generate_fast(pp, cfg, c_up, key, mode))
    naive = np.asarray(generate_naive(m, v, cfg, c_up, key, mode))
    assert fast.shape == naive.shape == (c_up.shape[0], c_up.shape[1])
    np.testing.assert_allclose(fast, naive, rtol=1e-4, atol=1e-4)


def test_generation_is_deterministic_given_key():
    cfg, m, v, pp, c_up = setup_gen("laplace")
    a = generate_fast(pp, cfg, c_up, jax.random.key(0), "sample")
    b = generate_fast(pp, cfg, c_up, jax.random.key(0), "sample")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = generate_fast(pp, cfg, c_up, jax.random.key(1), "sample")
    assert float(np.abs(np.asarray(a) - np.asarray(c)).max()) > 0


def test_generation_bounded():
    cfg, m, v, pp, c_up = setup_gen("laplace")
    wav = np.asarray(generate_fast(pp, cfg, c_up, jax.random.key(0), "sample"))
    assert np.all(np.abs(wav) <= 1.0)
    assert np.all(np.isfinite(wav))


def test_seed_feedback_values():
    assert int(seed_feedback(tiny_cfg(head="softmax"))) in (127, 128)
    assert float(seed_feedback(tiny_cfg(head="laplace"))) == 0.0
