"""On-TPU equivalence check: compiled Pallas kernel == lax.scan path,
both heads, sample mode, shared noise. Run on real hardware (the pytest
suite covers the same property in interpreter mode on CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.config import ModelConfig
from shallow_wavenet_tpu.models import WaveNet, extract_plain_params
from shallow_wavenet_tpu.models.generate import generate_fast
from shallow_wavenet_tpu.ops.ar_kernel import generate_pallas


def check(head):
    cfg = ModelConfig(n_stacks=1, stack_size=4, residual_channels=16,
                      gate_channels=32, skip_channels=32, aux_channels=20,
                      cond_channels=16, upsample_factors=(2, 5), head=head)
    model = WaveNet(cfg)
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    hop = 10
    with jax.default_device(cpu):
        if head == "softmax":
            x0 = jnp.asarray(rng.integers(0, 256, (1, 2 * hop - 1)),
                             jnp.int32)
        else:
            x0 = jnp.asarray(rng.uniform(-1, 1, (1, 2 * hop - 1)),
                             jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((1, 2, cfg.aux_channels)),
                         jnp.float32)
        v = model.init(jax.random.key(0), x0, c0)
    v = jax.device_put(v, jax.devices()[0])
    pp = extract_plain_params(v, cfg)
    B, T = 8, 300
    c_up = jnp.asarray(rng.standard_normal((B, T, cfg.cond_channels)),
                       jnp.float32)
    noise = jax.random.uniform(jax.random.key(3), (B, T), minval=1e-6,
                               maxval=1 - 1e-6)
    fast = np.asarray(generate_fast(pp, cfg, c_up, jax.random.key(0),
                                    "sample", noise=noise))
    pal = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=128))
    exact = np.array_equal(fast, pal)
    md = np.abs(fast - pal).max()
    print(f"{head}: exact={exact} maxdiff={md:.2e}")
    return exact


def check_streamed_chunk32(head="laplace"):
    """fp32 chunk-32 HBM-streamed rings == lax.scan on hardware: dilations
    reach 64/128, so the d in {64, 128} layers ride the streamed-window DMA
    path (d % 32 == 0, d > 32) across several full ring periods.

    residual_channels=128: Mosaic cannot slice an HBM memref whose minor
    (lane) dim is below the 128-lane tile, so the streamed-ring path needs
    R to be a multiple of 128 on real hardware (interpret mode does not
    model this). Production deep config has R=128."""
    cfg = ModelConfig(n_stacks=1, stack_size=8, residual_channels=128,
                      gate_channels=32, skip_channels=32, aux_channels=20,
                      cond_channels=16, upsample_factors=(2, 5), head=head)
    model = WaveNet(cfg)
    rng = np.random.default_rng(1)
    cpu = jax.devices("cpu")[0]
    hop = 10
    with jax.default_device(cpu):
        x0 = jnp.asarray(rng.uniform(-1, 1, (1, 2 * hop - 1)), jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((1, 2, cfg.aux_channels)),
                         jnp.float32)
        v = model.init(jax.random.key(0), x0, c0)
    v = jax.device_put(v, jax.devices()[0])
    pp = extract_plain_params(v, cfg)
    B, T = 8, 640  # 5 full periods of the d=128 ring
    c_up = jnp.asarray(rng.standard_normal((B, T, cfg.cond_channels)),
                       jnp.float32)
    noise = jax.random.uniform(jax.random.key(3), (B, T), minval=1e-6,
                               maxval=1 - 1e-6)
    fast = np.asarray(generate_fast(pp, cfg, c_up, jax.random.key(0),
                                    "sample", noise=noise))
    pal = np.asarray(generate_pallas(pp, cfg, c_up, mode="sample",
                                     noise=noise, chunk=32, stream=True))
    exact = np.array_equal(fast, pal)
    md = np.abs(fast - pal).max()
    print(f"streamed-ch32 {head}: exact={exact} maxdiff={md:.2e}")
    return exact


if __name__ == "__main__":
    print(jax.devices())
    ok = (check("laplace") & check("softmax")
          & check_streamed_chunk32("laplace"))
    sys.exit(0 if ok else 1)
