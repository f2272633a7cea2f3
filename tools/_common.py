"""Shared scaffolding for the measurement tools (kbench/sweep_ar/
stream_bench/kprobe/bench.py pattern).

One copy of the random-init recipe and of the timing conventions that the
tunnel-attached axon TPU requires:
- init flax variables on the HOST CPU (remote-compiling the flax init on
  the tunnel-attached chip costs minutes and measures nothing), then
  device_put once;
- a D2H fetch (np.asarray of a result row) is the only reliable completion
  barrier — block_until_ready can return early on axon.
"""

from __future__ import annotations

import time

import numpy as np


def init_model(cfg_model, hop_length: int, seed: int = 0):
    """(model, variables-on-device, plain-params) for a random-weight
    benchmark of the given ModelConfig."""
    import jax
    import jax.numpy as jnp

    from shallow_wavenet_tpu.models import WaveNet, extract_plain_params

    model = WaveNet(cfg_model)
    rng = np.random.default_rng(seed)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        if cfg_model.head == "softmax":
            # the softmax head embeds integer mu-law class ids
            x0 = jnp.asarray(rng.integers(
                0, cfg_model.quantize_channels, (1, 2 * hop_length - 1)),
                jnp.int32)
        else:
            x0 = jnp.asarray(rng.uniform(-1, 1, (1, 2 * hop_length - 1)),
                             jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((1, 2, cfg_model.aux_channels)),
                         jnp.float32)
        variables = model.init(jax.random.key(0), x0, c0)
    variables = jax.device_put(variables, jax.devices()[0])
    return model, variables, extract_plain_params(variables, cfg_model)


def upsample_fn(model, variables):
    """Jitted frame->sample-rate conditioning upsampler."""
    import jax

    return jax.jit(lambda c: model.apply(variables, c,
                                         method="upsample_cond"))


def sync(x):
    """Completion barrier: D2H-fetch one row (depends on the whole AR
    chain for that utterance)."""
    np.asarray(x[0])
    return x


def best_of(fn, n: int = 3) -> tuple[float, float]:
    """(best wall seconds over n timed runs, compile/warmup seconds).
    fn must return a device array; each run is D2H-synced."""
    t0 = time.time()
    sync(fn())
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        sync(fn())
        best = min(best, time.time() - t0)
    return best, compile_s
