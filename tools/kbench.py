"""Microbenchmark for the Pallas AR kernel: per-step latency by variant.

Usage: python tools/kbench.py [batch ...] [preset=X] [dtype=X] [chunk=N]
                              [unroll=N] [stream=0|1]
Prints per-step microseconds and implied RTF@24k for each (config, dtype,
batch) combination on the attached TPU.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from shallow_wavenet_tpu.config import get_config  # noqa: E402
from shallow_wavenet_tpu.models import WaveNet, extract_plain_params  # noqa: E402
from shallow_wavenet_tpu.ops.ar_kernel import (  # noqa: E402
    generate_pallas, pallas_supported, vmem_bytes_estimate,
)

SECONDS = 0.5
CHUNK = 256


def bench_one(preset, dtype, batch, chunk=CHUNK, **kw):
    return _bench_one(preset, dtype, batch, chunk=chunk, **kw)


def _bench_one(preset, dtype, batch, chunk=CHUNK, **kw):
    cfg = get_config(preset)
    mc = cfg.model
    sr = cfg.data.sample_rate
    hop = cfg.data.hop_length
    n_frames = int(SECONDS * sr) // hop
    t = n_frames * hop
    stream = bool(kw.get("stream", False))
    if not pallas_supported(mc, batch=batch, chunk=chunk, dtype=dtype,
                            stream=stream):
        print(f"{preset} {dtype} b{batch}: unsupported "
              f"({vmem_bytes_estimate(mc, batch, chunk, dtype, stream)>>20}"
              f" MB)")
        return None

    model = WaveNet(mc)
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.asarray(rng.uniform(-1, 1, (1, 2 * hop - 1)), jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((1, 2, mc.aux_channels)),
                         jnp.float32)
        variables = model.init(jax.random.key(0), x0, c0)
    variables = jax.device_put(variables, jax.devices()[0])
    pp = extract_plain_params(variables, mc)
    cond = jnp.asarray(
        rng.standard_normal((batch, n_frames, mc.aux_channels)), jnp.float32)
    c_up = jax.jit(lambda c: model.apply(variables, c, method="upsample_cond")
                   )(cond)
    c_up.block_until_ready()

    gen = lambda: generate_pallas(pp, mc, c_up, jax.random.key(1),
                                  chunk=chunk, dtype=dtype, **kw)
    sync = lambda x: (np.asarray(x[0]), x)[1]   # D2H fetch = real barrier
    t0 = time.time()
    sync(gen())
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.time()
        sync(gen())
        best = min(best, time.time() - t0)
    us_step = best / t * 1e6
    rtf = best / (batch * t / sr)
    print(f"{preset} {dtype} b{batch} {kw}: {us_step:.2f} us/step, "
          f"RTF {rtf:.5f} (compile {compile_s:.0f}s)")
    return us_step


if __name__ == "__main__":
    batches = []
    preset, dtype, kw = "shallow_laplace_single", "float32", {}
    for a in sys.argv[1:]:
        if a.startswith("preset="):
            preset = a.split("=", 1)[1]
        elif a.startswith("dtype="):
            dtype = a.split("=", 1)[1]
        elif a.startswith("chunk="):
            CHUNK = int(a.split("=", 1)[1])
        elif a.startswith("unroll="):
            kw["unroll"] = int(a.split("=", 1)[1])
        elif a.startswith("stream="):
            kw["stream"] = bool(int(a.split("=", 1)[1]))
        else:
            batches.append(int(a))
    batches = batches or [32]
    print(jax.devices())
    for b in batches:
        _bench_one(preset, dtype, b, **kw)
