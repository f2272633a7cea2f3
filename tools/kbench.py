"""Microbenchmark for the Pallas AR kernel: per-step latency by variant.

Usage: python tools/kbench.py [batch ...] [preset=X] [dtype=X] [chunk=N]
                              [unroll=N] [stream=0|1]
Prints per-step microseconds and implied RTF@24k for each (config, dtype,
batch) combination on the attached TPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from shallow_wavenet_tpu.config import get_config  # noqa: E402
from shallow_wavenet_tpu.ops.ar_kernel import (  # noqa: E402
    generate_pallas, pallas_supported, vmem_bytes_estimate,
)

SECONDS = 0.5
CHUNK = 256


def bench_one(preset, dtype, batch, chunk=None, **kw):
    return _bench_one(preset, dtype, batch, chunk=chunk, **kw)


def _bench_one(preset, dtype, batch, chunk=None, **kw):
    # chunk=N on the CLI mutates the module global AFTER this function is
    # defined, so the default must resolve at call time, not def time
    chunk = CHUNK if chunk is None else chunk
    cfg = get_config(preset)
    mc = cfg.model
    sr = cfg.data.sample_rate
    hop = cfg.data.hop_length
    n_frames = int(SECONDS * sr) // hop
    t = n_frames * hop
    stream = bool(kw.get("stream", False))
    fused = int(kw.get("fused", 0))
    if not pallas_supported(mc, batch=batch, chunk=chunk, dtype=dtype,
                            stream=stream, fused=fused):
        print(f"{preset} {dtype} b{batch}: unsupported "
              f"({vmem_bytes_estimate(mc, batch, chunk, dtype, stream, fused)>>20}"
              f" MB)")
        return None

    from tools._common import best_of, init_model, upsample_fn

    rng = np.random.default_rng(0)
    model, variables, pp = init_model(mc, hop)
    cond = jnp.asarray(
        rng.standard_normal((batch, n_frames, mc.aux_channels)), jnp.float32)
    c_up = upsample_fn(model, variables)(cond)
    c_up.block_until_ready()

    gen = lambda: generate_pallas(pp, mc, c_up, jax.random.key(1),
                                  chunk=chunk, dtype=dtype, **kw)
    best, compile_s = best_of(gen)
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
        elif a.startswith("fused="):
            kw["fused"] = int(a.split("=", 1)[1])
        else:
            batches.append(int(a))
    batches = batches or [32]
    print(jax.devices())
    for b in batches:
        _bench_one(preset, dtype, b, **kw)
