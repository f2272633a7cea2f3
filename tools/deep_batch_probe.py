"""Probe the deep-config Pallas batch frontier and step-time-vs-batch curve.

Bypasses the _VMEM_BUDGET gate to find the true Mosaic compile/run ceiling.
Usage: python tools/deep_batch_probe.py [dtype] [batches...]
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
from shallow_wavenet_tpu.ops import ar_kernel  # noqa: E402

DT = "bfloat16"
STREAM = False
PRESET = "deep_baseline"
BATCHES = []
for a in sys.argv[1:]:
    if a in ("float32", "bfloat16"):
        DT = a
    elif a == "stream":
        STREAM = True
    elif a.startswith("preset="):
        PRESET = a.split("=", 1)[1]
    elif a.isdigit():
        BATCHES.append(int(a))
    else:
        raise SystemExit(f"unrecognized arg {a!r}")
BATCHES = BATCHES or [16, 18, 20, 24, 32]
T = 24000
CHUNK = 64

ar_kernel._VMEM_BUDGET = 10**9  # bypass the gate: find the real frontier


def main():
    cfg = get_config(PRESET).model
    print(f"device={jax.devices()} dtype={DT} chunk={CHUNK} "
          f"sum_d={sum(cfg.dilations)}")
    pp = ar_kernel._zero_params(cfg)
    rng = np.random.default_rng(0)
    pp = jax.tree.map(
        lambda z: jnp.asarray(rng.standard_normal(z.shape) * 0.05,
                              jnp.float32), pp)
    for B in BATCHES:
        est = ar_kernel.vmem_bytes_estimate(cfg, B, CHUNK, DT,
                                            STREAM) / 2**20
        c = jnp.asarray(rng.standard_normal((B, T, cfg.cond_channels)),
                        jnp.float32)
        noise = jnp.asarray(rng.uniform(0.01, 0.99, (B, T)), jnp.float32)
        try:
            f = lambda: ar_kernel.generate_pallas(  # noqa: E731
                pp, cfg, c, noise=noise, chunk=CHUNK, dtype=DT,
                stream=STREAM)
            np.asarray(f()[0])  # D2H sync: axon block_until_ready lies
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                np.asarray(f()[0])
                best = min(best, time.time() - t0)
            us = best / T * 1e6
            rtf = best / (B * T / 24000.0)
            print(f"B={B:3d} est={est:5.1f}MB  {us:5.2f} us/step  "
                  f"RTF={rtf:.5f}  {B * T / 24000.0 / best:6.1f} audio-s/s")
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:110]
            print(f"B={B:3d} est={est:5.1f}MB  FAILED: {msg}")


if __name__ == "__main__":
    main()
