"""Sweep AR kernel batch/chunk/dtype on the real chip; prints RTF table.

Usage: python tools/sweep_ar.py [preset] [B,chunk,dtype[,stream] ...]
Defaults: shallow_laplace_single over a standard grid.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.ops.ar_kernel import (
        generate_pallas, pallas_supported, vmem_bytes_estimate,
    )

    preset = sys.argv[1] if len(sys.argv) > 1 else "shallow_laplace_single"
    cfg = get_config(preset)
    mc = cfg.model
    sr = cfg.data.sample_rate
    hop = cfg.data.hop_length
    n_frames = int(1.0 * sr) // hop
    t_samples = n_frames * hop

    from tools._common import init_model, upsample_fn

    rng = np.random.default_rng(0)
    model, variables, pp = init_model(mc, hop)
    upsample = upsample_fn(model, variables)

    if len(sys.argv) > 2:
        grid = []
        for spec in sys.argv[2:]:
            parts = spec.split(",")
            b, ch, dt = int(parts[0]), int(parts[1]), parts[2]
            stream = len(parts) > 3 and parts[3] in ("1", "stream", "true")
            grid.append((b, ch, dt, stream))
    else:
        grid = [(32, 256, "float32", False), (64, 256, "float32", False),
                (64, 128, "float32", False), (128, 128, "float32", False),
                (128, 128, "bfloat16", False), (64, 512, "float32", False)]

    print(f"preset={preset} T={t_samples}")
    for B, chunk, dt, stream in grid:
        est = vmem_bytes_estimate(mc, B, chunk, dt, stream)
        if not pallas_supported(mc, B, chunk, dt, stream):
            print(f"B={B:4d} chunk={chunk:4d} {dt:9s} SKIP vmem={est>>20}MB")
            continue
        if dt == "bfloat16" and B > 512:
            # large-batch bf16: the fp32 upsampled conditioning (plus the
            # upsampler's fp32 temps) is the HBM bottleneck, not the
            # kernel. Build the stream as bf16 in row chunks, staging
            # through the host so only the final bf16 array lives on chip
            # (bitwise-identical input to the bf16 kernel, which casts its
            # cond stream to bf16 anyway)
            rows = []
            for lo in range(0, B, 256):
                c = jnp.asarray(rng.standard_normal(
                    (min(256, B - lo), n_frames, mc.aux_channels)),
                    jnp.float32)
                rows.append(np.asarray(
                    upsample(c).astype(jnp.bfloat16)))
                del c
            c_up = jnp.asarray(np.concatenate(rows))
            del rows
        else:
            cond = jnp.asarray(
                rng.standard_normal((B, n_frames, mc.aux_channels)),
                jnp.float32)
            c_up = upsample(cond)
        np.asarray(c_up[0, :4])
        gen = lambda: generate_pallas(pp, mc, c_up, jax.random.key(1),
                                      chunk=chunk, dtype=dt, stream=stream)
        t0 = time.time()
        wav = gen()
        np.asarray(wav[0])
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            wav = gen()
            np.asarray(wav[0])
            best = min(best, time.time() - t0)
        rtf = best / (B * t_samples / sr)
        us = best / t_samples * 1e6
        print(f"B={B:4d} chunk={chunk:4d} {dt:9s}{' strm' if stream else ''} vmem={est>>20:3d}MB "
              f"step={us:6.2f}us wall={best:6.3f}s RTF={rtf:.5f} "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
