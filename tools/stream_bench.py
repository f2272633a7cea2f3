"""Serving-latency benchmark: StreamingSynthesizer on the attached TPU.

Measures per-push wall latency for real-time single-stream (and small
batch) synthesis — the serving-side complement of bench.py's batch
throughput number.

Usage: python tools/stream_bench.py [batch] [block_frames] [n_blocks] [fused]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from shallow_wavenet_tpu.config import get_config  # noqa: E402
from shallow_wavenet_tpu.models.streaming import StreamingSynthesizer  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 1
BLOCK_FRAMES = int(sys.argv[2]) if len(sys.argv) > 2 else 6
N_BLOCKS = int(sys.argv[3]) if len(sys.argv) > 3 else 50
FUSED = int(sys.argv[4]) if len(sys.argv) > 4 else 0


def main():
    cfg = get_config("shallow_laplace_single")
    mc, dc = cfg.model, cfg.data
    print(f"device={jax.devices()} B={B} block={BLOCK_FRAMES} frames "
          f"fused={FUSED} "
          f"({BLOCK_FRAMES * dc.hop_length / dc.sample_rate * 1e3:.1f} ms "
          f"audio/block)")
    from tools._common import init_model

    rng = np.random.default_rng(0)
    model, v, pp = init_model(mc, dc.hop_length)

    syn = StreamingSynthesizer(pp, model, v, mc, hop_length=dc.hop_length,
                               batch=B, block_frames=BLOCK_FRAMES, chunk=64,
                               fused=FUSED)
    frames = rng.standard_normal(
        (B, BLOCK_FRAMES * (N_BLOCKS + 2), mc.aux_channels)).astype(np.float32)

    lat = []
    emitted = 0
    t_start = time.time()
    for i in range(N_BLOCKS):
        blk = frames[:, i * BLOCK_FRAMES:(i + 1) * BLOCK_FRAMES]
        t0 = time.time()
        out = syn.push(blk)
        dt = time.time() - t0
        emitted += out.shape[1]
        if i >= min(3, N_BLOCKS - 1):    # skip compile warmup pushes but
            lat.append(dt)               # keep >=1 sample for tiny runs
    total = time.time() - t_start
    lat = np.asarray(lat) * 1e3
    block_ms = BLOCK_FRAMES * dc.hop_length / dc.sample_rate * 1e3
    audio_s = emitted / dc.sample_rate
    print(f"emitted {audio_s:.2f} audio-s over {N_BLOCKS} pushes")
    print(f"push latency ms: mean {lat.mean():.1f}  p50 "
          f"{np.percentile(lat, 50):.1f}  p95 {np.percentile(lat, 95):.1f} "
          f" max {lat.max():.1f}  (block = {block_ms:.1f} ms audio)")
    print(f"steady-state RTF {lat.mean() / block_ms:.3f} "
          f"(total incl. compile: {total:.1f}s)")
    # multi-stream serving shape (VERDICT r3 item 6): B concurrent
    # sessions ride one batched kernel, so each push emits B blocks —
    # per-stream latency is the line above; this is the aggregate
    agg = B * block_ms / lat.mean()
    print(f"aggregate: {B} streams x {block_ms:.1f} ms/push -> "
          f"{agg / 1e3:.2f} audio-s/s (aggregate RTF {1.0 / agg * 1e3:.4f})")


if __name__ == "__main__":
    main()
