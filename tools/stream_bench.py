"""Serving-latency benchmark: StreamingSynthesizer on the attached TPU.

Measures per-push wall latency for real-time single-stream (and small
batch) synthesis — the serving-side complement of bench.py's batch
throughput number.

Usage: python tools/stream_bench.py [batch] [block_frames] [n_blocks] [fused]
       python tools/stream_bench.py [slots] [block_frames] [n_cycles] [fused] pool

pool mode drives the StreamPool serving shape instead of one
synchronized session: `slots` INDEPENDENT streams with staggered starts
(one joins per cycle; finished streams immediately recycle their slot),
measuring per-cycle wall latency of the batched dispatch plus the
aggregate audio rate — the realistic multi-tenant serving number.
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
POOL = len(sys.argv) > 5 and sys.argv[5] == "pool"


def main_pool():
    """Staggered-lifecycle serving bench through StreamPool."""
    from tools._common import init_model

    from shallow_wavenet_tpu.models.streaming import StreamPool

    cfg = get_config("shallow_laplace_single")
    mc, dc = cfg.model, cfg.data
    block_ms = BLOCK_FRAMES * dc.hop_length / dc.sample_rate * 1e3
    print(f"device={jax.devices()} POOL slots={B} block={BLOCK_FRAMES} "
          f"frames fused={FUSED} ({block_ms:.1f} ms audio/block)")
    rng = np.random.default_rng(0)
    model, v, pp = init_model(mc, dc.hop_length)
    pool = StreamPool(pp, model, v, mc, hop_length=dc.hop_length,
                      slots=B, block_frames=BLOCK_FRAMES, chunk=64,
                      fused=FUSED)
    # each stream lives 24 blocks (~2 s of audio at the 80 ms block) — a
    # short-but-realistic utterance; one new stream joins per cycle until
    # slots fill; ended streams recycle their slot immediately
    STREAM_BLOCKS = 24
    halo = pool.halo
    seed = 0

    def open_one():
        nonlocal seed
        sid = pool.open(seed=seed)
        seed += 1
        # push everything up front: frames are frame-rate features, tiny
        # next to the waveform — the bench measures synthesis dispatches
        pool.push(sid, rng.standard_normal(
            (STREAM_BLOCKS * BLOCK_FRAMES + halo,
             mc.aux_channels)).astype(np.float32))
        pool.end(sid)

    lat, lat_tail, emitted, measured, cycles = [], [], 0, 0, 0
    t_start = time.time()
    open_one()
    while cycles < N_BLOCKS:
        if pool.free_slots and cycles < N_BLOCKS - STREAM_BLOCKS:
            open_one()
        before = set(pool.active)
        t0 = time.time()
        out = pool.step()
        dt = time.time() - t0
        cycles += 1
        closed = before - set(pool.active)
        got = sum(w.shape[0] for w in out.values())
        emitted += got
        if cycles > 3:                    # skip compile warmup
            # a cycle in which a stream closes ran the pooled TAIL
            # dispatch in addition to the steady-state dispatch(es) —
            # reported separately. Note: such cycles also contain the
            # other active streams' pooled dispatch, so the tail mean is
            # an upper bound on the tail dispatch itself (ADVICE r4)
            (lat_tail if closed else lat).append(dt)
            measured += got
        if not pool.active:
            break
    total = time.time() - t_start
    lat = np.asarray(lat) * 1e3
    lat_tail = np.asarray(lat_tail) * 1e3
    audio_s = emitted / dc.sample_rate
    print(f"emitted {audio_s:.2f} audio-s over {cycles} cycles "
          f"({pool.dispatches} pooled dispatches, {len(lat_tail)} "
          f"measured tail cycles)")
    if len(lat):
        print(f"steady-state cycle latency ms: mean {lat.mean():.1f}  p50 "
              f"{np.percentile(lat, 50):.1f}  "
              f"p95 {np.percentile(lat, 95):.1f}"
              f"  max {lat.max():.1f}  (block = {block_ms:.1f} ms audio)")
    else:
        print("no steady-state cycles measured (raise n_cycles past the "
              "warmup skip)")
    if len(lat_tail):
        # the FIRST stream tail compiles the pooled tail program (one-time,
        # cached for the process); report it separately so the recurring
        # per-tail cost is visible (r5: mean-excl-max ~62-71 ms ~= 2x the
        # steady-state cycle, vs the r4 per-tail host path's 518-543 ms)
        excl = (f"  mean excl max {np.delete(lat_tail, lat_tail.argmax()).mean():.1f}"
                f"  p50 {np.percentile(lat_tail, 50):.1f}"
                if len(lat_tail) > 1 else "")
        print(f"tail-containing cycle latency ms (pooled tail dispatch + "
              f"that cycle's steady dispatches): mean {lat_tail.mean():.1f}"
              f"  max {lat_tail.max():.1f}{excl}")
    wall = (lat.sum() + lat_tail.sum()) / 1e3
    agg = (measured / dc.sample_rate) / (wall + 1e-9)
    print(f"aggregate (incl. tails): {agg:.1f} audio-s/s "
          f"(total incl. compile: {total:.1f}s)")


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
    # block_ms/lat_ms is audio-seconds per wall-second per stream
    agg = B * block_ms / lat.mean()
    print(f"aggregate: {B} streams x {block_ms:.1f} ms/push -> "
          f"{agg:.2f} audio-s/s (aggregate RTF {1.0 / agg:.4f})")


if __name__ == "__main__":
    main_pool() if POOL else main()
