"""Headline benchmark: 24 kHz Laplacian AR generation RTF per chip.

Primary metric of BASELINE.json:2/5 — generated audio-seconds per second
per chip (reported as RTF; target RTF < 0.1). Prints ONE JSON line:
  {"metric": ..., "value": RTF, "unit": "rtf", "vs_baseline": target/RTF}
so vs_baseline >= 1.0 means the 0.1-RTF target is met or beaten.

Uses the fastest available AR backend: the Pallas persistent kernel on TPU
when present, else the lax.scan queue-cached path. Weights are random
(generation cost is independent of training state).
"""

import json
import sys
import time

import numpy as np


TARGET_RTF = 0.1
SECONDS_PER_UTT = 1.0
# Batched utterances per chip. The old B=96 frontier was Mosaic's DEFAULT
# 16 MB scoped-VMEM gate, not hardware: the kernel now requests the
# physical 128 MB per-core VMEM via CompilerParams(vmem_limit_bytes).
# Per-step latency rises slowly with batch (5.7 us @ B=96 -> 17.2 us @
# B=832) and per-chip throughput SATURATES at ~2030 audio-s/s around
# B=832: the bf16 kernel (halved VMEM) runs B=1024/1280/1536 at
# 22.9/26.4/32.8 us/step — RTF flat at ~0.0005 (v5e sweep 2026-08-19), so
# past ~800 the step is compute/bandwidth-bound, not VMEM-bound. B=832
# fp32 is the measured optimum and keeps the bit-exact-vs-scan property.
BATCH = 832
CHUNK = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()

    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.models import WaveNet, extract_plain_params

    cfg = get_config("shallow_laplace_single")
    mc = cfg.model
    sr = cfg.data.sample_rate
    hop = cfg.data.hop_length
    n_frames = int(SECONDS_PER_UTT * sr) // hop
    t_samples = n_frames * hop

    log(f"bench: {jax.devices()} backend={jax.default_backend()}")
    model = WaveNet(mc)
    rng = np.random.default_rng(0)
    # init on host CPU (remote-compiling the flax init on the tunnel-attached
    # TPU costs minutes and contributes nothing to the measurement)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.asarray(rng.uniform(-1, 1, (1, 2 * hop - 1)), jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((1, 2, mc.aux_channels)),
                         jnp.float32)
        variables = model.init(jax.random.key(0), x0, c0)
    variables = jax.device_put(variables, jax.devices()[0])
    pp = extract_plain_params(variables, mc)

    cond = jnp.asarray(
        rng.standard_normal((BATCH, n_frames, mc.aux_channels)), jnp.float32
    )
    c_up = jax.jit(
        lambda c: model.apply(variables, c, method="upsample_cond")
    )(cond)
    c_up.block_until_ready()

    backend = "scan"
    gen = None
    try:
        from shallow_wavenet_tpu.ops.ar_kernel import (
            generate_pallas, pallas_supported,
        )

        if pallas_supported(mc, batch=BATCH, chunk=CHUNK):
            gen = lambda: generate_pallas(pp, mc, c_up, jax.random.key(1), chunk=CHUNK)
            backend = "pallas"
    except ImportError:
        pass
    if gen is None:
        from shallow_wavenet_tpu.models.generate import generate_fast

        gen = lambda: generate_fast(pp, mc, c_up, jax.random.key(1))

    def sync(x):
        # On the tunnel-attached axon platform block_until_ready can return
        # before execution finishes; a D2H fetch of the result is the only
        # reliable completion barrier. Pull one full row (depends on the
        # whole AR chain for that utterance).
        np.asarray(x[0])
        return x

    log(f"backend={backend}; warmup compile...")
    t0 = time.time()
    wav = sync(gen())
    log(f"warmup (incl. compile): {time.time() - t0:.1f}s")

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        wav = sync(gen())
        best = min(best, time.time() - t0)
    wall = best

    assert wav.shape == (BATCH, t_samples), wav.shape
    assert bool(jnp.all(jnp.isfinite(wav))), "non-finite samples"
    audio_s = BATCH * t_samples / sr
    rtf = wall / audio_s
    log(f"generated {audio_s:.1f} audio-s in {wall:.2f}s wall")

    print(json.dumps({
        "metric": f"rtf_per_chip_24k_laplace_b{BATCH}_{backend}",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 4),
    }))


if __name__ == "__main__":
    main()
