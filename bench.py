"""Headline benchmarks, driver-visible (BASELINE.json:2/5).

Primary metric: 24 kHz Laplacian AR generation RTF per chip (target
RTF < 0.1). Prints ONE JSON line
  {"metric": ..., "value": RTF, "unit": "rtf", "vs_baseline": target/RTF,
   "extras": {...}}
where vs_baseline >= 1.0 means the 0.1-RTF target is met or beaten, and
"extras" carries the other two headline metrics (VERDICT.md r1 item 7) so
regressions in them are driver-visible too:
  - train_steps_per_s: config-2 training throughput through multi_step_fn
    (steps_per_call=8, batch 8 — the production dispatch shape);
    vs_baseline = value / round-1's 140 steps/s (pre-staged-batch
    measurement, tools/train_bench.py convention).
  - deep_rtf: deep-baseline (30-layer) generation RTF at the round-1
    frontier operating point (bf16 streamed rings, B=384, chunk 64);
    vs_baseline = round-1's 0.00150 / value. Carries "mfu": achieved
    TFLOP/s vs the v5e bf16 peak from tools/roofline.py's exact per-step
    FLOPs count (VERDICT r2 item 3).
  - deep_train_steps_per_s: deep-baseline training throughput (B=8, K=8 —
    the production run shape); vs_baseline = value / round-1's 23.7
    whole-run steps/s (VERDICT r2 item 4: a deep-training regression must
    be driver-visible).

Uses the fastest available AR backend: the Pallas persistent kernel on TPU
when present, else the lax.scan queue-cached path. Weights are random
(generation cost is independent of training state).
"""

import dataclasses
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
# round-1/2 reference points (BASELINE.md) for the extras' vs_baseline
R1_TRAIN_STEPS_PER_S = 140.0   # jitted-step measurement, config-2 B=8
R1_DEEP_RTF = 0.00150          # deep bf16 streamed B=384 chunk 64
R1_DEEP_TRAIN_STEPS_PER_S = 23.7   # deep 120k-step run whole-run average
DEEP_BATCH = 384
DEEP_CHUNK = 64


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(x):
    # On the tunnel-attached axon platform block_until_ready can return
    # before execution finishes; a D2H fetch of the result is the only
    # reliable completion barrier. Pull one full row (depends on the
    # whole AR chain for that utterance).
    np.asarray(x[0])
    return x


def _init_params(model, mc, hop, rng):
    import jax
    import jax.numpy as jnp

    from shallow_wavenet_tpu.models import extract_plain_params

    # init on host CPU (remote-compiling the flax init on the tunnel-attached
    # TPU costs minutes and contributes nothing to the measurement)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.asarray(rng.uniform(-1, 1, (1, 2 * hop - 1)), jnp.float32)
        c0 = jnp.asarray(rng.standard_normal((1, 2, mc.aux_channels)),
                         jnp.float32)
        variables = model.init(jax.random.key(0), x0, c0)
    variables = jax.device_put(variables, jax.devices()[0])
    return variables, extract_plain_params(variables, mc)


def bench_generation(preset, batch, chunk, dtype="float32", stream=False):
    """Returns (rtf, backend) for 1 s/utt generation at the given batch."""
    import jax
    import jax.numpy as jnp

    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.models import WaveNet

    cfg = get_config(preset)
    mc = cfg.model
    sr = cfg.data.sample_rate
    hop = cfg.data.hop_length
    n_frames = int(SECONDS_PER_UTT * sr) // hop
    t_samples = n_frames * hop

    model = WaveNet(mc)
    rng = np.random.default_rng(0)
    variables, pp = _init_params(model, mc, hop, rng)

    cond = jnp.asarray(
        rng.standard_normal((batch, n_frames, mc.aux_channels)), jnp.float32
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

        if pallas_supported(mc, batch=batch, chunk=chunk, dtype=dtype,
                            stream=stream):
            gen = lambda: generate_pallas(
                pp, mc, c_up, jax.random.key(1), chunk=chunk, dtype=dtype,
                stream=stream)
            backend = "pallas" + ("-bf16" if dtype == "bfloat16" else "")
    except ImportError:
        pass
    if gen is None:
        if batch > 64:
            # a B>64 scan-path program at this size can crash the remote
            # TPU worker — never silently fall back at bench batches
            raise RuntimeError(
                f"Pallas kernel unsupported at B={batch} (dtype={dtype}, "
                f"stream={stream}); refusing the scan path at bench scale")
        from shallow_wavenet_tpu.models.generate import generate_fast

        gen = lambda: generate_fast(pp, mc, c_up, jax.random.key(1))

    log(f"[{preset}] backend={backend} B={batch}; warmup compile...")
    t0 = time.time()
    wav = _sync(gen())
    log(f"[{preset}] warmup (incl. compile): {time.time() - t0:.1f}s")

    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        wav = _sync(gen())
        best = min(best, time.time() - t0)

    assert wav.shape == (batch, t_samples), wav.shape
    assert bool(jnp.all(jnp.isfinite(wav))), "non-finite samples"
    audio_s = batch * t_samples / sr
    rtf = best / audio_s
    log(f"[{preset}] {audio_s:.1f} audio-s in {best:.2f}s wall -> rtf={rtf:.5f}")
    return rtf, backend


def bench_training(preset="shallow_laplace_single", batch=8, k=8):
    """Training throughput via multi_step_fn with pre-staged batches
    (dispatch-amortized; tools/train_bench.py convention).
    Returns steps/s."""
    from shallow_wavenet_tpu.config import get_config
    from shallow_wavenet_tpu.training import Trainer

    cfg = get_config(preset)
    cfg.data = dataclasses.replace(cfg.data, batch_size=batch)
    tr = Trainer(cfg)
    state = tr.init_state()
    rf = cfg.model.receptive_field
    hop = cfg.data.hop_length
    pad = -(-rf // hop) * hop
    total = pad + cfg.data.segment_length
    rng = np.random.default_rng(0)
    batches = [
        {
            "x": rng.uniform(-1, 1, (batch, total)).astype(np.float32),
            "cond": rng.standard_normal(
                (batch, total // hop, cfg.model.aux_channels)
            ).astype(np.float32),
        }
        for _ in range(k)
    ]
    bs = tr.shard_batches(batches)
    t0 = time.time()
    state, m = tr.multi_step_fn(state, bs)
    np.asarray(m["loss"])
    log(f"[train] warmup (incl. compile): {time.time() - t0:.1f}s")
    calls = 6
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(calls):
            state, m = tr.multi_step_fn(state, bs)
        np.asarray(m["loss"])  # D2H = real barrier
        best = min(best, (time.time() - t0) / (calls * k))
    sps = 1.0 / best
    log(f"[train] {best * 1e3:.2f} ms/step -> {sps:.1f} steps/s "
        f"({batch * total * sps / 1e6:.2f} M samples/s)")
    return sps


def main():
    import jax

    from shallow_wavenet_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    log(f"bench: {jax.devices()} backend={jax.default_backend()}")

    rtf, backend = bench_generation("shallow_laplace_single", BATCH, CHUNK)

    extras = {}
    try:
        sps = bench_training()
        extras["train_steps_per_s"] = {
            "value": round(sps, 1), "unit": "steps/s",
            "vs_baseline": round(sps / R1_TRAIN_STEPS_PER_S, 4),
        }
    except Exception as e:  # noqa: BLE001 — extras must not sink the primary
        log(f"[train] FAILED: {type(e).__name__}: {e}")
        extras["train_steps_per_s"] = {"error": str(e)[:200]}
    try:
        deep_rtf, deep_backend = bench_generation(
            "deep_baseline", DEEP_BATCH, DEEP_CHUNK, dtype="bfloat16",
            stream=True)
        extras["deep_rtf"] = {
            "value": round(deep_rtf, 5), "unit": "rtf",
            "backend": deep_backend,
            "vs_baseline": round(R1_DEEP_RTF / deep_rtf, 4),
        }
        try:
            # MFU of the saturated deep AR step (roofline accounting —
            # exact per-step matmul FLOPs / v5e bf16 peak). Own guard: a
            # roofline failure must not overwrite the measured deep_rtf
            # (ADVICE r3 low)
            from shallow_wavenet_tpu.config import get_config
            from tools.roofline import V5E_MXU_PEAK, flops_per_step_row

            mc = get_config("deep_baseline").model
            sr = get_config("deep_baseline").data.sample_rate
            us_step = deep_rtf * DEEP_BATCH / sr * 1e6
            tflops = flops_per_step_row(mc) * DEEP_BATCH / (us_step * 1e-6)
            extras["deep_rtf"]["mfu"] = round(tflops / V5E_MXU_PEAK, 4)
            extras["deep_rtf"]["us_step"] = round(us_step, 2)
        except Exception as e:  # noqa: BLE001
            log(f"[deep-mfu] FAILED (deep_rtf kept): "
                f"{type(e).__name__}: {e}")
    except Exception as e:  # noqa: BLE001
        log(f"[deep] FAILED: {type(e).__name__}: {e}")
        extras["deep_rtf"] = {"error": str(e)[:200]}
    try:
        dsps = bench_training("deep_baseline", batch=8, k=8)
        extras["deep_train_steps_per_s"] = {
            "value": round(dsps, 1), "unit": "steps/s",
            "vs_baseline": round(dsps / R1_DEEP_TRAIN_STEPS_PER_S, 4),
        }
    except Exception as e:  # noqa: BLE001
        log(f"[deep-train] FAILED: {type(e).__name__}: {e}")
        extras["deep_train_steps_per_s"] = {"error": str(e)[:200]}

    print(json.dumps({
        "metric": f"rtf_per_chip_24k_laplace_b{BATCH}_{backend}",
        "value": round(rtf, 5),
        "unit": "rtf",
        "vs_baseline": round(TARGET_RTF / rtf, 4),
        "extras": extras,
    }))


if __name__ == "__main__":
    main()
