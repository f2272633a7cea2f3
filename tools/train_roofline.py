"""Speed-of-light accounting for the TRAINING step (VERDICT r4 item 3 —
the trainer-side twin of tools/roofline.py's AR-kernel analysis;
BASELINE.json:2 names training throughput).

Four measurements at the preset geometry, on the attached TPU:

1. Analytic matmul FLOPs of the teacher-forced step, enumerated GEMM by
   GEMM from the config (mirrors models/wavenet.py shapes, including the
   upsampler's collapsed phase-matmuls). Backward of a GEMM is two GEMMs
   (dgrad + wgrad), so step FLOPs = 3x forward matmul FLOPs. Cross-checked
   against XLA's own cost analysis.
2. Measured fwd-only / fwd+bwd / full-step wall time (the fwd/bwd split
   the r3 cliff analysis had but the roofline never recorded).
3. A GEMM-mimic ceiling: the SAME list of (M, K, N) bf16 matmuls as the
   step, issued as bare XLA einsums with no stack around them — the
   empirical speed of light for these shapes on this chip, which prices
   in the lane-padding cost (shallow R=64 contractions run K=64 = half
   the 128-deep MXU) that the flat 197 TFLOP/s peak does not.
4. A lane-padding model: padded-shape FLOPs / true FLOPs per GEMM — the
   analytic share of (3) attributable to sub-128 contraction/output dims.

The printed ceiling argument: achieved MFU vs mimic MFU vs padded-peak
MFU; the gap from mimic to achieved is what the fused stack (layout
relayouts, elementwise fusions, scan plumbing) costs — the part a better
schedule could in principle recover.

Usage: python tools/train_roofline.py [preset] [batch] [segment=N]
                                      [accum=N] [fold=0|1] [json=PATH]
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
from shallow_wavenet_tpu.training import Trainer  # noqa: E402

V5E_PEAK = 197e12   # bf16 MXU peak (public v5e spec)
V5E_HBM = 819e9     # HBM bandwidth (public v5e spec), bytes/s
LANE = 128          # MXU depth / lane tile


def step_gemms(cfg, batch: int, total: int) -> list[tuple[str, int, int, int]]:
    """Forward-pass GEMMs as (name, M, K, N), mirroring models/wavenet.py:
    CausalDilatedConv taps (or the folded K=k*R contraction), cond/res/skip
    1x1s, head, input proj, and the upsampler's phase-matmuls."""
    mc = cfg.model
    T = total - 1                      # x[:, :-1] drives the stack
    B = batch
    F = total // cfg.data.hop_length
    R, G, S = mc.residual_channels, mc.gate_channels, mc.skip_channels
    C, A = mc.cond_channels, mc.aux_channels
    L = len(mc.dilations)
    g = []
    # upsampler: 1x1 proj then one phase-matmul per stage at the stage's
    # input frame rate (B, F_in, 3C) @ (3C, f*C)
    g.append(("up_proj", B * F, A, C))
    fin = F
    for f in mc.upsample_factors:
        g.append((f"up_smooth_f{f}", B * fin, 3 * C, f * C))
        fin *= f
    if mc.head == "softmax":
        pass                           # input embed is a gather, not a GEMM
    else:
        g.append(("input_proj", B * T, 1, R))
    for _ in range(L):
        if mc.fold_taps:
            g.append(("conv_fold", B * T, mc.kernel_size * R, G))
        else:
            for _k in range(mc.kernel_size):
                g.append(("conv_tap", B * T, R, G))
        g.append(("cond1x1", B * T, C, G))
        g.append(("res1x1", B * T, G // 2, R))
        g.append(("skip1x1", B * T, G // 2, S))
    g.append(("head1", B * T, S, S))
    g.append(("head2", B * T, S,
              mc.quantize_channels if mc.head == "softmax" else 2))
    return g


def gemm_flops(g) -> int:
    return sum(2 * M * K * N for _, M, K, N in g)


def padded_flops(g) -> int:
    """FLOPs after rounding K and N up to the 128 lane tile — the work the
    MXU actually clocks through when contraction/output dims under-fill
    it. M rides the sublane axis (8) and is huge here; ignored."""
    up = lambda x: -(-x // LANE) * LANE  # noqa: E731
    return sum(2 * M * up(K) * up(N) for _, M, K, N in g)


def gemm_bytes(g) -> int:
    """Minimum bf16 HBM traffic of the GEMM list: activations in + out per
    GEMM (weights are negligible at these M). With M >> K, N the
    arithmetic intensity is ~K*N/(K+N) FLOP/byte — at the shallow stack's
    K=64/N=128 that is ~43, far below the ~240 needed to reach the v5e
    MXU peak from HBM, so the TRAINING step is bandwidth-bound and the
    HBM roofline, not the 197 TFLOP/s flat peak, is the honest ceiling.
    Perfect fusion would elide some inter-GEMM round trips; this counts
    each GEMM's in+out, so the derived ceiling is approximate to the
    extent XLA fuses producers into consumers."""
    return sum(2 * (M * K + K * N + M * N) for _, M, K, N in g)


def _sync(out):
    # block_until_ready does NOT reliably wait on the axon tunnel backend
    # (measured 2026-08-22: fwd-only "0.07 ms" = 457% MFU); force a
    # device->host transfer of one leaf — the program must complete for
    # any of its outputs to materialize.
    np.asarray(jax.tree_util.tree_leaves(out)[0])


def time_fn(fn, *args, n=20, sync=None):
    out = fn(*args)
    (sync or _sync)(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    (sync or _sync)(out)
    return (time.time() - t0) / n


def main():
    pos = [a for a in sys.argv[1:] if "=" not in a]
    kw = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    preset = pos[0] if pos else "shallow_laplace_single"
    batch = int(pos[1]) if len(pos) > 1 else 8
    segment = int(kw.get("segment", 0))
    accum = int(kw.get("accum", 1))
    fold = bool(int(kw.get("fold", "0")))

    import dataclasses

    cfg = get_config(preset)
    cfg.data = dataclasses.replace(cfg.data, batch_size=batch,
                                   **({"segment_length": segment}
                                      if segment else {}))
    if accum > 1:
        cfg.train = dataclasses.replace(cfg.train, grad_accum=accum)
    if fold:
        cfg.model = dataclasses.replace(cfg.model, fold_taps=True)
    tr = Trainer(cfg)
    state = tr.init_state()
    rf = cfg.model.receptive_field
    hop = cfg.data.hop_length
    total = -(-rf // hop) * hop + cfg.data.segment_length
    rng = np.random.default_rng(0)
    batch_h = {
        "x": rng.uniform(-1, 1, (batch, total)).astype(np.float32),
        "cond": rng.standard_normal(
            (batch, total // hop, cfg.model.aux_channels)).astype(np.float32),
    }
    b = tr.shard_batch(batch_h)
    n_samples = batch * total

    g = step_gemms(cfg, batch, total)
    fwd_f = gemm_flops(g)
    step_f = 3 * fwd_f                 # bwd = dgrad + wgrad per GEMM
    pad_f = padded_flops(g)
    print(f"== {preset} B={batch} total={total} accum={accum} "
          f"fold={int(fold)} ==")
    print(f"analytic fwd GEMM FLOPs {fwd_f / 1e9:.2f} GF/step "
          f"({fwd_f / n_samples / 1e6:.3f} MF/sample); step (x3) "
          f"{step_f / 1e9:.2f} GF")
    print(f"lane-padded fwd FLOPs {pad_f / 1e9:.2f} GF "
          f"(x{pad_f / fwd_f:.2f} — padded-peak ceiling "
          f"{V5E_PEAK * fwd_f / pad_f / 1e12:.0f} TFLOP/s)")
    byt = gemm_bytes(g)
    ai = fwd_f / byt
    bw_tput = min(ai * V5E_HBM, V5E_PEAK)
    print(f"fwd GEMM bytes {byt / 1e9:.2f} GB -> arithmetic intensity "
          f"{ai:.1f} FLOP/B; HBM roofline {bw_tput / 1e12:.1f} TFLOP/s "
          f"(= {bw_tput / V5E_PEAK * 100:.1f}% of MXU peak) — the "
          f"bandwidth-bound ceiling for these shapes")
    try:
        ca = tr.step_fn.lower(state, b).compile().cost_analysis()
        xf = float(ca["flops"]) * max(1, accum)
        print(f"XLA cost-analysis step FLOPs {xf / 1e9:.2f} GF "
              f"(analytic/XLA = {step_f / xf:.2f}; XLA counts fp32 "
              f"non-matmul ops too)")
    except Exception as e:  # noqa: BLE001
        print(f"cost_analysis unavailable: {e}")

    # ---- measured fwd / fwd+bwd / full step -----------------------------
    loss_j = jax.jit(tr._loss_fn)
    grad_j = jax.jit(lambda p, bb: jax.value_and_grad(tr._loss_fn)(p, bb))
    t_fwd = time_fn(loss_j, state.params, b)
    t_fb = time_fn(grad_j, state.params, b)
    # step_fn DONATES its input state (argnum 0): replaying one captured
    # state through time_fn works on CPU, where donation is a no-op, but
    # is an InvalidArgument on TPU (the buffers are deleted after the
    # first call). Thread the state through the timing loop instead.
    st2, m = tr.step_fn(state, b)      # warmup (donates `state`)
    np.asarray(m["loss"])
    n_it = 20
    t0 = time.time()
    for _ in range(n_it):
        st2, m = tr.step_fn(st2, b)
    np.asarray(m["loss"])
    t_step = (time.time() - t0) / n_it
    rows = [("fwd only", t_fwd, fwd_f),
            ("fwd+bwd", t_fb, step_f),
            ("full step", t_step, step_f)]
    for name, t, f in rows:
        print(f"{name:9s}: {t * 1e3:7.2f} ms  {f / t / 1e12:6.1f} TFLOP/s "
              f"(MFU {f / t / V5E_PEAK * 100:5.1f}%)  "
              f"{n_samples / t / 1e6:6.2f} M samples/s")
    print(f"bwd/fwd time ratio {(t_fb - t_fwd) / t_fwd:.2f} "
          f"(FLOP ratio 2.00); optimizer+plumbing "
          f"{(t_step - t_fb) * 1e3:.2f} ms")

    # ---- GEMM-mimic ceiling: same shapes, nothing else ------------------
    dt = jnp.bfloat16
    ops = [(jnp.zeros((M, K), dt), jnp.zeros((K, N), dt)) for _, M, K, N in g]

    def mimic(pairs):
        return [jnp.einsum("mk,kn->mn", a, w,
                           preferred_element_type=jnp.float32)
                for a, w in pairs]

    mim_j = jax.jit(mimic)
    t_mim = time_fn(mim_j, ops)
    # bwd mimic: dgrad (M,N)@(N,K) + wgrad (K,M)@(M,N) per GEMM
    ops_b = []
    for _, M, K, N in g:
        ops_b.append((jnp.zeros((M, N), dt), jnp.zeros((N, K), dt)))
        ops_b.append((jnp.zeros((K, M), dt), jnp.zeros((M, N), dt)))
    t_mim_b = time_fn(mim_j, ops_b)
    t_mim_step = t_mim + t_mim_b
    print(f"GEMM mimic: fwd {t_mim * 1e3:.2f} ms, bwd {t_mim_b * 1e3:.2f} "
          f"ms -> step-equivalent {t_mim_step * 1e3:.2f} ms  "
          f"{step_f / t_mim_step / 1e12:.1f} TFLOP/s "
          f"(MFU {step_f / t_mim_step / V5E_PEAK * 100:.1f}%) — the "
          f"empirical shapes-only ceiling")
    print(f"stack overhead: full step is "
          f"{t_step / t_mim_step:.2f}x the mimic "
          f"(relayouts + elementwise fusions + scan plumbing)")
    if kw.get("json"):
        import json as _json

        with open(kw["json"], "w") as f:
            _json.dump({
                "preset": preset, "batch": batch, "total": total,
                "accum": accum, "fold": fold,
                "fwd_gemm_flops": fwd_f, "step_flops": step_f,
                "padded_fwd_flops": pad_f,
                "t_fwd_ms": t_fwd * 1e3, "t_fwd_bwd_ms": t_fb * 1e3,
                "t_step_ms": t_step * 1e3,
                "t_mimic_step_ms": t_mim_step * 1e3,
                "mfu_step": step_f / t_step / V5E_PEAK,
                "mfu_mimic": step_f / t_mim_step / V5E_PEAK,
                "mfu_padded_ceiling": fwd_f / pad_f,
                "fwd_gemm_bytes": byt,
                "arithmetic_intensity": ai,
                "bw_roofline_tflops": bw_tput / 1e12,
                # step AI ~= fwd AI (bwd moves ~3x the bytes for 3x the
                # FLOPs), so the step's BW ceiling is the same bw_tput
                "frac_of_bw_roofline": (step_f / t_step) / bw_tput,
            }, f, indent=1)


if __name__ == "__main__":
    main()
