"""Roofline / MFU accounting for the Pallas AR kernel at an operating
point (VERDICT r2 item 3; BASELINE.json north star: "AR inference hits
speed-of-light on the gated dilated-conv cache updates").

Counts the kernel's exact per-step matmul FLOPs and HBM bytes from the
ModelConfig, measures us/step over a batch sweep with the PRODUCTION
kernel (tools/kbench), fits time(B) = fixed + slope*B, and reports:

- achieved TFLOP/s and MFU vs the v5e bf16 MXU peak (197 TFLOP/s)
- HBM GB/s vs the v5e peak (819 GB/s)
- the fixed (batch-independent) latency of the sequential matmul chain
  and the incremental MXU efficiency of the batch-proportional part

Usage: python tools/roofline.py [preset=deep_baseline] [dtype=bfloat16]
                                [chunk=64] [stream=1] [json=PATH] [B ...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from shallow_wavenet_tpu.config import get_config
from shallow_wavenet_tpu.ops.ar_kernel import (
    _gate_pad, _skip_pad, _stream_split,
)

# v5e chip peaks (public spec: 197 bf16 TFLOP/s, 819 GB/s HBM BW).
# fp32 matmuls decompose to multi-pass bf16 on the MXU, so fp32 MFU is
# reported against the same bf16 peak (a conservative denominator).
V5E_MXU_PEAK = 197e12
V5E_HBM_PEAK = 819e9


def flops_per_step_row(cfg, fused: int = 0) -> int:
    """Matmul FLOPs per AR step per batch row (2*MACs), counting the
    lane-padded shapes the kernel actually issues (ops/ar_kernel.py
    _make_kernel body): per layer prev-tap (R,2gp) + curr-tap (R,2gp) +
    fused skip|res (gp, sp+R); per step cond (C, L*2gp) + head
    (S,S)+(S,2|Q); softmax adds the one-hot encode (Q,R) and the
    triangular-cdf (Q,Q) matmuls."""
    L = len(cfg.dilations)
    R, S, C = cfg.residual_channels, cfg.skip_channels, cfg.cond_channels
    gp = _gate_pad(cfg.gate_channels // 2)
    sp = _skip_pad(S)
    f = L * (2 * R * 2 * gp            # prev-tap
             + 2 * R * 2 * gp          # curr-tap
             + 2 * gp * (sp + R))      # fused skip|res projection
    f += 2 * C * (L * 2 * gp)          # per-step cond matmul
    f += 2 * S * S                     # head1
    if cfg.head == "softmax":
        Q = cfg.quantize_channels
        f += 2 * S * Q                 # head2 -> logits
        f += 2 * Q * R                 # one-hot input encode
        f += 2 * Q * Q                 # triangular-cdf sampling
    else:
        f += 2 * S * 2                 # head2 -> (mu, log_b)
        f += 2 * R                     # input projection
    if fused:
        # windowed residual expansion adds rem*2gp correction columns per
        # layer plus the per-block w1cat matmul (see ar_kernel fused path)
        from shallow_wavenet_tpu.ops.ar_kernel import _fused_blocks
        for blk in _fused_blocks(L, fused):
            nb = len(blk)
            f += 2 * R * nb * 2 * gp   # w1cat: h @ (R, nb*2gp)
            for k in range(nb):
                f += 2 * gp * (nb - 1 - k) * 2 * gp   # fm correction cols
    return f


def hbm_bytes_per_step_row(cfg, chunk: int, dtype: str,
                           stream: bool) -> int:
    """HBM traffic per AR step per batch row: streamed conditioning (at
    the weight dtype), noise in, waveform out, and for streamed layers
    one ring-window load + store per chunk (amortized per step).
    Weights are resident in VMEM (loaded once; amortized to ~0)."""
    wb = 2 if dtype == "bfloat16" else 4
    _, strm_ids = _stream_split(cfg.dilations, chunk, stream)
    b = cfg.cond_channels * wb          # cond stream
    b += 4 + 4                          # noise in + wav out (fp32)
    b += len(strm_ids) * 2 * cfg.residual_channels * wb   # ring load+store
    return b


def chain_matmuls_per_step(cfg, fused: int = 0) -> int:
    """Length of the SEQUENTIAL matmul dependency chain per step: the
    gated unit cannot start layer l+1 before layer l's residual add, so
    unfused the chain is 2 per layer (conv tap + skip|res) plus the 2-deep
    head; the cond matmul and prev-tap rides off-chain."""
    L = len(cfg.dilations)
    if fused:
        from shallow_wavenet_tpu.ops.ar_kernel import _fused_blocks
        blocks = _fused_blocks(L, fused)
        return L + len(blocks) + 2
    return 2 * L + 2


def main():
    pos, kw = [], {}
    for a in sys.argv[1:]:
        (kw.update([a.split("=", 1)]) if "=" in a else pos.append(int(a)))
    preset = kw.get("preset", "deep_baseline")
    dtype = kw.get("dtype", "bfloat16")
    chunk = int(kw.get("chunk", 64))
    stream = bool(int(kw.get("stream", 1)))
    batches = pos or [64, 128, 256, 320, 384, 448]

    cfg = get_config(preset).model
    fr = flops_per_step_row(cfg)
    br = hbm_bytes_per_step_row(cfg, chunk, dtype, stream)
    chain = chain_matmuls_per_step(cfg)
    print(f"== {preset} {dtype} chunk={chunk} stream={int(stream)} ==")
    print(f"FLOPs/step/row {fr / 1e6:.3f} MF  HBM bytes/step/row {br}  "
          f"sequential matmul chain {chain}")
    ideal_slope_ns = fr / V5E_MXU_PEAK * 1e9
    print(f"compute-floor slope {ideal_slope_ns:.1f} ns/row "
          f"(v5e bf16 peak {V5E_MXU_PEAK / 1e12:.0f} TFLOP/s)")

    from tools.kbench import _bench_one

    rows = []
    for b in batches:
        us = _bench_one(preset, dtype, b, chunk=chunk, stream=stream)
        if us is None:
            continue
        tf = fr * b / (us * 1e-6) / 1e12
        gbs = br * b / (us * 1e-6) / 1e9
        rows.append((b, us, tf, gbs))
        print(f"  B={b:4d}: {us:6.2f} us/step  {tf:6.1f} TFLOP/s "
              f"(MFU {tf * 1e12 / V5E_MXU_PEAK * 100:4.1f}%)  "
              f"{gbs:5.1f} GB/s ({gbs * 1e9 / V5E_HBM_PEAK * 100:4.1f}% BW)")

    out = {"preset": preset, "dtype": dtype, "chunk": chunk,
           "stream": stream, "flops_per_step_row": fr,
           "hbm_bytes_per_step_row": br, "chain_matmuls": chain,
           "points": [{"B": b, "us_step": us, "tflops": tf, "gbs": gbs,
                       "mfu": tf * 1e12 / V5E_MXU_PEAK}
                      for b, us, tf, gbs in rows]}
    if len(rows) >= 3:
        bs = np.array([r[0] for r in rows], float)
        ts = np.array([r[1] for r in rows], float)
        slope, fixed = np.polyfit(bs, ts, 1)       # us = fixed + slope*B
        eff = ideal_slope_ns / (slope * 1e3) if slope > 0 else float("nan")
        print(f"fit: time = {fixed:.2f} us + {slope * 1e3:.1f} ns/row "
              f"-> incremental MXU efficiency {eff * 100:.0f}%, "
              f"fixed chain latency {fixed:.2f} us "
              f"({chain} chained matmuls -> "
              f"{fixed * 1000 / chain:.0f} ns/matmul)")
        out["fit"] = {"fixed_us": float(fixed),
                      "slope_ns_per_row": float(slope * 1e3),
                      "incremental_mxu_eff": float(eff)}
    if kw.get("json"):
        with open(kw["json"], "w") as f:
            json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
